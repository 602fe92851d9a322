"""Unit tests for clustering/IVF operators and exact n-gram Jaccard
(SURVEY §2.9 X7, X2/X3) — hand-computed fixtures, deterministic."""

import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.ann import brute_force_topk
from pubmed_central_semantic_search_spark.operators.clustering import (
    ivf_topk,
    lloyd_kmeans,
    nearest_centroid,
    seed_centroids,
    top_centroids,
)
from pubmed_central_semantic_search_spark.operators.dedup import ngram_jaccard_pairs


@pytest.fixture(scope="module")
def axis_vectors(spark):
    # 3 tight groups around the x/y/z axes of R^3.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.1, 0.9, 0.0]),
        (4, [0.0, 0.0, 1.0]),
        (5, [0.0, 0.1, 0.9]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_nearest_centroid_projection(spark, axis_vectors):
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]
    got = {
        r["vec_id"]: r["c"]
        for r in axis_vectors.select(
            "vec_id", nearest_centroid("embedding", cents).alias("c")
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2}


def test_top_centroids_order(spark):
    df = spark.createDataFrame([(0, [1.0, 0.2, 0.0])], "query_id int, qvec array<double>")
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]
    [row] = df.select(top_centroids("qvec", cents, 2).alias("p")).collect()
    assert list(row["p"]) == [0, 1]  # x-axis best, y-axis second


def test_lloyd_recovers_axis_clusters(spark, axis_vectors):
    assigned, cents = lloyd_kmeans(axis_vectors, k=3, n_iter=2, dim=3)
    got = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    # seeds 0/1/2 are x, x-ish, y → after re-centering, the three axis
    # groups must land in three distinct clusters with pair members together
    assert got[0] == got[1] and got[2] == got[3] and got[4] == got[5]
    assert len({got[0], got[2], got[4]}) == 3
    # determinism: same inputs → same assignment and centroids
    assigned2, cents2 = lloyd_kmeans(axis_vectors, k=3, n_iter=2, dim=3)
    assert {r["vec_id"]: r["cluster_id"] for r in assigned2.collect()} == got
    assert cents2 == cents


def test_ivf_full_probe_equals_brute_force(spark, axis_vectors):
    queries = spark.createDataFrame(
        [(0, [0.8, 0.3, 0.1]), (1, [0.0, 0.2, 1.0])],
        "query_id int, qvec array<double>",
    )
    cents = seed_centroids(axis_vectors, 3)
    exact = brute_force_topk(axis_vectors, queries, k=2)
    # probing EVERY list must reproduce the exact result
    full = ivf_topk(axis_vectors, queries, cents, k=2, nprobe=3)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, exact.collect()))
    # nprobe=1 returns ≤ k rows per query, all present in the exact top-6
    narrow = ivf_topk(axis_vectors, queries, cents, k=2, nprobe=1)
    exact_all = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(axis_vectors, queries, k=6).collect()
    }
    for r in narrow.collect():
        assert (r["query_id"], r["vec_id"]) in exact_all


def test_ngram_jaccard_hand_computed(spark):
    a = "w1 w2 w3 w4 w5 w6 w7 w8"          # 6 distinct 3-grams
    b = "w1 w2 w3 w4 w5 w6 w7"             # 5, all shared with a
    c = "x1 x2 x3 x4"                      # disjoint
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id int, text string"
    )
    rows = ngram_jaccard_pairs(df, "doc_id", "text", 3, min_jaccard=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["n_intersect"], r["n_union"]) == (1, 2, 5, 6)
    assert abs(r["jaccard"] - round(5 / 6, 6)) < 1e-9


def test_ngram_jaccard_stop_shingle_cap(spark):
    # a shingle present in every doc is dropped by the cap; pair (1,2)
    # then only intersects on their private shingles
    common = "the quick brown"
    df = spark.createDataFrame(
        [
            (1, common + " fox jumps high"),
            (2, common + " fox jumps high"),
            (3, common + " dog sleeps low"),
        ],
        "doc_id int, text string",
    )
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", 3, min_jaccard=0.0, max_doc_freq=2
    )
    got = {(r["id_a"], r["id_b"]): r["n_intersect"] for r in capped.collect()}
    full = ngram_jaccard_pairs(df, "doc_id", "text", 3, min_jaccard=0.0)
    full_got = {(r["id_a"], r["id_b"]): r["n_intersect"] for r in full.collect()}
    # identical docs 1,2: intersection shrinks only by the capped shingle
    assert full_got[(1, 2)] - got[(1, 2)] == 1
    # cross-group pair shares ONLY the capped shingle → disappears
    assert (1, 3) in full_got and (1, 3) not in got


def test_quantize_round_trip_properties(spark):
    """int8 quantization: values land in [-127,127], zero vectors stay
    zero, reconstruction cosine ≥ 0.999 on a hostile (large-spread)
    vector."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.functions.vector import (
        cosine_similarity,
    )
    from pubmed_central_semantic_search_spark.operators.quantize import (
        dequantize,
        with_quantized,
    )

    rows = [
        (0, [0.001, -100.0, 50.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [1e-6, 2e-6, -1e-6, 3e-6]),
    ]
    df = with_quantized(
        spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    ).withColumn("deq", dequantize("q_vec", F.col("q_scale")))
    out = {r["vec_id"]: r for r in df.collect()}
    for r in out.values():
        assert all(-127 <= q <= 127 for q in r["q_vec"])
    assert list(out[1]["q_vec"]) == [0, 0, 0, 0]  # zero vector intact
    # reconstruction cosine on the nonzero vectors (ANSI div-by-zero guard:
    # the zero vector has no defined cosine)
    cos = {
        r["vec_id"]: r["cos"]
        for r in df.filter(F.col("vec_id") != 1)
        .withColumn("cos", cosine_similarity("embedding", F.col("deq")))
        .collect()
    }
    assert cos[0] >= 0.999 and cos[2] >= 0.999


def test_semantic_dedup_blocks_and_survivors(spark):
    """SemDeDup: near-identical vectors in the SAME cluster collapse to
    one survivor; a near-identical pair SPLIT across clusters is NOT
    pruned (the paper's within-cluster blocking); keep rules differ
    exactly on the diversity election."""
    from pubmed_central_semantic_search_spark.operators.dedup import (
        semantic_dedup,
    )

    # two well-separated cluster directions in R^4
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),    # cluster A, on-centroid
        (2, [0.999, 0.01, 0.0, 0.0]), # near-dup of 1, cluster A
        (3, [0.9, 0.3, 0.0, 0.0]),    # cluster A, farther from centroid,
                                       # near-dup of neither (cos<thr)
        (4, [0.0, 0.0, 1.0, 0.0]),    # cluster B
        (5, [0.0, 0.0, 0.999, 0.01]), # near-dup of 4, cluster B
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]

    out = {r["vec_id"]: r for r in
           semantic_dedup(df, cents, min_cosine=0.99).collect()}
    assert {i: out[i]["cluster_id"] for i in out} == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    # min_id rule: 1 survives its pair, 4 survives its pair, 3 singleton
    assert [out[i]["is_survivor"] for i in (1, 2, 3, 4, 5)] == [
        True, False, True, True, False
    ]
    assert out[1]["component"] == out[2]["component"]
    assert out[4]["component"] == out[5]["component"]
    assert out[3]["component"] != out[1]["component"]

    # far_from_centroid rule: in component {1,2}, member 2 has LOWER
    # cosine to centroid (0.01 off-axis) -> 2 survives instead of 1
    far = {r["vec_id"]: r["is_survivor"] for r in
           semantic_dedup(df, cents, min_cosine=0.99,
                          keep="far_from_centroid").collect()}
    assert far[2] and not far[1]
    assert far[5] and not far[4]
    assert far[3]

    # cross-cluster near-dup is NOT pruned: rotate 5 into cluster A's
    # neighborhood of 1? instead check: a pair straddling the boundary
    v = [0.7072, 0.0, 0.7070, 0.0]   # argmax-cosine -> cluster 0 (tie-ish)
    w = [0.7070, 0.0, 0.7072, 0.0]   # -> cluster 1
    df2 = spark.createDataFrame(
        [(10, v), (11, w)], "vec_id long, embedding array<double>"
    )
    out2 = {r["vec_id"]: r for r in
            semantic_dedup(df2, cents, min_cosine=0.99).collect()}
    assert out2[10]["cluster_id"] != out2[11]["cluster_id"]
    assert out2[10]["is_survivor"] and out2[11]["is_survivor"]  # both kept

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown keep rule"):
        semantic_dedup(df, cents, keep="random")
