"""Arrow-batched BLAS kernels (operators/vectorized.py): equivalence with
the JVM HOF path, tie-break contract, and intended plan shape."""

from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.functions.vector import (
    cosine_similarity,
)
from pubmed_central_semantic_search_spark.operators.clustering import (
    nearest_centroid,
    seed_centroids,
)
from pubmed_central_semantic_search_spark.operators.topk import top_k
from pubmed_central_semantic_search_spark.operators.vectorized import (
    assign_clusters_np,
    brute_force_topk_np,
    cosine_scores_udf,
)
from pubmed_central_semantic_search_spark.queries.dim768 import (
    corpus_768,
    widen_list,
)
from pubmed_central_semantic_search_spark.registry import QUERY_VEC, load


def _hof_topk(emb, query, k):
    scored = emb.select(
        "vec_id", cosine_similarity("embedding", F.lit(query)).alias("score")
    )
    return top_k(scored, "score", k, tiebreak=["vec_id"]).withColumn(
        "score", F.round("score", 6)
    )


def test_np_topk_matches_hof_dim64(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    hof = _hof_topk(emb, QUERY_VEC, 10).collect()
    blas = brute_force_topk_np(emb, QUERY_VEC, 10).collect()
    assert [(r["vec_id"], r["score"]) for r in hof] == [
        (r["vec_id"], r["score"]) for r in blas
    ]


def test_np_topk_matches_hof_dim768(spark, sf_dir):
    emb = corpus_768(spark, sf_dir)
    q = widen_list(QUERY_VEC)
    hof = _hof_topk(emb, q, 10).collect()
    blas = brute_force_topk_np(emb, q, 10).collect()
    assert [(r["vec_id"], r["score"]) for r in hof] == [
        (r["vec_id"], r["score"]) for r in blas
    ]


def test_np_assignment_matches_jvm_literal_path(spark, sf_dir):
    emb = corpus_768(spark, sf_dir)
    cents = seed_centroids(emb, k=8)
    jvm = {
        r["vec_id"]: r["cluster_id"]
        for r in emb.select(
            "vec_id", nearest_centroid("embedding", cents).alias("cluster_id")
        ).collect()
    }
    blas = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters_np(emb, cents).collect()
    }
    assert jvm == blas


def test_np_kernel_plan_is_arrow_batched(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    df = brute_force_topk_np(emb, QUERY_VEC, 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the Python stage is INTENDED here — but it must be the Arrow-batched
    # pandas-UDF evaluator, never row-at-a-time pickling, and top-k must
    # still be per-partition heaps
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_np_scores_zero_vector_yields_nan_like_hof(spark):
    # cosine against a zero vector: HOF gives NULL/NaN via 0/0 — the BLAS
    # kernel must not raise; scoring stays row-aligned
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = df.select(
        "vec_id", cosine_scores_udf([1.0, 0.0])(F.col("embedding")).alias("s")
    ).collect()
    by_id = {r["vec_id"]: r["s"] for r in rows}
    assert by_id[2] == 1.0
    assert by_id[1] is None or by_id[1] != by_id[1]  # null or NaN
