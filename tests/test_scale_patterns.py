"""Scale-pattern proofs: salting correctness + plan shape, bucketed
co-located joins (shuffle-free), AQE presence. These lock in the 100 TB
tactics the README/SURVEY claim."""

import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 'hot' carries 500 rows, 10 cold keys carry 1 each
    rows = [(i, "hot", f"v{i % 37}") for i in range(500)] + [
        (1000 + i, f"cold{i}", "x") for i in range(10)
    ]
    return spark.createDataFrame(rows, "row_id long, key string, val string")


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "HOT DIM")] + [(f"cold{i}", f"DIM{i}") for i in range(10)]
    return spark.createDataFrame(rows, "key string, label string")


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "key").select("row_id", "key", "val", "label")
    salted = salted_join(
        skewed, dim, on=["key"], salt_by=["row_id"], n_salt=8
    ).select("row_id", "key", "val", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_key_is_composite(skewed, dim):
    out = salted_join(skewed, dim, on=["key"], salt_by=["row_id"], n_salt=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # join key really is (key, _salt)


def test_salted_join_deterministic_across_runs(skewed, dim):
    a = salted_join(skewed, dim, on=["key"], salt_by=["row_id"], n_salt=8)
    b = salted_join(skewed, dim, on=["key"], salt_by=["row_id"], n_salt=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_distinct_count_exact(skewed):
    got = {
        r["key"]: r["n_distinct"]
        for r in salted_distinct_count(
            skewed, ["key"], "val", n_salt=8
        ).collect()
    }
    exact = {
        r["key"]: r["n"]
        for r in skewed.groupBy("key")
        .agg(F.countDistinct("val").alias("n"))
        .collect()
    }
    assert got == exact  # 'hot' → 37 distinct vals, colds → 1


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the Exchange
    entirely — the co-located join the SURVEY plans for `chunks` ⋈
    `doc_vectors` on article_id at 100 TB."""
    spark.sql("DROP TABLE IF EXISTS b_chunks")
    spark.sql("DROP TABLE IF EXISTS b_docs")
    chunks = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("article_id"), F.col("id").alias("chunk_id")
    )
    docs = spark.range(0, 100).select(
        F.col("id").alias("article_id"), F.lit(0.5).alias("score")
    )
    (
        chunks.write.bucketBy(8, "article_id").sortBy("article_id")
        .option("path", str(tmp_path / "b_chunks")).saveAsTable("b_chunks")
    )
    (
        docs.write.bucketBy(8, "article_id").sortBy("article_id")
        .option("path", str(tmp_path / "b_docs")).saveAsTable("b_docs")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_chunks").join(spark.table("b_docs"), "article_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_chunks")
        spark.sql("DROP TABLE IF EXISTS b_docs")


def test_aqe_enabled_in_session(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_ivf_partitioned_storage_prunes(spark, tmp_path, sf_dir):
    """The IVF scale path end to end: inverted lists written as parquet
    partitions → a probe query's scan shows PartitionFilters and reads
    only the probed lists (partition pruning, not a full scan)."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators.clustering import (
        ivf_assign,
        seed_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = seed_centroids(emb, 4)
    path = str(tmp_path / "ivf_lists")
    ivf_assign(emb, cents).write.partitionBy("cluster_id").parquet(path)

    lists = spark.read.parquet(path)
    probed = lists.filter(F.col("cluster_id").isin([0, 2]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan
    # pruning is real: only the probed partitions' rows come back
    full = {r["cluster_id"] for r in lists.select("cluster_id").distinct().collect()}
    got = {r["cluster_id"] for r in probed.select("cluster_id").distinct().collect()}
    assert got == {0, 2} and got < full


# ---------------------------------------------------------------------------
# Multi-probe LSH recall contract — stated on the task LSH actually
# guarantees: R-NEAR-NEIGHBOR retrieval. Queries are perturbed corpus
# vectors (cosine ≈ 0.999 to their twin — the embedding-near-dup search
# task); brute force confirms the twin IS the true top-1, and multi-probe
# LSH must retrieve it for ≥ 0.9 of queries while scoring only
# (planes+1)/2^planes of the corpus. On ISOTROPIC data, arbitrary-angle
# top-k (neighbors at ~65°) is hostile to every LSH family — sign-bit
# agreement is ~p=0.65/plane, so no plane count is simultaneously
# selective and high-recall; that regime needs OR-amplification (more
# tables) or IVF (operators/clustering.py), not more probes. Real
# embedding corpora cluster, which is the geometry this contract models.


def test_lsh_multiprobe_recall_contract(spark, sf_dir):
    from pyspark.sql import functions as SF

    from pubmed_central_semantic_search_spark.operators.ann import (
        brute_force_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(SF.col("vec_id") < 40).select(
        SF.col("vec_id").alias("query_id"),
        SF.transform(
            SF.col("embedding").cast("array<double>"),
            lambda x, i: SF.when(i == 0, x + 0.05).otherwise(x),
        ).alias("qvec"),
    )
    twin = {
        r["query_id"]: r["vec_id"]
        for r in brute_force_topk(emb, queries, 1).collect()
    }
    assert all(q == v for q, v in twin.items())  # twin really is the top-1

    def top1_recall(multi_probe: int) -> float:
        got = {
            r["query_id"]: r["vec_id"]
            for r in lsh_topk(emb, queries, 1, multi_probe=multi_probe).collect()
        }
        return sum(1 for q, v in twin.items() if got.get(q) == v) / len(twin)

    r_single, r_multi = top1_recall(0), top1_recall(1)
    assert r_multi >= 0.9, f"multi-probe recall {r_multi} < 0.9 (single {r_single})"
    assert r_multi >= r_single  # the extra probes can only add candidates


def test_simhash_band_join_is_equi_not_cartesian(spark, sf_dir):
    from pubmed_central_semantic_search_spark.operators.dedup import simhash_near_dup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = simhash_near_dup(docs, "doc_id", "text", max_hamming=3, n_bands=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "band" in plan  # the (band, band_val) equi-key is really in the join


def test_simhash_near_dup_recovers_planted_truncations(spark, sf_dir):
    """Planted copies (last-5-tokens-dropped twins, the q24 corpus) must
    surface as (id, id+offset) pairs; hamming must be symmetric-bounded."""
    from pubmed_central_semantic_search_spark.queries.dedup_pack import (
        COPY_OFFSET,
        _planted_text_corpus,
    )
    from pubmed_central_semantic_search_spark.operators.dedup import simhash_near_dup

    corpus = _planted_text_corpus(spark, sf_dir)
    pairs = simhash_near_dup(corpus, "doc_id", "text", max_hamming=3, n_bands=4)
    rows = pairs.collect()
    planted = {(r["id_a"], r["id_b"]) for r in rows if r["id_b"] == r["id_a"] + COPY_OFFSET}
    assert len(planted) >= 10  # a healthy share of twins is within 3 bits
    assert all(0 <= r["hamming"] <= 3 for r in rows)


def test_simhash_band_blocking_is_exhaustive_below_band_count(spark, sf_dir):
    """Pigeonhole proof by example: with max_hamming=3 < 4 bands, the
    band-blocked operator must return EXACTLY the pairs a brute-force
    all-pairs hamming scan finds — blocking loses nothing below the band
    count."""
    from pyspark.sql import functions as SF

    from pubmed_central_semantic_search_spark.operators.dedup import (
        simhash32,
        simhash_near_dup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    sig = simhash32(docs, "doc_id", "text")
    a = sig.select(SF.col("_id").alias("id_a"), SF.col("simhash").alias("sa"))
    b = sig.select(SF.col("_id").alias("id_b"), SF.col("simhash").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"], r["h"])
        for r in a.crossJoin(b)
        .filter(SF.col("id_a") < SF.col("id_b"))
        .select(
            "id_a",
            "id_b",
            SF.bit_count(SF.col("sa").bitwiseXOR(SF.col("sb"))).cast("bigint").alias("h"),
        )
        .filter(SF.col("h") <= 3)
        .collect()
    }
    blocked = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup(docs, "doc_id", "text", max_hamming=3, n_bands=4).collect()
    }
    assert blocked == brute


def test_salted_distinct_count_null_semantics_match_countdistinct(spark):
    """Round-8 review find: NULL values must be EXCLUDED (countDistinct
    semantics) and all-null groups must still appear with 0 — the first
    cut counted NULL as a distinct value and dropped nothing."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators.skew import (
        salted_distinct_count,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None)],
        "g string, v string",
    )
    got = {r.g: r.n_distinct for r in salted_distinct_count(df, ["g"], "v").collect()}
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want == {"a": 2, "b": 0}


def test_salted_distinct_count_null_group_key_matches_countdistinct(spark):
    """Round-9 ADVICE find: a NULL group KEY (not just null values) is a
    real group — the name-based left join was null-unsafe, so
    [(None,'x'), (None,'y')] reported 0 where countDistinct says 2."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators.skew import (
        salted_distinct_count,
    )

    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), ("a", "x"), (None, None), ("b", None)],
        "g string, v string",
    )
    got = {r.g: r.n_distinct for r in salted_distinct_count(df, ["g"], "v").collect()}
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want == {None: 2, "a": 1, "b": 0}
    # Multi-column group with a null in one key component.
    df2 = spark.createDataFrame(
        [(None, 1, "x"), (None, 1, "y"), ("a", None, "x")],
        "g1 string, g2 int, v string",
    )
    got2 = {
        (r.g1, r.g2): r.n_distinct
        for r in salted_distinct_count(df2, ["g1", "g2"], "v").collect()
    }
    assert got2 == {(None, 1): 2, ("a", None): 1}


def test_salt_reserved_column_guards(spark):
    """Round-8 review find: a caller's own '_salt' column used to be
    silently replaced (the upsert writer's _bucket lesson)."""
    import pytest

    from pubmed_central_semantic_search_spark.operators.skew import (
        salted_distinct_count,
        salted_join,
    )

    big = spark.createDataFrame([(1, 2, 3)], "key int, row_id int, _salt int")
    dim = spark.createDataFrame([(1, "d")], "key int, payload string")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(big, dim, on=["key"], salt_by=["row_id"])
    with pytest.raises(ValueError, match="reserved internal"):
        salted_distinct_count(big, ["key"], "row_id")


def test_minhash_stop_band_cap_drops_only_hot_bucket_pairs(spark):
    """The stop-band cap (round-10, measured in tools/measure_minhash_skew
    — a 20% boilerplate template collapsed 7,975 docs into ONE band
    bucket, 118M pre-distinct join products vs 583k uniform): with
    max_band_freq, over-cap band buckets are dropped BEFORE the self-join.
    Semantics pinned here: capped output is a subset of uncapped; pairs
    whose every shared band is under the cap survive EXACTLY; the planted
    hot template's quadratic pair set disappears."""
    from pubmed_central_semantic_search_spark.operators.dedup import (
        minhash_candidate_pairs,
    )

    template = " ".join(f"w{i % 7} x{i % 5} y{i % 3}" for i in range(20))
    rows = [(i, f"{template} tail{i}") for i in range(30)]  # hot cluster
    # a genuine near-dup pair textually unrelated to the template
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    uncapped = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(df, "doc_id", "text").collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(
            df, "doc_id", "text", max_band_freq=10
        ).collect()
    }
    assert capped <= uncapped
    assert (100, 101) in uncapped
    assert (100, 101) in capped  # under-cap bands keep their pairs
    hot_uncapped = {p for p in uncapped if p[0] < 30 and p[1] < 30}
    hot_capped = {p for p in capped if p[0] < 30 and p[1] < 30}
    assert len(hot_uncapped) > 100  # the quadratic cluster really formed
    assert not hot_capped  # and the cap removed exactly that set
    # cap larger than every bucket == exact semantics
    assert {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(
            df, "doc_id", "text", max_band_freq=10_000
        ).collect()
    } == uncapped
