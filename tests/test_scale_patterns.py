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
