"""observed_gate — in-flight gate counters that ride the consumer's own
job (round 9; the operational telemetry every 100 TB curation run needs
without paying a second corpus pass)."""

import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.observe import (
    gate_metrics,
    observed_gate,
)


def test_observed_gate_counts_ride_the_consumers_action(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 50), (3, None), (4, 70), (5, 5)],
        "doc_id long, quality int",
    )
    gated, obs = observed_gate(df, F.col("quality") >= 40, name="q40")
    rows = sorted(r.doc_id for r in gated.collect())  # the ONLY action
    assert rows == [2, 4]
    m = gate_metrics(obs)
    assert m == {"n_in": 5, "n_pass": 2, "n_drop": 3, "n_null_cond": 1}


def test_observed_gate_no_second_scan(spark, tmp_path):
    """The metrics must come from the SAME job: after one action the
    counters are present without any further jobs."""
    p = str(tmp_path / "d")
    spark.range(1000).selectExpr("id", "id % 7 AS q").write.parquet(p)
    df = spark.read.parquet(p)
    gated, obs = observed_gate(df, F.col("q") < 2)
    n = gated.count()
    before = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
    m = gate_metrics(obs)  # must not schedule anything
    after = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
    assert after == before
    assert m["n_pass"] == n and m["n_in"] == 1000 and m["n_drop"] == 1000 - n


def test_observed_gate_rejects_streams(spark, tmp_path):
    src = tmp_path / "s"
    src.mkdir()
    (src / "a.jsonl").write_text('{"v": 1}\n')
    stream = spark.readStream.schema("v long").json(str(src))
    with pytest.raises(ValueError, match="batch frames only"):
        observed_gate(stream, F.col("v") > 0)
