"""General as-of join operator — hand-computed fixtures for backward,
forward, tolerance, and no-match semantics."""

import datetime as dt

import pyspark.sql.functions as F

from pubmed_central_semantic_search_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _fixtures(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts("2026-01-01 10:00:00"), "t1"),
            (1, _ts("2026-01-01 12:00:00"), "t2"),
            (2, _ts("2026-01-01 09:00:00"), "t3"),  # before any quote
        ],
        "sym int, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2026-01-01 09:30:00"), 10.0),
            (1, _ts("2026-01-01 10:00:00"), 11.0),  # equal-ts match for t1
            (1, _ts("2026-01-01 11:00:00"), 12.0),
            (2, _ts("2026-01-01 09:30:00"), 99.0),
        ],
        "sym int, ts timestamp, px double",
    )
    return trades, quotes


def test_asof_backward(spark):
    trades, quotes = _fixtures(spark)
    got = {
        r["trade"]: (r["asof_ts"], r["asof_px"])
        for r in asof_join(trades, quotes, ["sym"]).collect()
    }
    assert got["t1"] == (_ts("2026-01-01 10:00:00"), 11.0)  # at-or-before
    assert got["t2"] == (_ts("2026-01-01 11:00:00"), 12.0)
    assert got["t3"] == (None, None)  # no quote yet


def test_asof_forward(spark):
    trades, quotes = _fixtures(spark)
    got = {
        r["trade"]: (r["asof_ts"], r["asof_px"])
        for r in asof_join(trades, quotes, ["sym"], direction="forward").collect()
    }
    assert got["t1"] == (_ts("2026-01-01 10:00:00"), 11.0)  # at-or-after
    assert got["t2"] == (None, None)  # no later quote
    assert got["t3"] == (_ts("2026-01-01 09:30:00"), 99.0)


def test_asof_backward_tolerance(spark):
    trades, quotes = _fixtures(spark)
    got = {
        r["trade"]: r["asof_px"]
        for r in asof_join(
            trades,
            quotes,
            ["sym"],
            tolerance=F.expr("INTERVAL 30 MINUTES"),
        ).collect()
    }
    assert got["t1"] == 11.0  # 0 min away
    assert got["t2"] is None  # nearest is 60 min away > tolerance
    assert got["t3"] is None


def test_asof_matches_q35_inline_shape(spark, sf_dir):
    """The generalized operator reproduces q35's purchases←clicks result."""
    from pubmed_central_semantic_search_spark.registry import REGISTRY, load

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    got = {
        r["purchase_id"]: (r["asof_ts"], r["asof_event_id"], r["asof_value"])
        for r in asof_join(purchases, clicks, ["user_id"]).collect()
    }
    want = {
        r["purchase_id"]: (r["asof_ts"], r["asof_event_id"], r["asof_value"])
        for r in REGISTRY["q35_asof_join"]
        .spark(spark, sf_dir)
        .filter(F.col("direction") == "backward")
        .collect()
    }
    assert got == want


def test_asof_rejects_reserved_column_collisions(spark):
    """Left-frame columns named like the internal working columns or the
    asof_-prefixed outputs must raise up front — silently ambiguous
    resolution was the round-1 advice finding."""
    import pytest

    left = spark.createDataFrame([(1, 1, 9)], "sym long, ts long, _p long")
    right = spark.createDataFrame([(1, 1, 2.0)], "sym long, ts long, px double")
    with pytest.raises(ValueError, match="_p"):
        asof_join(left, right, ["sym"])
    left2 = spark.createDataFrame([(1, 1, 9.0)], "sym long, ts long, asof_px double")
    with pytest.raises(ValueError, match="asof_px"):
        asof_join(left2, right, ["sym"])
