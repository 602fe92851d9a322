"""Relational operator pack (SURVEY §2.2 P1-P6, §2.7 A1-A4, §2.8 join pack).

The reference's relational surface is thin (projection/filter/equality
filter inside Qdrant queries, one true aggregate); per SURVEY §2.10 our
engine exposes the full Spark SQL surface "for free". These queries certify
it against the DuckDB oracle on the driver's TPC-H-ish tables.

Determinism discipline: every floating sum is computed in DECIMAL (exact,
summation-order-independent — Spark shuffles partials in nondeterministic
order, DuckDB doesn't) and cast to DOUBLE only at the end. This is not a
test hack: at 100 TB the same trick is what makes financial aggregates
reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import grouped_top_k
from ..registry import load, register

DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(DEC)


# ---------------------------------------------------------------------------
# A1/A2/P3 — grouped aggregation with filter pushdown (TPC-H Q1 pattern).


@register(
    "q2_pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
      round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_rows="A1, A2, P1, P3",
)
def q2_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        F.round(
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# P1/P2/P3 — projection + predicate pushdown. Catalyst pushes both the
# filter and the 3-column projection into the parquet scan (verified via
# PushedFilters/ReadSchema in .explain).


@register(
    "q4_filter_project",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0
    """,
    survey_rows="P1, P2, P3",
)
def q4_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# §2.8 join pack — multi-way equi-join with small-dim broadcast (TPC-H Q5
# pattern). nation/region are broadcast (they are tiny at every SF); the
# orders⋈lineitem join shuffles on the fact keys and AQE handles skew.


@register(
    "q5_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
    GROUP BY n.n_name
    """,
    survey_rows="§2.8 equi/broadcast joins, A1",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("AMERICA", "ASIA"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q2's semi-join shape — the reference's N+1 "filter chunks to one document"
# loop (qdrant.py:213-229) is a semi-join in one pass — plus its anti-join
# complement, in ONE tagged query (both sides certified in a single
# driver row; the physical plan must show LeftSemi and LeftAnti).


@register(
    "q6_semi_anti_join",
    """
    SELECT 'semi' AS tag, c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    UNION ALL
    SELECT 'anti' AS tag, c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey_rows="§2.8 semi-join (Q2 shape) + anti-join (§2.10 exposure)",
)
def q6_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000.0)
    semi = (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select(F.lit("semi").alias("tag"), "c_custkey", "c_name", "c_acctbal")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("tag"), "c_custkey", "c_name", "c_acctbal")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# Q2 — per-group top-k via ranking window (the reference's highlight query
# shape). One shuffle on the group key; row_number (not rank) for exactly-k.


@register(
    "q8_window_topk",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) <= 3
    """,
    survey_rows="Q2, Q7, A4",
)
def q8_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return grouped_top_k(
        o, ["o_custkey"], "o_totalprice", 3, tiebreak=["o_orderkey"]
    ).select("o_custkey", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# A3/N5 — running total (the reference's np.cumsum offset bookkeeping,
# armac_scientific_papers.py:15-34, as a window aggregate).


@register(
    "q9_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    survey_rows="A3, N5",
)
def q9_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Events: JSON extraction (the reference's JSON handling is whole-record
# deserialization, S1; we expose field-level access) + time bucketing.


@register(
    "q10_events_rollup",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    """,
    survey_rows="S1 (JSON), A1, date functions (§2.10 exposure)",
)
def q10_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# S2 — union of splits (concatenate_datasets, armac_scientific_papers.py:50)
# on the documents table's source partitions.


@register(
    "q11_union_sources",
    """
    WITH unioned AS (
      SELECT doc_id, lang, source FROM documents WHERE source = 'src0'
      UNION ALL
      SELECT doc_id, lang, source FROM documents WHERE source = 'src1'
      UNION ALL
      SELECT doc_id, lang, source FROM documents WHERE source = 'src2'
    )
    SELECT source, lang, count(*) AS n_docs
    FROM unioned GROUP BY source, lang
    """,
    survey_rows="S2, A2",
)
def q11_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    parts = [d.filter(F.col("source") == s) for s in ("src0", "src1", "src2")]
    unioned = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return unioned.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
