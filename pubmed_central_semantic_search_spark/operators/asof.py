"""General as-of join (§2.10 exposure — the classic time-series operator
Spark SQL lacks as a built-in).

Not an inequality join: a naive ``t1.ts <= t2.ts`` theta-join explodes to
|left|×|right| per key before the per-row argmax prunes it — quadratic in
key hotness, unusable at 100 TB. This implementation is the
union-and-carry shape: union both sides, one window per key ordered by
time, carry the latest (or, forward, the next) right-side payload into
every left row. Cost: ONE shuffle on the key — the same as any grouped
aggregate over the same data, independent of match multiplicity.

Determinism: ties on the timestamp are broken by the payload struct's
lexicographic order (largest wins for backward, smallest for forward), so
retries and re-partitioning can't flip the carried row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row: the single right row with the greatest
    ``right_ts <= left_ts`` (backward) or smallest ``right_ts >= left_ts``
    (forward) per ``on`` key, equal timestamps matching. Right columns come
    back prefixed ``asof_`` (plus ``asof_ts``); no match → nulls.
    ``tolerance`` (an INTERVAL column, e.g. ``F.expr("INTERVAL 1 HOUR")``)
    nulls out matches farther than that from the left timestamp."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    # Internal working columns and asof_-prefixed outputs must not collide
    # with the left frame's columns — select('*', alias('_t'), ...) would
    # create duplicate names and later F.col references would resolve
    # ambiguously (silent wrong answers, not errors).
    reserved = {"_t", "_p", "_is_left", "_m", "asof_ts"}
    reserved.update(f"asof_{c}" for c in right_cols)
    clashes = reserved.intersection(left.columns)
    if clashes:
        raise ValueError(
            f"asof_join: left columns {sorted(clashes)} collide with "
            "reserved internal/output names — rename them before the join"
        )
    payload_fields = [F.col(right_ts).alias("ts"), *[F.col(c) for c in right_cols]]
    # A null timestamp is incomparable: drop such right rows up front
    # (under asc ordering they sort FIRST and their payload would be
    # carried into left rows that have no real match — asof_ts null but
    # asof_* populated, the worst kind of silent wrong answer).
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_t"),
        F.struct(*payload_fields).alias("_p"),
        F.lit(0).alias("_is_left"),
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit(1).alias("_is_left"),
    )
    r = r.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in l_cols], "_t", "_p", "_is_left")

    if direction == "backward":
        # right rows sort before the left row at equal ts ("at-or-before");
        # payload asc → last() carries the LARGEST payload among ts ties.
        order = [F.asc("_t"), F.asc("_is_left"), F.asc("_p")]
    else:
        # descending time; right-before-left at equal ts; payload desc →
        # last() carries the SMALLEST payload among ts ties.
        order = [F.desc("_t"), F.asc("_is_left"), F.desc("_p")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    # a null LEFT timestamp is equally incomparable — no match (under
    # desc ordering it sorts last and would inherit the final payload)
    match = F.when(F.col("_t").isNotNull(), F.col("_m"))
    if tolerance is not None:
        in_range = (
            (match["ts"] >= F.col("_t") - tolerance)
            if direction == "backward"
            else (match["ts"] <= F.col("_t") + tolerance)
        )
        match = F.when(in_range, match)
    return carried.select(
        *l_cols,
        match["ts"].alias("asof_ts"),
        *[match[c].alias(f"asof_{c}") for c in right_cols],
    )
