"""Count–min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
estimation for the sketch tier (the HLL cardinality sketch is certified in
q45; CMS adds approximate per-key counts).

Why a sketch when ``groupBy(key).count()`` is exact: the CMS is
CONSTANT-SIZED (depth × width cells, independent of key cardinality) and
merges by elementwise addition — the shape that works when counts must be
kept per time-window/per-shard and combined later, or fed from a stream
where the exact groupBy's state would grow with distinct keys. At 100 TB:
one narrow explode (depth rows per input row) → ONE partial-aggregated
groupBy on (row, bucket) → at most depth×width output rows; sketches from
different partitions/days/streams union + sum without ever re-reading the
data.

Hashes are content-addressed (md5-derived, like the sampling/split
family), so two engines — or two clusters — build BIT-IDENTICAL sketches:
the DuckDB parity test recomputes the whole sketch in SQL.

All pure Catalyst; estimation collects the sketch (driver-sized by
construction) and answers point queries from a dict.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key_col: Column | str, row: int, width: int) -> Column:
    """Bucket of ``key`` in hash row ``row`` — the shared md5-prefix
    primitive (``curation.md5_prefix_long``) mod width. Pure per-row."""
    from .curation import md5_prefix_long

    return (md5_prefix_long(key_col, f"#cms{row}") % width).cast("int")


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Sparse CMS: (row, bucket, cnt) — zero cells omitted. One narrow
    explode + one keyed aggregate; ≤ depth×width output rows."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), cms_bucket(key_col, i, width).alias("bucket")
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union + elementwise sum — the CMS mergeability property. Sketch of
    a union of frames ≡ merge of per-frame sketches (test-pinned)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: Sequence[str], depth: int = 4, width: int = 256
) -> dict[str, int]:
    """Point queries: est(key) = min over rows of the key's cell. Always
    ≥ the true count; over by at most ~2N/width w.h.p. The sketch is
    depth×width cells — a driver round-trip by construction."""
    from .curation import md5_prefix_long_py

    cells = {(r["row"], r["bucket"]): r["cnt"] for r in sketch.collect()}

    def bucket(key: str, i: int) -> int:
        # same helper family as cms_bucket — one shared salt convention
        return md5_prefix_long_py(key, f"#cms{i}") % width

    return {
        k: min(cells.get((i, bucket(k, i)), 0) for i in range(depth)) for k in keys
    }
