"""Mean-pooling of vectors (SURVEY §2.5 E3 / §2.7 A1).

Reference: document vector = numpy mean over the article's chunk embeddings
(``/root/reference/src/backend/database/qdrant.py:121``).

Spark design — two shapes:

- ``mean_pool_flat``: posexplode components → hash-aggregate on
  ``(group, pos)``. Partial (map-side) aggregation means the shuffle carries
  one partial sum per (group, pos, partition), NOT dim× the row count —
  this is the 100 TB-safe shape and also the oracle-checkable one.
- ``mean_pool``: same aggregation, then re-assembles ``array<double>``
  ordered by component index. Used by the document pipeline.

Both are pure DataFrame ops — no UDF, no driver collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double


def mean_pool_flat(
    df: DataFrame, group: Sequence[str], vec_col: str = "embedding"
) -> DataFrame:
    """Per-group element-wise mean, one row per (group, component pos)."""
    exploded = df.select(
        *group, F.posexplode(as_double(vec_col)).alias("pos", "val")
    )
    return exploded.groupBy(*group, "pos").agg(F.avg("val").alias("mean_val"))


def mean_pool(
    df: DataFrame,
    group: Sequence[str],
    vec_col: str = "embedding",
    out_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Per-group mean vector re-assembled as ``array<double>``.

    With ``dim`` known (the common case — the encoder fixes it), this is
    ONE hash aggregate of `dim` avg columns: one shuffle whose map-side
    partials are (groups-per-partition × dim) doubles. The dim-agnostic
    fallback explodes components first, which shuffles dim× the row count
    — correct, but strictly more data in flight; always pass ``dim`` in
    pipelines.
    """
    if dim is not None:
        if dim < 1:
            raise ValueError(f"mean_pool: dim must be >= 1, got {dim}")
        # row-level geometry guard (the k-means/PQ/PCA rule): a vector
        # LONGER than dim would silently truncate into the pooled mean
        # (wrong doc vectors, no error — e.g. an engine reconstructed
        # with a smaller dim over previously-ingested embeddings), and a
        # shorter one aborts mid-aggregate with an opaque
        # INVALID_ARRAY_INDEX under ANSI. Nulls stay null (avg skips).
        raw = as_double(vec_col)
        guard = F.when(raw.isNull(), raw).when(
            F.size(raw) == dim, raw
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("mean_pool: vector length "),
                    F.size(raw).cast("string"),
                    F.lit(f" != dim = {dim}"),
                )
            ).cast("array<double>")
        )
        # stage the guarded vector ONCE behind a projection boundary —
        # referencing the when-tree inside each of the dim avg columns
        # would inline dim copies of it (trees, not DAGs)
        staged = df.select(*group, guard.alias("_gv"))
        pooled = staged.groupBy(*group).agg(
            *[F.avg(F.col("_gv")[i]).alias(f"_m{i}") for i in range(dim)]
        )
        # a group whose every vector is NULL pools to NULL (null in →
        # null out), not an array of dim nulls — and identically in BOTH
        # branches (review find: the dim branch emitted [null]*dim while
        # the dim-agnostic branch silently DROPPED the group, so the two
        # call shapes produced different doc-vector row sets). The gate
        # is ALL dim components null (coalesce), not component 0 alone:
        # a group whose vectors carry element-level NULL at position 0
        # but real values elsewhere pools to [null, m1, ...] in both
        # branches (second review find — the _m0 sentinel nulled it here
        # while the dim-agnostic branch kept the surviving cells)
        arr = F.array(*[f"_m{i}" for i in range(dim)])
        alive = F.coalesce(*[F.col(f"_m{i}") for i in range(dim)]).isNotNull()
        return pooled.select(*group, F.when(alive, arr).alias(out_col))
    # posexplode_outer keeps all-null groups alive as a (null, null)
    # component row; the assembly filters that cell back out and maps an
    # empty result to NULL — same convention as the dim branch
    exploded = df.select(
        *group, F.posexplode_outer(as_double(vec_col)).alias("pos", "val")
    )
    flat = exploded.groupBy(*group, "pos").agg(F.avg("val").alias("mean_val"))
    assembled = flat.groupBy(*group).agg(
        F.filter(
            F.sort_array(F.collect_list(F.struct("pos", "mean_val"))),
            lambda s: s["pos"].isNotNull(),
        ).alias("_cells")
    )
    return assembled.select(
        *group,
        F.when(
            F.size("_cells") > 0,
            F.transform(F.col("_cells"), lambda s: s["mean_val"]),
        ).alias(out_col),
    )
