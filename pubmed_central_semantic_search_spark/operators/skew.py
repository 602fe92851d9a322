"""Skew mitigation (brief: "skewed keys hurt … salting for skew, AQE for
runtime re-plan").

AQE's skew-join handling (on in ``session.py``) splits oversized shuffle
partitions automatically — that is the first line of defense and needs no
code. The operators here cover the cases AQE cannot fix:

- ``salted_join``: a single hot key (one article cited everywhere, one
  empty-string language tag) lands every matching row on ONE task. AQE can
  split a skewed partition only for sort-merge joins reading shuffle files;
  for hash-partitioned equi-joins against a replicable right side, salting
  is the classic cure: the big side gets a deterministic salt in
  ``[0, n)``, the small side is exploded n× (one copy per salt), and the
  join key becomes ``(key, salt)`` — the hot key's rows spread over n
  tasks. Result set is IDENTICAL to the unsalted join (the salt is an
  internal column, dropped on output).
- ``salted_distinct_count``: exact count-distinct on a skewed key pair —
  two-stage: distinct on (key, salt, value) first (spreads the hot key),
  then merge. Same two-shuffle cost as plain distinct+count, but no
  single-task hot spot.

The salt must be DETERMINISTIC per row (task retries must re-derive the
same salt or shuffle-replay breaks): hash of stable row columns, never
``rand()``/partition id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(cols: Sequence[Column | str], n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): xxhash64 of stable row columns."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_by: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated n×.

    ``salt_by``: stable big-side columns that distinguish rows WITHIN a hot
    key (e.g. the big table's own primary key) — they feed the salt hash.
    Output columns = the plain join's (salt is internal). ``small`` grows
    n_salt× — keep it the genuinely small side.

    Only big-side-preserving joins are accepted: a small-side-preserving
    ``how`` ('right'/'full') would emit one null-padded copy of every
    unmatched small row PER SALT REPLICA (n_salt duplicates where the
    plain join has one) — the 'identical to the unsalted join' contract
    cannot hold there.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti",
    }
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not big-side-preserving — the "
            f"replicated small side would duplicate unmatched rows; use one "
            f"of {sorted(allowed)}"
        )
    # the reserved-column rule (the upsert writer's _bucket lesson):
    # withColumn would silently REPLACE a caller's _salt and corrupt the
    # join key (round-8 review find)
    if "_salt" in big.columns or "_salt" in small.columns:
        raise ValueError(
            "salted_join: an input frame already carries a '_salt' column "
            "— the reserved internal name; rename it before the join"
        )
    big_s = big.withColumn("_salt", salt_column(salt_by, n_salt))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = big_s.join(small_s, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group: Sequence[str],
    value_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Exact per-group count-distinct that survives one group holding most
    of the data: spread the group over (group, salt) for the distinct
    stage, then sum the per-salt distinct counts (sets are disjoint across
    salts because the salt is a function of the value).

    NULL semantics match ``F.countDistinct`` exactly (round-8 review
    find: the first cut counted NULL as a distinct value — a=3 where
    countDistinct says 2): null values are excluded from the count, and
    a group whose values are ALL null still appears with n_distinct=0
    (the group set rides a separate group-cardinality-sized distinct,
    never a data-sized join side)."""
    if "_salt" in df.columns or "_v" in df.columns:
        raise ValueError(
            "salted_distinct_count: input carries a reserved internal "
            "column ('_salt'/'_v') — rename it first"
        )
    salted = (
        df.select(
            *group, F.col(value_col).alias("_v"),
            salt_column([value_col], n_salt).alias("_salt"),
        )
        .filter(F.col("_v").isNotNull())
        .distinct()
    )
    per_salt = salted.groupBy(*group, "_salt").agg(
        F.count(F.lit(1)).alias("_c")
    )
    counts = per_salt.groupBy(*group).agg(F.sum("_c").alias("_n"))
    # Null-safe equality on every group column: a NULL group key is a
    # real group to countDistinct (round-9 ADVICE find — a plain
    # name-based join drops it, reporting n_distinct=0 for a group that
    # has non-null distinct values). Join on renamed right-side keys so
    # the condition is unambiguous, then keep the left-side columns.
    counts_r = counts.select(
        *[F.col(g).alias(f"_r_{g}") for g in group], "_n"
    )
    groups = df.select(*group).distinct()
    cond = None
    for g in group:
        c = F.col(g).eqNullSafe(F.col(f"_r_{g}"))
        cond = c if cond is None else (cond & c)
    return groups.join(counts_r, cond, "left").select(
        *group, F.coalesce("_n", F.lit(0)).alias("n_distinct")
    )
