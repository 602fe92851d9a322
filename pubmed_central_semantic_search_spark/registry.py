"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 lands here as a named entry with:

- ``spark``: ``(SparkSession, sf_dir) -> DataFrame`` building the DataFrame
  plan with this package's operators, and
- ``oracle``: equivalent ANSI SQL for DuckDB over the same parquet views
  (``None`` for genuinely non-SQL-expressible ops → driver does a weaker
  rows-only check).

Column names are aliased identically on both sides (the driver's comparator
sorts columns by name before value-hashing). Float outputs are rounded on
both sides to absorb float32-vs-float64 and summation-order noise.

Query bodies live in ``queries/`` modules grouped by theme; importing them
(bottom of this file) populates ``REGISTRY`` via the ``@register`` decorator.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader rejects without nanosAsLong, and then
        # surfaces as int64 nanos) and plain TIMESTAMP(MICROS). Set the
        # legacy conf so either file opens, then normalize on dtype.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # Integer division: `/` would go through double, and 2024-epoch
            # nanos (~1.7e18) exceed double's 2^53 integer range — the lost
            # low bits showed up as ±1µs vs DuckDB's exact ns→µs floor.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Deterministic 64-dim query vectors shared by Spark plans and oracle SQL.
# Pure functions of the index — no RNG, no wall clock — so both sides embed
# the exact same literal.
QUERY_DIM = 64
QUERY_VEC = [round(math.sin(0.7 * i + 0.3), 6) for i in range(QUERY_DIM)]
QUERY_VECS = {  # multi-query batch (Q3)
    qid: [round(math.sin(0.7 * i + 0.3 + 2.1 * qid), 6) for i in range(QUERY_DIM)]
    for qid in range(3)
}


def sql_vec(vec: list[float]) -> str:
    # -0.0 normalizes to 0.0 (round-11, verdict #6): repr(-0.0) would
    # render the oracle literal as "-0.0" while a Spark-side rendering
    # could disagree in the driver's value-hash; the zeros are equal for
    # every vector op, so normalize — mirrored in functions.vector's
    # _lit_float so both engines see the identical component.
    return (
        "CAST(["
        + ", ".join(repr(0.0 if v == 0.0 else float(v)) for v in vec)
        + "] AS DOUBLE[])"
    )


@dataclass(frozen=True)
class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_rows: str = ""  # SURVEY §2 rows this query certifies


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, survey_rows: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(spark=fn, oracle=oracle, survey_rows=survey_rows)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


# --- populate the registry -------------------------------------------------
from .queries import pipeline, relational, similarity, text_pipeline  # noqa: E402,F401

from .queries import clustering_pack, coverage, curation, dedup_pack, extensions, write_path  # noqa: E402,F401

# Re-export the flagship for __spark_entry__.entry(). LAZY: when a user
# imports a queries/ submodule directly, that module's body re-enters
# this one before its @register calls have run — an eager
# REGISTRY["q1_topk_cosine"] here would KeyError on that path (the
# registry back-fills once the submodule's body resumes).
def q1_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return REGISTRY["q1_topk_cosine"].spark(spark, sf_dir)
