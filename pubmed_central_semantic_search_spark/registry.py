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
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import vector
from .operators.topk import top_k

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Deterministic 64-dim query vector shared by Spark plans and oracle SQL.
# Pure function of the index — no RNG, no wall clock — so both sides embed
# the exact same literal.
QUERY_DIM = 64
QUERY_VEC = [round(math.sin(0.7 * i + 0.3), 6) for i in range(QUERY_DIM)]


def _sql_vec(vec: list[float]) -> str:
    return "CAST([" + ", ".join(repr(v) for v in vec) + "] AS DOUBLE[])"


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


# ---------------------------------------------------------------------------
# Q1 flagship — top-5 cosine similarity over document vectors.
# Reference semantics: qdrant.py:202-205 (cosine top-k over the MAIN
# collection). Spark plan: scan → JVM-side cosine expression →
# TakeOrderedAndProject (per-partition k-heap + driver merge; no shuffle).


@register(
    "q1_topk_cosine",
    f"""
    SELECT vec_id, label,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), {_sql_vec(QUERY_VEC)}), 6) AS score
    FROM embeddings
    ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {_sql_vec(QUERY_VEC)}) DESC, vec_id
    LIMIT 5
    """,
    survey_rows="Q1, A4, S3, E2",
)
def q1_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qv = F.lit(QUERY_VEC)
    scored = emb.select(
        "vec_id",
        "label",
        vector.cosine_similarity("embedding", qv).alias("score"),
    )
    return top_k(scored, "score", 5, tiebreak=["vec_id"]).withColumn(
        "score", F.round("score", 6)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
