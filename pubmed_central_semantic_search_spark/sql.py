"""SQL-facing surface: temp views + SQL scalar UDFs (Spark 4 `CREATE
TEMPORARY FUNCTION ... RETURN <expr>`).

The reference exposes its capabilities only through Python calls
(`QdrantDatabase.query`, `app.py`); a Spark engine can additionally hand
users a pure-SQL entry point. Every function below is a SQL *expression*
UDF — parsed into Catalyst and codegen'd exactly like the DataFrame
helpers in ``functions/`` (NO Python round-trip, NO slow path) — so
`spark.sql()` users get the same plans the DataFrame API builds.

Example end-to-end (after ``register_sql_surface(spark, sf_dir)``)::

    SELECT vec_id, round(cos_sim(embedding_d(embedding), q), 6) AS score
    FROM embeddings, (SELECT array(...) AS q)
    ORDER BY score DESC LIMIT 5
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .registry import TABLES, load

# name -> (signature, body). Bodies are pure Catalyst expressions — the
# SQL twins of functions/vector.py and functions/text.py.
SQL_FUNCTIONS: dict[str, tuple[str, str]] = {
    "vec_dot": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)",
    ),
    "vec_norm": (
        "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
        "sqrt(aggregate(a, 0D, (s, x) -> s + x * x))",
    ),
    "cos_sim": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
        # zero-norm guard, mirroring the DataFrame twin cosine_similarity:
        # a degenerate vector scores 0.0 — the bare division raised
        # DIVIDE_BY_ZERO under Spark 4's default ANSI mode, so ONE empty
        # document killed any pure-SQL search query (review find;
        # hashed_features legitimately emits zero vectors for empty text)
        "CASE WHEN vec_norm(a) * vec_norm(b) > 0D "
        "THEN vec_dot(a, b) / (vec_norm(a) * vec_norm(b)) ELSE 0D END",
    ),
    "embedding_d": (
        "(a ARRAY<FLOAT>) RETURNS ARRAY<DOUBLE>",
        "transform(a, x -> CAST(x AS DOUBLE))",
    ),
    "token_count": (
        "(t STRING) RETURNS INT",
        "size(filter(split(t, ' '), x -> x != ''))",
    ),
    "doc_key": (
        "(s STRING) RETURNS BIGINT",
        "xxhash64(s)",
    ),
    "h32": (
        "(s STRING, seed INT) RETURNS BIGINT",
        "CAST(conv(substring(md5(concat(s, '#', CAST(seed AS STRING))), 1, 8), 16, 10) AS BIGINT)",
    ),
    "pmc_link": (
        "(article_id STRING) RETURNS STRING",
        "concat('https://pmc.ncbi.nlm.nih.gov/articles/', article_id, '/')",
    ),
    # integer log-histogram quantile-sketch primitives — SQL twins of
    # operators/sketch.py ihist_bucket/ihist_rep (same guards: negative
    # input and beyond-int64 bucket raise; null passes through)
    "ihist_bucket": (
        "(n BIGINT) RETURNS INT",
        "CASE WHEN n IS NULL THEN CAST(NULL AS INT) "
        "WHEN n < 0 THEN CAST(raise_error('ihist_bucket: negative input') AS INT) "
        "WHEN n < 16 THEN CAST(n AS INT) "
        "ELSE CAST(16 + (length(bin(n)) - 1 - 4) * 8 "
        "+ shiftright(n, length(bin(n)) - 1 - 3) - 8 AS INT) END",
    ),
    "ihist_rep": (
        "(b INT) RETURNS BIGINT",
        "CASE WHEN b IS NULL THEN CAST(NULL AS BIGINT) "
        "WHEN b > 487 THEN CAST(raise_error('ihist_rep: bucket beyond the "
        "non-negative int64 range') AS BIGINT) "
        "WHEN b < 16 THEN CAST(b AS BIGINT) "
        "ELSE shiftleft(CAST(8 + (b - 16) % 8 AS BIGINT), "
        "CAST((b - 16) DIV 8 + 1 AS INT)) END",
    ),
}


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotently (re)create the SQL expression UDFs."""
    for name, (sig, body) in SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """One temp view per test-data table (parquet-backed, lazily scanned —
    filters/projections still push down to the files; ``load`` normalizes
    the events table's timestamp encoding whichever way it shipped)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def register_sql_surface(spark: SparkSession, sf_dir: str) -> None:
    register_views(spark, sf_dir)
    register_sql_functions(spark)
