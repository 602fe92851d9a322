"""Write-path query (SURVEY §2.1 S4/S7/S9) — certifies the sharded
columnar sink, the keyed idempotent upsert, and collection DDL as a
driver-checked CORRECTNESS row, not just unit tests.

Reference semantics being certified: the corpus is saved sharded-columnar
(``/root/reference/dataset/armac_scientific_papers.py:58``,
``max_shard_size="100MB"``); upserts are keyed by a content-derived id so
re-upload OVERWRITES rows with the same key
(``/root/reference/src/backend/database/qdrant.py:137-139,149-175``);
collections are created-if-absent / dropped via DDL (``qdrant.py:69-96``).

The query: write docs 0-149 through the sharded sink (small shard cap →
several files), then upsert docs 50-199 with MODIFIED text (uppercased) —
so the overwrite is observable — then read the table back. The DuckDB
oracle states the expected post-upsert table directly: rows 0-199, text
uppercased exactly where the second batch won. A value match proves the
sink round-trips, the upsert replaces-not-duplicates, and new keys insert.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register
from ..sources.catalog import ensure_table, reset_table, upsert_parquet
from ..sources.jsonl import write_sharded_parquet


@register(
    "q62_write_path_roundtrip",
    """
    SELECT doc_id, source, lang,
           md5(CASE WHEN doc_id >= 50 THEN upper(text) ELSE text END) AS content_key,
           length(CASE WHEN doc_id >= 50 THEN upper(text) ELSE text END) AS n_chars
    FROM documents WHERE doc_id < 200
    """,
    survey_rows="S4 (sharded columnar sink), S7 (keyed idempotent upsert), "
    "S9 (collection DDL), S8 (durable parquet snapshot read-back)",
)
def q62_write_path_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    base = tempfile.mkdtemp(prefix="pmc_writepath_")
    table_path = os.path.join(base, "docs")
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "lang", "text")
    try:
        return _roundtrip(spark, base, table_path, docs)
    finally:
        # the result is MATERIALIZED before cleanup (the returned frame
        # must not lazily read a deleted directory); without this every
        # driver/bench execution leaked two parquet copies in /tmp, and
        # a mid-write failure additionally leaked the catalog table
        shutil.rmtree(base, ignore_errors=True)


def _roundtrip(spark, base, table_path, docs) -> DataFrame:

    # S4 — initial load through the sharded sink (shard cap far below the
    # row count → a multi-file table, like the reference's 100MB shards).
    write_sharded_parquet(
        docs.filter(F.col("doc_id") < 150), table_path, max_records_per_file=40
    )

    # S7 — overlapping upsert with modified payloads: keys 50-149 must be
    # REPLACED (uppercased text wins), keys 150-199 inserted, keys 0-49
    # left untouched.
    upsert_parquet(
        spark,
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 200)).withColumn(
            "text", F.upper("text")
        ),
        table_path,
        key_cols=["doc_id"],
    )

    # S9 — collection DDL round-trip on the same schema (create-if-absent,
    # exists-check, drop — the reference's collection lifecycle). Explicit
    # path: the table data lands in OUR temp dir, never in a
    # spark-warehouse under the caller's working directory (which may not
    # be writable in the driver's environment).
    tname = "writepath_" + uuid.uuid4().hex[:8]
    ensure_table(spark, tname, docs, path=os.path.join(base, "ddl_tbl"))
    try:
        if not spark.catalog.tableExists(tname):
            raise RuntimeError("ensure_table failed to create the collection")
    finally:
        reset_table(spark, tname)

    out = spark.read.parquet(table_path).select(
        "doc_id",
        "source",
        "lang",
        F.md5("text").alias("content_key"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    rows = out.collect()  # materialize before the temp dir is removed
    return spark.createDataFrame(rows, out.schema)
