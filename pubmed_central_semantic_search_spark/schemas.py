"""Fixed StructType schemas (SURVEY §1.4).

The reference's schema is implicit (Enum field names + an assert,
``src/backend/data_fetching/data_fields.py:4-7``,
``data_fetcher.py:44``; Qdrant payloads are schemaless). Our engine fixes
explicit columnar schemas — the normalization decision recorded in SURVEY
§1.1: ``sections`` is always ``array<array<string>>`` aligned index-wise
with ``section_names``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical field names (mirrors data_fields.py:4-7).
ARTICLE_ID = "article_id"
SECTION_NAMES = "section_names"
SECTIONS = "sections"
ABSTRACT_TEXT = "abstract_text"

ARTICLES_SCHEMA = T.StructType(
    [
        T.StructField(ARTICLE_ID, T.StringType(), False),
        T.StructField(SECTION_NAMES, T.ArrayType(T.StringType()), False),
        T.StructField(SECTIONS, T.ArrayType(T.ArrayType(T.StringType())), False),
        T.StructField(ABSTRACT_TEXT, T.StringType(), True),
    ]
)

# One row per chunk — the explode of the nested article (Qdrant CHUNKS
# payload, qdrant.py:31-39,124-131). paragraph_id is the chunk's position
# WITHIN its section (enumerate, qdrant.py:128).
CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField(ARTICLE_ID, T.StringType(), False),
        T.StructField("section_id", T.IntegerType(), False),
        T.StructField("section_name", T.StringType(), True),
        T.StructField("paragraph_id", T.IntegerType(), False),
        T.StructField("paragraph", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

# Document-level vectors (Qdrant MAIN collection, qdrant.py:21-29).
DOC_VECTORS_SCHEMA = T.StructType(
    [
        T.StructField("doc_pk", T.LongType(), False),
        T.StructField(ARTICLE_ID, T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)

QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("query_text", T.StringType(), False),
    ]
)
