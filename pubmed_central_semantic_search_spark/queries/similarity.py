"""Similarity-search queries (SURVEY §2.6 Q1/Q3, §2.5 E3, §2.7 A1/A4).

The reference's core capability: cosine top-k over document vectors
(``/root/reference/src/backend/database/qdrant.py:202-205``), multi-query
batches (``qdrant.py:233-247``), and mean-pooled document vectors
(``qdrant.py:121``) — re-expressed as Catalyst plans over the driver's
``embeddings`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector
from ..operators.pooling import mean_pool_flat
from ..operators.topk import grouped_top_k, top_k
from ..registry import QUERY_VEC, QUERY_VECS, load, register, sql_vec

# ---------------------------------------------------------------------------
# Q1 flagship — top-5 cosine over document vectors.
# Plan: scan → JVM-side cosine expression → TakeOrderedAndProject
# (per-partition k-heap + driver merge of k·partitions rows; no shuffle,
# no global sort — the shape that survives 100 TB).

_COS = f"list_cosine_similarity(CAST(embedding AS DOUBLE[]), {sql_vec(QUERY_VEC)})"


@register(
    "q1_topk_cosine",
    f"""
    SELECT vec_id, label, round({_COS}, 6) AS score
    FROM embeddings
    ORDER BY {_COS} DESC, vec_id
    LIMIT 5
    """,
    survey_rows="Q1, A4, S3, E2",
)
def q1_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    scored = emb.select(
        "vec_id",
        "label",
        vector.cosine_similarity("embedding", F.lit(QUERY_VEC)).alias("score"),
    )
    return top_k(scored, "score", 5, tiebreak=["vec_id"]).withColumn(
        "score", F.round("score", 6)
    )


# ---------------------------------------------------------------------------
# Q3 — multi-query batch: 3 query vectors × all documents, per-query top-3.
# The reference encodes all queries in one batch then loops `_query_single`
# (qdrant.py:233-247); here it is ONE plan: broadcast the tiny query side
# into a crossJoin (no shuffle of the big side), score, ranking window
# partitioned by query_id.

_Q3_ORACLE_VECS = ",\n      ".join(
    f"({qid}, {sql_vec(v)})" for qid, v in QUERY_VECS.items()
)


@register(
    "q3_multiquery_topk",
    f"""
    WITH queries(query_id, qvec) AS (VALUES
      {_Q3_ORACLE_VECS}
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qvec) AS raw
      FROM embeddings e CROSS JOIN queries q
    )
    SELECT query_id, vec_id, round(raw, 6) AS score
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, vec_id) <= 3
    """,
    survey_rows="Q3, Q2, Q7, A4",
)
def q3_multiquery_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qdf = spark.createDataFrame(
        [(qid, v) for qid, v in QUERY_VECS.items()], "query_id int, qvec array<double>"
    )
    scored = emb.crossJoin(F.broadcast(qdf)).select(
        "query_id",
        "vec_id",
        vector.cosine_similarity("embedding", F.col("qvec")).alias("raw"),
    )
    out = grouped_top_k(scored, ["query_id"], "raw", 3, tiebreak=["vec_id"])
    return out.select("query_id", "vec_id", F.round("raw", 6).alias("score"))


# ---------------------------------------------------------------------------
# E3 — mean-pooled vectors, grouped. The reference mean-pools chunk vectors
# into a document vector (`article_embeddings.mean(axis=0)`, qdrant.py:121).
# Driver-table analog: mean embedding per label. Emitted flat (label, pos,
# mean_val) — scalar floats, no nested-list hashing hazards.


@register(
    "q12_mean_pool_grouped",
    """
    WITH e AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(CAST(embedding AS DOUBLE[])) AS val
      FROM embeddings
    )
    SELECT label, pos, round(avg(val), 6) AS mean_val
    FROM e GROUP BY label, pos
    """,
    survey_rows="E3, A1, N1, N5 (the oracle's `e` CTE is the posexplode "
    "alignment contract — per-(label,pos) means only match if component "
    "positions line up between engines)",
)
def q12_mean_pool_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return mean_pool_flat(emb, group=["label"], vec_col="embedding").select(
        "label", "pos", F.round("mean_val", 6).alias("mean_val")
    )


# ---------------------------------------------------------------------------
# X2/X3 storage tier — int8 symmetric quantization of the embedding
# column (4× smaller vectors at 100 TB). The contract checked in BOTH
# engines: per label, reconstruction cosine stays ≥ 0.999 on every vector
# and the whole quantize→dequantize round trip is bit-deterministic.


@register(
    "q47_quantization_error",
    """
    WITH q AS (
      SELECT label,
             CAST(embedding AS DOUBLE[]) AS emb,
             CASE WHEN list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) > 0
                  THEN list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0
                  ELSE 1.0 END AS scale
      FROM embeddings
    ),
    d AS (
      SELECT label, emb,
             list_transform(list_transform(emb, x -> round(x / scale)),
                            v -> v * scale) AS deq
      FROM q
    )
    SELECT label,
           count(*) AS n_vecs,
           round(avg(list_cosine_similarity(emb, deq)), 4) AS avg_cos,
           min(list_cosine_similarity(emb, deq)) >= 0.999 AS all_above_999
    FROM d
    GROUP BY label
    """,
    survey_rows="X2/X3 (int8 embedding quantization — the 4× storage tier)",
)
def q47_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import cosine_similarity
    from ..operators.quantize import dequantize, with_quantized

    emb = load(spark, sf_dir, "embeddings")
    d = with_quantized(emb).withColumn(
        "deq", dequantize("q_vec", F.col("q_scale"))
    )
    cos = cosine_similarity("embedding", F.col("deq"))
    return d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(cos), 4).alias("avg_cos"),
        (F.min(cos) >= 0.999).alias("all_above_999"),
    )
