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
from ..session import local_df

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
    qdf = local_df(spark, 
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
# X2/X3 storage tier — BOTH compressed-vector tiers as a tagged union:
# kind='int8' — symmetric int8 quantization (4× smaller, operators/
#               quantize.py): per label, reconstruction cosine ≥ 0.999 on
#               every vector, round trip bit-deterministic.
# kind='pq'   — product quantization (32× smaller, operators/pq.py,
#               Jégou et al. TPAMI'11): the ORACLE certifies the encode
#               argmin (integer code checksum — any engine disagreement
#               on a single code breaks the hash) and the ADC lookup sum
#               (avg over the per-subspace LUT of QUERY_VEC) against a
#               formula-derived codebook tensor inlined as the SAME
#               literal in both engines. Training stays unit-pinned
#               (deterministic seeds+Lloyd, tests/test_pq.py) — this row
#               certifies the encode+score math the 100 TB scan runs.
# Column mapping: avg_cos/all_above_999 are int8-only; code_checksum/
# avg_adc are pq-only (NULL elsewhere).

_PQ_M, _PQ_KSUB, _PQ_DSUB = 8, 16, 8


def _pq_books() -> list[list[list[float]]]:
    """Deterministic, data-independent codebooks — small exact rationals
    (k/11) so both engines parse identical doubles from the same repr."""
    return [
        [
            [((c * 31 + i * 17 + s * 7) % 23 - 11) / 11.0 for i in range(_PQ_DSUB)]
            for c in range(_PQ_KSUB)
        ]
        for s in range(_PQ_M)
    ]


def _pq_books_sql() -> str:
    books = _pq_books()
    lit = (
        "["
        + ", ".join(
            "[" + ", ".join("[" + ", ".join(repr(v) for v in c) + "]" for c in b) + "]"
            for b in books
        )
        + "]"
    )
    return f"CAST({lit} AS DOUBLE[][][])"


def _pq_lut_sql() -> str:
    from ..operators.pq import adc_lut
    from ..registry import QUERY_VEC

    lut = adc_lut(QUERY_VEC, _pq_books())
    lit = (
        "["
        + ", ".join("[" + ", ".join(repr(v) for v in row) + "]" for row in lut)
        + "]"
    )
    return f"CAST({lit} AS DOUBLE[][])"


# The DEMOTED q47 'pq' arm (oracle-tower amortization policy, round 8;
# driver-green r3-r7): PQ encode argmin + ADC lookup scoring, its
# codebooks/LUT deterministic literals the oracle reproduces exactly.
# DuckDB parity runs as pytest
# (tests/test_pq.py::test_q47_pq_duckdb_parity_demoted) over this SAME
# CTE text; the bench number is the x_pq_adc extras entry.
_Q47_PQ_PARITY_SQL_TEMPLATE = """
    WITH pqv AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS v,
             {books} AS books, {lut} AS lut
      FROM embeddings
    ),
    enc AS (
      SELECT label, lut,
             list_transform(
               list_transform(range(1, {m} + 1), s ->
                 list_transform(books[s], cent ->
                   list_reduce(
                     list_prepend(0.0e0,
                       list_transform(range(1, {dsub} + 1), i ->
                         cent[i] * cent[i] - 2.0e0 * v[(s - 1) * {dsub} + i] * cent[i])),
                     (acc, t) -> acc + t))),
               dists -> list_position(dists, list_min(dists)) - 1
             ) AS codes
      FROM pqv
    ),
    pqs AS (
      SELECT label,
             CAST(list_reduce(
               list_transform(range(1, {m} + 1), s -> CAST(codes[s] * s AS BIGINT)),
               (acc, t) -> acc + t) AS BIGINT) AS cksum,
             list_reduce(
               list_prepend(0.0e0,
                 list_transform(range(1, {m} + 1), s -> lut[s][codes[s] + 1])),
               (acc, t) -> acc + t) AS adc
      FROM enc
    )
    SELECT 'pq' AS kind,
           label,
           count(*) AS n_vecs,
           CAST(sum(cksum) AS BIGINT) AS code_checksum,
           round(avg(adc), 6) AS avg_adc
    FROM pqs
    GROUP BY label
    """


def q47_pq_parity_sql() -> str:
    return _Q47_PQ_PARITY_SQL_TEMPLATE.format(
        books=_pq_books_sql(), lut=_pq_lut_sql(), m=_PQ_M, dsub=_PQ_DSUB
    )


def pq_adc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The demoted q47 'pq' arm's Spark side — also the x_pq_adc bench
    entry: narrow PQ encode (argmin per sub-vector against deterministic
    codebook literals), per-label code checksum + mean ADC score."""
    from ..operators.pq import pq_adc_score, pq_encode
    from ..registry import QUERY_VEC

    emb = load(spark, sf_dir, "embeddings")
    books = _pq_books()
    coded = emb.select(
        "label", pq_encode("embedding", books).alias("_codes")
    ).select(
        "label",
        F.aggregate(
            F.zip_with(
                "_codes",
                F.lit(list(range(1, _PQ_M + 1))),
                lambda c, w: (c * w).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + t,
        ).alias("cksum"),
        pq_adc_score("_codes", QUERY_VEC, books).alias("adc"),
    )
    return coded.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("cksum").alias("code_checksum"),
        F.round(F.avg("adc"), 6).alias("avg_adc"),
    ).select(
        F.lit("pq").alias("kind"),
        "label",
        "n_vecs",
        "code_checksum",
        "avg_adc",
    )


# --- q47 'pca' arm (round-9 backfill for the demotion wave) ---------------
# Certifies the PCA projection + whitening APPLICATION path
# (operators/projection.pca_project — packed literals, zip_with/aggregate
# left fold, the driver-side whitening fold of _effective_components)
# value-for-value through the driver oracle on the real embeddings table.
# The honest split the H2 row uses: the numpy-eigh FIT stays pytest-pinned
# (tests/test_projection.py::test_fit_matches_numpy); the registry arm
# rides a FORMULA model — mean/components/eigenvalues are pure functions
# of the index, so both engines embed the exact same literals at any SF
# (a fitted matrix cannot ride a static oracle string: the fit depends on
# the data the driver points at).
_PCA_ARM_K, _PCA_ARM_EPS = 4, 1e-9


def _pca_arm_model():
    import math

    from ..operators.projection import PCAModel
    from ..registry import QUERY_DIM

    d, k = QUERY_DIM, _PCA_ARM_K
    return PCAModel(
        mean=[round(0.1 * math.sin(0.05 * i + 0.2), 6) for i in range(d)],
        components=[
            [round(math.sin(0.31 * (j + 1) + 0.17 * i + 0.05), 6)
             for i in range(d)]
            for j in range(k)
        ],
        eigvals=[round(2.0 / (j + 1), 6) for j in range(k)],
        n=0,
    )


def _pca_arm_sql_lits() -> tuple[str, str]:
    """(mean, effective-components) as SQL double-array literals — the
    components carry the SAME Python-folded whitening scales the Spark
    plan embeds (_effective_components), so the two engines multiply by
    bit-identical literals."""
    from ..operators.projection import _effective_components

    m = _pca_arm_model()
    comps = _effective_components(m, whiten=True, eps=_PCA_ARM_EPS)
    mean_sql = "CAST([" + ", ".join(repr(v) for v in m.mean) + "] AS DOUBLE[])"
    comp_sql = (
        "CAST(["
        + ", ".join("[" + ", ".join(repr(x) for x in row) + "]" for row in comps)
        + "] AS DOUBLE[][])"
    )
    return mean_sql, comp_sql


def _q47_oracle() -> str:
    from ..registry import QUERY_DIM

    mean_sql, comp_sql = _pca_arm_sql_lits()
    z_cols_o = ", ".join(
        f"round(avg(z[{j + 1}]), 6) AS z{j + 1}" for j in range(_PCA_ARM_K)
    )
    z_nulls = ", ".join(
        f"CAST(NULL AS DOUBLE) AS z{j + 1}" for j in range(_PCA_ARM_K)
    )
    return f"""
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
    ),
    pc AS (SELECT {mean_sql} AS mu, {comp_sql} AS w),
    pz AS (
      -- the whitened projection replayed term for term: z_j =
      -- left-fold over i of w_eff[j][i] * (v[i] - mu[i]) — the same
      -- sequential fold order F.aggregate uses (the pq-arm precedent)
      SELECT label,
             list_transform(range(1, {_PCA_ARM_K} + 1), j ->
               list_reduce(list_prepend(0.0e0,
                 list_transform(range(1, {QUERY_DIM} + 1), i ->
                   w[j][i] * (emb[i] - mu[i]))),
                 (acc, x) -> acc + x)) AS z
      FROM q CROSS JOIN pc
    )
    SELECT 'int8' AS kind,
           label,
           count(*) AS n_vecs,
           round(avg(list_cosine_similarity(emb, deq)), 4) AS avg_cos,
           round(min(list_cosine_similarity(emb, deq)), 6) >= 0.999
             AS all_above_999,
           {z_nulls}
    FROM d
    GROUP BY label
    UNION ALL
    SELECT 'pca' AS kind,
           label,
           count(*) AS n_vecs,
           CAST(NULL AS DOUBLE) AS avg_cos,
           CAST(NULL AS BOOLEAN) AS all_above_999,
           {z_cols_o}
    FROM pz
    GROUP BY label
    """


@register(
    "q47_quantization_error",
    _q47_oracle(),
    survey_rows="X2/X3 (int8 embedding quantization — the 4x storage "
    "tier) + PCA projection/whitening application (round-9 backfill: "
    "pca_project with whiten=True over a formula model — packed "
    "literals, zip_with/aggregate fold, and the driver-side whitening "
    "fold all replayed value for value; the numpy-eigh FIT stays "
    "pytest-pinned, the honest split H2 uses). The 'pq' arm (PQ encode "
    "argmin + ADC lookup scoring — the 32x tier) was DEMOTED under the "
    "amortization policy after five green rounds (r3-r7): its DuckDB "
    "parity runs as pytest "
    "(tests/test_pq.py::test_q47_pq_duckdb_parity_demoted) over the same "
    "CTE text, and x_pq_adc keeps the bench number",
)
def q47_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import cosine_similarity
    from ..operators.projection import pca_project
    from ..operators.quantize import dequantize, with_quantized

    # two arms read the embeddings column once each — both narrow
    # projections over the scan, no persist needed (AQE reuses nothing
    # here by design: different aggregates over different expressions)
    emb = load(spark, sf_dir, "embeddings")
    d = with_quantized(emb).withColumn(
        "deq", dequantize("q_vec", F.col("q_scale"))
    )
    cos = cosine_similarity("embedding", F.col("deq"))
    z_nulls = [
        F.lit(None).cast("double").alias(f"z{j + 1}") for j in range(_PCA_ARM_K)
    ]
    int8 = d.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(cos), 4).alias("avg_cos"),
        # round BEFORE the threshold (the repo's rounding discipline):
        # the two engines accumulate the cosine in different orders, and
        # a boolean flipped by float noise at 0.999 hash-mismatches
        (F.round(F.min(cos), 6) >= 0.999).alias("all_above_999"),
    ).select(
        F.lit("int8").alias("kind"),
        "label",
        "n_vecs",
        "avg_cos",
        "all_above_999",
        *z_nulls,
    )
    pz = pca_project(
        emb, _pca_arm_model(), vec_col="embedding", out_col="z",
        whiten=True, eps=_PCA_ARM_EPS,
    )
    pca = pz.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        *[
            F.round(F.avg(F.element_at("z", j + 1)), 6).alias(f"z{j + 1}")
            for j in range(_PCA_ARM_K)
        ],
    ).select(
        F.lit("pca").alias("kind"),
        "label",
        "n_vecs",
        F.lit(None).cast("double").alias("avg_cos"),
        F.lit(None).cast("boolean").alias("all_above_999"),
        *[F.col(f"z{j + 1}") for j in range(_PCA_ARM_K)],
    )
    return int8.unionByName(pca)


