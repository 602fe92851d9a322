"""End-to-end pipeline queries — the reference's flagship semantics
(SURVEY §3.1/§3.2) over driver tables.

- ``q20_semantic_search_e2e``: the COMPLETE query path — doc vectors by
  mean-pooling chunk vectors, per-query top-k docs, filtered top-n chunk
  highlight, ±1 context expansion — oracle-checked in DuckDB end to end.
  Chunk structure is synthesized deterministically from the ``embeddings``
  table (article = vec_id mod 50, paragraph position = vec_id div 50).
- ``q21_document_pipeline``: articles built from ``documents`` → chunk →
  fake-encode (E1 pandas_udf) → mean-pool → semantic search with encoded
  text queries. The fake encoder (encoder.py) is constructed from md5 +
  IEEE-sequential float ops precisely so DuckDB recomputes the SAME
  float32 vectors bit for bit — E1's batch-encode → pool → search path
  is value-hash-checked end to end, not just rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..encoder import DEFAULT_DIM, encode_column, fake_encode_one
from ..operators.chunking import explode_chunks
from ..operators.pooling import mean_pool
from ..operators.render import STRIP_RE, render_hits
from ..operators.search import (
    highlight_chunks,
    score_documents,
    semantic_search,
)
from ..registry import QUERY_VEC, load, register, sql_vec
from ..session import local_df

N_ARTICLES = 50  # synthetic article count for the e2e oracle query


def _synthetic_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        (F.col("vec_id") % N_ARTICLES).cast("string").alias("article_id"),
        F.lit(0).alias("section_id"),
        F.lit("body").alias("section_name"),
        (F.col("vec_id") / N_ARTICLES).cast("int").alias("paragraph_id"),
        F.concat(F.lit("p"), F.col("vec_id")).alias("paragraph"),
        F.col("embedding"),
    )


@register(
    "q20_semantic_search_e2e",
    f"""
    WITH chunk AS (
      SELECT CAST(vec_id % {N_ARTICLES} AS VARCHAR) AS article_id,
             CAST(vec_id // {N_ARTICLES} AS INT) AS paragraph_id,
             'p' || CAST(vec_id AS VARCHAR) AS paragraph,
             CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings
    ),
    comp AS (
      SELECT article_id,
             generate_subscripts(emb, 1) AS pos,
             unnest(emb) AS val
      FROM chunk
    ),
    docvec AS (
      SELECT article_id, list(m ORDER BY pos) AS emb
      FROM (SELECT article_id, pos, avg(val) AS m FROM comp GROUP BY article_id, pos)
      GROUP BY article_id
    ),
    top_docs AS (
      SELECT article_id,
             list_cosine_similarity(emb, {sql_vec(QUERY_VEC)}) AS doc_score
      FROM docvec
      QUALIFY row_number() OVER (
        ORDER BY list_cosine_similarity(emb, {sql_vec(QUERY_VEC)}) DESC, article_id
      ) <= 5
    ),
    chunk_hits AS (
      SELECT c.article_id, d.doc_score, c.paragraph_id,
             list_cosine_similarity(c.emb, {sql_vec(QUERY_VEC)}) AS chunk_score
      FROM chunk c JOIN top_docs d USING (article_id)
      QUALIFY row_number() OVER (
        PARTITION BY c.article_id
        ORDER BY list_cosine_similarity(c.emb, {sql_vec(QUERY_VEC)}) DESC, c.paragraph_id
      ) <= 1
    )
    SELECT 'hl' AS kind, h.article_id,
           round(h.doc_score, 6) AS doc_score,
           h.paragraph_id,
           round(h.chunk_score, 6) AS chunk_score,
           string_agg(n.paragraph, '|' ORDER BY n.paragraph_id) AS context
    FROM chunk_hits h
    JOIN chunk n ON n.article_id = h.article_id
               AND n.paragraph_id BETWEEN h.paragraph_id - 1 AND h.paragraph_id + 1
    GROUP BY h.article_id, h.doc_score, h.paragraph_id, h.chunk_score
    UNION ALL
    -- Q4 highlight=False arm (round-7 backfill, previously unit-only):
    -- the toggle skips chunk search entirely — doc hits alone
    SELECT 'nohl' AS kind, article_id,
           round(doc_score, 6) AS doc_score,
           CAST(NULL AS INT) AS paragraph_id,
           CAST(NULL AS DOUBLE) AS chunk_score,
           CAST(NULL AS VARCHAR) AS context
    FROM top_docs
    """,
    survey_rows="Q1, Q2, Q4 (highlight toggle — BOTH branches driver-"
    "certified since round 7: the 'nohl' arm runs highlight=False's "
    "doc-only conditional plan), Q5, Q6, Q7, E3, A1, A4, §2.8 joins — "
    "full §3.1 path",
)
def q20_semantic_search_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _synthetic_chunks(spark, sf_dir)
    doc_vectors = mean_pool(
        chunks, group=["article_id"], vec_col="embedding", dim=DEFAULT_DIM
    )
    queries = local_df(spark,
        [(0, QUERY_VEC)], "query_id int, qvec array<double>"
    )
    out = semantic_search(
        doc_vectors, chunks, queries, k_docs=5, n_paragraphs=1, context_window=1
    )
    hl = out.select(
        F.lit("hl").alias("kind"),
        "article_id",
        F.round("doc_score", 6).alias("doc_score"),
        "paragraph_id",
        F.round("chunk_score", 6).alias("chunk_score"),
        F.array_join("context_paragraphs", "|").alias("context"),
    )
    nohl = semantic_search(
        doc_vectors, chunks, queries, k_docs=5, highlight=False
    ).select(
        F.lit("nohl").alias("kind"),
        "article_id",
        F.round("doc_score", 6).alias("doc_score"),
        F.lit(None).cast("int").alias("paragraph_id"),
        F.lit(None).cast("double").alias("chunk_score"),
        F.lit(None).cast("string").alias("context"),
    )
    return hl.unionByName(nohl)


def _sql_fake_encode(src: str, text_col: str, dim: int = DEFAULT_DIM) -> str:
    """See queries/oracle_helpers.sql_fake_encode (moved there so modules
    can use it at registration time without re-entering this module's
    registry import cycle)."""
    from .oracle_helpers import sql_fake_encode

    return sql_fake_encode(src, text_col, dim)


_Q21_QUERIES = [(0, "spark query join"), (1, "stream window merge")]


def _q21_oracle() -> str:
    qvals = ", ".join(
        f"({qid}, {sql_vec([float(x) for x in fake_encode_one(text)])})"
        for qid, text in _Q21_QUERIES
    )
    return f"""
    WITH d AS (
      SELECT CAST(doc_id AS VARCHAR) AS article_id,
             string_split(text, ' ') AS toks
      FROM documents
    ),
    paras AS (
      SELECT article_id, 0 AS section_id, 'Abstract' AS section_name,
             0 AS paragraph_id, array_to_string(toks[1:8], ' ') AS paragraph
      FROM d
      UNION ALL
      SELECT article_id, 1, 'Body', CAST(i AS INT),
             array_to_string(toks[i * 16 + 9 : i * 16 + 24], ' ')
      FROM d, UNNEST(range(0,
             CAST(floor(greatest((len(toks) - 9) / 16.0, 0)) AS BIGINT) + 1)) AS t(i)
    ),
    chunk AS (SELECT * FROM paras WHERE paragraph <> ''),
    {_sql_fake_encode("chunk", "paragraph")},
    comp AS (
      SELECT article_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS val
      FROM chunk_enc
    ),
    docvec AS (
      SELECT article_id, list(m ORDER BY pos) AS emb
      FROM (SELECT article_id, pos, avg(val) AS m FROM comp GROUP BY article_id, pos)
      GROUP BY article_id
    ),
    qs AS (SELECT * FROM (VALUES {qvals}) AS q(query_id, qvec)),
    top_docs AS (
      SELECT query_id, qvec, article_id,
             list_cosine_similarity(emb, qvec) AS doc_score
      FROM docvec, qs
      QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY list_cosine_similarity(emb, qvec) DESC, article_id
      ) <= 5
    ),
    chunk_hits AS (
      SELECT t.query_id, c.article_id, t.doc_score, c.section_name,
             c.paragraph_id,
             list_cosine_similarity(c.emb, t.qvec) AS chunk_score
      FROM chunk_enc c JOIN top_docs t USING (article_id)
      QUALIFY row_number() OVER (
        PARTITION BY t.query_id, c.article_id
        ORDER BY list_cosine_similarity(c.emb, t.qvec) DESC,
                 c.section_id, c.paragraph_id
      ) <= 2
    )
    SELECT h.query_id, h.article_id,
           round(h.doc_score, 6) AS doc_score,
           h.section_name, h.paragraph_id,
           round(h.chunk_score, 6) AS chunk_score,
           string_agg(n.paragraph, '|' ORDER BY n.paragraph_id) AS context
    FROM chunk_hits h
    JOIN chunk n ON n.article_id = h.article_id
               AND n.section_name = h.section_name
               AND n.paragraph_id BETWEEN h.paragraph_id - 1 AND h.paragraph_id + 1
    GROUP BY h.query_id, h.article_id, h.doc_score, h.section_name,
             h.paragraph_id, h.chunk_score
    """


@register(
    "q21_document_pipeline",
    _q21_oracle(),
    survey_rows="E1 (value-checked: the md5 fake encoder is recomputed "
    "bit-exactly in the oracle), E3, F1, N2, Q1-Q7 — full §3.2 ingest + "
    "§3.1 query path",
)
def q21_document_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import prepend_abstract

    docs = load(spark, sf_dir, "documents")
    # Articles from flat documents: "Abstract" = first 8 tokens, "Body" =
    # the rest in 16-token paragraphs (slice on the token array — narrow,
    # no shuffle). The abstract rides in through the REAL P6 operator
    # (prepend_abstract, round-7 backfill: P6 was U-only before — the
    # arm now drives data_fetcher.py:40's prepend semantics through the
    # driver's value oracle; 'paragraph' level because the synthetic
    # corpus is single-line, so the abstract stays one chunk like the
    # oracle's paras CTE).
    toks = F.split("text", " ")
    body = docs.select(
        F.col("doc_id").cast("string").alias("article_id"),
        F.array_join(F.slice(toks, 1, 8), " ").alias("abstract_text"),
        F.array(F.lit("Body")).alias("section_names"),
        F.array(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.size(toks) - 9) / 16, F.lit(0)
                    ).cast("int"),
                ),
                lambda i: F.array_join(F.slice(toks, i * 16 + 9, 16), " "),
            ),
        ).alias("sections"),
    )
    articles = prepend_abstract(body, "abstract_text", level="paragraph")
    # E1 is the expensive stage: persist the embedded chunks so the plan's
    # two consumers (mean-pool → doc vectors; chunk-highlight scoring) run
    # the encoder ONCE (SURVEY §4 physical-execution notes — at 100 TB this
    # materialization is the intermediate chunks parquet, not a cache).
    # Repartition ahead of E1: the source parquet is a single small file
    # locally (one scan partition → one python worker for the whole model
    # stage); at 100 TB the scan is already thousands of partitions.
    from ..session import release_tracked_caches, track_caches

    release_tracked_caches("q21_document_pipeline")  # BEFORE the persist
    chunks = (
        explode_chunks(articles)
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("embedding", encode_column("paragraph"))
        .persist()
    )
    # the returned plan reads the cache at the driver's collect; tracked
    # per query key so repeat invocations release it (round-8 verdict #2;
    # release happens above, BEFORE the persist — the plan-identity trap)
    track_caches("q21_document_pipeline", [chunks])
    doc_vectors = mean_pool(
        chunks, group=["article_id"], vec_col="embedding", dim=DEFAULT_DIM
    )
    # Queries are a handful of rows: encode driver-side with the SAME
    # encoder function (E1 semantics, no per-broadcast-job python stage —
    # the reference also encodes queries in the serving process,
    # qdrant.py:236).
    queries = local_df(spark, 
        [
            (qid, [float(x) for x in fake_encode_one(text)])
            for qid, text in _Q21_QUERIES
        ],
        "query_id int, qvec array<double>",
    )
    out = semantic_search(
        doc_vectors, chunks, queries, k_docs=5, n_paragraphs=2, context_window=1
    )
    return out.select(
        "query_id",
        "article_id",
        F.round("doc_score", 6).alias("doc_score"),
        "section_name",
        "paragraph_id",
        F.round("chunk_score", 6).alias("chunk_score"),
        F.array_join("context_paragraphs", "|").alias("context"),
    )


# ---------------------------------------------------------------------------
# F6 — the reference's presentation layer (responses.py) as string
# expressions: <mark>-wrapped ±1 context, newline-joined most-relevant
# block, external article link. Oracle-checked character for character.

_MARK = '<mark class="highlight-paragraph">'
_LINK = (
    '<a target="_blank" rel="noopener noreferrer" '
    'href="https://pmc.ncbi.nlm.nih.gov/articles/'
)


@register(
    "q39_render_hits",
    f"""
    WITH chunk AS (
      SELECT CAST(vec_id % {N_ARTICLES} AS VARCHAR) AS article_id,
             CAST(vec_id // {N_ARTICLES} AS INT) AS paragraph_id,
             'p' || CAST(vec_id AS VARCHAR) AS paragraph,
             CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings
    ),
    comp AS (
      SELECT article_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS val
      FROM chunk
    ),
    docvec AS (
      SELECT article_id, list(m ORDER BY pos) AS emb
      FROM (SELECT article_id, pos, avg(val) AS m FROM comp GROUP BY article_id, pos)
      GROUP BY article_id
    ),
    top_docs AS (
      SELECT article_id,
             list_cosine_similarity(emb, {sql_vec(QUERY_VEC)}) AS doc_score
      FROM docvec
      QUALIFY row_number() OVER (
        ORDER BY list_cosine_similarity(emb, {sql_vec(QUERY_VEC)}) DESC, article_id
      ) <= 5
    ),
    chunk_hits AS (
      SELECT c.article_id, d.doc_score, c.paragraph_id,
             list_cosine_similarity(c.emb, {sql_vec(QUERY_VEC)}) AS chunk_score
      FROM chunk c JOIN top_docs d USING (article_id)
      QUALIFY row_number() OVER (
        PARTITION BY c.article_id
        ORDER BY list_cosine_similarity(c.emb, {sql_vec(QUERY_VEC)}) DESC, c.paragraph_id
      ) <= 1
    )
    SELECT h.article_id,
           h.paragraph_id,
           round(h.chunk_score, 6) AS chunk_score,
           string_agg('{_MARK}' || regexp_replace(n.paragraph, '{STRIP_RE}', '', 'g') || '</mark>',
                      chr(10) ORDER BY n.paragraph_id) AS marked_html,
           string_agg(n.paragraph, chr(10) ORDER BY n.paragraph_id) AS most_relevant_html,
           '{_LINK}' || h.article_id || '/">View full article on external site: '
             || h.article_id || '</a>' AS article_link
    FROM chunk_hits h
    JOIN chunk n ON n.article_id = h.article_id
               AND n.paragraph_id BETWEEN h.paragraph_id - 1 AND h.paragraph_id + 1
    GROUP BY h.article_id, h.paragraph_id, h.chunk_score
    """,
    survey_rows="F5, F6, Q6 — responses.py render layer (mark/link/context)",
)
def q39_render_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _synthetic_chunks(spark, sf_dir)
    doc_vectors = mean_pool(
        chunks, group=["article_id"], vec_col="embedding", dim=DEFAULT_DIM
    )
    queries = local_df(spark, 
        [(0, QUERY_VEC)], "query_id int, qvec array<double>"
    )
    top_docs = score_documents(doc_vectors, queries, k_docs=5)
    hits = highlight_chunks(chunks, top_docs, n_paragraphs=1)
    return render_hits(hits, chunks, window=1).select(
        "article_id",
        "paragraph_id",
        F.round("chunk_score", 6).alias("chunk_score"),
        "marked_html",
        "most_relevant_html",
        "article_link",
    )
