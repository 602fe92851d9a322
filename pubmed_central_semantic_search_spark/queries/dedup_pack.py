"""Dedup + similarity-search query pack (SURVEY §2.9 X1/X2/X3).

Near-dup queries run on a corpus with PLANTED duplicates — each base
document/vector unioned with a deterministic perturbation of itself
(text: last 5 tokens dropped; vectors: one component nudged) — so the
detectors provably recover known pairs, and both engines build the exact
same corpus (no RNG anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann import hyperplanes, lsh_topk
from ..operators.dedup import (
    assign_components,
    embedding_near_dup,
    fuzzy_string_pairs,
    near_dup_minhash,
    ngram_jaccard_pairs,
    simhash_near_dup,
)
from ..registry import QUERY_VECS, load, register, sql_vec
from ..session import (
    cached_deps,
    local_df,
    release_cached_deps,
    release_tracked_caches,
    track_caches,
)

N_BASE = 200  # planted-corpus size cap (keeps pair joins bounded at any SF)
COPY_OFFSET = 100000

# --- shared corpus builders (Spark + SQL twins) ----------------------------


def _planted_text_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "documents").filter(F.col("doc_id") < N_BASE).select(
        "doc_id", "text"
    )
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    copies = base.select(
        (F.col("doc_id") + COPY_OFFSET).alias("doc_id"),
        F.array_join(
            F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1))), " "
        ).alias("text"),
    )
    return base.unionByName(copies)


# Shared tokenize + 3-gram shingle CTE tail over a `corpus` CTE — ONE
# definition so q23/q36's oracle and q53's chained-corpus oracle can
# never drift on the shingling contract.
_SQL_TOK_SH = """
    tok AS (
      SELECT doc_id, pos, token FROM (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM corpus
      ) WHERE token <> ''
    ),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS shingle
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE shingle IS NOT NULL
    )
"""

_SQL_TEXT_CORPUS = f"""
    base AS (SELECT doc_id, text FROM documents WHERE doc_id < {N_BASE}),
    base_tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM base
    ),
    copies AS (
      SELECT doc_id + {COPY_OFFSET} AS doc_id,
             array_to_string(toks[1:greatest(len(toks) - 5, 1)], ' ') AS text
      FROM base_tok
    ),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM copies),
{_SQL_TOK_SH}"""

_H32 = "CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


# ---------------------------------------------------------------------------
# X2 — MinHash-LSH near-dup end to end: signatures → banding → candidates →
# true-Jaccard verify. Must recover the planted (doc, doc+offset) pairs.
# (The oracle's `sig` CTE is the flat signature contract — a match here
# certifies the per-(doc, hash) min-hash values, not just the final pairs.)


# The 'capped' arm's stop-band cap: buckets holding more than this many
# docs are dropped before the candidate self-join. 2 = the smallest cap
# that still pairs (a 1-doc bucket can't form a pair), so exactly the
# >pair-sized template buckets disappear — the oracle recomputes the
# bucket census and applies the same rule.
_Q23_BAND_CAP = 2

@register(
    "q23_minhash_near_dup",
    f"""
    WITH
    {_SQL_TEXT_CORPUS},
    sig AS (
      SELECT doc_id, seeds.hash_idx,
             min({_H32.format(expr="shingle || '#' || hash_idx")}) AS min_hash
      FROM sh CROSS JOIN generate_series(0, 7) seeds(hash_idx)
      GROUP BY doc_id, seeds.hash_idx
    ),
    band AS (
      SELECT doc_id, hash_idx // 2 AS band,
             string_agg(CAST(min_hash AS VARCHAR), '_' ORDER BY hash_idx) AS band_key
      FROM sig GROUP BY doc_id, hash_idx // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a JOIN band b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT p.id_a, p.id_b, count(*) AS n_intersect
      FROM cand p
      JOIN sh a ON a.doc_id = p.id_a
      JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
      GROUP BY p.id_a, p.id_b
    ),
    cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    final AS (
      SELECT * FROM (
        SELECT id_a, id_b, n_intersect,
               ca.n_sh + cb.n_sh - n_intersect AS n_union,
               round(CAST(n_intersect AS DOUBLE) / (ca.n_sh + cb.n_sh - n_intersect), 6) AS jaccard
        FROM inter
        JOIN cnt ca ON ca.doc_id = id_a
        JOIN cnt cb ON cb.doc_id = id_b
      ) WHERE jaccard >= 0.3
    ),
    -- 'capped' arm (round-11, verdict #3 — the round-10 skew
    -- mitigation's oracle home): the stop-band census recomputed here —
    -- a pair survives iff AT LEAST ONE band it collides in holds
    -- <= {_Q23_BAND_CAP} docs (under-cap-band survival; a pair is lost
    -- only when EVERY shared band is over the cap)
    bfreq AS (
      SELECT band, band_key, count(*) AS n FROM band GROUP BY band, band_key
    ),
    candcap AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM band a
      JOIN bfreq f ON f.band = a.band AND f.band_key = a.band_key
                   AND f.n <= {_Q23_BAND_CAP}
      JOIN band b ON b.band = a.band AND b.band_key = a.band_key
                  AND a.doc_id < b.doc_id
    )
    SELECT 'full' AS kind, * FROM final
    UNION ALL
    SELECT 'capped' AS kind, f.*
    FROM final f SEMI JOIN candcap c ON c.id_a = f.id_a AND c.id_b = f.id_b
    """,
    survey_rows="X2 (MinHash signatures + LSH banding end to end), H1, "
    "N2, §2.8 joins + the max_band_freq stop-band cap (round-11 "
    "backfill: the round-10 skew mitigation's capped candidate "
    "semantics — subset + under-cap-band survival — certified against "
    "the oracle's recomputed bucket census)",
)
def q23_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_candidate_pairs

    # release the PREVIOUS invocation's tracked caches BEFORE building
    # this one's persists (round-8 review find: CacheManager matches by
    # canonicalized plan, so a release AFTER the new plan-identical
    # persist silently dropped the new cache too — every repeat
    # invocation recomputed what it had just cached)
    release_tracked_caches("q23_minhash_near_dup")
    corpus = _planted_text_corpus(spark, sf_dir)
    out = near_dup_minhash(
        corpus, "doc_id", "text", n_hashes=8, bands=4, min_jaccard=0.3
    )
    # 'capped' arm: the capped candidate set (over-cap band buckets
    # dropped BEFORE the self-join — operators/dedup._band_candidate_
    # pairs' window-count filter) semi-joins the verified output, so the
    # certified rows are exactly "full-arm pairs that survive the cap" —
    # the same contract the oracle recomputes from its bucket census.
    capped_pairs = minhash_candidate_pairs(
        corpus, "doc_id", "text", n_hashes=8, bands=4,
        max_band_freq=_Q23_BAND_CAP,
    )
    capped = out.join(capped_pairs, ["id_a", "id_b"], "left_semi")
    result = out.select(F.lit("full").alias("kind"), "*").unionByName(
        capped.select(F.lit("capped").alias("kind"), "*")
    )
    # the returned plan still reads the operator's persists at the
    # driver's collect, so the query can't release them here; track them
    # for the NEXT invocation's release (round-8 verdict #2)
    track_caches("q23_minhash_near_dup", cached_deps(result))
    return result


# ---------------------------------------------------------------------------
# X2 — two exact similarity joins in ONE tagged union.
#
# 'jaccard' arm: EXACT n-gram Jaccard (no MinHash): inverted-index
# self-join, only docs sharing a shingle ever meet. The planted copies
# must surface with jaccard ≥ 0.5; unrelated docs share almost no 3-gram.
#
# 'fuzzy' arm: the q-gram-blocked edit-distance join
# (operators/dedup.py fuzzy_string_pairs — entity resolution over title
# surrogates). The ORACLE is the brute-force definition — every pair with
# levenshtein <= 3 — so a value match certifies the blocking math
# (pigeonhole + #short band + hot-gram fallback) recovers EXACTLY the
# semantic answer, not merely a plausible candidate set.

_FUZZY_N, _FUZZY_LEN, _FUZZY_D = 120, 24, 3


@register(
    "q36_ngram_jaccard",
    f"""
    WITH
    {_SQL_TEXT_CORPUS},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_intersect
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    titles AS (
      SELECT doc_id, substr(text, 1, {_FUZZY_LEN}) AS t
      FROM documents WHERE doc_id < {_FUZZY_N}
    )
    SELECT 'jaccard' AS kind, id_a, id_b, n_intersect, n_union, jaccard,
           CAST(NULL AS INT) AS dist
    FROM (
      SELECT id_a, id_b, n_intersect,
             ca.n_sh + cb.n_sh - n_intersect AS n_union,
             round(CAST(n_intersect AS DOUBLE) / (ca.n_sh + cb.n_sh - n_intersect), 6) AS jaccard
      FROM inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
    ) WHERE jaccard >= 0.5
    UNION ALL
    SELECT 'fuzzy' AS kind, a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(NULL AS BIGINT) AS n_intersect,
           CAST(NULL AS BIGINT) AS n_union,
           CAST(NULL AS DOUBLE) AS jaccard,
           CAST(levenshtein(a.t, b.t) AS INT) AS dist
    FROM titles a JOIN titles b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.t, b.t) <= {_FUZZY_D}
    """,
    survey_rows="X2 (exact n-gram Jaccard, inverted-index join; q-gram-"
    "blocked edit-distance similarity join vs the brute-force oracle)",
)
def q36_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    release_tracked_caches("q36_ngram_jaccard")  # BEFORE the new persist
    corpus = _planted_text_corpus(spark, sf_dir)
    jac_raw = ngram_jaccard_pairs(
        corpus, "doc_id", "text", shingle_n=3, min_jaccard=0.5
    )
    # capture the operator's cache deps BEFORE projecting (attachments
    # don't survive transformations) and track per query key
    track_caches("q36_ngram_jaccard", cached_deps(jac_raw))
    jac = jac_raw.select(
        F.lit("jaccard").alias("kind"),
        "id_a",
        "id_b",
        "n_intersect",
        "n_union",
        "jaccard",
        F.lit(None).cast("int").alias("dist"),
    )
    titles = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _FUZZY_N
    ).select("doc_id", F.substring("text", 1, _FUZZY_LEN).alias("title"))
    fuzzy = fuzzy_string_pairs(titles, "doc_id", "title", max_dist=_FUZZY_D).select(
        F.lit("fuzzy").alias("kind"),
        "id_a",
        "id_b",
        F.lit(None).cast("bigint").alias("n_intersect"),
        F.lit(None).cast("bigint").alias("n_union"),
        F.lit(None).cast("double").alias("jaccard"),
        F.col("dist").cast("int").alias("dist"),
    )
    return jac.unionByName(fuzzy)


# ---------------------------------------------------------------------------
# X2 — SimHash near-dup end to end: 32-bit majority-bit fingerprints →
# byte-band candidate blocking → exact hamming verify (bit_count(xor)).
# With max_hamming=3 < 4 bands, recall is EXACT by pigeonhole (any pair
# within 3 bit flips shares an intact 8-bit band), and the planted
# truncated copies must surface (their hamming concentrates at 0-3).
# Fingerprint values are exposed in the output, so a match certifies the
# fingerprint computation AND the matcher.

_SIMHASH_BITS_SQL = ",\n             ".join(
    f"sum(CASE WHEN (h & {1 << i}) <> 0 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(32)
)
_SIMHASH_VAL_SQL = " + ".join(
    f"CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(32)
)


@register(
    "q24_simhash_near_dup",
    f"""
    WITH
    {_SQL_TEXT_CORPUS},
    stok AS (SELECT DISTINCT doc_id, token FROM tok),
    hashed AS (
      SELECT doc_id, {_H32.format(expr="token || '#0'")} AS h FROM stok
    ),
    bits AS (
      SELECT doc_id,
             {_SIMHASH_BITS_SQL}
      FROM hashed GROUP BY doc_id
    ),
    sim AS (
      SELECT doc_id, CAST({_SIMHASH_VAL_SQL} AS BIGINT) AS simhash FROM bits
    ),
    banded AS (
      SELECT doc_id, simhash, gs.band,
             (simhash >> (8 * gs.band)) & 255 AS band_val
      FROM sim CROSS JOIN generate_series(0, 3) gs(band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS simhash_a, b.simhash AS simhash_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, simhash_a, simhash_b,
           CAST(bit_count(xor(simhash_a, simhash_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(simhash_a, simhash_b)) <= 3
    """,
    survey_rows="X2 (SimHash fingerprints + hamming-band near-dup)",
)
def q24_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _planted_text_corpus(spark, sf_dir)
    return simhash_near_dup(corpus, "doc_id", "text", max_hamming=3, n_bands=4)


# ---------------------------------------------------------------------------
# X2/X3 — embedding-cosine near-dup with planted perturbed vectors,
# label-blocked self-join.


def _planted_vec_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_BASE)
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("emb"))
    )
    pert = base.select(
        (F.col("vec_id") + COPY_OFFSET).alias("vec_id"),
        "label",
        F.transform(
            "emb", lambda x, i: F.when(i == 0, x + 0.05).otherwise(x)
        ).alias("emb"),
    )
    return base.unionByName(pert)


_SQL_VEC_CORPUS = f"""
    vbase AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < {N_BASE}
    ),
    vpert AS (
      SELECT vec_id + {COPY_OFFSET} AS vec_id, label,
             list_transform(emb, (x, i) -> CASE WHEN i = 1 THEN x + 0.05 ELSE x END) AS emb
      FROM vbase
    ),
    vcorpus AS (SELECT * FROM vbase UNION ALL SELECT * FROM vpert)
"""


# The 'semchunk' arm absorbs SEMANTIC CHUNKING (operators/chunking.py
# semantic_chunk_ids — the RAG upgrade of the reference's markup-only
# paragraph chunker): within each label stream, consecutive vectors merge
# into a segment until the embedding drifts (rounded cosine to the
# previous vector < 0.5); the oracle replays the lag-cosine and the
# running cut count, so boundary detection AND segment assignment are
# value-certified. Column mapping in the union: id_a = vec_id,
# id_b = segment_id, cosine = cos_prev (NULL on each stream's first row).


@register(
    "q25_embedding_near_dup",
    f"""
    WITH
    {_SQL_VEC_CORPUS},
    semchunk AS (
      SELECT vec_id, label,
             round(list_cosine_similarity(emb, lag(emb) OVER w), 6) AS cos_prev
      FROM vcorpus WINDOW w AS (PARTITION BY label ORDER BY vec_id)
    ),
    semseg AS (
      SELECT vec_id, cos_prev,
             sum(CASE WHEN cos_prev IS NULL OR cos_prev < 0.5 THEN 1 ELSE 0 END)
               OVER (PARTITION BY label ORDER BY vec_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS segment_id
      FROM semchunk
    )
    SELECT 'neardup' AS kind, id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
      FROM vcorpus a JOIN vcorpus b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.99
    UNION ALL
    SELECT 'semchunk' AS kind, vec_id AS id_a,
           CAST(segment_id AS BIGINT) AS id_b, cos_prev AS cosine
    FROM semseg
    """,
    survey_rows="X2/X3 (embedding near-dup, blocked self-join) + F1 "
    "generalization (semantic chunking: embedding-drift segment "
    "boundaries, lag-cosine + running cut count)",
)
def q25_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import semantic_chunk_ids

    corpus = _planted_vec_corpus(spark, sf_dir)
    nd = embedding_near_dup(
        corpus, id_col="vec_id", vec_col="emb", block_col="label", min_cosine=0.99
    ).select(F.lit("neardup").alias("kind"), "id_a", "id_b", "cosine")
    sc = semantic_chunk_ids(
        corpus, doc_col="label", pos_col="vec_id", vec_col="emb", threshold=0.5
    ).select(
        F.lit("semchunk").alias("kind"),
        F.col("vec_id").alias("id_a"),
        F.col("segment_id").cast("bigint").alias("id_b"),
        F.col("cos_prev").alias("cosine"),
    )
    return nd.unionByName(sc)


# ---------------------------------------------------------------------------
# X2/X3 scale path — random-hyperplane LSH bucketing + MULTI-PROBE
# approximate top-k: each query probes its own bucket plus every 1-bit-xor
# neighbor (the standard recall fix for sign-bit LSH — near-boundary
# neighbors sit just across one hyperplane). Hyperplanes are deterministic
# literals (operators/ann.py); the oracle's `v` CTE recomputes every
# vector's bucket, so a match certifies the bucketing AND the probe set.
# The recall contract vs brute force lives in tests/test_scale_patterns.py.

_PLANES = hyperplanes(n_planes=8, dim=64, seed=7)
_BUCKET_SQL = " + ".join(
    f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {sql_vec(p)}) > 0 THEN {1 << i} ELSE 0 END"
    for i, p in enumerate(_PLANES)
)


def _query_bucket(vec: list[float]) -> int:
    b = 0
    for i, plane in enumerate(_PLANES):
        if sum(x * y for x, y in zip(vec, plane)) > 0:
            b |= 1 << i
    return b


def _probe_list(vec: list[float]) -> list[int]:
    qb = _query_bucket(vec)
    return [qb] + [qb ^ (1 << p) for p in range(len(_PLANES))]


_Q27_QUERIES_SQL = ",\n      ".join(
    f"({qid}, {sql_vec(v)}, {_probe_list(v)})" for qid, v in QUERY_VECS.items()
)


@register(
    "q27_lsh_multiprobe_topk",
    f"""
    WITH q(query_id, qvec, probes) AS (VALUES
      {_Q27_QUERIES_SQL}
    ),
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
             CAST({_BUCKET_SQL} AS BIGINT) AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT q.query_id, v.vec_id,
             list_cosine_similarity(v.emb, q.qvec) AS raw
      FROM v JOIN q ON list_contains(q.probes, v.bucket)
    )
    SELECT query_id, vec_id, round(raw, 6) AS score
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY raw DESC, vec_id) <= 5
    """,
    survey_rows="X2/X3 (hyperplane-LSH bucketing + multi-probe approximate top-k)",
)
def q27_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qdf = local_df(spark, 
        [(qid, v) for qid, v in QUERY_VECS.items()], "query_id int, qvec array<double>"
    )
    out = lsh_topk(emb, qdf, k=5, n_planes=8, dim=64, seed=7, multi_probe=1)
    return out.select("query_id", "vec_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# X1/X2 follow-through — duplicate-CLUSTER resolution via distributed
# connected components (alternating large-star/small-star). The corpus
# plants a CHAIN per base doc: c1 keeps the first 2/3 of tokens, c2 the
# first 2/3 of c1. Shingle sets are nested prefixes, so jaccard(base,c1) ≈
# jaccard(c1,c2) ≈ 2/3 ≥ 0.55 but jaccard(base,c2) ≈ 4/9 < 0.55 — the
# base↔c2 link exists ONLY transitively, which is exactly what pairwise
# dedup misses and cluster resolution must recover. Oracle = recursive-CTE
# transitive closure over the identical edge set.

_C1_OFFSET = 100000


def _chained_text_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "documents").filter(F.col("doc_id") < N_BASE).select(
        "doc_id", "text"
    )

    def prefix_copy(df: DataFrame) -> DataFrame:
        toks = F.filter(F.split("text", " "), lambda t: t != "")
        keep = F.greatest(F.expr("(2 * size(filter(split(text, ' '), t -> t != ''))) div 3"), F.lit(1))
        return df.select(
            (F.col("doc_id") + _C1_OFFSET).alias("doc_id"),
            F.array_join(F.slice(toks, F.lit(1), keep), " ").alias("text"),
        )

    c1 = prefix_copy(base)
    c2 = prefix_copy(c1)
    return base.unionByName(c1).unionByName(c2)


_SQL_CHAIN_CORPUS = f"""
    base AS (SELECT doc_id, text FROM documents WHERE doc_id < {N_BASE}),
    t0 AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM base),
    c1 AS (
      SELECT doc_id + {_C1_OFFSET} AS doc_id,
             array_to_string(toks[1:greatest((2 * len(toks)) // 3, 1)], ' ') AS text
      FROM t0
    ),
    t1 AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks FROM c1),
    c2 AS (
      SELECT doc_id + {_C1_OFFSET} AS doc_id,
             array_to_string(toks[1:greatest((2 * len(toks)) // 3, 1)], ' ') AS text
      FROM t1
    ),
    corpus AS (
      SELECT * FROM base UNION ALL SELECT * FROM c1 UNION ALL SELECT * FROM c2
    ),
{_SQL_TOK_SH}"""


# The 'semantic' arm absorbs SemDeDup (operators/dedup.py semantic_dedup,
# arXiv:2303.09540): k-means-blocked within-cluster cosine pairs on the
# planted vector corpus, component resolution, and the paper's
# keep-farthest-from-centroid survivor rule. Centroids are the
# deterministic seed set (k lowest-id vectors), so the oracle recomputes
# the unit-normalized centroid matrix, the argmax-dot assignment (ties →
# lowest cluster id — the operator's struct-sort order), the blocked
# pair set, the transitive closure, and the survivor election value for
# value.

_SEM_K = 4

_SQL_SEM_ARM = f"""
    vcents AS (
      SELECT vec_id AS cid,
             list_transform(emb, x -> x / sqrt(list_reduce(list_prepend(0.0e0,
               list_transform(emb, y -> y * y)), (acc, t) -> acc + t))) AS cvec
      FROM vcorpus WHERE vec_id < {_SEM_K}
    ),
    sassign AS (
      SELECT vec_id, emb, cid AS cluster_id FROM (
        SELECT v.vec_id, v.emb, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.emb, c.cvec) DESC, c.cid
               ) AS rn
        FROM vcorpus v CROSS JOIN vcents c
      ) WHERE rn = 1
    ),
    spairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sassign a JOIN sassign b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.99
    ),
    sedges AS (
      SELECT id_a AS u, id_b AS v FROM spairs
      UNION SELECT id_b, id_a FROM spairs
    ),
    sreach(id, lbl) AS (
      SELECT vec_id, vec_id FROM sassign
      UNION
      SELECT e.v, r.lbl FROM sreach r JOIN sedges e ON e.u = r.id
    ),
    scomp AS (SELECT id, min(lbl) AS component FROM sreach GROUP BY id),
    ssurv AS (
      SELECT sc.id AS doc_id, sa.cluster_id, sc.component,
             row_number() OVER (
               PARTITION BY sc.component
               ORDER BY list_cosine_similarity(sa.emb, c.cvec) ASC, sc.id
             ) = 1 AS is_survivor
      FROM scomp sc
      JOIN sassign sa ON sa.vec_id = sc.id
      JOIN vcents c ON c.cid = sa.cluster_id
    )
"""


# The 'pagerank' arm (operators/graph.py — Page et al. 1999): centrality
# over the SAME similarity edge set identifies template hubs inside the
# duplicate clusters (the docs sharing boilerplate with the most others —
# the canonical keep candidates). Fixed 3 iterations with damping 0.85
# and dangling-mass redistribution; the oracle unrolls the iterations as
# CTEs, so fit and propagation are value-certified.

_PR_D = 0.85
_PR_ITERS = 3


def _pr_cte_chain(n_iter: int = _PR_ITERS) -> str:
    parts = [
        """
    prdeg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
    prbase AS (
      SELECT c.doc_id AS id, COALESCE(d.deg, 0) AS deg
      FROM corpus c LEFT JOIN prdeg d ON d.u = c.doc_id
    ),
    prn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM corpus),
    pr0 AS (SELECT id, deg, 1.0 / n.n AS pr FROM prbase CROSS JOIN prn n)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f"""
    pr{i}_dm AS (SELECT COALESCE(sum(pr), 0.0) AS dm FROM pr{i - 1} WHERE deg = 0),
    pr{i}_in AS (
      SELECT e.v AS id, sum(p.pr / p.deg) AS w
      FROM pr{i - 1} p JOIN edges e ON e.u = p.id GROUP BY e.v
    ),
    pr{i} AS (
      SELECT b.id, b.deg,
             (1.0 - {_PR_D}) / n.n
               + {_PR_D} * (COALESCE(iw.w, 0.0) + d.dm / n.n) AS pr
      FROM prbase b
      CROSS JOIN prn n
      CROSS JOIN pr{i}_dm d
      LEFT JOIN pr{i}_in iw ON iw.id = b.id
    )"""
        )
    return ",".join(parts)


# the similarity edge set (3-gram Jaccard pairs, symmetrized) — shared
# verbatim by the q53 registry oracle and the demoted PageRank replay
_Q53_EDGE_CTES = f"""{_SQL_CHAIN_CORPUS},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_intersect
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               round(CAST(n_intersect AS DOUBLE)
                 / (ca.n_sh + cb.n_sh - n_intersect), 6) AS jaccard
        FROM inter
        JOIN cnt ca ON ca.doc_id = id_a
        JOIN cnt cb ON cb.doc_id = id_b
      ) WHERE jaccard >= 0.55
      -- round BEFORE the threshold, matching ngram_jaccard_pairs (the
      -- Spark arm filters the 6-digit-rounded value; an unrounded filter
      -- here would use a different edge set within float-noise of 0.55)
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    )"""

# The DEMOTED q53 'pagerank' arm (oracle-tower amortization policy,
# round 7; driver-green r4+r5+r6): PageRank template-hub centrality over
# the similarity graph (damped random surfer with dangling-mass
# redistribution), its n_iter iterations unrolled as CTEs. DuckDB parity
# runs as pytest (tests/test_graph.py::test_pagerank_duckdb_parity_demoted)
# over this SAME text; the bench number is the x_pagerank extras entry.
_Q53_PAGERANK_PARITY_SQL = f"""
    WITH {_Q53_EDGE_CTES},
    {_pr_cte_chain()}
    SELECT id AS doc_id, round(pr, 6) AS pagerank
    FROM pr{_PR_ITERS}
    """


# The DEMOTED q53 'lexical' arm (oracle-tower amortization policy,
# round 8; driver-green r2-r7): whole-corpus lexical duplicate-cluster
# resolution — 3-gram Jaccard pair generation + large-star/small-star
# connected components + min-id survivor election — over the chained
# corpus (A≈B≈C with A,C below the pair threshold: transitivity is the
# point). DuckDB parity runs as pytest
# (tests/test_components.py::test_lexical_cc_duckdb_parity_demoted) over
# this SAME text; the bench number is the x_lexical_cc extras entry. CC
# itself STAYS driver-certified every round through q53's semantic arm
# (semantic_dedup runs assign_components on the vector pairs).
_Q53_LEXICAL_PARITY_SQL = f"""
    WITH RECURSIVE
    {_Q53_EDGE_CTES},
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id
    )
    SELECT id AS doc_id, min(lbl) AS component,
           id = min(lbl) AS is_survivor
    FROM reach GROUP BY id
    """


def lexical_cc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The demoted q53 'lexical' arm's Spark side — also the x_lexical_cc
    bench entry: ngram-Jaccard pair generation over the chained corpus,
    alternating-star connected components (localCheckpoint-truncated
    lineage, fixpoint signature every 2 rounds), min-id survivors."""
    corpus = _chained_text_corpus(spark, sf_dir)
    pairs_raw = ngram_jaccard_pairs(
        corpus, "doc_id", "text", shingle_n=3, min_jaccard=0.55
    )
    out = assign_components(
        corpus.select("doc_id"), "doc_id", pairs_raw, check_every=2
    ).select("doc_id", "component", "is_survivor")
    # the pair plan was consumed by CC's entry checkpoint; the shingle
    # view releases here (round-8 cache contract)
    release_cached_deps(pairs_raw)
    return out


@register(
    "q53_dup_clusters",
    f"""
    WITH RECURSIVE
    {_SQL_VEC_CORPUS},
    {_SQL_SEM_ARM}
    SELECT 'semantic' AS kind, doc_id,
           CAST(cluster_id AS INT) AS cluster_id,
           component, is_survivor
    FROM ssurv
    """,
    survey_rows="X1/X2 (duplicate-cluster resolution, large-star/small-"
    "star CC — driver-certified through the semantic arm's "
    "assign_components) + X2/X7 SemDeDup (k-means-blocked semantic dedup, "
    "far-from-centroid survivor rule). TWO arms demoted under the "
    "amortization policy: 'pagerank' (round 7, green r4-r6 — pytest "
    "tests/test_graph.py::test_pagerank_duckdb_parity_demoted, bench "
    "x_pagerank) and 'lexical' CC (round 8, green r2-r7 — pytest "
    "tests/test_components.py::test_lexical_cc_duckdb_parity_demoted over "
    "the same recursive-CTE text, bench x_lexical_cc)",
)
def q53_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import seed_centroids
    from ..operators.dedup import semantic_dedup

    release_tracked_caches("q53_dup_clusters")  # BEFORE the new persist

    # Single arm since the round-8 lexical demotion: SemDeDup on the
    # planted vector corpus. check_every=2 halves CC's driver round-trips
    # (the cost here is job-launch latency on hundreds of edges, not
    # data; at 100 TB callers keep the default per-round check).
    vec = _planted_vec_corpus(spark, sf_dir)
    cents = seed_centroids(vec, _SEM_K, id_col="vec_id", vec_col="emb")
    sem = semantic_dedup(
        vec,
        cents,
        id_col="vec_id",
        vec_col="emb",
        min_cosine=0.99,
        keep="far_from_centroid",
        check_every=2,
    )
    # the assigned view is still read by the returned plan (labels join +
    # survivor window) — tracked per query key (round-8 verdict #2)
    track_caches("q53_dup_clusters", cached_deps(sem))
    return sem.select(
        F.lit("semantic").alias("kind"),
        F.col("vec_id").alias("doc_id"),
        F.col("cluster_id").cast("int").alias("cluster_id"),
        "component",
        "is_survivor",
    )


def pagerank_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The demoted q53 'pagerank' arm's Spark side — also the x_pagerank
    bench entry: PageRank over the chained-text similarity graph, ONE
    lazy plan with broadcast scalar frames and a driver-side dangling
    recurrence (the similarity graph is symmetric: dangling ≡ isolated,
    so the mass recurrence runs driver-side — one upfront count, zero
    per-iteration aggregate stages)."""
    from ..operators.graph import pagerank, symmetrize

    release_tracked_caches("x_pagerank")  # BEFORE the new persist
    corpus = _chained_text_corpus(spark, sf_dir)
    pairs_raw = ngram_jaccard_pairs(
        corpus, "doc_id", "text", shingle_n=3, min_jaccard=0.55
    )
    track_caches("x_pagerank", cached_deps(pairs_raw))
    pairs = pairs_raw.select("id_a", "id_b")
    return pagerank(
        corpus.select("doc_id"),
        symmetrize(pairs),
        id_col="doc_id",
        n_iter=3,
        damping=0.85,
        dangling="isolated",
    ).select("doc_id", F.round("pagerank", 6).alias("pagerank"))
