"""Clustering + IVF query pack (SURVEY §2.9 X7 and the X2/X3 IVF ANN
scale tier). Both run on the ``embeddings`` table and are FULLY
oracle-checked — the k-means oracle unrolls the Lloyd iterations as CTEs,
so even the iterative algorithm gets a value-level DuckDB check, not just
rows-only.

Determinism contract shared by both engines: seeds = vectors with
``vec_id < k`` (cluster_id = seed's own vec_id), assignment = highest
cosine with ties to the lowest cluster id, empty clusters drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import ivf_topk, lloyd_kmeans, seed_centroids
from ..registry import QUERY_VECS, load, register, sql_vec
from ..session import local_df

K = 8  # clusters / inverted lists
DIM = 64

_SQL_QUERIES = "q(query_id, qvec) AS (VALUES " + ", ".join(
    f"({qid}, {sql_vec(vec)})" for qid, vec in QUERY_VECS.items()
) + ")"

# Shared CTE fragments: v = typed vectors, cent0 = seed centroids,
# assign(c) = argmax-cosine assignment against centroid CTE `c`.
_SQL_V = (
    "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)"
)
_SQL_CENT0 = f"c0 AS (SELECT vec_id AS cid, emb AS cvec FROM v WHERE vec_id < {K})"


def _sql_assign(out: str, cent: str) -> str:
    return f"""
    {out} AS (
      SELECT vec_id, emb, cid FROM (
        SELECT v.vec_id, v.emb, c.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.emb, c.cvec) DESC, c.cid
               ) AS rn
        FROM v CROSS JOIN {cent} c
      ) WHERE rn = 1
    )"""


def _sql_means(out: str, assigned: str) -> str:
    return f"""
    {out} AS (
      SELECT cid, list(m ORDER BY pos) AS cvec FROM (
        SELECT cid, pos, avg(val) AS m FROM (
          SELECT cid, generate_subscripts(emb, 1) AS pos, unnest(emb) AS val
          FROM {assigned}
        ) GROUP BY cid, pos
      ) GROUP BY cid
    )"""


@register(
    "q37_ivf_topk",
    f"""
    WITH {_SQL_V},
    {_SQL_CENT0},
    {_sql_assign("assign", "c0")},
    {_SQL_QUERIES},
    probe AS (
      SELECT query_id, qvec, cid FROM (
        SELECT q.query_id, q.qvec, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qvec, c.cvec) DESC, c.cid
               ) AS rn
        FROM q CROSS JOIN c0 c
      ) WHERE rn <= 2
    )
    SELECT query_id, vec_id, round(score, 6) AS score FROM (
      SELECT p.query_id, a.vec_id,
             list_cosine_similarity(a.emb, p.qvec) AS score,
             row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY list_cosine_similarity(a.emb, p.qvec) DESC, a.vec_id
             ) AS rn
      FROM probe p JOIN assign a ON a.cid = p.cid
    ) WHERE rn <= 5
    """,
    survey_rows="X2/X3 (IVF-flat ANN — the partition-pruned scale tier)",
)
def q37_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import release_tracked_caches, track_caches

    # persist: seed collect + list-assignment both scan the vectors; one
    # parquet decode instead of two. The returned plan still reads the
    # cache at the driver's collect, so it's tracked per query key — a
    # repeat invocation releases the previous set BEFORE persisting its
    # own (round-8: CacheManager matches by canonicalized plan — a
    # release AFTER the new identical persist drops the new cache too).
    release_tracked_caches("q37_ivf_topk")
    emb = load(spark, sf_dir, "embeddings").persist()
    track_caches("q37_ivf_topk", [emb])
    centroids = seed_centroids(emb, K)
    queries = local_df(spark, 
        [(qid, vec) for qid, vec in QUERY_VECS.items()],
        "query_id int, qvec array<double>",
    )
    out = ivf_topk(emb, queries, centroids, k=5, nprobe=2)
    return out.select("query_id", "vec_id", F.round("score", 6).alias("score"))


@register(
    "q38_kmeans_topics",
    f"""
    WITH {_SQL_V},
    {_SQL_CENT0},
    {_sql_assign("a0", "c0")},
    {_sql_means("c1", "a0")},
    {_sql_assign("a1", "c1")},
    {_sql_means("c2", "a1")},
    {_sql_assign("final", "c2")}
    SELECT f.cid AS cluster_id,
           count(*) AS n_members,
           round(min(c.cvec[1]), 6) AS centroid_c0
    FROM final f JOIN c2 c ON c.cid = f.cid
    GROUP BY f.cid
    """,
    survey_rows="X7 (k-means topics — iterative algorithm, oracle-unrolled)",
)
def q38_kmeans_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import release_tracked_caches, track_caches

    # persist: seeds + 2 Lloyd iterations + final assignment = 4 scans of
    # the same vectors; cache them once (exactly the operator's documented
    # caller contract for cold storage). Release-BEFORE-persist, then
    # track (round-8: the plan-identity uncache trap).
    release_tracked_caches("q38_kmeans_topics")
    emb = load(spark, sf_dir, "embeddings").persist()
    track_caches("q38_kmeans_topics", [emb])
    assigned, centroids = lloyd_kmeans(emb, k=K, n_iter=2, dim=DIM)
    counts = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    cent_df = local_df(spark, 
        [(cid, vec[0]) for cid, vec in centroids], "cluster_id int, c0 double"
    )
    return counts.join(cent_df, "cluster_id").select(
        "cluster_id", "n_members", F.round("c0", 6).alias("centroid_c0")
    )
