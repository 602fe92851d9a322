"""Clustering + IVF similarity search (SURVEY §2.9 X7 / X2-X3 scale path).

Anchored to the reference's topic plot of its demo corpus
(``/root/reference/README.md:14-17`` — `sample_paper_topics.png`) and its
HNSW index (``qdrant.py:71-89``), whose Spark-side analogs are:

- **Lloyd k-means** over document vectors (X7): the MLlib execution shape
  re-expressed in plain DataFrame ops — centroids are TINY (k × dim), so
  each iteration collects them to the driver and re-broadcasts them as
  literals. Assignment is then a pure projection (rank over k literal
  cosine expressions): NO shuffle, whole-stage codegen, one scan per
  iteration. The only shuffle per iteration is the k-row centroid
  re-aggregation. Deterministic end to end: seeds are the k lowest-id
  vectors, ties break to the lowest cluster id — so the whole algorithm
  (any fixed iteration count) has a DuckDB oracle via unrolled CTEs.
- **IVF-flat top-k** (the "inverted file" ANN tier): assign every vector
  to its nearest centroid once at build time (that's the inverted list),
  then at query time probe only the ``nprobe`` nearest centroids' lists.
  At 100 TB the lists are parquet partitions (`partitionBy(cluster_id)`),
  so probing = partition pruning; the scan touches nprobe/k of the data.

Both are deliberately NOT MLlib calls: MLlib KMeans' init is RNG-seeded
(not oracle-replicable) and returns a model object, not a plan. These
return DataFrames and keep every step visible to Catalyst.

Centroids travel as ``list[(cluster_id, vector)]`` — ids are explicit so
clusters that lose every member simply drop out (identical semantics in
the SQL twin, where a vanished cluster has no mean row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine_similarity, dot
from .topk import grouped_top_k

Centroids = list[tuple[int, list[float]]]


def _unit(vec: list[float]) -> list[float]:
    n = sum(x * x for x in vec) ** 0.5
    return [x / n for x in vec] if n > 0 else vec


def _ranked_centroids(vec_col: Column | str, centroids: Centroids) -> Column:
    """array<struct<nsim,c>> sorted best-first (ties → lowest cluster id).

    Ranking trick: argsort by cosine(v, c) over FIXED centroids equals
    argsort by dot(v, c/|c|) — |v| is a positive per-row constant and
    |c| is folded into the literal driver-side. Saves two norm folds per
    centroid per row and shrinks the codegen tree ~3×."""
    return F.array_sort(
        F.array(
            *[
                F.struct(
                    (-dot(vec_col, F.lit(_unit(vec)))).alias("nsim"),
                    F.lit(cid).alias("c"),
                )
                for cid, vec in centroids
            ]
        )
    )


def nearest_centroid(vec_col: Column | str, centroids: Centroids) -> Column:
    """Argmax-cosine cluster id as a pure projection."""
    return F.element_at(_ranked_centroids(vec_col, centroids), 1).getField("c")


def top_centroids(
    vec_col: Column | str, centroids: Centroids, nprobe: int
) -> Column:
    """array<int> of the ``nprobe`` nearest centroid ids, best first."""
    return F.slice(_ranked_centroids(vec_col, centroids), 1, nprobe).getField("c")


def seed_centroids(
    vectors: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> Centroids:
    """Deterministic seeds: the k lowest-id vectors, cluster_id = own id
    (collected — k × dim doubles, trivially driver-sized). Oracle twin:
    ``WHERE {id} < k`` on dense ids / ``ORDER BY id LIMIT k`` generally."""
    rows = (
        vectors.select(F.col(id_col).alias("_i"), as_double(vec_col).alias("_v"))
        .orderBy("_i")
        .limit(k)
        .collect()
    )
    return [(int(r["_i"]), list(r["_v"])) for r in rows]


def recompute_centroids(
    assigned: DataFrame, dim: int, vec_col: str = "embedding"
) -> Centroids:
    """Per-cluster element-wise mean (one wide-avg hash aggregate — the
    k-row shuffle that IS the Lloyd iteration), collected to the driver.
    Clusters that lost all members disappear."""
    # Pre-project the double cast ONCE: putting `as_double(vec)[i]` inside
    # each of the `dim` aggregates re-evaluates the array transform per
    # aggregate (Catalyst doesn't CSE across agg expressions) — dim× more
    # per-row work and a dim× bigger expression tree to analyze per
    # iteration.
    rows = (
        assigned.select("cluster_id", as_double(vec_col).alias("_v"))
        .groupBy("cluster_id")
        .agg(*[F.avg(F.col("_v")[i]).alias(f"_m{i}") for i in range(dim)])
        .collect()
    )
    return sorted(
        (int(r["cluster_id"]), [r[f"_m{i}"] for i in range(dim)]) for r in rows
    )


def lloyd_kmeans(
    vectors: DataFrame,
    k: int,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, Centroids]:
    """X7 — ``n_iter`` deterministic Lloyd iterations (cosine assignment).

    Returns (assignment DataFrame ``(id, cluster_id)`` under the FINAL
    centroids, final centroids). Per-iteration cost at scale: one full
    scan (projection-only assignment) + one k-row shuffle; the driver
    round-trips k×dim doubles — never data-sized. Callers working over
    cold storage should ``persist()`` the vectors first (n_iter+1 scans).
    """
    centroids = seed_centroids(vectors, k, id_col, vec_col)
    for _ in range(n_iter):
        assigned = vectors.withColumn(
            "cluster_id", nearest_centroid(vec_col, centroids)
        )
        centroids = recompute_centroids(assigned, dim, vec_col)
    final = vectors.select(
        F.col(id_col),
        nearest_centroid(vec_col, centroids).alias("cluster_id"),
    )
    return final, centroids


def ivf_assign(
    vectors: DataFrame, centroids: Centroids, vec_col: str = "embedding"
) -> DataFrame:
    """IVF build: tag every vector with its inverted-list id. At scale,
    follow with ``.write.partitionBy("cluster_id").parquet(...)`` so
    query-time probing becomes partition pruning."""
    return vectors.withColumn("cluster_id", nearest_centroid(vec_col, centroids))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: Centroids,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: per query, exact cosine over only the
    ``nprobe`` nearest inverted lists.

    Plan shape: queries (tiny) explode to (query, probed cluster) →
    broadcast equi-join against cluster-tagged vectors (with partitioned
    storage this is partition pruning, never a shuffle of the vector side)
    → cosine → per-query top-k window.
    """
    lists = ivf_assign(vectors, centroids, vec_col)
    probes = queries.select(
        "query_id",
        "qvec",
        F.explode(top_centroids("qvec", centroids, nprobe)).alias("cluster_id"),
    )
    scored = lists.join(F.broadcast(probes), "cluster_id").select(
        "query_id",
        F.col(id_col),
        cosine_similarity(vec_col, F.col("qvec")).alias("score"),
    )
    return grouped_top_k(scored, ["query_id"], "score", k, tiebreak=[id_col])
