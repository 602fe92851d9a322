"""Graph centrality over document-similarity graphs (EXT, X1/X2 adjunct).

Curation triage needs more than connected components (``operators/
dedup.py``): inside a near-duplicate cluster, PageRank centrality over
the candidate-pair graph identifies the TEMPLATE HUBS — documents whose
boilerplate is shared with many others — which are the canonical docs to
keep (or the template text to strip). The reference has no graph tier at
all; this generalizes its corpus to the standard random-surfer model
(Page et al. 1999) with damping and dangling-mass redistribution.

Execution shape (contrast with ``connected_components``, which needs a
data-dependent number of rounds and therefore per-round driver actions):
PageRank runs a FIXED iteration count, so the whole computation is ONE
lazy plan — scalars (node count, per-iteration dangling mass) ride as
broadcast single-row aggregate frames instead of driver collects, and no
job runs until the caller acts. Per iteration: one equi-join of ranks
onto edges (shuffle on the edge key) + one groupBy(dst) with map-side
partial sums — the canonical Pregel-on-DataFrames shape that scales to
billions of edges; iteration count is O(1) by contract (rank deltas decay
geometrically; fixed 3-10 rounds is the production norm for triage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Undirected pair list (a < b unique) → directed edge list (u, v)
    with both orientations."""
    return pairs.select(
        F.col(id_a).alias("u"), F.col(id_b).alias("v")
    ).unionByName(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "u",
    dst: str = "v",
    n_iter: int = 3,
    damping: float = 0.85,
    dangling: str = "aggregate",
) -> DataFrame:
    """PageRank with dangling-mass redistribution, one lazy plan.

    ``pr_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} pr_t(u)/deg(u) + dangling_t/N)``
    where ``dangling_t`` is the rank mass sitting on zero-out-degree
    nodes. Returns ``nodes`` + ``pagerank`` (unrounded; callers round for
    cross-engine comparison). Total rank mass is conserved at 1 every
    iteration (test-pinned).

    ``dangling`` picks how that mass is obtained:

    - ``'aggregate'`` (general graphs): a lazy one-row aggregate over the
      previous iteration's ranks, broadcast back in — correct for any
      edge set, but each iteration carries a broadcast-subquery stage.
      Because each iteration references the previous ranks TWICE (the
      dangling aggregate and the edge join), the logical tree doubles
      per round — 2^n_iter copies of the base subtree. Every 4th
      iteration therefore truncates lineage with a lazy
      ``localCheckpoint`` (the ``dedup.connected_components`` pattern),
      bounding growth at 16× between truncations. Below 4 iterations
      (the default, and q53's arm) no checkpoint fires and construction
      stays job-free; deeper runs pay stage-materialization jobs at the
      truncation points (AQE materializes upstream stages when the
      checkpoint RDD is built) — the price of a bounded plan.
    - ``'isolated'`` (undirected/symmetrized graphs — the similarity-
      graph case): a zero-OUT-degree node also has zero IN-degree, so
      its rank never depends on the frame — ``pr_t(isolated) = (1−d)/N +
      d·dm_{t−1}/N`` — and the total dangling mass follows the scalar
      recurrence ``dm_t = n_iso·pr_t(isolated)``, computed driver-side
      from TWO scalars (one upfront count job). Each iteration is then
      exactly one edge equi-join + one partial-agg groupBy — no
      per-iteration aggregate stages at all. Equivalence with
      ``'aggregate'`` on symmetric graphs is test-pinned.
    """
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    base = (
        nodes.select(F.col(id_col).alias("_id"))
        .join(deg, F.col("_id") == F.col(src), "left")
        .select("_id", F.coalesce("_deg", F.lit(0)).alias("_deg"))
    )
    if dangling == "isolated":
        counts = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("_deg") == 0).cast("long")).alias("n_iso"),
        ).first()
        # sum over zero rows is NULL — coalesce before float()
        n, n_iso = float(counts["n"]), float(counts["n_iso"] or 0)
        if n == 0:
            # empty graph (reachable: a similarity graph whose edges all
            # fell below threshold leaves a filtered-empty node frame) —
            # return the empty ranking instead of dividing by zero. The
            # 'aggregate' branch needs no guard: its n lives in a 1-row
            # frame crossJoined onto an EMPTY base, so every downstream
            # frame is empty and the 1.0/_n Infinity never reaches a row
            # (test-pinned for both modes).
            return nodes.select(
                F.col(id_col), F.lit(0.0).alias("pagerank")
            ).limit(0)
        pr = base.withColumn("_pr", F.lit(1.0 / n))
        dm = n_iso * (1.0 / n)
        for _ in range(n_iter):
            inbound = (
                pr.join(edges, pr["_id"] == edges[src])
                .select(
                    F.col(dst).alias("_id"), (F.col("_pr") / F.col("_deg")).alias("_w")
                )
                .groupBy("_id")
                .agg(F.sum("_w").alias("_in"))
            )
            pr = (
                base.join(inbound, "_id", "left")
                .withColumn(
                    "_pr",
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("_in", F.lit(0.0)) + F.lit(dm / n)),
                )
                .select("_id", "_deg", "_pr")
            )
            dm = n_iso * ((1.0 - damping) / n + damping * (dm / n))
        return pr.select(F.col("_id").alias(id_col), F.col("_pr").alias("pagerank"))

    n_frame = base.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    pr = base.crossJoin(F.broadcast(n_frame)).withColumn(
        "_pr", F.lit(1.0) / F.col("_n")
    )
    for it in range(n_iter):
        dangling_f = pr.filter(F.col("_deg") == 0).agg(
            F.coalesce(F.sum("_pr"), F.lit(0.0)).alias("_dm")
        )
        inbound = (
            pr.join(edges, pr["_id"] == edges[src])
            .select(F.col(dst).alias("_id"), (F.col("_pr") / F.col("_deg")).alias("_w"))
            .groupBy("_id")
            .agg(F.sum("_w").alias("_in"))
        )
        pr = (
            base.crossJoin(F.broadcast(n_frame))
            .crossJoin(F.broadcast(dangling_f))
            .join(inbound, "_id", "left")
            .withColumn(
                "_pr",
                F.lit(1.0 - damping) / F.col("_n")
                + F.lit(damping)
                * (F.coalesce("_in", F.lit(0.0)) + F.col("_dm") / F.col("_n")),
            )
            .select("_id", "_deg", "_n", "_pr")
        )
        # two references to the previous pr above (dangling_f + inbound)
        # double the tree per round — truncate every 4th (see docstring)
        if (it + 1) % 4 == 0 and (it + 1) < n_iter:
            pr = pr.localCheckpoint(eager=False)
    return pr.select(F.col("_id").alias(id_col), F.col("_pr").alias("pagerank"))
