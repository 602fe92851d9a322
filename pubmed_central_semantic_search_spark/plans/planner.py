"""Plan-construction helpers (SURVEY §4).

The reference's only "planner" decisions are Qdrant-side (HNSW on/off,
filtered search). Ours are Python-level plan choices — deliberately NOT
custom Catalyst rules (SURVEY §4: nothing in the surface needs one; a
library-level rewrite is idiomatic and debuggable):

- ``plan_topk_search``: exact brute-force vs. hyperplane-LSH approximate
  vs. IVF-flat (prebuilt coarse centroids → probed inverted lists),
  chosen by an explicit mode or a corpus-size threshold. The exact tier
  is the correctness baseline; LSH and IVF are the opt-in scale tiers
  (the analog of the reference's HNSW, SURVEY §4 row 1). The PQ/IVF-PQ
  compressed tiers (operators/pq.py) are per-query (driver-side LUTs) and
  storage-coupled, so they're invoked directly, not through this router.
- ``explain_str`` / ``assert_plan``: plan introspection used by the
  plan-regression tests — the ".explain and iterate until it's the plan
  you'd want" loop, automated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ann import brute_force_topk, lsh_topk

# kernel='auto' crossover: the measured dim where the Arrow-batched BLAS
# matmul overtakes the interpreted Catalyst HOF fold (documented with the
# measurements in operators/projection.py:169 and operators/vectorized.py;
# the retained x768_multiq/x768_multiq_np bench pair keeps it honest).
_KERNEL_CROSSOVER_DIM = 256


def resolve_kernel(dim: int) -> str:
    """THE kernel='auto' rule — one definition (review find: the peek +
    crossover comparison had drifted into three copies): the Arrow/BLAS
    matmul above the measured crossover, the bit-exact Catalyst fold at
    or below it (including dim 0 — an empty/unknown query side must not
    pay an Arrow stage)."""
    return "blas" if dim >= _KERNEL_CROSSOVER_DIM else "hof"


def plan_topk_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    mode: str = "auto",
    approx_threshold_rows: int = 10_000_000,
    centroids=None,
    nprobe: int = 2,
    kernel: str = "hof",
    **lsh_kwargs,
) -> DataFrame:
    """Choose the physical strategy for vector top-k.

    ``auto`` stays exact until the vector side is known to be huge —
    statistics when available, else the caller's hint. (Counting to decide
    would cost a scan; at 100 TB the caller KNOWS it's huge.)
    ``ivf`` requires prebuilt coarse ``centroids`` (operators/clustering)
    — with cluster-partitioned storage the probe is partition pruning.

    ``kernel`` picks the exact tier's scoring engine: ``hof`` (default)
    is the bit-exact Catalyst sequential fold — the DuckDB-oracle
    contract; ``blas`` is the Arrow-batched numpy matmul
    (operators/vectorized.py — same rows at rounded scores, ~an order of
    magnitude less CPU at dim ≳ 256); ``kernel='auto'`` picks BETWEEN
    them by query dimensionality at the measured crossover
    (``_KERNEL_CROSSOVER_DIM`` — Catalyst HOF folds run interpreted and
    fall behind the matmul as dim grows; below it the fold wins because
    it never pays the Arrow transfer). The DEFAULT stays ``hof``:
    kernels differ in last-ulp float noise, so the bit-exact engine must
    never change underneath a caller who didn't ask — ``auto`` is the
    explicit opt-in for callers that accept either (rows agree at
    rounded scores; twin equivalence is test-pinned in
    test_vectorized.py)."""
    if kernel not in ("hof", "blas", "auto"):
        raise ValueError(f"unknown kernel: {kernel}")
    if kernel != "hof" and mode != "exact":
        # validated up front so approx/ivf can't silently ignore an
        # explicitly requested scoring engine
        raise ValueError(
            f"kernel={kernel!r} requires mode='exact', got mode={mode!r}"
        )
    if mode == "exact":
        if kernel == "auto":
            # peek ONE NON-NULL query row for the dim — collecting the
            # whole frame here would pay a job whose result is discarded
            # when auto routes to hof, and len(None) crashed (the same
            # null-peek fix score_documents carries)
            first = (
                queries.select("qvec")
                .where(F.col("qvec").isNotNull())
                .first()
            )
            kernel = resolve_kernel(
                len(first["qvec"]) if first is not None else 0
            )
        if kernel == "blas":
            from ..operators.vectorized import multi_query_topk_np

            # queries are a handful of rows by contract — driver-side
            # list, fenced (the k-sized-collect rule). NULL-qvec rows
            # can't enter the matmul; they score NULL against every
            # vector via the HOF arm (cosine of a null query is null),
            # keeping the kernels row-set-equal. The null arm rebuilds
            # its query side from the COLLECTED rows (review find: a
            # .where() on the original frame re-executed the possibly
            # encoder-bearing query plan per search — the plan-doubling
            # pattern score_documents already fixed).
            from pyspark.sql.types import StructType

            from ..session import collect_bounded, local_df

            qrows = collect_bounded(
                queries.select("query_id", "qvec"), 65_536, "blas query side"
            )
            qlist = [
                (r["query_id"], [float(x) for x in r["qvec"]])
                for r in qrows
                if r["qvec"] is not None
            ]
            q_schema = StructType(
                [queries.schema["query_id"], queries.schema["qvec"]]
            )
            if not qlist:
                local_q = local_df(vectors.sparkSession, qrows, q_schema)
                return brute_force_topk(vectors, local_q, k)
            out = multi_query_topk_np(vectors, qlist, k)
            if len(qlist) < len(qrows):
                null_q = local_df(
                    vectors.sparkSession,
                    [r for r in qrows if r["qvec"] is None],
                    q_schema,
                )
                out = out.unionByName(brute_force_topk(vectors, null_q, k))
            return out
        return brute_force_topk(vectors, queries, k)
    if mode == "approx":
        return lsh_topk(vectors, queries, k, **lsh_kwargs)
    if mode == "ivf":
        if centroids is None:
            raise ValueError("mode='ivf' needs prebuilt coarse centroids")
        from ..operators.clustering import ivf_topk

        return ivf_topk(vectors, queries, centroids, k, nprobe=nprobe)
    if mode == "auto":
        try:
            est_rows = (
                vectors._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .rowCount()
                .getOrElse(None)
            )
        except Exception:
            est_rows = None
        if est_rows is not None and int(str(est_rows)) > approx_threshold_rows:
            return lsh_topk(vectors, queries, k, **lsh_kwargs)
        return brute_force_topk(vectors, queries, k)
    raise ValueError(f"unknown mode: {mode}")


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def assert_plan(
    df: DataFrame,
    contains: list[str] = (),
    not_contains: list[str] = (),
) -> str:
    """Assert physical-plan properties; returns the plan text for
    diagnostics."""
    plan = explain_str(df)
    for frag in contains:
        assert frag in plan, f"expected plan to contain {frag!r}:\n{plan}"
    for frag in not_contains:
        assert frag not in plan, f"expected plan WITHOUT {frag!r}:\n{plan}"
    return plan
