"""PageRank (operators/graph.py): hand-computed values vs a plain-Python
reference, mass conservation, dangling-node handling, lazy plan shape."""

import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.graph import (
    pagerank,
    symmetrize,
)


def py_pagerank(n_nodes, edges, n_iter=3, d=0.85):
    from collections import defaultdict

    out = defaultdict(list)
    deg = defaultdict(int)
    for u, v in edges:
        out[u].append(v)
        deg[u] += 1
    pr = {i: 1.0 / n_nodes for i in range(n_nodes)}
    for _ in range(n_iter):
        dm = sum(p for i, p in pr.items() if deg[i] == 0)
        nxt = {i: (1 - d) / n_nodes + d * dm / n_nodes for i in range(n_nodes)}
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * pr[u] / deg[u]
        pr = nxt
    return pr


EDGES = [(0, 1), (1, 0), (1, 2), (2, 1), (3, 0)]  # 4 has no edges (dangling)
N = 5


@pytest.fixture(scope="module")
def ranked(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], "id long")
    edges = spark.createDataFrame(EDGES, "u long, v long")
    return {
        r["id"]: r["pagerank"] for r in pagerank(nodes, edges, n_iter=3).collect()
    }


def test_matches_python_reference(ranked):
    exp = py_pagerank(N, EDGES)
    for i in range(N):
        assert ranked[i] == pytest.approx(exp[i], rel=1e-12)


def test_mass_conserved(ranked):
    assert sum(ranked.values()) == pytest.approx(1.0, abs=1e-12)


def test_hub_outranks_leaves(ranked):
    # node 1 receives from 0 and 2; node 3 receives nothing
    assert ranked[1] > ranked[0] > ranked[3]


def test_isolated_mode_matches_aggregate_on_symmetric_graph(spark):
    """The closed-form dangling recurrence ('isolated') must agree with
    the general lazy-aggregate mode on a symmetrized graph with isolated
    nodes."""
    pairs = [(0, 1), (1, 2), (5, 6)]  # nodes 3, 4 isolated
    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "u long, v long"
    )
    agg = {r["id"]: r["pagerank"] for r in pagerank(nodes, edges, n_iter=4).collect()}
    iso = {
        r["id"]: r["pagerank"]
        for r in pagerank(nodes, edges, n_iter=4, dangling="isolated").collect()
    }
    for i in range(7):
        assert iso[i] == pytest.approx(agg[i], rel=1e-12)
    assert sum(iso.values()) == pytest.approx(1.0, abs=1e-12)


def test_symmetrize_roundtrip(spark):
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    got = sorted(map(tuple, symmetrize(pairs).collect()))
    assert got == [(1, 2), (2, 1), (3, 4), (4, 3)]


def test_single_lazy_plan_no_driver_actions(spark):
    """Fixed iteration count → the whole computation is one plan: scalars
    (N, dangling mass) ride as broadcast one-row aggregates, so building
    the frame runs NO jobs, and the rank join per iteration is hash-based
    (the only nested-loop joins are the broadcast scalar crosses)."""
    nodes = spark.createDataFrame([(i,) for i in range(N)], "id long")
    edges = spark.createDataFrame(EDGES, "u long, v long")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    pr = pagerank(nodes, edges, n_iter=3)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert "CartesianProduct" not in plan
    # AQE may plan jobs for broadcast subtrees at action time, but plan
    # CONSTRUCTION must not have triggered any job
    assert after == before


def test_deep_iteration_aggregate_mode_is_bounded_and_correct(spark):
    """n_iter deep enough to cross the lineage-truncation points: values
    still match the Python reference, and the final plan is NOT the
    exponentially-doubled tree (the join count stays bounded by the
    rounds since the last truncation, not by 2^n_iter)."""
    nodes = spark.createDataFrame([(i,) for i in range(N)], "id long")
    edges = spark.createDataFrame(EDGES, "u long, v long")
    got = {
        r["id"]: r["pagerank"]
        for r in pagerank(nodes, edges, n_iter=9, dangling="aggregate").collect()
    }
    want = py_pagerank(N, EDGES, n_iter=9)
    for i in range(N):
        assert abs(got[i] - want[i]) < 1e-9, i
    analyzed = (
        pagerank(nodes, edges, n_iter=9, dangling="aggregate")
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    # 9 rounds with truncation every 4 leaves <= 2 un-truncated rounds
    # (2 joins each, doubled once) + scalar crosses; the un-truncated
    # tree would carry ~2^9 join nodes.
    assert analyzed.count("Join") < 40, analyzed.count("Join")


def test_empty_graph_returns_empty_ranking_both_modes(spark):
    """ADVICE r4: a similarity graph whose edges all fall below threshold
    yields an empty node frame — 'isolated' used to raise
    ZeroDivisionError and 'aggregate' relied silently on empty-frame
    propagation. Both modes now return an empty (id, pagerank) frame."""
    nodes = spark.createDataFrame([], "id long")
    edges = spark.createDataFrame([], "u long, v long")
    for mode in ("isolated", "aggregate"):
        out = pagerank(nodes, edges, dangling=mode)
        assert out.columns == ["id", "pagerank"], mode
        rows = out.collect()
        assert rows == [], (mode, rows)


def test_pagerank_duckdb_parity_demoted(spark, sf_dir):
    """The DEMOTED q53 'pagerank' arm (oracle-tower amortization policy,
    round 7; driver-green r4+r5+r6): the damped-random-surfer replay with
    dangling-mass redistribution, previously unrolled inside q53's driver
    oracle every bench round, now runs HERE over the SAME CTE text
    (_Q53_PAGERANK_PARITY_SQL imported verbatim) on the real documents
    table — identical rigor, zero driver-bench seconds. Bench:
    x_pagerank."""
    import sys as _sys

    from pubmed_central_semantic_search_spark.queries.dedup_pack import (
        _Q53_PAGERANK_PARITY_SQL,
        pagerank_report,
    )

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle_utils import compare_frames, duckdb_con

    got = pagerank_report(spark, sf_dir).toPandas()
    want = duckdb_con(sf_dir).execute(_Q53_PAGERANK_PARITY_SQL).df()
    compare_frames(got, want, "q53-pagerank-demoted")
