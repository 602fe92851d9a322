"""Connected-components cluster resolution (SURVEY §2.9 X1/X2 follow-through).

The alternating large-star/small-star rounds must find the transitive
closure of near-dup pairs — hand-built graphs with long chains (the shape
that defeats naive O(diameter) min-propagation) plus a seeded-random graph
cross-checked against a driver-side union-find.
"""

import random

from pubmed_central_semantic_search_spark.operators.dedup import (
    assign_components,
    connected_components,
)


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_chain_clique_and_pair(spark):
    # 0-1-2-...-9 path (diameter 9), {100,101,102} triangle, {200,201} pair.
    edges = [(i, i + 1) for i in range(9)]
    edges += [(100, 101), (101, 102), (100, 102), (200, 201)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _labels(connected_components(pairs))
    want = {i: 0 for i in range(10)}
    want |= {100: 100, 101: 100, 102: 100, 200: 200, 201: 200}
    assert got == want


def test_orientation_and_self_loops_ignored(spark):
    # Reversed / duplicated / self-loop pairs must not change the result.
    pairs = spark.createDataFrame(
        [(5, 3), (3, 5), (7, 7), (3, 9), (9, 3)], "id_a long, id_b long"
    )
    assert _labels(connected_components(pairs)) == {3: 3, 5: 3, 9: 3}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(55)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for e in edges for x in e}
    want = {}
    for n in sorted(touched):
        root = find(n)
        want[n] = min(m for m in touched if find(m) == root)

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    assert _labels(connected_components(pairs)) == want


def test_assign_components_singletons_and_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 4, 5)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(2, 4), (4, 5)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: (r["component"], r["is_survivor"])
        for r in assign_components(docs, "doc_id", pairs).collect()
    }
    assert rows == {
        1: (1, True),  # singleton
        2: (2, True),  # cluster {2,4,5} survivor
        3: (3, True),
        4: (2, False),
        5: (2, False),
    }


def test_assign_components_quality_survivor(spark):
    """Quality-aware survivor election (round-7): with survivor_order,
    the keeper is each duplicate cluster's BEST row (order + id
    tiebreak), not the minimum id — and exactly one survivor exists per
    component, pinned against a DuckDB replay of the same election."""
    import duckdb

    from pubmed_central_semantic_search_spark.operators.dedup import (
        assign_components,
    )

    docs = spark.createDataFrame(
        [
            (1, 300), (2, 900), (3, 900),   # cluster {1,2,3}: 2 wins (tie→min id)
            (10, 50), (11, 40),             # cluster {10,11}: 10 wins
            (20, 5),                        # singleton: survives
        ],
        "doc_id long, quality long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    from pyspark.sql import functions as F

    got = assign_components(
        docs, "doc_id", pairs, survivor_order=[F.desc("quality")]
    )
    rows = {r["doc_id"]: (r["component"], r["is_survivor"]) for r in got.collect()}
    assert rows == {
        1: (1, False), 2: (1, True), 3: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True),
    }
    # DuckDB replay of the election over the same components
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES (1,300,1),(2,900,1),(3,900,1),(10,50,10),(11,40,10),(20,5,20)) t(doc_id, quality, component)")
    want = {
        r[0]: bool(r[1])
        for r in con.execute(
            "SELECT doc_id, row_number() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) = 1 FROM d"
        ).fetchall()
    }
    assert {k: v[1] for k, v in rows.items()} == want
    # exactly one survivor per component
    per = {}
    for _id, (comp, surv) in rows.items():
        per[comp] = per.get(comp, 0) + int(surv)
    assert all(v == 1 for v in per.values())


def test_lexical_cc_duckdb_parity_demoted(spark, sf_dir):
    """The DEMOTED q53 'lexical' arm (oracle-tower amortization policy,
    round 8; driver-green r2-r7): 3-gram Jaccard pair generation +
    alternating-star connected components + min-id survivors over the
    chained corpus, previously replayed inside q53's driver oracle every
    bench round, now runs HERE over the SAME recursive-CTE text
    (_Q53_LEXICAL_PARITY_SQL imported verbatim) on the real documents
    table — identical rigor, zero driver-bench seconds. Bench:
    x_lexical_cc. CC stays driver-certified through q53's semantic arm."""
    import sys as _sys

    from pubmed_central_semantic_search_spark.queries.dedup_pack import (
        _Q53_LEXICAL_PARITY_SQL,
        lexical_cc_report,
    )

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle_utils import compare_frames, duckdb_con

    got = lexical_cc_report(spark, sf_dir).toPandas()
    want = duckdb_con(sf_dir).execute(_Q53_LEXICAL_PARITY_SQL).df()
    compare_frames(got, want, "q53-lexical-demoted")
