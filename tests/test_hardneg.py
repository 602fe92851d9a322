"""Hard-negative mining (operators/retrieval.py mine_hard_negatives —
the DPR recipe with the near-duplicate positive guard)."""

import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.retrieval import (
    mine_hard_negatives,
)

TERMS = ["join", "hash"]
QV = [1.0, 0.0, 0.0, 0.0]

# doc 0: the positive (embedding = query direction), lexically relevant.
# doc 1: near-duplicate of the positive (cos ≈ 1) AND lexically top —
#        must be guarded OUT (false negative).
# docs 2-4: lexically relevant, semantically far — the hard negatives.
# doc 5: lexically irrelevant — never a candidate.
DOCS = [
    (0, "join hash join hash join"),
    (1, "join hash join hash best"),
    (2, "join join join other words here"),
    (3, "hash hash other words here too"),
    (4, "join hash something else entirely"),
    (5, "completely unrelated text body"),
]
EMB = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.999, 0.01, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.0, 1.0, 0.0]),
    (4, [0.0, 0.0, 0.0, 1.0]),
    (5, [0.5, 0.5, 0.5, 0.5]),
]


@pytest.fixture(scope="module")
def mined(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    return mine_hard_negatives(
        docs, emb, TERMS, QV, k_neg=3, n_candidates=10, max_pos_sim=0.95
    )


def test_positive_is_top_cosine_doc(mined):
    rows = mined.collect()
    assert rows and all(r["pos_doc_id"] == 0 for r in rows)


def test_positive_and_near_duplicate_excluded(mined):
    ids = {r["doc_id"] for r in mined.collect()}
    assert 0 not in ids  # the positive itself
    assert 1 not in ids  # cos_pos ≈ 0.999 > 0.95 — false-negative guard


def test_negatives_are_lexically_hardest_in_bm25_order(mined):
    rows = mined.orderBy("bm25_rank").collect()
    ids = [r["doc_id"] for r in rows]
    # candidates after the guard: 2, 3, 4 (doc 5 matches no term)
    assert set(ids) == {2, 3, 4}
    ranks = [r["bm25_rank"] for r in rows]
    assert ranks == sorted(ranks)
    assert all(r["cos_pos"] <= 0.95 for r in rows)


def test_deterministic_and_bounded(spark, mined):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    again = mine_hard_negatives(
        docs, emb, TERMS, QV, k_neg=3, n_candidates=10, max_pos_sim=0.95
    )
    assert sorted(map(tuple, mined.collect())) == sorted(map(tuple, again.collect()))
    only2 = mine_hard_negatives(
        docs, emb, TERMS, QV, k_neg=2, n_candidates=10, max_pos_sim=0.95
    )
    assert only2.count() == 2


def test_plan_shape(mined):
    """The positive side rides a broadcast (1 row); the k_neg cut is a
    TakeOrderedAndProject, never a global sort; no cartesian product
    beyond the broadcast-nested-loop against the single positive row."""
    plan = mined._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_precomputed_pos_matches_inplan_selection(spark, mined):
    """Round-13 optimization seam: a caller that already holds the
    query's cosine top list passes the positive via ``pos`` — the
    result must be IDENTICAL to the in-plan positive selection."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    emb = spark.createDataFrame(EMB, "vec_id long, embedding array<double>")
    # doc 0 is the cosine top-1 (embedding == query direction)
    pos = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])],
        "pos_doc_id long, _pos_emb array<double>",
    )
    with_pos = mine_hard_negatives(
        docs, emb, TERMS, QV, k_neg=3, n_candidates=10, max_pos_sim=0.95,
        pos=pos,
    )
    assert sorted(map(tuple, with_pos.collect())) == sorted(
        map(tuple, mined.collect())
    )
