"""Cross-encoder rerank seam (operators/retrieval.py
cross_encoder_rerank): fake-model value pinning, plan shape, import gate.
"""

import hashlib

import pytest

from pubmed_central_semantic_search_spark.operators.retrieval import (
    cross_encoder_rerank,
)

DOCS = [(i, f"candidate text number {i}") for i in range(20)]
QUERY = "spark join strategies"


def py_score(t: str) -> float:
    h = hashlib.md5(f"{QUERY}\x1e{t}".encode()).hexdigest()
    return round(int(h[:8], 16) / 4294967296.0, 6)


@pytest.fixture(scope="module")
def reranked(spark):
    cands = spark.createDataFrame(DOCS, "doc_id long, text string")
    return cross_encoder_rerank(cands, QUERY, k=5)


def test_fake_scores_match_python_recomputation(reranked):
    rows = reranked.collect()
    assert len(rows) == 5
    exp = sorted(((py_score(t), i) for i, t in DOCS), key=lambda x: (-x[0], x[1]))
    for rank, r in enumerate(sorted(rows, key=lambda r: r["ce_rank"]), start=1):
        score, doc = exp[rank - 1]
        assert r["doc_id"] == doc
        assert r["ce_score"] == pytest.approx(score, abs=1e-9)
        assert r["ce_rank"] == rank


def test_deterministic_across_runs(spark, reranked):
    cands = spark.createDataFrame(DOCS, "doc_id long, text string")
    again = cross_encoder_rerank(cands, QUERY, k=5)
    assert sorted(map(tuple, reranked.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_plan_is_arrow_batched_topk(reranked):
    plan = reranked._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_sbert_seam_is_import_gated(spark):
    cands = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            cross_encoder_rerank(cands, QUERY, k=2, model="sbert")
    else:  # pragma: no cover — container has no sbert; auto-upgrades if it lands
        assert cross_encoder_rerank(cands, QUERY, k=2, model="sbert").count() == 2


def test_unknown_model_rejected(spark):
    cands = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown cross-encoder"):
        cross_encoder_rerank(cands, QUERY, model="bert-base")
