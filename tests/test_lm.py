"""Bigram-LM perplexity (operators/lm.py) — pinned against a plain-Python
reimplementation of the same add-k model, plus plan shape and the
unseen-bigram scoring path."""

import math

import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.lm import (
    bigram_perplexity,
    train_bigram_lm,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat"),
    (4, "solo"),  # < 2 tokens: no bigrams, drops out of scoring
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_model(rows):
    c_big, c_uni, vocab = {}, {}, set()
    for _, text in rows:
        toks = [t for t in text.split(" ") if t]
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c_big[(a, b)] = c_big.get((a, b), 0) + 1
            c_uni[a] = c_uni.get(a, 0) + 1
    return c_big, c_uni, len(vocab)


def _py_ppl(rows, c_big, c_uni, vsz, k=1.0):
    out = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        lps = [
            math.log(
                (c_big.get((a, b), 0) + k) / (c_uni.get(a, 0) + k * vsz)
            )
            for a, b in zip(toks, toks[1:])
        ]
        if lps:
            out[doc_id] = math.exp(-sum(lps) / len(lps))
    return out


def test_train_matches_python_reference(spark):
    df = _df(spark)
    c_big, c_uni, vsz = train_bigram_lm(df)
    py_big, py_uni, py_v = _py_model(DOCS)
    assert vsz == py_v
    got_big = {(r["w1"], r["w2"]): r["c12"] for r in c_big.collect()}
    got_uni = {r["w1"]: r["c1"] for r in c_uni.collect()}
    assert got_big == py_big
    assert got_uni == py_uni


def test_perplexity_matches_python_reference(spark):
    df = _df(spark)
    c_big, c_uni, vsz = train_bigram_lm(df)
    got = {
        r["doc_id"]: r["ppl"]
        for r in bigram_perplexity(df, c_big, c_uni, vsz).collect()
    }
    want = _py_ppl(DOCS, *_py_model(DOCS))
    assert set(got) == set(want)  # doc 4 (no bigrams) absent from both
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # sanity: the repeated phrase ("the cat") makes doc 2 LESS perplexing
    # than the unique-bigram doc 3
    assert got[2] < got[3]


def test_unseen_bigrams_score_via_smoothing(spark):
    """Scoring a corpus the model never saw: every bigram is unseen, so
    p = k / (c1 + kV) with c1 = 0 where the left word is unknown too —
    smoothing keeps probabilities positive and finite."""
    train = _df(spark)
    c_big, c_uni, vsz = train_bigram_lm(train)
    fresh = _df(spark, [(9, "entirely novel words here")])
    got = {
        r["doc_id"]: r["ppl"]
        for r in bigram_perplexity(fresh, c_big, c_uni, vsz).collect()
    }
    _, _, py_v = _py_model(DOCS)
    want = math.exp(-math.log(1.0 / (0 + 1.0 * py_v)))
    assert got[9] == pytest.approx(want, rel=1e-12)


def test_lm_plan_shape(spark, sf_dir):
    """Training aggregates partial-combine before their single shuffle;
    scoring joins the model by broadcast (default) with no cartesian
    product and no Python in the plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    c_big, c_uni, vsz = train_bigram_lm(docs)
    cb_plan = c_big._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in cb_plan, cb_plan
    out = bigram_perplexity(docs, c_big, c_uni, vsz)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_size_validation(spark):
    df = _df(spark)
    c_big, c_uni, _ = train_bigram_lm(df)
    with pytest.raises(ValueError):
        bigram_perplexity(df, c_big, c_uni, 0)
