"""DSIR importance resampling (operators/dsir.py — Xie et al. 2023):
fit/score pinned against a plain-Python reimplementation of the paper's
hashed-n-gram model, domain-separation behavior, and selection plan
shape.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.dsir import (
    dsir_fit,
    dsir_gumbel_key,
    dsir_logweight_micro,
    dsir_select,
)

B = 64

# Two "domains": sciency English vs. letter soup.
TARGET = [
    "the model trains on the corpus and the loss goes down",
    "the corpus holds many documents and the model reads them",
    "training data quality drives the model and the loss",
]
OFF = [
    "zz yy xx ww vv uu tt ss rr qq",
    "qq rr ss tt uu vv ww xx yy zz",
]
ROWS = [(i, t, True) for i, t in enumerate(TARGET)] + [
    (len(TARGET) + i, t, False) for i, t in enumerate(OFF)
]


def py_buckets(text: str, n_buckets: int) -> list[int]:
    toks = [t for t in text.split(" ") if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(f"{g}#dsir".encode()).hexdigest()[:8], 16) % n_buckets
        for g in grams
    ]


def py_fit(rows, n_buckets, alpha=1.0) -> list[int]:
    c_all = [0] * n_buckets
    c_t = [0] * n_buckets
    for _id, text, is_t in rows:
        for b in py_buckets(text, n_buckets):
            c_all[b] += 1
            if is_t:
                c_t[b] += 1
    n_all, n_t = sum(c_all), sum(c_t)
    return [
        round(
            (
                math.log((c_t[b] + alpha) / (n_t + alpha * n_buckets))
                - math.log((c_all[b] + alpha) / (n_all + alpha * n_buckets))
            )
            * 1_000_000
        )
        for b in range(n_buckets)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string, is_t boolean")


def test_fit_matches_python_reference(corpus):
    got = dsir_fit(corpus, F.col("is_t"), n_buckets=B)
    assert got == py_fit(ROWS, B)


def test_logweight_matches_python_recomputation(corpus):
    ratios = py_fit(ROWS, B)
    got = {
        r["doc_id"]: r["w"]
        for r in corpus.select(
            "doc_id", dsir_logweight_micro("text", ratios, B).alias("w")
        ).collect()
    }
    for _id, text, _t in ROWS:
        assert got[_id] == sum(ratios[b] for b in py_buckets(text, B))


def test_target_domain_scores_higher(corpus):
    """Every target-domain doc must outweigh every off-domain doc — the
    whole point of the importance model."""
    ratios = dsir_fit(corpus, F.col("is_t"), n_buckets=B)
    rows = corpus.select(
        "is_t", dsir_logweight_micro("text", ratios, B).alias("w")
    ).collect()
    t_scores = [r["w"] for r in rows if r["is_t"]]
    o_scores = [r["w"] for r in rows if not r["is_t"]]
    assert min(t_scores) > max(o_scores)


def test_empty_doc_scores_zero(spark):
    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    [r] = df.select(dsir_logweight_micro("text", [5] * B, B).alias("w")).collect()
    assert r["w"] == 0


def test_select_is_topk_and_deterministic(corpus):
    sel = dsir_select(corpus, k=3, target_col=F.col("is_t"), n_buckets=B)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    a = [r["doc_id"] for r in sel.collect()]
    b = [
        r["doc_id"]
        for r in dsir_select(corpus, k=3, target_col=F.col("is_t"), n_buckets=B).collect()
    ]
    assert a == b and len(a) == 3
    # with a strongly separated corpus the Gumbel noise cannot flip
    # target docs below off-domain ones (log-weight gap >> Gumbel range
    # here) — all 3 target docs selected
    assert set(a) == {0, 1, 2}


def test_gumbel_key_matches_python(corpus):
    got = corpus.select(
        "doc_id", dsir_gumbel_key("doc_id", F.lit(0).cast("bigint")).alias("k")
    ).collect()
    for r in got:
        u = (
            int(hashlib.md5(f"{r['doc_id']}#dsirg".encode()).hexdigest()[:8], 16)
            + 0.5
        ) / 4294967296.0
        assert r["k"] == pytest.approx(round(-math.log(-math.log(u)), 6), abs=1e-9)


def test_score_is_narrow_zero_shuffle(corpus):
    scored = corpus.select(dsir_logweight_micro("text", [1] * B, B).alias("w"))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_dsir_score_rejects_mismatched_model_size(spark):
    import pytest as _pytest

    from pubmed_central_semantic_search_spark.operators.dsir import (
        dsir_logweight_micro,
    )

    with _pytest.raises(ValueError, match="buckets"):
        dsir_logweight_micro("text", [0] * 128, n_buckets=256)
