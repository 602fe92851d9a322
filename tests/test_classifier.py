"""Hashed linear classifier (operators/classifier.py) — featurizer pinned
against the shared hash primitive, full-batch GD training pinned against
an identical plain-numpy loop, inference plan pinned narrow."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.classifier import (
    hashed_features,
    hashed_features_np,
    logreg_score,
    token_bucket,
    train_logreg,
)
from pubmed_central_semantic_search_spark.operators.curation import (
    md5_prefix_long_py,
)

D = 16

# Two separable "languages": stopword-ish tokens vs digit-ish tokens.
DOCS = [
    (0, "the of and the is of", 1),
    (1, "the and and of is", 1),
    (2, "of the is is and the of", 1),
    (3, "12 99 7 303 5", 0),
    (4, "7 7 12 99", 0),
    (5, "303 5 5 99 12 7", 0),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, label int")


def _py_feat(text: str) -> list[float]:
    toks = [t for t in text.split(" ") if t]
    v = [0.0] * D
    for t in toks:
        v[md5_prefix_long_py(t, "#feat") % D] += 1.0
    return [x / len(toks) for x in v] if toks else v


def test_hashed_features_match_python_twin(spark):
    rows = (
        _df(spark)
        .select("doc_id", "text", hashed_features("text", D).alias("feat"))
        .collect()
    )
    for r in rows:
        want = _py_feat(r["text"])
        assert list(r["feat"]) == pytest.approx(want, abs=1e-12), r["doc_id"]


def test_empty_text_yields_zero_vector(spark):
    row = (
        spark.createDataFrame([("",)], "text string")
        .select(hashed_features("text", D).alias("feat"))
        .first()
    )
    assert list(row["feat"]) == [0.0] * D


def _py_train(feats, labels, lr=1.0, n_iter=10):
    x = np.array(feats, dtype=np.float64)
    y = np.array(labels, dtype=np.float64)
    w = np.zeros(D)
    b = 0.0
    for _ in range(n_iter):
        r = 1.0 / (1.0 + np.exp(-(x @ w + b))) - y
        w -= (lr / len(y)) * (x.T @ r)
        b -= (lr / len(y)) * r.sum()
    return w, b


def test_training_matches_numpy_reference(spark):
    df = _df(spark).select(
        "doc_id", "label", hashed_features("text", D).alias("feat")
    )
    model = train_logreg(df, n_buckets=D, lr=1.0, n_iter=10)
    rows = df.orderBy("doc_id").collect()
    w, b = _py_train([list(r["feat"]) for r in rows], [r["label"] for r in rows])
    assert model.weights == pytest.approx(w.tolist(), abs=1e-9)
    assert model.bias == pytest.approx(b, abs=1e-9)


def test_trained_model_separates_and_scores_match(spark):
    df = _df(spark).select(
        "doc_id", "text", "label", hashed_features("text", D).alias("feat")
    ).persist()
    model = train_logreg(df, n_buckets=D, lr=2.0, n_iter=50)
    scored = df.select(
        "doc_id", "label", logreg_score(model, "feat").alias("p")
    ).collect()
    # separable classes: every prediction lands on the right side of 0.5
    for r in scored:
        assert (r["p"] > 0.5) == (r["label"] == 1), (r["doc_id"], r["p"])
    # score expression matches driver-side sigmoid(w·x + b)
    feats = {
        r["doc_id"]: _py_feat(dict(DOCS_BY_ID)[r["doc_id"]]) for r in scored
    }
    for r in scored:
        z = sum(a * b for a, b in zip(model.weights, feats[r["doc_id"]]))
        want = 1.0 / (1.0 + math.exp(-(z + model.bias)))
        assert r["p"] == pytest.approx(want, abs=1e-12)
    df.unpersist()


DOCS_BY_ID = [(i, t) for i, t, _ in DOCS]


def test_inference_plan_is_narrow(spark, sf_dir):
    """The 100 TB scoring pass: featurize + sigmoid(w·x+b) must be one
    scan — no exchange, no join, no Python stage."""
    from pubmed_central_semantic_search_spark.operators.classifier import (
        LogRegModel,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = LogRegModel(weights=[0.1] * D, bias=0.0, n_buckets=D)
    out = docs.select(
        "doc_id",
        logreg_score(model, hashed_features("text", D)).alias("p"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_bucket_matches_shared_primitive(spark):
    keys = ["alpha", "beta", "", "γ"]
    df = spark.createDataFrame([(k,) for k in keys], "t string")
    got = {
        r["t"]: r["b"]
        for r in df.select("t", token_bucket("t", D).alias("b")).collect()
    }
    for k in keys:
        assert got[k] == md5_prefix_long_py(k, "#feat") % D


def test_np_featurizer_matches_catalyst_path(spark, sf_dir):
    """The Arrow kernel twin must produce the exact same feature vectors
    as the certified Catalyst fold on real text."""
    from pubmed_central_semantic_search_spark.operators.classifier import (
        hashed_features_np,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            hashed_features("text", D).alias("a"),
            hashed_features_np("text", D).alias("b"),
        )
    )
    for r in docs.collect():
        assert list(r["a"]) == pytest.approx(list(r["b"]), abs=1e-12), r["doc_id"]
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_hashed_features_null_text_matches_np_twin(spark):
    """Null text → the ZERO vector in BOTH featurizers (the Catalyst fold
    coalesces the token array; an uncoalesced null would null the whole
    vector and silently drop the row from train_logreg's gradient)."""
    df = spark.createDataFrame(
        [(None,), ("",), ("a b",)], "text string"
    )
    rows = df.select(
        hashed_features("text", 8).alias("f"),
        hashed_features_np("text", 8).alias("g"),
    ).collect()
    for r in rows:
        assert r["f"] is not None and r["g"] is not None
        assert list(r["f"]) == list(r["g"])
    assert list(rows[0]["f"]) == [0.0] * 8


def test_train_logreg_empty_frame_raises(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "label int, feat array<double>")
    with _pytest.raises(ValueError, match="empty training frame"):
        train_logreg(empty, n_buckets=4, n_iter=1)


def test_sample_fit_equals_full_fit_on_the_sample(spark):
    """train_logreg(sample_mod=m) ≡ full-batch train_logreg on the
    pre-filtered id % m == 0 slice — the sample-fit tier changes WHAT the
    gradient scans, never the arithmetic (the x768_kmeans rule)."""
    df = spark.createDataFrame(
        [
            (i, 1 if i % 3 == 0 else 0, f"tok{i % 5} common word{i % 3}")
            for i in range(64)
        ],
        "doc_id long, label int, text string",
    ).select("doc_id", "label", hashed_features("text", 8).alias("feat"))
    m_sampled = train_logreg(df, n_buckets=8, lr=2.0, n_iter=3, sample_mod=4)
    m_manual = train_logreg(
        df.filter(F.col("doc_id") % 4 == 0), n_buckets=8, lr=2.0, n_iter=3
    )
    assert m_sampled.bias == m_manual.bias
    assert m_sampled.weights == m_manual.weights
    # and the sample genuinely differs from the full fit (the tier is
    # doing something) on this non-uniform corpus
    m_full = train_logreg(df, n_buckets=8, lr=2.0, n_iter=3)
    assert m_full.weights != m_sampled.weights


def test_sample_fit_empty_sample_raises_and_unpersists(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 0, "a b"), (3, 1, "c d")], "doc_id long, label int, text string"
    ).select("doc_id", "label", hashed_features("text", 4).alias("feat"))
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    with _pytest.raises(ValueError, match="empty training frame"):
        train_logreg(df, n_buckets=4, n_iter=1, sample_mod=2)  # no even ids
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert after == before  # the internal persist was released


def _py_quant_gd(docs, n_buckets=8, lr=8, n_iter=3):
    """Plain-Python reference of the quantized-GD contract (integer
    milli-features, micro-weights, floor updates) — the arithmetic spec
    the Spark trainer AND the q28 oracle CTEs must both satisfy."""
    import hashlib
    import math

    def bucket(tok):
        return int(hashlib.md5(f"{tok}#feat".encode()).hexdigest()[:8], 16) % n_buckets

    feats, ys = {}, {}
    for did, y, text in docs:
        toks = [t for t in text.split(" ") if t]
        ys[did] = y
        cnt = {}
        for t in toks:
            b = bucket(t)
            cnt[b] = cnt.get(b, 0) + 1
        feats[did] = {
            b: math.floor(1000 * c / len(toks)) for b, c in cnt.items()
        }
    w = [0] * n_buckets
    bias = 0
    n = len(docs)
    for _ in range(n_iter):
        grad = {d: 0 for d in range(n_buckets)}
        gb = 0
        for did in ys:
            dot = sum(x * w[b] for b, x in feats[did].items())
            z = (dot + 1000 * bias) / 1e9
            p_micro = round(1e6 / (1.0 + math.exp(-z)))
            r = p_micro - 1000000 * ys[did]
            gb += r
            for b, x in feats[did].items():
                grad[b] += r * x
        w = [wv - math.floor(lr * grad[d] / (1000 * n)) for d, wv in enumerate(w)]
        bias -= math.floor(lr * gb / n)
    return w, bias


def test_quantized_gd_matches_python_reference_exactly(spark):
    """train_logreg_quantized ≡ the plain-Python quantized-GD spec, BIT
    FOR BIT — integer weights, no tolerance. This is the property that
    makes the trainer oracle-replayable (q28's unrolled CTEs)."""
    from pubmed_central_semantic_search_spark.operators.classifier import (
        logreg_score_micro_frame,
        train_logreg_quantized,
    )

    docs = [
        (i, 1 if i % 3 == 0 else 0,
         f"alpha tok{i % 5} beta vector gamma" if i % 3 == 0
         else f"alpha tok{i % 7} delta noise")
        for i in range(48)
    ]
    df = spark.createDataFrame(docs, "doc_id long, label int, text string")
    model = train_logreg_quantized(
        df, "label", n_buckets=8, lr=8, n_iter=3
    )
    w_ref, b_ref = _py_quant_gd(docs, n_buckets=8, lr=8, n_iter=3)
    assert model.weights_micro == w_ref
    assert model.bias_micro == b_ref
    assert any(w != 0 for w in model.weights_micro)  # it actually trained

    # scoring: exact integer parity with the reference formula
    import hashlib
    import math

    def bucket(tok):
        return int(hashlib.md5(f"{tok}#feat".encode()).hexdigest()[:8], 16) % 8

    got = {
        r["doc_id"]: r["clf_score_micro"]
        for r in logreg_score_micro_frame(df, model).collect()
    }
    for did, y, text in docs:
        toks = [t for t in text.split(" ") if t]
        cnt = {}
        for t in toks:
            cnt[bucket(t)] = cnt.get(bucket(t), 0) + 1
        dot = sum(
            math.floor(1000 * c / len(toks)) * model.weights_micro[b]
            for b, c in cnt.items()
        )
        z = (dot + 1000 * model.bias_micro) / 1e9
        assert got[did] == round(1e6 / (1.0 + math.exp(-z))), did
    # the learned gate separates the planted signal
    pos = [got[d] for d, y, _ in docs if y == 1]
    neg = [got[d] for d, y, _ in docs if y == 0]
    assert min(pos) > max(neg)


def test_quantized_gd_empty_text_and_empty_frame(spark):
    from pubmed_central_semantic_search_spark.operators.classifier import (
        logreg_score_micro_frame,
        train_logreg_quantized,
    )
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, 0, ""), (2, 1, "vector stuff")], "doc_id long, label int, text string"
    )
    model = train_logreg_quantized(df, "label", n_buckets=4, lr=8, n_iter=2)
    got = {
        r["doc_id"]: r["clf_score_micro"]
        for r in logreg_score_micro_frame(df, model).collect()
    }
    assert set(got) == {1, 2}  # the zero-feature doc still scores (bias only)
    empty = spark.createDataFrame([], "doc_id long, label int, text string")
    with _pt.raises(ValueError, match="empty training frame"):
        train_logreg_quantized(empty, "label", n_buckets=4, n_iter=1)


def test_q28_classifier_duckdb_parity_demoted(spark, sf_dir):
    """The DEMOTED q28 quantized-classifier arm (oracle-tower
    amortization policy, round 9; driver-green r5-r8): integer-quantized
    GD training + scoring, previously replayed inside q28's driver
    oracle every round (every training iteration as unrolled CTEs), now
    runs HERE over the SAME CTE text (q28_classifier_parity_sql()) on
    the real documents table. Bench: x_quality_classifier_quantized."""
    import sys as _sys

    from pubmed_central_semantic_search_spark.queries.extensions import (
        q28_classifier_parity_sql,
        quantized_classifier_report,
    )

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle_utils import compare_frames, duckdb_con

    got = quantized_classifier_report(spark, sf_dir).toPandas()
    want = duckdb_con(sf_dir).execute(q28_classifier_parity_sql()).df()
    compare_frames(got, want, "q28-classifier-demoted")
