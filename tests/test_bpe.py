"""Distributed BPE trainer — pinned merge-for-merge against a plain-Python
re-implementation of Sennrich et al.'s algorithm (same tie-break: max
count, then lexicographically smallest pair)."""

import pyspark.sql.functions as F

from pubmed_central_semantic_search_spark.operators.bpe import (
    EOW,
    apply_merge,
    bpe_segment,
    bpe_segment_udf,
    bpe_train,
    pair_stats,
)

# the paper's own example corpus (word frequencies)
PAPER_VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def _py_bpe(vocab, n_merges):
    """Reference implementation: get_stats + merge_vocab on a dict."""
    v = {tuple(list(w) + [EOW]): c for w, c in vocab}
    merges = []
    for _ in range(n_merges):
        stats = {}
        for syms, c in v.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = stats.get((syms[i], syms[i + 1]), 0) + c
        if not stats:
            break
        best = min(stats, key=lambda p: (-stats[p], p[0], p[1]))
        merges.append(best)
        a, b = best
        nv = {}
        for syms, c in v.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        v = nv
    return merges, v


def _vocab_df(spark):
    return spark.createDataFrame(PAPER_VOCAB, "token string, count bigint")


def test_train_matches_python_reference_paper_corpus(spark):
    want, _ = _py_bpe(PAPER_VOCAB, 10)
    got = bpe_train(_vocab_df(spark), 10)
    assert got == want
    # the famous first merges on this corpus: ('e','s') then ('es','t')
    assert got[0] == ("e", "s") and got[1] == ("es", "t")


def test_apply_merge_greedy_non_overlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], "symbols array<string>")
    out = df.select(apply_merge("symbols", "a", "a").alias("m")).first()["m"]
    assert list(out) == ["aa", "a"]  # left-to-right, never re-merge
    df2 = spark.createDataFrame([(["x", "a", "b", "a", "b"],)], "symbols array<string>")
    out2 = df2.select(apply_merge("symbols", "a", "b").alias("m")).first()["m"]
    assert list(out2) == ["x", "ab", "ab"]


def test_pair_stats_counts_overlap_weighted(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"], 2), (["a", "b"], 3)], "symbols array<string>, count bigint"
    )
    got = {(r["a"], r["b"]): r["pair_count"] for r in pair_stats(df).collect()}
    assert got == {("a", "a"): 4, ("a", "b"): 3}  # 2 overlapping pairs × 2


def test_segmentation_matches_reference_end_state(spark):
    merges, ref_vocab = _py_bpe(PAPER_VOCAB, 8)
    seg = bpe_segment(_vocab_df(spark), merges)
    got = {r["token"]: tuple(r["bpe"]) for r in seg.collect()}
    want_by_word = {}
    for syms in ref_vocab:
        want_by_word["".join(syms).replace(EOW, "")] = syms
    assert got == want_by_word
    # unseen word segments with the learned units
    new = spark.createDataFrame([("lowest",)], "token string")
    out = bpe_segment(new, merges).first()["bpe"]
    assert "".join(out) == "lowest" + EOW  # lossless
    assert "est" + EOW in list(out) or "est" in list(out)  # learned unit reused


def test_udf_segmenter_equals_catalyst_folds(spark):
    merges, _ = _py_bpe(PAPER_VOCAB, 8)
    words = spark.createDataFrame(
        [("low",), ("lowest",), ("newer",), ("zzz",), ("",)], "token string"
    )
    hof = {r["token"]: list(r["bpe"]) for r in bpe_segment(words, merges).collect()}
    udf_out = words.withColumn("bpe", bpe_segment_udf(merges)(F.col("token")))
    plan = udf_out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    got = {r["token"]: list(r["bpe"]) for r in udf_out.collect()}
    assert got == hof


def test_udf_closure_is_self_contained():
    import os
    import subprocess
    import sys
    import tempfile

    import cloudpickle

    fn = bpe_segment_udf([("a", "b"), ("ab", "c")]).func
    if hasattr(fn, "__wrapped__"):
        fn = fn.__wrapped__
    loader = (
        "import sys, pickle\n"
        "assert not any('pubmed_central' in p for p in sys.path)\n"
        "with open(sys.argv[1], 'rb') as fh:\n"
        "    f = pickle.load(fh)\n"
        "import pandas as pd\n"
        "out = f(pd.Series(['abc', 'ba']))\n"
        "assert list(out.iloc[0])[0] == 'abc'\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as fh:
        fh.write(cloudpickle.dumps(fn))
        path = fh.name
    try:
        r = subprocess.run(
            [sys.executable, "-c", loader, path],
            cwd=tempfile.gettempdir(),
            env=env,
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert r.returncode == 0, f"not self-contained:\n{r.stderr[-2000:]}"
    finally:
        os.unlink(path)


def test_train_on_real_vocab_runs_and_is_deterministic(spark, sf_dir):
    """End to end on the real corpus: build_vocab → bpe_train; two runs
    agree (content-independent determinism of the argmax tie-break)."""
    from pubmed_central_semantic_search_spark.operators.textstats import build_vocab

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs).orderBy("vocab_id").limit(200)
    m1 = bpe_train(vocab, 6, count_col="n_occurrences")
    m2 = bpe_train(vocab, 6, count_col="n_occurrences")
    assert m1 == m2 and len(m1) == 6
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in m1)
