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


def test_batched_train_parity_paper_corpus(spark):
    """bpe_train_batched returns the IDENTICAL merge list — the selection
    rule is exact, not approximate (paper corpus, several merge counts and
    batch widths, including widths larger than the merge count)."""
    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_train_batched,
    )

    for n in (1, 4, 10):
        want, _ = _py_bpe(PAPER_VOCAB, n)
        for mb in (2, 4, 16):
            got = bpe_train_batched(_vocab_df(spark), n, max_batch=mb)
            assert got == want, (n, mb, got, want)


def test_batched_train_parity_adversarial_corpora(spark):
    """Tie-dense two-letter corpus (every merge tiebreak-decided, symbol
    runs exercising the self-pair rule, early termination when the
    vocabulary runs dry) and a run-heavy corpus — the cases where an
    unsound batch rule would diverge first."""
    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_train_batched,
    )

    corpora = [
        [("aba", 3), ("bab", 3), ("aa", 2), ("bb", 2), ("ab", 1)],
        [("aaaa", 5), ("aaab", 4), ("baaa", 3)],
        [("xy", 7), ("yx", 7), ("xx", 7), ("yy", 7)],
        [("q", 1)],  # runs dry immediately after one merge
    ]
    for vocab in corpora:
        df = spark.createDataFrame(vocab, "token string, count bigint")
        for n in (3, 12):
            want, _ = _py_bpe(vocab, n)
            got = bpe_train_batched(df, n, max_batch=8)
            assert got == want, (vocab, n, got, want)


def test_batched_train_parity_random_vocabularies(spark):
    """Randomized parity sweep (fixed seed — deterministic test): random
    short words over a 3-letter alphabet force dense count collisions."""
    import random

    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_train_batched,
    )

    rng = random.Random(617)
    for trial in range(4):
        words = {
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5))): rng.randint(1, 9)
            for _ in range(rng.randint(3, 12))
        }
        vocab = sorted(words.items())
        df = spark.createDataFrame(vocab, "token string, count bigint")
        want, _ = _py_bpe(vocab, 8)
        got = bpe_train_batched(df, 8, max_batch=6)
        assert got == want, (trial, vocab, got, want)


def test_batched_train_engages_on_skewed_disjoint_counts(spark):
    """Where pair counts are skewed AND the hot pairs are symbol-disjoint
    (the regime the 4× boundary provably covers), one round selects
    several merges — fewer driver round-trips than merges. On flat
    letter-level stats (natural text, where top pairs share symbols and
    sit within 4× of each other) the rule soundly degenerates to
    sequential — that regime's scale answer is bpe_train_local."""
    from pubmed_central_semantic_search_spark.operators import bpe as bpe_mod

    # (a,b) = 200 spread over 8 contexts (side pairs 25 each); (c,d) = 120
    # over 6 contexts (sides 20) — sorted stats: 200, 120, then ≤25s. The
    # prefix is [(a,b), (c,d)] (disjoint), stops at the first 25 (shares a
    # symbol with (a,b)), and the boundary holds: 120 > 4×25.
    vocab = [(x + "ab" + y, 25) for x, y in zip("mnopqrst", "MNOPQRST")] + [
        (u + "cd" + v, 20) for u, v in zip("uvwxyz", "UVWXYZ")
    ]
    df = spark.createDataFrame(vocab, "token string, count bigint")
    want, _ = _py_bpe(vocab, 2)

    calls = {"n": 0}
    orig = bpe_mod.pair_stats

    def counting_pair_stats(v):
        calls["n"] += 1
        return orig(v)

    bpe_mod.pair_stats = counting_pair_stats
    try:
        got = bpe_mod.bpe_train_batched(df, 2, max_batch=8)
    finally:
        bpe_mod.pair_stats = orig
    assert got == want == [("a", "b"), ("c", "d")]
    assert calls["n"] == 1, f"batching never engaged: {calls['n']} rounds"


def test_local_train_parity_all_corpora(spark, sf_dir):
    """bpe_train_local (collect-the-vocab driver trainer — the production
    merge-count path) is merge-for-merge identical to the distributed
    trainer and the plain-Python reference, including tie-dense and
    runs-dry corpora, and on the real corpus vocabulary."""
    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_train,
        bpe_train_local,
    )
    from pubmed_central_semantic_search_spark.operators.textstats import build_vocab

    corpora = [
        PAPER_VOCAB,
        [("aba", 3), ("bab", 3), ("aa", 2), ("bb", 2), ("ab", 1)],
        [("aaaa", 5), ("aaab", 4), ("baaa", 3)],
        [("q", 1)],
    ]
    for vocab in corpora:
        df = spark.createDataFrame(vocab, "token string, count bigint")
        for n in (3, 10):
            want, _ = _py_bpe(vocab, n)
            assert bpe_train_local(df, n) == want, (vocab, n)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab_df = build_vocab(docs).orderBy("vocab_id").limit(300)
    want = bpe_train(vocab_df, 12, count_col="n_occurrences")
    assert bpe_train_local(vocab_df, 12, count_col="n_occurrences") == want


def test_local_train_collect_guard(spark):
    """The vocabulary collect is fenced by max_rows — the package's
    named-error discipline for driver-side fits."""
    import pytest

    from pubmed_central_semantic_search_spark.operators.bpe import bpe_train_local

    df = spark.createDataFrame(PAPER_VOCAB, "token string, count bigint")
    with pytest.raises(ValueError, match="max_rows"):
        bpe_train_local(df, 3, max_rows=2)


def test_local_train_skips_null_tokens_like_distributed(spark):
    """Null tokens contribute nothing in the distributed trainer
    (word_symbols(null) → null → filtered); the local trainer must skip
    them too — str(None) would train on the literal word 'None'."""
    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_train,
        bpe_train_local,
    )

    df = spark.createDataFrame(
        [("low", 5), (None, 99), ("lower", 2)], "token string, count bigint"
    )
    want = bpe_train(df, 5)
    got = bpe_train_local(df, 5)
    assert got == want
    assert not any("N" in a or "N" in b for a, b in got)


def test_local_train_rejects_nonpositive_counts(spark):
    """Review find: the incremental index cannot tell a true zero-count
    pair from a subtracted-stale one, so zero/negative counts are outside
    the parity domain — named error, never silent divergence."""
    import pytest

    from pubmed_central_semantic_search_spark.operators.bpe import bpe_train_local

    df = spark.createDataFrame(
        [("ab", 0), ("cd", 3)], "token string, count bigint"
    )
    with pytest.raises(ValueError, match="positive"):
        bpe_train_local(df, 2)


def test_bpe_train_duckdb_parity_demoted(spark, sf_dir):
    """The DEMOTED q55 'bpe' arm (oracle-tower amortization policy,
    round 7; driver-green r5+r6): merge-for-merge DuckDB value parity of
    bpe_train over the q55 vocabulary, previously replayed inside q55's
    driver oracle every bench round, now runs HERE over the SAME
    unrolled-CTE text (_q55_bpe_parity_oracle imported verbatim) on the
    real documents table — identical rigor, zero driver-bench seconds.
    The bench number stays as the x_bpe_train extras entry."""
    import sys as _sys

    from pubmed_central_semantic_search_spark.operators.bpe import bpe_train
    from pubmed_central_semantic_search_spark.operators.textstats import (
        build_vocab,
    )
    from pubmed_central_semantic_search_spark.queries.curation import (
        _BPE_MERGES,
        _q55_bpe_parity_oracle,
    )

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle_utils import duckdb_con

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs, "doc_id", "text", min_count=5)
    got = bpe_train(vocab, _BPE_MERGES, count_col="n_occurrences")
    want_rows = (
        duckdb_con(sf_dir)
        .execute(_q55_bpe_parity_oracle())
        .df()
        .sort_values("merge_rank")
    )
    want = list(zip(want_rows["left_sym"], want_rows["right_sym"]))
    assert got == want


def test_segment_udf_duplicate_rule_reapplies_like_fold(spark):
    """Round-7 segmenter rewrite (rank-skipping in-order): a DUPLICATE
    merge rule must re-fire at its own rank when an intermediate merge
    creates its pair after the first occurrence's turn passed — rules
    [(ab,c), (a,b), (ab,c)] on 'abc': rank 0 finds no ('ab','c') pair,
    rank 1 creates it, rank 2 merges it. A first-wins rank dict would
    stop at ['ab', 'c', '</w>']; the stacked folds (and therefore the
    udf) give ['abc', '</w>']."""
    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_segment,
        bpe_segment_udf,
    )

    rules = [("ab", "c"), ("a", "b"), ("ab", "c")]
    words = spark.createDataFrame([("abc",), ("cab",)], "token string")
    fold = {r["token"]: r["bpe"] for r in bpe_segment(words, rules).collect()}
    udf = {
        r["token"]: r["bpe"]
        for r in words.withColumn(
            "bpe", bpe_segment_udf(rules)(F.col("token"))
        ).collect()
    }
    assert fold == udf
    assert fold["abc"] == ["abc", "</w>"]
