"""Adversarial-corpus oracle checks: the driver certifies queries on the
sf0.01 distribution; these tests re-run the HARDEST oracle replays (the
unrolled iterative CTEs — BPE training in q55, quantized-GD training in
q28) against a SYNTHETIC corpus designed to stress exactly what sf0.01
cannot: dense pair-count TIES over a tiny alphabet (every merge decided
by the lexicographic tiebreak, runs of identical symbols exercising the
greedy islands-and-parity algebra) and a skewed/degenerate label mix.
Same comparator as the driver (tests/oracle_utils.compare_frames)."""

from __future__ import annotations

import duckdb

from oracle_utils import compare_frames
from pubmed_central_semantic_search_spark.registry import REGISTRY


def _synthetic_sf_dir(spark, rows, base) -> str:
    """Write a documents.parquet with the standard schema under the
    test's tmp_path (auto-cleaned by pytest)."""
    base = str(base)
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    return base


def _oracle_con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con


# a tie-dense corpus over a 3-letter alphabet: repeated words force equal
# pair counts (lexicographic tiebreaks decide merges), runs like 'aaaa'
# exercise the greedy non-overlap parity, and '</w>' competes with letters
_TIE_CORPUS = [
    ("aa ab ba bb aa ab aa bb ba ab", "en", "s1"),
    ("aaa aab aba abb baa aaa aab aaa", "en", "s1"),
    ("aaaa bbbb aaaa bbbb abab baba", "en", "s2"),
    ("a b aa bb a b aa bb a b", "en", "s2"),
    ("ab ab ab ba ba ba aa aa bb bb", "en", "s3"),
    ("aabb bbaa abab baba aabb bbaa", "en", "s3"),
    ("b a b a b a b a b a", "en", "s4"),
    ("aaaaaaa bbbbbbb aaaaaaa", "en", "s4"),
] * 2  # *2: every word passes q55's min_count >= 5 more easily


def test_q55_bpe_oracle_replay_on_tie_dense_corpus(spark, tmp_path):
    """The tie-dense replay of the (round-7 demoted) q55 'bpe' arm: the
    vocabulary arm still goes through the registry oracle; the BPE
    training parity runs over the demoted arm's own unrolled-CTE text
    (the same SQL the driver used to replay)."""
    from pubmed_central_semantic_search_spark.operators.bpe import bpe_train
    from pubmed_central_semantic_search_spark.operators.textstats import (
        build_vocab,
    )
    from pubmed_central_semantic_search_spark.queries.curation import (
        _BPE_MERGES,
        _q55_bpe_parity_oracle,
    )

    sf_dir = _synthetic_sf_dir(spark, _TIE_CORPUS, tmp_path)
    qd = REGISTRY["q55_vocab_build"]
    got = qd.spark(spark, sf_dir).toPandas()
    want = _oracle_con(sf_dir).execute(qd.oracle).df()
    compare_frames(got, want, "q55-adversarial")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs, "doc_id", "text", min_count=5)
    merges = bpe_train(vocab, _BPE_MERGES, count_col="n_occurrences")
    want_bpe = (
        _oracle_con(sf_dir)
        .execute(_q55_bpe_parity_oracle())
        .df()
        .sort_values("merge_rank")
    )
    # sanity: the corpus produced merges, decided under ties (tiny
    # alphabet -> many equal pair counts), AND ran the vocabulary dry
    # before the 12-merge budget — so the Spark break and the oracle's
    # empty-argmax arms must agree on early termination too
    assert 5 <= len(merges) < 12, merges
    assert merges == list(zip(want_bpe["left_sym"], want_bpe["right_sym"]))


_SKEW_CORPUS = (
    # every doc contains 'vector' -> one-sided labels in the train slice
    [(f"vector common tok{i % 3} filler text", "en", "s1") for i in range(24)]
    # plus a block of empty-ish and repetitive docs
    + [("x", "de", "s2")] * 8
    + [("vector", "fr", "s3")] * 8
    + [("y y y y y y y y", "en", "s4")] * 8
)


def test_q28_quantized_gd_oracle_replay_on_skewed_labels(spark, tmp_path):
    sf_dir = _synthetic_sf_dir(spark, _SKEW_CORPUS, tmp_path)
    qd = REGISTRY["q28_text_analysis"]
    got = qd.spark(spark, sf_dir).toPandas()
    want = _oracle_con(sf_dir).execute(qd.oracle).df()
    compare_frames(got, want, "q28-adversarial")


def test_q46_quantile_sketch_oracle_replay_on_pathological_lengths(spark, tmp_path):
    """Token counts chosen to sit ON bucket boundaries (powers of two and
    neighbors) — the exactness frontier of the integer bucketing."""
    rows = []
    for n in [0, 1, 15, 16, 17, 31, 32, 33, 127, 128, 129, 1023, 1024]:
        rows.append((" ".join(["t"] * n) if n else "", "en", f"s{n % 3}"))
    sf_dir = _synthetic_sf_dir(spark, rows * 3, tmp_path)
    qd = REGISTRY["q46_token_percentiles"]
    got = qd.spark(spark, sf_dir).toPandas()
    want = _oracle_con(sf_dir).execute(qd.oracle).df()
    compare_frames(got, want, "q46-adversarial")


def _synthetic_embeddings(spark, sf_dir, vecs) -> None:
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")


def _oracle_con_with(sf_dir: str, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    return con


def test_q37_q38_replay_on_duplicate_vectors_exact_cosine_ties(spark, tmp_path):
    """The clustering pack ranks on the UNROUNDED cosine with id
    tiebreaks. Distinct-but-equal-cosine vectors would be flaky across
    engines (each computes its own last-ulp noise); DUPLICATE vectors tie
    EXACTLY within each engine — identical inputs give identical floats —
    so the id tiebreak alone decides, and it must decide the same way in
    both engines. Duplicates among the SEEDS (vec_id < 8) also force
    identical centroids, exercising the lowest-cid assignment rule."""
    import math

    base = [
        [round(math.cos(0.31 * i + j), 6) for i in range(64)] for j in range(6)
    ]
    vecs = [(i, base[i % 6], i % 3) for i in range(24)]  # every vector 4x
    sf_dir = str(tmp_path)
    _synthetic_embeddings(spark, sf_dir, vecs)
    for qname in ("q37_ivf_topk", "q38_kmeans_topics"):
        qd = REGISTRY[qname]
        got = qd.spark(spark, sf_dir).toPandas()
        want = _oracle_con_with(sf_dir, ["embeddings"]).execute(qd.oracle).df()
        compare_frames(got, want, f"{qname}-adversarial")


_EDGE_CORPUS = [
    ("", "en", "s1"),                                  # empty text
    ("one", "en", "s1"),                               # single token
    ("a b c d e f g h", "en", "s1"),                   # exactly the abstract
    ("a b c d e f g h i", "en", "s1"),                 # 1-token body
    ("t1  t2   t3 t4", "en", "s2"),                    # multi-space runs
    (" lead trail ", "en", "s2"),                      # edge spaces
    (("w " * 25).strip(), "en", "s2"),                 # body spans 2 slices
    (("x " * 41).strip(), "en", "s3"),                 # body spans 3 slices
]


def test_q13_chunk_arm_on_edge_shape_corpus(spark, tmp_path):
    """The round-7 q13 'chunk'/'h2' arms (P6 prepend + clean-then-
    enumerate + chunk-id injectivity) replayed on shapes the driver
    corpus lacks: empty docs, abstract-only docs, empty-token runs from
    multi-space text, and bodies spanning several 16-token slices. Both
    engines must agree row for row."""
    sf_dir = _synthetic_sf_dir(spark, _EDGE_CORPUS, tmp_path)
    qd = REGISTRY["q13_tokenize_explode"]
    got = qd.spark(spark, sf_dir).toPandas()
    want = _oracle_con(sf_dir).execute(qd.oracle).df()
    compare_frames(got, want, "q13-edge-shapes")
    # sanity: the corpus exercised both sections and the h2 arm is live
    kinds = set(got["kind"])
    assert {"tok", "chunk", "h2"} <= kinds
    chunk_rows = got[got["kind"] == "chunk"]
    assert (chunk_rows["token"].str.startswith("0:Abstract:")).any()
    assert (chunk_rows["token"].str.startswith("1:Body:")).any()


# --- round-8 arms: temperature_mix water-filling + MMR tie-breaks ----------


def test_q50_tmix_oracle_replay_on_cap_edge_corpora(spark, tmp_path):
    """The round-8 'tmix' arm on corpora built to stress what sf0.01
    cannot: (A) target >> total tokens — EVERY derived domain must cap at
    1.0 through the water-filling rounds; (B) a ZERO-TOKEN domain (all
    'big' docs empty) — weight 0, capped immediately by the 0 >= 0 rule,
    budget untouched. Both engines replay the identical loop state."""
    from pubmed_central_semantic_search_spark.registry import REGISTRY

    qd = REGISTRY["q50_split_and_sample"]
    corpora = {
        "all_cap": [
            (f"w{i} x{i % 3} y", "en", f"s{i % 2}") for i in range(120)
        ],
        "zero_token_domain": [
            ("alpha beta gamma delta " * 3, "en", "s1") if i < 100 else
            ("", "en", "s2")
            for i in range(120)
        ],
    }
    for name, rows in corpora.items():
        sf = _synthetic_sf_dir(spark, rows, tmp_path / name)
        got = qd.spark(spark, sf).toPandas()
        want = _oracle_con(sf).execute(qd.oracle).df()
        compare_frames(got, want, f"q50-tmix-{name}")
        # the stress actually happened: assert the cap structure
        import pandas as pd  # noqa: F401

        by_src = got.groupby("mix_src")["in_tmix"].mean()
        if name == "all_cap":
            assert (by_src == 1.0).all(), by_src
        else:
            # the empty domain has no rows kept or dropped distinctively;
            # the populated domains must still mix deterministically
            assert set(by_src.index) <= {"tiny", "mid", "big"}


def test_q49_mmr_oracle_replay_on_duplicate_vectors(spark, tmp_path):
    """The round-8 'mmr' arm under EXACT cosine ties: duplicate vectors
    make rel and pairwise redundancy collide to the digit, so the
    id-ascending tie-break alone decides the greedy picks — and must
    decide identically in both engines (the q37/q38 duplicate-vector
    discipline applied to the new arm)."""
    from pubmed_central_semantic_search_spark.registry import REGISTRY

    qd = REGISTRY["q49_hybrid_rrf"]
    rows = [
        (f"doc join hash window vector t{i % 4}", "en", f"s{i % 3}")
        for i in range(40)
    ]
    sf = _synthetic_sf_dir(spark, rows, tmp_path / "dupvec")
    # embeddings: only 3 DISTINCT vectors over 40 ids — mass ties
    import math

    def vec(i):
        base = [math.sin(0.31 * d + 0.11 * (i % 3)) for d in range(64)]
        return [float(round(x, 6)) for x in base]

    emb = spark.createDataFrame(
        [(i, vec(i), i % 5) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    emb.coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    con = _oracle_con(sf)
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    got = qd.spark(spark, sf).toPandas()
    want = con.execute(qd.oracle).df()
    compare_frames(got, want, "q49-mmr-dupvec")
    # the stress actually happened: the mmr arm picked among tied scores
    mmr = got[got["kind"] == "mmr"].sort_values("mmr_rank")
    assert len(mmr) == 5
    assert mmr["mmr_relevance"].nunique() <= 3  # ties were really present
