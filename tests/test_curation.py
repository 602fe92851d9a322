"""Unit tests for the curation + hybrid-retrieval operators (hand-computed
fixtures; the registry oracle suite covers them at driver scale)."""

import math

import pyspark.sql.functions as F

from pubmed_central_semantic_search_spark.operators.curation import (
    decontaminate,
    hash_split,
    pack_sequences,
    shingle_set,
)
from pubmed_central_semantic_search_spark.operators.retrieval import (
    bm25_rank,
    mmr_rerank,
    rrf_fuse,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_bm25_hand_computed(spark):
    # 3 docs, terms: 'a' appears in docs 1 (x2 of 4 tokens) and 2 (x1 of 2)
    docs = _docs(
        spark,
        [
            (1, "s", "a b a c"),
            (2, "s", "a d"),
            (3, "s", "e f g h"),
        ],
    )
    out = {
        r["doc_id"]: r["bm25_score"]
        for r in bm25_rank(docs, ["a"], k=10).collect()
    }
    n, df_t, avgdl, k1, b = 3, 2, 10 / 3, 1.2, 0.75

    def score(tf, dl):
        idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert out == {1: score(2, 4), 2: score(1, 2)}
    assert 3 not in out  # no query term -> unranked


def test_rrf_fusion_hand_computed(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, bm25_rank int")
    b = spark.createDataFrame([(2, 1), (9, 2)], "doc_id long, cos_rank int")
    out = {r["doc_id"]: r for r in rrf_fuse(a, b, k=10).collect()}
    assert out[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)  # both lists
    assert out[1]["rrf_score"] == round(1 / 61, 6)  # bm25 only
    assert out[9]["rrf_score"] == round(1 / 62, 6)  # cosine only
    assert out[2]["fused_rank"] == 1  # fusion promotes the doc both rankers like


def _mmr_candidates(spark):
    # docs 1 and 2 are near-identical and most query-relevant; doc 3 is
    # diverse but less relevant. None is collinear with the query (if the
    # seed WERE the query direction, relevance and redundancy would cancel
    # for every remaining doc and MMR would degenerate to a tie).
    return spark.createDataFrame(
        [
            (1, [0.98, 0.199, 0.0]),
            (2, [0.96, 0.28, 0.0]),  # near-duplicate of doc 1
            (3, [0.6, 0.0, 0.8]),  # diverse alternative
        ],
        "doc_id long, vec array<double>",
    )


def test_mmr_lambda1_is_relevance_order(spark):
    out = mmr_rerank(_mmr_candidates(spark), [1.0, 0.0, 0.0], k=3, lam=1.0)
    rows = out.orderBy("mmr_rank").collect()
    assert [r["doc_id"] for r in rows] == [1, 2, 3]  # pure cosine order
    assert rows[0]["relevance"] > 0.97
    # with lam=1 the mmr score IS the relevance
    assert all(r["mmr_score"] == r["relevance"] for r in rows)


def test_mmr_diversifies_past_near_duplicate(spark):
    out = mmr_rerank(_mmr_candidates(spark), [1.0, 0.0, 0.0], k=2, lam=0.5)
    rows = out.orderBy("mmr_rank").collect()
    # pick 2 must skip the near-duplicate doc 2 (cos vs doc1 ≈ 0.997,
    # mmr ≈ -0.018) in favor of diverse doc 3 (cos ≈ 0.588, mmr ≈ +0.006)
    assert [r["doc_id"] for r in rows] == [1, 3]
    assert rows[1]["redundancy"] < 0.6  # cos(doc3, doc1)
    assert rows[0]["redundancy"] == 0.0  # seed has nothing selected yet


def test_mmr_deterministic_and_bounded(spark):
    cands = _mmr_candidates(spark)
    a = [r["doc_id"] for r in mmr_rerank(cands, [1.0, 0.0, 0.0], k=10, lam=0.3).collect()]
    b = [r["doc_id"] for r in mmr_rerank(cands, [1.0, 0.0, 0.0], k=10, lam=0.3).collect()]
    assert a == b and len(a) == 3  # k beyond candidate count -> all, stable
    assert mmr_rerank(cands.limit(0), [1.0, 0.0, 0.0], k=5).count() == 0


def test_mmr_null_vector_raises_by_name(spark):
    """Round-9 (verdict #4): a NULL embedding / null component reaching
    the collected candidate list (corpus smaller than N) used to die
    with a bare TypeError from float(None) — now a NAMED error with the
    upstream fix spelled out (pca_fit's round-8 fix is the template)."""
    import pytest

    null_vec = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "doc_id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="mmr_rerank.*doc_id=2.*NULL"):
        mmr_rerank(null_vec, [1.0, 0.0], k=2)
    null_comp = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [None, 1.0])], "doc_id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="mmr_rerank.*doc_id=2"):
        mmr_rerank(null_comp, [1.0, 0.0], k=2)


def test_hash_split_is_content_addressed(spark):
    docs = _docs(spark, [(i, "s", "x") for i in range(200)])
    full = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    # same keys through a different (subset) frame -> same assignment
    sub = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.filter(F.col("doc_id") < 50)).collect()
    }
    assert all(full[k] == v for k, v in sub.items())
    assert set(full.values()) == {"train", "val", "test"}
    buckets = [r["bucket"] for r in hash_split(docs).collect()]
    assert all(0 <= x < 256 for x in buckets)


def test_pack_sequences_coordinates(spark):
    # ctx=4: doc 1 (3 tok) -> seq0 off0..2; doc 2 (3 tok) -> starts seq0
    # off3, straddles into seq1; doc 3 (2 tok) -> seq1 off2..3
    docs = _docs(
        spark,
        [(1, "s", "a b c"), (2, "s", "d e f"), (3, "s", "g h")],
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["seq_end"])
        for r in pack_sequences(docs, ctx_len=4).collect()
    }
    assert out == {1: (0, 0, 0), 2: (0, 3, 1), 3: (1, 2, 1)}


def test_pack_sequences_is_per_shard(spark):
    docs = _docs(spark, [(1, "s1", "a b"), (2, "s2", "c d")])
    out = {r["doc_id"]: r["seq_offset"] for r in pack_sequences(docs, 4).collect()}
    assert out == {1: 0, 2: 0}  # independent streams per shard


def test_decontaminate_flags_planted_overlap(spark):
    text = " ".join(f"w{i}" for i in range(12))  # 5 distinct 8-gram shingles
    corpus = _docs(spark, [(1, "s", text), (2, "s", "only unrelated words here")])
    bench = _docs(spark, [(100, "s", text)])
    out = decontaminate(corpus, bench, n=8).collect()
    assert len(out) == 1
    assert (out[0]["doc_id"], out[0]["bench_id"], out[0]["n_shared"]) == (1, 100, 5)
    # shingle_set: n distinct shingles = tokens - n + 1 when all distinct
    assert shingle_set(_docs(spark, [(7, "s", text)]), 8).count() == 5


def test_decontaminate_join_is_equi_not_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = decontaminate(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_decontaminate_hand_computed(spark):
    from pubmed_central_semantic_search_spark.operators.curation import (
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0, 0.0]),   # exact copy of bench 10
            (2, "a", [0.9, 0.1, 0.0]),   # near bench 10 (cos ~0.9939)
            (3, "a", [0.0, 1.0, 0.0]),   # orthogonal — clean
            (4, "b", [1.0, 0.0, 0.0]),   # would match bench 10, but other block
        ],
        "vec_id int, label string, emb array<double>",
    )
    bench = spark.createDataFrame(
        [(10, "a", [1.0, 0.0, 0.0])], "vec_id int, label string, emb array<double>"
    )
    out = {
        (r["corpus_id"], r["bench_id"]): r["cosine"]
        for r in semantic_decontaminate(
            corpus, bench, min_cosine=0.99, vec_col="emb", block_col="label"
        ).collect()
    }
    assert set(out) == {(1, 10), (2, 10)}
    assert out[(1, 10)] == 1.0

    # unblocked: the cross-block pair appears (bench side is constant-sized
    # and broadcast, so this is still one linear corpus scan)
    ub = semantic_decontaminate(corpus, bench, min_cosine=0.99, vec_col="emb")
    assert {(r["corpus_id"], r["bench_id"]) for r in ub.collect()} == {
        (1, 10),
        (2, 10),
        (4, 10),
    }


def test_semantic_decontaminate_bench_side_broadcast(spark, sf_dir):
    from pubmed_central_semantic_search_spark.operators.curation import (
        semantic_decontaminate,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_decontaminate(
        emb, emb.filter(F.col("vec_id") % 50 == 0), min_cosine=0.99, block_col="label"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_scrub_pii_counts_and_order(spark):
    from pubmed_central_semantic_search_spark.operators.curation import scrub_pii

    rows = [
        # email local part has digits; must be scrubbed as EMAIL, not PHONE
        (1, "mail me at john.doe99@uni-test.org or +1 555-123 4567 ok"),
        # SSN must win over IPv4/phone on the same digits; IP separate
        (2, "ssn 123-45-6789 and host 192.168.0.1 end"),
        (3, "nothing sensitive here"),
        # two emails in one doc
        (4, "a@b.io c@d.edu"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df, "text").collect()}

    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["clean_text"] == "mail me at <EMAIL> or <PHONE> ok"
    assert got[2]["n_ssn"] == 1 and got[2]["n_ipv4"] == 1 and got[2]["n_phone"] == 0
    assert got[2]["clean_text"] == "ssn <SSN> and host <IP> end"
    assert got[3]["clean_text"] == "nothing sensitive here"
    assert all(got[3][f"n_{k}"] == 0 for k in ("email", "ssn", "ipv4", "phone"))
    assert got[4]["n_email"] == 2 and got[4]["clean_text"] == "<EMAIL> <EMAIL>"


def test_pack_sequences_zero_token_docs_clamped(spark):
    """Empty/whitespace docs contribute nothing to the packed stream; their
    seq_end must equal seq_id (the raw floor((before-1)/ctx) underflows to
    seq_id-1 — the round-1 advice finding)."""
    rows = [("s", 0, "a " * 10), ("s", 1, "   "), ("s", 2, "b " * 5)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, ctx_len=4).collect()}
    assert out[1]["n_tokens"] == 0
    assert out[1]["seq_end"] == out[1]["seq_id"]
    # the empty doc sits exactly where doc 0 ended
    assert out[1]["seq_id"] == out[2]["seq_id"]


def test_temperature_fractions_alpha_extremes():
    from pubmed_central_semantic_search_spark.operators.curation import (
        temperature_fractions,
    )

    counts = {"big": 900_000, "small": 100_000}
    # alpha=1: natural proportions -> every source keeps the same fraction
    f1 = temperature_fractions(counts, alpha=1.0, target_tokens=100_000)
    assert abs(f1["big"] - f1["small"]) < 1e-12
    assert abs(f1["big"] - 0.1) < 1e-12
    # alpha=0: equal token budgets per source -> 50k each
    f0 = temperature_fractions(counts, alpha=0.0, target_tokens=100_000)
    assert abs(f0["big"] * 900_000 - 50_000) < 1e-6
    assert abs(f0["small"] * 100_000 - 50_000) < 1e-6
    # intermediate alpha upweights the small source relative to natural
    f7 = temperature_fractions(counts, alpha=0.7, target_tokens=100_000)
    assert f7["small"] > f1["small"] and f7["big"] < 1.0


def test_temperature_fractions_water_filling_cap():
    from pubmed_central_semantic_search_spark.operators.curation import (
        temperature_fractions,
    )

    # alpha=0 wants 50k from each, but 'tiny' only has 10k -> caps at 1.0
    # and the shortfall flows to the other source
    counts = {"big": 500_000, "tiny": 10_000}
    f = temperature_fractions(counts, alpha=0.0, target_tokens=100_000)
    assert f["tiny"] == 1.0
    assert abs(f["big"] * 500_000 - 90_000) < 1e-6
    # total sampled tokens == target when attainable
    total = sum(f[s] * counts[s] for s in counts)
    assert abs(total - 100_000) < 1e-6


def test_temperature_mix_flag_is_deterministic_and_plausible(spark, sf_dir):
    from pubmed_central_semantic_search_spark.operators.curation import (
        temperature_mix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = temperature_mix(docs, alpha=0.5, target_tokens=20_000)
    b = temperature_mix(docs, alpha=0.5, target_tokens=20_000)
    kept_a = sorted(r["doc_id"] for r in a.filter("in_mix").select("doc_id").collect())
    kept_b = sorted(r["doc_id"] for r in b.filter("in_mix").select("doc_id").collect())
    assert kept_a == kept_b  # content-addressed: re-run identical
    assert 0 < len(kept_a) < docs.count()


def test_deterministic_shuffle_is_reproducible_permutation(spark):
    from pubmed_central_semantic_search_spark.operators.curation import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = deterministic_shuffle(df, "doc_id", n_shards=4, seed=3).collect()
    b = deterministic_shuffle(df, "doc_id", n_shards=4, seed=3).collect()
    # reproducible: identical coordinates run to run
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    rows = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in a}
    # a permutation: within each shard, positions are dense 0..n-1
    by_shard = {}
    for _, (s, p) in rows.items():
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) == {0, 1, 2, 3}
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # de-correlated from id order: the first shard-0 doc is not doc 0..3
    # (md5 ordering) and a different seed permutes differently
    c = {r["doc_id"]: (r["shard"], r["shard_pos"])
         for r in deterministic_shuffle(df, "doc_id", n_shards=4, seed=4).collect()}
    assert c != rows
    # appending new docs never moves an existing doc ACROSS shards
    # (content-addressed shard key)
    df2 = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    d = {r["doc_id"]: r["shard"]
         for r in deterministic_shuffle(df2, "doc_id", n_shards=4, seed=3).collect()}
    assert all(d[i] == rows[i][0] for i in range(200))


def test_wrs_key_matches_python_recomputation(spark):
    """The A-ES key is a pure function of (key, weight, salt) — recompute
    it with hashlib/math in plain Python and match the rounded value."""
    import hashlib
    import math

    from pubmed_central_semantic_search_spark.operators.curation import wrs_key

    df = spark.createDataFrame(
        [(1, 4.0), (2, 1.0), (7, 100.0), (9, 0.0), (11, -3.0)],
        "doc_id long, w double",
    )
    got = {
        r["doc_id"]: r["k"]
        for r in df.select("doc_id", wrs_key("w").alias("k")).collect()
    }

    def expect(doc_id, w):
        if w <= 0:
            return -1.0
        v = int(hashlib.md5(f"{doc_id}#wrs".encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 2.0**32
        return round(math.pow(u, 1.0 / w), 6)

    assert got == {i: expect(i, w) for i, w in
                   [(1, 4.0), (2, 1.0), (7, 100.0), (9, 0.0), (11, -3.0)]}


def test_weighted_sample_is_weight_proportional_and_deterministic(spark):
    from pubmed_central_semantic_search_spark.operators.curation import (
        weighted_sample,
    )

    # 200 heavy (w=50) + 200 light (w=1) rows: a k=100 sample must skew
    # hard toward the heavy half (uniform would give ~50/50).
    rows = [(i, 50.0 if i < 200 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = [r["doc_id"] for r in weighted_sample(df, 100, "w").collect()]
    assert len(picked) == 100 and len(set(picked)) == 100
    heavy = sum(1 for i in picked if i < 200)
    assert heavy > 80  # weight ratio 50:1 -> expect ~97, huge margin

    # deterministic across runs, and keys are subset-stable: the same doc
    # carries the same key through a filtered frame
    again = [r["doc_id"] for r in weighted_sample(df, 100, "w").collect()]
    assert picked == again
    sub = weighted_sample(df.filter(F.col("doc_id") < 200), 100, "w")
    full_keys = {r["doc_id"]: r["wrs_key"]
                 for r in weighted_sample(df, 400, "w").collect()}
    assert all(full_keys[r["doc_id"]] == r["wrs_key"] for r in sub.collect())

    # zero/negative weights never appear
    assert not any(i for i in picked if i >= 400)
    df0 = spark.createDataFrame([(1, 0.0), (2, -1.0)], "doc_id long, w double")
    assert weighted_sample(df0, 10, "w").count() == 0


def test_phrase_match_hand_computed(spark):
    from pubmed_central_semantic_search_spark.operators.retrieval import (
        phrase_match_counts,
    )

    docs = _docs(
        spark,
        [
            (1, "s", "the cat sat on the cat mat"),   # "the cat" twice
            (2, "s", "cat the on mat"),               # terms present, order wrong
            (3, "s", "entirely different words"),
            (4, "s", "the cat"),                      # exact doc == phrase
        ],
    )
    out = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_counts(docs, ["the", "cat"]).collect()
    }
    assert out == {1: 2, 4: 1}  # doc 2: no adjacency; doc 3: no terms

    # repeated term inside the phrase: every offset must be satisfied
    rep = _docs(spark, [(1, "s", "a b a c a b a"), (2, "s", "a b c")])
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_match_counts(rep, ["a", "b", "a"]).collect()
    }
    assert got == {1: 2}  # positions 0 and 4


def test_phrase_match_duckdb_parity(spark, sf_dir):
    """Value-level cross-engine check on the real documents table: the
    positional-index join must agree with a DuckDB recomputation of the
    same semantics (unit-level oracle — the registry is capped at 50)."""
    import duckdb

    from pubmed_central_semantic_search_spark.operators.retrieval import (
        phrase_match_counts,
    )
    from pubmed_central_semantic_search_spark.registry import load

    docs = load(spark, sf_dir, "documents")
    # pick a phrase that actually occurs: grab the first two tokens of doc 0
    first = docs.orderBy("doc_id").first()
    phrase = [t for t in first["text"].split(" ") if t][:2]
    got = {
        (r["doc_id"], r["n_matches"])
        for r in phrase_match_counts(docs, phrase).collect()
    }
    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM read_parquet('{sf_dir}/documents.parquet')
    ), q(term, off) AS (VALUES ('{phrase[0]}', 0), ('{phrase[1]}', 1)),
    starts AS (
      SELECT t.doc_id, t.pos - q.off AS anchor
      FROM toks t JOIN q ON t.token = q.term
      WHERE t.pos - q.off >= 0
      GROUP BY t.doc_id, t.pos - q.off
      HAVING COUNT(DISTINCT q.off) = 2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM starts GROUP BY doc_id
    """
    want = {(r[0], r[1]) for r in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) > 0


def test_phrase_match_plan_no_cartesian(spark, sf_dir):
    from pubmed_central_semantic_search_spark.operators.retrieval import (
        phrase_match_counts,
    )
    from pubmed_central_semantic_search_spark.registry import load

    out = phrase_match_counts(load(spark, sf_dir, "documents"), ["alpha", "beta"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # tiny query frame broadcast
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mmr_supports_string_ids(spark):
    cands = spark.createDataFrame(
        [("PMC1", [1.0, 0.0]), ("PMC2", [0.0, 1.0])],
        "doc_id string, vec array<double>",
    )
    rows = mmr_rerank(cands, [1.0, 0.0], k=2, lam=0.7).orderBy("mmr_rank").collect()
    assert [r["doc_id"] for r in rows] == ["PMC1", "PMC2"]


def test_gate_audit_first_failure_attribution_and_fail_closed(spark):
    """gate_audit: each row tagged with the FIRST failing gate in pipeline
    order (so per-gate counts sum to total drops); a NULL predicate is
    FAILED (fail-closed); all-pass rows tag null."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators.curation import (
        gate_audit,
    )

    df = spark.createDataFrame(
        [
            (1, 10, "en"),     # passes both
            (2, 1, "en"),      # fails quality (and would pass lang)
            (3, 1, "de"),      # fails quality FIRST (also fails lang)
            (4, 10, "de"),     # fails lang only
            (5, None, "en"),   # null quality -> fail-closed at quality
        ],
        "id int, q int, lang string",
    )
    out = {
        r["id"]: r["first_failed"]
        for r in gate_audit(
            df,
            [("quality", F.col("q") >= 5), ("lang", F.col("lang") == "en")],
        ).collect()
    }
    assert out == {1: None, 2: "quality", 3: "quality", 4: "lang", 5: "quality"}
    # sum property: drops per gate add up to total drops
    assert sum(1 for v in out.values() if v is not None) == 4


def test_gate_audit_duckdb_parity_demoted(spark, sf_dir):
    """The DEMOTED q41 'audit' arm (oracle-tower amortization policy,
    round 7; driver-green r5+r6): the gate-audit attribution's DuckDB
    value parity, previously replayed inside q41's driver oracle every
    bench round, now runs HERE over the SAME CTE text
    (_Q41_AUDIT_PARITY_SQL imported verbatim) on the real documents table
    — identical rigor, zero driver-bench seconds. Bench: x_gate_audit."""
    import sys as _sys

    from pubmed_central_semantic_search_spark.queries.extensions import (
        _Q41_AUDIT_PARITY_SQL,
        gate_audit_report,
    )

    _sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle_utils import compare_frames, duckdb_con

    got = gate_audit_report(spark, sf_dir).toPandas()
    want = duckdb_con(sf_dir).execute(_Q41_AUDIT_PARITY_SQL).df()
    compare_frames(got, want, "q41-audit-demoted")


def test_temperature_fractions_duckdb_state_machine_parity():
    """Round-8 'tmix' generalization beyond the registry corpus: for
    RANDOM count profiles (hypothesis), the Python water-filling loop and
    the oracle's unrolled CTE state machine must agree on every final
    16-bit cut — the cross-engine determinism the sorted-order weight
    accumulation and integer-valued budget were designed for (alpha=0.5:
    pow(n, 0.5) is correctly-rounded libm in both engines)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pubmed_central_semantic_search_spark.operators.curation import (
        temperature_fractions,
    )

    ALPHA = 0.5
    con = duckdb.connect()  # ONE connection across examples (startup cost)

    def duck_cuts(counts: dict[str, int], target: int) -> dict[str, int]:
        vals = ", ".join(f"('{s}', {n})" for s, n in counts.items())
        rounds = []
        prev, prevb = "st0", "bud0"
        for i in range(1, len(counts) + 2):
            rounds.append(f"""
            ws{i} AS (
              SELECT COALESCE(list_reduce(list_prepend(0.0e0,
                       list(pow(CAST(n AS DOUBLE), {ALPHA}) ORDER BY msrc)
                         FILTER (WHERE NOT capped)),
                       (acc, t) -> acc + t), 0.0e0) AS ws FROM {prev}),
            st{i} AS (
              SELECT s.msrc, s.n,
                     CASE WHEN s.capped THEN TRUE
                          WHEN w.ws > 0 THEN b.budget * pow(CAST(s.n AS DOUBLE), {ALPHA}) / w.ws >= s.n
                          ELSE FALSE END AS capped
              FROM {prev} s CROSS JOIN {prevb} b CROSS JOIN ws{i} w),
            bud{i} AS (
              SELECT b.budget - COALESCE((
                SELECT CAST(sum(s1.n) AS DOUBLE) FROM st{i} s1 JOIN {prev} s0 USING (msrc)
                WHERE s1.capped AND NOT s0.capped), 0.0e0) AS budget
              FROM {prevb} b)""")
            prev, prevb = f"st{i}", f"bud{i}"
        sql = f"""
        WITH cnt(msrc, n) AS (VALUES {vals}),
        st0 AS (SELECT msrc, CAST(n AS BIGINT) AS n, FALSE AS capped FROM cnt),
        bud0 AS (SELECT CAST({target} AS DOUBLE) AS budget),
        {','.join(rounds)},
        wsF AS (
          SELECT COALESCE(list_reduce(list_prepend(0.0e0,
                   list(pow(CAST(n AS DOUBLE), {ALPHA}) ORDER BY msrc)
                     FILTER (WHERE NOT capped)),
                   (acc, t) -> acc + t), 0.0e0) AS ws FROM {prev})
        SELECT s.msrc,
               CAST(CASE WHEN s.capped THEN 65536.0
                    WHEN w.ws > 0 THEN (b.budget * pow(CAST(s.n AS DOUBLE), {ALPHA}) / w.ws) / s.n * 65536.0
                    ELSE 0.0 END AS BIGINT) AS cut
        FROM {prev} s CROSS JOIN {prevb} b CROSS JOIN wsF w
        """
        return dict(con.execute(sql).fetchall())

    @settings(max_examples=25, deadline=None)
    @given(
        counts=st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=0, max_value=10_000_000),
            min_size=1,
            max_size=4,
        ),
        target=st.integers(min_value=1, max_value=20_000_000),
    )
    def check(counts, target):
        py = {
            s: int(round(f * 65536))
            for s, f in temperature_fractions(counts, ALPHA, target).items()
        }
        assert py == duck_cuts(counts, target), (counts, target)

    check()
