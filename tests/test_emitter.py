"""Training-sample emitter: the packed (shard, seq_id) → token_ids rows
an LLM pre-training loader reads. Pinned three ways: structural
invariants (exact ctx_len except shard tails, flattening restores the
per-shard token stream, doc_starts mark real boundaries), a hand-checked
tiny corpus, and a full DuckDB value-parity recomputation on the real
documents table."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.textstats import build_vocab
from pubmed_central_semantic_search_spark.operators.emitter import (
    emit_training_sequences,
)

CTX = 8


def _corpus(spark):
    rows = [
        ("s1", 0, "a b c d e"),
        ("s1", 1, "f g"),
        ("s1", 2, ""),  # empty doc: contributes nothing
        ("s1", 3, "h i j k l m n o p q"),  # straddles a cut
        ("s2", 4, "a a a"),
    ]
    return spark.createDataFrame(rows, "source string, doc_id long, text string")


def _vocab(spark):
    # deterministic toy vocab: token -> 1-based alphabet rank; 'q' absent -> OOV
    toks = "a b c d e f g h i j k l m n o p".split()
    return spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(toks)], "token string, vocab_id long"
    )


def test_emitter_hand_checked(spark):
    out = {
        (r["source"], r["seq_id"]): r
        for r in emit_training_sequences(
            _corpus(spark), _vocab(spark), ctx_len=CTX
        ).collect()
    }
    # s1 stream: a b c d e | f g | h i j k l m n o p q  (17 tokens)
    s0 = out[("s1", 0)]
    assert s0["token_ids"] == [1, 2, 3, 4, 5, 6, 7, 8]
    assert s0["doc_starts"] == [0, 5, 7] and s0["n_docs"] == 3
    s1 = out[("s1", 1)]
    assert s1["token_ids"] == [9, 10, 11, 12, 13, 14, 15, 16]
    assert s1["doc_starts"] == [] and s1["n_docs"] == 1  # straddled in
    s2 = out[("s1", 2)]
    assert s2["token_ids"] == [0]  # 'q' is OOV -> 0; tail is short
    assert s2["doc_starts"] == [] and s2["n_docs"] == 1
    sa = out[("s2", 0)]
    assert sa["token_ids"] == [1, 1, 1] and sa["doc_starts"] == [0]
    assert len(out) == 4


def test_emitter_flatten_roundtrip_real_corpus(spark, sf_dir):
    """Concatenating each shard's sequences in seq_id order restores the
    shard's document-order token-id stream exactly — nothing lost,
    duplicated, or reordered by the pack/emit shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    vocab = build_vocab(docs, "doc_id", "text", min_count=2)
    seqs = emit_training_sequences(docs, vocab, ctx_len=64).collect()
    got = {}
    for r in sorted(seqs, key=lambda r: (r["source"], r["seq_id"])):
        got.setdefault(r["source"], []).extend(r["token_ids"])
        # every non-tail sequence is exactly ctx_len
        assert len(r["token_ids"]) <= 64
    # reference stream: per shard, docs in id order, vocab join in plain SQL
    vmap = {r["token"]: r["vocab_id"] for r in vocab.collect()}
    want = {}
    for d in docs.select("source", "doc_id", "text").collect():
        toks = [t for t in d["text"].split(" ") if t != ""]
        want.setdefault(d["source"], []).append(
            (d["doc_id"], [vmap.get(t, 0) for t in toks])
        )
    for src, pairs in want.items():
        stream = [v for _, ids in sorted(pairs) for v in ids]
        assert got.get(src, []) == stream, src
    # non-tail length check needs per-shard tail knowledge
    by_src = {}
    for r in seqs:
        by_src.setdefault(r["source"], []).append((r["seq_id"], len(r["token_ids"])))
    for src, lens in by_src.items():
        lens.sort()
        for _, ln in lens[:-1]:
            assert ln == 64, src


def test_emitter_matches_duckdb(spark, sf_dir):
    """Full cross-engine value parity of emitted sequences on the real
    documents table (vocab rule = q55's: count>=5, rank by freq desc)."""
    path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    vocab = build_vocab(docs, "doc_id", "text", min_count=5)
    got = {
        (r["source"], r["seq_id"]): (
            list(r["token_ids"]),
            list(r["doc_starts"]),
            r["n_docs"],
        )
        for r in emit_training_sequences(docs, vocab, ctx_len=128).collect()
    }
    sql = f"""
    WITH d AS (
      SELECT source, doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM read_parquet('{path}')
    ),
    counts AS (
      SELECT token, count(*) AS c FROM (SELECT unnest(toks) AS token FROM d)
      GROUP BY token HAVING count(*) >= 5
    ),
    vocab AS (
      SELECT token, row_number() OVER (ORDER BY c DESC, token) AS vid
      FROM counts
    ),
    pos AS (
      SELECT source, doc_id,
             coalesce(sum(len(toks)) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before,
             generate_subscripts(toks, 1) - 1 AS tpos,
             unnest(toks) AS token
      FROM d
    ),
    ids AS (
      SELECT source, doc_id, (before + tpos) // 128 AS seq_id,
             CAST((before + tpos) % 128 AS INT) AS off,
             coalesce(v.vid, 0) AS vid, tpos = 0 AS is_start
      FROM pos LEFT JOIN vocab v USING (token)
    )
    SELECT source, seq_id,
           list(vid ORDER BY off) AS token_ids,
           list(off ORDER BY off) FILTER (is_start) AS doc_starts,
           count(DISTINCT doc_id) AS n_docs
    FROM ids GROUP BY source, seq_id
    """
    want = {
        (r[0], r[1]): (list(r[2]), list(r[3] or []), r[4])
        for r in duckdb.sql(sql).fetchall()
    }
    assert len(got) > 50
    assert got == want


def test_emitter_plan_broadcast_vocab_no_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs, "doc_id", "text", min_count=5)
    plan = (
        emit_training_sequences(docs, vocab, ctx_len=128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_emitter_duplicate_vocab_and_reserved_names_raise(spark):
    """Round-9 review pass: (a) a vocab frame with DUPLICATE token keys
    fanned tokens out through the left join and SILENTLY emitted
    sequences longer than ctx_len — a training loader would read
    misaligned samples with no error anywhere; now a named error. (b)
    shard/order columns named like internal stage columns ('token',
    'seq_id', ...) were silently replaced mid-plan — the _salt/_bucket
    defect class; now a named error."""
    import pytest
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators.emitter import (
        emit_training_sequences,
    )

    docs = spark.createDataFrame(
        [(1, "s", "a b c d"), (2, "s", "b c")],
        "doc_id long, source string, text string",
    )
    dup_vocab = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3), ("c", 4), ("d", 5)],
        "token string, vocab_id long",
    )
    with pytest.raises(Exception, match="duplicate token keys"):
        emit_training_sequences(docs, dup_vocab, ctx_len=4).collect()
    good_vocab = dup_vocab.dropDuplicates(["token"])
    assert emit_training_sequences(docs, good_vocab, ctx_len=4).count() == 2
    with pytest.raises(ValueError, match="reserved internal"):
        emit_training_sequences(
            docs.withColumnRenamed("source", "token"), good_vocab,
            shard_col="token",
        )
