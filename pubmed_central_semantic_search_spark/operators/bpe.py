"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016) — the
step after ``build_vocab`` (q55) in a real LLM data pipeline: learn the
merge table, then tokenize the corpus with it.

Why this scales: BPE training never touches the corpus after ONE pass —
the algorithm operates on the (word, count) VOCABULARY table (Sennrich's
own formulation), which is distinct-words-sized, orders of magnitude
smaller than 100 TB of text. Shape per merge iteration:

- pair stats: narrow slice/zip_with explode of adjacent symbol pairs
  weighted by word count → ONE partial-aggregated groupBy → the argmax
  pair comes back by ``orderBy().limit(1)`` (TakeOrderedAndProject — a
  1-row driver round-trip, the k-sized collect rule).
- merge application: a pure-Catalyst left-to-right fold over each word's
  symbol array (``F.aggregate`` with an array accumulator) — narrow,
  no shuffle, exactly the reference algorithm's greedy scan.

Lineage is truncated with ``localCheckpoint`` every few merges (the CC
precedent — an iterative operator must not grow the plan unboundedly).

Encoding new text re-uses the same Catalyst fold per merge for small
merge tables; for production-sized tables ``bpe_segment_udf`` applies the
whole table in one Arrow-batched pass (ship-by-value closure).

The unit tests pin training AND encoding against a plain-Python
re-implementation of the paper's algorithm (merge-for-merge equality on
the paper's own 'low/lower/newest/widest' corpus).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker (paper's convention)


def word_symbols(word_col: Column | str) -> Column:
    """Initial symbol array: characters + end-of-word marker. (The empty
    filter matches Python ``list("")``: Spark's split of "" yields [""].)"""
    w = F.col(word_col) if isinstance(word_col, str) else word_col
    chars = F.filter(F.split(w, ""), lambda s: s != "")
    return F.concat(chars, F.array(F.lit(EOW)))


def apply_merge(sym_col: Column | str, a: str, b: str) -> Column:
    """One BPE merge rule applied left-to-right (greedy, non-overlapping):
    every adjacent (a, b) becomes the concatenated symbol. Pure-Catalyst
    fold with an array accumulator — the sequential semantics ARE the
    reference algorithm's scan, so [a,a,a] under (a,a) → [aa, a]."""
    sym = F.col(sym_col) if isinstance(sym_col, str) else sym_col
    merged = a + b
    return F.aggregate(
        sym,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def pair_stats(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbolized vocab
    (columns: symbols array<string>, count bigint) — every overlapping
    adjacent pair counts, weighted by word count (the paper's
    ``get_stats``). Narrow explode → one partial-aggregated groupBy."""
    n = F.size("symbols")
    pairs = F.zip_with(
        F.slice(F.col("symbols"), F.lit(1), n - 1),
        F.slice(F.col("symbols"), F.lit(2), n - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        vocab.filter(n >= 2)
        .select("count", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("count").alias("pair_count"))
    )


def bpe_train(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "token",
    count_col: str = "count",
    checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, count) vocabulary
    frame (the ``build_vocab`` output shape). Returns the ordered merge
    list. Deterministic: ties on pair count break lexicographically.

    Cost: ONE action per merge (the argmax aggregate; pending folds ride
    on top of it lazily) + an eager ``localCheckpoint`` every
    ``checkpoint_every`` merges bounding both lineage depth and fold
    recompute; the corpus itself is only read by whoever built ``vocab``.
    """
    cur = vocab.select(
        word_symbols(word_col).alias("symbols"),
        F.col(count_col).cast("bigint").alias("count"),
    ).localCheckpoint()  # eager: the loop never re-reads the source
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        best = (
            pair_stats(cur)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        cur = cur.select(apply_merge("symbols", a, b).alias("symbols"), "count")
        if (it + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    word_col: str = "token",
    out_col: str = "bpe",
) -> DataFrame:
    """Tokenize words with a SMALL merge table via stacked Catalyst folds
    (one fold per merge — plan size grows with the table; fine for tests
    and short tables, use ``bpe_segment_udf`` beyond ~50 merges)."""
    sym = word_symbols(word_col)
    for a, b in merges:
        col = apply_merge(sym, a, b)
        sym = col
    return df.withColumn(out_col, sym)


def bpe_segment_udf(merges: Sequence[tuple[str, str]], eow: str = EOW):
    """Arrow-batched tokenizer for production-sized merge tables: applies
    the whole ordered merge list per word in one pandas pass (rank-greedy
    per rule, identical to the stacked folds — test-pinned). Ship-by-value
    closure (plain-list capture, imports in body)."""
    from pyspark.sql.functions import pandas_udf

    merges_l = [(str(a), str(b)) for a, b in merges]
    eow_l = str(eow)

    @pandas_udf("array<string>")
    def _segment(words):
        import pandas as pd

        def seg(word):
            syms = list(word) + [eow_l]
            for a, b in merges_l:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return pd.Series([seg(w) for w in words])

    return _segment
