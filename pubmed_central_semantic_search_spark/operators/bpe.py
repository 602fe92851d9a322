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


def bpe_train_batched(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "token",
    count_col: str = "count",
    checkpoint_every: int = 8,
    max_batch: int = 16,
) -> list[tuple[str, str]]:
    """``bpe_train`` with BATCHED merge selection — one Spark action
    selects up to ``max_batch`` merges, attacking the sequential trainer's
    real scale bound: a production tokenizer needs 30k+ merges, and one
    driver round-trip PER MERGE means 30k sequential jobs whatever the
    data size. Returns the IDENTICAL merge list (parity is proved, not
    approximated — test-pinned against ``bpe_train`` on the paper corpus,
    hypothesis-random vocabularies, and the tie-dense adversarial corpus).

    Exactness argument. Take the pair stats sorted by (count DESC, a, b)
    — the sequential tiebreak order — and accept a PREFIX p_1..p_k as one
    round's batch, stopping at the first row that fails any rule:

    1. NON-INTERACTING: a candidate is rejected (and the prefix stops) if
       {a, b, a+b} intersects any accepted pair's {a, b, a+b}. Merging
       p_j can only change the count of a pair that shares one of p_j's
       symbols (occurrence overlap) or contains p_j's concatenated symbol
       (new adjacencies) — so pairwise-non-interacting batch members keep
       EXACTLY their original counts through every earlier member's merge,
       and their relative order cannot flip.
    2. SELF-PAIR TERMINATES: a pair with a == b may be accepted only as
       the batch's LAST member. A self-merge over symbol runs creates
       pairs on its own merged symbol ((aa,a), (aa,aa)) whose counts are
       bounded by the self-pair's OWN count — not by the excluded tail —
       so nothing may be scheduled after it within the round.
    3. STRICT 4× BOUNDARY: with N = the first EXCLUDED row's count, every
       accepted p_i (i ≥ 2) must satisfy count(p_i) > 4·N (counts are
       non-increasing, so checking p_k suffices; the prefix is truncated
       from the right until it holds). Why 4: a non-member pair (s, t)'s
       occurrences after any subset of batch merges decompose by how each
       side was produced — s literal or assembled by the single batch
       member whose concat is s (concats are DISTINCT within a batch:
       rule 1's trio check covers concat collisions), same for t. Each of
       the ≤ 4 classes is bounded by one ORIGINAL pair count that shares
       a symbol with a batch member and is therefore itself outside the
       batch, ≤ N — so every non-member scores ≤ 4N < count(p_i) at
       sequential step i, and p_i is the strict argmax, exactly what
       ``bpe_train`` would pick.

    Worst case (flat count distribution) the batch degenerates to size 1
    and the trainer IS the sequential one; on Zipfian pair counts —
    natural text — early rounds batch many merges. Per-round cost is one
    TakeOrderedAndProject collect of ``max_batch + 1`` rows (driver-sized)
    plus the same narrow Catalyst folds."""
    cur = vocab.select(
        word_symbols(word_col).alias("symbols"),
        F.col(count_col).cast("bigint").alias("count"),
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        want = min(max_batch, n_merges - len(merges))
        rows = (
            pair_stats(cur)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(want + 1)
            .collect()
        )
        if not rows:
            break
        stats_complete = len(rows) < want + 1  # the FULL tail is in hand
        # rule 1 + 2: maximal non-interacting prefix, self-pair last
        used: set[str] = set()
        k = 0
        for r in rows:
            if k >= want:
                break
            trio = {r["a"], r["b"], r["a"] + r["b"]}
            if trio & used:
                break
            used |= trio
            k += 1
            if r["a"] == r["b"]:
                break
        # rule 3: strict 4× boundary against the first excluded row.
        while k > 1:
            if k < len(rows):
                nxt = rows[k]["pair_count"]
            else:
                # an excluded witness always exists when needed: the
                # accept loop caps k at `want` and we collected want+1
                # rows, so running past the end means the stats ran dry
                # — the next pair count is genuinely 0
                assert stats_complete, "k==len(rows) with a full tail"
                nxt = 0
            if rows[k - 1]["pair_count"] > 4 * nxt:
                break
            k -= 1
        k = max(k, 1)
        batch = [(rows[i]["a"], rows[i]["b"]) for i in range(k)]
        merges.extend(batch)
        for a, b in batch:
            cur = cur.select(apply_merge("symbols", a, b).alias("symbols"), "count")
        since_ckpt += len(batch)
        if since_ckpt >= checkpoint_every:
            cur = cur.localCheckpoint()
            since_ckpt = 0
    return merges


def bpe_train_local(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "token",
    count_col: str = "count",
    max_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Production-merge-count trainer: collect the (word, count) VOCABULARY
    and learn all merges driver-side with incrementally-maintained pair
    counts. Identical output to ``bpe_train`` (parity test-pinned).

    Why this is the 100 TB shape, not a shortcut: BPE training touches the
    corpus exactly once (``build_vocab`` — distributed, corpus-sized);
    everything after operates on the distinct-words table, which is
    MILLIONS of rows when the corpus is terabytes — driver-sized. The
    distributed trainers pay one-to-a-few Spark actions PER MERGE over
    that same small table (30k merges = tens of thousands of sequential
    jobs: the scale bound is merge count, not data), and the provably-
    exact batched selection (``bpe_train_batched``) degenerates to
    sequential on letter-level pair stats because natural-language top
    pairs share symbols and sit within 4× of each other. Collecting the
    vocabulary obeys the package's k-sized-collect rule — guarded by
    ``max_rows`` with a named error, the same discipline as the other
    driver-side model fits (k-means seeds, DSIR model, MMR).

    Per-merge cost: argmax over live pairs + a rescan of only the words
    containing the merged pair (inverted index) — milliseconds; a 100-
    merge train runs ~100× faster than the distributed per-merge loop
    (bench entry ``x_bpe_train_local100``)."""
    from ..session import collect_bounded

    rows = collect_bounded(
        vocab.select(word_col, count_col), max_rows, "bpe_train_local vocabulary"
    )
    if any(c is not None and int(c) <= 0 for _, c in rows):
        # the incremental index cannot tell a true zero-count pair from a
        # subtracted-stale one, so its liveness filter would diverge from
        # the distributed trainer (which WILL merge a zero-count argmax);
        # the parity contract's domain is positive counts — fail loudly
        raise ValueError(
            "bpe_train_local: vocabulary counts must be positive "
            "(zero/negative counts are outside the parity domain; filter "
            "them out or use bpe_train)"
        )
    import heapq
    from collections import defaultdict

    # NULL tokens/counts contribute nothing in the distributed trainer
    # (word_symbols(null) → null → filtered); skipping them here keeps
    # parity — str(None) would have trained on the literal word "None"
    rows = [(w, c) for w, c in rows if w is not None and c is not None]
    words = [list(str(w)) + [EOW] for w, _ in rows]
    counts = [int(c) for _, c in rows]
    pair_count: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, c) in enumerate(zip(words, counts)):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_count[p] += c
            where[p].add(wi)
    # lazy max-heap argmax (round-7: a full pair-table scan per merge was
    # O(pairs) — invisible at 100 merges, the whole wall at 10k): entries
    # are (-count, a, b) snapshots pushed on every count change; a popped
    # entry is valid only if it still matches pair_count (stale snapshots
    # discard). SAME selection as the scan — max count, then lexicographic
    # (a, b) — because the heap orders exactly by that key and the match
    # check accepts only current values; parity with bpe_train is pinned
    # in test_bpe.py.
    heap = [(-c, p[0], p[1]) for p, c in pair_count.items() if c > 0]
    heapq.heapify(heap)

    def _push(p: tuple[str, str]) -> None:
        c = pair_count[p]
        if c > 0:
            heapq.heappush(heap, (-c, p[0], p[1]))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, a0, b0 = heapq.heappop(heap)
            if pair_count.get((a0, b0), 0) == -negc:
                best = (a0, b0)
                break
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        touched: set[tuple[str, str]] = set()
        # rescan ONLY the words that (may) contain the pair; a stale index
        # entry nets out to zero (subtract-then-re-add of unchanged pairs)
        for wi in list(where.get(best, ())):
            syms, c = words[wi], counts[wi]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_count[p] -= c
                touched.add(p)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_count[p] += c
                where[p].add(wi)
                touched.add(p)
        where.pop(best, None)
        pair_count.pop(best, None)
        touched.discard(best)
        # re-snapshot every pair whose count changed (once per merge, not
        # once per word — the subtract-then-re-add of unchanged pairs
        # nets out and needs no new heap entry, but we can't tell without
        # comparing, so push all touched: stale entries self-discard)
        for p in touched:
            _push(p)
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
    """Arrow-batched tokenizer for production-sized merge tables,
    identical to the stacked folds (test-pinned) but O(word_len²) per
    word INDEPENDENT of table size (round-7: the naive all-rules loop
    cost 10k rule checks per word — 274 s to segment the sf0.1 corpus
    with a 10k table; this runs it in seconds).

    Algorithm — in-order with rank skipping: the fold applies rule k to
    the state after rules 1..k-1, and rules it skipped (pair absent at
    their turn) are NEVER revisited even if a later merge re-creates
    their pair. So a single advancing rank pointer suffices: repeatedly
    find the LOWEST-rank rule whose pair is present in the current word
    AND whose rank exceeds the last applied rank (the word state between
    two applied ranks is exactly the fold's state when it reached each
    skipped rule, so absence here == absence there), apply it
    left-to-right, advance. Each application shrinks the word, bounding
    iterations by word length. NOTE this differs from GPT-2's
    min-rank-repeat, which DOES revisit lower ranks — our contract is
    the fold. Duplicate (a,b) rules keep every rank (a re-created pair
    is re-merged at the duplicate's own turn, like the fold).
    Ship-by-value closure (plain-data capture, imports in body)."""
    from pyspark.sql.functions import pandas_udf

    merges_l = [(str(a), str(b)) for a, b in merges]
    eow_l = str(eow)
    ranks_l: dict[tuple[str, str], list[int]] = {}
    for idx, p in enumerate(merges_l):
        ranks_l.setdefault(p, []).append(idx)

    @pandas_udf("array<string>")
    def _segment(words):
        import pandas as pd

        def seg(word):
            syms = list(word) + [eow_l]
            prev = -1
            while True:
                best = None
                for i in range(len(syms) - 1):
                    # ranks lists are ascending: the first entry > prev is
                    # this pair's next applicable rank
                    for r in ranks_l.get((syms[i], syms[i + 1]), ()):
                        if r > prev:
                            if best is None or r < best:
                                best = r
                            break
                if best is None:
                    return syms
                a, b = merges_l[best]
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
                prev = best

        return pd.Series([seg(w) for w in words])

    return _segment
