"""N-gram language-model perplexity scoring (EXT X4 — the classic
corpus-quality signal).

The reference filters nothing (it ingests whole PMC articles,
``/root/reference/src/backend/data_fetching/data_fetcher.py:48-57``); a
100 TB curation pipeline's first quality gate is usually perplexity under
a small LM trained on trusted text (CCNet's KenLM filter and its
descendants). This is the Spark-shaped version with a bigram model and
add-k smoothing — the n=2 case keeps every stage a plain DataFrame
aggregate while exercising the exact train/score shape a 5-gram model
would use.

Shapes, stage by stage (all pure Catalyst, zero UDFs):

- **bigram extraction is NARROW**: tokens come out of one ``split``;
  the (w1, w2) stream is ``arrays_zip(slice(tk, 1, n-1),
  slice(tk, 2, n-1))`` exploded — no window function, no self-join, no
  shuffle before the count aggregates.
- **training** is two partial-aggregated ``groupBy`` counts (bigram and
  left-unigram tables) plus one ``countDistinct`` for the vocabulary
  size. Model size is corpus-vocabulary-bounded, never corpus-bounded.
- **scoring** joins the bigram stream back to the model on the (w1, w2)
  key — an equi-join that broadcasts when the model is small (the usual
  case: a quality LM is trained on a bounded trusted sample) and
  shuffles on the bigram key otherwise. Per-doc aggregation is one
  ``avg`` of log-probabilities; perplexity = ``exp(-avg)``.

Smoothed probability: ``p(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)``
with ``c(w1·)`` the count of w1 as a bigram LEFT and ``V`` the corpus
vocabulary size. Every value is integer-exact except the final
ln/avg/exp, which both engines compute on doubles — the driver oracle
rounds to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import _tokens


def _bigram_stream(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, narrow."""
    tk = _tokens(text_col)
    n = F.size(tk)
    pairs = F.arrays_zip(
        F.slice(tk, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice(tk, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    return docs.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )


def train_bigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Train on ``docs``: returns (bigram counts (w1, w2, c12),
    left-unigram counts (w1, c1), vocabulary size V). Two shuffles, both
    partial-aggregated; V is one countDistinct over the token stream."""
    big = _bigram_stream(docs, id_col, text_col)
    c_big = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c1 is a marginal of c_big (every bigram row counted once either
    # way) — aggregating the MODEL-sized bigram table instead of
    # re-scanning and re-shuffling the corpus bigram stream a second
    # time (review find: at 100 TB the second corpus pass was the cost)
    c_uni = c_big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    toks = docs.select(
        F.explode(_tokens(text_col)).alias("t")
    )
    vocab_size = toks.agg(F.countDistinct("t")).first()[0]
    return c_big, c_uni, int(vocab_size)


def bigram_perplexity(
    docs: DataFrame,
    c_big: DataFrame,
    c_uni: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document perplexity under the trained model: (id, ppl).

    Documents with fewer than two tokens have no bigrams and drop out
    (callers LEFT-join and coalesce). ``broadcast_model=False`` switches
    the model joins to shuffle joins for vocabulary sizes beyond
    broadcast comfort."""
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive")
    if k <= 0:
        # k=0 makes an unseen bigram's log-prob ln(0) = NULL under ANSI,
        # and avg() silently SKIPS nulls — a junk document full of
        # never-seen bigrams would score a finite, misleadingly GOOD
        # perplexity over only its seen pairs (review find)
        raise ValueError("bigram_perplexity: smoothing k must be > 0")
    wrap = F.broadcast if broadcast_model else (lambda d: d)
    big = _bigram_stream(docs, id_col, text_col)
    # unseen bigrams (scoring a corpus the model never saw) keep c12=0 /
    # c1=0 through the LEFT joins — smoothing keeps p > 0 either way
    scored = (
        big.join(wrap(c_big), ["w1", "w2"], "left")
        .join(wrap(c_uni), ["w1"], "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(float(k)))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(k) * vocab_size))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(F.exp(-F.avg("_lp")).alias("ppl"))
