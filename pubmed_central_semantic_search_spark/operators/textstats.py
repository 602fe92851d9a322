"""Text-analysis operators (SURVEY §2.9 X4; north star "text analysis").

Anchored to the reference's string pipeline (chunker F1, cleanup F3-F5) and
generalized to the LLM-pipeline quality stack: language ID, quality
scoring, token counting, document fingerprinting. All pure Catalyst
expressions — per-row, narrow, codegen'd; they scale linearly and never
shuffle (the aggregations over them do, once, on low-cardinality keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny deterministic stopword profiles for the n-gram/stopword language-ID
# heuristic. Real deployments swap in fuller profiles; the operator shape
# (argmax over per-language token-hit counts) is the point.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "de", "et", "est"],
}


def _tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, " "), lambda t: t != "")


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    toks = _tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in LANG_PROFILES.items()
    }


def language_id(text: Column | str) -> Column:
    """Predicted language = argmax score, ties broken alphabetically
    (first language in sorted order that is ≥ all later ones wins);
    all-zero scores fall back to 'und'. The CASE chain has a literal SQL
    twin for the oracle."""
    scores = lang_scores(text)
    langs = sorted(scores)
    expr = F.when(F.greatest(*[scores[lg] for lg in langs]) == 0, F.lit("und"))
    for i, lang in enumerate(langs[:-1]):
        cond = F.lit(True)
        for other in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, stopword/digit
    ratios, mean token length. Downstream filters threshold on these."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "is")))
    n_digit = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
    return df.withColumns(
        {
            "n_chars_q": F.length(text_col).cast("bigint"),
            "n_tokens_q": n_tok.cast("bigint"),
            "mean_token_len": F.round(
                (F.length(text_col) - (n_tok - 1)) / n_tok, 6
            ),
            "stopword_ratio_q": F.round(n_stop / n_tok, 6),
            "digit_ratio_q": F.round(n_digit / n_tok, 6),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score — monotone in "looks like prose": enough
    tokens, sane token length, some stopwords, few digits.

    Computed ENTIRELY in integer arithmetic on a 0-1000 milli scale
    (``quality_milli``), with the float ``quality`` derived at the end.
    Rationale: weighted sums of rounded ratios land exactly on decimal
    rounding boundaries where engines disagree by 1 ulp — integer math is
    bit-deterministic on every engine and at every cluster size."""
    feat = quality_features(df, text_col)
    n_tok = F.col("n_tokens_q")
    n_chars = F.col("n_chars_q")
    toks = _tokens(text_col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "is")))
    n_digit = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$")))
    len_score = F.least(F.floor(n_tok * 1000 / 32), F.lit(1000))
    mean_len_milli = F.floor((n_chars - (n_tok - 1)) * 1000 / n_tok)
    tok_len_score = F.when(
        (mean_len_milli >= 3000) & (mean_len_milli <= 10000), F.lit(1000)
    ).otherwise(F.lit(500))
    stop_score = F.least(F.floor(n_stop * 5000 / n_tok), F.lit(1000))
    digit_penalty = 1000 - F.least(F.floor(n_digit * 2000 / n_tok), F.lit(1000))
    milli = F.floor(
        (3 * len_score + 2 * tok_len_score + 3 * stop_score + 2 * digit_penalty) / 10
    )
    return feat.withColumn("quality_milli", milli.cast("bigint")).withColumn(
        "quality", F.col("quality_milli") / 1000.0
    )


# BPE-ish token pattern: word-ish runs, number runs, or single
# non-space symbols — kept to character classes that mean the same thing
# in Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish regex — the whitespace-free analog of
    tokenizer cost estimation for LLM pipelines."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)).cast("bigint")


FP_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1
FP_BASE = 31


def rolling_fingerprint_col(text_col: Column | str) -> Column:
    """Polynomial rolling-hash fingerprint of the ordered token-hash
    stream as a pure per-row expression:
    ``h = fold(tokens, (acc, t) -> (acc*31 + h32(t)) mod (2^31-1))``.

    Order-sensitive (unlike the set-based MinHash) — detects exact
    sequence duplicates cheaply. The token array is already in document
    order, so the fold is a narrow ``aggregate`` — ZERO shuffle (the
    earlier shape exploded tokens and re-collected them sorted in a
    groupBy: a corpus-wide shuffle to rebuild an order the array already
    had). All arithmetic stays in int64 (31 * 2^31 << 2^63, no overflow).
    NULL for token-less docs."""
    from .dedup import hash32

    toks = _tokens(text_col)
    fold = F.aggregate(
        F.transform(toks, lambda t: hash32(t, 0)),
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * FP_BASE + h) % FP_MOD,
    )
    return F.when(F.size(toks) > 0, fold)


def rolling_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc frame view of ``rolling_fingerprint_col``: (id, fingerprint),
    token-less docs dropped (matching the explode-based set semantics)."""
    return df.select(
        F.col(id_col).alias("_id"),
        rolling_fingerprint_col(text_col).alias("fingerprint"),
    ).filter(F.col("fingerprint").isNotNull())


def repetition_ratio(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """X4 — Gopher-style repetition signal: the fraction of n-gram
    occurrences that are repeats of an earlier occurrence within the same
    document (0 = no repetition, →1 = the text loops). Computed entirely
    on the token ARRAY (narrow, no shuffle): total n-grams vs distinct
    n-grams per row. APPENDS ``n_grams``, ``n_distinct``, ``rep_milli``
    (integer milli-units for cross-engine determinism) to the input
    columns, so it composes with the other per-row quality signals in one
    projection — no self-join needed to reattach them."""
    toks = _tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = df.withColumns(
        {
            "n_grams": F.size(grams).cast("bigint"),
            "n_distinct": F.size(F.array_distinct(grams)).cast("bigint"),
        }
    )
    return out.withColumn(
        "rep_milli",
        F.when(
            F.col("n_grams") > 0,
            ((F.col("n_grams") - F.col("n_distinct")) * 1000)
            .cast("bigint")
            / F.col("n_grams"),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )


def build_vocab(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Tokenizer-training prep: corpus vocabulary ``(token, n_occurrences,
    n_docs, vocab_id)`` with ids dense-ranked by (count desc, token asc).

    One shuffle (token groupBy with map-side partial counts — the token
    stream never crosses the wire raw, only per-partition partials). The
    id-assignment window is a global sort over the VOCABULARY, not the
    corpus — vocab size grows ~log-ish with corpus size (Heaps' law), so
    the single-partition ranking stays driver-safe even when the corpus is
    100 TB; the corpus-sized stages are all partial-aggregated."""
    # n_docs needs a per-(doc,token) distinct: carry the doc id through the
    # explode so the distinct is an equi-agg, not a second corpus pass.
    tok = df.select(
        F.col(id_col).alias("_rid"),
        F.explode(F.filter(F.split(text_col, " "), lambda t: t != "")).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("_rid").alias("n_docs"),
    )
    kept = counts.filter(F.col("n_occurrences") >= min_count)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return kept.withColumn("vocab_id", F.row_number().over(w))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 5,
) -> DataFrame:
    """Per-document top-``top_n`` TF-IDF terms (the lexical twin of the
    embedding pipeline — a quality/relevance signal and a cheap sparse
    "embedding" for blocking).

    ``idf = ln((N+1)/(df+1)) + 1`` (smoothed); score = tf · idf. Shapes:
    tf is one corpus-sized groupBy with partial aggregation; df is a
    vocab-sized aggregate of tf (NOT a second corpus pass); N is a scalar
    broadcast into the projection; ranking is a per-doc window — all
    partitionable, nothing global."""
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.filter(F.split(text_col, " "), lambda t: t != "")).alias("token"),
    )
    tf = tok.groupBy("_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n")).first()["n"]
    scored = tf.join(dfreq, "token").select(
        F.col("_id").alias(id_col),
        "token",
        "tf",
        "df",
        (
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1)
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_n)
    )
