"""Text / scalar / hash column expressions (SURVEY §2.3 rows F1-F6, H1-H2).

Each function mirrors a concrete transformation in the reference (cited
per-function) but is a Catalyst expression — JVM-side, codegen-friendly,
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Chunk-level separators of the reference's ArticleChunker
# (/root/reference/src/backend/data_fetching/data_fetcher.py:7-30).
CHUNK_SEPARATORS = {
    "sentence": ". ",
    "paragraph": "\n",
    "section": "$" * 24,  # sentinel the reference uses to mark section breaks
}


def regex_escape_literal(sep: str) -> str:
    """Escape a LITERAL separator for ``F.split``'s regex argument — the
    one shared definition (``chunk_split`` and ``chunking.
    rechunk_sections`` both split on literal chunk separators; a missing
    metachar fixed in one copy but not the other would silently split on
    a live regex)."""
    return "".join("\\" + c if c in r"\.[]{}()*+?^$|" else c for c in sep)


def chunk_split(text: Column | str, level: str = "sentence") -> Column:
    """F1 — split text into chunks at sentence/paragraph/section level.

    The reference does a *literal* ``str.split`` (``data_fetcher.py:28-30``),
    not a regex split, so the separator is regex-escaped here.
    """
    escaped = regex_escape_literal(CHUNK_SEPARATORS[level])
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, escaped)


def chunk_join(parts: Column | str, level: str = "sentence") -> Column:
    """F2 — re-flatten chunk list with the level separator
    (``data_fetcher.py:39,45``)."""
    parts = F.col(parts) if isinstance(parts, str) else parts
    return F.array_join(parts, CHUNK_SEPARATORS[level])


def strip_sentence_markers(text: Column | str) -> Column:
    """F3 — remove the corpus's ``<S>`` / ``</S>`` sentence markers
    (``dataset/armac_scientific_papers.py:52``,
    ``scripts/setup_local_database.py:16``)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(text, "</?S>", "")


def strip_citations(text: Column | str) -> Column:
    """F4 — remove bracketed citations like ``[1, 2]``
    (``src/backend/data_fetching/fetch_pmcid.py:27``:
    ``re.subn("\\[[^\\]]*\\]", "", text)``)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(text, r"\[[^\]]*\]", "")


def clean_paragraph(text: Column | str) -> Column:
    """F5 composition used before rendering: trim (``responses.py:80``)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.trim(text)


def pmc_url(article_id: Column | str) -> Column:
    """F6 — PMC article link
    (``src/frontend/responses.py:45``)."""
    article_id = F.col(article_id) if isinstance(article_id, str) else article_id
    return F.format_string("https://pmc.ncbi.nlm.nih.gov/articles/%s/", article_id)


def pmcid_tag(raw_id: Column | str) -> Column:
    """F6 — ``f"PMC{id}"`` prefix (``fetch_pmcid.py:13``)."""
    raw_id = F.col(raw_id) if isinstance(raw_id, str) else raw_id
    return F.concat(F.lit("PMC"), raw_id)


def doc_key(article_id: Column | str) -> Column:
    """H1 — deterministic 64-bit document key.

    Reference: first 8 bytes of ``sha3_512(article_id)`` as int64
    (``qdrant.py:136-139``) — the point of which is a *stable content-derived
    primary key* making re-upload idempotent. We standardize on
    ``xxhash64`` (same guarantee, a JVM intrinsic; SURVEY §7 records the
    deliberate hash-value deviation)."""
    article_id = F.col(article_id) if isinstance(article_id, str) else article_id
    return F.xxhash64(article_id)


def content_key(text: Column | str) -> Column:
    """H1 variant for oracle-checked dedup: hex md5 of the content.

    md5 of UTF-8 bytes is bit-identical between Spark and DuckDB, so
    queries keyed on it hash-match the oracle."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(text)


def chunk_key(
    article_id: Column | str,
    section_id: Column | str,
    section_name: Column | str,
    paragraph_id: Column | str,
) -> Column:
    """H2 — unique per-chunk id. The reference uses ``uuid4()``
    (``qdrant.py:140-141``); we prefer a deterministic position-derived key
    (reproducible tests, idempotent re-ingest).

    ``section_id`` (the section POSITION) is part of the key: real JATS
    articles repeat section names ('Methods' twice) and paragraph_id
    restarts per section, so a name-only key collides and the chunk-keyed
    upsert would silently drop the second section's paragraphs — the same
    hazard ``chunking.explode_chunks`` documents at its inline hash."""
    cols = [
        F.col(c) if isinstance(c, str) else c
        for c in (article_id, section_id, section_name, paragraph_id)
    ]
    return F.xxhash64(*cols)


def normalize_ws(text: Column | str) -> Column:
    """Collapse all whitespace runs (spaces, tabs, newlines) to single
    spaces and trim — the pre-tokenization step for WILD text.

    The engine's tokenization convention (``operators/curation._tokens``,
    shared by every operator and replicated verbatim in the DuckDB
    oracles) splits on the single literal space: exact and cheap for
    normalized text, but on raw multi-line input tokens would straddle
    newlines and the single-space length arithmetic
    (``textstats.mean_token_len``) would count padding as token
    characters. Run this once at ingest — after it, every downstream
    token/gram/quality metric is exact. Pure narrow expression."""
    t = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(t, r"\s+", " "))
