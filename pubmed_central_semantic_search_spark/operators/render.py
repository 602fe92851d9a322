"""Result rendering — the reference's presentation layer (SURVEY §2.3 F6)
re-expressed as Catalyst string expressions over the search results.

Reference semantics (``/root/reference/src/frontend/responses.py``):

- ``mark_html`` wraps a paragraph in ``<mark class="highlight-paragraph">``
  — and the ±1 context loop marks the hit AND each in-section neighbor
  (``responses.py:81-87``), paragraphs stripped first (``:80``).
- ``html_most_relevant_paragraph``: the best hit's ±1 window joined by
  newlines, unmarked (``responses.py:96-104``).
- ``article_link``: external PMC anchor (``responses.py:106-110``).

Everything is ``concat``/``format_string``/``transform`` — the engine
exposes these as columns; a UI layer (the reference uses Gradio) just
displays them. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import pmc_url
from ..schemas import ARTICLE_ID

MARK_OPEN = '<mark class="highlight-paragraph">'

# Python str.strip()'s whitespace set (responses.py:80 strips Unicode
# whitespace — NBSP, thin space, line/paragraph separators — while Java's
# bare \s is ASCII-only, so a Unicode-padded paragraph diverged from the
# reference). \x{...} escapes and \s parse in BOTH Java regex (Spark) and
# RE2 (the DuckDB oracle); \x{000B} is explicit because RE2's \s lacks
# vertical tab while Java's includes it.
UNICODE_WS = (
    r"[\s\x{000B}\x{001C}-\x{001F}\x{0085}\x{00A0}\x{1680}"
    r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]"
)
STRIP_RE = f"^{UNICODE_WS}+|{UNICODE_WS}+$"


def mark_html(paragraph: Column | str) -> Column:
    """responses.py:77-79 — highlight wrapper."""
    p = F.col(paragraph) if isinstance(paragraph, str) else paragraph
    return F.concat(F.lit(MARK_OPEN), p, F.lit("</mark>"))


def article_link_html(article_id: Column | str) -> Column:
    """responses.py:106-110 — external-site anchor."""
    aid = F.col(article_id) if isinstance(article_id, str) else article_id
    return F.format_string(
        '<a target="_blank" rel="noopener noreferrer" href="%s">'
        "View full article on external site: %s</a>",
        pmc_url(aid),
        aid,
    )


def render_hits(
    chunk_hits: DataFrame, chunks: DataFrame, window: int = 1
) -> DataFrame:
    """Per chunk hit, the reference's rendered fragments:

    - ``marked_html``: the ±window in-section neighborhood, each paragraph
      stripped and ``<mark>``-wrapped (responses.py:80-87), newline-joined
      in paragraph order.
    - ``most_relevant_html``: same window, raw paragraphs, newline-joined
      (responses.py:96-104).
    - ``article_link``: the PMC anchor.

    The window itself IS ``search.expand_context`` (review find: the
    ~35-line range-join/collect contract used to be a verbatim copy here,
    and the section-position-not-name fix had to be made twice) — this
    function is now three column expressions over its output.

    Stripping matches the reference's ``str.strip()`` — ALL whitespace
    including Unicode (``UNICODE_WS``), not ``trim``'s ASCII spaces
    (responses.py:80: a paragraph with a leading tab, NBSP, or trailing
    newline must not carry it into the markup); the q39 oracle strips
    with the same regex class verbatim.
    """
    from .search import expand_context

    ctx = expand_context(chunk_hits, chunks, window)
    stripped = lambda c: F.regexp_replace(c, STRIP_RE, "")  # noqa: E731
    return ctx.select(
        "query_id",
        ARTICLE_ID,
        "doc_score",
        "section_name",
        "paragraph_id",
        "chunk_score",
        F.array_join(
            F.transform(
                F.col("context_paragraphs"), lambda p: mark_html(stripped(p))
            ),
            "\n",
        ).alias("marked_html"),
        F.array_join(F.col("context_paragraphs"), "\n").alias(
            "most_relevant_html"
        ),
        article_link_html(F.col(ARTICLE_ID)).alias("article_link"),
    )
