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
      trimmed and ``<mark>``-wrapped (responses.py:80-87), newline-joined in
      paragraph order.
    - ``most_relevant_html``: same window, raw paragraphs, newline-joined
      (responses.py:96-104).
    - ``article_link``: the PMC anchor.

    Same one-pass range-join shape as ``search.expand_context`` — boundary
    clamp falls out of the join (no neighbor row, no mark).
    """
    hits = chunk_hits.select(
        "query_id",
        F.col(ARTICLE_ID).alias("h_article_id"),
        "doc_score",
        F.col("section_id").alias("h_section_id"),
        F.col("section_name").alias("h_section_name"),
        F.col("paragraph_id").alias("h_paragraph_id"),
        "chunk_score",
    )
    # Join on the section POSITION, not its name — same-named sections
    # restart paragraph_id (see search.expand_context).
    neighbors = chunks.select(
        ARTICLE_ID, "section_id", "section_name", "paragraph_id", "paragraph"
    )
    joined = neighbors.join(
        F.broadcast(hits),
        (F.col(ARTICLE_ID) == F.col("h_article_id"))
        & (F.col("section_id") == F.col("h_section_id"))
        & (F.col("paragraph_id") >= F.col("h_paragraph_id") - window)
        & (F.col("paragraph_id") <= F.col("h_paragraph_id") + window),
    )
    ctx = F.sort_array(F.collect_list(F.struct("paragraph_id", "paragraph")))
    return (
        joined.groupBy(
            "query_id",
            "h_article_id",
            "doc_score",
            "h_section_id",
            "h_section_name",
            "h_paragraph_id",
            "chunk_score",
        )
        .agg(ctx.alias("_ctx"))
        .select(
            "query_id",
            F.col("h_article_id").alias(ARTICLE_ID),
            "doc_score",
            F.col("h_section_name").alias("section_name"),
            F.col("h_paragraph_id").alias("paragraph_id"),
            "chunk_score",
            F.array_join(
                F.transform(
                    F.col("_ctx"), lambda s: mark_html(F.trim(s["paragraph"]))
                ),
                "\n",
            ).alias("marked_html"),
            F.array_join(
                F.transform(F.col("_ctx"), lambda s: s["paragraph"]), "\n"
            ).alias("most_relevant_html"),
            article_link_html(F.col("h_article_id")).alias("article_link"),
        )
    )
