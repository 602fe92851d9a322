"""Unit tests for the article pipeline on reference-shaped fixtures
(FIXTURES.md A1): chunk explode/assemble round-trip, abstract prepend,
encoder determinism, ±1 context clamp at section bounds (the reference's
boundary guard, responses.py:85,101).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.encoder import (
    encode_column,
    fake_encode_one,
)
from pubmed_central_semantic_search_spark.operators.chunking import (
    assemble_articles,
    explode_chunks,
    prepend_abstract,
)
from pubmed_central_semantic_search_spark.operators.pooling import mean_pool
from pubmed_central_semantic_search_spark.operators.search import semantic_search
from pubmed_central_semantic_search_spark.schemas import ARTICLES_SCHEMA

ARTICLES = [
    # (article_id, section_names, sections, abstract_text)
    (
        "PMC1",
        ["Intro", "Methods"],
        [["alpha beta", "gamma delta", "epsilon"], ["zeta eta"]],
        "first abstract. second sentence",
    ),
    (
        "PMC2",
        ["Results"],
        [["single paragraph only"]],  # 1-paragraph section: clamp case
        "tiny abstract",
    ),
    (
        "PMC3",
        ["Intro", "Empty", "Tail"],
        [["one", "", "three"], [""], ["only"]],  # empty chunks dropped
        "abs",
    ),
]


@pytest.fixture(scope="module")
def articles(spark):
    return spark.createDataFrame(ARTICLES, ARTICLES_SCHEMA)


def test_explode_positions_and_empty_drop(articles):
    chunks = explode_chunks(articles)
    rows = {
        (r.article_id, r.section_id, r.section_name, r.paragraph_id): r.paragraph
        for r in chunks.collect()
    }
    assert rows[("PMC1", 0, "Intro", 1)] == "gamma delta"
    assert rows[("PMC1", 1, "Methods", 0)] == "zeta eta"
    # empty chunks dropped BEFORE enumerate (the reference cleans with
    # "if j" and then enumerates the clean list — armac:52 + qdrant:128):
    # 'three' sits at paragraph_id 1, NOT at a gapped 2, so the ±window
    # context join sees it as 'one's neighbor exactly like the reference
    assert rows[("PMC3", 0, "Intro", 0)] == "one"
    assert rows[("PMC3", 0, "Intro", 1)] == "three"
    assert ("PMC3", 0, "Intro", 2) not in rows
    # a section of only empties emits nothing
    assert not any(k[0] == "PMC3" and k[1] == 1 for k in rows)
    # chunk_id deterministic + unique
    ids = [r.chunk_id for r in chunks.collect()]
    assert len(ids) == len(set(ids))


def test_explode_assemble_round_trip(articles):
    """N2 ∘ collect = identity (SURVEY §5.4), modulo dropped empties."""
    chunks = explode_chunks(articles.filter(F.col("article_id") != "PMC3"))
    back = assemble_articles(chunks)
    orig = {
        r.article_id: (r.section_names, r.sections)
        for r in articles.filter(F.col("article_id") != "PMC3").collect()
    }
    got = {r.article_id: (r.section_names, r.sections) for r in back.collect()}
    assert got == orig


def test_prepend_abstract(articles):
    out = prepend_abstract(articles).filter(F.col("article_id") == "PMC1").first()
    assert out.section_names == ["Abstract", "Intro", "Methods"]
    # sentence-level chunking of the abstract ('. ' literal split)
    assert out.sections[0] == ["first abstract", "second sentence"]
    assert out.sections[1] == ["alpha beta", "gamma delta", "epsilon"]


def test_fake_encoder_deterministic(spark):
    a = fake_encode_one("hello world")
    b = fake_encode_one("hello world")
    c = fake_encode_one("hello worlds")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5

    df = spark.createDataFrame([("hello world",), ("hello worlds",)], "t string")
    vecs = {r.t: r.v for r in df.select("t", encode_column("t").alias("v")).collect()}
    np.testing.assert_allclose(vecs["hello world"], a, rtol=1e-6)
    np.testing.assert_allclose(vecs["hello worlds"], c, rtol=1e-6)


def test_context_window_clamped_at_bounds(spark, articles):
    """A hit on a 1-paragraph section must return exactly that paragraph —
    the reference clamps the ±1 window to section bounds
    (responses.py:85,101)."""
    chunks = explode_chunks(articles).withColumn(
        "embedding", encode_column("paragraph")
    )
    doc_vectors = mean_pool(chunks, group=["article_id"], vec_col="embedding")
    # Query vector = exactly the single paragraph of PMC2 → top doc is PMC2,
    # top chunk is its only paragraph.
    qvec = [float(x) for x in fake_encode_one("single paragraph only")]
    queries = spark.createDataFrame([(0, qvec)], "query_id int, qvec array<double>")
    out = semantic_search(doc_vectors, chunks, queries, k_docs=1, n_paragraphs=1)
    row = out.first()
    assert row.article_id == "PMC2"
    assert row.context_paragraphs == ["single paragraph only"]
    assert row.chunk_score == pytest.approx(1.0, abs=1e-5)


def test_context_window_interior(spark, articles):
    """A hit in the middle of a 3-paragraph section returns all three
    neighbors in order."""
    chunks = explode_chunks(articles).withColumn(
        "embedding", encode_column("paragraph")
    )
    doc_vectors = mean_pool(chunks, group=["article_id"], vec_col="embedding")
    qvec = [float(x) for x in fake_encode_one("gamma delta")]
    queries = spark.createDataFrame([(0, qvec)], "query_id int, qvec array<double>")
    out = semantic_search(doc_vectors, chunks, queries, k_docs=3, n_paragraphs=1)
    hit = {r.article_id: r for r in out.collect()}["PMC1"]
    assert hit.section_name == "Intro"
    assert hit.paragraph_id == 1
    assert hit.context_paragraphs == ["alpha beta", "gamma delta", "epsilon"]


def test_highlight_toggle_skips_chunk_path(spark, articles):
    """Q4 — highlight=False returns doc hits only and builds NO chunk-side
    join (qdrant.py:201,209: the reference skips the chunk queries
    entirely)."""
    chunks = explode_chunks(articles).withColumn(
        "embedding", encode_column("paragraph")
    )
    doc_vectors = mean_pool(chunks, group=["article_id"], vec_col="embedding")
    qvec = [float(x) for x in fake_encode_one("single paragraph only")]
    queries = spark.createDataFrame([(0, qvec)], "query_id int, qvec array<double>")
    out = semantic_search(doc_vectors, chunks, queries, k_docs=2, highlight=False)
    assert out.columns == ["query_id", "article_id", "doc_score"]
    assert out.count() == 2
    # the plan contains no highlight machinery (chunk scoring / context
    # collection) — doc_vectors still derives from chunks, so "paragraph"
    # itself legitimately appears upstream of the mean-pool
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "chunk_score" not in plan and "context_paragraphs" not in plan
