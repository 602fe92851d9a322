"""End-to-end facade test — a reference user's workflow, 1:1
(setup → bulk upload → incremental PMCID-style upload → re-upload
overwrite → query with highlight + HTML), against parquet storage."""

import os

import pytest

from pubmed_central_semantic_search_spark.api import SemanticSearchEngine
from pubmed_central_semantic_search_spark.schemas import ARTICLES_SCHEMA
from pubmed_central_semantic_search_spark.sources.pmc import (
    parse_articles,
    to_article_rows,
)

FIXTURE_XML = os.path.join(os.path.dirname(__file__), "fixtures", "pmc_article.xml")

ARTICLES = [
    ("PMC100", ["Intro"], [["deep learning models", "spark joins shuffle"]], "a1"),
    ("PMC200", ["Intro", "Methods"], [["protein folding"], ["wet lab assay", "gel"]], "a2"),
]


@pytest.fixture()
def engine(spark, tmp_path):
    eng = SemanticSearchEngine(spark, str(tmp_path / "db"))
    eng.reset_database()
    return eng


def test_full_reference_workflow(spark, engine, tmp_path):
    articles = spark.createDataFrame(ARTICLES, ARTICLES_SCHEMA)
    engine.upload_articles(articles)

    # storage mirrors the two collections (SURVEY §1.4)
    chunks = spark.read.parquet(engine.chunks_path)
    vecs = spark.read.parquet(engine.doc_vectors_path)
    assert chunks.count() == 5 and vecs.count() == 2
    assert "doc_pk" in vecs.columns  # H1 key

    # qdrant.py:233-247 signature parity; exact-text query wins its doc
    out = engine.query("spark joins shuffle", docs_per_query=1).collect()
    assert out[0]["article_id"] == "PMC100"
    assert out[0]["query_text"] == "spark joins shuffle"
    assert out[0]["chunk_score"] == pytest.approx(1.0, abs=1e-5)

    # highlight=False → doc hits only (Q4)
    docs_only = engine.query(["protein folding"], docs_per_query=2, highlight=False)
    assert docs_only.columns == ["query_id", "article_id", "doc_score", "query_text"]

    # HTML rendering (responses.py parity)
    html = engine.query_html("wet lab assay", docs_per_query=1).collect()[0]
    assert '<mark class="highlight-paragraph">' in html["marked_html"]
    assert "pmc.ncbi.nlm.nih.gov/articles/PMC200/" in html["article_link"]

    # re-upload with changed content overwrites, never duplicates
    # (qdrant.py:137-139 idempotent upsert semantics)
    v2 = spark.createDataFrame(
        [("PMC100", ["Intro"], [["deep learning models", "updated text"]], "a1")],
        ARTICLES_SCHEMA,
    )
    engine.upload_articles(v2)
    assert spark.read.parquet(engine.doc_vectors_path).count() == 2
    texts = {
        r["paragraph"]
        for r in spark.read.parquet(engine.chunks_path)
        .filter("article_id = 'PMC100'")
        .collect()
    }
    assert texts == {"deep learning models", "updated text"}


def test_pmcid_ingest_offline_path(spark, engine):
    """upload_from_pmcids minus the network: canned JATS XML through the
    same parse→ingest pipeline (SURVEY §3.3)."""
    with open(FIXTURE_XML) as f:
        xml = f.read()
    parsed = parse_articles(
        spark.createDataFrame(
            [("PMC1234567", xml), ("PMCBAD", "<broken")], "pmcid string, xml string"
        )
    )
    engine.upload_articles(to_article_rows(parsed))
    vecs = spark.read.parquet(engine.doc_vectors_path)
    assert [r["article_id"] for r in vecs.collect()] == ["PMC1234567"]
    hit = engine.query("Venous thrombosis", docs_per_query=1).collect()[0]
    assert hit["article_id"] == "PMC1234567"


def test_pdf_stub_parity(engine):
    with pytest.raises(NotImplementedError):
        engine.upload_from_pdf("/nonexistent.pdf")


def test_engine_reference_width_uses_blas_kernel_same_ranks(spark, tmp_path):
    """At the reference's real dim (768, qdrant.py:74) the engine resolves
    its query kernel to the Arrow/BLAS matmul at plan time; at narrow
    dims it stays on the bit-exact fold. Both engines rank the same
    articles for the same query — the kernel is a physical knob."""
    from pyspark.sql import functions as F

    arts = spark.createDataFrame(
        [(aid, names, secs) for aid, names, secs, _ in ARTICLES],
        "article_id string, section_names array<string>, "
        "sections array<array<string>>",
    )
    ranks = {}
    for dim in (16, 768):
        eng = SemanticSearchEngine(
            spark, str(tmp_path / f"db{dim}"), encoder="fake", dim=dim
        )
        assert eng._kernel() == ("blas" if dim == 768 else "hof")
        eng.upload_articles(arts)
        out = eng.query("spark joins", docs_per_query=2, highlight=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        if dim == 768:
            assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
        else:
            assert "ArrowEvalPython" not in plan
        ranks[dim] = [
            r["article_id"]
            for r in out.orderBy(F.desc("doc_score"), "article_id").collect()
        ]
    # different encoders spaces (dim differs) — but both must return the
    # full candidate set, ranked deterministically
    assert sorted(ranks[16]) == sorted(ranks[768]) == ["PMC100", "PMC200"]
