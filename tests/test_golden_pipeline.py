"""Golden pipeline test (SURVEY §5.3): the 3-article corpus through
ingest → chunk → encode(fake) → mean-pool → query → highlight → render,
compared field-for-field against a checked-in golden JSON.

The golden file locks the COMPLETE observable behavior of the flagship
path — any change to chunking order, encoder output, scoring, tie-breaks,
context windows, or HTML templating shows up as a diff here. Regenerate
deliberately with:

    PYTHONPATH=. python tests/test_golden_pipeline.py --regenerate
"""

import json
import os

from pubmed_central_semantic_search_spark.api import SemanticSearchEngine
from pubmed_central_semantic_search_spark.schemas import ARTICLES_SCHEMA

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_pipeline.json"
)

CORPUS = [
    (
        "PMC1",
        ["Intro", "Methods"],
        [["alpha beta", "gamma delta", "epsilon"], ["zeta eta"]],
        "first abstract. second sentence",
    ),
    ("PMC2", ["Results"], [["single paragraph only"]], "tiny abstract"),
    ("PMC3", ["Intro", "Tail"], [["one", "three"], ["only"]], "abs"),
]

QUERIES = ["gamma delta", "single paragraph only", "only"]


def _run_pipeline(spark, root: str) -> dict:
    eng = SemanticSearchEngine(spark, root)
    eng.reset_database()
    eng.upload_articles(spark.createDataFrame(CORPUS, ARTICLES_SCHEMA))

    def rows(df, keys):
        return sorted(
            [{k: r[k] for k in keys} for r in df.collect()],
            key=lambda d: tuple(str(d[k]) for k in keys),
        )

    hits = eng.query(QUERIES, docs_per_query=2, paragraphs_per_document=1)
    html = eng.query_html(QUERIES[0], docs_per_query=1)
    return {
        "chunks": rows(
            spark.read.parquet(eng.chunks_path),
            ["article_id", "section_id", "section_name", "paragraph_id", "paragraph"],
        ),
        "doc_vector_heads": [
            {
                "article_id": r["article_id"],
                "head": [round(float(x), 6) for x in r["embedding"][:4]],
            }
            for r in spark.read.parquet(eng.doc_vectors_path)
            .orderBy("article_id")
            .collect()
        ],
        "query_hits": [
            {
                "query_text": d["query_text"],
                "article_id": d["article_id"],
                "doc_score": round(float(d["doc_score"]), 6),
                "section_name": d["section_name"],
                "paragraph_id": d["paragraph_id"],
                "chunk_score": round(float(d["chunk_score"]), 6),
                "context": list(d["context_paragraphs"]),
            }
            for d in sorted(
                hits.collect(), key=lambda r: (r["query_id"], -r["doc_score"], r["article_id"])
            )
        ],
        "rendered": [
            {
                "article_id": r["article_id"],
                "marked_html": r["marked_html"],
                "most_relevant_html": r["most_relevant_html"],
                "article_link": r["article_link"],
            }
            for r in html.collect()
        ],
    }


def test_golden_pipeline(spark, tmp_path):
    got = _run_pipeline(spark, str(tmp_path / "golden_db"))
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert got == golden


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if "--regenerate" in sys.argv:
        import tempfile

        from pubmed_central_semantic_search_spark.session import get_spark

        spark = get_spark(app_name="golden-regen", master="local[4]", shuffle_partitions=4)
        with tempfile.TemporaryDirectory() as td:
            result = _run_pipeline(spark, td)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}")
