"""PDF source (SURVEY §2.1 S6) — one step past the reference's stub.

The reference declares PDF ingestion but does not implement it
(``/root/reference/src/backend/data_fetching/fetch_pdf.py:2-4``,
``data_fetcher.py:59-61``, ``README.md:110`` — ``NotImplementedError``).
Capability parity is preserved: WITHOUT the ``pypdf`` library this module
raises the same declared ``NotImplementedError``. WITH it (import-gated,
the sbert/PIL seam discipline — encoder.py:128, multimodal.py), the real
Spark pipeline runs:

``spark.read.format("binaryFile")`` over the PDF tree (the executors read
the bytes — the driver never funnels files) → ``mapInPandas`` text
extraction with per-row error isolation (a poison PDF lands in the
``error`` column instead of killing the 100 TB job — the parse_articles
rule, pmc.py). The plumbing — schema, binary column, Arrow batch shape —
is the same contract as ``operators/multimodal.extract_features``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PDF_SCHEMA = "path string, n_pages int, text string, error string"


def _pypdf_available() -> bool:
    try:
        import pypdf  # noqa: F401

        return True
    except ImportError:
        return False


def extract_pdf_text(binary_df: DataFrame) -> DataFrame:
    """(path, content: binary) → (path, n_pages, text, error): pypdf text
    extraction as an Arrow-batched mapInPandas stage, one reader per row,
    per-row error isolation. Self-contained closure (imports in body —
    the ship-by-value pickling rule)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from pypdf import PdfReader

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    reader = PdfReader(io.BytesIO(bytes(content)))
                    pages = [p.extract_text() or "" for p in reader.pages]
                    out.append((path, len(pages), "\n".join(pages), None))
                except Exception as ex:  # poison PDF → error column
                    out.append((path, None, None, repr(ex)[:500]))
            yield pd.DataFrame(
                out, columns=["path", "n_pages", "text", "error"]
            )

    return binary_df.select("path", "content").mapInPandas(_extract, PDF_SCHEMA)


def read_pdfs(spark: SparkSession, path: str) -> DataFrame:
    """S6 — PDF tree → extracted text frame (PDF_SCHEMA).

    Import-gated: without ``pypdf`` this raises the reference-parity
    ``NotImplementedError`` (fetch_pdf.py:2-4) — the gate is checked on
    the driver so the failure is immediate and named, not a mid-job
    executor ImportError."""
    if not _pypdf_available():
        raise NotImplementedError(
            "PDF ingestion requires the optional 'pypdf' library (absent "
            "here — the reference also leaves this unimplemented, "
            "fetch_pdf.py:2-4). With pypdf installed this reads the tree "
            "via binaryFile and extracts text executor-side."
        )
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return extract_pdf_text(binary)
