"""PDF source stub (SURVEY §2.1 S6).

The reference declares PDF ingestion but does not implement it
(``/root/reference/src/backend/data_fetching/fetch_pdf.py:2-4``,
``data_fetcher.py:59-61``, ``README.md:110`` — ``NotImplementedError``).
We keep capability parity: a declared, typed stub. The Spark-side design
when implemented: ``spark.read.format("binaryFile")`` over the PDF tree →
text-extraction via ``mapInPandas`` (see ``operators/multimodal.py`` for
the binary-column plumbing pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_pdfs(spark: SparkSession, path: str) -> DataFrame:
    """Matches the reference's unimplemented surface (fetch_pdf.py:2-4)."""
    raise NotImplementedError(
        "PDF ingestion is declared but unimplemented, matching the "
        "reference (fetch_pdf.py:2-4). Planned: binaryFile source + "
        "mapInPandas text extraction."
    )
