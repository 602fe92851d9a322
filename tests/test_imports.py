"""Every queries/ submodule must be importable DIRECTLY (not only via the
registry): a user doing `from ...queries.similarity import q1_topk_cosine`
re-enters registry.py before that submodule's @register calls have run, so
nothing in the import path may eagerly index REGISTRY or pull names out of
a partially-initialized sibling (the two defects this pins: the eager
flagship re-export, and extensions importing the fake-encode SQL helper
from pipeline instead of oracle_helpers)."""

import subprocess
import sys

import pytest

MODULES = [
    "pipeline",
    "relational",
    "similarity",
    "text_pipeline",
    "clustering_pack",
    "coverage",
    "curation",
    "dedup_pack",
    "extensions",
    "write_path",
    "dim768",
    "oracle_helpers",
]


@pytest.mark.parametrize("mod", MODULES)
def test_direct_import_in_fresh_interpreter(mod):
    code = (
        f"import pubmed_central_semantic_search_spark.queries.{mod}\n"
        "from pubmed_central_semantic_search_spark.registry import REGISTRY\n"
        "assert len(REGISTRY) == 50, len(REGISTRY)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert proc.returncode == 0, f"{mod}: {proc.stderr[-800:]}"
