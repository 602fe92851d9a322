"""Every oracle-backed registry query must hash-match DuckDB at sf0.001.

This is the same contract the driver enforces at sf0.01
(CORRECTNESS_r{N}.json); running it in pytest keeps feedback fast.
"""

import pytest

from pubmed_central_semantic_search_spark.registry import REGISTRY
from tests.oracle_utils import run_and_compare

ORACLE_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    run_and_compare(spark, sf_dir, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
