"""Count–min sketch: overestimate-only guarantee, exactness for isolated
keys, mergeability (sketch-of-union ≡ merged sketches), and a DuckDB
recomputation of the full sketch (content-addressed hashes ⇒ the two
engines build bit-identical tables)."""

import duckdb
import pyspark.sql.functions as F

from pubmed_central_semantic_search_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)

DEPTH, WIDTH = 4, 64


def _tokens_df(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "token string")


def test_cms_never_underestimates_and_is_exact_when_sparse(spark):
    # planted frequencies far apart; few distinct keys vs width -> exact
    data = ["hot"] * 50 + ["warm"] * 7 + ["cold"] * 1 + ["x", "y", "z"]
    sketch = cms_build(_tokens_df(spark, data), "token", DEPTH, WIDTH)
    assert sketch.count() <= DEPTH * WIDTH
    est = cms_estimate(sketch, ["hot", "warm", "cold", "absent"], DEPTH, WIDTH)
    true = {"hot": 50, "warm": 7, "cold": 1, "absent": 0}
    for k, t in true.items():
        assert est[k] >= t  # the one-sided CMS guarantee
        assert est[k] <= t + 2 * len(data) // WIDTH + 3  # loose eps bound
    # with 6 distinct keys in 64 buckets x 4 rows, min over rows is exact
    assert est["hot"] == 50 and est["warm"] == 7


def test_cms_merge_equals_sketch_of_union(spark):
    a = ["p"] * 5 + ["q"] * 2
    b = ["p"] * 3 + ["r"] * 4
    sk_a = cms_build(_tokens_df(spark, a), "token", DEPTH, WIDTH)
    sk_b = cms_build(_tokens_df(spark, b), "token", DEPTH, WIDTH)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(sk_a, sk_b).collect()
    }
    union = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(_tokens_df(spark, a + b), "token", DEPTH, WIDTH).collect()
    }
    assert merged == union
    est = cms_estimate(cms_merge(sk_a, sk_b), ["p", "q", "r"], DEPTH, WIDTH)
    assert est["p"] == 8 and est["q"] == 2 and est["r"] == 4


def test_cms_matches_duckdb_recomputation(spark, sf_dir):
    """Bit-identical cross-engine sketch over the real documents table
    (token stream of the corpus)."""
    docs_path = f"{sf_dir}/documents.parquet"
    toks = (
        spark.read.parquet(docs_path)
        .select(F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token"))
    )
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(toks, "token", DEPTH, WIDTH).collect()
    }
    rows_sql = ", ".join(f"({i})" for i in range(DEPTH))
    sql = f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token
      FROM read_parquet('{docs_path}')
    ), rows(r) AS (VALUES {rows_sql})
    SELECT r AS row,
           CAST(CAST(('0x' || substr(md5(token || '#cms' || CAST(r AS VARCHAR)), 1, 8))
                     AS BIGINT) % {WIDTH} AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks, rows
    WHERE token <> ''
    GROUP BY 1, 2
    """
    want = {(r[0], r[1]): r[2] for r in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) > 0


def test_cms_plan_is_one_partial_aggregate(spark, sf_dir):
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    sketch = cms_build(toks, "token", DEPTH, WIDTH)
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan  # one shuffle
    assert "partial_count" in plan, plan  # map-side combine before it
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_estimate_bucket_matches_catalyst_cms_bucket(spark):
    """The driver-side bucket function (md5_prefix_long_py) and the
    Catalyst cms_bucket expression must agree key-for-key across rows —
    any drift in the salt/prefix convention would silently zero every
    estimate."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators.curation import (
        md5_prefix_long_py,
    )
    from pubmed_central_semantic_search_spark.operators.sketch import cms_bucket

    keys = ["alpha", "beta", "γ-unicode", "", "12345", "a b c"]
    width, depth = 64, 4
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    cols = [cms_bucket("k", i, width).alias(f"b{i}") for i in range(depth)]
    got = {r["k"]: [r[f"b{i}"] for i in range(depth)]
           for r in df.select("k", *cols).collect()}
    for k in keys:
        want = [md5_prefix_long_py(k, f"#cms{i}") % width for i in range(depth)]
        assert got[k] == want, k
