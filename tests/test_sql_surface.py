"""SQL entry point: the temp-view + SQL-UDF surface must produce the
same results (and the same plan shapes) as the DataFrame API."""

import pyspark.sql.functions as F

from pubmed_central_semantic_search_spark.registry import REGISTRY, QUERY_VEC
from pubmed_central_semantic_search_spark.sql import (
    register_sql_surface,
    SQL_FUNCTIONS,
)


def _sql_vec(vec):
    return "array(" + ", ".join(f"{v!r}D" for v in vec) + ")"


def test_sql_flagship_matches_dataframe_q1(spark, sf_dir):
    register_sql_surface(spark, sf_dir)
    sql_rows = spark.sql(
        f"""
        SELECT vec_id,
               round(cos_sim(embedding_d(embedding), {_sql_vec(QUERY_VEC)}), 6)
                 AS score
        FROM embeddings
        ORDER BY score DESC, vec_id
        LIMIT 5
        """
    ).collect()
    df_rows = (
        REGISTRY["q1_topk_cosine"]
        .spark(spark, sf_dir)
        .orderBy(F.desc("score"), "vec_id")
        .collect()
    )
    assert [(r["vec_id"], r["score"]) for r in sql_rows] == [
        (r["vec_id"], r["score"]) for r in df_rows
    ]


def test_sql_udfs_are_catalyst_not_python(spark, sf_dir):
    """SQL expression UDFs must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython stage may appear in the plan."""
    register_sql_surface(spark, sf_dir)
    df = spark.sql(
        "SELECT vec_id, cos_sim(embedding_d(embedding), embedding_d(embedding)) AS s "
        "FROM embeddings"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sql_scalar_helpers(spark, sf_dir):
    register_sql_surface(spark, sf_dir)
    row = spark.sql(
        """
        SELECT token_count('a  b c') AS tc,
               h32('x', 0) AS h,
               pmc_link('PMC123') AS link,
               round(vec_norm(array(3D, 4D)), 6) AS n
        """
    ).first()
    assert row["tc"] == 3
    assert row["h"] >= 0
    assert row["link"] == "https://pmc.ncbi.nlm.nih.gov/articles/PMC123/"
    assert row["n"] == 5.0


def test_register_is_idempotent(spark, sf_dir):
    register_sql_surface(spark, sf_dir)
    register_sql_surface(spark, sf_dir)  # CREATE OR REPLACE — no error
    assert len(SQL_FUNCTIONS) >= 8


def test_sql_ihist_twins_match_column_api(spark, sf_dir):
    """The SQL ihist_bucket/ihist_rep expression UDFs agree value-for-value
    with the Column API across every exponent regime, and carry the same
    guards."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators.sketch import (
        ihist_bucket,
        ihist_rep,
    )
    from pubmed_central_semantic_search_spark.sql import register_sql_functions

    register_sql_functions(spark)
    vals = list(range(0, 40)) + [
        (1 << e) + d for e in range(5, 62, 9) for d in (0, 1, (1 << e) - 1)
    ] + [None]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    df.createOrReplaceTempView("ihist_probe")
    got = {
        r["n"]: (r["b"], r["rep"])
        for r in spark.sql(
            "SELECT n, ihist_bucket(n) AS b, ihist_rep(ihist_bucket(n)) AS rep "
            "FROM ihist_probe"
        ).collect()
    }
    want = {
        r["n"]: (r["b"], r["rep"])
        for r in df.select(
            "n", ihist_bucket("n").alias("b"),
            ihist_rep(ihist_bucket("n")).alias("rep"),
        ).collect()
    }
    assert got == want
    import pytest as _pt

    with _pt.raises(Exception, match="negative"):
        spark.sql("SELECT ihist_bucket(-5)").collect()
