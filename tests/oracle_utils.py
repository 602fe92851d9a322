"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query in Spark AND its oracle SQL in DuckDB over the same
parquet tables, then compares row-count, column names, and values
(order-insensitive, float-tolerant). Keeping this in-repo means every
registry entry is validated in `pytest` long before the driver's per-round
check.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from pubmed_central_semantic_search_spark.registry import REGISTRY, TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # lists/arrays → tuples so they sort/compare
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Driver-hash emulation: the driver's value-hash is type-sensitive,
        # so an int column on one side vs float on the other (the DuckDB
        # sum(BIGINT) → HUGEINT → float64 trap) must FAIL here even though
        # the values compare equal — cast the oracle with
        # CAST(sum(...) AS BIGINT) instead.
        s_int = pd.api.types.is_integer_dtype(sv)
        o_int = pd.api.types.is_integer_dtype(ov)
        s_f = pd.api.types.is_float_dtype(sv)
        o_f = pd.api.types.is_float_dtype(ov)
        assert not (s_int and o_f) and not (s_f and o_int), (
            f"{name}: column {c} numeric-class mismatch "
            f"(spark {sv.dtype} vs oracle {ov.dtype}) — would hash-mismatch "
            "on the driver; add explicit casts on both sides"
        )
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.astype(float).to_numpy()
            oa = ov.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            ok = np.isclose(sa, oa, rtol=1e-6, atol=1e-9) | both_nan
            assert ok.all(), f"{name}: column {c} mismatch\n{s[~ok]}\nvs\n{o[~ok]}"
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            assert eq.all(), (
                f"{name}: column {c} mismatch\n{sv[~eq].head()}\nvs\n{ov[~eq].head()}"
            )


def run_and_compare(spark, sf_dir: str, name: str) -> None:
    qd = REGISTRY[name]
    spark_pdf = qd.spark(spark, sf_dir).toPandas()
    assert qd.oracle is not None, f"{name} has no oracle"
    con = duckdb_con(sf_dir)
    try:
        oracle_pdf = con.execute(qd.oracle).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)
