"""Shared DuckDB-oracle SQL builders with NO package-internal imports —
safe to import from any queries/ module at registration time (a helper
that lives in a query module re-enters the registry import cycle when a
user imports that module directly)."""

from __future__ import annotations


def sql_fake_encode(src: str, text_col: str, dim: int) -> str:
    """CTE chain recomputing encoder.fake_encode_matrix in DuckDB, bit
    for bit (see encoder.py docstring for why every op lines up): emits
    CTEs ``{src}_u``/``{src}_enc``; ``{src}_enc`` = ``{src}`` + ``emb``
    (DOUBLE[] of the float32-rounded components)."""
    return f"""
    {src}_u AS (
      SELECT *,
             list_transform(range(0, {dim}), k ->
               CAST((CASE WHEN k % 2 = 0
                     THEN CAST(md5_number_upper({text_col} || chr(31) || CAST(k // 2 AS VARCHAR)) AS DOUBLE)
                     ELSE CAST(md5_number_lower({text_col} || chr(31) || CAST(k // 2 AS VARCHAR)) AS DOUBLE) END)
                    / 9223372036854775808.0 - 1.0 AS DOUBLE)) AS _u
      FROM {src}
    ),
    {src}_enc AS (
      SELECT * EXCLUDE (_u, _n),
             list_transform(_u, x -> CAST(CAST(x / (CASE WHEN _n = 0 THEN 1.0 ELSE _n END) AS FLOAT) AS DOUBLE)) AS emb
      FROM (
        SELECT *,
               sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(_u, x -> x * x)), (a, b) -> a + b)) AS _n
        FROM {src}_u
      )
    )"""
