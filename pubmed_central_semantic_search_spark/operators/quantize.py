"""Embedding quantization (X2/X3 storage tier): symmetric per-vector int8.

At 100 TB the embedding column IS the dataset — float32×768 ≈ 3 KB/row.
Symmetric scalar quantization (scale = max|x|/127, q = round(x/scale))
cuts that 4× with ~0.5% cosine error, and the int8 arrays stay fully
Catalyst-native (tinyint arrays in parquet, dictionary-friendly).

Everything here is higher-order-function expressions — quantize at write
time, dequantize (or score directly on int8 with the scales factored out)
at read time. Deterministic: round-half-up on doubles, no RNG — so the
whole path is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double


def quantization_scale(vec: Column | str) -> Column:
    """Per-vector symmetric scale: max|x| / 127 (0-vectors → scale 1 to
    avoid div-by-zero; their quantized form is all zeros anyway).

    A NaN component fails loudly WITH A NAMED ERROR: 'NaN > 0' is false,
    so the unguarded fallback scale of 1.0 would send NaN (or any
    |x| > 127.5) into ``quantize``'s tinyint cast — an opaque ANSI
    CAST_OVERFLOW that aborts the write job without saying which row or
    why. One degenerate embedding should name itself, not kill the run
    obscurely."""
    v = as_double(vec)
    m = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return (
        F.when(
            F.isnan(m) | (m == F.lit(float("inf"))),
            F.raise_error(
                F.lit(
                    "quantization_scale: vector contains NaN/Inf — clean "
                    "or drop degenerate embeddings before quantizing"
                )
            ).cast("double"),
        )
        # subnormal maxima underflow m/127 to 0.0, and x/0.0 = Inf would
        # abort the write in the same opaque ANSI cast this guard exists
        # to prevent (review find) — treat them like the all-zero vector
        # (scale 1.0: every component rounds to 0, lossy but sane)
        .when(m / F.lit(127.0) > 0, m / F.lit(127.0))
        .otherwise(F.lit(1.0))
    )


def quantize(vec: Column | str, scale: Column) -> Column:
    """array<double> → array<tinyint> under the given scale."""
    return F.transform(
        as_double(vec), lambda x: F.round(x / scale).cast("tinyint")
    )


def dequantize(qvec: Column | str, scale: Column) -> Column:
    qvec = F.col(qvec) if isinstance(qvec, str) else qvec
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def with_quantized(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Write-path: add (``{prefix}_scale``, ``{prefix}_vec``) columns; drop
    the float column at the caller's discretion."""
    scale = quantization_scale(vec_col)
    return df.withColumn(f"{prefix}_scale", scale).withColumn(
        f"{prefix}_vec", quantize(vec_col, F.col(f"{prefix}_scale"))
    )
