"""Embedding quantization — symmetric per-vector int8, as pure Column
expressions.

At 10^12-sequence scale the embedding sidecar dominates storage
(d=768 float32 = 3 KB/row); symmetric int8 quantization cuts it 4x
and keeps cosine ranking useful for the ANN recall paths
(datapipe/similarity.py, datapipe/ivf.py). The reference has no
numeric-compression analog — this is part of the training-data
pipeline surface layered on the validation engine (SURVEY §6), like
dedup/ANN; its typed-violation cousin is the range check P5
(/root/reference/index.js:279-313): a quantized cell is by
construction a value in a declared integer range, validatable by the
same compiled checks.

Spark-first shape: everything is `transform`/`array_max` over the
array column — one projection, zero shuffle, pipelines with the scan.
The quantization rule is FLOOR(x*127/max_abs + 0.5) (symmetric,
scale = max|x|/127): floor(y + 0.5) is chosen over round() because
both engines implement it identically (SQL round() differs between
HALF_UP and banker's at .5 boundaries), which makes the whole
operator exactly DuckDB-oracle-checkable in integer space
(queries.embed_quantize_stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x)))


def quantize_int8(
    df: DataFrame, vec_col: str, out_col: str = "q", scale_col: str = "scale",
) -> DataFrame:
    """Adds ``out_col`` (array<int>, values in [-127, 127]) and
    ``scale_col`` (double: max|x|/127; dequantize = q * scale). The
    all-zero vector quantizes to zeros with scale 0; the EMPTY vector
    quantizes to an empty array with scale 0 (array_max of an empty
    array is NULL, so max|x| is pinned to 0 for size-0 inputs — scale
    would otherwise come back NULL). A NULL vector stays NULL q/scale.
    Inputs are cast to double first so the arithmetic (and the oracle
    twin) is exact float64 in both engines.

    max|x| is STAGED as its own column before the quantize transform:
    the per-element lambda reads it twice, and a non-attribute
    expression inside a higher-order-function lambda re-evaluates on
    every reference — inlined, the array_max scan runs per element
    (O(dim²)/row; see datapipe/repetition.py for the measured trap).
    The staged column is referenced ≥2 times so CollapseProject
    cannot re-inline it."""
    v = F.col(vec_col).cast("array<double>")
    mx = F.when(F.size(v) == 0, F.lit(0.0)).otherwise(_max_abs(v))
    # pick a staging name that cannot collide with caller data — a
    # hard-coded "_mx" would silently overwrite (then drop) an
    # existing caller column of that name
    mx_name = "_mx"
    while mx_name in df.columns:
        mx_name += "_"
    staged = df.withColumn(mx_name, mx)
    mxa = F.col(mx_name)

    def q(x: Column) -> Column:
        return F.when(mxa == 0.0, F.lit(0)).otherwise(
            F.floor(x * 127.0 / mxa + 0.5)).cast("int")

    return (
        staged.withColumn(out_col, F.transform(v, q))
        .withColumn(scale_col, mxa / 127.0)
        .drop(mx_name)
    )


def dequantize(
    df: DataFrame, q_col: str, scale_col: str, out_col: str,
) -> DataFrame:
    """Reconstruct array<double> ~ original (max error scale/2 per
    coordinate)."""
    s = F.col(scale_col)
    return df.withColumn(
        out_col, F.transform(F.col(q_col), lambda x: x * s))
