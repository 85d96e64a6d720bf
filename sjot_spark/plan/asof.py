"""As-of (backward) join — the time-series operator Spark lacks as a
built-in: each left row matches the most recent right row with
``right.ts <= left.ts`` per key (last observation carried forward).

Spark-first formulation: NOT a range self-join (quadratic blowup per
key) but the union-sort trick — tag both sides, union, and take
``last(right_value, ignorenulls=True)`` over a per-key window ordered
by (ts, side) with rows from the start of the key: one hash shuffle of
|L|+|R| rows on the key, one sort per partition, zero join. At 100 TB
this is the plan you want: no broadcast needed, no skew amplification
(a hot key sorts once; a range join would re-scan its right side per
left row), and AQE handles residual key skew.

Ties: a right row at exactly left.ts matches (``<=``, the DuckDB/kdb
ASOF convention) — the side tag orders right rows first within a
timestamp. Right rows should be unique per (key, ts); pre-aggregate
if not (the caller picks the deterministic reducer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    left_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row: left_cols + the latest right ``value_cols``
    with right.ts <= left.ts on the same ``on`` key (null when no prior
    right row exists)."""
    left_cols = left_cols or [c for c in left.columns]
    lhs = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols if c not in (on, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
    )
    rhs = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, ts)],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
          for c in value_cols],
    )
    return carried.where(F.col("_side") == 1).select(
        *[c for c in left_cols],
        *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
    )
