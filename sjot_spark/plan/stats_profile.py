"""Column statistics profiler — the "column stats" component of the
north_rule check set (column stats, uniqueness, referential, drift).

ONE aggregation pass over the table computes, per column:
- n_nulls, approx_distinct (HLL++ sketch)
- numeric: min / max / sum (exact)
- string: min / max / total length
- array: min / max / total size

Runs as a single partial+final hash aggregate — the cheap standing
profile a 10^12-row pipeline recomputes per partition and stores next
to the checkpoint manifest. ``column_stats`` returns a tidy long-form
DataFrame (column, stat, value) so profiles diff trivially across
snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUM = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType)


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-form per-column statistics: (column, stat, value:double).
    One aggregation job regardless of column count."""
    cols = df.columns if columns is None else columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    emit: list[tuple[str, str, str]] = []  # (column, stat, agg alias)

    def add(col: str, stat: str, expr) -> None:
        alias = f"{col}__{stat}"
        aggs.append(expr.alias(alias))
        emit.append((col, stat, alias))

    for name in cols:
        dt = fields[name]
        c = F.col(name)
        add(name, "n_nulls", F.sum(c.isNull().cast("long")).cast("double"))
        add(name, "approx_distinct",
            F.approx_count_distinct(c).cast("double"))
        if isinstance(dt, _NUM):
            add(name, "min", F.min(c).cast("double"))
            add(name, "max", F.max(c).cast("double"))
            add(name, "sum", F.sum(c).cast("double"))
        elif isinstance(dt, T.StringType):
            add(name, "min_len", F.min(F.length(c)).cast("double"))
            add(name, "max_len", F.max(F.length(c)).cast("double"))
            add(name, "sum_len", F.sum(F.length(c)).cast("double"))
        elif isinstance(dt, T.ArrayType):
            add(name, "min_size", F.min(F.size(c)).cast("double"))
            add(name, "max_size", F.max(F.size(c)).cast("double"))
            add(name, "sum_size", F.sum(F.size(c)).cast("double"))
    row = df.agg(*aggs).first().asDict()
    spark = df.sparkSession
    out = [("_table", "n_rows", float(row["__rows"]))]
    out += [
        (col, stat, None if row[alias] is None else float(row[alias]))
        for col, stat, alias in emit
    ]
    return spark.createDataFrame(out, "column string, stat string, value double")


def exact_column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Exact-distinct variant (count(distinct) instead of HLL) — the
    oracle-checkable twin; use `column_stats` at scale."""
    cols = df.columns if columns is None else columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    emit = []

    def add(col, stat, expr):
        alias = f"{col}__{stat}"
        aggs.append(expr.alias(alias))
        emit.append((col, stat, alias))

    for name in cols:
        dt = fields[name]
        c = F.col(name)
        add(name, "n_nulls", F.sum(c.isNull().cast("long")).cast("long"))
        if not isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            add(name, "n_distinct", F.countDistinct(c).cast("long"))
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            # integer columns only: exact long min/max (float min/max
            # would truncate — the approx profile covers those)
            add(name, "min", F.min(c).cast("long"))
            add(name, "max", F.max(c).cast("long"))
    row = df.agg(*aggs).first().asDict()
    out = [("_table", "n_rows", int(row["__rows"]))]
    out += [
        (col, stat, None if row[a] is None else int(row[a]))
        for col, stat, a in emit
    ]
    return df.sparkSession.createDataFrame(
        out, "column string, stat string, value long")
