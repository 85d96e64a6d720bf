"""Streaming windowed aggregation with late-data handling.

Watermark + tumbling/sliding event-time windows over a metric column
— the Structured Streaming building block for continuous verdict
dashboards (violations/sec per source, drift counters). Late rows
beyond the watermark are dropped by Spark's state store, bounding
state size on unbounded streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    sdf: DataFrame,
    ts_col: str,
    group_col: str | None = None,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed counts with a watermark. Works on both
    streaming and batch DataFrames (batch ignores the watermark —
    useful for backfill parity testing)."""
    # watermarking requires TIMESTAMP (not TIMESTAMP_NTZ)
    out = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if sdf.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window, slide) if slide else \
        F.window(F.col(ts_col), window)
    keys = [w.alias("win")] + ([F.col(group_col)] if group_col else [])
    return (
        out.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *([group_col] if group_col else []),
            "n",
        )
    )
