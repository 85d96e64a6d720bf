"""Structured Streaming integration.

The compiled row-level checks are ordinary Column expressions, so the
same compiled spec validates a stream with zero changes: a streaming
projection (flags + violations) is fully incremental and shuffle-free.

Two modes:

- ``violations_stream``: continuous typed violation rows (append-mode
  sink-able) — row-level checks only, the streaming analog of SJOT's
  per-instance validate.
- ``run_foreach_batch``: per-micro-batch FULL validation (row checks +
  broadcast ref integrity + WITHIN-BATCH uniqueness) via foreachBatch;
  violations append to a parquet sink. Cross-batch uniqueness at
  stream scale needs either watermarked dropDuplicates upstream or a
  periodic batch reconciliation over the sink — both are compositions
  of the batch engine, not new operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sjot_spark.engine import ValidationEngine


def violations_stream(engine: ValidationEngine, sdf: DataFrame) -> DataFrame:
    """Row-level violations as a streaming DataFrame (append mode)."""
    comp = engine.compile(sdf)
    key = comp.key or comp.columns[0]
    part_col = F.col(comp.partition_by) if comp.partition_by else F.lit("_all")
    return engine._row_violations(sdf, comp, key, part_col)


def run_foreach_batch(
    engine: ValidationEngine,
    sdf: DataFrame,
    out_dir: str,
    dims: dict[str, DataFrame] | None = None,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Validate each micro-batch with the full batch engine and append
    violations to ``out_dir``/violations. Returns the StreamingQuery."""
    dims = dims or {}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # persist_violations=False: a persisted DF per micro-batch would
        # accumulate in the cache manager for the life of the stream
        res = engine.run(batch_df, dims=dims, persist_violations=False)
        (res.violations
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(f"{out_dir}/violations"))

    writer = sdf.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(
    sdf: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Cross-batch streaming deduplication: keep the first arrival of
    each key within the watermark horizon
    (``dropDuplicatesWithinWatermark``). This is the upstream half of
    stream-scale key uniqueness (A5 at stream time): state is bounded
    by the watermark — keys older than the horizon are evicted, so
    state size is O(distinct keys per horizon), not O(stream) — and
    the periodic batch reconciliation over the sink (the batch
    engine's ``_unique_violations``) catches anything beyond it. The
    returned stream is append-mode sink-able."""
    return (
        sdf.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def run_drift_monitor(
    engine: ValidationEngine,
    sdf: DataFrame,
    baselines: dict[str, DataFrame],
    out_dir: str,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Continuous drift monitoring: every micro-batch's histograms are
    tested against the stored baseline profile and the per-(check,
    group) verdicts appended to ``out_dir``/drift. Catches
    distribution shift as data lands rather than at the next batch
    audit. Returns the StreamingQuery."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        results = engine.drift(batch_df, baselines)
        if not results:
            return
        spark = batch_df.sparkSession
        rows = [
            (batch_id, r["check_id"], r["group"], r["test"],
             float(r["stat"]),
             None if r["pvalue"] is None else float(r["pvalue"]),
             r["verdict"])
            for r in results
        ]
        spark.createDataFrame(
            rows,
            "batch_id long, check_id string, group string, test string, "
            "stat double, pvalue double, verdict string",
        ).write.mode("append").parquet(f"{out_dir}/drift")

    writer = sdf.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
