"""Sequence packing + deterministic sampling — training-data pipeline
operators over pre-tokenized corpora.

``pack_bins``: greedy concat-stream packing — documents are laid out
in a deterministic order (per group), the running length is chunked
into fixed-budget context windows, and each document is assigned the
bin its FIRST token lands in. This is the standard "concatenate then
split at budget boundaries" packing used to build fixed-length training
contexts; the assignment is a pure window cumulative sum:
one hash shuffle per group column + an in-partition sort, no joins,
no iteration. At 10^12 docs the shuffle is on the group key (source),
the same partitioning the validation engine already uses.

``hash_sample``: deterministic md5-threshold sampling (keep a doc iff
its md5 falls in the lowest ``1/k`` of hash space) — reproducible
across engines and runs, no RNG state, prunable at the scan when the
hash is precomputed. The per-group top-n variant (``stratified_take``)
ranks by md5 within each group — a fixed-size deterministic sample per
stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_bins(
    df: DataFrame,
    group: str,
    order: str,
    length: str,
    budget: int,
) -> DataFrame:
    """Input columns + ``bin`` (0-based context-window index within
    ``group``) + ``offset`` (start position of this doc in the
    concatenated stream). Documents straddling a boundary belong to
    the bin their first token lands in."""
    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(length).over(w)
    offset = (cum - F.col(length)).cast("long")
    return df.select(
        "*",
        offset.alias("offset"),
        F.floor(offset / budget).cast("long").alias("bin"),
    )


def pack_stats(
    df: DataFrame,
    group: str,
    order: str,
    length: str,
    budget: int,
) -> DataFrame:
    """Per-(group, bin) packing summary: docs packed, payload length,
    and fill level of the budget window (integer per-mille, exact —
    FLOOR(len_sum*1000/budget); can exceed 1000 because a document
    straddling the boundary counts in the bin its first token lands
    in)."""
    packed = pack_bins(df, group, order, length, budget)
    len_sum = F.sum(F.col(length).cast("long"))
    return (
        packed.groupBy(group, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            len_sum.alias("len_sum"),
            F.floor(len_sum * 1000 / budget).cast("long")
            .alias("fill_permille"),
        )
    )


def hash_sample(df: DataFrame, key: str, k: int) -> DataFrame:
    """Deterministic 1-in-k sample: md5(key) mod k == 0. Identical
    row set in any engine with md5 (the cross-engine-safe hash;
    DuckDB twin: ('0x' || substr(md5(x),1,15))::BIGINT)."""
    from sjot_spark.datapipe.dedup import _md5_int

    return df.where(_md5_int(F.col(key).cast("string")) % k == 0)


def stratified_take(df: DataFrame, group: str, key: str, n: int) -> DataFrame:
    """Fixed-size deterministic sample per group: the ``n`` rows with
    the smallest md5(key) in each group (ties impossible — md5 of a
    unique key is unique in practice; the key itself breaks any)."""
    w = Window.partitionBy(group).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key))
    return (
        df.select("*", F.row_number().over(w).alias("_rk"))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )
