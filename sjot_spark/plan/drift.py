"""Distribution-drift checks (BASELINE.json north_star; no reference
analog — SJOT validates single instances, this validates populations).

Two histogram kinds over the sequences table:

- length_histogram: bucketized token-array length (or any numeric
  column) — a pure JVM groupBy, partial+final agg, tiny output.
- value_histogram: bucketized token-id counts. `explode(tokens)`
  would multiply the row count by ~n_tok (ruinous at 10^12 rows), so
  partial histograms are built per Arrow batch inside mapInPandas
  (numpy bincount — vectorized, never per-row Python) and merged by
  one groupBy over (group, bucket): shuffle volume is bounded by
  n_buckets x n_input_partitions, independent of row count.

The drift TEST (chi-square or KS vs a stored baseline profile) runs
on the merged histograms — data so small it is collected and tested
driver-side with the numpy kernels in sjot_spark.plan.stats.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sjot_spark.plan import stats
from sjot_spark.spec.spec import DriftClause

HIST_SCHEMA = "group string, bucket int, cnt long"


def length_histogram(
    df: DataFrame, column: str, bucket_width: int, group_by: str | None
) -> DataFrame:
    """Bucketized length histogram: one partial+final hash agg."""
    dt = dict(zip(df.columns, (f.dataType.simpleString() for f in df.schema.fields)))
    base = F.size(F.col(column)) if dt[column].startswith("array") else F.col(column)
    g = F.col(group_by) if group_by else F.lit("_all")
    return (
        df.where(F.col(column).isNotNull())
        .groupBy(
            g.cast("string").alias("group"),
            F.floor(base / bucket_width).cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def value_histogram_jvm(
    df: DataFrame, column: str, bucket_width: int, group_by: str | None,
    max_value: int = 1 << 20,
) -> DataFrame:
    """Pure-JVM formulation: explode + two-phase hash agg, bit-equal
    to value_histogram — same floor division and the same clip into
    [0, n_buckets-1] for out-of-domain elements (round-1 ADVICE: the
    earlier truncating int cast diverged on negatives and values past
    max_value). The exploded rows never materialize — they stream
    through the map-side combine, so shuffle volume is still
    buckets x tasks. This is the default path (no Python workers,
    no Arrow transfer of every token array)."""
    n_buckets = max_value // bucket_width + 1
    raw = F.floor(F.col("v") / bucket_width)
    bucket = F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), raw))
    if group_by is None:
        # ungrouped: aggregate on the PRIMITIVE int bucket alone — a
        # constant "_all" string in the grouping key defeats codegen's
        # first-level primitive fast hashmap and adds a string hash
        # per element (measured ~25% of the 750M-element agg); the
        # literal group is re-attached after the (tiny) aggregate,
        # value-identical output
        return (
            df.where(F.col(column).isNotNull())
            .select(F.explode(F.col(column)).alias("v"))
            .where(F.col("v").isNotNull())
            .groupBy(bucket.cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit("_all").cast("string").alias("group"),
                    "bucket", "cnt")
        )
    g = F.col(group_by)
    return (
        df.where(F.col(column).isNotNull())
        .select(g.cast("string").alias("group"),
                F.explode(F.col(column)).alias("v"))
        # null elements carry no value information and must not be
        # binned (greatest/least SKIP null inputs, which would silently
        # count them in the clip-top bucket)
        .where(F.col("v").isNotNull())
        .groupBy("group", bucket.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def value_histogram(
    df: DataFrame, column: str, bucket_width: int, group_by: str | None,
    max_value: int = 1 << 20,
) -> DataFrame:
    """Bucketized histogram of array ELEMENT values without explode:
    per-Arrow-batch numpy partial histograms, then one tiny merge agg.
    (value_histogram_jvm is the equivalent JVM-only formulation.)"""
    n_buckets = max_value // bucket_width + 1

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, np.ndarray] = {}
        for pdf in batches:
            for grp, sub in pdf.groupby("group"):
                vals = sub["vals"].to_numpy()
                flat = np.concatenate(vals) if len(vals) else np.array([], dtype=np.int64)
                if flat.dtype == object:  # null elements arrive as None
                    flat = flat[~pd.isnull(flat)]
                elif flat.dtype.kind == "f":  # ...or as NaN (Arrow
                    flat = flat[~np.isnan(flat)]  # promotes int+null)
                if flat.size == 0:
                    continue
                b = np.clip(flat.astype(np.int64) // bucket_width, 0, n_buckets - 1)
                h = np.bincount(b, minlength=n_buckets)
                if grp in acc:
                    acc[grp] += h
                else:
                    acc[grp] = h.astype(np.int64)
        rows = [
            (g, int(b), int(c))
            for g, h in acc.items()
            for b, c in zip(np.nonzero(h)[0], h[np.nonzero(h)[0]])
        ]
        yield pd.DataFrame(rows, columns=["group", "bucket", "cnt"])

    g = F.col(group_by) if group_by else F.lit("_all")
    partials = (
        df.where(F.col(column).isNotNull())
        .select(g.cast("string").alias("group"), F.col(column).alias("vals"))
        .mapInPandas(partial, HIST_SCHEMA)
    )
    return partials.groupBy("group", "bucket").agg(F.sum("cnt").alias("cnt"))


def build_histogram(df: DataFrame, clause: DriftClause) -> DataFrame:
    if clause.kind == "length_histogram":
        return length_histogram(df, clause.column, clause.bucket_width, clause.group_by)
    # JVM explode+combine by default: equivalent output, and it keeps
    # the whole pass in codegen instead of shipping every token array
    # through Arrow to Python workers (64% of the round-1 bench).
    return value_histogram_jvm(df, clause.column, clause.bucket_width,
                               clause.group_by)


def drift_test(
    current: DataFrame, baseline: DataFrame, clause: DriftClause
) -> list[dict]:
    """Compare per-group histograms; returns one verdict dict per group.
    Both inputs are merged histograms (<= groups x buckets rows), so
    the comparison is collected and computed driver-side in numpy."""
    cur = {(r["group"], r["bucket"]): r["cnt"] for r in current.collect()}
    base = {(r["group"], r["bucket"]): r["cnt"] for r in baseline.collect()}
    groups = sorted({g for g, _ in cur} | {g for g, _ in base})
    out = []
    for g in groups:
        buckets = sorted(
            {b for gg, b in cur if gg == g} | {b for gg, b in base if gg == g}
        )
        obs = np.array([cur.get((g, b), 0) for b in buckets], dtype=np.float64)
        exp = np.array([base.get((g, b), 0) for b in buckets], dtype=np.float64)
        if clause.test == "chi2":
            stat, p, dof = stats.chi2_test(obs, exp)
            verdict = "pass" if p >= clause.alpha else "fail"
        elif clause.test == "psi":
            # PSI is a divergence with industry thresholds, not a
            # p-value: alpha is the PSI fail threshold here
            stat, dof = stats.psi_from_hist(obs, exp), None
            p = None
            verdict = "pass" if stat <= clause.alpha else "fail"
        else:
            stat, p = stats.ks_2samp_from_hist(obs, exp)
            dof = None
            verdict = "pass" if p >= clause.alpha else "fail"
        out.append({
            "check_id": clause.name,
            "group": g,
            "test": clause.test,
            "stat": float(stat),
            "pvalue": None if p is None else float(p),
            "dof": dof,
            "verdict": verdict,
        })
    return out
