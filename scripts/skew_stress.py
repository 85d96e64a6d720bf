#!/usr/bin/env python
"""Skew stress evidence (VERDICT r3 #7): measure, don't hypothesize.

Builds a 90%-one-source variant of the sequences fixture (the regular
fixture is 55% `web`; real corpora are worse), then measures:

  A. full validation (row checks + uniqueness agg + broadcast ref
     join + per-source verdicts) on the BALANCED vs the SKEWED table —
     the engine's claim is that this path is skew-immune (row-level
     work has no keying; the verdict agg is algebraic, so reducer
     input is (distinct sources x map tasks), not row counts).
  B. a genuinely heavy merge state — per-source exact
     count_distinct(doc_id) — plain groupBy vs salted_agg two-stage
     (salted on doc_id: the distinct space splits into disjoint
     cells, so the per-cell counts sum exactly). This is the case
     salting exists for: 90% of the distinct keys hit ONE reducer in
     the plain plan.

Prints one JSON line with both timings x both layouts, min-of-k
fresh-DataFrame trials (CLAUDE.md benchmarking rules). Results are
recorded in SCALING.md §Skew.

Usage: python scripts/skew_stress.py [rows] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sjot_spark.fixtures import (  # noqa: E402
    SEQUENCE_SPEC, make_allowed_sources, make_sequences,
)
from sjot_spark.session import get_spark  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _cached(spark, path: str, build):
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build().write.mode("overwrite").parquet(path)
    return path


def skewed_sequences(spark, n_rows: int):
    """make_sequences with the source distribution overridden to 90%
    `web` (10% spread over the rest) — same schema, same token
    payloads, only the group-key skew changes."""
    base = make_sequences(spark, n_rows, violations=False,
                          partitions=CPUS * 4)
    others = ["books", "code", "wiki", "news", "forum", "legal",
              "synthetic"]
    u = F.pmod(F.xxhash64(F.lit(99), F.col("doc_id")), F.lit(1000))
    expr = F.lit("web")
    src = F.when(u < 900, expr)
    for i, name in enumerate(others):
        src = src.when(u < 900 + (i + 1) * 100 // len(others) + 1, name)
    return base.withColumn("source", src.otherwise(F.lit("synthetic")))


def time_validation(spark, path: str) -> float:
    from sjot_spark.engine import ValidationEngine

    eng = ValidationEngine(SEQUENCE_SPEC, assume_nonnull_elements=True)
    dims = {"allowed_sources": make_allowed_sources(spark)}
    best = None
    for _ in range(TRIALS):
        spark.catalog.clearCache()
        df = spark.read.parquet(path)
        t0 = time.perf_counter()
        res = eng.run(df, dims=dims, persist_violations=False)
        res.verdicts.collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def time_distinct(spark, path: str, salted: bool) -> float:
    from sjot_spark.plan.agg import salted_agg

    best = None
    for _ in range(TRIALS):
        spark.catalog.clearCache()
        df = spark.read.parquet(path)
        t0 = time.perf_counter()
        if salted:
            out = salted_agg(
                df, ["source"],
                {"n_docs": ("count_distinct", "doc_id")},
                n_salts=CPUS, salt_on="doc_id")
        else:
            out = df.groupBy("source").agg(
                F.count_distinct("doc_id").alias("n_docs"))
        out.collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    spark = get_spark(app_name="sjot_skew_stress")
    bal = _cached(spark, f"/tmp/sjot_bench/skew_bal_{ROWS}",
                  lambda: make_sequences(spark, ROWS, violations=False,
                                         partitions=CPUS * 4))
    skw = _cached(spark, f"/tmp/sjot_bench/skew_90_{ROWS}",
                  lambda: skewed_sequences(spark, ROWS))
    # sanity: report the actual skew
    frac = (spark.read.parquet(skw).where(F.col("source") == "web").count()
            / ROWS)
    out = {
        "metric": "skew stress (90% one source vs balanced fixture)",
        "rows": ROWS, "trials": TRIALS, "cpus": CPUS,
        "web_fraction_skewed": round(frac, 4),
        "validate_balanced_sec": time_validation(spark, bal),
        "validate_skewed_sec": time_validation(spark, skw),
        "distinct_plain_balanced_sec": time_distinct(spark, bal, False),
        "distinct_plain_skewed_sec": time_distinct(spark, skw, False),
        "distinct_salted_skewed_sec": time_distinct(spark, skw, True),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
