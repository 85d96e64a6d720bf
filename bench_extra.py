#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

NOT the driver's bench — bench.py stays frozen. This file exists to
attribute time: for each bench query it separately times

- build_s:   QUERIES[name](spark, sf_dir) — Python plan construction
- analyze_s: df.schema access (analysis) — included in build in bench.py
- exec_s:    noop-sink execution, min over --trials fresh DataFrames
             (re-building per trial so AQE shuffle reuse never serves
             a materialized stage — see CLAUDE.md)

and can dump .explain("formatted") for the plans/r07 evidence files.

Usage:
  python bench_extra.py                      # time all bench queries
  python bench_extra.py --plans plans/r07 --suffix before
  python bench_extra.py -q substring_dedup_stats --trials 3
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "validate_violations", "text_profile", "exact_dedup_stats",
    "ngram_jaccard", "minhash_lsh", "knn_cosine", "sessionization",
    "tpch_q1", "tpch_q3", "tpch_q5",
    "json_validate", "dedup_clusters", "events_asof",
    "bpe_tokenize_stats",
    "repetition_stats", "decontam_overlap", "boilerplate_stats",
    "substring_dedup_stats", "surprisal_scores",
    "surprisal2_scores", "source_mix_epochs",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-q", "--query", action="append", default=None)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <q>_<suffix>.txt plan files")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from sjot_spark.queries import QUERIES
    from sjot_spark.session import get_spark

    spark = get_spark(app_name="sjot_bench_extra")
    names = args.query or BENCH_QUERIES
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = df.schema
        analyze_s = time.perf_counter() - t0
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(f"{args.plans}/{name}_{args.suffix}.txt", "w") as f:
                f.write(formatted_plan(df))
        execs = []
        for _ in range(args.trials):
            spark.catalog.clearCache()
            fresh = QUERIES[name](spark, SF_DIR)
            t0 = time.perf_counter()
            fresh.write.format("noop").mode("overwrite").save()
            execs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "build_s": round(build_s, 3),
            "analyze_s": round(analyze_s, 3),
            "exec_s": execs,
            "exec_min": min(execs),
        }
        print(json.dumps({name: out[name]}), flush=True)
    total_min = round(sum(v["exec_min"] + v["build_s"] for v in out.values()), 3)
    print(json.dumps({"summary_build_plus_execmin": total_min}))


if __name__ == "__main__":
    main()
