#!/usr/bin/env python
"""spark-submit entrypoint: validate a sequences table with a CheckSpec.

Usage (north_rule packaging: spark-submit --py-files):

    python scripts/make_pyfiles_zip.py               # -> dist/sjot_spark.zip
    spark-submit --py-files dist/sjot_spark.zip scripts/run_validation.py \
        --input /path/to/sequences_parquet \
        --spec  /path/to/spec.json \
        --out   /path/to/run_output \
        [--dims allowed_sources=/path/to/dim_parquet ...] \
        [--checkpointed] [--baselines name=/path/hist_parquet ...]

Prints one JSON line with the run summary; violations parquet and the
per-partition manifest land under --out.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--spec", required=True, help="CheckSpec JSON file")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dims", nargs="*", default=[],
                    help="name=parquet_path pairs for @table.ref dims")
    ap.add_argument("--baselines", nargs="*", default=[],
                    help="name=parquet_path pairs for @table.drift baselines")
    ap.add_argument("--checkpointed", action="store_true",
                    help="partition-by-partition resumable run")
    ap.add_argument("--detail-level", default="full",
                    choices=("full", "fast"),
                    help="fast = no diagnostic strings (FAST build analog)")
    ap.add_argument("--assume-nonnull-elements", action="store_true",
                    help="elide the per-element null scan when the "
                         "producer contract forbids null array elements "
                         "(Iceberg element:required gets this free)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from sjot_spark.engine import ValidationEngine
    from sjot_spark.manifest import run_checkpointed

    spark = SparkSession.builder.appName("sjot-validate").getOrCreate()
    with open(args.spec) as f:
        engine = ValidationEngine(
            json.load(f), detail_level=args.detail_level,
            assume_nonnull_elements=args.assume_nonnull_elements)
    df = spark.read.parquet(args.input)
    dims = {
        kv.split("=", 1)[0]: spark.read.parquet(kv.split("=", 1)[1])
        for kv in args.dims
    }
    baselines = {
        kv.split("=", 1)[0]: spark.read.parquet(kv.split("=", 1)[1])
        for kv in args.baselines
    } or None

    if args.checkpointed:
        manifest = run_checkpointed(engine, df, args.out, dims=dims,
                                    baselines=baselines)
        summary = {
            "mode": "checkpointed",
            "partitions": len(manifest),
            "verdicts": {p: e["verdict"] for p, e in sorted(manifest.items())},
            "n_violations": sum(e["n_violations"] for e in manifest.values()),
        }
    else:
        res = engine.run(df, dims=dims)
        res.violations.write.mode("overwrite").parquet(f"{args.out}/violations")
        verd = res.verdicts.collect()
        summary = {
            "mode": "single",
            "partitions": len(verd),
            "verdicts": {r["partition"]: r["verdict"] for r in verd},
            "n_violations": sum(r["n_violations"] for r in verd),
            "n_rows": sum(r["n_rows"] for r in verd),
        }
    print(json.dumps(summary, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
