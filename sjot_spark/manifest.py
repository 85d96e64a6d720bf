"""Checkpointed, resumable validation runs with per-partition lineage.

north_rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". No reference analog (SJOT is per-instance); this
is app-level orchestration:

- the table is processed one `partition_by` value at a time (on an
  Iceberg/parquet table partitioned by that column, each slice is a
  partition-pruned scan — no full-table rescan per slice; asserted in
  tests/test_plans.py::test_checkpointed_slice_is_partition_pruned.
  On a NON-partitioned layout each slice re-scans the table: write the
  source partitioned by the partition column first);
- each completed partition writes its violations to the sink and then
  an atomic manifest file (tmp + rename) with lineage + metrics;
- on restart, partitions with a manifest entry are SKIPPED;
- cross-partition checks (global key uniqueness, drift) run as a
  final `_global` phase once every partition is committed, with its
  own manifest entry.

Manifest entry fields: partition, n_rows, n_violations, n_bad_rows,
verdict, wall_s, input_fingerprint (xxhash64 multiset fingerprint of
the slice — lineage evidence the same input was validated),
engine_version, completed_at.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import sjot_spark
from sjot_spark.engine import ValidationEngine, VIOLATION_COLUMNS
from sjot_spark.errors import SpecError

GLOBAL_PART = "_global"


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


_NULL_PART = "_null_"


def _safe_name(value) -> str:
    """Filesystem-safe manifest name for any partition value type
    (string/int/date/None). Lossy sanitization gets an md5 suffix so
    distinct values ('a/b' vs 'a_b') never share a manifest file or
    violations directory (round-1 ADVICE: the second overwrite-write
    destroyed the first partition's committed output)."""
    if value is None:
        return _NULL_PART
    s = str(value)
    safe = "".join(ch if ch.isalnum() or ch in "-_." else "_" for ch in s)
    if safe != s or not safe or s == _NULL_PART:
        safe = (safe or "v") + "_" + hashlib.md5(s.encode()).hexdigest()[:8]
    return safe


def _write_manifest(out_dir: str, name: str, entry: dict) -> None:
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(entry, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(d, f"{name}.json"))  # atomic commit


def read_manifest(out_dir: str) -> dict[str, dict]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out = {}
    for fn in os.listdir(d):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                e = json.load(f)
            out[e["partition"]] = e
    return out


def _fingerprint(df: DataFrame) -> dict:
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("s"),
    ).first()
    return {"n": row["n"], "sum": str(row["s"])}


def run_checkpointed(
    engine: ValidationEngine,
    df: DataFrame,
    out_dir: str,
    dims: dict[str, DataFrame] | None = None,
    baselines: dict[str, DataFrame] | None = None,
    max_partitions: int | None = None,
) -> dict[str, dict]:
    """Validate partition-by-partition with resume. Returns the full
    manifest. ``max_partitions`` limits how many uncommitted
    partitions are processed this call (used to exercise resume)."""
    spec = engine.spec
    part = spec.table.partition_by
    if not part:
        raise SpecError("checkpointed runs need @table.partition_by")
    dims = dims or {}

    done = read_manifest(out_dir)
    # NULL partition values get their own slice (sorted first) so no
    # row escapes row-level validation
    values = [r[0] for r in df.select(part).distinct().collect()]
    parts = ([None] if any(v is None for v in values) else []) + sorted(
        v for v in values if v is not None
    )
    key_of = lambda p: _NULL_PART if p is None else p  # noqa: E731
    todo = [p for p in parts if key_of(p) not in done]
    if max_partitions is not None:
        todo = todo[:max_partitions]

    # per-partition phase: row-level + ref checks only (partition-local)
    local_spec_doc = dict(spec.doc)
    tbl = dict(local_spec_doc.get("@table", {}))
    tbl.pop("unique", None)
    tbl.pop("drift", None)
    local_spec_doc["@table"] = tbl
    local_engine = ValidationEngine(local_spec_doc)

    for p in todo:
        t0 = time.time()
        part_df = df.where(
            F.col(part).isNull() if p is None else F.col(part) == p
        )
        res = local_engine.run(part_df, dims=dims)
        vdir = os.path.join(out_dir, "violations", f"{part}={_safe_name(p)}")
        res.violations.write.mode("overwrite").parquet(vdir)
        verd = res.verdicts.collect()
        # the persisted violations served both the write and the
        # verdict agg; release it so a long many-partition run doesn't
        # accumulate one cached DF per slice
        res.violations.unpersist()
        n_rows = sum(r["n_rows"] for r in verd)
        n_viol = sum(r["n_violations"] for r in verd)
        n_bad = sum(r["n_bad_rows"] for r in verd)
        _write_manifest(out_dir, _safe_name(p), {
            "partition": key_of(p),
            "n_rows": n_rows,
            "n_violations": n_viol,
            "n_bad_rows": n_bad,
            "verdict": "pass" if n_viol == 0 else "fail",
            "wall_s": round(time.time() - t0, 3),
            "input_fingerprint": _fingerprint(part_df),
            "engine_version": sjot_spark.__version__,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        done[key_of(p)] = read_manifest(out_dir)[key_of(p)]

    # global phase: cross-partition checks, once everything local is in
    all_local_done = all(key_of(p) in done for p in parts)
    if all_local_done and GLOBAL_PART not in done and (
        spec.table.unique or spec.table.drift
    ):
        t0 = time.time()
        gv = 0
        if spec.table.unique:
            part_col = F.col(part)
            uniq = engine._unique_violations(df, part_col)
            vdir = os.path.join(out_dir, "violations", f"{part}={GLOBAL_PART}")
            uniq.write.mode("overwrite").parquet(vdir)
            gv = uniq.count()
        drift_results = []
        if spec.table.drift:
            if baselines is None:
                raise SpecError("@table.drift needs baselines= for the global phase")
            drift_results = engine.drift(df, baselines)
            gv += sum(1 for r in drift_results if r["verdict"] == "fail")
        _write_manifest(out_dir, GLOBAL_PART, {
            "partition": GLOBAL_PART,
            "n_rows": 0,
            "n_violations": int(gv),
            "n_bad_rows": 0,
            "verdict": "pass" if gv == 0 else "fail",
            "wall_s": round(time.time() - t0, 3),
            "drift": drift_results,
            "engine_version": sjot_spark.__version__,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        done[GLOBAL_PART] = read_manifest(out_dir)[GLOBAL_PART]

    return done


def load_violations(spark, out_dir: str) -> DataFrame:
    """All committed violation rows across partitions."""
    path = os.path.join(out_dir, "violations")
    return spark.read.option("basePath", path).parquet(path + "/*")
