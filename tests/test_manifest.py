"""Checkpoint/resume: interrupt after k partitions, re-run, assert the
committed partitions are skipped and the final result is identical to
an uninterrupted run (SURVEY.md §5.6)."""

import json
import os

import pytest

from sjot_spark.engine import ValidationEngine
from sjot_spark.fixtures import (
    SEQUENCE_SPEC, make_allowed_sources, make_sequences,
)
from sjot_spark.manifest import (
    GLOBAL_PART, read_manifest, run_checkpointed, load_violations,
)

N = 1000


def test_checkpoint_resume_identical_to_full_run(spark, tmp_path):
    df = make_sequences(spark, N, violations=True)
    eng = ValidationEngine(SEQUENCE_SPEC)
    dims = {"allowed_sources": make_allowed_sources(spark)}
    out1 = str(tmp_path / "interrupted")
    out2 = str(tmp_path / "full")

    # simulate interruption: only 3 partitions complete, then "crash"
    m = run_checkpointed(eng, df, out1, dims=dims, max_partitions=3)
    assert len([p for p in m if p != GLOBAL_PART]) == 3
    assert GLOBAL_PART not in m  # global phase must NOT run early
    committed_before = {
        p: e["completed_at"] for p, e in read_manifest(out1).items()
    }

    # resume: completes the rest + the global phase
    m2 = run_checkpointed(eng, df, out1, dims=dims)
    assert GLOBAL_PART in m2
    # previously committed partitions were skipped (not recomputed)
    after = read_manifest(out1)
    for p, ts in committed_before.items():
        assert after[p]["completed_at"] == ts
        assert after[p] == m2[p]

    # uninterrupted run for comparison
    m3 = run_checkpointed(eng, df, out2, dims=dims)
    keys = lambda mm: {  # noqa: E731
        p: (e["n_rows"], e["n_violations"], e["verdict"])
        for p, e in mm.items()
    }
    assert keys(m2) == keys(m3)

    # violations on disk match a direct engine run
    direct = eng.run(df, dims=dims).violations
    from_sink = load_violations(spark, out1).select(*direct.columns)
    a = {tuple(r) for r in direct.collect()}
    b = {tuple(r) for r in from_sink.collect()}
    assert a == b


def test_manifest_entries_carry_lineage(spark, tmp_path):
    df = make_sequences(spark, 200, violations=False)
    eng = ValidationEngine(SEQUENCE_SPEC)
    dims = {"allowed_sources": make_allowed_sources(spark)}
    out = str(tmp_path / "lineage")
    m = run_checkpointed(eng, df, out, dims=dims)
    some = next(p for p in m if p != GLOBAL_PART)
    e = m[some]
    assert e["input_fingerprint"]["n"] > 0
    assert "sum" in e["input_fingerprint"]
    assert e["engine_version"]
    assert e["wall_s"] >= 0
    # files are valid JSON and atomic-committed (no .tmp left behind)
    mdir = os.path.join(out, "manifest")
    assert not [f for f in os.listdir(mdir) if f.endswith(".tmp")]
    for fn in os.listdir(mdir):
        with open(os.path.join(mdir, fn)) as f:
            json.load(f)


def test_assume_nonnull_elements_elides_scan_and_matches(spark, tmp_path):
    """ValidationEngine(assume_nonnull_elements=True) must produce the
    same verdicts as the default engine on element-null-free data
    while compiling WITHOUT the per-element null scan (parquet cannot
    express the non-null-element contract; Iceberg required elements
    get the elision automatically from containsNull=False)."""
    from sjot_spark.engine import ValidationEngine
    from sjot_spark.fixtures import (
        SEQUENCE_SPEC, make_allowed_sources, make_sequences,
    )

    p = str(tmp_path / "seq")
    make_sequences(spark, 500, violations=True).write.parquet(p)
    df = spark.read.parquet(p)
    dims = {"allowed_sources": make_allowed_sources(spark)}
    base = ValidationEngine(SEQUENCE_SPEC).run(
        df, dims=dims, persist_violations=False)
    fast_eng = ValidationEngine(SEQUENCE_SPEC, assume_nonnull_elements=True)
    fast = fast_eng.run(df, dims=dims, persist_violations=False)
    rows = lambda r: sorted(  # noqa: E731
        (v.key, v.check_id) for v in r.violations.collect())
    assert rows(base) == rows(fast)
    plan = fast.flags._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(lambda" not in plan and "array_compact" not in plan
    base_plan = base.flags._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(lambda" in base_plan
