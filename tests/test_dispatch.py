"""Per-row spec dispatch (run_dispatched) — the scalable analog of
SJOT's embedded per-object @sjot schemas (index.js:111-131): each row
names its spec via a discriminator column; unknown names produce the
typed dispatch_unknown_spec violation (the analog of the reference's
'Invalid @sjot schema' throw)."""

from sjot_spark.engine import ValidationEngine


def _spec(hi: int) -> dict:
    return {
        "@root": "#T",
        "T": {"doc_id": "string", "kind": "string", "x": f"0..{hi}"},
        "@table": {"key": "doc_id", "partition_by": "kind"},
    }


def test_run_dispatched_per_row_spec(spark):
    df = spark.createDataFrame(
        [("d1", "A", 5), ("d2", "A", 50), ("d3", "B", 3),
         ("d4", "C", 1), ("d5", None, 2)],
        "doc_id string, kind string, x int")
    specs = {"A": _spec(9), "B": _spec(4)}
    res = ValidationEngine(specs["A"]).run_dispatched(df, specs, on="kind")

    viol = res.violations.collect()
    assert {r.key for r in viol} == {"d2", "d4", "d5"}
    # d2 fails A's 0..9; d3 passes B's 0..4 (would fail A's had it
    # been dispatched there — per-row dispatch, not one global spec)
    assert all(r.check_id != "dispatch_unknown_spec"
               for r in viol if r.key == "d2")
    unknown = {r.key: r for r in viol
               if r.check_id == "dispatch_unknown_spec"}
    assert set(unknown) == {"d4", "d5"}
    assert unknown["d4"].partition == "C"
    assert unknown["d5"].partition == "null"
    assert "names no registered spec" in unknown["d4"].detail

    verd = {r.partition: r for r in res.verdicts.collect()}
    assert verd["A"].verdict == "fail" and verd["A"].n_rows == 2
    assert verd["B"].verdict == "pass" and verd["B"].n_rows == 1
    assert verd["C"].verdict == "fail" and verd["C"].n_bad_rows == 1
    assert verd["null"].verdict == "fail"
    assert "dispatch_unknown_spec" in res.check_ids


def test_run_dispatched_slice_scans_partition_prune(spark, tmp_path):
    """Laid out partitioned by the discriminator, every dispatched
    slice scan must partition-prune (the one-logical-pass story in the
    docstring)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "disp_src")
    df = spark.createDataFrame(
        [(f"d{i}", "A" if i % 2 else "B", i % 10) for i in range(40)],
        "doc_id string, kind string, x int")
    df.write.partitionBy("kind").mode("overwrite").parquet(src)
    back = spark.read.parquet(src)
    plan = (back.where(F.col("kind") == "A")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan
    assert "kind" in plan.split("PartitionFilters: [", 1)[1].split("]")[0]


def test_run_dispatched_flags_cover_every_input_row(spark):
    """r4 fix (ADVICE r3): flags from run_dispatched covers ALL rows —
    each slice's flags union by name (chk columns that don't apply to
    a row's spec are NULL), and unknown-spec rows appear with
    passed=False (the analog of the reference's invalid-@sjot throw)."""
    df = spark.createDataFrame(
        [("d1", "A", 5), ("d2", "A", 50), ("d3", "B", 3),
         ("d4", "C", 1), ("d5", None, 2)],
        "doc_id string, kind string, x int")
    specs = {"A": _spec(9), "B": _spec(4)}
    res = ValidationEngine(specs["A"]).run_dispatched(df, specs, on="kind")
    flags = {r.doc_id: r for r in res.flags.collect()}
    assert set(flags) == {"d1", "d2", "d3", "d4", "d5"}
    assert flags["d1"].passed is True
    assert flags["d2"].passed is False   # fails A's 0..9
    assert flags["d3"].passed is True    # passes B's 0..4
    assert flags["d4"].passed is False   # unknown spec
    assert flags["d5"].passed is False   # NULL discriminator -> unknown
