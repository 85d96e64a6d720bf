"""Structured Streaming: the same compiled spec validates a stream —
file-source micro-batches through foreachBatch full validation, and a
pure streaming projection for row-level violations."""

import pytest
from pyspark.sql import functions as F

from sjot_spark.engine import ValidationEngine
from sjot_spark.fixtures import (
    SEQUENCE_SPEC, make_allowed_sources, make_sequences,
)
from sjot_spark.streaming import stream as st


@pytest.fixture(scope="module")
def seq_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seqstream") / "input")
    make_sequences(spark, 500, violations=True).write.parquet(d)
    return d


def test_foreach_batch_full_validation(spark, seq_dir, tmp_path):
    eng = ValidationEngine(SEQUENCE_SPEC)
    dims = {"allowed_sources": make_allowed_sources(spark)}
    sdf = spark.readStream.schema(
        "doc_id string, tokens array<int>, n_tok int, source string"
    ).parquet(seq_dir)
    out = str(tmp_path / "out")
    q = st.run_foreach_batch(eng, sdf, out, dims=dims,
                             checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/violations")
    batch_ids = {r.batch_id for r in got.select("batch_id").distinct().collect()}
    assert batch_ids  # at least one micro-batch processed
    # identical violation set as the batch engine on the same data
    direct = eng.run(spark.read.parquet(seq_dir), dims=dims).violations
    a = {(r.key, r.check_id) for r in direct.collect()}
    b = {(r.key, r.check_id) for r in got.collect()}
    assert a == b


def test_streaming_projection_is_incremental(spark, seq_dir):
    eng = ValidationEngine({
        **{k: v for k, v in SEQUENCE_SPEC.items() if k != "@table"},
        "@table": {"key": "doc_id", "partition_by": "source",
                   "consistent": {"n_tok": "size(tokens)"}},
    })
    sdf = spark.readStream.schema(
        "doc_id string, tokens array<int>, n_tok int, source string"
    ).parquet(seq_dir)
    v = st.violations_stream(eng, sdf)
    assert v.isStreaming
    q = (v.writeStream.format("memory").queryName("viol_mem")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from viol_mem").collect()
    assert {r.check_id for r in rows} >= {"n_tok_consistency", "tokens_not_null"}


def test_windowed_counts_with_watermark(spark, tmp_path):
    """Watermarked event-time windows; batch run is the parity oracle."""
    from sjot_spark.streaming.windows import windowed_counts

    ev_dir = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .write.parquet(ev_dir)
    schema = spark.read.parquet(ev_dir).schema
    sdf = spark.readStream.schema(schema).parquet(ev_dir)
    wdf = windowed_counts(sdf, "ts", "event_type",
                          window="1 hour", watermark="30 minutes")
    q = (wdf.writeStream.format("memory").queryName("winmem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql("select * from winmem").collect()
    }
    batch = {
        (r.window_start, r.event_type): r.n
        for r in windowed_counts(
            spark.read.parquet(ev_dir), "ts", "event_type",
            window="1 hour").collect()
    }
    # append mode only emits windows closed by the watermark; all
    # emitted windows must agree exactly with the batch computation
    assert got
    for k, n in got.items():
        assert batch[k] == n


def test_stateful_cross_batch_duplicate_detection(spark, tmp_path):
    """applyInPandasWithState: a doc_id seen in batch 1 reappearing in
    batch 2 must be flagged — state survives across micro-batches."""
    from sjot_spark.streaming.stateful import duplicate_stream

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: a,b,c (plus an in-batch dup of a) — batch 2: c,d,a
    spark.createDataFrame(
        [("a",), ("b",), ("c",), ("a",)], "doc_id string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("c",), ("d",), ("a",)], "doc_id string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    sdf = (spark.readStream.schema("doc_id string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    dups = duplicate_stream(sdf, "doc_id", n_buckets=4)
    q = (dups.writeStream.format("memory").queryName("dupmem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.key, r.n_prior) for r in spark.sql("select * from dupmem").collect()}
    # in-batch dup of a (prior=1), cross-batch: c (prior=1), a (prior=2)
    assert got == {("a", 1), ("c", 1), ("a", 2)}


def test_streaming_drift_monitor(spark, tmp_path):
    """Per-micro-batch drift verdicts: a clean batch passes, a
    length-shifted batch fails, each recorded with its batch id."""
    from sjot_spark.fixtures import drifted_sequences
    from sjot_spark.streaming.stream import run_drift_monitor

    spec = {
        **{k: v for k, v in SEQUENCE_SPEC.items() if k != "@table"},
        "@table": {"key": "doc_id", "partition_by": "source",
                   "drift": {"len_ks": {
                       "kind": "length_histogram", "column": "tokens",
                       "bucket_width": 64, "group_by": None,
                       "test": "ks", "alpha": 0.001}}},
    }
    eng = ValidationEngine(spec)
    base = eng.profile(make_sequences(spark, 3000, violations=False))
    base = {k: v.localCheckpoint() for k, v in base.items()}

    src = tmp_path / "src"
    src.mkdir()
    make_sequences(spark, 3000, seed=5, violations=False) \
        .coalesce(1).write.parquet(str(src / "clean"))
    drifted_sequences(spark, 3000, seed=6, kind="length") \
        .coalesce(1).write.parquet(str(src / "shifted"))
    sdf = (spark.readStream
           .schema("doc_id string, tokens array<int>, n_tok int, source string")
           .option("maxFilesPerTrigger", 1).parquet(str(src / "*")))
    out = str(tmp_path / "out")
    q = run_drift_monitor(eng, sdf, base, out,
                          checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(240)
    rows = spark.read.parquet(f"{out}/drift").collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(r.verdict)
    assert len(by_batch) == 2
    verdict_sets = sorted(tuple(sorted(set(v))) for v in by_batch.values())
    assert verdict_sets == [("fail",), ("pass",)]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps the first arrival of each
    key across micro-batches; state is bounded by the watermark."""
    from sjot_spark.streaming.stream import dedup_stream

    src = tmp_path / "dsrc"
    src.mkdir()
    spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:00:10"),
         ("a", "2024-01-01 00:00:15")], "doc_id string, ts_s string",
    ).select("doc_id", F.to_timestamp("ts_s").alias("ts")) \
        .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("a", "2024-01-01 00:01:00"), ("c", "2024-01-01 00:01:30")],
        "doc_id string, ts_s string",
    ).select("doc_id", F.to_timestamp("ts_s").alias("ts")) \
        .coalesce(1).write.parquet(str(src / "f2"))

    sdf = (spark.readStream.schema("doc_id string, ts timestamp")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    q = (dedup_stream(sdf, ["doc_id"], "ts", watermark="10 minutes")
         .writeStream.format("memory").queryName("dedupmem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "dckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted(r.doc_id for r in
                 spark.sql("select doc_id from dedupmem").collect())
    # each key survives exactly once despite in-batch and cross-batch dups
    assert got == ["a", "b", "c"]


def test_streaming_sessionization_event_time_timeout(spark, tmp_path):
    """session_stream: in-batch gap splits emit immediately; a session
    left open in batch 1 closes via EventTimeTimeout once batch 2
    advances the watermark past end + gap."""
    from sjot_spark.streaming.stateful import session_stream

    src = tmp_path / "ssrc"
    src.mkdir()
    # batch 1 — user 1: two events 1 min apart (stays open);
    # user 2: two events 3 h apart (first session closes in-batch)
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:01:00"),
         (2, "2024-01-01 00:00:00"), (2, "2024-01-01 03:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts")) \
        .coalesce(1).write.parquet(str(src / "f1"))
    # batch 2 — a later event (any user) pushes the watermark to
    # 02:00-10min, far past user 1's 00:01 end + 30 min gap
    spark.createDataFrame(
        [(3, "2024-01-01 02:00:00")], "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts")) \
        .coalesce(1).write.parquet(str(src / "f2"))

    sdf = (spark.readStream.schema("user_id long, ts timestamp")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    q = (session_stream(sdf, "user_id", "ts", gap_minutes=30,
                        watermark="10 minutes")
         .writeStream.format("memory").queryName("sessmem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql(
        "select * from sessmem order by user_id, session_start_ms"
    ).collect()
    got = [(r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)
           for r in rows]
    t0 = 1704067200000  # 2024-01-01 00:00:00 UTC
    # user 1: closed by timeout (2 events, 1-min span);
    # user 2: first event closed in-batch by the 3 h gap
    assert (1, t0, t0 + 60_000, 2) in got
    assert (2, t0, t0, 1) in got


def test_streaming_session_cross_batch_late_event(spark, tmp_path):
    """r4 fix (ADVICE r3): a cross-batch late event OLDER than the open
    session's start must either lower session_start_ms (when within
    gap) or close as its own earlier session — never be silently
    absorbed with a wrong start."""
    from sjot_spark.streaming.stateful import session_stream

    src = tmp_path / "lsrc"
    src.mkdir()
    t = "2024-01-01 0%d:%02d:00"
    # gap (5 min) < watermark delay (40 min): late events can be above
    # the watermark (so Spark's late-row filter keeps them) yet older
    # than the open session's start, reaching the cross-batch path.
    # batch 1 — user 1 opens a session at 01:00; watermark -> 00:20
    spark.createDataFrame(
        [(1, t % (1, 0))], "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts")) \
        .coalesce(1).write.parquet(str(src / "f1"))
    # batch 2 — user 1: late 00:58 (within the 5-min gap of the open
    # 01:00 session -> merges, lowering its start), and late 00:25
    # (older than 00:58 - gap -> its own OPEN earlier session; still
    # above the 00:20 watermark)
    spark.createDataFrame(
        [(1, t % (0, 58)), (1, t % (0, 25))],
        "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts")) \
        .coalesce(1).write.parquet(str(src / "f2"))
    # batch 3 — an even later late event 00:28 must MERGE into the
    # still-open 00:25 pre-session (the r3 single-triple state
    # fragmented this into two one-event sessions)
    spark.createDataFrame(
        [(1, t % (0, 28))], "user_id long, ts_s string",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts")) \
        .coalesce(1).write.parquet(str(src / "f3"))
    # batches 4+5 — advance the watermark far past every horizon,
    # then fire one more batch so the event-time timeout flushes
    for i, stamp in ((4, "2024-01-01 09:00:00"),
                     (5, "2024-01-01 09:30:00")):
        spark.createDataFrame(
            [(9, stamp)], "user_id long, ts_s string",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts")) \
            .coalesce(1).write.parquet(str(src / f"f{i}"))

    sdf = (spark.readStream.schema("user_id long, ts timestamp")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    q = (session_stream(sdf, "user_id", "ts", gap_minutes=5,
                        watermark="40 minutes")
         .writeStream.format("memory").queryName("latemem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "lckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)
           for r in spark.sql("select * from latemem").collect()}
    t0 = 1704067200000  # 2024-01-01 00:00:00 UTC
    m = 60_000
    u1 = {g for g in got if g[0] == 1}
    # 00:25 and the later-arriving 00:28 form ONE earlier session
    # (no fragmentation); 00:58 merges into the open 01:00 session
    # and LOWERS its start — exactly what batch sessionization over
    # the same six events produces
    assert (1, t0 + 25 * m, t0 + 28 * m, 2) in u1
    assert (1, t0 + 58 * m, t0 + 60 * m, 2) in u1
    assert len(u1) == 2


def test_bloom_duplicate_stream_no_false_negatives(spark, tmp_path):
    """state_mode='bloom': same scenario as the exact test — every
    true duplicate is flagged (n_prior=-1), filter large enough that
    no false positive can fire on 4 distinct keys."""
    from sjot_spark.streaming.stateful import duplicate_stream

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [("a",), ("b",), ("c",), ("a",)], "doc_id string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("c",), ("d",), ("a",)], "doc_id string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    sdf = (spark.readStream.schema("doc_id string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    dups = duplicate_stream(sdf, "doc_id", n_buckets=4,
                            state_mode="bloom", bloom_bits=1 << 16)
    q = (dups.writeStream.format("memory").queryName("bloommem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from bloommem").collect()
    assert all(r.n_prior == -1 for r in rows)
    flagged = sorted(r.key for r in rows)
    # a flagged twice (in-batch dup + batch-2 reappearance), c once
    assert flagged == ["a", "a", "c"]


def test_bloom_state_bounded_and_fp_rate():
    """The Bloom kernel's state is FIXED memory regardless of key
    count, with the predicted false-positive rate: 10k inserts into a
    2^17-bit / 7-hash filter -> (1-e^(-kn/m))^k ~= 0.2% FP."""
    import numpy as np
    from sjot_spark.streaming.stateful import _bloom_check_insert

    bits, k = 1 << 17, 7
    arr = np.zeros(bits >> 3, dtype=np.uint8)
    # a fresh key CAN collide during the fill (that IS the FP), so
    # count first-insert hits rather than forbidding them
    fill_fps = sum(_bloom_check_insert(arr, f"in{i}", bits, k)
                   for i in range(10_000))
    assert fill_fps < 100
    assert arr.nbytes == bits >> 3  # fixed memory after 10k inserts
    # re-probing any inserted key always hits (no false negatives)
    probe = arr.copy()
    assert all(_bloom_check_insert(probe, f"in{i}", bits, k)
               for i in range(0, 10_000, 97))
    # fresh keys: FP rate within 5x of the analytic 0.2%
    fps = sum(_bloom_check_insert(arr.copy(), f"out{i}", bits, k)
              for i in range(10_000))
    assert fps < 100  # < 1%


def test_bloom_fp_offline_reconciliation(spark, tmp_path):
    """A deliberately tiny filter forces false positives; the batch
    uniqueness pass reconciles them exactly: flagged = true-dups + FPs,
    and flagged - batch-exact-dups isolates the FPs (no true dup is
    ever missed)."""
    from sjot_spark.streaming.stateful import duplicate_stream

    keys1 = [f"k{i}" for i in range(40)]
    keys2 = [f"m{i}" for i in range(15)] + ["k3", "k17"]  # 2 true dups
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(k,) for k in keys1], "doc_id string") \
        .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame([(k,) for k in keys2], "doc_id string") \
        .coalesce(1).write.parquet(str(src / "f2"))

    sdf = (spark.readStream.schema("doc_id string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    dups = duplicate_stream(sdf, "doc_id", n_buckets=2,
                            state_mode="bloom", bloom_bits=64,
                            bloom_hashes=2)
    q = (dups.writeStream.format("memory").queryName("fpmem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    flagged = {r.key for r in spark.sql("select * from fpmem").collect()}

    # offline reconciliation: exact duplicates from the batch pass
    batch = spark.read.parquet(str(src / "*"))
    exact_dups = {
        r.doc_id for r in batch.groupBy("doc_id").count()
        .where(F.col("count") > 1).collect()
    }
    assert exact_dups == {"k3", "k17"}
    assert exact_dups <= flagged        # no false negatives, ever
    false_positives = flagged - exact_dups
    # 55 distinct keys vs 2x32-bit buckets: saturation makes FPs
    # certain; reconciliation identifies every one of them
    assert false_positives
    assert false_positives.isdisjoint(exact_dups)


def test_cms_kernel_upper_bound_and_fixed_state():
    """The count-min kernel never under-counts: after arbitrary
    interleaved inserts, every key's estimate >= its true insert
    count, and the state stays at exactly 4*width*depth bytes."""
    import numpy as np
    from sjot_spark.streaming.stateful import _cms_estimate_insert

    width, depth = 256, 3
    arr = np.zeros((depth, width), dtype=np.uint32)
    true_counts: dict[str, int] = {}
    # heavy collisions on purpose: 400 distinct keys into 256 slots
    for rep in range(3):
        for i in range(400):
            k = f"key{i}"
            est = _cms_estimate_insert(arr, k, width, depth)
            assert est >= true_counts.get(k, 0), (k, est)
            true_counts[k] = true_counts.get(k, 0) + 1
    assert arr.nbytes == 4 * width * depth
    # final estimates (peek = min over rows without insert) are still
    # upper bounds for every key
    probe = arr.copy()
    for k, c in true_counts.items():
        assert _cms_estimate_insert(probe, k, width, depth) >= c


def test_cms_duplicate_stream_estimates(spark, tmp_path):
    """state_mode='cms': every true duplicate is flagged and its
    n_prior is an upper-bound estimate of the true prior count
    (Verdict r5 #5 — replaces the bloom mode's n_prior=-1)."""
    from sjot_spark.streaming.stateful import duplicate_stream

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [("a",), ("b",), ("c",), ("a",)], "doc_id string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("c",), ("d",), ("a",)], "doc_id string"
    ).coalesce(1).write.parquet(str(src / "f2"))

    sdf = (spark.readStream.schema("doc_id string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    dups = duplicate_stream(sdf, "doc_id", n_buckets=4,
                            state_mode="cms", cms_width=1 << 10,
                            cms_depth=4)
    q = (dups.writeStream.format("memory").queryName("cmsmem")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from cmsmem").collect()
    # true prior counts at each flag event: a@batch1 row4 -> 1,
    # c@batch2 -> 1, a@batch2 -> 2
    flagged = sorted((r.key, r.n_prior) for r in rows)
    true_priors = [("a", 1), ("a", 2), ("c", 1)]
    assert [k for k, _ in flagged] == [k for k, _ in true_priors]
    for (k, est), (_, true_n) in zip(flagged, true_priors):
        assert est >= true_n, (k, est, true_n)
    # 1024 slots vs 5 distinct keys: no collision, estimates exact
    assert flagged == true_priors
