"""Census drift between corpus snapshots
(sjot_spark/datapipe/censusdrift.py): hand-computed share/L1 math,
cut interaction, blank-snapshot edges, and the bounded-relation plan
shape (broadcast joins only; the corpus never shuffles past the
census aggregates)."""

import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import censusdrift, surprisal

PPM = 1_000_000


@pytest.fixture(scope="module")
def snaps(spark):
    # snapshot A: 10 tokens total — a:5 b:3 c:2
    # snapshot B: 8 tokens total  — a:4 c:2 d:2 (b vanished, d new)
    a = spark.createDataFrame(
        [(1, "a a a b b"), (2, "a a b c c")], "doc_id int, text string")
    b = spark.createDataFrame(
        [(3, "a a c d"), (4, "a a c d")], "doc_id int, text string")
    return a, b


def _drift(spark, a, b, max_vocab=300):
    return censusdrift.census_drift(
        surprisal.token_census(a, "text", max_vocab=max_vocab),
        censusdrift.census_totals(a, "text"),
        surprisal.token_census(b, "text", max_vocab=max_vocab),
        censusdrift.census_totals(b, "text"),
    )


def test_drift_hand_computed(spark, snaps):
    a, b = snaps
    rows = {r.token: r for r in _drift(spark, a, b).collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    # shares: exact floor(cnt*1e6/total)
    assert (rows["a"].ppm_a, rows["a"].ppm_b) == (
        5 * PPM // 10, 4 * PPM // 8)
    assert rows["a"].delta_ppm == 0  # 50% in both
    assert (rows["b"].cnt_b, rows["b"].ppm_b) == (0, 0)
    assert rows["b"].delta_ppm == 3 * PPM // 10  # vanished token
    assert rows["d"].delta_ppm == 2 * PPM // 8   # new token
    assert rows["c"].delta_ppm == abs(2 * PPM // 10 - 2 * PPM // 8)


def test_drift_stats_hand_computed(spark, snaps):
    a, b = snaps
    s = censusdrift.census_drift_stats(_drift(spark, a, b)).collect()[0]
    assert (s.n_shared, s.n_only_a, s.n_only_b) == (2, 1, 1)
    want_l1 = (0 + 3 * PPM // 10 + 2 * PPM // 8
               + abs(2 * PPM // 10 - 2 * PPM // 8))
    assert s.l1_ppm == want_l1
    assert s.max_delta_ppm == 3 * PPM // 10


def test_identical_snapshots_zero_drift(spark, snaps):
    a, _ = snaps
    s = censusdrift.census_drift_stats(_drift(spark, a, a)).collect()[0]
    assert (s.l1_ppm, s.max_delta_ppm, s.n_only_a, s.n_only_b) == (
        0, 0, 0, 0)


def test_census_cut_outside_tokens_count_zero(spark, snaps):
    """A token outside one snapshot's top-k cut counts 0 there even
    though it exists in that corpus — its full other-side share is
    drift (the surge signal)."""
    a, b = snaps
    # cut A to top-1 (a:5) but leave B wide; c falls outside A's
    # census while still present in A's corpus
    drift = censusdrift.census_drift(
        surprisal.token_census(a, "text", max_vocab=1),
        censusdrift.census_totals(a, "text"),
        surprisal.token_census(b, "text", max_vocab=300),
        censusdrift.census_totals(b, "text"),
    )
    rows = {r.token: r for r in drift.collect()}
    assert rows["c"].cnt_a == 0 and rows["c"].ppm_a == 0
    assert rows["c"].delta_ppm == 2 * PPM // 8
    # but shares still use FULL totals: a keeps 5/10 not 5/5
    assert rows["a"].ppm_a == 5 * PPM // 10


def test_blank_snapshot_edges(spark, snaps):
    a, _ = snaps
    blank = spark.createDataFrame(
        [(9, "   "), (10, "")], "doc_id int, text string")
    rows = _drift(spark, a, blank).collect()
    assert {r.token for r in rows} == {"a", "b", "c"}
    assert all(r.cnt_b == 0 and r.ppm_b == 0 for r in rows)


def test_drift_plan_broadcast_only(spark, snaps):
    """Census-vs-census comparison must never sort-merge: both
    totals and the opposite census join broadcast (bounded
    relations)."""
    a, b = snaps
    plan = _drift(spark, a, b)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
