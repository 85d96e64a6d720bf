"""Custom stateful streaming operator: CROSS-BATCH key-uniqueness via
applyInPandasWithState.

Within-batch duplicate detection needs no state (the batch engine's
uniqueness agg covers it, see streaming.stream.run_foreach_batch);
detecting a doc_id that re-appears in a LATER micro-batch requires
keyed state. Keys are hash-bucketed so state parallelism and shuffle
keying are stable regardless of key cardinality, and each bucket's
state holds the set of keys seen so far.

Scale note: per-bucket exact sets bound memory at (distinct keys /
n_buckets); for 10^12-key streams swap the exact set for a serialized
Bloom filter in the same state slot (one-line kernel change — the
operator shape, shuffle, and state plumbing are identical), trading
exactness for fixed memory, and reconcile exactly offline with the
batch uniqueness pass.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_prior long"
STATE_SCHEMA = "seen array<string>"


def duplicate_stream(
    sdf: DataFrame, key_col: str, n_buckets: int = 64
) -> DataFrame:
    """Streaming DataFrame of keys that were already seen in an
    EARLIER micro-batch (or earlier in the same batch), with how many
    times they had been seen before."""

    def detect(
        bucket, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: dict[str, int] = {}
        if state.exists:
            (prior,) = state.get
            # state stores "key\x00count" packed strings
            for packed in prior:
                k, _, c = packed.rpartition("\x00")
                seen[k] = int(c)
        dup_keys, dup_prior = [], []
        for pdf in pdfs:
            for k in pdf[key_col].astype(str):
                n = seen.get(k, 0)
                if n:
                    dup_keys.append(k)
                    dup_prior.append(n)
                seen[k] = n + 1
        state.update(([f"{k}\x00{c}" for k, c in seen.items()],))
        yield pd.DataFrame({"key": dup_keys, "n_prior": dup_prior})

    # null keys are not comparable identities (pandas astype(str) would
    # fold them into the literal 'None'); presence checks own nulls
    bucketed = sdf.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias(key_col),
        F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).alias("bucket"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = ("user_id long, session_start_ms long, "
                         "session_end_ms long, n_events long")
SESSION_STATE_SCHEMA = ("starts array<long>, ends array<long>, "
                        "ns array<long>")


def session_stream(
    sdf: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization with EVENT-TIME TIMEOUT — the
    streaming twin of the batch `sessionization` query (same gap
    rule): events for a user belong to one session while consecutive
    gaps stay under ``gap_minutes``.

    State per key is the LIST of open sessions — every session whose
    gap horizon (end + gap) the watermark has not yet passed. Holding
    a list (not a single open triple) is what makes cross-batch late
    data correct: an event above the watermark but older than the
    newest session may extend/merge ANY still-open session or open a
    new earlier one, exactly as batch sessionization over the same
    events would (r4; the single-triple r3 state either absorbed such
    events silently or fragmented sessions the batch twin merges).
    Each batch merges new events into the open set (standard interval
    merge under the gap rule), emits every session whose horizon is
    behind the watermark, and keeps the rest. Emission therefore
    follows the watermark — the same append-mode discipline as
    Spark's built-in session windows: a session is final only once no
    on-time event can still extend it.

    State is O(open sessions per key) ≤ 1 + watermark_delay/gap —
    bounded by the lateness horizon, independent of stream length.
    Timestamps are epoch millis (exact longs, no tz coupling)."""
    from typing import Iterator as _Iter

    gap_ms = gap_minutes * 60_000

    def _emit_due(sessions: list, wm: int):
        due = [s for s in sessions if s[1] + gap_ms <= wm]
        kept = [s for s in sessions if s[1] + gap_ms > wm]
        return due, kept

    def _frame(uid, due: list) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": [uid] * len(due),
            "session_start_ms": [s[0] for s in due],
            "session_end_ms": [s[1] for s in due],
            "n_events": [s[2] for s in due]})

    def _save(state: GroupState, kept: list, had_state: bool) -> None:
        if kept:
            state.update(([s[0] for s in kept], [s[1] for s in kept],
                          [s[2] for s in kept]))
            # horizons of kept sessions are > wm by construction, so
            # the min is a legal timeout timestamp
            state.setTimeoutTimestamp(min(s[1] for s in kept) + gap_ms)
        elif had_state:
            state.remove()

    def fn(
        key, pdfs: _Iter[pd.DataFrame], state: GroupState
    ) -> _Iter[pd.DataFrame]:
        (uid,) = key
        had = state.exists
        sessions: list[tuple[int, int, int]] = []
        if had:
            starts, ends, ns = state.get
            sessions = [(int(s), int(e), int(c))
                        for s, e, c in zip(starts, ends, ns)]
        if state.hasTimedOut:
            due, kept = _emit_due(sessions, state.getCurrentWatermarkMs())
            _save(state, kept, had)
            yield _frame(uid, due)
            return
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["_ts_ms"])
        # interval merge under the gap rule: open sessions are
        # disjoint and events are points; fold the start-sorted union
        merged: list[tuple[int, int, int]] = []
        for s, e, c in sorted(sessions + [(t, t, 1) for t in ts_all]):
            if merged and s - merged[-1][1] <= gap_ms:
                ps, pe, pc = merged[-1]
                merged[-1] = (ps, max(pe, e), pc + c)
            else:
                merged.append((s, e, c))
        due, kept = _emit_due(merged, state.getCurrentWatermarkMs())
        _save(state, kept, had)
        yield _frame(uid, due)

    prepped = (
        sdf.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col),
            (F.unix_millis(F.col(ts_col))).alias("_ts_ms"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
