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
SESSION_STATE_SCHEMA = "start long, end long, n long"


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
    gaps stay under ``gap_minutes``; a session is emitted when it
    CLOSES, either because a later event in the same key opens the
    next session, or because the watermark passes session_end + gap
    (GroupStateTimeout.EventTimeTimeout — no more on-time events can
    extend it). State per key is one open (start, end, n) triple —
    O(active users), independent of stream length. Timestamps are
    epoch millis (exact longs, no tz coupling)."""
    from typing import Iterator as _Iter

    gap_ms = gap_minutes * 60_000

    def fn(
        key, pdfs: _Iter[pd.DataFrame], state: GroupState
    ) -> _Iter[pd.DataFrame]:
        (uid,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [uid], "session_start_ms": [start],
                "session_end_ms": [end], "n_events": [n]})
            return
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["_ts_ms"])
        ts_all.sort()
        closed_s, closed_e, closed_n = [], [], []
        if state.exists:
            start, end, n = state.get
            # cross-batch late events OLDER than the open session's
            # start must not be absorbed silently (they'd leave
            # session_start_ms wrong — batch parity): sessionize them
            # on their own; the trailing pre-session merges into the
            # open session (lowering its start) only when it is
            # within gap of it, otherwise it closes as its own
            # earlier session, exactly as the batch twin would
            before = [t for t in ts_all if t < start]
            ts_all = [t for t in ts_all if t >= start]
            if before:
                s0 = e0 = before[0]
                c0 = 1
                for t in before[1:]:
                    if t - e0 > gap_ms:
                        closed_s.append(s0)
                        closed_e.append(e0)
                        closed_n.append(c0)
                        s0, e0, c0 = t, t, 1
                    else:
                        e0, c0 = t, c0 + 1
                if start - e0 <= gap_ms:
                    start, n = s0, n + c0
                else:
                    closed_s.append(s0)
                    closed_e.append(e0)
                    closed_n.append(c0)
        else:
            start, end, n = ts_all[0], ts_all[0], 0
        for t in ts_all:
            if t - end > gap_ms:
                closed_s.append(start)
                closed_e.append(end)
                closed_n.append(n)
                start, end, n = t, t, 1
            else:
                end, n = max(end, t), n + 1
        wm = state.getCurrentWatermarkMs()
        if end + gap_ms <= wm:
            # the open session's horizon is already behind the
            # watermark — no on-time event can extend it; close now
            # (setTimeoutTimestamp below the watermark is an error)
            closed_s.append(start)
            closed_e.append(end)
            closed_n.append(n)
            if state.exists:
                state.remove()
        else:
            state.update((start, end, n))
            state.setTimeoutTimestamp(end + gap_ms)
        yield pd.DataFrame({
            "user_id": [uid] * len(closed_s),
            "session_start_ms": closed_s,
            "session_end_ms": closed_e,
            "n_events": closed_n})

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
