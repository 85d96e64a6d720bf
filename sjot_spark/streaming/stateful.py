"""Custom stateful streaming operator: CROSS-BATCH key-uniqueness via
applyInPandasWithState.

Within-batch duplicate detection needs no state (the batch engine's
uniqueness agg covers it, see streaming.stream.run_foreach_batch);
detecting a doc_id that re-appears in a LATER micro-batch requires
keyed state. Keys are hash-bucketed so state parallelism and shuffle
keying are stable regardless of key cardinality, and each bucket's
state holds the set of keys seen so far.

Scale note: per-bucket exact sets bound memory at (distinct keys /
n_buckets); for 10^12-key streams pass ``state_mode="bloom"`` — the
same state slot holds a serialized Bloom filter (fixed
``bloom_bits/8`` bytes per bucket regardless of key count), trading
exactness for bounded memory. The Bloom variant never misses a true
duplicate (no false negatives); false positives are reconciled
exactly offline with the batch uniqueness pass
(engine._unique_violations over the sink): FP = flagged − exact-dups.
``state_mode="cms"`` keeps a fixed-size count-min sketch instead,
restoring a per-key ``n_prior`` as an upper-bound ESTIMATE (never an
undercount) at 32× the state bits per slot.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_prior long"
STATE_SCHEMA = "seen array<string>"
BLOOM_STATE_SCHEMA = "filter binary"
CMS_STATE_SCHEMA = "sketch binary"


def _bloom_offsets(key: str, bits: int, k: int) -> list[int]:
    """Kirsch-Mitzenmacher double hashing: k bit offsets from one md5.
    Deterministic across processes (no PYTHONHASHSEED coupling). The
    stride is forced odd so it is coprime with power-of-two ``bits``
    and the k probes never collapse onto one bit."""
    d = hashlib.md5(key.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return [(h1 + i * h2) % bits for i in range(k)]


def _bloom_check_insert(
    arr: np.ndarray, key: str, bits: int, k: int
) -> bool:
    """True iff every probe bit was ALREADY set (key probably seen);
    always leaves all probe bits set afterwards. ``arr`` is the
    bits/8-byte filter, mutated in place."""
    hit = True
    for off in _bloom_offsets(key, bits, k):
        byte, mask = off >> 3, 1 << (off & 7)
        if not (arr[byte] & mask):
            hit = False
            arr[byte] |= mask
    return hit


def duplicate_stream(
    sdf: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    state_mode: str = "exact",
    bloom_bits: int = 1 << 26,
    bloom_hashes: int = 7,
    cms_width: int = 1 << 22,
    cms_depth: int = 4,
) -> DataFrame:
    """Streaming DataFrame of keys that were already seen in an
    EARLIER micro-batch (or earlier in the same batch), with how many
    times they had been seen before.

    ``state_mode="exact"`` keeps a per-bucket key->count dict (exact
    ``n_prior``, state grows with distinct keys). ``state_mode="bloom"``
    keeps a fixed-size Bloom filter per bucket: flagged rows carry
    ``n_prior = -1`` ("seen before, count unknown"), true duplicates
    are never missed, and a false-positive rate of roughly
    ``(1 - e^(-k*n/m))^k`` (n keys per bucket, m = bloom_bits,
    k = bloom_hashes; default m = 2^26 bits = 8 MiB per bucket with
    k = 7 gives ≈ 1e-7 at n = 1M keys per bucket) applies — reconcile
    exactly offline against the batch uniqueness pass. CHANGELOG
    (ADVICE r6): the bloom_bits default grew 1<<23 -> 1<<26 in round 6
    (1 MiB -> 8 MiB per bucket, ~512 MiB total state at the default 64
    buckets) to match the documented FP target; pass bloom_bits=1<<23
    to keep the old state-store footprint.
    ``state_mode="cms"`` keeps a conservative-update count-min sketch
    per bucket (fixed ``cms_width × cms_depth`` uint32 counters =
    ``4 * width * depth`` bytes; default 2^22 × 4 = 64 MiB PER BUCKET,
    so budget ``4 * width * depth * n_buckets`` bytes of executor
    state — 2 GiB at the defaults with n_buckets=32): flagged
    rows carry ``n_prior`` as an UPPER-BOUND estimate of the true
    prior count (CMS never under-counts), still with no false
    negatives. Flag false positives occur when every row's counter is
    already nonzero, ≈ ``(1 - e^(-n/width))^depth`` for n distinct
    keys per bucket — an idealized independent-row figure: the depth
    rows share one md5 via double hashing (offsets h1 + i*h2), so two
    keys colliding in (h1 mod width, h2 mod width) collide in EVERY
    row and the realized rate is somewhat higher for depth > 2 (the
    upper-bound / no-false-negative invariants are unaffected).
    Counters cost 32× the bits of a Bloom filter at
    equal slots, so use cms only when the count estimate matters."""
    if state_mode not in ("exact", "bloom", "cms"):
        raise ValueError(
            f"state_mode must be exact|bloom|cms, got {state_mode!r}")
    if state_mode == "bloom":
        return _duplicate_stream_bloom(
            sdf, key_col, n_buckets, bloom_bits, bloom_hashes)
    if state_mode == "cms":
        return _duplicate_stream_cms(
            sdf, key_col, n_buckets, cms_width, cms_depth)

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


def _duplicate_stream_bloom(
    sdf: DataFrame, key_col: str, n_buckets: int,
    bloom_bits: int, bloom_hashes: int,
) -> DataFrame:
    """Bloom-state twin of duplicate_stream: same shuffle keying and
    output schema, state fixed at bloom_bits/8 bytes per bucket."""
    if bloom_bits & (bloom_bits - 1):
        raise ValueError("bloom_bits must be a power of two")
    n_bytes = bloom_bits >> 3

    def detect(
        bucket, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (buf,) = state.get
            arr = np.frombuffer(buf, dtype=np.uint8).copy()
        else:
            arr = np.zeros(n_bytes, dtype=np.uint8)
        flagged: list[str] = []
        for pdf in pdfs:
            for k in pdf[key_col].astype(str):
                if _bloom_check_insert(arr, k, bloom_bits, bloom_hashes):
                    flagged.append(k)
        state.update((arr.tobytes(),))
        yield pd.DataFrame(
            {"key": flagged, "n_prior": [-1] * len(flagged)})

    bucketed = sdf.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias(key_col),
        F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).alias("bucket"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _cms_estimate_insert(
    arr: np.ndarray, key: str, width: int, depth: int
) -> int:
    """Count-min estimate of the key's PRIOR insert count, then insert.

    ``arr`` is the (depth, width) uint32 counter matrix, mutated in
    place. The estimate (min over rows of the row's counter) is an
    upper bound on the true prior count — CMS counters only ever
    absorb extra increments from colliding keys, never lose their
    own. Insertion is conservative-update (Estan & Varghese 2002):
    only counters equal to the minimum are raised to ``est + 1``,
    which tightens future estimates while preserving the upper-bound
    invariant. Counters saturate at uint32 max instead of wrapping."""
    offs = _bloom_offsets(key, width, depth)
    vals = [int(arr[i, off]) for i, off in enumerate(offs)]
    est = min(vals)
    if est < 0xFFFFFFFF:
        for i, off in enumerate(offs):
            if vals[i] == est:
                arr[i, off] = est + 1
    return est


def _duplicate_stream_cms(
    sdf: DataFrame, key_col: str, n_buckets: int,
    width: int, depth: int,
) -> DataFrame:
    """Count-min-sketch twin of duplicate_stream: same shuffle keying
    and output schema, state fixed at 4*width*depth bytes per bucket,
    flagged rows carry an upper-bound ``n_prior`` estimate."""
    if width & (width - 1):
        raise ValueError("cms_width must be a power of two")
    if depth < 1:
        raise ValueError("cms_depth must be >= 1")

    def detect(
        bucket, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (buf,) = state.get
            arr = np.frombuffer(buf, dtype=np.uint32).reshape(
                depth, width).copy()
        else:
            arr = np.zeros((depth, width), dtype=np.uint32)
        keys, priors = [], []
        for pdf in pdfs:
            for k in pdf[key_col].astype(str):
                est = _cms_estimate_insert(arr, k, width, depth)
                if est:
                    keys.append(k)
                    priors.append(est)
        state.update((arr.tobytes(),))
        yield pd.DataFrame({"key": keys, "n_prior": priors})

    bucketed = sdf.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias(key_col),
        F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).alias("bucket"),
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=CMS_STATE_SCHEMA,
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
