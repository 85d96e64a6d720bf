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
