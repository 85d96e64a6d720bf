"""Training-shard assignment — split a curated corpus into N output
shards for training-data writing (every pre-training pipeline's last
step: the curated corpus is written as N shard files consumed by the
data loader; Megatron/T5-style pipelines shard by document hash so
any worker subset is a uniform corpus sample).

Assignment is pmod(md5(doc_id), n_shards) — deterministic,
engine-reproducible (the same md5-ppm discipline as
datapipe/mixing.py), and embarrassingly parallel: the assignment is a
pure projection fused with the scan, and the physical write is
``df.write.partitionBy("shard")`` (or repartition("shard") +
per-partition files; the manifest layer persists either). The
reference has no sharding analog — this extends the
training-data-pipeline surface (SURVEY §6); its validation cousin is
the partition-slice machinery (engine.py partition_by / manifest.py
pruned-slice scans): sharding is the WRITE-side of the same
partition-pruning contract.

Hash sharding is the scalable standard precisely because greedy
bin-packing by size is inherently sequential; its cost is residual
imbalance, which concentrates as 1/sqrt(tokens-per-shard) by the
CLT — at 100 TB / 10k shards each shard holds ~10^9 tokens and the
expected imbalance is a fraction of a permille. This module therefore
pairs the assignment with the VERIFICATION: per-shard token/doc
totals (one map-side-combined aggregate whose output is
|shards|-row tiny) and the max-vs-mean imbalance in integer permille,
so a pipeline can assert its shard balance before writing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sjot_spark.datapipe.dedup import _md5_int


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds the deterministic ``shard`` column (0..n_shards-1) —
    a pure projection, zero shuffle; feed it to
    ``write.partitionBy('shard')``."""
    return docs.withColumn(
        "shard",
        F.pmod(_md5_int(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("long"),
    )


def training_order(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Adds the deterministic (shard, order_key) pair that defines a
    pseudo-random global training order WITHOUT a global sort: the
    corpus order is (shard ASC, order_key ASC) where order_key =
    md5(salt#doc_id) — a data loader reading shard files in key
    order sees an md5-shuffled document sequence, reproducibly, on
    any cluster size (the Megatron/T5-style deterministic shuffle).
    ``salt`` re-deals the order between training runs (epoch seeds)
    without touching shard membership iff the caller keeps
    assignment and order salts separate — here the SAME salt feeds
    both, which re-deals shards too. Note (ADVICE r6): even salt=""
    hashes "#<id>" while :func:`assign_shards` hashes the bare id, so
    training_order's shard membership NEVER matches assign_shards';
    it is stable across runs for a fixed salt, nothing more.

    A pure projection (zero shuffle); the writer pays one
    repartition-by-shard — the shuffle any sharded write needs —
    and sorts WITHIN partitions only (:func:`write_training_shards`);
    nothing ever global-sorts."""
    key_src = F.concat(F.lit(salt), F.lit("#"),
                       F.col(id_col).cast("string"))
    return docs.select(
        "*",
        F.pmod(_md5_int(key_src), F.lit(n_shards)).cast("long")
        .alias("shard"),
        _md5_int(key_src, prefix="ord:").alias("order_key"),
    )


def write_training_shards(
    ordered: DataFrame, path: str, n_shards: int | None = None
) -> None:
    """Write the training corpus as shard=N parquet directories whose
    file row order IS the training order: partitions clustered on the
    shard column (repartition — the single shuffle any sharded write
    needs; two shards hashing to one task still split into their own
    directories, each internally ordered) and an in-partition sort by
    (shard, order_key) — no global sort, no driver involvement.
    Overwrite mode makes a retried write byte-stable (same keys, same
    order — replay idempotent, the incremental.py discipline).
    ``n_shards`` defaults to a distinct count when not given."""
    n = n_shards or ordered.select("shard").distinct().count()
    (ordered
     .repartition(max(int(n), 1), "shard")
     .sortWithinPartitions("shard", "order_key")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def shard_balance(
    sharded: DataFrame,
    ntok_col: str = "n_tok",
    extra_aggs: tuple = (),
) -> DataFrame:
    """Per-shard totals + the corpus-wide imbalance statistic:
    (shard, n_docs, tokens, *extras, imbalance_permille) where
    imbalance_permille = floor(1000 * (max_shard_tokens - mean)) /
    mean over ALL shards — the same value on every row, so the
    balance assertion reads any row. Integer end to end: mean is
    total div n_shards (floor), engine-exact.

    ``extra_aggs`` — additional ALIASED aggregate Columns folded into
    the same per-shard pass (single scan, no second aggregation), e.g.
    counting epoch-upsampled copies per shard."""
    per = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(ntok_col)).cast("long").alias("tokens"),
        *extra_aggs,
    )
    extra_names = per.columns[3:]
    # |shards|-row relation: the global stats join broadcasts
    glob = per.agg(
        F.max("tokens").alias("_mx"),
        F.sum("tokens").alias("_tot"),
        F.count(F.lit(1)).alias("_n"),
    ).select(
        "_mx",
        F.expr("_tot div _n").cast("long").alias("_mean"),
    )
    return (
        per.join(broadcast(glob))
        .select(
            "shard", "n_docs", "tokens", *extra_names,
            F.when(F.col("_mean") > 0,
                   F.expr("(1000 * (_mx - _mean)) div _mean"))
            .otherwise(F.lit(0)).cast("long")
            .alias("imbalance_permille"),
        )
    )
