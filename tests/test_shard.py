"""Training-shard assignment (sjot_spark/datapipe/shard.py):
deterministic md5 assignment, hand-computed imbalance statistic, and
the projection-only assignment plan."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import shard


def _shard_of(doc_id, n):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % n


@pytest.fixture(scope="module")
def dn(spark):
    return spark.createDataFrame(
        [(i, 10 + i) for i in range(40)], "doc_id int, n_tok long")


def test_assignment_deterministic(dn):
    got = {r.doc_id: r.shard for r in
           shard.assign_shards(dn, 4).collect()}
    assert got == {i: _shard_of(i, 4) for i in range(40)}


def test_balance_hand_computed(dn):
    rows = shard.shard_balance(shard.assign_shards(dn, 4)).collect()
    per = {}
    for i in range(40):
        s = _shard_of(i, 4)
        d, t = per.get(s, (0, 0))
        per[s] = (d + 1, t + 10 + i)
    assert {r.shard: (r.n_docs, r.tokens) for r in rows} == per
    toks = [t for _, t in per.values()]
    mean = sum(toks) // len(toks)
    want = (1000 * (max(toks) - mean)) // mean
    assert {r.imbalance_permille for r in rows} == {want}
    assert want > 0  # the fixture is deliberately imbalanced


def test_assignment_is_projection_only(dn):
    plan = shard.assign_shards(dn, 4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure projection, fused with scan


def test_balance_extra_aggs_single_pass(dn, spark):
    """extra_aggs fold into the SAME per-shard aggregation (one
    HashAggregate pair, no second scan) and surface between tokens
    and imbalance_permille."""
    sharded = shard.assign_shards(dn.withColumn(
        "flag", (F.col("doc_id") % 2 == 0).cast("long")), 4)
    out = shard.shard_balance(
        sharded, extra_aggs=(F.sum("flag").cast("long").alias("n_even"),))
    assert out.columns == [
        "shard", "n_docs", "tokens", "n_even", "imbalance_permille"]
    per = {}
    for i in range(40):
        s = _shard_of(i, 4)
        per[s] = per.get(s, 0) + (1 if i % 2 == 0 else 0)
    assert {r.shard: r.n_even for r in out.collect()} == per
    # the extra agg folds into the SAME per-shard Aggregate as
    # n_docs/tokens — one Aggregate carries all three functions (the
    # subtree also prints a second, column-PRUNED copy feeding the
    # global stats, which Catalyst narrows to sum(n_tok) alone)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert any(
        "Aggregate [shard" in line and "count(1)" in line
        and "sum(flag" in line and "sum(n_tok" in line
        for line in plan.splitlines()), plan


def test_epoch_copies_spread_across_shards(spark):
    """Sharding the epoch corpus by doc_id#epoch must SPREAD a
    document's copies over shards; hashing bare doc_id would stack
    them. Hand-computed md5 check on a 4-copy doc."""
    copies = spark.createDataFrame(
        [(7, 25, e) for e in range(4)] + [(9, 10, 0)],
        "doc_id int, n_tok long, epoch int")
    keyed = copies.select(
        "*", F.concat_ws("#", F.col("doc_id").cast("string"),
                         F.col("epoch").cast("string")).alias("copy_key"))
    got = {(r.doc_id, r.epoch): r.shard for r in
           shard.assign_shards(keyed, 16, id_col="copy_key").collect()}
    want = {(d, e): _shard_of(f"{d}#{e}", 16)
            for (d, e) in [(7, 0), (7, 1), (7, 2), (7, 3), (9, 0)]}
    assert got == want
    assert len({got[(7, e)] for e in range(4)}) > 1  # actually spread


def test_training_order_keys_hand_computed(dn):
    """shard and order_key are exactly the salted md5 values, and
    the two hashes are independent (different prefixes)."""
    got = {r.doc_id: (r.shard, r.order_key) for r in
           shard.training_order(dn, 8, salt="r6").collect()}
    for i in range(40):
        want_shard = _shard_of(f"r6#{i}", 8)
        want_key = int(hashlib.md5(
            f"ord:r6#{i}".encode()).hexdigest()[:15], 16)
        assert got[i] == (want_shard, want_key), i


def test_training_order_is_projection_only(dn):
    plan = shard.training_order(dn, 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_write_training_shards_file_order(dn, spark, tmp_path):
    """The written shard files ARE the training order: every parquet
    file within each shard=N directory is monotonically increasing
    in order_key, and a re-write (replay) reproduces the same keys
    in the same order."""
    import glob as _glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "shards")
    ordered = shard.training_order(dn, 4, salt="s")
    shard.write_training_shards(ordered, path, n_shards=4)

    def read_orders(p):
        out = {}
        for f in sorted(_glob.glob(f"{p}/shard=*/*.parquet")):
            sh = int(f.split("shard=")[1].split("/")[0])
            keys = pq.read_table(f, columns=["order_key"]) \
                .column("order_key").to_pylist()
            out.setdefault(sh, []).extend(keys)
        return out

    first = read_orders(path)
    assert set(first) == {0, 1, 2, 3}
    for sh, keys in first.items():
        assert keys == sorted(keys), f"shard {sh} not in training order"
    assert sum(len(k) for k in first.values()) == 40
    # replay: overwrite produces the identical order
    shard.write_training_shards(ordered, path, n_shards=4)
    assert read_orders(path) == first
