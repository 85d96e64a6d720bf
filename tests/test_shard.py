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
