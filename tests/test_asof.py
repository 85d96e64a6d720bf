"""As-of join (plan/asof.py): semantics + plan shape."""

from pyspark.sql import functions as F

from sjot_spark.plan.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, ts long, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts long, val long")
    out = asof_join(left, right, on="k", ts="ts", value_cols=["val"],
                    left_cols=["k", "ts", "lid"])
    return {(r.lid): r.val for r in out.collect()}


def test_backward_match_and_ties(spark):
    got = _run(
        spark,
        [(1, 10, 100), (1, 20, 101), (1, 5, 102), (2, 10, 103)],
        [(1, 10, 7), (1, 15, 8), (2, 30, 9)],
    )
    # lid 100 at ts=10: right row at ts=10 matches (<= convention);
    # lid 101 at ts=20 sees the ts=15 update; lid 102 precedes all
    # right rows; key 2 has no right row at or before ts=10
    assert got == {100: 7, 101: 8, 102: None, 103: None}


def test_carry_forward_across_many_left_rows(spark):
    got = _run(
        spark,
        [(1, t, t) for t in range(1, 8)],
        [(1, 2, 20), (1, 5, 50)],
    )
    assert got == {1: None, 2: 20, 3: 20, 4: 20, 5: 50, 6: 50, 7: 50}


def test_plan_is_single_shuffle_no_join(spark):
    left = spark.createDataFrame([(1, 10, 1)], "k long, ts long, lid long")
    right = spark.createDataFrame([(1, 5, 2)], "k long, ts long, val long")
    plan = (asof_join(left, right, on="k", ts="ts", value_cols=["val"],
                      left_cols=["k", "ts", "lid"])
            ._jdf.queryExecution().executedPlan().toString())
    # union-sort formulation: one hash exchange on the key, a window,
    # and NO join operator of any kind
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
