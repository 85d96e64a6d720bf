"""Physical-plan shape assertions — locks in the scale properties the
engine is designed around (SURVEY.md §4). If a refactor introduces a
shuffle into the row-check pass or turns the dim join into a
sort-merge join, these fail."""

import pytest

from pyspark.sql import functions as F

from sjot_spark.engine import ValidationEngine
from sjot_spark.fixtures import (
    SEQUENCE_SPEC, make_allowed_sources, make_sequences,
)


@pytest.fixture(scope="module")
def plans(spark):
    df = make_sequences(spark, 200, violations=True)
    eng = ValidationEngine(SEQUENCE_SPEC)
    res = eng.run(df, dims={"allowed_sources": make_allowed_sources(spark)},
                  persist_violations=False)
    comp = eng.compile(df)
    flags_plan = res.flags._jdf.queryExecution().executedPlan().toString()
    row_viol = eng._row_violations(df, comp, "doc_id", F.col("source"))
    rv_plan = row_viol._jdf.queryExecution().executedPlan().toString()
    ref_plan = eng._ref_violations(
        df, make_allowed_sources(spark), eng.spec.table.refs[0],
        "doc_id", F.col("source"),
    )._jdf.queryExecution().executedPlan().toString()
    uniq_plan = eng._unique_violations(
        df, F.col("source"))._jdf.queryExecution().executedPlan().toString()
    viol_plan = res.violations._jdf.queryExecution() \
        .executedPlan().toString()
    return {"flags": flags_plan, "row_viol": rv_plan,
            "ref": ref_plan, "uniq": uniq_plan, "viol": viol_plan}


def test_row_checks_are_shuffle_free(plans):
    # the validation scan must be a pure projection pipeline
    assert "Exchange" not in plans["flags"]
    assert "Exchange" not in plans["row_viol"]


def test_element_range_uses_minmax_fast_path(plans):
    # the token element-range check must compile to array_min/array_max
    # bounds (codegen-friendly specialized ops), not a per-element
    # forall lambda (higher-order functions force interpreted eval)
    assert "array_min" in plans["flags"] and "array_max" in plans["flags"]
    assert "forall" not in plans["flags"]


def test_ref_integrity_is_broadcast_anti_join(plans):
    assert "BroadcastHashJoin" in plans["ref"]
    assert "LeftAnti" in plans["ref"]
    assert "SortMergeJoin" not in plans["ref"]
    # the fact (streamed) side must not be exchanged: any hash
    # exchange may only appear inside the broadcast (build) subtree,
    # which is printed after the BroadcastExchange line
    lines = plans["ref"].splitlines()
    bcast_at = next(i for i, l in enumerate(lines) if "BroadcastExchange" in l)
    fact_exchanges = [
        l for l in lines[:bcast_at] if "Exchange" in l and "Broadcast" not in l
    ]
    assert not fact_exchanges, fact_exchanges


def test_run_fuses_ref_check_into_row_scan(plans):
    """run() evaluates referential integrity as a broadcast LEFT join
    membership flag INSIDE the row-check scan (r7: one less scan of
    the input than the standalone anti-join operator). The fact side
    must still never shuffle: the only Exchange in the whole
    violations union apart from the broadcast build sides is the
    uniqueness aggregation's hash exchange."""
    assert "BroadcastHashJoin" in plans["viol"]
    assert "LeftOuter" in plans["viol"]
    assert "SortMergeJoin" not in plans["viol"]
    # the only hash exchanges in the whole violations union: the
    # uniqueness aggregation, plus the 8-row dim .distinct() inside
    # the broadcast build side — the fact side itself never shuffles
    shuffles = [
        l for l in plans["viol"].splitlines()
        if "Exchange hashpartitioning" in l
    ]
    assert len(shuffles) <= 2, shuffles


def test_uniqueness_has_partial_aggregation(plans):
    # map-side combine before the shuffle (partial_count), then one
    # hash exchange on the key
    assert "partial_count" in plans["uniq"] or "partial" in plans["uniq"]
    assert plans["uniq"].count("Exchange hashpartitioning") <= 2


def test_filters_and_projection_reach_the_scan(spark, tmp_path):
    """Predicate pushdown + column pruning must reach the parquet scan
    (PushedFilters / ReadSchema) — free from Catalyst because every
    query is declarative."""
    from sjot_spark.queries import q_tpch_q6

    plan = q_tpch_q6(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual" in plan
    # projection pruned: the scan must not read all 11 lineitem columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in scan"
    read_cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(read_cols) <= {"l_shipdate", "l_discount", "l_quantity",
                              "l_extendedprice"}, read_cols


def test_checkpointed_slice_is_partition_pruned(spark, tmp_path):
    """The per-partition slice of a checkpointed run
    (manifest.run_checkpointed: df.where(part == v)) must reach the
    scan as a PartitionFilter when the source layout is partitioned by
    the partition column — otherwise every slice is a full re-scan and
    a P-partition run reads the table P times (SCALING.md)."""
    src = str(tmp_path / "part_src")
    make_sequences(spark, 400, violations=False).write \
        .partitionBy("source").mode("overwrite").parquet(src)
    df = spark.read.parquet(src)
    some_source = df.select("source").first()[0]
    plan = (df.where(F.col("source") == some_source)
            ._jdf.queryExecution().executedPlan().toString())
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, f"no PartitionFilters in slice plan:\n{plan}"
    filters = pf[1].split("]")[0]
    assert "source" in filters, filters
    # and the data filter must NOT degrade to a post-scan Filter node
    # over the partition column
    assert f"PushedFilters: []" in plan or "source" not in \
        plan.split("PushedFilters: [", 1)[1].split("]")[0]


def test_bucketed_table_makes_uniqueness_shuffle_free(spark, tmp_path):
    """SCALING.md claim: on a table bucketed by the key, the exact-
    uniqueness aggregation (the system's ONLY full-width shuffle)
    needs no Exchange at all — the bucketed scan already co-locates
    keys."""
    from sjot_spark.fixtures import make_sequences

    spark.sql("DROP TABLE IF EXISTS seq_bucketed_test")
    make_sequences(spark, 1000, violations=False).write \
        .bucketBy(8, "doc_id").sortBy("doc_id") \
        .mode("overwrite").saveAsTable("seq_bucketed_test")
    t = spark.table("seq_bucketed_test")
    plan = (t.groupBy("doc_id").count()
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan
    spark.sql("DROP TABLE IF EXISTS seq_bucketed_test")


def test_ivf_assignment_is_shuffle_free(spark):
    """IVF cell assignment must be a pure projection over literal
    centroids — no Exchange, no Window, no Join in the corpus subtree
    (round-2 finding: a Window.partitionBy(id) argmax forced a
    full-corpus shuffle on real sources). The full hash-seeded
    pipeline may shuffle exactly once: the final per-query top-k over
    the pruned candidate set."""
    from sjot_spark.datapipe.ivf import (
        _assign_cell, _seed_lits, ann_ivf_hashseed, collect_hash_seeds,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = _seed_lits(collect_hash_seeds(emb, "vec_id", "embedding", 8),
                       cast_type=dict(emb.dtypes)["embedding"])
    assigned = emb.select(
        "vec_id", "embedding",
        _assign_cell(F.col("embedding"), seeds).alias("cell"))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Window" not in plan and "Join" not in plan, plan

    full = ann_ivf_hashseed(emb, "vec_id", "embedding", [0, 1, 2],
                            k=5, nlist=8, nprobe=3)
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert fplan.count("Exchange hashpartitioning") == 1, fplan
    assert "BroadcastHashJoin" in fplan, fplan


def test_element_null_scan_elided_when_schema_guarantees(spark):
    """containsNull=False (Iceberg `element: required` analog) must
    compile the token element check WITHOUT the null-scan traversal
    (array_compact) — measured at ~2x the min/max cost otherwise."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType(),
                                            containsNull=False)),
    ])
    df = spark.createDataFrame([("d1", [1, 2, 3])], schema)
    eng = ValidationEngine({"@root": "#T",
                            "T": {"doc_id": "string",
                                  "tokens": "0..50256[1,8192]"},
                            "@table": {"key": "doc_id"}})
    plan = eng._flags_df(df, eng.compile(df)) \
        ._jdf.queryExecution().executedPlan().toString()
    # Catalyst rewrites array_compact to filter(..., isnotnull(lambda))
    # in optimized plans, so assert on the rewritten form
    assert "isnotnull(lambda" not in plan
    assert "array_compact" not in plan
    assert "array_min" in plan and "array_max" in plan
    # and with the default containsNull=True the null scan is present
    df2 = spark.createDataFrame([("d1", [1, 2, 3])],
                                "doc_id string, tokens array<int>")
    eng2 = ValidationEngine({"@root": "#T",
                             "T": {"doc_id": "string",
                                   "tokens": "0..50256[1,8192]"},
                             "@table": {"key": "doc_id"}})
    plan2 = eng2._flags_df(df2, eng2.compile(df2)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(lambda" in plan2 or "array_compact" in plan2


def test_json_validation_is_shuffle_free(spark):
    """validate_json_column must compile to ONE projection pipeline:
    variant parse + all runtime-type checks + filter-before-explode,
    no Exchange anywhere (jsonvalidate.py design contract)."""
    from sjot_spark.jsonvalidate import validate_json_column
    from sjot_spark.queries import JSON_DOC_SPEC

    df = spark.createDataFrame(
        [(1, '{"id":1,"val":3,"tag":"t1","meta":{"w":2}}')],
        "doc_id long, doc string")
    plan = (validate_json_column(df, "doc", JSON_DOC_SPEC, key="doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    # one pipeline, not a join of per-check subplans
    assert "Join" not in plan
    # the check set (CodegenFallback variant exprs, un-CSE-able) must
    # be evaluated in EXACTLY ONE operator: any Filter/scan pushdown
    # copy re-runs every variant chain per row (measured 2-4x slower)
    ops_with_parse = {
        line.split("[")[0].strip()
        for line in plan.splitlines() if "parseJson" in line
    }
    assert all(op.endswith("Project") for op in ops_with_parse), ops_with_parse
    assert len(ops_with_parse) <= 1, ops_with_parse


def test_bpe_fold_runs_once_per_word_type(spark):
    """bpe_tokenize_stats plan contract: the merge-table fold (the
    expensive per-token expression) must appear in exactly ONE
    operator, evaluated AFTER the (source, word) aggregation — i.e.
    once per word TYPE, never per occurrence. A plain explode lets
    Catalyst push its size()>0 pre-filter below the groupBy and
    re-evaluate the fold per occurrence (the shape this test bans)."""
    from sjot_spark.queries import QUERIES

    df = QUERIES["bpe_tokenize_stats"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate([") == 1, plan
    phys = df._jdf.queryExecution().executedPlan().toString()
    # the fold must live in the Generate above the word-type agg, and
    # nothing below the first HashAggregate may mention it
    below_first_agg = phys.split("HashAggregate")[-1]
    assert "aggregate([" not in below_first_agg


def test_repetition_arrays_staged_once(spark):
    """repetition_stats plan contract: the token split and the sorted
    bigram build — the two heavy array expressions — must each appear
    exactly ONCE in the optimized plan, i.e. stay materialized in
    their staging projections. CollapseProject only inlines an alias
    that is cheap or referenced once; if a refactor drops the
    reference count of either staged array to one, the array gets
    re-inlined into the fold lambdas and the per-element
    re-evaluation blowup returns (measured 54 s vs ~1 s at sf0.1 —
    see datapipe/repetition.py docstring)."""
    from sjot_spark.queries import QUERIES

    df = QUERIES["repetition_stats"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan
    assert plan.count("array_sort(") == 1, plan


def _lambda_bodies(plan: str):
    """Yield the balanced-paren body of every lambdafunction(...) in a
    plan string (the per-element-evaluated spans)."""
    marker = "lambdafunction("
    i = 0
    while True:
        i = plan.find(marker, i)
        if i < 0:
            return
        start = i + len(marker)
        depth, j = 1, start
        while depth and j < len(plan):
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        yield plan[start:j - 1]
        i = start


def test_no_split_inside_any_lambda_body(spark):
    """Sweeping invariant over EVERY registered contract query: the
    tokenizer (split) must never appear inside a higher-order-function
    lambda BODY. Spark re-evaluates non-attribute expressions inside
    HOF lambdas on every element, so an inlined split is O(elements)
    re-tokenizations per row — the repetition_stats trap (54 s vs ~1 s
    at sf0.1) that also hit shingles/token windows. split as a HOF
    *input* argument is fine (evaluated once); only the lambda body is
    the hot span. Catches any future operator that embeds tokenize in
    a per-element lambda."""
    from sjot_spark.queries import QUERIES

    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    offenders = []
    for name, q in QUERIES.items():
        plan = q(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
            .optimizedPlan().toString()
        for body in _lambda_bodies(plan):
            if "split(" in body:
                offenders.append(name)
                break
    assert offenders == [], offenders


def test_plan_digests(spark):
    """Every contract query's OPTIMIZED plan digest matches the
    checked-in fixture (r5 hunt follow-up: three optimizer rules can
    silently re-inline staged arrays — value-invisible, 10-50x wall).
    A mismatch means the plan changed: review it, then regenerate via
    `python scripts/plan_digests.py` and commit the fixture WITH the
    change that caused it."""
    import json
    import os

    from sjot_spark.plan.digest import all_query_digests

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "plan_digests.json")
    with open(fixture) as f:
        expected = json.load(f)
    got = all_query_digests(spark, "/root/testdata/sf0.001")
    changed = sorted(
        k for k in set(expected) | set(got)
        if expected.get(k) != got.get(k))
    assert changed == [], (
        f"plan digests changed for {changed}; if intentional, "
        "regenerate with scripts/plan_digests.py")
