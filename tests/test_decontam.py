"""Unit tests for benchmark decontamination (datapipe/decontam.py)
and canonical-doc selection (datapipe/cluster.canonical_per_cluster).
Hand-computed expectations; the full-corpus DuckDB cross-checks run
in test_oracle_parity (decontam_overlap, canonical_docs)."""

from pyspark.sql import functions as F

from sjot_spark.datapipe import decontam
from sjot_spark.datapipe.cluster import canonical_per_cluster


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval_grams(spark, texts, n=3):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return df.select(
        F.explode(decontam.ngram_hash_set(F.col("text"), n)).alias(
            "gram_hash"
        )
    )


def test_contaminated_docs_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),  # shares "the quick brown"
            (2, "totally clean document here now"),
            (3, "quick brown fox runs away fast"),  # "quick brown fox"
        ],
    )
    ev = _eval_grams(spark, ["the quick brown fox sleeps"], n=3)
    out = {
        r["doc_id"]: r.asDict()
        for r in decontam.contaminated_docs(
            docs, ev, n=3
        ).collect()
    }
    # doc 1: grams {the quick brown, quick brown fox, brown fox jumps}
    #   -> 2 hits of 3 distinct grams
    assert out[1]["n_grams"] == 3
    assert out[1]["n_hit"] == 2
    assert out[1]["hit_permille"] == 666
    # doc 3: 4 grams, 1 hit (quick brown fox)
    assert out[3]["n_hit"] == 1
    assert out[3]["hit_permille"] == 250
    # doc 2: clean -> absent entirely
    assert 2 not in out


def test_contamination_counts_distinct_grams_once(spark):
    # the same eval gram repeated in a doc counts ONCE (set overlap)
    docs = _docs(spark, [(1, "a b c a b c a b c")])
    ev = _eval_grams(spark, ["a b c"], n=3)
    out = decontam.contaminated_docs(docs, ev, n=3).collect()
    assert len(out) == 1
    # distinct grams of the doc: {a b c, b c a, c a b} -> 1 hit
    assert out[0]["n_grams"] == 3
    assert out[0]["n_hit"] == 1


def test_short_docs_contribute_nothing(spark):
    docs = _docs(spark, [(1, "a b"), (2, "   ")])
    ev = _eval_grams(spark, ["a b c"], n=3)
    assert decontam.contaminated_docs(docs, ev, n=3).count() == 0


def test_decontam_plan_broadcasts_eval_set(spark):
    docs = _docs(spark, [(1, "a b c d")])
    ev = _eval_grams(spark, ["a b c"], n=3)
    plan = (
        decontam.contaminated_docs(docs, ev, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # eval side must be on the broadcast build side; the corpus side
    # must never sort-merge against it
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _comp(spark, rows):
    return spark.createDataFrame(rows, "v long, cluster_id long")


def _scores(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score long")


def test_canonical_argmax_and_tiebreak(spark):
    comp = _comp(spark, [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)])
    scores = _scores(
        spark, [(1, 50), (2, 90), (3, 90), (7, 10), (8, 10)]
    )
    out = {
        r["cluster_id"]: r.asDict()
        for r in canonical_per_cluster(comp, scores).collect()
    }
    # cluster 1: max score 90 shared by 2 and 3 -> smallest id wins
    assert out[1]["canonical_id"] == 2
    assert out[1]["best_score"] == 90
    assert out[1]["n_members"] == 3
    # cluster 7: tie at 10 -> doc 7
    assert out[7]["canonical_id"] == 7
    assert out[7]["n_members"] == 2


def test_canonical_plan_has_no_window(spark):
    comp = _comp(spark, [(1, 1), (2, 1)])
    scores = _scores(spark, [(1, 5), (2, 6)])
    plan = (
        canonical_per_cluster(comp, scores)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # argmax rides the map-side-combined aggregate: no Window node,
    # and the aggregation appears in partial + final mode
    assert "Window" not in plan
    assert "partial_" in plan or "partial" in plan.lower()
