"""Exact substring dedup (sjot_spark/datapipe/substringdup.py):
hand-computed span removal across and within documents, edge cases
(short/blank/untouched docs, min_count), and the staging plan shape
(each heavy array evaluated once per row)."""

import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import substringdup

K = 3


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # A and B share the 4-token substring "c1 c2 c3 c4" -> with
        # k=3 the duplicated 3-grams are (c1 c2 c3) and (c2 c3 c4)
        (1, "x1 x2 c1 c2 c3 c4 y1", "web"),
        (2, "z1 c1 c2 c3 c4 z2 z3", "web"),
        # within-doc repeat of (r1 r2 r3): both occurrences removed
        (3, "r1 r2 r3 q r1 r2 r3", "web"),
        # untouched: rewrites to its (normalized) self
        (4, "only  unique   tokens here", "books"),
        # shorter than k: passes through
        (5, "a b", "books"),
        # blank
        (6, "", "books"),
        # every token duplicated (exact copy of part of doc 3's run
        # is NOT shared; this one duplicates doc 7) -> text_clean ""
        (7, "w1 w2 w3", "web"),
        (8, "w1 w2 w3", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


@pytest.fixture(scope="module")
def rewritten(docs):
    out = substringdup.remove_duplicated_substrings(
        docs, "doc_id", "text", k=K, min_count=2, carry_cols=("source",)
    )
    return {r.doc_id: r for r in out.collect()}


def test_cross_doc_span_removed(rewritten):
    a, b = rewritten[1], rewritten[2]
    assert a.text_clean == "x1 x2 y1" and a.n_removed == 4
    assert b.text_clean == "z1 z2 z3" and b.n_removed == 4
    # A's duplicated gram starts: offsets of (c1 c2 c3), (c2 c3 c4)
    assert a.n_dup_starts == 2 and b.n_dup_starts == 2


def test_within_doc_repeat_removed(rewritten):
    c = rewritten[3]
    # both (r1 r2 r3) occurrences go; "q" survives (no duplicated
    # gram covers position 4)
    assert c.text_clean == "q"
    assert c.n_removed == 6 and c.n_tok == 7


def test_untouched_short_blank(rewritten):
    assert rewritten[4].text_clean == "only unique tokens here"  # normalized
    assert rewritten[4].n_removed == 0
    assert rewritten[5].text_clean == "a b" and rewritten[5].n_removed == 0
    assert rewritten[6].text_clean == "" and rewritten[6].n_tok == 0


def test_fully_duplicated_doc_empties(rewritten):
    assert rewritten[7].text_clean == "" and rewritten[7].n_removed == 3
    assert rewritten[8].text_clean == "" and rewritten[8].n_removed == 3


def test_min_count_above_occurrences(docs):
    out = substringdup.remove_duplicated_substrings(
        docs, "doc_id", "text", k=K, min_count=3
    )
    assert {r.n_removed for r in out.collect()} == {0}


def test_census_counts_total_occurrences(docs):
    t = F.col("text")
    g = docs.select(
        F.when(F.length(F.trim(t)) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.trim(t), r"\s+")).alias("_toks")
    ).select(substringdup.gram_starts_of(F.col("_toks"), K).alias("_grams"))
    dup = substringdup.duplicated_grams(g, "_grams", 2)
    # (c1c2c3),(c2c3c4) across docs; (r1r2r3) twice within doc 3;
    # (w1w2w3) across docs 7/8
    assert dup.count() == 4
    assert {r.n_occ for r in dup.collect()} == {2}


def test_heavy_arrays_staged_once(docs):
    """The split, the gram build, the flag transform, and the cover
    transform must each appear exactly once in the optimized
    rewrite-side plan — a re-inlined stage re-evaluates per element
    (the O(n^2) trap; see datapipe/repetition.py)."""
    out = substringdup.remove_duplicated_substrings(
        docs, "doc_id", "text", k=K, min_count=2
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the rewrite branch must stage split exactly once; the census and
    # hit-set branches each stage their own (3 total, one per branch)
    assert plan.count("split(trim(") == 3, plan.count("split(trim(")
    for marker, branch_count in [
        ("array_max(slice(", 1),   # cover mask: rewrite branch only
        ("array_contains(", 1),    # flag transform: rewrite branch only
    ]:
        assert plan.count(marker) == branch_count, (marker, plan)
    # no split inside any lambda body (the pushed-filter resurrection)
    from tests.test_plans import _lambda_bodies

    for body in _lambda_bodies(plan):
        assert "split(" not in body
