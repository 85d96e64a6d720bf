"""Unigram surprisal scoring (sjot_spark/datapipe/surprisal.py):
hand-computed log2 buckets, deterministic vocab truncation, OOV
handling, blank docs, the external-census swap point, and the
broadcast-only scoring plan."""

import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import surprisal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a a a b", "web"),
        (2, "a b c", "web"),
        (3, "", "web"),
        (4, "z", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_census_truncation_deterministic(docs, spark):
    # counts: a=5, b=2, c=1, z=1; top-3 tie between c and z broken by
    # token ASC -> c stays, z falls out of vocab
    census = surprisal.token_census(docs, "text", max_vocab=3)
    got = {(r.token, r.cnt) for r in census.collect()}
    assert got == {("a", 5), ("b", 2), ("c", 1)}


def test_hand_computed_buckets(docs):
    # total = 5+2+1 = 8 -> B = 3; bits: a=3-2=1, b=3-1=2, c=3-0=3,
    # OOV (z) = 4
    census = surprisal.token_census(docs, "text", max_vocab=3)
    out = {
        r.doc_id: r
        for r in surprisal.score_documents(docs, census).collect()
    }
    d1 = out[1]  # 4*1 + 2 = 6 bits over 5 tokens
    assert (d1.n_tok, d1.n_oov, d1.bits_sum, d1.score_permille) \
        == (5, 0, 6, 1200)
    d2 = out[2]  # 1 + 2 + 3 = 6 bits over 3 tokens
    assert (d2.n_tok, d2.n_oov, d2.bits_sum, d2.score_permille) \
        == (3, 0, 6, 2000)
    d3 = out[3]  # blank: no tokens, NULL score
    assert (d3.n_tok, d3.n_oov, d3.bits_sum, d3.score_permille) \
        == (0, 0, None, None)
    d4 = out[4]  # single OOV token
    assert (d4.n_tok, d4.n_oov, d4.bits_sum, d4.score_permille) \
        == (1, 1, 4, 4000)


def test_external_census_swap_point(docs, spark):
    """Any (token, cnt) relation drops in — e.g. a reference-corpus
    LM: here a census where 'z' is in vocab and 'a' is not."""
    ref = spark.createDataFrame(
        [("z", 12), ("b", 4)], "token string, cnt long"
    )
    out = {
        r.doc_id: r
        for r in surprisal.score_documents(docs, ref).collect()
    }
    # total = 16 -> B = 4; z = 4-3 = 1, b = 4-2 = 2, OOV = 5
    assert (out[4].bits_sum, out[4].n_oov) == (1, 0)
    assert (out[2].bits_sum, out[2].n_oov) == (5 + 2 + 5, 2)  # a, b, c


def test_scoring_plan_is_broadcast_only(docs):
    census = surprisal.token_census(docs, "text", max_vocab=3)
    plan = surprisal.score_documents(docs, census)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
