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


# ------------------------- bigram with stupid backoff (r6) ---------


@pytest.fixture(scope="module")
def bdocs(spark):
    rows = [
        (1, "a b a b c", "web"),
        (2, "a b x", "web"),
        (3, "", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_bigram_census_restriction_and_cut(bdocs):
    # unigrams: a=3, b=3, c=1, x=1; top-3 (cnt desc, token asc) ->
    # {a, b, c}, x OOV. bigram occurrences: (a,b)x3, (b,a), (b,c),
    # (b,x); all prefixes in vocab; top-3 under (cnt desc, prev asc,
    # token asc) keeps (a,b), (b,a), (b,c) and drops (b,x)
    uni = surprisal.token_census(bdocs, "text", max_vocab=3)
    big = surprisal.bigram_census(bdocs, uni, "text", max_bigrams=3)
    got = {(r.prev, r.token): (r.big_cnt, r.cnt_prev) for r in big.collect()}
    assert got == {("a", "b"): (3, 3), ("b", "a"): (1, 3), ("b", "c"): (1, 3)}


def test_bigram_hand_computed_backoff_buckets(bdocs):
    """Every path by hand: bigram hit = b(cnt_prev) - b(big_cnt),
    backoff = 1 + unigram bucket (OOV keeps max+1), first token =
    plain unigram bucket. total = 3+3+1 = 7 -> B = 2; b(3)=1, b(1)=0."""
    uni = surprisal.token_census(bdocs, "text", max_vocab=3)
    big = surprisal.bigram_census(bdocs, uni, "text", max_bigrams=3)
    out = {r.doc_id: r for r in surprisal.score_documents_bigram(
        bdocs, uni, big).collect()}
    # d1 a,b,a,b,c: first a uni 2-1=1; (a,b) hit 1-1=0; (b,a) hit
    # 1-0=1; (a,b) 0; (b,c) hit 1-0=1 -> 3 bits / 5 toks
    d1 = out[1]
    assert (d1.n_tok, d1.n_oov, d1.n_backoff, d1.bits_sum,
            d1.score_permille) == (5, 0, 0, 3, 600)
    # d2 a,b,x: a uni 1; (a,b) hit 0; x backoff (bigram (b,x) cut,
    # x OOV) 1 + (2+1) = 4 -> 5 bits / 3 toks -> floor 1666
    d2 = out[2]
    assert (d2.n_tok, d2.n_oov, d2.n_backoff, d2.bits_sum,
            d2.score_permille) == (3, 1, 1, 5, 1666)
    # blank doc: marker row only
    d3 = out[3]
    assert (d3.n_tok, d3.n_oov, d3.n_backoff) == (0, 0, 0)
    assert d3.bits_sum is None and d3.score_permille is None


def test_fused_census_matches_separate_passes(bdocs):
    """unigram_bigram_census (r7: one tokenization pass for both cuts)
    must be value-identical to token_census + bigram_census, including
    the deterministic total-order truncation and blank-doc handling."""
    uni0 = surprisal.token_census(bdocs, "text", max_vocab=3)
    big0 = surprisal.bigram_census(bdocs, uni0, "text", max_bigrams=3)
    uni1, big1 = surprisal.unigram_bigram_census(
        bdocs, "text", max_vocab=3, max_bigrams=3)
    assert ({(r.token, r.cnt) for r in uni0.collect()}
            == {(r.token, r.cnt) for r in uni1.collect()})
    assert ({(r.prev, r.token, r.big_cnt, r.cnt_prev)
             for r in big0.collect()}
            == {(r.prev, r.token, r.big_cnt, r.cnt_prev)
                for r in big1.collect()})


def test_bigram_scoring_plan_broadcast_only_no_lambda_split(bdocs):
    """Scoring joins are all broadcast, and the in-row prev-pairing
    never lands the tokenizer split inside a lambda body (the
    re-evaluation trap, CLAUDE.md)."""
    uni = surprisal.token_census(bdocs, "text", max_vocab=3)
    big = surprisal.bigram_census(bdocs, uni, "text", max_bigrams=3)
    df = surprisal.score_documents_bigram(bdocs, uni, big)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
