"""Source mixing: token-budget-weighted deterministic sampling
(sjot_spark/datapipe/mixing.py).

Checks the exact-integer rate decomposition against Python
arbitrary-precision arithmetic, the clamp/zero edge cases, the
referential-integrity posture for unknown sources, determinism of the
hash sample, and the broadcast-only plan shape (the corpus side must
never shuffle).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import mixing

PPM = 1_000_000


def _md5_ppm(key) -> int:
    return (int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)) % PPM


@pytest.fixture(scope="module")
def corpus(spark):
    # three sources with very different token masses so one source
    # exceeds its allocation (rate < 1e6), one fits inside it
    # (rate clamped to 1e6), and one is absent from the weights table
    rows = []
    for i in range(60):
        rows.append((i, "web", 100))          # 6000 tokens
    for i in range(60, 70):
        rows.append((i, "books", 40))         # 400 tokens
    for i in range(70, 75):
        rows.append((i, "mystery", 10))       # 50 tokens, unweighted
    return spark.createDataFrame(
        rows, "doc_id int, source string, n_tok long")


@pytest.fixture(scope="module")
def weights(spark):
    return spark.createDataFrame(
        [("web", 500), ("books", 500)], "source string, w_permille long")


@pytest.fixture(scope="module")
def budget(spark):
    return spark.createDataFrame([(2000,)], "total_budget long")


def test_rates_exact_integer_math(corpus, weights, budget):
    rates = {
        r.source: r.asDict()
        for r in mixing.mix_rates(corpus, weights, budget).collect()
    }
    assert set(rates) == {"web", "books", "mystery"}

    # web: budget 2000*500//1000 = 1000 tokens of 6000 input
    web = rates["web"]
    assert (web["n_input"], web["tokens_input"]) == (60, 6000)
    assert web["budget_tokens"] == 1000
    assert web["rate_ppm"] == 1000 * PPM // 6000  # exact floor: 166666

    # books: allocation 1000 tokens > 400 input -> keep everything
    books = rates["books"]
    assert books["budget_tokens"] == 1000
    assert books["rate_ppm"] == PPM

    # mystery: no weights row -> weight 0, allocation 0, rate 0
    myst = rates["mystery"]
    assert (myst["w_permille"], myst["budget_tokens"], myst["rate_ppm"]) \
        == (0, 0, 0)


def test_rate_decomposition_matches_bigint_floor(spark):
    """The two-digit base-1000 decomposition must equal
    floor(b*1e6/t) computed with arbitrary precision, including at
    magnitudes where the naive b*1e6 would overflow int64."""
    cases = [
        (1, 3), (2, 3), (999_999, 1_000_000), (7, 9_999_991),
        # ~9e15 tokens per source: naive b*1e6 overflows int64
        (3_000_000_000_000_000, 9_000_000_000_000_001),
        (8_999_999_999_999_999, 9_000_000_000_000_000),
    ]
    docs = spark.createDataFrame(
        [(i, f"s{i}", t) for i, (_, t) in enumerate(cases)],
        "doc_id long, source string, n_tok long")
    # one-row-per-source corpus so tokens_input == t exactly; weight
    # 1000 permille and budget b*len so each source's allocation == b
    weights = spark.createDataFrame(
        [(f"s{i}", 1000) for i in range(len(cases))],
        "source string, w_permille long")
    for i, (b, t) in enumerate(cases):
        budget = spark.createDataFrame([(b,)], "total_budget long")
        one = docs.where(F.col("source") == f"s{i}")
        row = mixing.mix_rates(one, weights, budget).collect()[0]
        assert row.rate_ppm == min(PPM, b * PPM // t), (b, t)


def test_sample_is_deterministic_md5_ppm(corpus, weights, budget):
    rates = mixing.mix_rates(corpus, weights, budget)
    kept = mixing.mix_sample(corpus, rates)
    got = sorted(r.doc_id for r in kept.collect())

    rate_by_src = {r.source: r.rate_ppm for r in rates.collect()}
    want = sorted(
        r.doc_id for r in corpus.collect()
        if _md5_ppm(r.doc_id) < rate_by_src[r.source]
    )
    assert got == want
    assert got == sorted(r.doc_id for r in kept.collect())  # stable
    # books keeps everything, mystery nothing
    srcs = {r.doc_id: r.source for r in corpus.collect()}
    assert all(60 <= d < 70 or srcs[d] == "web" for d in got) \
        and sum(1 for d in got if 60 <= d < 70) == 10


def test_epoch_rates_cap_and_uncapped_values(corpus, weights, budget):
    """max_epochs lifts the 1e6 clamp to max_epochs*1e6 and caps the
    fan-out; values below the cap are the exact uncapped floor."""
    # books: allocation 1000 tokens of 400 input = 2.5 epochs
    rates = {
        r.source: r.rate_ppm
        for r in mixing.mix_rates(
            corpus, weights, budget, max_epochs=8).collect()
    }
    assert rates["books"] == 1000 * PPM // 400  # 2_500_000
    assert rates["web"] == 1000 * PPM // 6000   # unchanged below 1e6
    assert rates["mystery"] == 0
    # cap engages: max_epochs=2 clamps books to 2e6
    capped = {
        r.source: r.rate_ppm
        for r in mixing.mix_rates(
            corpus, weights, budget, max_epochs=2).collect()
    }
    assert capped["books"] == 2 * PPM
    with pytest.raises(ValueError):
        mixing.mix_rates(corpus, weights, budget, max_epochs=0)


def test_epoch_sample_copies_and_epoch_numbering(corpus, weights, budget):
    """Each doc appears exactly n_copies times with epochs
    0..n_copies-1, where n_copies = rate div 1e6 + the md5-ppm
    fractional rule — hand-recomputed in Python per doc."""
    rates = mixing.mix_rates(corpus, weights, budget, max_epochs=8)
    sample = mixing.mix_sample_epochs(corpus, rates)
    got = {}
    for r in sample.collect():
        got.setdefault(r.doc_id, []).append(r.epoch)

    rate_by_src = {r.source: r.rate_ppm for r in rates.collect()}
    for row in corpus.collect():
        rate = rate_by_src[row.source]
        n = rate // PPM + (1 if _md5_ppm(row.doc_id) < rate % PPM else 0)
        if n == 0:
            assert row.doc_id not in got, row
        else:
            assert sorted(got[row.doc_id]) == list(range(n)), row
    # books (rate 2.5e6): every doc twice, md5-chosen docs a third time
    books_counts = sorted(len(got[d]) for d in range(60, 70))
    assert set(books_counts) <= {2, 3} and books_counts[0] == 2


def test_epoch_sample_matches_mix_sample_at_one_epoch(
        corpus, weights, budget):
    """With max_epochs=1 rates, mix_sample_epochs is mix_sample plus
    a constant epoch-0 column."""
    rates = mixing.mix_rates(corpus, weights, budget)
    flat = sorted(r.doc_id for r in mixing.mix_sample(
        corpus, rates).collect())
    epoched = mixing.mix_sample_epochs(corpus, rates).collect()
    assert sorted(r.doc_id for r in epoched) == flat
    assert all(r.epoch == 0 for r in epoched)


def test_epoch_sample_rejects_column_collision(corpus, weights, budget):
    rates = mixing.mix_rates(corpus, weights, budget)
    withep = corpus.withColumn("epoch", F.lit(9))
    with pytest.raises(ValueError, match="epoch"):
        mixing.mix_sample_epochs(withep, rates)


def test_epoch_sample_plan_is_broadcast_only(corpus, weights, budget):
    """The epoch explode must stay fused with the scan: broadcast
    join only, no corpus Exchange."""
    rates = mixing.mix_rates(corpus, weights, budget, max_epochs=8)
    plan = mixing.mix_sample_epochs(corpus, rates)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Generate explode" in plan


def test_sample_plan_is_broadcast_only(corpus, weights, budget):
    """The corpus side of mix_sample must pipeline with the scan: the
    only join is a broadcast hash join and the corpus never feeds an
    Exchange (the |sources|-row stats agg may shuffle; the filter on
    the big side must not)."""
    rates = mixing.mix_rates(corpus, weights, budget)
    plan = mixing.mix_sample(corpus, rates)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
