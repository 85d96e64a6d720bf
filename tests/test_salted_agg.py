"""Salting correctness: the two-stage salted aggregation must be
EXACTLY equivalent to the direct groupBy (SURVEY.md §4 risk item),
property-tested over random skewed inputs."""

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from sjot_spark.plan.agg import salted_agg


def direct(df, keys):
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )


def run_both(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "k string, v long")
    a = {tuple(r) for r in direct(df, ["k"]).collect()}
    b = {tuple(r) for r in salted_agg(
        df, ["k"],
        {"n": ("count", "*"), "s": ("sum", "v"),
         "mn": ("min", "v"), "mx": ("max", "v")},
        n_salts=n_salts, salt_on="v",
    ).collect()}
    return a, b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["hot", "hot", "hot", "warm", "cold1", "cold2"]),
            st.integers(min_value=-10_000, max_value=10_000),
        ),
        min_size=1, max_size=200,
    ),
    st.sampled_from([1, 4, 16]),
)
def test_salted_equals_direct(spark, rows, n_salts):
    a, b = run_both(spark, [(k, v) for k, v in rows], n_salts)
    assert a == b


def test_salted_on_skewed_fixture(spark):
    from sjot_spark.fixtures import make_sequences

    df = make_sequences(spark, 2000, violations=False)
    a = {tuple(r) for r in df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("s"),
        F.min("n_tok").alias("mn"), F.max("n_tok").alias("mx")).collect()}
    b = {tuple(r) for r in salted_agg(
        df, ["source"],
        {"n": ("count", "*"), "s": ("sum", "n_tok"),
         "mn": ("min", "n_tok"), "mx": ("max", "n_tok")},
        n_salts=8, salt_on="doc_id").collect()}
    assert a == b


def test_unmergeable_agg_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError, match="algebra"):
        salted_agg(df, ["k"], {"d": ("approx_count_distinct", "v")})


def test_count_distinct_salted_on_counted_column_is_exact(spark):
    """r4: count_distinct joins the algebra — exact because salting on
    the counted column partitions the distinct VALUE SPACE into
    disjoint cells (per-cell distinct counts sum exactly). The heavy-
    merge-state case salting exists for."""
    from sjot_spark.fixtures import make_sequences

    df = make_sequences(spark, 400, violations=True)  # has seeded dups
    a = {tuple(r) for r in df.groupBy("source").agg(
        F.count_distinct("doc_id").alias("d")).collect()}
    b = {tuple(r) for r in salted_agg(
        df, ["source"], {"d": ("count_distinct", "doc_id")},
        n_salts=8, salt_on="doc_id").collect()}
    assert a == b


def test_count_distinct_requires_salt_on_counted_column(spark):
    df = spark.createDataFrame([("a", 1, 2)], "k string, v long, w long")
    with pytest.raises(ValueError, match="salted on the counted column"):
        salted_agg(df, ["k"], {"d": ("count_distinct", "v")},
                   salt_on="w")
    with pytest.raises(ValueError, match="salted on the counted column"):
        salted_agg(df, ["k"], {"d": ("count_distinct", "v")})
