"""Unit tests for the r5 text-quality operators: repetition signals
(datapipe/repetition.py) and PII scan/redaction (datapipe/pii.py).
Hand-computed expectations on crafted rows; the full-corpus DuckDB
cross-check runs in test_oracle_parity (repetition_stats, pii_scan)."""

import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import pii, repetition


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _signals(spark, text):
    df = repetition.repetition_signals(_docs(spark, [(0, text)]))
    return df.collect()[0].asDict()


def test_repetition_no_repeats(spark):
    r = _signals(spark, "a b c d")
    # 4 tokens all distinct; 3 bigrams all distinct; runs of length 1
    assert r == {
        "doc_id": 0,
        "dup_word_permille": 0,
        "top_bigram_permille": 333,  # floor(1000 * 1/3)
        "max_token_run": 1,
    }


def test_repetition_all_same_token(spark):
    r = _signals(spark, "x x x x x")
    # 5 tokens, 1 distinct -> floor(1000*4/5); 4 bigrams all "x x"
    assert r["dup_word_permille"] == 800
    assert r["top_bigram_permille"] == 1000
    assert r["max_token_run"] == 5


def test_repetition_mode_bigram_not_adjacent(spark):
    # "a b" occurs twice but never in adjacent positions in the gram
    # STREAM — the sort-then-run fold must still find count 2.
    r = _signals(spark, "a b c a b")
    # bigrams: [a b, b c, c a, a b] -> top "a b" x2 of 4
    assert r["top_bigram_permille"] == 500
    # tokens: a,b,c,a,b -> 5 total, 3 distinct -> floor(1000*2/5)
    assert r["dup_word_permille"] == 400
    assert r["max_token_run"] == 1


def test_repetition_run_vs_mode(spark):
    # most frequent token is 'a' (x3) but only 'b b' is consecutive
    r = _signals(spark, "a b b a c a")
    assert r["max_token_run"] == 2


def test_repetition_single_token_and_blank(spark):
    assert _signals(spark, "solo") == {
        "doc_id": 0,
        "dup_word_permille": 0,
        "top_bigram_permille": 0,
        "max_token_run": 1,
    }
    assert _signals(spark, "   ") == {
        "doc_id": 0,
        "dup_word_permille": 0,
        "top_bigram_permille": 0,
        "max_token_run": 0,
    }


PII_TEXT = (
    "mail bob.smith+x@sub.example.org then call 555-0199 "
    "from 192.168.0.1 twice 10.0.0.255 end"
)


def test_pii_counts_and_redaction(spark):
    df = _docs(spark, [(0, PII_TEXT)])
    counts = {
        k: c.alias(k) for k, c in pii.pii_counts(F.col("text")).items()
    }
    row = df.select(
        *counts.values(), pii.redact_pii(F.col("text")).alias("red")
    ).collect()[0]
    assert row["email"] == 1
    assert row["phone"] == 1
    assert row["ipv4"] == 2
    assert row["red"] == (
        "mail [EMAIL] then call [PHONE] from [IP] twice [IP] end"
    )


def test_pii_redaction_is_complete(spark):
    df = _docs(spark, [(0, PII_TEXT), (1, "clean text only")])
    red = df.select(pii.redact_pii(F.col("text")).alias("r"))
    residual = red.select(
        sum(
            F.regexp_count(F.col("r"), F.lit(pat))
            for _, pat, _ in pii.PII_PATTERNS
        ).alias("n")
    ).agg(F.sum("n").alias("t")).collect()[0]["t"]
    assert residual == 0


def test_pii_scan_rollup(spark):
    df = spark.createDataFrame(
        [("s1", PII_TEXT), ("s1", "nothing here"), ("s2", "a@b.io x")],
        "source string, text string",
    )
    out = {
        r["grp"]: r.asDict()
        for r in pii.pii_scan(df, "text", "source").collect()
    }
    assert out["s1"]["n_docs"] == 2
    assert out["s1"]["n_email"] == 1
    assert out["s1"]["n_phone"] == 1
    assert out["s1"]["n_ipv4"] == 2
    assert out["s1"]["docs_with_pii"] == 1
    assert out["s1"]["residual_matches"] == 0
    assert out["s2"]["n_email"] == 1
    # "a@b.io" (6 chars) -> "[EMAIL]" (7): removal can be negative
    assert out["s2"]["chars_removed"] == -1


def test_repetition_plan_is_shuffle_free(spark):
    df = _docs(spark, [(0, "a b a b")])
    plan = repetition.repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
