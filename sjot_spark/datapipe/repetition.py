"""Repetition quality signals (Gopher-style) — duplicate-word
fraction, top-bigram mass, longest same-token run — as pure Column
expressions: one projection, ZERO shuffle.

These are the classic web-corpus repetition filters (Rae et al. 2021
"Scaling Language Models" §A.1.1: duplicate-line/paragraph fractions,
top-n-gram character mass) adapted to whitespace-token granularity.
A document whose mass concentrates in one repeated n-gram, or that
repeats the same token in long runs, is boilerplate/spam and gets
filtered before training. The reference has no text-quality analog —
this extends the training-data-pipeline surface (SURVEY §6) alongside
dedup/ANN; its nearest validation cousin is the set-uniqueness check
A5 (/root/reference/index.js:389-399: "@unique" duplicate detection),
which `dup_word_permille` generalizes from reject-on-any-dup to a
graded permille signal.

Spark-first shape — and the 100 TB story:

- The naive distributed formulation is explode(bigrams) →
  groupBy(doc_id, gram) → groupBy(doc_id): TWO shuffles carrying one
  row per token occurrence (≈10^13 rows at corpus scale). This module
  instead computes the per-doc mode count as a single linear
  `aggregate` fold over the SORTED gram array (equal grams are
  adjacent after array_sort, so the max run length of the sorted
  array IS the mode count). No explode, no shuffle, pipelines with
  the scan, and the whole operator stays inside one codegen'd
  projection. The DuckDB oracle deliberately uses the OTHER
  formulation (unnest + GROUP BY + gaps-and-islands windows), so the
  two engines cross-check independent algorithms.
- Fold lambdas reference only the accumulator and the element —
  never a heavy outer array expression (see datapipe/fingerprint.py
  for why that matters: per-element re-evaluation).
- All metrics are integer permille with explicit FLOOR so the DuckDB
  twin compares exactly (cross-engine rule: no float metrics).

Per-row cost is O(n log n) for the sort — the same order as
tokenizing — on arrays of document length; nothing leaves the row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def _bigrams(toks: Column) -> Column:
    """Adjacent word pairs, via one transform over an index sequence
    (no explode). Empty array when fewer than 2 tokens."""
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(m - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1)),
    )
    return F.when(m >= 2, grams).otherwise(
        F.array().cast("array<string>")
    )


def _max_adjacent_run(arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements — a single
    linear fold (struct accumulator: previous element, current run,
    best run). On a SORTED array this is the multiset mode count."""
    zero = F.struct(
        # a lone space never equals a token (split on \\s+) or a
        # bigram (always "tok tok"), so the first element starts run=1
        F.lit(" ").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = (
            F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, zero, step, lambda acc: acc["best"])


def dup_word_permille(text: Column) -> Column:
    """floor(1000 * (n_tokens - n_distinct_tokens) / n_tokens); 0 for
    blank text. The graded analog of A5 "@unique"."""
    toks = _tokens(text)
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    return (
        F.when(F.length(F.trim(text)) == 0, F.lit(0).cast("long"))
        .otherwise(F.floor(F.lit(1000) * (n - nd) / n))
    )


def top_bigram_permille(text: Column) -> Column:
    """floor(1000 * count(most frequent bigram) / n_bigrams); 0 when
    fewer than 2 tokens. Sort-then-longest-run computes the mode
    count without leaving the row."""
    grams = F.array_sort(_bigrams(_tokens(text)))
    n = F.size(grams).cast("long")
    top = _max_adjacent_run(grams)
    return F.when(n > 0, F.floor(F.lit(1000) * top / n)).otherwise(
        F.lit(0).cast("long")
    )


def max_token_run(text: Column) -> Column:
    """Longest run of the SAME token repeated consecutively (unsorted
    fold — order matters here); 0 for blank text."""
    toks = _tokens(text)
    return F.when(
        F.length(F.trim(text)) == 0, F.lit(0).cast("long")
    ).otherwise(_max_adjacent_run(toks))


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics: (id, dup_word_permille,
    top_bigram_permille, max_token_run). One shuffle-free projection;
    filter on the permilles downstream to drop boilerplate."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        dup_word_permille(t).alias("dup_word_permille"),
        top_bigram_permille(t).alias("top_bigram_permille"),
        max_token_run(t).alias("max_token_run"),
    )
