"""Repetition quality signals (Gopher-style) — duplicate-word
fraction, top-bigram mass, longest same-token run — as pure Column
expressions: three stacked projections, ZERO shuffle.

These are the classic web-corpus repetition filters (Rae et al. 2021
"Scaling Language Models" §A.1.1: duplicate-line/paragraph fractions,
top-n-gram character mass) adapted to whitespace-token granularity.
A document whose mass concentrates in one repeated n-gram, or that
repeats the same token in long runs, is boilerplate/spam and gets
filtered before training. The reference has no text-quality analog —
this extends the training-data-pipeline surface (SURVEY §6); its
nearest validation cousin is the set-uniqueness check A5
(/root/reference/index.js:389-399: "@unique" duplicate detection),
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
  the scan. The DuckDB oracle deliberately uses the OTHER
  formulation (unnest + GROUP BY + gaps-and-islands windows), so the
  two engines cross-check independent algorithms.
- The token array and the sorted bigram array are each MATERIALIZED
  in their own projection before any per-element lambda touches
  them. Spark's subexpression elimination does not reach inside
  higher-order-function lambdas (they are CodegenFallback — see
  jsonvalidate.py:520-560), so a lambda like
  ``get(split(text), i)`` re-evaluates the whole split PER ELEMENT:
  O(n²·|text|) per row, measured 54 s for the sf0.1 corpus vs ~1 s
  staged. The staging survives optimization because CollapseProject
  only inlines an alias that is cheap or consumed by a single
  downstream expression (attribute references are deduped PER
  CONSUMER — a lambda reading the alias n times still counts once) —
  every staged array here is deliberately consumed by ≥2 separate
  expressions in the projection above it (plan-asserted in
  tests/test_plans.py::test_repetition_arrays_staged_once); a
  single-consumer staged array gets re-inlined, and generates/
  pushed filters re-inline even multi-consumer ones (see
  dedup.exploded_shingles). Same discipline as
  datapipe/fingerprint.py: fold lambdas reference only the
  accumulator, the element, and materialized ATTRIBUTES.
- All metrics are integer permille with explicit FLOOR so the DuckDB
  twin compares exactly (cross-engine rule: no float metrics).

Per-row cost is O(n log n) for the sort — the same order as
tokenizing — on arrays of document length; nothing leaves the row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigrams(toks: Column) -> Column:
    """Adjacent word pairs, via one transform over an index sequence
    (no explode). Empty array when fewer than 2 tokens. ``toks`` MUST
    be a materialized attribute, not an expression (the lambda reads
    it per element)."""
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


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics: (id, dup_word_permille,
    top_bigram_permille, max_token_run). Three stacked shuffle-free
    projections (tokenize, build+sort bigrams, fold) so each heavy
    array is computed ONCE per row; filter on the permilles
    downstream to drop boilerplate.

    dup_word_permille = floor(1000 * (n - n_distinct) / n) — the
    graded analog of A5 "@unique". top_bigram_permille =
    floor(1000 * mode-bigram count / n_bigrams) via sort-then-
    longest-run. max_token_run = longest CONSECUTIVE repeat (unsorted
    fold — order matters there). All three are 0 for blank text
    (max_token_run also 0; a single token reads run 1)."""
    t = F.col(text_col)
    tokenized = df.select(
        F.col(id_col),
        (F.length(F.trim(t)) == 0).alias("_blank"),
        F.split(F.trim(t), r"\s+").alias("_toks"),
    )
    toks = F.col("_toks")
    staged = tokenized.select(
        F.col(id_col),
        "_blank",
        toks,
        F.array_sort(_bigrams(toks)).alias("_grams"),
    )
    blank = F.col("_blank")
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    dup = (
        F.when(blank, F.lit(0).cast("long"))
        .otherwise(F.floor(F.lit(1000) * (n - nd) / n))
    )
    grams = F.col("_grams")
    ng = F.size(grams).cast("long")
    top = F.when(
        ng > 0, F.floor(F.lit(1000) * _max_adjacent_run(grams) / ng)
    ).otherwise(F.lit(0).cast("long"))
    run = F.when(blank, F.lit(0).cast("long")).otherwise(
        _max_adjacent_run(toks)
    )
    return staged.select(
        F.col(id_col),
        dup.alias("dup_word_permille"),
        top.alias("top_bigram_permille"),
        run.alias("max_token_run"),
    )
