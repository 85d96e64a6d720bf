"""Benchmark decontamination — n-gram overlap between a training
corpus and an evaluation set, the standard pre-training scrub (GPT-3
appendix C / PaLM §C: 8-13-token n-gram collision against eval sets).

A document that contains verbatim eval-set n-grams leaks the benchmark
into training; pipelines drop or redact such documents before
training. The reference has no decontamination analog — this extends
the training-data-pipeline surface (SURVEY §6); its validation cousin
is the cross-row uniqueness machinery (A5, /root/reference/
index.js:389-399), inverted: instead of "no value may repeat within
this table", the rule is "no n-gram may repeat ACROSS two tables".

Spark-first shape — and the 100 TB story:

- The eval side is SMALL (benchmarks are 10^4..10^7 n-grams, well
  under the broadcast threshold even at 64-bit hashes). The corpus
  side is the 100 TB table. So the join MUST be a broadcast hash
  join with the eval set on the build side: the corpus streams
  through map-side, only MATCHING (doc, gram) rows ever shuffle —
  the post-join aggregation traffic is proportional to the
  contamination, not the corpus. tests/test_plans.py asserts the
  broadcast.
- Document n-grams are hashed in-row (one md5 per distinct shingle,
  reusing datapipe/dedup.shingles_of over a STAGED token array — the
  split and the n-gram build each run once per row, never inside a
  re-evaluating lambda) and deduplicated per document
  BEFORE the explode, so the exploded row count is bounded by
  distinct-shingles-per-doc, and counts mean "distinct contaminated
  n-grams", invariant to in-document repetition.
- Everything upstream of the explode is a stateless projection that
  pipelines with the scan; there is exactly ONE shuffle (the final
  per-doc count), carrying only contaminated grams.

The 60-bit md5 hash space makes cross-table collisions (~10^-18 per
pair) irrelevant at eval-set scale, and the DuckDB oracle reproduces
the hashes exactly ('0x'||substr(md5(x),1,15))::bigint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sjot_spark.datapipe.dedup import _md5_int, shingles, shingles_of, tokens_of


def ngram_hashes_of(toks: Column, n: int = 8) -> Column:
    """Distinct word-n-gram 60-bit hashes from a STAGED token-array
    attribute (array<long>); empty array when the document has fewer
    than n tokens. ``toks`` must be a materialized column — see
    dedup.shingles_of's warning."""
    return F.transform(shingles_of(toks, n), lambda s: _md5_int(s))


def ngram_hash_set(text: Column, n: int = 8) -> Column:
    """Back-compat: n-gram hashes straight from text. Only safe in
    single-reference projections (the shingle build re-evaluates the
    embedded split per element otherwise) — prefer staging
    dedup.tokens_of + :func:`ngram_hashes_of`."""
    return F.transform(shingles(text, n), lambda s: _md5_int(s))


def contaminated_docs(
    docs: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Documents sharing at least one n-gram with the eval set:
    (id, n_grams, n_hit, hit_permille). ``eval_grams`` must carry a
    ``gram_hash`` long column (build it with :func:`ngram_hash_set`
    over the benchmark texts + explode + distinct); it is broadcast —
    keep it eval-set-sized, never corpus-sized.

    hit_permille = floor(1000 * n_hit / n_grams) over DISTINCT
    document shingles, so the score is a set-overlap fraction.
    """
    ev = broadcast(eval_grams.select("gram_hash").distinct())
    g = docs.select(
        F.col(id_col),
        tokens_of(F.col(text_col)).alias("_toks"),
    ).select(
        id_col,
        ngram_hashes_of(F.col("_toks"), n).alias("_grams"),
    ).select(
        id_col,
        F.size("_grams").cast("long").alias("n_grams"),
        # OUTER, so Catalyst infers no size>0 pre-filter to push below
        # the staging projections (a pushed filter re-inlines the
        # split into the shingle lambda — see dedup.exploded_shingles).
        # The NULL row an empty gram array emits dies in the inner
        # join on gram_hash below.
        F.explode_outer("_grams").alias("gram_hash"),
    )
    return (
        g.join(ev, "gram_hash")  # broadcast build side: eval set
        .groupBy(id_col, "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.floor(F.lit(1000) * F.col("n_hit") / F.col("n_grams"))
            .alias("hit_permille"),
        )
    )
