"""Boilerplate line removal — corpus-frequency line dedup (the CCNet
/ RefinedWeb pre-training scrub: a line appearing in many documents is
navigation chrome, cookie banners, or license boilerplate, and is
dropped from every document that carries it).

The reference has no line-dedup analog — this extends the
training-data-pipeline surface (SURVEY §6); its validation cousin is
the cross-row uniqueness machinery (A5, /root/reference/
index.js:389-399) applied at sub-document granularity: instead of
"this value must not repeat across rows", the rule is "a line
repeating across documents is boilerplate and must go".

Documents are segmented into LINES by a caller-supplied splitter; for
corpora without newline structure (like the synthetic test tables) the
deterministic fallback is fixed non-overlapping k-token windows, which
both engines reproduce exactly.

Spark-first shape — and the 100 TB story:

- Stage 1 (frequent-line census): per-doc DISTINCT line hashes,
  explode, groupBy(hash) → count of carrying docs. Map-side partial
  aggregation collapses repeated lines within each input partition,
  so the shuffle carries one row per (partition, distinct line) —
  this is the standard CCNet census job and it is embarrassingly
  parallel. The output (lines with doc_count >= threshold) is
  SMALL by construction: it is the boilerplate itself.
- Stage 2 (rewrite): explode lines WITH position, LEFT OUTER
  broadcast join against the frequent set carrying a boilerplate
  flag (map-side, nothing shuffles at the join — an ANTI join would
  silently DROP documents whose every line is boilerplate), then one
  groupBy(doc) rebuild, reassembled in order via sort_array on the
  (pos, line) struct with flagged lines excluded inside the
  aggregate. The rebuild shuffle is the one unavoidable cost of
  producing rewritten documents; callers that only need the per-doc
  removal STATS can skip it (stats ride the same aggregation).
- Both stages pipeline with the scan; no driver-side collection
  anywhere (the frequent set stays a DataFrame and is broadcast by
  the optimizer — plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sjot_spark.datapipe.dedup import _md5_int


def token_window_lines_of(
    toks: Column, blank: Column, k: int = 10
) -> Column:
    """Deterministic line segmentation for newline-free corpora:
    non-overlapping k-token windows (last window may be short) from a
    STAGED token-array attribute. ``blank`` is a boolean Column that
    is true for blank text (a blank doc splits to [""], which is
    indistinguishable from a one-token doc by the array alone).
    Returns array<string>; empty array when ``blank``.

    ``toks`` MUST be a materialized attribute: the window lambda
    slices it per element, and Spark re-evaluates non-attribute
    expressions inside higher-order-function lambdas on every
    reference — an inlined split turns segmentation O(m²/k·|text|)
    per row (see datapipe/repetition.py for the measured trap)."""
    m = F.size(toks)
    lines = F.transform(
        F.sequence(F.lit(0), F.floor((m - 1) / k).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
    )
    return F.when(blank, F.array().cast("array<string>")).otherwise(lines)


def token_window_lines(text: Column, k: int = 10) -> Column:
    """Back-compat: windows straight from text. Embeds the split in
    the window lambda (re-evaluated per window) — ONLY for tiny
    inputs/tests; stage tokens and use :func:`token_window_lines_of`
    on anything corpus-sized."""
    return token_window_lines_of(
        F.split(F.trim(text), r"\s+"),
        F.length(F.trim(text)) == 0,
        k,
    )


def frequent_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_docs: int = 2,
) -> DataFrame:
    """Census stage: line hashes carried by >= min_docs distinct
    documents → (line_hash, n_docs). Lines are deduplicated per doc
    in-row BEFORE the explode, so the count is document frequency and
    the exploded row count is bounded by distinct lines per doc."""
    return (
        docs.select(
            F.col(id_col),
            # OUTER, so Catalyst infers no size>0 pre-filter to push
            # below the caller's staged token/line projections (a
            # pushed filter re-inlines the line build — and through
            # it the split — into per-element lambdas; see
            # dedup.exploded_shingles). Empty line arrays emit one
            # NULL row, dropped right above the generate.
            F.explode_outer(
                F.array_distinct(
                    F.transform(
                        F.col(lines_col), lambda s: _md5_int(s)
                    )
                )
            ).alias("line_hash"),
        )
        .where(F.col("line_hash").isNotNull())
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_docs: int = 2,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rewrite stage: per-document surviving text after dropping every
    line in the frequent set. Returns
    (id, *carry_cols, n_lines, n_removed, text_clean) with line order
    preserved; ``carry_cols`` are per-document columns (functionally
    dependent on the id) passed through the rebuild so callers don't
    pay a join to re-attach them.

    The frequent set is broadcast (it is the boilerplate — small by
    construction); the flag join is map-side LEFT OUTER — an anti
    join would drop all-boilerplate documents from the output — and
    the single rebuild shuffle carries one row per line instance."""
    freq = broadcast(
        frequent_lines(docs, id_col, lines_col, min_docs)
        .select("line_hash", F.lit(True).alias("_bp"))
    )
    exploded = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.size(F.col(lines_col)).cast("long").alias("n_lines"),
        F.posexplode_outer(F.col(lines_col)).alias("pos", "line"),
    ).withColumn("line_hash", _md5_int(F.col("line")))
    marked = exploded.join(freq, "line_hash", "left")
    is_kept = F.col("_bp").isNull() & F.col("line").isNotNull()
    return (
        # n_lines is an AGGREGATE (it is constant per doc), not a
        # grouping key: grouping on it lets downstream-filter
        # constraints (e.g. isnotnull from a caller's n_removed > 0)
        # push through the aggregate and below the generate,
        # substituting the staged line/token aliases back into a
        # per-row filter with the split inlined into the window
        # lambda (see dedup.exploded_shingles; caught by
        # tests/test_plans.py::test_no_split_inside_any_lambda_body).
        marked.groupBy(id_col, *carry_cols)
        .agg(
            F.max("n_lines").alias("n_lines"),
            F.count(F.when(is_kept, 1)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(is_kept, F.struct("pos", "line"))
                        )
                    ),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("text_clean"),
        )
        .select(
            id_col,
            *carry_cols,
            "n_lines",
            (F.col("n_lines") - F.col("n_kept")).alias("n_removed"),
            "text_clean",
        )
    )
