"""Exact substring deduplication — remove every token span that is
part of a >= k-token substring occurring >= min_count times anywhere
in the corpus (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499: their ExactSubstr dedup
removes 50-token-plus repeats found via a corpus suffix array; they
note removing all copies vs all-but-one makes little difference to
the trained model, and this module removes all copies).

The reference has no substring-dedup analog — this extends the
training-data-pipeline surface (SURVEY §6) below document granularity
(datapipe/dedup.py) and line granularity (datapipe/linedup.py); its
validation cousin is the cross-row uniqueness machinery (A5,
/root/reference/index.js:389-399) applied to overlapping token
windows: "a >= k-token window repeating anywhere is redundant and
must go".

The suffix-array formulation is replaced by the k-gram identity: a
duplicated substring of length >= k contains a duplicated k-gram at
EVERY offset, and conversely any token inside a duplicated k-gram
occurrence lies in a duplicated >= k-token substring. So "token t is
removed iff some k-gram occurrence covering t is corpus-duplicated"
removes exactly the union of duplicated >= k-token spans — the same
set of tokens ExactSubstr removes, computed relationally.

Spark-first shape — and the 100 TB story:

- Stage 1 (census): positional k-gram 60-bit hashes are built in-row
  from a STAGED token array (one transform; the slice lambda reads
  only attributes — see datapipe/repetition.py for the re-evaluation
  trap), then exploded and counted. Map-side partial aggregation
  collapses repeats within each input partition, so the census
  shuffle carries one row per (partition, distinct gram) — the same
  shape as the linedup census. Occurrences are counted TOTAL (not
  per-doc-distinct): within-document repeats are duplicates too.
- Stage 2 (per-doc hit sets): per-doc DISTINCT gram hashes (a much
  smaller explode) join the duplicated-gram census on the hash — at
  small scale AQE broadcasts the census; at corpus scale this is a
  hash-partitioned join whose traffic is bounded by distinct grams,
  not tokens — and collect back to one array per touched document.
- Stage 3 (rewrite): ONE corpus-side join on doc_id attaches each
  touched document's hit set (LEFT, so untouched documents stream
  through and rewrite to themselves), then the covered-token mask,
  span merge, and text rebuild are all in-row array folds — positions
  never leave the row. The corpus-wide rewrite join is the
  operator's irreducible cost, the relational analog of the
  suffix-array sort in the reference implementation of ExactSubstr.
- The 60-bit md5 hash space means ~4e5 expected false gram
  collisions at 10^12 corpus grams (birthday bound) — a ~1e-7
  over-removal rate, negligible against the ~1% duplication rates
  measured by Lee et al.; swap _md5_int for the full 32-hex md5
  string column if exactness at that scale is required (census
  shuffle width 4x).

Every per-element lambda reads only materialized ATTRIBUTES, and
every staged array is consumed by >= 2 expressions in the projection
above it so CollapseProject cannot re-inline it (the O(n^2)
re-evaluation trap; plan-asserted in tests/test_substringdup.py).
Output text is whitespace-normalized (tokens rejoined with single
spaces), matching the DuckDB oracle exactly.

Known at-scale corner (disclosed): the per-gram flag lookup is
array_contains over the per-doc hit set — O(n_grams x |hit set|)
per row, quadratic for a LONG document whose every gram is
duplicated (i.e. a verbatim full-document copy). Real pipelines run
EXACT document dedup before substring dedup (Lee et al. do; so does
corpus_curation), which removes exactly that shape; after it, hit
sets are span-sized and the scan is effectively O(n x spans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sjot_spark.datapipe.dedup import _md5_int, blank_tokens_of


def gram_starts_of(toks: Column, k: int) -> Column:
    """Positional k-gram 60-bit hashes (array<long>, one per start
    offset, NOT deduplicated — positions matter) from a STAGED token
    array attribute; empty array when the document has fewer than k
    tokens. The lambda slices ``toks`` per element (O(k) each, O(n*k)
    per row — the same order as hashing the text once)."""
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(m - k, F.lit(0))),
        lambda i: _md5_int(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return F.when(m >= k, grams).otherwise(F.array().cast("array<long>"))


def duplicated_grams(
    grams_df: DataFrame, grams_col: str = "_grams", min_count: int = 2
) -> DataFrame:
    """Census stage: gram hashes occurring >= min_count times in the
    whole corpus (within-doc repeats included) -> (gram_hash, n_occ).
    explode_OUTER so Catalyst infers no size>0 pre-filter to push
    below the caller's staged token/gram projections (a pushed filter
    re-inlines the gram build into per-element lambdas — see
    dedup.exploded_shingles); the NULL row an empty gram array emits
    is dropped right above the generate."""
    return (
        grams_df.select(F.explode_outer(F.col(grams_col)).alias("gram_hash"))
        .where(F.col("gram_hash").isNotNull())
        .groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= min_count)
    )


def remove_duplicated_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Rewrite every document with corpus-duplicated >= k-token spans
    removed. Returns (id, *carry_cols, n_tok, n_dup_starts,
    n_removed, text_clean):

    - n_tok        — whitespace token count (0 for blank text),
    - n_dup_starts — k-gram start offsets whose gram is duplicated,
    - n_removed    — tokens inside some duplicated k-gram occurrence
                     (the union of duplicated spans, merged),
    - text_clean   — surviving tokens rejoined with single spaces
                     (whitespace-normalized; "" when everything goes).

    ``carry_cols`` are per-document columns passed through so callers
    skip a re-attach join. Documents with no duplicated gram rewrite
    to their normalized selves via the LEFT hit-set join."""
    staged = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        blank_tokens_of(F.col(text_col)).alias("_toks"),
    )
    # _toks consumers here: size + gram lambda + pass-through (>= 2,
    # so the split stays staged)
    g = staged.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col("_toks"),
        F.size("_toks").cast("long").alias("n_tok"),
        gram_starts_of(F.col("_toks"), k).alias("_grams"),
    )

    dup = duplicated_grams(g, "_grams", min_count)
    # per-doc duplicated START POSITIONS (r7): the join runs on the
    # positional gram explode rather than the per-doc distinct hash
    # set, so the rewrite side below needs only the TOKENS — the gram
    # hashes are built twice (census + hits), not three times, and the
    # rewrite's flag lookup probes a small sorted int array instead of
    # re-hashing every gram against a 60-bit hash set
    hits = (
        g.select(
            F.col(id_col),
            F.posexplode_outer(F.col("_grams")).alias("pos", "gram_hash"),
        )
        .where(F.col("gram_hash").isNotNull())
        .join(dup.select("gram_hash"), "gram_hash")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_dup_starts"))
    )

    joined = staged.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col("_toks"),
        F.size("_toks").cast("long").alias("n_tok"),
    ).join(hits, id_col, "left")
    # flag each gram start; _dup_starts NULL (untouched doc) -> all
    # zero. Values identical to the former hash-set formulation: flag
    # at start i == (i ∈ dup_starts).
    m = F.size("_toks")
    flagged = joined.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        "n_tok",
        "_toks",
        F.coalesce(F.size("_dup_starts"), F.lit(0)).cast("long")
        .alias("n_dup_starts"),
        F.when(
            m >= k,
            F.transform(
                F.sequence(F.lit(0), m - k),
                lambda i: F.coalesce(
                    F.array_contains(F.col("_dup_starts"), i),
                    F.lit(False),
                ).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>")).alias("_flags"),
    )
    # token t covered iff any duplicated gram starts in
    # [t-k+1, min(t, n-k)] — an O(k) slice-max per token over the
    # staged flag array. _flags consumers: the cov lambda + the
    # ng guard (2, stays staged).
    ng = F.size("_flags")

    def cov(ti: Column) -> Column:
        lo = F.greatest(ti - (k - 1), F.lit(0))
        hi = F.least(ti, ng - 1)
        return (
            F.array_max(F.slice(F.col("_flags"), lo + 1, hi - lo + 1))
            == 1
        ).cast("int")

    covered = flagged.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        "n_tok",
        "_toks",
        "n_dup_starts",
        F.when(
            ng == 0, F.array().cast("array<int>")
        ).otherwise(
            F.transform(F.sequence(F.lit(0), F.size("_toks") - 1), cov)
        ).alias("_cov"),
    )
    # _cov consumers: the keep filter + n_removed (2, stays staged)
    final = covered.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        "n_tok",
        "n_dup_starts",
        F.aggregate(
            F.col("_cov"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("n_removed"),
        F.array_join(
            F.filter(
                F.col("_toks"),
                lambda x, i: F.coalesce(
                    F.get(F.col("_cov"), i), F.lit(0)
                ) == 0,
            ),
            " ",
        ).alias("text_clean"),
    )
    return final
