"""Census drift between corpus snapshots — the crawl-intake gate
that asks "did the incoming batch shift the token distribution?"
before a new snapshot is merged into the training corpus. Every
periodic-crawl pipeline runs some form of this (the CCNet/Gopher
lineage monitors reference-corpus perplexity drift; PSI-style
population-stability checks are the tabular-ML standard): a sudden
rise in new-token mass or L1 share distance flags scraper breakage,
spam floods, or language mix shifts cheaply, BEFORE expensive
downstream stages run.

The reference has no corpus-statistics analog — this extends the
training-data-pipeline surface (SURVEY §6). Its validation cousins
are the distribution-drift checks (plan/drift.py: histogram chi²/KS/
PSI per column — here the "histogram" is the token census itself)
and the value-domain referential check C7 (engine.py:210-229) —
tokens of snapshot B resolve against snapshot A's vocabulary, and
the non-resolving mass is the drift signal rather than a rejection.

Everything is INTEGER-EXACT for the cross-engine oracle: shares are
ppm computed with the same two-step base-1000 decomposition as
datapipe/mixing.py (cnt*1e6 div total without overflowing int64
until ~9.2e15 tokens per snapshot ≈ 10 PB of text), and the drift
statistic is the L1 distance in ppm — no float division anywhere.

Spark-first shape — and the 100 TB story:

- Each snapshot census is wordcount with map-side combine (shuffle
  bounded by partition x distinct token) truncated to ``max_vocab``
  by the deterministic (cnt DESC, token ASC) total order — bounded
  relations at any corpus scale (surprisal.token_census, reused).
- Snapshot token totals are ONE map-side-combined 1-row aggregate
  each; they stay in-engine as 1-row relations (the mixing-budget
  pattern — no driver collect) and join broadcast.
- The drift table has FULL OUTER semantics over the two bounded
  censuses, but Spark cannot broadcast a full-outer side (it would
  sort-merge even tiny relations), so it is decomposed as
  a LEFT-JOIN b UNION ALL (b ANTI-JOIN a) — algebraically identical,
  and BOTH joins broadcast. The corpus is scanned once per snapshot
  and never shuffled beyond the census aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# exact integer ppm share: cnt*1e6 div total via two base-1000 digit
# steps (int64-safe to ~9.2e15 tokens; the mixing.py decomposition)
_PPM_SQL = """
CASE WHEN {total} <= 0 THEN CAST(0 AS BIGINT)
     ELSE ({cnt} * 1000 div {total}) * 1000
          + (({cnt} * 1000) % {total}) * 1000 div {total}
END
"""


def census_totals(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """ONE-ROW (total_tokens:long) relation for a snapshot — kept
    in-engine so drift math never collects to the driver."""
    from sjot_spark.datapipe.dedup import blank_tokens_of

    # SUM over zero rows is NULL; coalesce to 0 so an empty snapshot
    # yields total_tokens=0 and the ppm CASE's <=0 branch fires (ppm 0,
    # matching the vocab_drift oracle's COALESCEd totals) instead of
    # NULL-ing every share (ADVICE r6)
    return docs.agg(
        F.coalesce(F.sum(F.size(blank_tokens_of(F.col(text_col)))),
                   F.lit(0))
        .cast("long").alias("total_tokens"))


def census_drift(
    census_a: DataFrame,
    total_a: DataFrame,
    census_b: DataFrame,
    total_b: DataFrame,
) -> DataFrame:
    """Per-token drift table between two snapshot censuses:
    (token, cnt_a, cnt_b, ppm_a, ppm_b, delta_ppm).

    ``census_*`` are bounded (token, cnt) relations (the
    surprisal.token_census swap point — a reference-corpus census
    drops in unchanged); ``total_*`` are the 1-row
    :func:`census_totals` relations of the FULL snapshots, so shares
    are honest corpus shares, not shares of the truncated cut.
    Tokens outside one snapshot's cut count 0 there (full-outer
    semantics): a token newly surging into B's top-k shows its whole
    B share as drift — exactly the intake signal wanted. The outer
    union is built as LEFT + ANTI (both broadcast) because Spark has
    no broadcast strategy for full-outer joins."""
    a = census_a.select(
        F.col("token"), F.col("cnt").cast("long").alias("cnt_a"))
    b = census_b.select(
        F.col("token"), F.col("cnt").cast("long").alias("cnt_b"))
    left = a.join(broadcast(b), "token", "left").select(
        "token", "cnt_a",
        F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"))
    only_b = b.join(broadcast(a), "token", "left_anti").select(
        "token", F.lit(0).cast("long").alias("cnt_a"),
        F.col("cnt_b"))
    joined = (
        left.unionByName(only_b)
        .join(broadcast(total_a.select(
            F.col("total_tokens").alias("_ta"))))
        .join(broadcast(total_b.select(
            F.col("total_tokens").alias("_tb"))))
    )
    ppm_a = F.expr(_PPM_SQL.format(cnt="cnt_a", total="_ta"))
    ppm_b = F.expr(_PPM_SQL.format(cnt="cnt_b", total="_tb"))
    return joined.select(
        "token", "cnt_a", "cnt_b",
        ppm_a.cast("long").alias("ppm_a"),
        ppm_b.cast("long").alias("ppm_b"),
        F.abs(ppm_a - ppm_b).cast("long").alias("delta_ppm"),
    )


def census_drift_stats(drift: DataFrame) -> DataFrame:
    """One-row drift verdict over a :func:`census_drift` table:
    (n_shared, n_only_a, n_only_b, l1_ppm, max_delta_ppm). l1_ppm is
    the L1 distance between the two share vectors restricted to the
    censuses' union — the PSI-style stability number an intake gate
    thresholds on (a disjoint-vocabulary pair maxes out near 2e6)."""
    return drift.agg(
        F.sum(((F.col("cnt_a") > 0) & (F.col("cnt_b") > 0))
              .cast("long")).cast("long").alias("n_shared"),
        F.sum(((F.col("cnt_a") > 0) & (F.col("cnt_b") == 0))
              .cast("long")).cast("long").alias("n_only_a"),
        F.sum(((F.col("cnt_a") == 0) & (F.col("cnt_b") > 0))
              .cast("long")).cast("long").alias("n_only_b"),
        F.sum("delta_ppm").cast("long").alias("l1_ppm"),
        F.max("delta_ppm").cast("long").alias("max_delta_ppm"),
    )
