"""Source mixing — deterministic token-budget-weighted sampling per
source, the "data mixing" step of a pre-training pipeline: given a
total token budget and per-source mixture weights (the Pile /
GPT-3-style sampling proportions), compute a per-source keep-rate and
take a deterministic hash sample of documents that lands each source
at its token allocation.

The reference has no sampling analog — this extends the
training-data-pipeline surface (SURVEY §6) alongside pack/sampling
(datapipe/pack.py); its nearest validation cousins are the range
checks P5 (/root/reference/index.js:1364-1416: value within declared
bounds — here the computed rate is clamped into [0, 1e6] ppm) and the
referential-integrity check C7 (engine.py:210-229: every source must
resolve against a dimension table — here the weights table).

Spark-first shape — and the 100 TB story:

- Per-source token totals are ONE map-side-combined aggregate whose
  output is source-cardinality tiny (tens to thousands of rows at any
  corpus scale). Rates are computed on that tiny relation, the
  weights table and the 1-row budget relation join broadcast, and the
  rate table broadcasts back onto the corpus — the keep decision is a
  pipelined filter fused with the scan. The corpus is never shuffled:
  the ONLY wide operation in the whole pipeline is the stats
  aggregate's |sources|-row exchange.
- The keep decision is pmod(md5(doc_id), 1e6) < rate_ppm —
  engine-independent (md5 is the shared hash; DuckDB twin
  ('0x'||substr(md5(x),1,15))::BIGINT), reproducible across runs and
  cluster sizes, and needs no per-partition state or RNG.
- All rate math is INTEGER END TO END — permille weights, ppm rates,
  and the `div`/`%` operators, never floor over a float division
  (double loses exactness past 2^53, so floor(a/b) can be off by one
  at int64 magnitudes; DuckDB's `//` and Spark's `div` agree
  exactly). floor(r*1e6/t) would overflow int64 once per-source
  tokens pass ~9.2e12, so the rate is built in two base-1000 digit
  steps — r*1e6 div t = s1*1000 + s2 with s1 = r*1000 div t,
  s2 = ((r*1000) % t)*1000 div t — an exact identity that is
  int64-safe up to ~9.2e15 tokens per source (≈ 10 PB of text); both
  engines evaluate the same decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sjot_spark.datapipe.dedup import _md5_int

PPM = 1_000_000

# exact integer rate: (b div t)*1e6 + two base-1000 digit steps of
# (b % t)*1e6 div t; CASE guards the div-by-zero branch (ANSI-safe).
# The cap is {cap} ppm: 1e6 for pure downsampling (mix_rates'
# default), max_epochs*1e6 when the mixture may repeat sources.
_RATE_SQL = """
CASE WHEN tokens_input <= 0 OR budget_tokens <= 0 THEN CAST(0 AS BIGINT)
     ELSE LEAST(
       CAST({cap} AS BIGINT),
       (budget_tokens div tokens_input) * CAST(1000000 AS BIGINT)
       + ((budget_tokens % tokens_input) * 1000 div tokens_input) * 1000
       + ((((budget_tokens % tokens_input) * 1000) % tokens_input)
          * 1000 div tokens_input))
END
"""


def mix_rates(
    docs: DataFrame,
    weights: DataFrame,
    budget: DataFrame,
    source_col: str = "source",
    ntok_col: str = "n_tok",
    max_epochs: int = 1,
) -> DataFrame:
    """Per-source keep-rates for a token-budget mixture:
    (source, w_permille, n_input, tokens_input, budget_tokens,
    rate_ppm).

    ``weights`` is a (source, w_permille) dimension table — sources
    without a row get weight 0 (dropped, the referential-integrity
    posture: an unknown source contributes nothing). ``budget`` is a
    ONE-ROW (total_budget:long) relation so the target stays inside
    the engine (no driver collect). budget_tokens =
    floor(total_budget * w_permille / 1000); rate_ppm =
    min(max_epochs * 1e6, floor(budget_tokens * 1e6 / tokens_input))
    — a source whose corpus is smaller than its allocation keeps
    everything (rate 1e6); permille/ppm integer math throughout.

    ``max_epochs`` > 1 lets the rate exceed 1e6 ppm so a source can
    be REPEATED (the Pile/LLaMA-style epoch upsampling of small
    high-quality sources); feed such rates to
    :func:`mix_sample_epochs`, which emits one row per copy. The cap
    is a scale guardrail as much as a recipe knob: it bounds the
    explode fan-out per input row, so a tiny source with a huge
    weight can never blow a partition up by more than max_epochs."""
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    stats = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col(ntok_col)).cast("long").alias("tokens_input"),
    )
    joined = (
        stats.join(broadcast(weights), source_col, "left")
        .join(broadcast(budget))
        .select(
            source_col,
            F.coalesce(F.col("w_permille"), F.lit(0)).cast("long")
            .alias("w_permille"),
            "n_input",
            "tokens_input",
            "total_budget",
        )
        .select(
            source_col,
            "w_permille",
            "n_input",
            "tokens_input",
            F.expr("total_budget * w_permille div 1000").cast("long")
            .alias("budget_tokens"),
        )
    )
    rate_sql = _RATE_SQL.format(cap=max_epochs * PPM)
    return joined.withColumn("rate_ppm", F.expr(rate_sql).cast("long"))


def mix_sample(
    docs: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """The documents the mixture keeps: deterministic md5-ppm hash
    sample at each source's rate. ``rates`` is the tiny relation from
    :func:`mix_rates` (broadcast); the filter pipelines with the
    corpus scan — zero corpus shuffle."""
    return (
        docs.join(
            broadcast(rates.select(source_col, "rate_ppm")), source_col
        )
        .where(
            F.pmod(_md5_int(F.col(id_col).cast("string")), F.lit(PPM))
            < F.col("rate_ppm")
        )
        .drop("rate_ppm")
    )


def mix_sample_epochs(
    docs: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    epoch_col: str = "epoch",
) -> DataFrame:
    """The mixture corpus when rates may exceed 1e6 ppm (epoch
    upsampling): one output row per (kept document, epoch), epoch
    numbered 0..n_copies-1.

    n_copies = rate_ppm div 1e6 full epochs, plus one more iff
    pmod(md5(doc_id), 1e6) < rate_ppm % 1e6 — the SAME hash rule as
    :func:`mix_sample`, so max_epochs=1 rates reproduce mix_sample's
    corpus exactly (with epoch 0 everywhere) and a rate of 2.4e6
    keeps every doc twice and a deterministic 40% of docs a third
    time. Per-doc fractional selection (not per-source block copy)
    means the partial epoch is an unbiased sample of the source.

    Spark shape: the tiny rates relation joins broadcast, n_copies is
    a pipelined integer projection, and the repeat is explode over
    sequence(0, n_copies-1) fused with the scan — the corpus never
    shuffles and the fan-out per input row is bounded by mix_rates'
    max_epochs cap. The sequence is guarded by a WHEN so rows with
    n_copies = 0 build an EMPTY array (explode then drops them)
    rather than feeding sequence a negative bound, which descends
    ([0,-1]) instead of returning empty."""
    if epoch_col in docs.columns:
        raise ValueError(
            f"docs already has a column named {epoch_col!r}; "
            "pass a different epoch_col")
    h = F.pmod(_md5_int(F.col(id_col).cast("string")), F.lit(PPM))
    n_copies = (
        F.expr(f"rate_ppm div {PPM}").cast("int")
        + (h < F.pmod(F.col("rate_ppm"), F.lit(PPM))).cast("int")
    )
    seq = F.when(
        n_copies > 0,
        F.sequence(F.lit(0), n_copies - F.lit(1), F.lit(1)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.join(
            broadcast(rates.select(source_col, "rate_ppm")), source_col
        )
        .select(*docs.columns, F.explode(seq).alias(epoch_col))
    )
