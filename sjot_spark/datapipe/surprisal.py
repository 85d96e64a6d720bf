"""Unigram LM surprisal scoring — the CCNet-style reference-corpus
quality filter (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data": score each document by its
perplexity under a language model trained on a reference corpus, then
keep/bucket by score) reduced to a unigram model with INTEGER-EXACT
log2-bucket surprisal so the DuckDB oracle compares bit-for-bit.

Per-token surprisal is bucketed at whole bits:
``s(tok) = floor(log2(total_tokens)) - floor(log2(count(tok)))``
(0 for the most frequent token, growing ~1 per halving of frequency);
out-of-vocabulary tokens get the max bucket + 1. ``floor(log2(n))``
is computed as ``length(bin(n)) - 1`` — pure integer/string ops that
Spark and DuckDB evaluate identically (no float log anywhere; the
cross-engine rule). A KenLM/real-LM scorer slots in at the census
boundary: everything downstream only needs a (token, count) relation,
exactly like the BPE trainer's merge-table swap point
(datapipe/bpe.py).

The reference has no corpus-statistics analog — this extends the
training-data-pipeline surface (SURVEY §6) with the one classic
quality filter that uses CORPUS frequencies rather than document-
internal signals (datapipe/repetition.py, text.py); its validation
cousin is the value-domain referential check C7 (engine.py:210-229:
every value must resolve against a dimension relation — here every
token resolves against the vocabulary, and non-resolving tokens are
scored as OOV instead of rejected).

Spark-first shape — and the 100 TB story:

- The census is wordcount: explode + map-side-combined groupBy, the
  shuffle bounded by (partition x distinct token), output truncated
  to the top ``max_vocab`` tokens by (count DESC, token ASC) — a
  TOTAL order, so the cut is deterministic in both engines. Vocab
  truncation is what real pipelines do (KenLM fixed vocab + OOV
  bucket) and is what makes the scoring side broadcastable at any
  corpus scale.
- Scoring explodes token occurrences, broadcast-joins the vocab
  (map-side, nothing shuffles at the join — LEFT, so OOV tokens
  survive with NULL count), and re-aggregates per document with
  map-side combine: the only shuffle carries one row per document
  per input partition. The explode itself never shuffles — it
  pipelines between the scan and the partial aggregate.
- Blank documents score NULL (no tokens to average); the permille
  mean uses explicit FLOOR for engine-exact integer division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sjot_spark.datapipe.dedup import blank_tokens_of


def _floor_log2(c: Column) -> Column:
    """floor(log2(n)) for n >= 1, as length(bin(n)) - 1 — integer
    exact, identical in DuckDB."""
    return (F.length(F.bin(c)) - 1).cast("long")


def token_census(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 65536,
) -> DataFrame:
    """Corpus unigram counts, truncated to the ``max_vocab`` most
    frequent tokens -> (token, cnt), deterministically tie-broken by
    (cnt DESC, token ASC). The census is the LM swap point: any
    (token, cnt) relation — e.g. from a reference corpus rather than
    the scored corpus itself — drops in unchanged."""
    toks = docs.select(
        F.explode_outer(blank_tokens_of(F.col(text_col))).alias("token")
    ).where(F.col("token").isNotNull())
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(max_vocab)
    )


def score_documents(
    docs: DataFrame,
    census: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document integer surprisal under the unigram model:
    (id, *carry_cols, n_tok, n_oov, bits_sum, score_permille) where
    bits_sum = sum of per-occurrence surprisal buckets and
    score_permille = floor(1000 * bits_sum / n_tok) (NULL for blank
    documents). ``census`` is broadcast — cap it with max_vocab.

    total_tokens (the model's denominator) is the census total — the
    vocabulary's own mass, so a truncated vocab stays a proper
    frequency table and the scorer needs no second corpus pass."""
    exploded = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode_outer(blank_tokens_of(F.col(text_col))).alias("token"),
    )
    # one-row totals relation: keeps the log2(total) bucket inside the
    # engine (no driver collect), broadcast alongside the vocab
    totals = census.agg(
        _floor_log2(F.sum("cnt")).alias("_b_total")
    )
    scored = (
        exploded.join(broadcast(census), "token", "left")
        .join(broadcast(totals))
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            F.col("token"),
            # in-vocab: B - floor(log2(cnt)); OOV: B + 1
            F.when(F.col("token").isNull(), F.lit(None).cast("long"))
            .when(
                F.col("cnt").isNotNull(),
                F.col("_b_total") - _floor_log2(F.col("cnt")),
            )
            .otherwise(F.col("_b_total") + 1)
            .alias("bits"),
            F.when(
                F.col("token").isNotNull() & F.col("cnt").isNull(), 1
            ).otherwise(0).alias("_oov"),
        )
    )
    return (
        scored.groupBy(id_col, *carry_cols)
        .agg(
            # count(token) skips the single NULL row a blank doc emits
            F.count(F.col("token")).cast("long").alias("n_tok"),
            F.sum("_oov").cast("long").alias("n_oov"),
            F.sum("bits").cast("long").alias("bits_sum"),
        )
        .select(
            id_col,
            *carry_cols,
            "n_tok",
            "n_oov",
            "bits_sum",
            F.when(
                F.col("n_tok") > 0,
                F.expr("(1000 * bits_sum) div n_tok"),
            ).cast("long").alias("score_permille"),
        )
    )


# ------------------------------------------------------------------ #
# Bigram with stupid backoff (Wenzek-faithful one step up from the    #
# unigram reduction; Brants et al. 2007's backoff made integer-exact) #
# ------------------------------------------------------------------ #

BACKOFF_PENALTY_BITS = 1  # integer analog of stupid backoff's alpha=0.4


def _exploded_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per token occurrence with its PREDECESSOR:
    (id, *carry, prev, token); the first token of a document carries
    prev=NULL, a blank document emits one all-NULL marker row (so
    per-doc aggregation sees every document, mirroring
    explode_outer's empty-array row). Built in-row — the prev array
    is a shifted copy of the token array zipped back against it — so
    positional pairing needs NO per-doc shuffle (a window lag would
    repartition the corpus by doc)."""
    staged = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        blank_tokens_of(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    prev_arr = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    pairs = F.zip_with(
        prev_arr, toks,
        lambda p, t: F.struct(p.alias("prev"), t.alias("token")),
    )
    return (
        staged.select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            F.explode_outer(pairs).alias("_pt"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            F.col("_pt.prev").alias("prev"),
            F.col("_pt.token").alias("token"),
        )
    )


def bigram_census(
    docs: DataFrame,
    unigram: DataFrame,
    text_col: str = "text",
    max_bigrams: int = 1 << 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus bigram counts restricted to prefixes INSIDE the (already
    truncated) unigram vocab, carrying the prefix's unigram count ->
    (prev, token, big_cnt, cnt_prev), truncated to the ``max_bigrams``
    most frequent under the total order (big_cnt DESC, prev ASC,
    token ASC). Restricting at build time is what keeps the
    conditional well-defined (big_cnt <= cnt_prev always, so the
    bucket difference is never negative) and the broadcast bounded.
    Like token_census this is the LM swap point — any
    (prev, token, big_cnt, cnt_prev) relation drops in."""
    pairs = _exploded_pairs(docs, id_col, text_col)
    counts = (
        pairs.where(F.col("prev").isNotNull() & F.col("token").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("big_cnt"))
    )
    prefix = unigram.select(
        F.col("token").alias("prev"), F.col("cnt").alias("cnt_prev"))
    return (
        counts.join(broadcast(prefix), "prev")
        .orderBy(F.col("big_cnt").desc(), F.col("prev").asc(),
                 F.col("token").asc())
        .limit(max_bigrams)
    )


def unigram_bigram_census(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 65536,
    max_bigrams: int = 1 << 20,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Both censuses from ONE tokenization pass over the corpus (r7;
    guide §2.3/§2.4): the (prev, token) occurrence counts subsume the
    unigram counts — ``cnt(token) = Σ over prev (incl. the NULL
    first-token prev) of cnt(prev, token)`` — so one map-side-combined
    aggregation over the exploded pairs replaces the two separate
    corpus passes of ``token_census`` + ``bigram_census``. Returns
    (unigram, bigrams) value-identical to those functions (same
    counts, same deterministic total-order cuts). The intermediate
    pair-count relation is census-sized (distinct observed bigrams,
    not occurrences) and is materialized once (lazy localCheckpoint)
    because both cuts consume it."""
    pairs = _exploded_pairs(docs, id_col, text_col)
    paircounts = (
        pairs.where(F.col("token").isNotNull())
        .groupBy("prev", "token")
        .agg(F.count(F.lit(1)).alias("big_cnt"))
        .localCheckpoint(eager=False)
    )
    unigram = (
        paircounts.groupBy("token")
        .agg(F.sum("big_cnt").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(max_vocab)
    )
    prefix = unigram.select(
        F.col("token").alias("prev"), F.col("cnt").alias("cnt_prev"))
    bigrams = (
        paircounts.where(F.col("prev").isNotNull())
        .join(broadcast(prefix), "prev")
        .orderBy(F.col("big_cnt").desc(), F.col("prev").asc(),
                 F.col("token").asc())
        .limit(max_bigrams)
    )
    return unigram, bigrams


def score_documents_bigram(
    docs: DataFrame,
    unigram: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document integer surprisal under a bigram model with stupid
    backoff: (id, *carry, n_tok, n_oov, n_backoff, bits_sum,
    score_permille).

    Per occurrence, in whole-bit buckets (floor-log2 throughout, the
    cross-engine rule):
    - bigram hit:  ``b(cnt_prev) - b(big_cnt)`` — the conditional
      -log2 c(ab)/c(a) at bucket precision;
    - backoff (prev present, bigram unseen): ``BACKOFF_PENALTY_BITS +
      unigram bucket`` (OOV keeps its max-bucket+1 rule);
    - first token (no prev): plain unigram bucket, no penalty.

    Both censuses broadcast (cap them with max_vocab / max_bigrams);
    the only shuffle is the per-document re-aggregation, exactly as in
    :func:`score_documents`."""
    ex = _exploded_pairs(docs, id_col, text_col, carry_cols)
    totals = unigram.agg(_floor_log2(F.sum("cnt")).alias("_b_total"))
    j = (
        ex.join(broadcast(bigrams), ["prev", "token"], "left")
        .join(broadcast(unigram), "token", "left")
        .join(broadcast(totals))
    )
    uni_bits = F.when(
        F.col("cnt").isNotNull(),
        F.col("_b_total") - _floor_log2(F.col("cnt")),
    ).otherwise(F.col("_b_total") + 1)
    scored = j.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.col("token"),
        F.when(F.col("token").isNull(), F.lit(None).cast("long"))
        .when(
            F.col("big_cnt").isNotNull(),
            _floor_log2(F.col("cnt_prev")) - _floor_log2(F.col("big_cnt")),
        )
        .when(F.col("prev").isNotNull(),
              F.lit(BACKOFF_PENALTY_BITS) + uni_bits)
        .otherwise(uni_bits)
        .alias("bits"),
        F.when(
            F.col("token").isNotNull() & F.col("cnt").isNull(), 1
        ).otherwise(0).alias("_oov"),
        F.when(
            F.col("token").isNotNull() & F.col("prev").isNotNull()
            & F.col("big_cnt").isNull(), 1
        ).otherwise(0).alias("_backoff"),
    )
    return (
        scored.groupBy(id_col, *carry_cols)
        .agg(
            F.count(F.col("token")).cast("long").alias("n_tok"),
            F.sum("_oov").cast("long").alias("n_oov"),
            F.sum("_backoff").cast("long").alias("n_backoff"),
            F.sum("bits").cast("long").alias("bits_sum"),
        )
        .select(
            id_col,
            *carry_cols,
            "n_tok",
            "n_oov",
            "n_backoff",
            "bits_sum",
            F.when(
                F.col("n_tok") > 0,
                F.expr("(1000 * bits_sum) div n_tok"),
            ).cast("long").alias("score_permille"),
        )
    )
