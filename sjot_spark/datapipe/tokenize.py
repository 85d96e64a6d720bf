"""Deterministic tokenization: text -> (tokens:array<int>, n_tok) in
the engine's input_hint shape.

This module's "tokenizer" is whitespace split + md5-derived vocab-id
hashing — engine-independent ids, so the pipeline is DuckDB-oracle
checkable end to end. The BPE swap point documented here since r2 is
now CLOSED: datapipe.bpe provides a real Sennrich merge-table trainer
(Spark pair-count aggregation + bounded driver merge loop) and a pure
Column-expression apply path (bpe_segment_expr /
tokenize_documents_bpe) that plugs into the same pretokenize() split
below, with its own value-exact DuckDB oracle (bpe_tokenize_stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VOCAB = 50257


def token_id_expr(token: Column, vocab: int = VOCAB) -> Column:
    """The engine-independent vocab-id hash of ONE token: md5 ->
    60-bit int -> pmod(vocab). The single source of truth shared by
    token_ids, the BPE pre-token stats query, and (via the same
    formula) every DuckDB oracle twin:
    ('0x'||substr(md5(x),1,15))::BIGINT % vocab."""
    return F.pmod(
        F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long"),
        F.lit(vocab),
    ).cast("int")


def token_ids(text: Column, vocab: int = VOCAB) -> Column:
    """array<int> of hashed token ids; empty/blank text -> []."""
    toks = F.split(F.trim(text), r"\s+")
    ids = F.transform(toks, lambda t: token_id_expr(t, vocab))
    return F.when(F.length(F.trim(text)) == 0,
                  F.array().cast("array<int>")).otherwise(ids)


# GPT-2-flavor BPE pre-tokenization pattern, lookahead-free so the
# SAME pattern behaves identically under Java regex (Spark) and RE2
# (DuckDB) — both are leftmost-first on alternation. Whitespace is an
# EXPLICIT class, not \s: Java's \s includes \x0B (vertical tab),
# RE2's does not, and the two engines must agree byte-for-byte.
# Pieces: contraction suffixes, optionally-space-prefixed letter runs,
# digit runs, punctuation runs, whitespace runs (dropped post-hoc).
_WS = r" \t\n\x0b\f\r"
BPE_PRETOKEN_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
                   rf"| ?[^{_WS}\p{{L}}\p{{N}}]+|[{_WS}]+")
WS_RUN_RE = rf"^[{_WS}]+$"


def pretokenize(text: Column) -> Column:
    """BPE-ish pre-token array (the split a byte-pair encoder merges
    within). Whitespace-run tokens are dropped; leading spaces stay
    attached to word tokens exactly like GPT-2's pre-tokenizer."""
    toks = F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0)
    return F.filter(toks, lambda t: ~t.rlike(WS_RUN_RE))


def tokenize_documents(df: DataFrame, vocab: int = VOCAB) -> DataFrame:
    """documents -> input_hint-shaped sequences table
    (doc_id, tokens, n_tok, source)."""
    ids = token_ids(F.col("text"), vocab)
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        ids.alias("tokens"),
        F.size(ids).cast("int").alias("n_tok"),
        F.col("source"),
    )
