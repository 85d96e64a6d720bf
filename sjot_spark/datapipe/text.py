"""Text-analysis operators for training-data pipelines: token
counting, quality scoring, language ID, fingerprinting.

All built-in pyspark.sql.functions (JVM-side, codegen) — no Python in
the hot path. Each has an ANSI-SQL twin in __spark_entry__.oracle_sql
so results are independently checkable in DuckDB; metrics are kept
integer/decimal-valued so cross-engine comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker-word lists for the n-gram/stopword
# heuristic language identifier (shared with the SQL oracle)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
}

STOPWORDS = ["the", "a", "of", "and"]


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_occurrences(text: Column, word: str) -> Column:
    """Count occurrences of a word delimited by spaces/edges.
    Implemented as split-count so the DuckDB oracle can mirror it
    exactly with the same delimiter semantics."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return F.size(F.split(padded, f" {word} ", -1)) - 1


def stopword_hits(text: Column) -> Column:
    out = None
    for w in STOPWORDS:
        c = word_occurrences(text, w)
        out = c if out is None else out + c
    return out


def quality_class(n_chars: Column, n_tokens: Column) -> Column:
    """Deterministic quality bucket from simple surface statistics —
    the integer-valued analog of a [0,1] quality score."""
    return (
        F.when(n_chars < 100, "short")
        .when(n_chars < 300, "mid")
        .otherwise("long")
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(
            (word_occurrences(text, w) for w in words), start=F.lit(0)
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Marker-word language guess: the language with the highest
    marker count wins; ties and all-zero scores resolve to 'und'.
    Tie-break is deterministic: strictly-greater-than-all-others."""
    scores = lang_scores(text)
    out = F.lit("und")
    expr = None
    for lang, s in scores.items():
        others = [o for l2, o in scores.items() if l2 != lang]
        cond = (s > 0)
        for o in others:
            cond = cond & (s > o)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise(out)


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint (md5 — identical function
    exists in DuckDB, so exact-dedup results are oracle-checkable)."""
    return F.md5(text)


def profile_documents(df: DataFrame) -> DataFrame:
    """Per-source text profile: integer-valued metrics only."""
    return (
        df.select(
            "source",
            token_count(F.col("text")).alias("n_tokens"),
            stopword_hits(F.col("text")).alias("stop_hits"),
            F.col("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("stop_hits").alias("sum_stop_hits"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


def quality_score_1000(text: Column, n_chars: Column) -> Column:
    """Integer quality score in [0, 1000] from exact surface
    statistics (integer arithmetic only, so any engine reproduces it
    bit-for-bit): length component (capped chars), lexical diversity
    (distinct/total tokens), and stopword presence."""
    toks = F.split(F.trim(text), r"\s+")
    n_tok = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(toks))
    n_distinct = F.when(
        F.length(F.trim(text)) == 0, F.lit(0)
    ).otherwise(F.size(F.array_distinct(toks)))
    len_comp = F.least(F.lit(400), n_chars)                 # 0..400
    # diversity: floor(400 * distinct / total); explicit floor —
    # engines disagree on double->int cast (truncate vs round)
    div_comp = F.when(
        n_tok > 0, F.floor(n_distinct * 400 / n_tok)
    ).otherwise(0).cast("long")                             # 0..400
    stop_comp = F.least(F.lit(200), stopword_hits(text) * 20)  # 0..200
    return (len_comp + div_comp + stop_comp).cast("long")
