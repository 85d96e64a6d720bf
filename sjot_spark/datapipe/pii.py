"""PII detection and redaction — regex scan + replace as pure Column
expressions: one projection, zero shuffle.

Training-data pipelines scrub personally-identifying strings before
corpora ship; the standard first pass is pattern-based (emails,
phone numbers, IP addresses), with NER models layered on later. This
module is that first pass, Spark-first: `regexp_count` for detection
and an ordered `regexp_replace` chain for redaction, both JVM-side
codegen (no Python in the hot path). The reference has no PII analog
— this extends the training-data-pipeline surface (SURVEY §6); its
validation cousin is the P7/P8 regex-type machinery
(/root/reference/index.js:696-743): the same anchored-pattern
semantics, inverted from "reject non-matching values" to "find and
remove matching spans".

Cross-engine rules (the DuckDB oracle must agree exactly):

- Patterns use only syntax with identical semantics in Java regex
  (Spark) and RE2 (DuckDB): literal classes, bounded repetition,
  greedy leftmost matching. No backreferences, no lookaround, no \\b.
- Redaction applies patterns in a FIXED order (email, phone, ipv4) so
  overlapping spans resolve identically; replacement tokens contain
  no digits or '@' so a redacted span can never re-match a later
  pattern.
- Metrics are integer counts and length deltas only.

100 TB shape: detection+redaction is a stateless projection that
pipelines with the scan (zero shuffle); the rollup is one map-side
combined groupBy on a low-cardinality key. Regex evaluation is the
per-row cost — the same order as the validation engine's P7 checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: redaction applies top-to-bottom; tokens are digit-free and
# '@'-free so earlier redactions never create later matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts over the raw text (long-typed)."""
    return {
        kind: F.regexp_count(text, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII span with its bracketed token, in the fixed
    PII_PATTERNS order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group PII rollup: document counts, per-kind match counts,
    docs with any PII, characters removed by redaction, and residual
    matches after redaction (must be 0 — asserted by the oracle twin,
    not silently assumed).

    One projection + one low-cardinality groupBy (map-side combine);
    nothing else shuffles."""
    t = F.col(text_col)
    counts = pii_counts(t)
    red = redact_pii(t)
    residual = None
    for kind, pat, _ in PII_PATTERNS:
        c = F.regexp_count(red, F.lit(pat)).cast("long")
        residual = c if residual is None else residual + c
    any_pii = None
    for c in counts.values():
        any_pii = c if any_pii is None else any_pii + c
    per_doc = df.select(
        F.col(group_col).alias("grp"),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        (any_pii > 0).cast("long").alias("has_pii"),
        (F.length(t) - F.length(red)).cast("long").alias("chars_removed"),
        residual.alias("residual"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(f"n_{kind}").alias(f"n_{kind}")
            for kind, _, _ in PII_PATTERNS
        ],
        F.sum("has_pii").alias("docs_with_pii"),
        F.sum("chars_removed").alias("chars_removed"),
        F.sum("residual").alias("residual_matches"),
    ]
    return per_doc.groupBy("grp").agg(*aggs)
