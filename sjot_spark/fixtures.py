"""Deterministic synthetic fixture tables (FIXTURES.md contract).

Generation is fully DISTRIBUTED and seed-deterministic: every value is
a pure function of (row id, seed) built from `spark.range` + xxhash64
column expressions — no driver-side data, no Python UDFs — so the same
generator serves 1k-row unit tests and multi-million-row bench runs.

Mirrors the reference's golden-test pattern (/root/reference/dev/
test.js: one schema covering every feature x one instance exercising
each): a clean table plus one seeded corruption per check class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257
MAX_TOK = 8192

SOURCES = [
    # (name, cumulative weight out of 10000) — skewed, exercises
    # explicit skew handling (web = 55%)
    ("web", 5500), ("books", 7500), ("code", 8500), ("wiki", 9200),
    ("news", 9600), ("forum", 9800), ("legal", 9950), ("synthetic", 10000),
]

SEQUENCE_SPEC = {
    "@root": "#Sequence",
    "Sequence": {
        "doc_id": "(doc\\d{12})",
        "tokens": f"0..{VOCAB - 1}[1,{MAX_TOK}]",
        "n_tok": f"1..{MAX_TOK}",
        "source": "string",
    },
    "@table": {
        "key": "doc_id",
        "partition_by": "source",
        "unique": ["doc_id"],
        "consistent": {"n_tok": "size(tokens)"},
        "ref": {"source": {"dim": "allowed_sources", "column": "source"}},
    },
}


def _hash(seed: int, *cols):
    return F.xxhash64(F.lit(seed), *cols)


def _uniform(seed: int, span, *cols):
    """Deterministic uniform integer in [0, span) from (seed, cols)."""
    return F.pmod(_hash(seed, *cols), F.lit(span) if isinstance(span, int) else span)


def make_sequences(
    spark: SparkSession,
    n_rows: int = 1000,
    seed: int = 42,
    violations: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """The sequences table under validation (input_hint shape:
    doc_id:string, tokens:array<int32>, n_tok:int32, source:string).

    Token lengths are a short/long mixture (16-128 / 512-2048) so the
    length histogram has real shape; token ids uniform over the vocab.
    With ``violations=True``, fixed row ids are corrupted — exactly one
    corruption per check class, each mapping to one check_id.
    """
    return sequence_columns(
        spark.range(n_rows, numPartitions=partitions),
        seed=seed, violations=violations, n_rows=n_rows)


def sequence_columns(
    df: DataFrame,
    seed: int = 42,
    violations: bool = False,
    n_rows: int | None = None,
) -> DataFrame:
    """The make_sequences generator over ANY DataFrame carrying an
    ``id`` long column — the same pure-expression synthesis works on
    ``spark.range`` (batch fixtures) and on STREAMING sources (e.g.
    the rate source's ``value`` renamed to ``id``), which is how the
    streaming micro-bench feeds the validator without files.
    ``violations=True`` needs ``n_rows`` (corruption sites are fixed
    fractions of the table)."""
    if violations and n_rows is None:
        raise ValueError("violations=True needs n_rows")

    # skewed categorical source
    u = _uniform(seed * 7 + 1, 10000, F.col("id"))
    src = F.lit(SOURCES[-1][0])
    expr = None
    for name, cum in SOURCES:
        cond = u < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    src = expr.otherwise(SOURCES[-1][0])

    # length mixture: 75% short [16,128], 25% long [512,2048]
    is_long = _uniform(seed * 7 + 2, 100, F.col("id")) < 25
    n_tok = F.when(
        is_long, F.lit(512) + _uniform(seed * 7 + 3, 1537, F.col("id"))
    ).otherwise(F.lit(16) + _uniform(seed * 7 + 4, 113, F.col("id"))).cast("int")

    df = df.select(
        F.format_string("doc%012d", F.col("id")).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), n_tok - 1),
            lambda j: _uniform(seed * 7 + 5, VOCAB, F.col("id"), j).cast("int"),
        ).alias("tokens"),
        n_tok.alias("n_tok"),
        src.alias("source"),
        F.col("id"),
    )

    if violations and n_rows is not None and n_rows >= 64:
        # fixed corruption sites (FIXTURES.md §1); ids spread over the table
        i = lambda k: (k * n_rows) // 64  # noqa: E731
        vid = {
            "elem_neg": i(1), "elem_big": i(2), "null_tokens": i(3),
            "empty_tokens": i(4), "ntok_off_a": i(5), "ntok_off_b": i(6),
            "ntok_neg": i(7), "dup_same_src_a": i(8), "dup_same_src_b": i(9),
            "dup_cross_src": i(10), "bad_docid": i(11),
            "bad_src_a": i(12), "bad_src_b": i(13),
        }
        did = F.col("id")
        df = df.select(
            # docid_format: one malformed id; docid_unique: two dup pairs
            F.when(did == vid["bad_docid"], "DOC-xyz")
            .when(did == vid["dup_same_src_b"],
                  F.format_string("doc%012d", F.lit(vid["dup_same_src_a"])))
            .when(did == vid["dup_cross_src"],
                  F.format_string("doc%012d", F.lit(vid["dup_same_src_a"])))
            .otherwise(F.col("doc_id")).alias("doc_id"),
            # tokens_element_range / tokens_not_null / tokens_len_bounds
            F.when(did == vid["elem_neg"],
                   F.concat(F.array(F.lit(-7).cast("int")), F.col("tokens")))
            .when(did == vid["elem_big"],
                  F.concat(F.col("tokens"), F.array(F.lit(99999).cast("int"))))
            .when(did == vid["null_tokens"], F.lit(None))
            .when(did == vid["empty_tokens"], F.array().cast("array<int>"))
            .otherwise(F.col("tokens")).alias("tokens"),
            # n_tok_consistency (x2) / n_tok_range
            F.when(did.isin(vid["ntok_off_a"], vid["ntok_off_b"]),
                   F.col("n_tok") + 3)
            .when(did == vid["ntok_neg"], F.lit(-1))
            .when(did == vid["elem_neg"], F.col("n_tok") + 1)   # keep consistent
            .when(did == vid["elem_big"], F.col("n_tok") + 1)
            .when(did == vid["empty_tokens"], F.lit(0))
            .otherwise(F.col("n_tok")).cast("int").alias("n_tok"),
            # source_ref: two rows with an unknown source
            F.when(did.isin(vid["bad_src_a"], vid["bad_src_b"]), "spam")
            .otherwise(F.col("source")).alias("source"),
        )
    else:
        df = df.drop("id")
    return df.select("doc_id", "tokens", "n_tok", "source")


def expected_violation_sites(n_rows: int) -> dict[str, list[int]]:
    """Row ids corrupted by make_sequences(violations=True), per check."""
    i = lambda k: (k * n_rows) // 64  # noqa: E731
    return {
        "tokens_element_range": [i(1), i(2)],
        "tokens_not_null": [i(3)],
        "tokens_len_bounds": [i(4)],
        # ntok_neg (-1) is also inconsistent with the real token count
        "n_tok_consistency": [i(5), i(6), i(7)],
        "n_tok_range": [i(7), i(4)],  # empty-tokens row also has n_tok=0
        "doc_id_unique": [i(8), i(9), i(10)],
        "doc_id_format": [i(11)],
        "source_ref": [i(12), i(13)],
    }


def make_allowed_sources(spark: SparkSession) -> DataFrame:
    """Referential-integrity dimension (8 rows, always broadcast)."""
    rows = [(name, name != "forum") for name, _ in SOURCES]
    return spark.createDataFrame(rows, "source string, license_ok boolean")


def drifted_sequences(
    spark: SparkSession, n_rows: int = 1000, seed: int = 42, kind: str = "length"
) -> DataFrame:
    """Variant tables whose distributions are shifted — drift checks
    must reject these (FIXTURES.md §1 drift_token_len / drift_token_id)."""
    df = spark.range(n_rows)
    u = _uniform(seed * 7 + 1, 10000, F.col("id"))
    expr = None
    for name, cum in SOURCES:
        expr = F.when(u < cum, name) if expr is None else expr.when(u < cum, name)
    src = expr.otherwise(SOURCES[-1][0])
    if kind == "length":
        # +50% length shift in web
        is_long = _uniform(seed * 7 + 2, 100, F.col("id")) < 25
        base = F.when(
            is_long, F.lit(512) + _uniform(seed * 7 + 3, 1537, F.col("id"))
        ).otherwise(F.lit(16) + _uniform(seed * 7 + 4, 113, F.col("id")))
        n_tok = F.when(src == "web", (base * 3 / 2)).otherwise(base).cast("int")
        tok = lambda j: _uniform(seed * 7 + 5, VOCAB, F.col("id"), j).cast("int")  # noqa: E731
    else:
        # token ids drawn from [0, 1000) only
        is_long = _uniform(seed * 7 + 2, 100, F.col("id")) < 25
        n_tok = F.when(
            is_long, F.lit(512) + _uniform(seed * 7 + 3, 1537, F.col("id"))
        ).otherwise(F.lit(16) + _uniform(seed * 7 + 4, 113, F.col("id"))).cast("int")
        tok = lambda j: _uniform(seed * 7 + 5, 1000, F.col("id"), j).cast("int")  # noqa: E731
    return df.select(
        F.format_string("doc%012d", F.col("id")).alias("doc_id"),
        F.transform(F.sequence(F.lit(0), n_tok - 1), tok).alias("tokens"),
        n_tok.alias("n_tok"),
        src.alias("source"),
    )
