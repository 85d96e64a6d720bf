"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Scale notes (the 100 TB story):

- exact: hash-groupBy on a 128-bit content fingerprint — partial agg
  collapses uniques map-side; shuffle carries one row per distinct
  fingerprint per input partition.
- ngram-Jaccard: exploded (doc, shingle) pairs self-joined on
  shingle. Quadratic in the worst case — at scale you NEVER run it
  raw; it is the verifier stage AFTER LSH bucketing has cut the
  candidate space. Provided standalone for small candidate sets and
  as the verify stage of minhash_lsh_pairs.
- MinHash+LSH: per-row signatures from one projection (no shuffle),
  banded into buckets; only bucket-collisions shuffle. Hash family is
  md5-derived so signatures are engine-independent (oracle-checkable).
- SimHash: 64-bit signature from md5 bits weighted by term counts;
  near-dup = signatures within Hamming distance k, bucketed by
  16-bit chunks (pigeonhole: any pair within distance 3 shares at
  least one of 4 chunks).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_int(c: Column, prefix: str = "") -> Column:
    """First 60 bits of md5 as a non-negative bigint — identical in
    DuckDB via ('0x' || substr(md5(x),1,15))::bigint."""
    src = F.concat(F.lit(prefix), c) if prefix else c
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical content: (fingerprint, n_docs, min id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), via one transform over the
    token array — no explode, no Python.

    ``toks`` MUST be a materialized attribute (a staged projection
    column), never an expression like ``split(text)``: the transform
    lambda indexes it n times PER ELEMENT, and Spark re-evaluates
    non-attribute expressions inside higher-order-function lambdas on
    every reference — an inlined split costs O(n·m·|text|) per row
    (the 54 s-vs-1 s trap documented in datapipe/repetition.py).
    Callers stage tokens with :func:`tokens_of` and keep the staged
    column referenced ≥2 times so CollapseProject cannot re-inline
    it (plan-asserted in tests/test_plans.py)."""
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(m - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )
    return F.when(m >= n, F.array_distinct(grams)).otherwise(F.array())


def tokens_of(text: Column) -> Column:
    """Whitespace token array — stage this in its own projection
    before handing it to :func:`shingles_of`."""
    return F.split(F.trim(text), r"\s+")


def blank_tokens_of(text: Column) -> Column:
    """Whitespace token array that is EMPTY (not ['']) for blank
    text — split(trim('')) yields [''], which downstream would count
    as one token. The shared tokenizer of the census/scoring/rewrite
    operators (substringdup, surprisal, mixing/curation queries);
    DuckDB twin: CASE WHEN length(trim(x))=0 THEN [] ELSE
    regexp_split_to_array(trim(x),'\\s+') END. Stage it in its own
    projection before any per-element lambda (see shingles_of)."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def shingles(text: Column, n: int = 3) -> Column:
    """Back-compat wrapper: shingles straight from text. ONLY safe in
    single-reference, non-exploded projections — prefer staging
    :func:`tokens_of` + :func:`shingles_of` (see shingles_of's
    warning)."""
    return shingles_of(tokens_of(text), n)


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (doc, sh) shingle rows with both the token and gram
    arrays staged in their own projections, so the split and the
    n-gram build each run ONCE per row.

    explode_OUTER is load-bearing: a plain explode makes Catalyst
    infer a size(arr)>0 pre-filter and push it below the staging
    projections, substituting the aliases back in — the pushed
    filter then carries the whole shingle tree with the split inlined
    into its lambda, re-tokenizing per element per row (the
    repetition_stats trap, resurrected inside a Filter; see
    tests/test_plans.py::test_no_split_inside_any_lambda_body). The
    outer variant infers no filter; the one NULL row an empty gram
    array emits is dropped right above the generate, where ``sh`` is
    a generator-output attribute no rule can push further down."""
    toked = df.select(
        F.col(id_col).alias("doc"), tokens_of(F.col(text_col)).alias("_toks")
    )
    grammed = toked.select(
        "doc", shingles_of(F.col("_toks"), n).alias("_grams")
    )
    return (
        grammed.select("doc", F.explode_outer("_grams").alias("sh"))
        .where(F.col("sh").isNotNull())
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """All pairs with shingle-set Jaccard >= threshold. Output carries
    integer intersection/union sizes (exactly comparable across
    engines); the ratio is derivable. Self-join on shingle — use on
    small/candidate sets only (see module docstring)."""
    sh = exploded_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "sz": "sz_b"}), "doc_b")
        .select(
            "doc_a", "doc_b", "inter",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("uni"),
        )
        .where(F.col("inter") >= F.lit(threshold) * F.col("uni"))
    )
    return out


_MERSENNE31 = 2147483647  # 2^31-1; keeps a_i*h + b_i inside int64


def _perm_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the linear permutation family,
    derived from md5 so any engine can reproduce them."""
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:15], 16)
        b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:15], 16)
        out.append((a % (_MERSENNE31 - 1) + 1, b % _MERSENNE31))
    return out


def minhash_band_table(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 3, k: int = 16, bands: int = 4,
) -> DataFrame:
    """Distinct (doc, band_key) banded-LSH rows — the storable /
    joinable form of the MinHash signature (two docs sharing any
    band_key are near-dup candidates). Factored out of
    :func:`minhash_lsh_pairs` so incremental pipelines can persist
    the band table for a corpus and probe it with new batches
    (datapipe/incremental.py)."""
    return minhash_band_table_from_shingles(
        exploded_shingles(df, id_col, text_col, n), k, bands)


def minhash_band_table_from_shingles(
    sh: DataFrame, k: int = 16, bands: int = 4,
) -> DataFrame:
    """Band table over an already-built (doc, sh) shingle relation, so
    callers that ALSO need the shingles (the Jaccard verify stage in
    minhash_lsh_pairs) build the tokenize/shingle/explode/distinct
    subtree once and share it — identical subtrees are what lets
    Spark's exchange reuse serve the shingle census from one shuffle.

    signatures via ONE md5 per (doc, shingle) row and k linear
    permutations folded into a single hash aggregate: min(perm_i(h)).
    (Building the signature as a per-row array expression re-inlines
    the md5 subtree once per permutation after projection collapse —
    measured ~k x slower; that per-row variant was removed.)"""
    rows_per_band = k // bands
    hashed = sh.select(
        "doc", "sh", F.pmod(_md5_int(F.col("sh")), F.lit(_MERSENNE31)).alias("h")
    )
    sig = hashed.groupBy("doc").agg(*[
        F.min(F.pmod(F.col("h") * a + b, F.lit(_MERSENNE31))).alias(f"s{i}")
        for i, (a, b) in enumerate(_perm_params(k))
    ])
    return sig.select(
        "doc",
        F.explode(F.array(*[
            F.concat_ws(
                "_", F.lit(b),
                *[F.col(f"s{b * rows_per_band + r}").cast("string")
                  for r in range(rows_per_band)],
            )
            for b in range(bands)
        ])).alias("band_key"),
    ).distinct()


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 3, k: int = 16, bands: int = 4, verify_threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified by true Jaccard.

    signatures (projection, no shuffle) -> explode k/bands-row band
    keys -> groupBy band key (the only shuffle, collisions only) ->
    candidate pairs -> exact shingle-Jaccard verify on candidates.
    """
    sh = exploded_shingles(df, id_col, text_col, n)
    bands_df = minhash_band_table_from_shingles(sh, k, bands)
    cand = (
        bands_df.alias("a")
        .join(bands_df.alias("b"), "band_key")
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # verify stage: true Jaccard restricted to candidates (reuses the
    # same exploded shingle relation as the signature stage)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.withColumnsRenamed({"doc": "doc_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc": "doc_b", "sh": "sh_b"})
              .withColumnRenamed("sh_b", "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "sz": "sz_b"}), "doc_b")
        .select("doc_a", "doc_b", "inter",
                (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("uni"))
        .where(F.col("inter") >= F.lit(verify_threshold) * F.col("uni"))
    )


def simhash(text: Column, bits: int = 60) -> Column:
    """SimHash over word unigrams (60 bits — one md5-derived long per
    token): per bit, sum +-1; bit set if the sum is positive.

    ONE aggregate pass with an array<int> accumulator — token hashes
    are computed once, and the per-bit counters update via zip_with
    inside the fold (vs. 60 separate aggregates, each re-hashing every
    token, which was measured ~60x slower)."""
    # one md5 per token, expanded to a 60-char bit string (shiftright
    # by a lambda variable isn't expressible in the pyspark wrapper,
    # so bit b is read as a character via substr, which takes Columns)
    hs = F.transform(
        F.split(F.trim(text), r"\s+"),
        lambda t: F.lpad(F.conv(F.substring(F.md5(t), 1, 15), 16, 2),
                         bits, "0"),
    )
    bit_idx = F.sequence(F.lit(1), F.lit(bits))
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), bits),
        lambda acc, s: F.zip_with(
            acc, bit_idx,
            lambda a, p: a + F.when(
                F.substr(s, p, F.lit(1)) == "1", 1
            ).otherwise(-1),
        ),
    )
    # pack sign bits into a long via a binary string (shiftleft's
    # numBits arg must be a Python int, so 2^b can't come from a
    # lambda variable; conv(bitstring, 2, 10) packs exactly)
    # counts[0] corresponds to the MSB of the per-token bit string,
    # so the joined string is already MSB-first
    bit_chars = F.transform(counts, lambda c: F.when(c > 0, "1").otherwise("0"))
    return F.conv(F.array_join(bit_chars, ""), 2, 10).cast("long")


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 4x16-bit chunks
    (pigeonhole guarantee for distance <= 3), verify Hamming."""
    s = df.select(F.col(id_col).alias("doc"),
                  simhash(F.col(text_col)).alias("sig"))
    chunks = s.select(
        "doc", "sig",
        F.explode(F.array(*[
            F.concat_ws("_", F.lit(i),
                        F.shiftright(F.col("sig"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF)).cast("string"))
            for i in range(4)
        ])).alias("chunk"),
    )
    cand = (
        chunks.alias("a").join(chunks.alias("b"), "chunk")
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("a.sig").alias("sig_a"),
                F.col("b.doc").alias("doc_b"), F.col("b.sig").alias("sig_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")) \
               .where(F.col("hamming") <= max_hamming)
