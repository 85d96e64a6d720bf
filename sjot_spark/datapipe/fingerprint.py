"""Document fingerprinting via polynomial rolling hashes + winnowing.

The MOSS-style pipeline (Schleimer, Wilkerson, Aiken, "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003 — public
method):

1. k-gram rolling hashes over the token stream (Rabin-Karp polynomial
   hash, computed incrementally in one pass);
2. winnowing: slide a window of w consecutive hashes and keep each
   window's minimum — guarantees any match of length >= w+k-1 shares
   a fingerprint, with density 2/(w+1);
3. documents sharing fingerprints are near-dup/overlap candidates.

Everything is built-in Column expressions (transform/aggregate/
array_min over slices) — one projection per document, no Python per
row, no explode until the final (sparse) fingerprint set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 1000000007  # modulus (fits products in int64 with 31-bit operands)
_B = 131         # polynomial base


def _tok_hash(t: Column) -> Column:
    """31-bit token hash from md5 (engine-independent)."""
    return F.pmod(F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
                  F.lit((1 << 31) - 1))


def kgram_hashes(tokens: Column, k: int = 5) -> Column:
    """Array of polynomial hashes of every k-gram of the token array.
    h_i = sum_j B^(k-1-j) * tok[i+j]  (mod P), via one transform."""
    th = F.transform(tokens, _tok_hash)
    n = F.size(th)
    weights = [pow(_B, k - 1 - j, _P) for j in range(k)]

    def gram(i: Column) -> Column:
        acc = F.lit(0).cast("long")
        for j, w in enumerate(weights):
            acc = F.pmod(acc + F.pmod(F.get(th, i + j) * w, F.lit(_P)),
                         F.lit(_P))
        return acc

    return F.when(
        n >= k,
        F.transform(F.sequence(F.lit(0), n - k), gram),
    ).otherwise(F.array().cast("array<long>"))


def winnow(hashes: Column, w: int = 8) -> Column:
    """Distinct window-minima of every w-length window (the winnowing
    fingerprint set)."""
    n = F.size(hashes)
    return F.when(
        n >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - w),
                lambda i: F.array_min(F.slice(hashes, i + 1, w)),
            )
        ),
    ).otherwise(F.array_distinct(F.when(n > 0, hashes).otherwise(
        F.array().cast("array<long>"))))


def fingerprints(text: Column, k: int = 5, w: int = 8) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    return winnow(kgram_hashes(toks, k), w)


def fingerprints_exploded(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 8
) -> DataFrame:
    """Winnowed fingerprints as (doc, fp) rows — the SCALE formulation.

    posexplode + window functions: each token hashed ONCE, k-gram
    hashes from k-1 `lead`s, winnow minima from a sliding rowsBetween
    window. One shuffle (by doc). The array-expression formulation
    (`fingerprints`) re-embeds the hash tree inside every slice/get
    lambda — interpreted higher-order functions recompute it O(n*w*k)
    times (measured 250s vs ~2s on 200 docs)."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+"))
        .alias("pos", "tok"),
    ).withColumn("th", _tok_hash(F.col("tok")))
    wo = Window.partitionBy("doc").orderBy("pos")
    gram = None
    for j in range(k):
        # pmod per term: th < 2^31 and weight < P, so each product is
        # < 2^61, but an unreduced sum would overflow int64 at k >= 11
        term = F.pmod(F.lead("th", j).over(wo) * pow(_B, k - 1 - j, _P),
                      F.lit(_P))
        gram = term if gram is None else F.pmod(gram + term, F.lit(_P))
    grams = toks.select(
        "doc", "pos", gram.alias("gh")
    ).where(F.col("gh").isNotNull())  # last k-1 positions have no gram
    wmin = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    n_grams = Window.partitionBy("doc")
    winnowed = (
        grams.withColumn("win_min", F.min("gh").over(wmin))
        .withColumn("_n", F.count(F.lit(1)).over(n_grams))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("doc").orderBy("pos")))
        # only full windows produce fingerprints; docs with fewer than
        # w grams keep all their gram hashes (mirrors winnow())
        .where((F.col("_rn") <= F.col("_n") - w + 1) | (F.col("_n") < w))
    )
    fp = F.when(F.col("_n") < w, F.col("gh")).otherwise(F.col("win_min"))
    return winnowed.select("doc", fp.alias("fp")).distinct()


def fingerprint_overlap_pairs(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 5, w: int = 8, min_shared: int = 2,
) -> DataFrame:
    """Candidate overlap pairs: documents sharing >= min_shared
    winnowed fingerprints. Join happens on the winnowed (sparse,
    ~2/(w+1) density) set, not the raw token stream. The fingerprint
    relation is persisted so the posexplode+window pipeline runs once,
    not once per side of the self-join."""
    from pyspark import StorageLevel

    fp = fingerprints_exploded(df, id_col, text_col, k, w) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    return (
        fp.alias("a").join(fp.alias("b"), "fp")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
