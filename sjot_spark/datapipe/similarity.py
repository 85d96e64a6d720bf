"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. Dot products via
  F.aggregate/zip_with (JVM, codegen); queries are broadcast so the
  corpus never shuffles. O(Q x N) — fine for small Q at any N.
- LSH-bucketed (random hyperplane / sign-LSH): the scale path. Each
  vector gets an h-bit signature from fixed pseudo-random
  hyperplanes (seed-deterministic, built from md5 of (plane, dim) —
  no stored model needed); candidates = signature-bucket collisions,
  then exact cosine on candidates only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_by_sim(sims: DataFrame, k: int) -> DataFrame:
    """Shared top-k epilogue over (query_id, neighbor_id, cos_sim):
    rank per query (ties broken by neighbor id — deterministic), keep
    k, round the reported similarity."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos_sim", 6).alias("cos_sim_r"))
    )


def knn_bruteforce(
    df: DataFrame, id_col: str, vec_col: str,
    query_ids: list[int], k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id. The query set
    is tiny -> broadcast."""
    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    pairs = df.alias("c").join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    sims = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qvec"), F.col(vec_col)).cast("double").alias("cos_sim"),
    )
    return topk_by_sim(sims, k)


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1,1):
    pure function of (plane, dim) via md5 — identical on any engine,
    no model state to ship."""
    import hashlib

    h = int(hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()[:15], 16)
    return (h / float(1 << 60)) * 2.0 - 1.0


def sign_lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """n-bit sign-LSH signature as a long: bit p = (vec . plane_p) > 0.
    Planes are literal constants folded into the plan."""
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        coeffs = [_hyperplane(p, d) for d in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in coeffs]),
                lambda x, y: x * y,
            ),
            F.lit(0.0), lambda a, v: a + v,
        )
        out = out + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return out


def ann_lsh(
    df: DataFrame, id_col: str, vec_col: str,
    query_ids: list[int], k: int = 5, dim: int = 64,
    n_planes: int = 16, max_hamming: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose LSH
    signature is within Hamming distance max_hamming of the query's
    (signature comparison is against the broadcast query set — the
    corpus is scanned once, never self-joined), then exact cosine +
    rank on the candidate set."""
    signed = df.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"),
        sign_lsh_signature(F.col(vec_col), dim, n_planes).alias("csig"),
    )
    q = signed.where(F.col("cid").isin(query_ids)).select(
        F.col("cid").alias("query_id"), F.col("cvec").alias("qvec"),
        F.col("csig").alias("qsig"),
    )
    ham = F.bit_count(F.col("csig").bitwiseXOR(F.col("qsig")))
    cand = (
        signed.join(F.broadcast(q), F.col("cid") != F.col("query_id"))
        .where(ham <= max_hamming)
    )
    sims = cand.select(
        "query_id", F.col("cid").alias("neighbor_id"),
        cosine(F.col("qvec"), F.col("cvec")).cast("double").alias("cos_sim"),
    )
    return topk_by_sim(sims, k)


def cosine_dup_candidates(
    df: DataFrame, id_col: str, vec_col: str, dim: int = 64,
    n_planes: int = 16, threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale: bucket
    by full LSH signature (only collisions shuffle), verify cosine."""
    signed = df.select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"),
        sign_lsh_signature(F.col(vec_col), dim, n_planes).alias("sig"),
    )
    cand = (
        signed.alias("a").join(signed.alias("b"), "sig")
        .where(F.col("a.doc") < F.col("b.doc"))
    )
    return (
        cand.select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"),
            cosine(F.col("a.vec"), F.col("b.vec")).cast("double").alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
