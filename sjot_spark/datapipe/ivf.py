"""IVF (inverted-file) approximate nearest neighbor — the clustered
scale path next to sign-LSH (sjot_spark.datapipe.similarity).

Build: KMeans (Spark MLlib, seeded/deterministic) partitions the
corpus into nlist cells; each vector stores its cell id. At 100 TB the
assignment is a one-pass map (distance to nlist broadcast centroids)
and the table can be written bucketed/partitioned by cell.

Query: for each query vector, rank cells by centroid distance, probe
the top nprobe cells, exact cosine only within probed cells — the
scan is pruned to ~nprobe/nlist of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sjot_spark.datapipe.similarity import cosine, norm, topk_by_sim


def build_ivf(
    df: DataFrame, id_col: str, vec_col: str,
    nlist: int = 16, seed: int = 42, max_fit_rows: int = 100_000,
):
    """Returns (assigned_df with `cell`, centroids: list[(cell, vec)]).

    KMeans fits on a bounded deterministic sample (xxhash64(id) mod
    filter, at most ~max_fit_rows rows): at 100 TB, Lloyd iterations
    over the full corpus would be ~20 full passes; a 100k-row sample
    estimates nlist centroids just as well, and the full corpus is
    touched exactly once by the assignment transform (SCALING.md)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # KMeans assigns by EUCLIDEAN distance while queries probe by
    # COSINE: normalize to unit length so the two metrics agree
    # (on the unit sphere, euclidean^2 = 2 - 2*cosine); the norm is
    # materialized as a column first so it isn't recomputed per element
    ml = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_n", norm(F.col("_v")))
        .select(
            "_id",
            array_to_vector(
                F.transform(F.col("_v"), lambda x: x / F.col("_n"))
            ).alias("features"),
        )
    )
    fit_ml = ml
    n = ml.count()
    if n > max_fit_rows:
        denom = (n + max_fit_rows - 1) // max_fit_rows
        fit_ml = ml.where(
            F.pmod(F.xxhash64(F.col("_id")), F.lit(denom)) == 0)
    model = KMeans(k=nlist, seed=seed, maxIter=20).fit(fit_ml)
    assigned = (
        model.transform(ml)
        .select(F.col("_id").alias(id_col),
                F.col("prediction").alias("cell"))
        .join(df, id_col)
    )
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return assigned, centroids


def ann_ivf(
    df: DataFrame, id_col: str, vec_col: str,
    query_ids: list[int], k: int = 5,
    nlist: int = 16, nprobe: int = 4, seed: int = 42,
) -> DataFrame:
    """Exact top-k cosine within the nprobe closest cells per query."""
    from pyspark import StorageLevel

    assigned, centroids = build_ivf(df, id_col, vec_col, nlist, seed)
    # both the query branch and the candidate scan descend from
    # `assigned` — persist so the KMeans transform + join runs once
    assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
    spark = df.sparkSession
    cent = spark.createDataFrame(
        [(c, v) for c, v in centroids], "cell int, cvec array<double>"
    )
    q = assigned.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # rank cells per query by centroid cosine; keep top nprobe
    qc = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("csim", cosine(F.col("qvec"), F.col("cvec")))
        .withColumn("crank", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cell"))))
        .where(F.col("crank") <= nprobe)
        .select("query_id", "qvec", "cell")
    )
    cand = assigned.join(F.broadcast(qc), "cell") \
        .where(F.col(id_col) != F.col("query_id"))
    sims = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qvec"), F.col(vec_col)).cast("double").alias("cos_sim"),
    )
    return topk_by_sim(sims, k)
