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

from sjot_spark.datapipe.similarity import cosine


def build_ivf(
    df: DataFrame, id_col: str, vec_col: str,
    nlist: int = 16, seed: int = 42,
):
    """Returns (assigned_df with `cell`, centroids: list[(cell, vec)])."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    ml = df.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=nlist, seed=seed, maxIter=20).fit(ml)
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
    assigned, centroids = build_ivf(df, id_col, vec_col, nlist, seed)
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
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cos_sim", 6).alias("cos_sim_r"))
    )
