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


def hash_seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, nlist: int,
) -> DataFrame:
    """Deterministic, engine-independent IVF seeding WITHOUT KMeans:
    cell c's centroid is the vector with the minimum md5(id) among ids
    with id % nlist == c. Centroid quality is below a fitted KMeans,
    but the choice is a pure function of the data — so the ENTIRE
    inverted-file pipeline (assignment, nprobe pruning, exact rerank)
    becomes DuckDB-oracle-checkable (queries.ann_ivf_hash); KMeans
    quality itself stays covered by the recall pytest on ann_ivf."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.pmod(F.col(id_col), nlist)).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (
        df.select(
            F.pmod(F.col(id_col), nlist).cast("int").alias("cell"),
            F.col(vec_col).alias("cvec"),
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def ann_ivf_hashseed(
    df: DataFrame, id_col: str, vec_col: str,
    query_ids: list[int], k: int = 5,
    nlist: int = 8, nprobe: int = 3,
) -> DataFrame:
    """ann_ivf with hash-seeded centroids (see hash_seed_centroids):
    assign every vector to its max-cosine centroid (broadcast seeds —
    the corpus never shuffles for assignment), probe the nprobe
    closest cells per query, exact cosine rerank within them."""
    from pyspark.sql.window import Window

    seeds = hash_seed_centroids(df, id_col, vec_col, nlist)
    sim = cosine(F.col(vec_col), F.col("cvec"))
    assigned = (
        df.crossJoin(F.broadcast(seeds))
        .withColumn("_arank", F.row_number().over(
            Window.partitionBy(id_col).orderBy(F.desc(sim), F.asc("cell"))))
        .where(F.col("_arank") == 1)
        .select(id_col, vec_col, "cell")
    )
    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qc = (
        q.crossJoin(F.broadcast(seeds))
        .withColumn("_crank", F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc(cosine(F.col("qvec"), F.col("cvec"))),
                F.asc("cell"))))
        .where(F.col("_crank") <= nprobe)
        .select("query_id", "qvec", "cell")
    )
    cand = assigned.join(F.broadcast(qc), "cell") \
        .where(F.col(id_col) != F.col("query_id"))
    sims = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qvec"), F.col(vec_col)).cast("double").alias("cos_sim"),
    )
    return topk_by_sim(sims, k)


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
