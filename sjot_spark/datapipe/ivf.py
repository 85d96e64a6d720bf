"""IVF (inverted-file) approximate nearest neighbor — the clustered
scale path next to sign-LSH (sjot_spark.datapipe.similarity).

Build: nlist cell centroids come either from a KMeans fit on a
bounded sample (`build_ivf`) or from a deterministic hash seeding
(`hash_seed_centroids`, DuckDB-oracle-checkable). Either way the
centroids are TINY (nlist rows), so they are collected once and
folded into the plan as literals: cell assignment is then a PURE
PROJECTION (argmax cosine over literal centroids) — the corpus is
never cross-joined, windowed, or shuffled for assignment (asserted in
tests/test_plans.py). At 100 TB the assigned table can be written
bucketed/partitioned by cell in the same pass.

Query: for each query vector, rank cells by centroid cosine (same
projection trick), probe the top nprobe cells via a broadcast join of
the tiny (query x nprobe) cell list, exact cosine only within probed
cells — the scan is pruned to ~nprobe/nlist of the corpus and the
only exchange of corpus-derived rows is the final per-query top-k
over the pruned candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sjot_spark.datapipe.similarity import cosine, norm, topk_by_sim


def _seed_lits(
    seeds: list[tuple[int, list[float]]], cast_type: str | None,
) -> list[tuple[int, Column]]:
    """Centroids as literal array columns. ``cast_type`` restores the
    corpus element type (float32 -> Python float -> float32 is exact),
    keeping per-term products bit-identical to the SQL oracle twin;
    pass None to keep double precision (KMeans centroids)."""
    return [
        (cell, F.lit(vec).cast(cast_type) if cast_type else F.lit(vec))
        for cell, vec in seeds
    ]


def _assign_cell(vec: Column, seed_lits: list[tuple[int, Column]]) -> Column:
    """Argmax-cosine cell id as a pure projection: array_max over one
    (cosine, -cell) struct per literal centroid — max similarity, ties
    to the smallest cell. Zero shuffle, zero join."""
    best = F.array_max(F.array(*[
        F.struct(cosine(vec, cv).alias("s"), F.lit(-cell).alias("nc"))
        for cell, cv in seed_lits
    ]))
    return (-best["nc"]).cast("int")


def _probe_cells(
    qvec: Column, seed_lits: list[tuple[int, Column]], nprobe: int,
) -> Column:
    """Top-nprobe cells by centroid cosine as an array<int> projection
    (descending similarity, ties to the smallest cell)."""
    ranked = F.reverse(F.array_sort(F.array(*[
        F.struct(cosine(qvec, cv).alias("s"), F.lit(-cell).alias("nc"))
        for cell, cv in seed_lits
    ])))
    return F.transform(
        F.slice(ranked, 1, nprobe), lambda x: (-x["nc"]).cast("int"))


def _probe_and_rerank(
    assigned: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
    seed_lits: list[tuple[int, Column]], nprobe: int, k: int,
) -> DataFrame:
    """Shared IVF epilogue: explode each query's nprobe probe cells,
    broadcast the tiny (query x nprobe) list against the assigned
    corpus, exact cosine + top-k within the pruned candidates."""
    qc = queries.select(
        "query_id", "qvec",
        F.explode(_probe_cells(F.col("qvec"), seed_lits, nprobe))
        .alias("cell"),
    )
    cand = assigned.join(F.broadcast(qc), "cell") \
        .where(F.col(id_col) != F.col("query_id"))
    sims = cand.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qvec"), F.col(vec_col)).cast("double").alias("cos_sim"),
    )
    return topk_by_sim(sims, k)


def build_ivf(
    df: DataFrame, id_col: str, vec_col: str,
    nlist: int = 16, seed: int = 42, max_fit_rows: int = 100_000,
    approx_rows: int | None = None,
    fit_filter_denom: int | None = None,
):
    """Returns (assigned_df with `cell`, centroids: list[(cell, vec)]).

    KMeans fits on a bounded deterministic sample WITHOUT counting the
    corpus first: when the caller passes `approx_rows` (free from
    table metadata — an Iceberg snapshot's `total-records`, parquet
    footer row counts), the sample is an xxhash64(id)-mod filter sized
    to ~max_fit_rows; either way a limit(max_fit_rows) caps the fit
    input (CollectLimit stops scanning once satisfied). At 100 TB the
    corpus is touched at most twice: once drawing the fit sample, once
    by the assignment projection — there is no count job and no
    transform/self-join (Lloyd iterations run on the cached bounded
    sample only).

    SAMPLING-BIAS caveat: with neither `approx_rows` nor
    `fit_filter_denom`, the fit input is ``limit(max_fit_rows)`` — an
    arbitrary PREFIX of the corpus. On data laid out by a clustered
    key (e.g. sorted by source) that prefix covers one stratum and
    centroid quality (hence recall) degrades. Callers at scale should
    pass `approx_rows` from table metadata (Iceberg snapshot
    ``total-records`` / parquet footer counts — free, no count job);
    when no metadata exists, pass `fit_filter_denom=D` to hash-thin
    the scan (keep ~1/D of rows by xxhash64(id) before the limit),
    which spreads the sample across ~D× more of the corpus for the
    cost of scanning D× more input rows (still bounded: CollectLimit
    stops early). The default stays the prefix because thinning a
    corpus SMALLER than D*max_fit_rows silently shrinks the fit
    sample instead.

    Assignment uses the SAME metric the query path probes with
    (argmax cosine == argmin euclidean for unit-normalized inputs up
    to the centroid-norm term; ranking by cosine keeps assign and
    probe consistent) as a literal-centroid projection."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # KMeans measures EUCLIDEAN distance: normalize to unit length so
    # the fitted centroids estimate directions, matching the cosine
    # assignment/probe metric; the norm is materialized as a column
    # first so it isn't recomputed per element
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
    if approx_rows is not None and approx_rows > max_fit_rows:
        denom = (approx_rows + max_fit_rows - 1) // max_fit_rows
        fit_ml = ml.where(
            F.pmod(F.xxhash64(F.col("_id")), F.lit(denom)) == 0)
    elif fit_filter_denom is not None and fit_filter_denom > 1:
        fit_ml = ml.where(
            F.pmod(F.xxhash64(F.col("_id")), F.lit(fit_filter_denom)) == 0)
    model = KMeans(k=nlist, seed=seed, maxIter=20).fit(
        fit_ml.limit(max_fit_rows))
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    seed_lits = _seed_lits(centroids, cast_type=None)
    assigned = df.withColumn(
        "cell", _assign_cell(F.col(vec_col), seed_lits))
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
    quality itself stays covered by the recall pytest on ann_ivf.
    The seed scan's exchange carries at most nlist rows per input
    partition (WindowGroupLimit prunes map-side before the shuffle)."""
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


def collect_hash_seeds(
    df: DataFrame, id_col: str, vec_col: str, nlist: int,
) -> list[tuple[int, list[float]]]:
    """hash_seed_centroids materialized to the driver (nlist tiny
    deterministic rows) so they can be folded in as plan literals."""
    return sorted(
        (r["cell"], list(r["cvec"]))
        for r in hash_seed_centroids(df, id_col, vec_col, nlist).collect()
    )


def ann_ivf_hashseed(
    df: DataFrame, id_col: str, vec_col: str,
    query_ids: list[int], k: int = 5,
    nlist: int = 8, nprobe: int = 3,
) -> DataFrame:
    """ann_ivf with hash-seeded centroids (see hash_seed_centroids).

    The seeds are collected (nlist rows, deterministic) and folded in
    as literals cast back to the corpus element type, so assignment
    and probe ranking are bit-identical to the SQL twin AND pure
    projections — the corpus plan has no Exchange until the final
    top-k over the pruned candidates (tests/test_plans.py)."""
    vt = dict(df.dtypes)[vec_col]
    seed_lits = _seed_lits(
        collect_hash_seeds(df, id_col, vec_col, nlist), cast_type=vt)
    assigned = df.select(
        id_col, vec_col,
        _assign_cell(F.col(vec_col), seed_lits).alias("cell"))
    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    return _probe_and_rerank(
        assigned, q, id_col, vec_col, seed_lits, nprobe, k)


def ann_ivf(
    df: DataFrame, id_col: str, vec_col: str,
    query_ids: list[int], k: int = 5,
    nlist: int = 16, nprobe: int = 4, seed: int = 42,
    approx_rows: int | None = None,
) -> DataFrame:
    """Exact top-k cosine within the nprobe closest cells per query,
    over KMeans-fitted cells (sampled fit, literal-centroid
    assignment — see build_ivf)."""
    assigned, centroids = build_ivf(
        df, id_col, vec_col, nlist, seed, approx_rows=approx_rows)
    seed_lits = _seed_lits(centroids, cast_type=None)
    q = df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    return _probe_and_rerank(
        assigned, q, id_col, vec_col, seed_lits, nprobe, k)
