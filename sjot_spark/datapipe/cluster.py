"""Near-duplicate CLUSTERING: connected components over candidate
pairs — the step a 100 TB dedup pipeline runs after MinHash-LSH /
SimHash emit pairwise candidates (datapipe/dedup.py), turning edges
into per-document cluster ids so each group keeps one representative.

The reference's analog is set-level uniqueness (index.js:294-299 —
within one instance); clustering lifts it across rows, where
"duplicate of" arrives as a RELATION, not an equality, and must be
transitively closed.

Spark-first design: iterative min-label propagation over DataFrames —
each round is one shuffle join (edges ⋈ labels) + a min-aggregate, with
an eager ``localCheckpoint`` per round to truncate the growing lineage
(the standard Spark iterative-algorithm pattern; without it every round
re-plans the full history). Near-dup components are shallow (duplicate
groups, not social graphs), so rounds ≈ component diameter ≈ 3-5;
``max_iter`` bounds the worst case and convergence is detected with a
cheap ``limit(1).count()`` probe per round.

At 100 TB: labels shrink to one row per node and edges stay static —
each round shuffles |E| + |V| rows hash-partitioned on the join key;
no driver-side collection at any point. For pathological diameters
(long chains) switch to the large/small-star variant; near-dup graphs
do not produce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation: returns ``(v, cluster_id)`` with
    cluster_id = the smallest node id reachable from v over undirected
    ``edges``. Nodes are whatever appears in either endpoint column."""
    e = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    labels = (
        e.select(F.col("src").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("l"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prop = e.join(labels, e.src == labels.v).select(
            F.col("dst").alias("v"), "l")
        new_labels = (
            labels.select("v", "l").union(prop)
            .groupBy("v")
            .agg(F.min("l").alias("l"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("v", F.col("l").alias("old")), "v")
            .where(F.col("l") < F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("v", F.col("l").alias("cluster_id"))


def cluster_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup grouping: MinHash-LSH candidate pairs →
    transitive closure → ``(doc_id, cluster_id)`` where cluster_id is
    the smallest member (the kept representative). Documents with no
    near-dup partner keep themselves (cluster_id = doc_id)."""
    from sjot_spark.datapipe.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs, id_col=id_col, text_col=text_col, n=n, k=k,
        bands=bands, verify_threshold=verify_threshold)
    comp = connected_components(pairs, a="doc_a", b="doc_b")
    ids = docs.select(F.col(id_col).alias("v")).distinct()
    return (
        ids.join(comp, "v", "left")
        .select(F.col("v").alias(id_col),
                F.coalesce("cluster_id", F.col("v")).alias("cluster_id"))
    )
