"""Source/sink helpers — storage-agnostic table access.

The engine operates on DataFrames, so the storage layer is whatever
the SparkSession resolves: Iceberg catalog tables in production
(`spark.table("cat.db.sequences")` — partition pruning, snapshot
reads, hidden partitioning all come from the Iceberg source), plain
parquet in this sandbox (no Iceberg runtime jars installed; the
engine code is identical either way — verified by the fact that every
test and bench runs on parquet paths).

``read_table`` accepts either a catalog table name or a filesystem
path; ``snapshot_info`` records source lineage for the checkpoint
manifest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref = catalog table name ('db.table' / 'cat.db.table') or a
    parquet path ('/data/x.parquet', 's3://...', dir of parquet)."""
    if "/" in ref or ref.endswith(".parquet"):
        return spark.read.parquet(ref)
    return spark.table(ref)


# NOTE on array-element nullability: plain parquet ALWAYS reports
# list elements as nullable on read (Spark force-nullables file-source
# schemas; a user-supplied read schema cannot narrow it), so the
# engine's per-element null scan runs even for producers that never
# emit null tokens. Iceberg `element: required` columns arrive with
# containsNull=False and the compiler elides the scan automatically;
# for parquet, opt in explicitly with
# ValidationEngine(spec, assume_nonnull_elements=True).


def snapshot_info(spark: SparkSession, ref: str) -> dict:
    """Best-effort lineage descriptor for the manifest: Iceberg
    snapshot id when the table supports it, file mtime-ish info for
    paths."""
    if "/" not in ref and not ref.endswith(".parquet"):
        try:
            row = spark.sql(
                f"SELECT snapshot_id, committed_at FROM {ref}.snapshots "
                f"ORDER BY committed_at DESC LIMIT 1"
            ).first()
            if row:
                return {"table": ref, "snapshot_id": str(row[0]),
                        "committed_at": str(row[1])}
        except Exception:
            pass
        return {"table": ref}
    try:
        mtime = max(
            (os.path.getmtime(os.path.join(ref, f))
             for f in os.listdir(ref)), default=None,
        ) if os.path.isdir(ref) else os.path.getmtime(ref)
    except OSError:
        mtime = None
    return {"path": ref, "mtime": mtime}
