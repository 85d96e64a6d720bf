"""Incremental deduplication — vet a NEW batch of documents against a
stored fingerprint/band manifest of the existing corpus WITHOUT
rescanning the corpus text: the daily-crawl-increment workflow every
production pre-training pipeline runs (each crawl snapshot is deduped
against everything already ingested; see Lee et al. 2021 §4 and the
RefinedWeb/CCNet pipelines, which all maintain persistent dedup
state between snapshots).

The reference has no incremental analog — this extends the
training-data-pipeline surface (SURVEY §6) with the OPERATIONAL
composition of the dedup machinery: its validation cousins are the
cross-row uniqueness check A5 (/root/reference/index.js:389-399)
stretched across ingestion batches ("a value must not repeat against
everything ALREADY ACCEPTED"), and checkpoint/resume (manifest.py),
which persists exactly the kind of side state the fingerprint store
is.

State tables (both storable as plain parquet/Iceberg via the
manifest layer, append-only between snapshots):

- exact store  — (fp) 60-bit md5 text fingerprints
  (:func:`exact_fingerprints`, the dedup.exact_duplicates hash), and
- band store   — (doc, band_key) MinHash LSH bands
  (dedup.minhash_band_table — factored out of minhash_lsh_pairs so
  the SAME signatures are storable and probe-able).

Spark-first shape — and the 100 TB story:

- The increment is SMALL relative to the corpus (a crawl snapshot vs
  everything ingested), so every probe broadcasts the NEW side and
  STREAMS the stores map-side: the corpus-scale fingerprint/band
  tables are scanned once each, nothing corpus-sized shuffles, and
  only matching keys come back (traffic proportional to the overlap,
  exactly the decontam join discipline). The matches (tiny) then
  broadcast back onto the batch to flag rows.
- Intra-batch exact dups are a batch-local groupBy (the increment's
  own scale); the kept representative is min(doc_id) — the same
  deterministic keep rule as dedup.exact_duplicates.
- Near-dup flags are CANDIDATE-level (band collision), the standard
  LSH contract; callers verify candidates with
  dedup.ngram_jaccard_pairs against just the colliding prev docs —
  a candidate-sized job, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sjot_spark.datapipe.dedup import _md5_int, minhash_band_table


def exact_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, fp) 60-bit md5 fingerprints of the raw text — the
    byte-exact dup key (dedup.exact_duplicates' grouping hash), in
    storable form."""
    return docs.select(
        F.col(id_col).alias("doc"),
        _md5_int(F.col(text_col)).alias("fp"),
    )


def vet_batch(
    prev_fps: DataFrame,
    prev_bands: DataFrame,
    new_fps: DataFrame,
    new_bands: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-new-document dedup verdicts against the stored corpus
    state: (id, exact_prev, exact_intra, near_prev) where

    - exact_prev  — byte-identical text already in the corpus,
    - exact_intra — byte-identical to another new doc with a SMALLER
                    id (the kept representative reads false),
    - near_prev   — shares >= 1 LSH band with some corpus doc
                    (candidate semantics; verify downstream).

    ``prev_fps``/``prev_bands`` are the stored state (corpus-scale:
    they stream, never shuffle); ``new_fps``/``new_bands`` are the
    increment's own tables (batch-scale: they broadcast). Callers
    append the kept rows' fps/bands to the stores for the next
    snapshot."""
    # corpus-side probes: broadcast the new keys, stream the store,
    # return only matches (tiny)
    hit_fp = (
        prev_fps.select("fp")
        .join(broadcast(new_fps.select("fp").distinct()), "fp")
        .distinct()
    )
    hit_band = (
        prev_bands.select("band_key")
        .join(broadcast(new_bands.select("band_key").distinct()),
              "band_key")
        .distinct()
    )
    # batch-side assembly: everything below is increment-sized
    intra = (
        new_fps.groupBy("fp")
        .agg(F.min("doc").alias("_keep"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("fp", "_keep")
    )
    fp_flags = (
        new_fps
        .join(broadcast(hit_fp.select("fp", F.lit(True).alias("_prev"))),
              "fp", "left")
        .join(broadcast(intra), "fp", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("_prev", F.lit(False)).alias("exact_prev"),
            (F.col("_keep").isNotNull() & (F.col("doc") != F.col("_keep")))
            .alias("exact_intra"),
        )
    )
    near = (
        new_bands
        .join(broadcast(hit_band), "band_key")
        .select(F.col("doc").alias(id_col))
        .distinct()
        .select(id_col, F.lit(True).alias("near_prev"))
    )
    return (
        fp_flags.join(broadcast(near), id_col, "left")
        .select(
            id_col,
            "exact_prev",
            "exact_intra",
            F.coalesce("near_prev", F.lit(False)).alias("near_prev"),
        )
    )


def _read_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The stored state relation (including the ``batch`` partition
    column), or an empty one on the first-ever batch. ONLY the
    missing-path case falls back to empty — any other read failure
    (corrupt store, permission, transient FS fault) must surface: a
    swallowed error would make the batch see an empty corpus store
    and silently reset the dedup state."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException as e:
        # match on the stable error CLASS first (Spark's error-class
        # framework guarantees the identifier across versions, unlike
        # the rendered message); keep the message probe only as a
        # fallback for errors raised without a class
        cls = e.getErrorClass() if hasattr(e, "getErrorClass") else None
        msg = str(e)
        if (cls == "PATH_NOT_FOUND"
                or (cls is None and ("PATH_NOT_FOUND" in msg
                                     or "Path does not exist" in msg))):
            return spark.createDataFrame([], schema)
        raise


def _make_stream_handler(
    state_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
):
    """The foreachBatch handler of :func:`run_incremental_stream`,
    factored so tests can drive it directly (including replaying a
    batch_id to exercise the retry path)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # exclude THIS batch's partition from the reads: a retried
        # batch (sink committed, checkpoint offset not) must not see
        # its own failed attempt's appends, or every doc would flag
        # exact_prev against itself
        prev_fps = _read_state(
            spark, f"{state_dir}/fps", "fp long, batch long"
        ).where(F.col("batch") != batch_id).select("fp")
        prev_bands = _read_state(
            spark, f"{state_dir}/bands",
            "doc string, band_key string, batch long",
        ).where(F.col("batch") != batch_id).select("band_key")
        new_fps = exact_fingerprints(batch_df, id_col, text_col)
        new_bands = minhash_band_table(batch_df, id_col, text_col,
                                       n, k, bands)
        flags = vet_batch(
            prev_fps, prev_bands, new_fps, new_bands, id_col
        ).localCheckpoint()
        # every write targets this batch's OWN partition directory
        # with overwrite — replaying the batch is idempotent
        (flags.write.mode("overwrite")
         .parquet(f"{out_dir}/verdicts/batch={batch_id}"))
        keep = flags.where(
            ~F.col("exact_prev") & ~F.col("exact_intra")
        ).select(F.col(id_col).alias("doc"))
        (new_fps.join(broadcast(keep), "doc").select("fp")
         .write.mode("overwrite")
         .parquet(f"{state_dir}/fps/batch={batch_id}"))
        (new_bands.select(F.col("doc").cast("string").alias("doc"),
                          "band_key")
         .join(broadcast(keep.select(F.col("doc").cast("string")
                                     .alias("doc"))), "doc")
         .write.mode("overwrite")
         .parquet(f"{state_dir}/bands/batch={batch_id}"))

    return handle


def run_incremental_stream(
    sdf: DataFrame,
    state_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """The operational loop as a stream: each micro-batch of documents
    is vetted against the parquet state stores under ``state_dir``
    (``fps/`` holding (fp), ``bands/`` holding (doc, band_key) — doc
    kept so near-candidate flags can be VERIFIED against stored state
    downstream), verdict rows land in ``out_dir``/verdicts, and the
    NON-exact rows' fingerprints/bands enter the stores so the NEXT
    batch is vetted against them too. Near candidates DO enter the
    store: they are distinct texts whose flag is advisory pending
    verification — dropping them would forget real documents.
    Returns the StreamingQuery.

    Fault tolerance: every sink write goes to a per-batch partition
    directory (batch=N) in overwrite mode, so a batch replayed after
    a partial failure is idempotent, and the state reads EXCLUDE the
    current batch's partition so a retry never vets documents against
    their own failed attempt. The verdict relation is eagerly
    localCheckpoint-ed before any append, severing its lineage from
    the store scans — otherwise the store appends would re-read the
    very directories they write (verdicts are batch-sized; at
    cluster scale the same sever is a checkpoint to reliable
    storage)."""
    handle = _make_stream_handler(
        state_dir, out_dir, id_col, text_col, n, k, bands)
    writer = sdf.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
