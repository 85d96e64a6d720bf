"""Incremental dedup (sjot_spark/datapipe/incremental.py): new-batch
vetting against stored fingerprint/band state — exact-vs-prev,
intra-batch keep rule, LSH near-candidate flag, and the
broadcast-probe plan shape."""

import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import dedup, incremental

PREV_TEXT = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango")
# one mid-word edit of a 20-token doc: Jaccard 12/24 of 3-gram
# shingles, deterministically sharing 2 of 4 LSH bands with PREV_TEXT
# (probed once; the md5 permutation family is fixed, so this never
# flakes)
NEAR_TEXT = PREV_TEXT.replace("kilo", "zulu")
OTHER = "completely different content about spark engines"


@pytest.fixture(scope="module")
def state(spark):
    prev = spark.createDataFrame(
        [(1, PREV_TEXT), (2, OTHER)], "doc_id int, text string")
    new = spark.createDataFrame(
        [
            (101, PREV_TEXT),            # exact copy of prev 1
            (102, NEAR_TEXT),            # near dup of prev 1
            (103, "an entirely novel document about databases"),
            (104, "shared within batch only shared within batch only"),
            (105, "shared within batch only shared within batch only"),
        ],
        "doc_id int, text string")
    flags = incremental.vet_batch(
        incremental.exact_fingerprints(prev),
        dedup.minhash_band_table(prev, "doc_id", "text"),
        incremental.exact_fingerprints(new),
        dedup.minhash_band_table(new, "doc_id", "text"),
    )
    return prev, new, flags, {r.doc_id: r for r in flags.collect()}


def test_exact_vs_prev(state):
    *_, by_id = state
    assert by_id[101].exact_prev and not by_id[101].exact_intra
    assert not by_id[103].exact_prev


def test_near_candidate_vs_prev(state):
    *_, by_id = state
    # identical text always shares every band; the 1-word edit shares
    # >= 1 band (same pair as test_datapipe's minhash fixture)
    assert by_id[101].near_prev
    assert by_id[102].near_prev and not by_id[102].exact_prev
    assert not by_id[103].near_prev
    # intra-batch dups of a text unseen in prev are NOT near_prev
    assert not by_id[104].near_prev and not by_id[105].near_prev


def test_intra_batch_keep_rule(state):
    *_, by_id = state
    assert not by_id[104].exact_intra   # min doc_id is the keeper
    assert by_id[105].exact_intra
    assert not by_id[104].exact_prev and not by_id[105].exact_prev


def test_every_new_doc_gets_a_verdict(state):
    _, new, flags, by_id = state
    assert set(by_id) == {101, 102, 103, 104, 105}
    assert flags.count() == new.count()


def test_streaming_incremental_loop(spark, tmp_path):
    """The operational loop: batch 1 bootstraps empty stores and
    appends its rows; batch 2 is vetted against batch 1's persisted
    state (exact dup flagged, near candidate flagged, novel doc
    clean) and only non-exact rows re-enter the store."""
    from sjot_spark.datapipe import incremental

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [("1", PREV_TEXT), ("2", OTHER)], "doc_id string, text string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("3", PREV_TEXT), ("4", NEAR_TEXT),
         ("5", "an entirely novel document about databases")],
        "doc_id string, text string",
    ).coalesce(1).write.parquet(str(src / "f2"))

    sdf = (spark.readStream.schema("doc_id string, text string")
           .option("maxFilesPerTrigger", 1)
           .parquet(str(src / "*")))
    q = incremental.run_incremental_stream(
        sdf, str(tmp_path / "state"), str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    verd = {
        r.doc_id: (r.exact_prev, r.exact_intra, r.near_prev, r.batch)
        for r in spark.read.parquet(str(tmp_path / "out" / "verdicts"))
        .collect()
    }
    b1 = verd["1"][3]
    assert verd["1"][:3] == (False, False, False)
    assert verd["2"][:3] == (False, False, False)
    assert verd["3"] == (True, False, True, b1 + 1)   # exact -> also near
    assert verd["4"][:3] == (False, False, True)      # near candidate only
    assert verd["5"][:3] == (False, False, False)
    # store holds batch-1 rows + batch-2 non-exact rows (4, 5) — doc 3
    # (exact dup) must NOT have re-entered
    fps = spark.read.parquet(str(tmp_path / "state" / "fps")).collect()
    assert len(fps) == 4 and len({r.fp for r in fps}) == 4
    # the band store keeps doc ids so near candidates can be VERIFIED
    # against stored state downstream
    bands_cols = spark.read.parquet(
        str(tmp_path / "state" / "bands")).columns
    assert {"doc", "band_key"} <= set(bands_cols)


def test_streaming_retry_is_idempotent(spark, tmp_path):
    """A batch replayed after a partial failure (sink written,
    checkpoint offset not committed) must produce the same state and
    verdicts — and must NOT vet documents against their own failed
    attempt's appends."""
    from sjot_spark.datapipe.incremental import _make_stream_handler

    handle = _make_stream_handler(
        str(tmp_path / "state"), str(tmp_path / "out"))
    b1 = spark.createDataFrame(
        [("1", PREV_TEXT), ("2", OTHER)], "doc_id string, text string")
    handle(b1, 0)
    handle(b1, 0)   # retry of the same batch
    verd = spark.read.parquet(str(tmp_path / "out" / "verdicts")).collect()
    # no duplicate verdicts, and no doc self-flagged as exact_prev
    assert len(verd) == 2
    assert all(not r.exact_prev and not r.near_prev for r in verd)
    fps = spark.read.parquet(str(tmp_path / "state" / "fps")).collect()
    assert len(fps) == 2
    # the next batch still sees batch 0's state normally
    b2 = spark.createDataFrame(
        [("3", PREV_TEXT)], "doc_id string, text string")
    handle(b2, 1)
    v2 = {r.doc_id: r for r in spark.read.parquet(
        str(tmp_path / "out" / "verdicts")).collect()}
    assert v2["3"].exact_prev and v2["3"].near_prev


def test_probe_plan_broadcasts_the_increment(state):
    """The corpus-scale stores must never shuffle: every join in the
    vet plan is a broadcast hash join (the new side broadcasts into
    the store scans; the tiny hit sets broadcast back)."""
    prev, new, flags, _ = state
    plan = flags._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
