"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature kernels are STUBS behind import guards (no
image/audio libraries in this environment) with a deterministic fake
used by tests — but the Spark-side plumbing is real: schemas, Arrow
batch shapes, mapInPandas signatures, partition sizing. Swapping the
fake for PIL/torchaudio is a one-function change per kernel.

Batch-shape contract: mapInPandas receives pandas DataFrames whose
binary column is a Series of bytes objects; kernels must return one
row per input row (feature extract) or n rows per input (frame
sample), never collect, never loop Python-per-pixel (numpy only).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"
FRAME_SCHEMA = "media_id string, frame_idx int, frame_payload binary"

try:  # pragma: no cover - not installed in this environment
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires PIL; unavailable here by design."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use fake_feature for plumbing tests"
        )
    raise NotImplementedError  # pragma: no cover


def fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram moments. Real
    pipelines replace this with a decoded-image embedding; everything
    around it (batching, schema, partitioning) is identical."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    return hist / hist.sum()


def extract_features(
    df: DataFrame, kernel: Callable[[bytes], np.ndarray] = fake_feature
) -> DataFrame:
    """Feature-extract over the binary column via mapInPandas (Arrow
    batches; numpy inside; one output row per input row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "feature": [f.tolist() for f in feats],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.
    The 'frame' here is a deterministic byte slice (real video decode
    is library-gated); row-multiplication shape and schema are the
    real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or dur is None or dur <= 0:
                    continue
                n_frames = max(int(dur) // every_ms, 1)
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(bytes(payload[i * step:(i + 1) * step]))
            yield pd.DataFrame({
                "media_id": ids, "frame_idx": idxs, "frame_payload": payloads,
            })

    return df.mapInPandas(run, FRAME_SCHEMA)


def make_media_fixture(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic binary-column fixture (generated distributively:
    payload bytes from md5 chains, no driver-side data)."""
    df = spark.range(n_rows)
    payload = F.to_binary(
        F.concat(*[
            F.md5(F.concat(F.lit(f"{seed}|{i}|"), F.col("id").cast("string")))
            for i in range(4)
        ]), F.lit("hex"),
    )
    return df.select(
        F.format_string("m%06d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("kind"),
        payload.alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        (F.pmod(F.col("id"), 5) * 1000 + 1000).cast("int").alias("duration_ms"),
    )
