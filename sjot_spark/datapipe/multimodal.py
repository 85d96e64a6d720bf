"""Multimodal columns: image/audio/video as opaque binary columns
with typed metadata.

Decode is REAL for the library-free formats — PPM/PGM images and
RIFF/WAV PCM audio parse with pure numpy (decode_image /
decode_audio), and image resize + per-channel feature extraction run
vectorized on the decoded arrays. Compressed formats (JPEG/PNG/MP3/
MP4) stay behind an import guard (PIL/torchaudio are not in this
environment); swapping them in is a one-function change per kernel
because everything around the kernel — schemas, Arrow batch shapes,
mapInPandas signatures, row-multiplication — is format-agnostic.

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


def _ppm_header(payload: bytes):
    """Parse a binary PPM/PGM (P6/P5) header; returns
    (channels, width, height, maxval, data_offset)."""
    if payload[:2] not in (b"P6", b"P5"):
        return None
    channels = 3 if payload[:2] == b"P6" else 1
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    return channels, fields[0], fields[1], fields[2], pos + 1


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (h, w, c) uint8 array. PPM (P6)
    and PGM (P5) decode with pure numpy — no libraries; other formats
    need PIL (absent in this environment by design). Malformed or
    truncated headers raise NotImplementedError (never a raw
    ValueError/IndexError — one corrupt row must not kill a task with
    an uncontrolled error)."""
    try:
        hdr = _ppm_header(payload) if len(payload) >= 2 else None
    except (ValueError, IndexError) as e:
        raise NotImplementedError(f"malformed PPM/PGM header: {e}") from e
    if hdr is not None:
        c, w, h, maxval, off = hdr
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        if len(payload) < off + w * h * c:
            raise NotImplementedError("truncated PPM/PGM payload")
        arr = np.frombuffer(payload, dtype=np.uint8,
                            count=w * h * c, offset=off)
        return arr.reshape(h, w, c)
    if not HAVE_PIL:
        raise NotImplementedError(
            "compressed image decode requires PIL; PPM/PGM decode "
            "natively, or use fake_feature for plumbing tests")
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w, 1)/(h, w) uint8 -> binary PPM/PGM bytes
    (deterministic test-fixture encoder, the decode round-trip twin)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAV PCM16 with pure numpy: returns
    (float32 samples in [-1, 1] shaped (n, channels), sample_rate).
    Compressed audio would need a library (absent by design)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("only RIFF/WAV PCM decodes natively")
    pos = 12
    fmt = None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack(
            "<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if fmt is None:
                raise NotImplementedError("WAV data before fmt chunk")
            audio_fmt, channels, rate, _, _, bits = fmt
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV decodes natively")
            samples = np.frombuffer(body, dtype="<i2").astype(np.float32)
            return samples.reshape(-1, channels) / 32768.0, rate
        pos += 8 + size + (size & 1)
    raise NotImplementedError("WAV has no data chunk")


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) float32 [-1,1] -> PCM16 WAV bytes."""
    import struct

    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.round(np.clip(samples * 32767.0, -32768, 32767)) \
        .astype("<i2").tobytes()
    ch = samples.shape[1]
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
        16, 1, ch, rate, rate * ch * 2, ch * 2, 16, b"data", len(pcm))
    return hdr + pcm


def resize_image(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize with pure numpy fancy indexing."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows[:, None], cols[None, :]]


def image_feature(payload: bytes, thumb: int = 2) -> np.ndarray:
    """Decoded-image feature: per-channel mean/std + a thumb x thumb
    grayscale thumbnail — 2*c + thumb^2 float32s, all vectorized."""
    img = decode_image(payload).astype(np.float32)
    means = img.mean(axis=(0, 1)) / 255.0
    stds = img.std(axis=(0, 1)) / 255.0
    gray = img.mean(axis=2)
    tiny = resize_image(gray, thumb, thumb).reshape(-1) / 255.0
    return np.concatenate([means, stds, tiny]).astype(np.float32)


def audio_feature(payload: bytes, n_windows: int = 4) -> np.ndarray:
    """Decoded-audio feature: RMS energy over n equal windows + global
    peak — (n_windows + 1) float32s."""
    samples, _ = decode_audio(payload)
    mono = samples.mean(axis=1)
    k = max(len(mono) // n_windows, 1)
    rms = [float(np.sqrt(np.mean(mono[i * k:(i + 1) * k] ** 2)))
           if len(mono[i * k:(i + 1) * k]) else 0.0
           for i in range(n_windows)]
    return np.array(rms + [float(np.abs(mono).max() if len(mono) else 0.0)],
                    dtype=np.float32)


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
