"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, `mapInPandas` signatures; the actual media decoding is stubbed
(image/audio libraries are not in this container) behind deterministic
fakes that preserve shapes, clearly marked.  Swapping the stub for
PIL/torchaudio is a one-function change per modality.

Design rules for 100 TB of media:
- media bytes travel in a BinaryType column; metadata (width/height/
  duration/codec) lives in sibling scalar columns so pruning-only queries
  never touch the bytes
- decode/feature stages are mapInPandas over pyarrow batches; batch size is
  bounded by bytes not rows (spark.sql.execution.arrow.maxRecordsPerBatch
  and maxPartitionBytes sized together)
- features come back as fixed-length array<float> columns feeding the
  similarity ops (pipeline/similarity.py)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_real(kind: str, payload: bytes) -> np.ndarray:
    """The real decode hook.

    audio (WAV) is implemented with the stdlib ``wave`` module: the feature
    is FEATURE_DIM per-slice RMS energies of the waveform, normalised to
    [0, 1] — a real signal-derived embedding, deterministic, and sensitive
    to frequency/amplitude so similarity over it is meaningful.
    image/video decoding requires PIL/ffmpeg (not in this container) and
    still raises — swap in per modality."""
    if kind == "audio":
        import io
        import wave as _wave

        with _wave.open(io.BytesIO(payload), "rb") as w:
            n_frames = w.getnframes()
            sampwidth = w.getsampwidth()
            n_channels = w.getnchannels()
            raw = w.readframes(n_frames)
        dtype = {1: np.int8, 2: np.int16, 4: np.int32}[sampwidth]
        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if n_channels > 1:
            samples = samples.reshape(-1, n_channels).mean(axis=1)
        if samples.size == 0:
            return np.zeros(FEATURE_DIM, dtype=np.float32)
        # half the dims: per-slice RMS (amplitude envelope); other half:
        # per-slice RMS of the first difference (scales with frequency —
        # plain RMS of a sine is frequency-invariant, amp/√2)
        slices = np.array_split(samples, FEATURE_DIM // 2)
        full = float(np.iinfo(dtype).max)
        feat = np.empty(FEATURE_DIM, dtype=np.float64)
        for si, s in enumerate(slices):
            feat[2 * si] = np.sqrt((s ** 2).mean()) / full if s.size else 0.0
            d = np.diff(s)
            feat[2 * si + 1] = (
                np.sqrt((d ** 2).mean()) / full if d.size else 0.0
            )
        return feat.astype(np.float32)
    raise NotImplementedError(
        f"media decoding for kind={kind!r} requires imaging/video libraries "
        "not present in this environment; _decode_fake is used instead"
    )


def _decode_fake(kind: str, payload: bytes) -> np.ndarray:
    """STUB: deterministic fake 'decode' — a FEATURE_DIM float vector from
    the payload's blake2b digest.  Preserves shape/dtype contracts so the
    Spark plumbing (batching, schema, downstream similarity) is fully
    exercised."""
    digest = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 2).digest()
    arr = np.frombuffer(digest, dtype=np.uint16).astype(np.float32)
    return arr / np.float32(65535.0)


def extract_features(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURES_SCHEMA via mapInPandas.

    Arrow batches carry the binary payloads; the decode function runs per
    row inside the batch (vectorisation = batched Python calls, the same
    contract as the page pipeline).

    decoder: 'real' (raise where unimplemented), 'fake' (digest stub for
    every kind), or 'auto' (real where implemented — audio/WAV — and the
    clearly-marked fake elsewhere)."""
    if decoder not in ("auto", "real", "fake"):
        raise ValueError(f"unknown decoder mode {decoder!r}")

    def _decode(kind: str, payload: bytes) -> np.ndarray:
        if decoder == "fake":
            return _decode_fake(kind, payload)
        if decoder == "real":
            return _decode_real(kind, payload)
        try:
            return _decode_real(kind, payload)
        except NotImplementedError:
            return _decode_fake(kind, payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for r in batch.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                feature = _decode(r.kind, payload)
                rows.append(
                    (int(r.media_id), r.kind, len(payload), feature.tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload_bytes", "feature"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through, updates metadata columns — the
    real implementation decodes, resizes, re-encodes inside the same
    mapInPandas shape as extract_features."""
    return media.withColumn("meta_width", F.lit(width)).withColumn(
        "meta_height", F.lit(height)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame (media_id,
    frame_idx, ts_ms) — the explode is real; frame extraction itself is the
    stubbed decode step."""
    n_frames = (F.col("meta_duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx", "ts_s"),
        )
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
    )


def synthetic_wav(i: int, sample_rate: int = 8000, duration_s: float = 0.2) -> bytes:
    """A deterministic real WAV payload: mono 16-bit sine at a per-index
    frequency with a mid-file amplitude step (so per-slice RMS features
    differ across indices AND across slices)."""
    import io
    import math
    import wave as _wave

    freq = 200 + 37 * i
    n = int(sample_rate * duration_s)
    frames = bytearray()
    for t in range(n):
        amp = 0.25 if t < n // 2 else 0.6
        v = int(amp * 32767 * math.sin(2 * math.pi * freq * t / sample_rate))
        frames += v.to_bytes(2, "little", signed=True)
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests/demo (no external data):
    audio rows carry REAL WAV payloads (decoded by _decode_real); image and
    video rows carry opaque digest payloads (decoded by the marked fake)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "audio":
            payload = synthetic_wav(i)
        else:
            payload = (
                hashlib.blake2b(f"media-{i}".encode(), digest_size=32).digest() * 8
            )
        mime = "audio/wav" if kind == "audio" else f"application/x-fake-{kind}"
        rows.append(
            (
                i, kind, bytearray(payload), mime,
                64 + i % 8, 48 + i % 6, 1000 * (1 + i % 5),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
