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


def _decode_real(kind: str, payload: bytes) -> np.ndarray:  # pragma: no cover
    """The real decode hook. Not implemented in this container — no
    PIL/ffmpeg/torchaudio available.  Replace per modality."""
    raise NotImplementedError(
        f"media decoding for kind={kind!r} requires imaging/audio libraries "
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


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURES_SCHEMA via mapInPandas.

    Arrow batches carry the binary payloads; the decode function runs per
    row inside the batch (vectorisation = batched Python calls, the same
    contract as the page pipeline)."""
    decode = _decode_real if use_real_decoder else _decode_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for r in batch.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                feature = decode(r.kind, payload)
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


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demo (no external data)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.blake2b(f"media-{i}".encode(), digest_size=32).digest() * 8
        rows.append(
            (
                i, kind, bytearray(payload), f"application/x-fake-{kind}",
                64 + i % 8, 48 + i % 6, 1000 * (1 + i % 5),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
