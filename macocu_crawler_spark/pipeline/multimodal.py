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


def _parse_bmp_rgb(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB.

    Stdlib-only (struct/numpy): BITMAPFILEHEADER (14 bytes) +
    BITMAPINFOHEADER (40 bytes), rows padded to 4 bytes, bottom-up for
    positive height (the DIB convention)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    (hdr_sz, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiihhI", payload, 14
    )
    if hdr_sz < 40 or compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pix_off
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


def _gray(rgb: np.ndarray) -> np.ndarray:
    f = rgb.astype(np.float64)
    return (0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]) / 255.0


def _parse_bmp(payload: bytes) -> np.ndarray:
    return _gray(_parse_bmp_rgb(payload))


def _parse_pnm(payload: bytes) -> np.ndarray:
    """Binary PGM (P5) / PPM (P6), maxval ≤ 255 → grayscale in [0, 1]."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError("not a binary PGM/PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    data = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * ch, offset=pos
    ).astype(np.float64)
    if ch == 3:
        rgb = data.reshape(height, width, 3)
        gray = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    else:
        gray = data.reshape(height, width)
    return gray / float(maxval)


def _image_gray(payload: bytes) -> np.ndarray:
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _parse_pnm(payload)
    raise NotImplementedError(
        "image decoding implemented for BMP/PGM/PPM (stdlib-parseable); "
        f"magic {payload[:4]!r} needs PIL, not present in this environment"
    )


def _image_rgb(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB for any decodable image payload."""
    if payload[:2] == b"BM":
        return _parse_bmp_rgb(payload)
    if payload[:2] in (b"P5", b"P6"):
        g = (_parse_pnm(payload) * 255.0).round().astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    raise NotImplementedError(f"undecodable image magic {payload[:4]!r}")


def _bmp_bytes(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP bytes."""
    import struct

    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


IMAGE_TILES = (2, 4)  # FEATURE_DIM // 2 tiles: per-tile mean + std


def _image_features(gray: np.ndarray) -> np.ndarray:
    """Per-tile mean + std over a 2×4 grid → FEATURE_DIM floats in [0, 1].

    (std of values in [0,1] is ≤ 0.5, so ×2 normalises it.)"""
    tr, tc = IMAGE_TILES
    feat = np.empty(FEATURE_DIM, dtype=np.float64)
    i = 0
    for rchunk in np.array_split(gray, tr, axis=0):
        for tile in np.array_split(rchunk, tc, axis=1):
            feat[i] = tile.mean() if tile.size else 0.0
            feat[i + 1] = min(1.0, 2.0 * tile.std()) if tile.size else 0.0
            i += 2
    return feat.astype(np.float32)


VIDEO_SAMPLE_FRAMES = 4


def _parse_avi_frames(payload: bytes) -> list[np.ndarray]:
    """Uncompressed RIFF-AVI (DIB '00db' frames) → grayscale frames.

    A real, ffmpeg-readable container parsed with stdlib struct: the
    BITMAPINFOHEADER comes from the 'strf' chunk, frame chunks are raw
    bottom-up BGR rows padded to 4 bytes (the same DIB layout BMP uses)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF-AVI payload")
    width = height = None
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height
        pos = start
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)
            elif fourcc == b"strf":
                (_sz, width, height, _planes, bpp, comp) = struct.unpack_from(
                    "<IiihhI", payload, body
                )
                if bpp != 24 or comp != 0:
                    raise NotImplementedError("only raw 24-bit DIB AVI frames")
            elif fourcc in (b"00db", b"00dc") and width:
                stride = (width * 3 + 3) & ~3
                rows = np.frombuffer(
                    payload, dtype=np.uint8, count=stride * abs(height), offset=body
                ).reshape(abs(height), stride)[:, : width * 3].reshape(
                    abs(height), width, 3
                )
                if height > 0:
                    rows = rows[::-1]
                bgr = rows.astype(np.float64)
                frames.append(
                    (0.114 * bgr[:, :, 0] + 0.587 * bgr[:, :, 1] + 0.299 * bgr[:, :, 2])
                    / 255.0
                )
            pos = body + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    if not frames:
        raise NotImplementedError("AVI payload contains no raw DIB frames")
    return frames


def _decode_real(kind: str, payload: bytes) -> np.ndarray:
    """The real decode hook — all three modalities implemented for the
    stdlib-parseable formats:

    - audio: WAV via the stdlib ``wave`` module — per-slice RMS energies of
      the waveform (amplitude envelope) + first-difference RMS (scales with
      frequency), normalised to [0, 1]
    - image: uncompressed BMP / binary PGM / PPM via struct+numpy —
      per-tile mean + std over a 2×4 grid of the grayscale plane
    - video: uncompressed RIFF-AVI via struct — up to VIDEO_SAMPLE_FRAMES
      frames sampled evenly, each routed through the image feature path,
      features averaged

    Compressed formats (PNG/JPEG/MP4) still require PIL/ffmpeg — absent in
    this container — and raise NotImplementedError; extract_features'
    'auto' mode falls back to the clearly-marked digest fake for those."""
    if kind == "image":
        return _image_features(_image_gray(payload))
    if kind == "video":
        frames = _parse_avi_frames(payload)
        if len(frames) > VIDEO_SAMPLE_FRAMES:
            idx = np.linspace(0, len(frames) - 1, VIDEO_SAMPLE_FRAMES).round()
            frames = [frames[int(i)] for i in idx]
        return np.mean(
            [_image_features(f) for f in frames], axis=0
        ).astype(np.float32)
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


# Malformed untrusted payloads (truncated BMP with pix_off past the buffer,
# PNM with a non-numeric header, AVI with a lying strf, ...) surface as
# parse-layer exceptions, not NotImplementedError — web media must degrade
# to the fallback path, never fail the Spark task.  struct.error and
# wave.Error both subclass Exception but neither ValueError nor OSError, so
# list the concrete families the stdlib parsers can raise.
def _parse_errors() -> tuple:
    import struct
    import wave as _wave

    return (
        NotImplementedError,  # declared-unsupported format
        ValueError,           # int() on junk header, frombuffer/reshape size
        KeyError,             # unexpected WAV sample width
        IndexError,           # truncated header slicing
        EOFError,             # wave on truncated stream
        OSError,              # wave/aifc-style container errors
        ZeroDivisionError,    # zero-dim image in feature tiling
        struct.error,         # unpack_from past the buffer
        _wave.Error,          # malformed WAV chunks
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
        except _parse_errors():
            # undecodable OR malformed: degrade, don't fail the task
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


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real resize for decodable image payloads: decode (BMP/PNM) →
    nearest-neighbour resample → re-encode as 24-bit BMP, inside the same
    mapInPandas batch shape as extract_features.  Non-image kinds and
    undecodable payloads pass through unchanged (metadata untouched), so
    the op is safe to run over a mixed media table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = batch.copy()
            for idx, r in enumerate(batch.itertuples(index=False)):
                if r.kind != "image" or r.payload is None:
                    continue
                try:
                    rgb = _image_rgb(bytes(r.payload))
                except _parse_errors():
                    continue  # undecodable or malformed: pass through
                h, w = rgb.shape[:2]
                ri = (np.arange(height) * h // height).clip(0, h - 1)
                ci = (np.arange(width) * w // width).clip(0, w - 1)
                resized = rgb[ri][:, ci]
                out.iat[idx, out.columns.get_loc("payload")] = bytearray(
                    _bmp_bytes(resized)
                )
                out.iat[idx, out.columns.get_loc("meta_width")] = width
                out.iat[idx, out.columns.get_loc("meta_height")] = height
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


# kept name from round 2 (docs/tests referenced it); now the real op
resize_stub = resize_media


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


def _pattern_rgb(i: int, width: int, height: int, phase: int = 0) -> np.ndarray:
    """Deterministic per-index RGB test pattern: gradient + per-index
    sinusoid, shifted by `phase` (video frames use increasing phases so
    consecutive frames genuinely differ)."""
    r = np.arange(height)[:, None]
    c = np.arange(width)[None, :]
    red = (32 * (i % 8) + 3 * (c + phase)) % 256
    green = (8 * r + 5 * c + 17 * i) % 256
    blue = (
        127.5
        * (1 + np.sin((c + phase) * (0.2 + 0.05 * (i % 7)) + r * 0.1))
    ).round()
    return np.stack(
        [np.broadcast_to(a, (height, width)) for a in (red, green, blue)], axis=2
    ).astype(np.uint8)


def synthetic_bmp(i: int, width: int = 32, height: int = 24) -> bytes:
    """A real, decodable 24-bit BMP payload, deterministic per index."""
    return _bmp_bytes(_pattern_rgb(i, width, height))


def synthetic_avi(
    i: int, width: int = 16, height: int = 12, n_frames: int = 6, fps: int = 4
) -> bytes:
    """A real RIFF-AVI payload (uncompressed 24-bit DIB '00db' frames) —
    minimal but spec-shaped (avih/strh/strf headers), deterministic."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    stride = (width * 3 + 3) & ~3
    frame_bytes = stride * height
    frames = b""
    for f in range(n_frames):
        rgb = _pattern_rgb(i, width, height, phase=5 * f)
        rows = np.zeros((height, stride), dtype=np.uint8)
        rows[:, : width * 3] = rgb[::-1, :, ::-1].reshape(height, width * 3)
        frames += chunk(b"00db", rows.tobytes())
    strf = struct.pack(
        "<IiihhIIiiII", 40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHiIIIIIIi4h",
        0, 0, 0, 0, 1, fps, 0, n_frames, frame_bytes, 0, -1, 0, 0, width, height)
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10, n_frames, 0, 1, frame_bytes,
        width, height, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthetic_media_rows(n: int = 64) -> list[tuple]:
    """The deterministic media rows behind synthetic_media, exposed as
    plain Python so the entry oracle can regenerate the identical payloads
    single-node (fixture-time kernel differential, no Spark involved)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "audio":
            payload, mime = synthetic_wav(i), "audio/wav"
            w, h, dur = 0, 0, 200
        elif kind == "image":
            w, h = 32 + 4 * (i % 3), 24 + 2 * (i % 3)
            payload, mime = synthetic_bmp(i, w, h), "image/bmp"
            dur = 0
        else:
            w, h, nf = 16, 12, 4 + i % 4
            payload, mime = synthetic_avi(i, w, h, n_frames=nf), "video/x-msvideo"
            dur = 1000 * (1 + i % 5)
        rows.append((i, kind, bytearray(payload), mime, w, h, dur))
    return rows


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests/demo (no external data): every
    kind carries a REAL payload in a stdlib-parseable format — WAV audio,
    24-bit BMP images, uncompressed RIFF-AVI video — so _decode_real
    handles all rows and the digest fake is exercised only by explicitly
    undecodable payloads in tests."""
    return spark.createDataFrame(synthetic_media_rows(n), MEDIA_SCHEMA)
