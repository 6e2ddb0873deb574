"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

A 100 TB training-data pipeline carries images/audio/video as binary
columns next to text. Two REAL codecs ship here with no library
dependency — 24-bit uncompressed BMP and 16-bit PCM WAV are plain
struct-packed formats, so ``image_features`` / ``audio_features`` /
``resize_bmp_images`` operate on actual pixels and samples
(encode/decode round-trip and hand-computed feature tests). Compressed
codecs (JPEG/MP3/H.264) need libraries NOT in this container; that call
alone is stubbed behind a deterministic fake (clearly marked below) with
the identical Spark plumbing: schema, Arrow batch shape, partitioning,
metadata expressions.

Scale shape:

* metadata (size, sha256) is pure column arithmetic — no UDF;
* decode/resize/frame-sample run as ``mapInPandas`` over Arrow batches:
  one Python worker per task, zero-copy binary columns in, fixed-width
  feature columns out. Payload bytes never pass through the driver.
* decoded features are small relative to payloads, so the recommended
  layout is payload parquet partitioned by modality with feature tables
  derived alongside (column pruning keeps payload bytes unread when
  only features are queried).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, "
    "mean_byte double, frame_hashes array<string>"
)


def to_blob_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a blob table from a text corpus for testing: payload =
    utf-8 bytes of the text (a deterministic stand-in for image bytes),
    plus typed metadata columns computed JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float, list[str]]:
    """STUB CODEC — deterministic fake in place of a real image decode
    (PIL/libjpeg are not installed in this container). A real
    deployment replaces ONLY this function; the Spark plumbing around
    it (batching, schema, partitioning) is production-shaped.

    Fake semantics: dimensions derived from payload length, "pixel
    mean" = mean byte value, "frames" = md5 of fixed-stride slices."""
    n = len(payload)
    width = 1 + n % 64
    height = 1 + (n // 64) % 64
    arr = np.frombuffer(payload, dtype=np.uint8)
    # exact integer sum then one divide: bit-identical to the SQL oracle's
    # sum(ascii)/count (numpy's pairwise-summed .mean() would not be)
    mean = float(int(arr.sum(dtype=np.int64))) / n if n else 0.0
    stride = max(1, n // 4)
    frames = [
        hashlib.md5(payload[i : i + stride]).hexdigest()
        for i in range(0, n, stride)
    ][:4]
    return width, height, mean, frames


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the payload column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "fake_width": pd.Series(
                        [r[0] for r in rows], dtype="int32"
                    ),
                    "fake_height": pd.Series(
                        [r[1] for r in rows], dtype="int32"
                    ),
                    "mean_byte": pd.Series(
                        [r[2] for r in rows], dtype="float64"
                    ),
                    "frame_hashes": pd.Series(
                        [r[3] for r in rows], dtype="object"
                    ),
                }
            )

    return blobs.select("doc_id", "payload").mapInPandas(
        batches, DECODE_SCHEMA
    )


def frame_sample(blobs: DataFrame, num_frames: int = 4) -> DataFrame:
    """(doc_id, frame_no, frame_hash) — fixed-stride frame sampling
    (exploded from the decode pass; a real video path would emit binary
    frames here with the identical plumbing)."""
    feats = decode_features(blobs)
    return feats.select(
        "doc_id", F.posexplode("frame_hashes").alias("frame_no", "frame_hash")
    ).where(F.col("frame_no") < num_frames)


# Pluggable decode hooks for COMPRESSED formats: mime -> callable
# (payload bytes) -> (H, W, 3) uint8 RGB array. A PIL/libvips-bearing
# deployment registers its codec once and the resize operator below
# picks it up without modification; this container registers none
# (JPEG/PNG stay honestly stubbed). The BMP path never consults the
# registry — its pure-numpy codec is always available.
_DECODE_HOOKS: dict[str, "callable"] = {}


def register_decode_hook(mime: str, decode) -> None:
    """Register ``decode(payload: bytes) -> (H, W, 3) uint8 RGB`` for a
    compressed mime type (e.g. ``image/jpeg`` backed by PIL)."""
    _DECODE_HOOKS[mime] = decode


def unregister_decode_hook(mime: str) -> None:
    _DECODE_HOOKS.pop(mime, None)


def _resize_frames(blobs: DataFrame, width: int, height: int, decode):
    """Shared resize plumbing: ``decode(mime, payload) -> (H, W, 3)``
    per row, nearest-neighbor resample, BMP re-encode — one mapInPandas
    batch iterator serving both the BMP path and the hook-decoded
    compressed path. Returns (doc_id, payload, width, height)."""
    import pandas as pd

    def batches(it: "Iterator[pd.DataFrame]"):
        for pdf in it:
            ids, payloads = [], []
            for did, mime, payload in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                pixels = _resample_nearest(
                    decode(mime, bytes(payload)), width, height
                )
                payloads.append(encode_bmp(pixels))
                ids.append(int(did))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "width": pd.Series([width] * len(ids), dtype="int32"),
                    "height": pd.Series([height] * len(ids), dtype="int32"),
                }
            )

    return blobs.select("doc_id", "mime", "payload").mapInPandas(
        batches, "doc_id long, payload binary, width int, height int"
    )


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing for COMPRESSED formats (JPEG/PNG/...): decodes
    through the ``register_decode_hook`` registry, then reuses the BMP
    path's real numpy resample + encode — so a codec-bearing deployment
    gets JPEG resize by registering one callable, with the Spark-side
    plumbing (mapInPandas batches, schema, partitioning) unchanged.
    With no hook registered for a payload's mime ->
    NotImplementedError at the point a real backend is needed.
    Uncompressed BMP payloads never need a hook: ``resize_bmp_images``
    below decodes/resamples/encodes for real (pure numpy). Returns
    (doc_id, payload, width, height)."""
    hooks = dict(_DECODE_HOOKS)  # snapshot; ships to executors

    def decode(mime, payload):
        fn = hooks.get(mime)
        if fn is None:
            raise NotImplementedError(
                f"no decode hook registered for {mime!r}: resize of "
                "compressed formats requires an image codec (PIL/"
                "libvips) not present in this container — "
                "register_decode_hook(mime, fn) plugs one in; image/bmp "
                "payloads resize without a hook via resize_bmp_images"
            )
        return fn(payload)

    return _resize_frames(blobs, width, height, decode)


# --------------------------------------------------------------------------
# REAL codecs — no library needed. BMP (24-bit uncompressed) and WAV
# (16-bit PCM) are plain struct-packed formats, so the decode, feature
# extraction, and resize below operate on actual pixels/samples; only
# compressed codecs (JPEG/MP3/H.264) remain stubbed.

import struct


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes (BGR rows,
    4-byte padded, bottom-up — the classic BITMAPINFOHEADER layout)."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += pixels[y, :, ::-1].tobytes() + b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header + info + body)


def decode_bmp(payload: bytes) -> "np.ndarray":
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    row = w * 3
    stride = row + (4 - row % 4) % 4
    flip = h > 0
    h = abs(h)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                        offset=data_off).reshape(h, stride)
    img = raw[:, :row].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """int16 mono samples -> RIFF/WAVE (PCM) bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """RIFF/WAVE bytes -> (sample_rate, channels, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    off, sr, ch = 12, None, None
    while off + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, off)
        if cid == b"fmt ":
            _fmt, ch, sr = struct.unpack_from("<HHI", payload, off + 8)
        elif cid == b"data":
            data = np.frombuffer(
                payload, dtype="<i2", count=clen // 2, offset=off + 8
            )
            return int(sr), int(ch), data
        off += 8 + clen + (clen % 2)
    raise ValueError("WAV has no data chunk")


def synth_blob_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic REAL media blobs derived from a text corpus: even
    doc_ids get a BMP image (pixels seeded from md5(text)), odd doc_ids
    a WAV clip (samples likewise) — so codec paths run on genuine
    format bytes with no external data. Executor-side generation
    (mapInPandas); payload bytes never touch the driver."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                seed = int.from_bytes(
                    hashlib.md5((text or "").encode()).digest()[:8], "big"
                )
                rng = np.random.default_rng(seed)
                if int(doc_id) % 2 == 0:
                    w, h = 8 + seed % 9, 6 + seed % 7
                    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    payloads.append(encode_bmp(px))
                    mimes.append("image/bmp")
                else:
                    n = 400 + seed % 300
                    s = rng.integers(-2000, 2000, size=n).astype(np.int16)
                    payloads.append(encode_wav(s, 8000))
                    mimes.append("audio/wav")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "mime": mimes,
                }
            )

    return df.select("doc_id", text_col).mapInPandas(
        batches, "doc_id long, payload binary, mime string"
    )


IMAGE_FEATURES_SCHEMA = (
    "doc_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, luma_std double"
)


def image_features(blobs: DataFrame) -> DataFrame:
    """REAL per-image features from BMP payloads: dimensions, per-channel
    means, luma stddev — actual pixel math over Arrow batches."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
                "luma_std",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload)).astype(np.float64)
                luma = (
                    0.299 * img[:, :, 0]
                    + 0.587 * img[:, :, 1]
                    + 0.114 * img[:, :, 2]
                )
                out["doc_id"].append(int(doc_id))
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["mean_r"].append(float(img[:, :, 0].mean()))
                out["mean_g"].append(float(img[:, :, 1].mean()))
                out["mean_b"].append(float(img[:, :, 2].mean()))
                out["luma_std"].append(float(luma.std()))
            yield pd.DataFrame(out)

    return (
        blobs.where(F.col("mime") == "image/bmp")
        .select("doc_id", "payload")
        .mapInPandas(batches, IMAGE_FEATURES_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_samples long, "
    "duration_s double, rms double, peak int"
)


def audio_features(blobs: DataFrame) -> DataFrame:
    """REAL per-clip features from WAV payloads: rate/channels/duration,
    RMS level, peak amplitude."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sr, ch, s = decode_wav(bytes(payload))
                x = s.astype(np.float64)
                rows.append(
                    (
                        int(doc_id), sr, ch, len(s), len(s) / (sr * ch),
                        float(np.sqrt((x * x).mean())) if len(s) else 0.0,
                        int(np.abs(s).max()) if len(s) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "n_samples",
                    "duration_s", "rms", "peak",
                ],
            )

    return (
        blobs.where(F.col("mime") == "audio/wav")
        .select("doc_id", "payload")
        .mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
    )


def _resample_nearest(
    img: "np.ndarray", width: int, height: int
) -> "np.ndarray":
    """Nearest-neighbor resample of an (H, W, 3) array — pure numpy
    index math; shared by the BMP path and the hook-decoded path."""
    h, w, _ = img.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return img[yi][:, xi]


def resize_bmp_images(
    blobs: DataFrame, width: int, height: int
) -> DataFrame:
    """REAL image resize for BMP payloads: decode -> nearest-neighbor
    resample (pure numpy index math) -> re-encode. Output payloads are
    valid BMPs of the target size — the full decode/transform/encode
    round trip a production image pipeline runs, minus only the
    compressed-codec call."""

    return _resize_frames(
        blobs.where(F.col("mime") == "image/bmp"),
        width,
        height,
        lambda mime, payload: decode_bmp(payload),
    )
