"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

A 100 TB training-data pipeline carries images/audio/video as binary
columns next to text. The image/audio codec libraries are NOT in this
container, so the codec call itself is stubbed behind a deterministic
fake (clearly marked below) — but everything Spark-side is real and
tested: schema, Arrow batch shape, partitioning behavior, and the
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


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: emits target dims + passthrough payload hash.
    The pixel resample itself requires a codec -> NotImplementedError
    at the point a real backend is needed."""
    raise NotImplementedError(
        "resize requires an image codec (PIL/libvips) not present in "
        "this container; decode_features/frame_sample demonstrate the "
        "mapInPandas plumbing with the stub codec"
    )
