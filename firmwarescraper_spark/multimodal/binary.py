"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the training-data-pipeline pattern for 100 TB multimodal corpora: the
Spark-side plumbing (schemas, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the *decode* kernels are STUBBED behind
deterministic fakes because this container ships no image/audio libs
(clearly marked below — swap `_decode_stub` for PIL/ffmpeg at deployment;
the mapInPandas batch contract does not change).

Scale notes: decode/feature-extract run via ``mapInPandas`` so each Arrow
batch amortizes the Python crossing; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Binary payloads should be
size-bucketed (repartitionByRange on byte length) before heavy decode so
one task doesn't draw all the 4K videos.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("media_type", StringType()),   # image/audio/video/unknown
    StructField("container", StringType()),    # png/jpeg/riff/mp4/...
    StructField("bytes", LongType()),
    StructField("width", IntegerType()),       # images/video only
    StructField("height", IntegerType()),
    StructField("sha256", StringType()),
])

_MAGIC = [
    (b"\x89PNG", "image", "png"),
    (b"\xff\xd8\xff", "image", "jpeg"),
    (b"RIFF", "audio", "riff"),
    (b"\x00\x00\x00", "video", "mp4"),
]


def sniff_media_type(payload: bytes) -> tuple:
    """(media_type, container) from magic bytes — pure function, no decode."""
    if payload is None:
        return ("unknown", None)
    for magic, mtype, container in _MAGIC:
        if payload.startswith(magic):
            return (mtype, container)
    return ("unknown", None)


def _png_dims(payload: bytes) -> tuple:
    """PNG IHDR width/height — a real (non-stub) header parse."""
    if payload is not None and len(payload) >= 24 and payload.startswith(b"\x89PNG"):
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    return None, None


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Add a typed ``media_meta`` struct column (Arrow-batched pandas UDF:
    magic-byte sniff + PNG header parse + sha256 — all real, no decode)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(MEDIA_META_SCHEMA)
    def _meta(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payload:
            mtype, container = sniff_media_type(p)
            w, h = _png_dims(p)
            rows.append({
                "media_type": mtype, "container": container,
                "bytes": len(p) if p is not None else 0,
                "width": w, "height": h,
                "sha256": hashlib.sha256(p).hexdigest() if p is not None else None,
            })
        return pd.DataFrame(rows)

    return df.withColumn("media_meta", _meta(F.col(payload_col)))


# ---------------------------------------------------------------------------
# decode / transform kernels — STUBBED (no image/audio libs in container)
# ---------------------------------------------------------------------------

def _decode_stub(payload: bytes, op: str, params: str = "") -> bytes:
    """*** STUB DECODER ***
    Deterministic fake standing in for PIL/libvips/ffmpeg: output = 32-byte
    digest of (op, params, payload). At deployment, replace with the real
    kernel; every schema/batch contract around it stays identical. A real
    implementation that is unavailable must raise NotImplementedError — the
    fake is used so the plumbing is testable end-to-end."""
    h = hashlib.sha256()
    h.update(op.encode())
    h.update(params.encode())
    h.update(payload or b"")
    return h.digest()


_DECODED_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("decoded", BinaryType()),
    StructField("n_in_batch", IntegerType()),
])


def decode_image_batches(df: DataFrame, id_col: str = "id",
                         payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode stage: demonstrates the batch contract (one Arrow
    batch in -> one DataFrame out, batch size observable via n_in_batch)."""
    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame({
                "id": pdf[id_col],
                "decoded": [_decode_stub(p, "decode") for p in pdf[payload_col]],
                "n_in_batch": [n] * n,
            })

    return df.mapInPandas(gen, _DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Resize kernel plumbing (stubbed): params travel into the kernel,
    output schema is (id, resized binary)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _resize(payload: pd.Series) -> pd.Series:
        return payload.map(lambda p: _decode_stub(p, "resize", f"{width}x{height}"))

    return df.select(F.col(id_col), _resize(F.col(payload_col)).alias("resized"))


def extract_image_features(df: DataFrame, dim: int = 16,
                           id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Feature-extraction plumbing: binary -> array<double> embedding.
    The stub derives a deterministic pseudo-embedding from crc32 chunks of
    the payload (so dedup/similarity operators can be tested end-to-end on
    'image features' without a real model)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(DoubleType()))
    def _feat(payload: pd.Series) -> pd.Series:
        def feat(p):
            if p is None:
                return [0.0] * dim
            return [
                (zlib.crc32(p + bytes([i])) % 10_000) / 10_000.0 for i in range(dim)
            ]
        return payload.map(feat)

    return df.select(F.col(id_col), _feat(F.col(payload_col)).alias("features"))


_FRAME_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("frame", BinaryType()),
])


def frame_sample_video(df: DataFrame, every_n: int = 10, max_frames: int = 3,
                       id_col: str = "id", payload_col: str = "payload") -> DataFrame:
    """Video frame sampling plumbing (stubbed): one input row fans out to
    <= max_frames rows via mapInPandas — the table-valued shape a real
    ffmpeg sampler produces."""
    def gen(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for k in range(max_frames):
                    out.append({
                        "id": row[id_col], "frame_no": k * every_n,
                        "frame": _decode_stub(row[payload_col], "frame", str(k * every_n)),
                    })
            yield pd.DataFrame(out, columns=["id", "frame_no", "frame"])

    return df.mapInPandas(gen, _FRAME_SCHEMA)
