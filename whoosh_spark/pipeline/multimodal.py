"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, decode/feature/resize/frame-sample as Arrow-batched UDFs.

The image/audio libraries are NOT in this container, so the decode kernels
are STUBS: ``decode_image(..., impl=None)`` raises ``NotImplementedError``
unless a deterministic fake decoder is injected (tests use ``fake_decode``).
Everything Spark-side — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested, so a real decoder drops in unmodified.

Scale posture: media bytes never pass through Python row-at-a-time; batches
arrive as Arrow buffers, and per-batch output is columnar.  Feature vectors
come back as ``array<float>`` ready for pipeline.similarity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("magic", T.StringType()),
    ]
)


def media_metadata(df: DataFrame, media_col: str = "html",
                   id_col: str = "doc_id") -> DataFrame:
    """Typed metadata over an opaque binary column — all JVM expressions."""
    b = F.col(media_col)
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("sha"),
        F.hex(F.substring(b, 1, 4)).alias("magic"),
    )


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(blob: bytes, feat_dim: int = 8):
    """Deterministic stand-in for a real image decoder (pillow/cv2 absent in
    this container): shape + features derived from a sha256 of the bytes.
    CLEARLY A FAKE — swap for a real decoder via the ``impl`` parameter."""
    h = hashlib.sha256(blob or b"").digest()
    w = 1 + int.from_bytes(h[0:2], "big") % 2048
    ht = 1 + int.from_bytes(h[2:4], "big") % 2048
    feats = np.frombuffer(h[8:8 + 4 * feat_dim], dtype=np.uint8)[:feat_dim]
    feats = (feats.astype(np.float32) / 255.0).tolist()
    while len(feats) < feat_dim:
        feats.append(0.0)
    return w, ht, 3, feats


def decode_image(df: DataFrame, media_col: str = "html", id_col: str = "doc_id",
                 impl=None, feat_dim: int = 8) -> DataFrame:
    """binary → (width, height, channels, features) via Arrow-batched UDF.

    ``impl(blob) -> (w, h, c, list[float])``; None raises (no decoder in
    this environment) — inject ``fake_decode`` for plumbing tests.
    """

    def run(batches):
        for pdf in batches:
            if impl is None:
                raise NotImplementedError(
                    "no image decoder available in this environment; "
                    "inject impl= (e.g. a pillow-based decoder)"
                )
            rows = [impl(b, feat_dim) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "features": [r[3] for r in rows],
                }
            )

    src = df.select(F.col(id_col).cast("long").alias(id_col), media_col)
    return src.mapInPandas(run, schema=DECODED_IMAGE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(df: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8,
                 media_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """'Video' frame sampling stand-in: one fixed-size byte window every
    ``every_n_bytes`` (a real implementation samples container keyframes —
    the Spark shape, one output row per sampled frame, is identical)."""

    def run(batches):
        for pdf in batches:
            ids, nos, frames = [], [], []
            for did, blob in zip(pdf[id_col], pdf[media_col]):
                blob = blob or b""
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    ids.append(int(did))
                    nos.append(i)
                    frames.append(blob[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    src = df.select(F.col(id_col).cast("long").alias(id_col), media_col)
    return src.mapInPandas(run, schema=FRAME_SCHEMA)
