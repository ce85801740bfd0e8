"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode kernels are STUBS (deterministic fakes / NotImplementedError), while
the Spark-side plumbing — schemas, Arrow batch shapes, ``mapInPandas``
signatures, partition-friendly layout — is real and tested:

* ``binary_metadata``  — pure-JVM sniffing: payload size + magic-byte format
  detection (works on real bytes);
* ``decode_images``    — mapInPandas kernel with the (binary -> height,
  width, channels, features) contract; the actual pixel decode raises
  NotImplementedError unless ``fake=True``, which derives a deterministic
  fake geometry/feature vector from the byte content (so the distributed
  path, schema, and batching are fully exercised);
* ``frame_sample``     — video frame-sampling contract (stubbed the same way).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

__all__ = ["binary_metadata", "decode_images", "frame_sample"]

_MAGIC = [
    ("89504E47", "png"), ("FFD8FF", "jpeg"), ("47494638", "gif"),
    ("52494646", "riff"), ("3C68746D", "html"), ("3C21444F", "html"),
]


def binary_metadata(df: DataFrame, bin_col: str = "payload",
                    id_col: str = "id") -> DataFrame:
    """(id, n_bytes, format): JVM-side magic-byte sniff, no Python."""
    head = F.upper(F.hex(F.substring(F.col(bin_col), 1, 4)))
    fmt = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        fmt = F.when(head.startswith(magic), F.lit(name)).otherwise(fmt)
    return df.select(F.col(id_col).alias("id"),
                     F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
                     fmt.alias("format"))


IMAGE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def decode_images(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                  feature_dim: int = 8, fake: bool = False) -> DataFrame:
    """Arrow-batched decode + feature-extract contract.

    With ``fake=True`` the geometry and features are a deterministic pure
    function of the payload bytes (no image library needed); with
    ``fake=False`` this raises NotImplementedError where a real decoder
    (PIL/opencv) would plug in. The surrounding plan — column pruning to
    (id, payload), Arrow transfer, per-batch vectorized output — is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv; not present in this "
                    "environment — run with fake=True for the plumbing path")
            out = {"id": [], "height": [], "width": [], "channels": [],
                   "features": []}
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                buf = bytes(payload or b"")
                h = 1 + (len(buf) % 512)
                w = 1 + ((len(buf) * 7) % 512)
                arr = np.frombuffer(buf[:64].ljust(64, b"\0"), dtype=np.uint8)
                feats = (arr.reshape(feature_dim, -1).mean(axis=1) / 255.0
                         ).astype(np.float32)
                out["id"].append(int(i))
                out["height"].append(h)
                out["width"].append(w)
                out["channels"].append(3)
                out["features"].append(feats.tolist())
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"),
                     F.col(bin_col)).mapInPandas(run, schema=IMAGE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_hash", T.LongType(), False),
])


def frame_sample(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                 every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame-sampling contract: 1 row per sampled frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode unavailable; run with fake=True")
            out = {"id": [], "frame_idx": [], "frame_hash": []}
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                buf = bytes(payload or b"")
                n_frames = max(len(buf) // 64, 1)
                for f in range(0, n_frames, every_n):
                    chunk = buf[f * 64:(f + 1) * 64]
                    out["id"].append(int(i))
                    out["frame_idx"].append(f)
                    out["frame_hash"].append(
                        int(np.frombuffer(chunk.ljust(8, b"\0")[:8],
                                          dtype="<i8")[0]))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias("id"),
                     F.col(bin_col)).mapInPandas(run, schema=FRAME_SCHEMA)
