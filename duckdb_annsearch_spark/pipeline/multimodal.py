"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning) is real and tested; the actual codec work is
stubbed behind deterministic fakes because the image/audio libraries are not
in this container — each stub documents the library call that replaces it.

Schema conventions:
  media(media_id long, kind string, payload binary, meta map<string,string>)
  features: (media_id long, feature array<float>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta map<string,string>"
FEATURE_DIM = 16


def make_media_df(spark, rows: list[tuple[int, str, bytes, dict]]) -> DataFrame:
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode': md5 bytes -> FEATURE_DIM floats in [0,1).

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))`` /
    ``soundfile.read`` / ``av.open`` then a feature extractor; raise
    NotImplementedError there if the lib is missing at runtime.
    """
    h = hashlib.md5(payload or b"").digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """(media_id, feature ARRAY<FLOAT>[16]) via Arrow-batched mapInPandas —
    the decode runs per executor partition, payload bytes never hit the
    driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id long, feature array<float>"
    )


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Stubbed image resize: passes payload through and records the target
    size in meta. Real impl: PIL ``Image.resize((width, height))`` inside the
    same mapInPandas shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = [
                {**(m or {}), "resized": f"{width}x{height}"} for m in pdf["meta"]
            ]
            yield pdf

    return df.mapInPandas(run, df.schema)


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Stubbed video frame sampling: emits one deterministic fake frame row
    per payload per sampled index (0..2). Real impl: ``av``/ffmpeg frame
    iteration, yielding one row per sampled frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(3):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i * every_n)
                    out["frame"].append(
                        hashlib.md5((payload or b"") + bytes([i])).digest()
                    )
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, frame binary"
    )
