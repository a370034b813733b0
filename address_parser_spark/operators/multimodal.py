"""Multimodal column operators: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns with a
metadata struct; compute-heavy decode/feature steps run as Arrow-batched
``mapInPandas`` so each executor processes whole record batches.

The actual codecs (Pillow/ffmpeg/librosa) are NOT in this container, so the
decode kernels are STUBBED: ``decode_backend="real"`` raises
``NotImplementedError`` at the exact call site a deployment would plug a
codec into, and ``decode_backend="fake"`` substitutes a deterministic
hash-derived decode so the Spark-side plumbing — schemas, batch iteration,
partition behavior, UDF signatures — is real and tested end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decode: dimensions derived from a content hash
    (stable across partitionings / reruns)."""
    digest = hashlib.md5(payload or b"").digest()
    return {
        "media_type": ("image", "audio", "video")[digest[0] % 3],
        "width": 64 + digest[1] % 192,
        "height": 64 + digest[2] % 192,
        "n_frames": 1 + digest[3] % 64,
        "sample_rate": 8000 + (digest[4] % 5) * 8000,
        "n_bytes": len(payload or b""),
    }


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    digest = hashlib.sha256(payload or b"").digest()
    return [round((digest[i % 32] - 128) / 128.0, 6) for i in range(dim)]


def decode_media(df: DataFrame, binary_col: str = "html",
                 decode_backend: str = "fake") -> DataFrame:
    """binary → typed metadata struct, Arrow-batched (mapInPandas keeps the
    byte payloads inside the worker; no per-row Python UDF)."""
    if decode_backend == "real":
        raise NotImplementedError(
            "real decode requires an image/audio codec (Pillow/ffmpeg) — not "
            "available in this environment; plug it into _decode_batch below"
        )

    out_schema = T.StructType(df.schema.fields + [T.StructField("media", MEDIA_META_SCHEMA)])
    cols = df.columns

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            metas = [_fake_decode(bytes(p) if p is not None else b"") for p in batch[binary_col]]
            batch = batch.copy()
            batch["media"] = [
                (m["media_type"], m["width"], m["height"], m["n_frames"],
                 m["sample_rate"], m["n_bytes"])
                for m in metas
            ]
            yield batch

    return df.mapInPandas(_decode_batch, schema=out_schema)


def extract_media_features(df: DataFrame, binary_col: str = "html",
                           key_cols: list[str] | None = None,
                           decode_backend: str = "fake") -> DataFrame:
    """binary → fixed-dim float feature vector (the embedding-extraction
    shape: batched kernel, narrow output, key columns carried through)."""
    if decode_backend == "real":
        raise NotImplementedError("plug a real feature extractor here")
    keys = key_cols or ["url"]
    out_schema = T.StructType(
        [df.schema[k] for k in keys]
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def _features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = batch[keys].copy()
            out["features"] = [
                _fake_features(bytes(p) if p is not None else b"")
                for p in batch[binary_col]
            ]
            yield out

    return df.mapInPandas(_features_batch, schema=out_schema)


def sample_frames(df: DataFrame, binary_col: str = "html", n_frames: int = 4,
                  key_cols: list[str] | None = None) -> DataFrame:
    """Deterministic frame sampling for "video" payloads: one output row per
    sampled frame, frame bytes = evenly spaced slices of the payload.

    Pure JVM dataflow — ``explode(sequence)`` fan-out + binary ``substring``
    slices, zero Python on the data path (whole-stage codegen end to end).
    A real codec's frame decode would replace the substring with a
    ``mapInPandas`` kernel on the same (keys, frame_idx, frame) shape."""
    keys = key_cols or ["url"]
    payload = F.coalesce(F.col(binary_col), F.lit(b""))
    # step = max(len // n_frames, 1); slice idx covers [idx*step, idx*step+step)
    step = F.greatest(F.floor(F.length(payload) / n_frames).cast("int"), F.lit(1))
    return (
        df.select(*keys, payload.alias("_payload"), step.alias("_step"))
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))))
        .withColumn(
            "frame",
            F.substring(F.col("_payload"), F.col("frame_idx") * F.col("_step") + 1, F.col("_step")),
        )
        .select(*keys, F.col("frame_idx").cast("int").alias("frame_idx"), "frame")
    )
