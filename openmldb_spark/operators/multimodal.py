"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_features`` computes deterministic fake
features from the raw bytes so the Spark-side plumbing — schema,
partitioning, ``mapInPandas`` batch shape, output contract — is real
and tested end-to-end. Swapping in PIL/torchvision later changes only
the marked inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "attach_media_meta", "decode_image_features", "sample_frames"]

# typed metadata contract for opaque media blobs
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap native metadata: byte length + content hash (for exact
    dedup of blobs) without leaving the JVM."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_sha1", F.sha1(F.col(payload_col))
    )


def _stub_decode(payload: bytes | None, out_dim: int) -> np.ndarray:
    """STUB — deterministic fake embedding derived from the payload
    digest so tests are stable and the pipeline contract is exercised.
    ``_decode_one`` prefers a REAL decode when PIL is installed."""
    if payload is None:
        return np.zeros(out_dim, dtype=np.float32)
    digest = hashlib.sha256(bytes(payload)).digest()
    seed = int.from_bytes(digest[:8], "little", signed=False) % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype(np.float32)


def _pil_decode(payload: bytes, out_dim: int):
    """Real image decode when PIL is importable: grayscale-resize to a
    square patch and flatten to ``out_dim`` floats in [0, 1]. Returns
    None when PIL is absent or the payload isn't a decodable image —
    callers fall back to the stub."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        side = max(int(np.ceil(np.sqrt(out_dim))), 1)
        img = Image.open(io.BytesIO(bytes(payload))).convert("L").resize((side, side))
        arr = np.asarray(img, dtype=np.float32).ravel() / 255.0
        return arr[:out_dim].astype(np.float32)
    except Exception:  # noqa: BLE001 — undecodable blob → stub fallback
        return None


def _decode_one(payload: bytes | None, out_dim: int) -> np.ndarray:
    if payload is not None:
        real = _pil_decode(payload, out_dim)
        if real is not None:
            return real
    return _stub_decode(payload, out_dim)


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    out_dim: int = 32,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """(media_id, feature: array<float>) via Arrow-batched mapInPandas.

    Batch shape and schema are production-real; only the per-blob
    decode is the documented stub. Partitioning: inherits the scan
    partitions — repartition upstream if blobs are few and huge.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )
    src = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("__p__"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(p, out_dim).tolist() if p is not None else None
                for p in pdf["__p__"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return src.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
    id_col: str = "media_id",
) -> DataFrame:
    """Explode a video row into frame-sample rows (media_id, frame_ts_ms).

    Pure native explode(sequence(...)) — the actual frame extraction
    would be a mapInPandas decode keyed by (media_id, frame_ts_ms)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
