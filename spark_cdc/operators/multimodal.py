"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages so each task processes whole record batches
(the only sane shape for multi-MB blobs — row-at-a-time Python would
serialize each blob separately).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so ``decode_fn='real'`` raises ``NotImplementedError`` at the decode
call site; the default deterministic fake derives "features" from the
blob bytes, keeping the Spark-side plumbing (schema, batch iteration,
partitioning, output contract) real and fully tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
        # digest of the lowercase-hex encoding of the payload (hex is
        # injective so this is still content-addressing); kept separate
        # from the raw-byte sha256 because cross-engine oracles
        # (DuckDB sha256 is VARCHAR-only) can recompute it
        T.StructField("content_digest", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats
    derived from the blob digest. Replace with PIL/ffmpeg decoding on
    a real cluster — the surrounding plumbing does not change."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, decode_fn: str = "fake") -> DataFrame:
    """Batch feature extraction over a media table via ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn == "real":
                raise NotImplementedError(
                    "real media decoding requires codec libraries (PIL/ffmpeg) "
                    "not present in this environment; use decode_fn='fake'"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "content_digest": payloads.map(
                        lambda b: hashlib.sha256(b.hex().encode()).hexdigest()
                        if b is not None
                        else None
                    ),
                    "features": payloads.map(
                        lambda b: _fake_decode_features(b).tolist() if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def generate_media_fixture(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary fixture: payload bytes derived from
    the id (no RNG), mixed kinds, plausible metadata."""
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ).alias("kind"),
            F.unhex(F.sha2(F.concat(F.lit(f"seed{seed}-"), F.col("id")), 256)).alias("payload"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.lit(64).alias("width"),
                F.lit(64).alias("height"),
                (F.pmod(F.col("id"), F.lit(5000)) + 1000).cast("int").alias("duration_ms"),
            ).alias("meta"),
        )
    )
    return df
