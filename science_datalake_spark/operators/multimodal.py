"""Multimodal columns: opaque binary payloads + typed metadata, processed
by Arrow-batched mapInPandas (BASELINE.json north star).

Design: image/audio/video bytes live in a BINARY column next to a typed
metadata struct; decode / feature-extract / resize run as mapInPandas so
each Arrow batch is processed vectorized in Python. The real decoders
(PIL/ffmpeg/torchaudio) are NOT in this container, so decode is stubbed:
``fake=True`` produces deterministic md5-derived features (the Spark-side
plumbing — schema, batch shape, partition flow — is real and tested);
``fake=False`` raises NotImplementedError where the library call belongs.

Scale: binary payloads make wide rows — the operators keep payloads out of
shuffles (features are computed in a map-only stage, then the bytes are
dropped before any wide transformation), and the asset table would be
written with small row groups like the reference's fat-text tables
(convert_s2ag.py:37-70).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: FEATURE_DIM floats in
    [-1, 1) derived from the md5 of the payload."""
    digest = hashlib.md5(payload).digest()
    return [(b - 128) / 128.0 for b in digest[:FEATURE_DIM]]


def extract_features(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + featurize binary assets via mapInPandas (map-only stage; no
    shuffle of payload bytes; output drops the payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real decoder (PIL/ffmpeg) not available in this environment; "
                    "plug the library call here"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_stub(assets: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize plumbing: passes payload through mapInPandas and updates
    the metadata struct; the pixel work is the stubbed library call."""

    out_schema = ASSET_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("real resize requires PIL; plug it in here")
            pdf = pdf.copy()
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf

    return assets.mapInPandas(batches, schema=out_schema)


def sample_assets(spark: SparkSession, n: int = 32) -> DataFrame:
    """Deterministic binary fixture (payload = repeated md5 bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"asset-{i}".encode()).digest() * (4 + i % 5)
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (i, kind, bytearray(payload), ("application/octet-stream", 64, 64, 1000 + i))
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
