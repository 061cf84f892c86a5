"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The container ships no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs) — but the
Spark-side plumbing is real and tested: schema contracts, batch iteration,
partition-preserving metadata extraction, and the UDF signatures a decoder
would plug into. At scale the binary payloads stay columnar (parquet binary)
and the Arrow transfer moves whole batches, never rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "asset_id long, media_type string, byte_len long, sha256 string, magic string"
)

FEATURE_SCHEMA = "asset_id long, feature array<float>, decoder string"


def to_media_assets(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap any column as an opaque binary asset column with typed metadata."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("payload"),
    )


def extract_metadata(assets: DataFrame) -> DataFrame:
    """mapInPandas metadata pass: byte length, sha256, magic bytes.
    Runs once per Arrow batch; payload bytes never reach the driver."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payload.map(lambda b: 0 if b is None else len(b)),
                    "sha256": payload.map(
                        lambda b: None if b is None else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "magic": payload.map(
                        lambda b: None if b is None else bytes(b)[:4].hex()
                    ),
                }
            )

    return assets.mapInPandas(op, schema=MEDIA_META_SCHEMA)


def decode_and_featurize(assets: DataFrame, n_features: int = 8, real_codec: bool = False) -> DataFrame:
    """The decode→feature step a real pipeline would run (resize, frame
    sample, mel-spectrogram...). ``real_codec=True`` raises — the container
    has no codec libs (STUB, clearly marked). The default path produces a
    deterministic fake feature vector derived from content bytes, so the
    distributed plumbing (batch shape, schema, partitioning) is fully
    exercised and testable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_codec:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg/librosa) are not available in this "
                    "environment; plug the real decoder in here"
                )
            feats = []
            for b in pdf["payload"]:
                if b is None:
                    feats.append(None)
                    continue
                dg = hashlib.sha256(bytes(b)).digest()
                feats.append(
                    [float(dg[i]) / 255.0 for i in range(n_features)]
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "feature": feats,
                    "decoder": ["stub-sha256"] * len(pdf),
                }
            )

    return assets.mapInPandas(op, schema=FEATURE_SCHEMA)
