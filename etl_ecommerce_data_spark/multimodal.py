"""Multimodal column plumbing: opaque binary media + typed metadata.

Design (LLM-data-pipeline extension): image/audio/video payloads live in an
opaque ``binary`` column next to a typed metadata struct; decode / feature
extraction / resize / frame sampling run as Arrow-batched Pandas functions
over ``mapInPandas`` so each task processes whole record batches without JVM
round-trips per row.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this environment, so the
decode kernels are deterministic fakes / explicit stubs — the Spark-side
contract (schema, batch iteration, partitioning) is real and tested, and a
production deployment only swaps the kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_media_columns(df: DataFrame, id_col: str, payload_col: str, media_type: str, source_col: str) -> DataFrame:
    """Wrap an existing binary column into the engine's media contract."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """Deterministic stand-in for a real decoder: fixed-dim byte-histogram
    features. A real deployment replaces this body with PIL/librosa decode —
    the mapInPandas plumbing around it is unchanged."""
    if payload is None:
        return None
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def extract_features(media: DataFrame, dim: int = 8, batch_decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over the media contract.

    ``batch_decoder(payload_series) -> Series[list[float]]`` lets callers
    inject a real vectorized decoder; default is the deterministic fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_decoder is not None:
                feats = batch_decoder(pdf["payload"])
            else:
                feats = pdf["payload"].map(lambda p: _fake_decode_features(p, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"] if m else None),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"] if m else None),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real image decode requires PIL/opencv — not in this container."""
    raise NotImplementedError(
        "image decode needs PIL/opencv (absent here); use extract_features "
        "with a batch_decoder in a full deployment"
    )


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:  # pragma: no cover - stub
    """Real frame sampling requires ffmpeg — not in this container."""
    raise NotImplementedError("video frame sampling needs ffmpeg (absent here)")
