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
    """Wrap an existing binary column into the engine's media contract.

    ``id_col`` must already be integral: MEDIA_SCHEMA declares media_id
    non-nullable, and a silent ``cast('long')`` on e.g. a hex string key
    would null every id with no error — downstream joins on media_id would
    drop all media. Callers with string keys derive a numeric surrogate
    explicitly (``xxhash64(id)``) so the lossy step is visible."""
    dt = df.schema[id_col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"attach_media_columns: id column {id_col!r} is {dt}, not "
            "integral — cast('long') would silently null non-numeric ids; "
            "derive a numeric surrogate (e.g. xxhash64) explicitly"
        )
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

    The default kernel is NESTED (not a module-level reference) so
    cloudpickle ships it by value: Python workers need no importable copy of
    this package — required when the driving session (e.g. the correctness
    driver) runs from a directory where `etl_ecommerce_data_spark` is only
    on the driver's sys.path, not the workers'.
    """

    def fake_decode(payload, d=dim):  # mirrors _fake_decode_features
        if payload is None:
            return None
        counts = [0] * d
        for b in payload:
            counts[b % d] += 1
        total = float(len(payload)) or 1.0
        return [c / total for c in counts]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_decoder is not None:
                feats = batch_decoder(pdf["payload"])
            else:
                feats = pdf["payload"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"] if m else None),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"] if m else None),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_grayscale(
    media: DataFrame,
    width_col: str,
    height_col: str,
    out_w: int,
    out_h: int,
) -> DataFrame:
    """Nearest-neighbor resize of raw grayscale images (payload = row-major
    width×height bytes) to ``out_w``×``out_h`` — a REAL kernel (pure numpy
    index arithmetic, no codec dependency), Arrow-batched via mapInPandas.
    Rows whose payload length doesn't match width×height yield null payloads
    (corrupt-input tolerance rather than task failure)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, w, h in zip(pdf["payload"], pdf[width_col], pdf[height_col]):
                # pd.isna, not `is None`: Arrow hands a NULLABLE int column
                # to pandas as float64, so a null width arrives as NaN —
                # `w is None` never fires and int(NaN) would kill the task,
                # exactly the failure the null-payload contract forbids
                if (
                    p is None
                    or pd.isna(w)
                    or pd.isna(h)
                    or len(p) != int(w) * int(h)
                ):
                    out.append(None)
                    continue
                arr = np.frombuffer(p, dtype=np.uint8).reshape(int(h), int(w))
                ys = np.floor(np.arange(out_h) * int(h) / out_h).astype(np.int64)
                xs = np.floor(np.arange(out_w) * int(w) / out_w).astype(np.int64)
                out.append(arr[ys[:, None], xs[None, :]].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": out_w,
                    "height": out_h,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def resample_pcm(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Decimate 16-bit little-endian PCM audio payloads by keeping every
    ``every_n``-th sample — again a real numpy kernel (slicing), the audio
    analog of frame sampling. Odd trailing bytes are truncated to sample
    alignment."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                    continue
                n = len(p) - (len(p) % 2)
                samples = np.frombuffer(p[:n], dtype="<i2")
                out.append(samples[::every_n].tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})

    return media.mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )


def decode_image(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real image decode requires PIL/opencv — not in this container."""
    raise NotImplementedError(
        "image decode needs PIL/opencv (absent here); use extract_features "
        "with a batch_decoder in a full deployment"
    )


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:  # pragma: no cover - stub
    """Real frame sampling requires ffmpeg — not in this container."""
    raise NotImplementedError("video frame sampling needs ffmpeg (absent here)")
