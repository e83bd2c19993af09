"""Structured Streaming equals batch; multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ecommerce_data_spark.multimodal import (
    FEATURE_SCHEMA,
    attach_media_columns,
    decode_image,
    extract_features,
)
from etl_ecommerce_data_spark.sources.registry import load_table
from etl_ecommerce_data_spark.streaming.events import run_windowed_stream_to_memory
from etl_ecommerce_data_spark.testing import normalize

from tests.conftest import SF_SMOKE


def test_streaming_window_agg_equals_batch(spark):
    stream_out = run_windowed_stream_to_memory(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        ev.groupBy(F.window("ts", "5 minutes").start.alias("window_start"), "event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    assert normalize(stream_out) == normalize(batch)


def test_multimodal_feature_extraction(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = attach_media_columns(
        docs.withColumn("payload", F.encode(F.col("text"), "UTF-8")),
        id_col="doc_id", payload_col="payload", media_type="text/plain", source_col="source",
    )
    feats = extract_features(media, dim=8)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["media_type"] == "text/plain"
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # histogram normalized
        assert r["n_bytes"] > 0


def test_decode_image_is_explicit_stub(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(1)
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(docs)
