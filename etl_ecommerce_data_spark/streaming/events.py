"""Structured Streaming operators over the events table.

The reference has no streaming at all (SURVEY §2.8: batch DAG, manual
trigger). This module adds the stream-shaped surface a modern pipeline needs:
a file-source event stream, watermarked tumbling-window aggregation, and a
bounded run-to-memory driver for tests/oracle checks.

Scale posture: the same code targets Kafka by swapping ``readStream.format``;
state is bounded by the watermark (late events beyond the delay are dropped),
and the windowed aggregation shuffles by (window, event_type) exactly like its
batch twin (plans/queries.py events_tumbling_5min).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Stream-side schema: ts arrives as raw long nanos (see sources/registry.py —
# the parquet files store TIMESTAMP(NANOS), which Spark reads via nanosAsLong).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one micro-batch
    locally; in production this is the Kafka source with the same schema)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover
        pass
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")  # only the events file
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_aggregation(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregation (count + exact decimal sum).

    The watermark bounds state: windows older than (max event time − delay)
    are finalized and evicted. Aggregates follow the engine's exactness rules
    so streaming output equals the batch twin bit-for-bit.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).start.alias("window_start"), "event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


def run_windowed_stream_to_memory(
    spark: SparkSession,
    sf_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drive the streaming aggregation over all available input and return the
    final result as a (batch) DataFrame.

    Uses the memory sink in *complete* mode: every micro-batch re-emits the
    full aggregation state, so after ``processAllAvailable`` the table holds
    exactly the batch-equivalent result (append mode would withhold windows
    newer than the watermark — untestable without an extra batch).
    """
    events = read_events_stream(spark, sf_dir)
    agg = windowed_event_aggregation(events, window, watermark)
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
