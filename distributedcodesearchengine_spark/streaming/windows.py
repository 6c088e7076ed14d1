"""Structured Streaming windowed aggregation with watermarked late-data
handling (the driver brief's "watermarks + windowed aggs for late data").

``start_event_rate_stream`` maintains an append-mode event-rate rollup:
tumbling windows over the event time, finalized (and written to the
parquet sink) only once the watermark passes the window end; events
arriving LATER than the watermark are dropped — the bounded-state
contract that lets this run forever over an unbounded stream (state
size = windows within the watermark horizon, independent of history).

The batch equivalent of the finalized output is
``operators/timeseries.events_rollup`` restricted to on-time rows —
asserted in tests/test_streaming_windows.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def start_event_rate_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    max_files_per_trigger: int = 1,
):
    """readStream(events parquet dir) -> watermarked tumbling-window
    rollup -> append-mode parquet sink. Returns the StreamingQuery.

    ``max_files_per_trigger=1`` makes each input file its own
    micro-batch so the watermark advances between files (the test
    fixture relies on this to exercise the late-drop path
    deterministically)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


def start_windowed_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    alpha: float = 0.01,
    max_files_per_trigger: int = 1,
):
    """Streaming DDSketch: per-window log-bucket value histograms over
    the event stream -> append-mode parquet rows (bucket = window
    start, k = sketch bucket key, c = count).

    The streaming twin of ``operators/sketch.ddsketch_buckets`` — the
    same bucket-key expression, so each finalized window's rows equal
    the batch sketch over that window's on-time events EXACTLY
    (asserted in tests), and because the sketch merges by integer
    addition a downstream consumer can fold windows into any coarser
    granularity (or the whole stream) without re-reading events.
    State per the watermark contract is (windows in horizon) x (bucket
    keys) — fixed-size rows, unbounded-stream-safe."""
    from ..operators.sketch import _dd_consts

    ln_g, _ = _dd_consts(alpha)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .where(F.col("value") > 0)
        .withColumn(
            "k",
            F.ceil(F.log(F.col("value").cast("double")) / F.lit(ln_g)).cast("long"),
        )
        .groupBy(F.window("ts", window).alias("win"), "k")
        .agg(F.count("*").cast("long").alias("c"))
        .select(F.unix_timestamp(F.col("win.start")).alias("bucket"), "k", "c")
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
