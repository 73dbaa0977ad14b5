"""Structured Streaming windowed aggregations over the events stream
(SURVEY.md §2.2-I).

The batch queries q20/q21/q22 use the *same* window()/session_window()
operators — Structured Streaming's incrementalization re-enters the
batch operator pipeline per micro-batch (SURVEY.md §3.2 entry 3), which
is what makes stream-vs-batch equivalence testable Spark-vs-Spark
(tests/test_streaming.py) without a DuckDB oracle.

Scale notes (100 TB/day stream): watermarks bound state store size;
window state is partitioned by (window, key) across executors; file
sources use maxFilesPerTrigger for back-pressure. Nothing here holds
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from luxo_rs_spark.sources.registry import ensure_session_confs

#: explicit source schema (streams never infer): the fixture stores ts
#: as parquet TIMESTAMP(MICROS), which maps directly to Spark TIMESTAMP.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream; ts lands as microsecond TIMESTAMP,
    matching the batch loader's normalized schema."""
    ensure_session_confs(spark)
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def tumbling_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type; watermark bounds
    state and admits late data up to `watermark`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"), "n"
        )
    )


def session_stats(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user (same operator as batch q22); streaming
    session aggregation requires a watermark to finalize sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
