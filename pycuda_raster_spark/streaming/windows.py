"""Event-time windowed aggregation — batch and streaming from ONE definition.

The reference has no event-time semantics (SURVEY.md §2.8 op 44 marks
watermarks N/A for parity), but the engine's streaming surface supports
them because a 100 TB ingest pipeline needs late-data handling: the same
windowed aggregation runs as a batch groupBy or as a watermarked
Structured Streaming query (tests assert the streaming result equals the
batch result on a bounded input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + exact decimal value sums per event_type.
    On a streaming DataFrame the watermark bounds state and admits late
    rows up to ``watermark``; on a batch DataFrame withWatermark is a
    no-op and the same plan aggregates the whole input."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "total",
        )
    )


def run_windowed_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_events",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drive the windowed aggregation as a Structured Streaming query over
    a parquet directory (AvailableNow, complete mode into a memory sink)
    and return the result as a DataFrame."""
    src = (
        spark.readStream.schema(T._parse_datatype_string(EVENTS_DDL))
        .parquet(events_dir)
    )
    agg = windowed_event_counts(src, window, watermark)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
