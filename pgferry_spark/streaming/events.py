"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.12) — this module is the
beyond-reference streaming surface: the same event aggregation as
``operators.queries.events_hourly`` expressed over an unbounded source with
watermarked late-data handling, so one logical operator serves both batch
and streaming (the Dataflow-model posture).
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

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def stream_events_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events table directory. With
    ``maxFilesPerTrigger`` each micro-batch is bounded; at scale this is the
    landing-zone pattern (object-store prefix → readStream)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation: events later than
    ``watermark`` behind the max seen ts are dropped and their windows
    finalized — bounded state, the requirement for an unbounded run."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str = "events_hourly") -> list:
    """Drain the stream with availableNow into an in-memory sink and return
    the rows — the test harness for streaming operators."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()
