"""Structured Streaming over the events table.

The reference is a soft-real-time loop rather than a stream processor
(SURVEY.md §2.9) — the crawl itself is deliberately round-based for
deterministic ordering.  The *corpus* side, however, wants streaming
ingestion (pages/events arriving continuously), so this module provides the
Structured Streaming expression of the engine's aggregations:

- file-source readStream over the events parquet (schema pinned)
- event-time tumbling windows with a watermark for late data
- the batch-equivalent query is exposed alongside (same plan, same result
  on a bounded input) — that equivalence is what the tests assert, and the
  batch form is what the DuckDB oracle checks
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file source wants a directory: stream the sf dir, filtered to the
    # events file(s) — in production this is the landing directory new
    # parquet files arrive into
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )


def windowed_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type with a watermark
    (streaming-safe: state is bounded by the watermark horizon)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of the streaming query (same result on bounded
    input; this is the oracle-checked form)."""
    return windowed_counts(spark.read.parquet(f"{sf_dir}/events.parquet"))


WINDOWED_COUNTS_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def run_stream_to_memory(spark: SparkSession, sf_dir: str, table: str = "stream_out"):
    """Execute the streaming query with availableNow (process-everything-
    then-stop) into an in-memory sink; returns the sink DataFrame."""
    stream = windowed_counts(read_events_stream(spark, sf_dir))
    query = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)
