"""Streaming page ingestion: a pages landing directory → the full extract
pipeline → documents sink, as one Structured Streaming job.

The crawl loop itself is deliberately round-based (deterministic ordering —
simulator docstring), but the CORPUS side of the system is a continuous
ingester: fetchers (or WARC unpackers) drop page batches into a landing
directory, and this job runs the whole U1-U8 pipeline (charset ladder →
jusText-style paragraphs → trigram langid → prevert render → link
extraction) on each micro-batch, plus streaming exact dedup.

Spark-first shape:
- file source with a pinned schema (`readStream.parquet`); each landing
  file is a micro-batch unit (`maxFilesPerTrigger`)
- the SAME `extract_documents` mapInPandas stage as the batch/round path —
  mapInPandas is streaming-capable, so batch and stream share one code
  path and cannot drift
- streaming dedup via `dropDuplicates("txt_hash")` — keyed state in the
  state store; at corpus scale bound it with a watermark on `warc_ts`
  (`dedup_horizon`) so state ages out; `None` keeps exact-forever dedup
  for bounded backfills
- parquet sink + checkpointLocation: exactly-once per micro-batch, resume
  from the checkpoint after a crash — the streaming twin of the round
  model's SnapshotCatalog commits

Run modes: `trigger(availableNow=True)` drains the existing backlog and
stops (used by tests and backfills); omit for a continuous daemon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.extract import extract_documents

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("wpage_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("http_header", T.BinaryType()),
        T.StructField("ip", T.StringType()),
    ]
)

# the columns the documents sink keeps (the prevert corpus + dedup keys)
DOC_SINK_COLUMNS = [
    "wpage_id", "url", "title", "text", "prevert", "lang", "lang_diff",
    "crawl_date", "file_type", "token_count", "txt_len", "txt_hash",
]


def read_pages_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def extract_stream(
    pages: DataFrame, dedup_horizon: str | None = None
) -> DataFrame:
    """pages (stream or batch) → accepted documents, exact-deduped.

    One code path for both: `extract_documents` is the same mapInPandas
    stage the round loop uses.  Accepted = extracted text non-empty (the
    language gate lives inside the pipeline).  Dedup keeps the FIRST doc
    per txt_hash per micro-batch arrival order — the streaming analogue of
    the round model's first-wins dedup (exact equality of winners vs the
    batch path is arrival-order-dependent, which is why tests compare the
    deduped SET of hashes, not winner ids).

    SIZING dedup_horizon (production guidance, VERDICT r5): the watermark
    is an EVENT-time horizon on the page's crawl timestamp, so it must
    cover the fetchers' ARRIVAL SKEW — the longest lag between a page
    being crawled and its file landing in landing_dir — not the dedup
    window you want.  A doc arriving later than the horizon after its
    crawl_date is dropped as late (correct watermark semantics; the bench
    demonstrates docs_out collapsing when a 28-hour-span backfill is
    drained against a 1-hour horizon).  Rules of thumb: continuous
    fetcher→landing flow with minutes of lag → '3 hours' is generous and
    keeps state bounded; WARC backfills or any replay of historical
    crawl_dates → use None (exact-forever dedup) or run the batch
    reprocess path instead."""
    docs = extract_documents(pages).filter(F.col("txt_len") > 0)
    if dedup_horizon is not None:
        # crawl_date is the reference's 'yyyy-MM-dd HH:mm' stamp (P9)
        docs = docs.withColumn(
            "event_ts", F.to_timestamp("crawl_date", "yyyy-MM-dd HH:mm")
        ).withWatermark("event_ts", dedup_horizon)
        return docs.dropDuplicatesWithinWatermark(["txt_hash"]).select(
            *DOC_SINK_COLUMNS
        )
    return docs.dropDuplicates(["txt_hash"]).select(*DOC_SINK_COLUMNS)


def run_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    dedup_horizon: str | None = None,
    max_files_per_trigger: int = 1,
):
    """Drain the landing directory through the pipeline into a parquet
    documents sink (exactly-once via the checkpoint).  Returns the
    (terminated, in availableNow mode) StreamingQuery so callers can read
    ``recentProgress`` — per-micro-batch durations and state-store row
    counts (bench.py's streaming row)."""
    docs = extract_stream(
        read_pages_stream(spark, landing_dir, max_files_per_trigger),
        dedup_horizon=dedup_horizon,
    )
    writer = (
        docs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()  # pragma: no cover - daemon mode, not in tests
