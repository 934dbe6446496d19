"""Declared schemas for every engine table.

The reference is schema-on-convention (space-separated text lines,
SURVEY.md §1); here every dataset is a typed columnar table.  The ``pages``
schema is authoritative from BASELINE.json input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input table of Common-Crawl-style pages (BASELINE.json input_hint).
# `text`/`lang` are oracle columns carried through from fixture build; the
# engine recomputes them and the byte-identical test compares.
PAGES = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        # auxiliary columns (reference wpage record, crawl.py:575-578)
        StructField("ip", StringType()),
        StructField("http_header", BinaryType()),
        StructField("wpage_id", LongType()),
    ]
)

# URL frontier (reference: q_urls deque + per-domain _paths_new,
# util/__init__.py:197-257, domain.py:53).  One row per known URL.
# status: queued | selected | fetched | waiting | dead
FRONTIER = StructType(
    [
        StructField("url", StringType()),
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("path_sanitised", StringType()),
        StructField("is_robot", BooleanType()),
        StructField("src_scheme", StringType()),
        StructField("src_host", StringType()),
        StructField("redir_count", IntegerType()),
        StructField("status", StringType()),
        StructField("batch_id", LongType()),  # round the row was admitted
        StructField("seq", LongType()),       # intra-batch arrival order
    ]
)

# Per-(scheme, host) crawl state (reference Domain object, domain.py:38-64).
# robot_state: none | init | ready | fail | empty  (domain.py:30)
# status:      new_ip | new_robots | ready | bad | dead
DOMAINS = StructType(
    [
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("ip", StringType()),
        StructField("distance", IntegerType()),
        StructField("status", StringType()),
        StructField("robot_state", StringType()),
        StructField("robot_body", StringType()),
        StructField("crawl_delay", DoubleType()),
        StructField("count_downloaded", LongType()),
        StructField("count_cleaned", LongType()),
        StructField("bytes_downloaded", LongType()),
        StructField("bytes_cleaned", LongType()),
    ]
)

# URL-seen set (reference Domain._paths_hashes, domain.py:52).  The exact,
# authoritative set; Bloom filters are only a pre-filter (SURVEY.md §1.1).
URL_SEEN = StructType(
    [
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("path_sanitised", StringType()),
        StructField("path_hash", LongType()),  # xxhash64(path_sanitised)
    ]
)

# Global content dedup hashes (reference scheduler.py:84-86).
SEEN_HASHES = StructType(
    [
        StructField("kind", StringType()),  # 'txt' | 'raw'
        StructField("hash", LongType()),
        StructField("wpage_id", LongType()),  # first winner
    ]
)

# Processed documents (reference prevertical <doc>, process.py:629-635).
DOCUMENTS = StructType(
    [
        StructField("wpage_id", LongType()),
        StructField("url", StringType()),
        StructField("url_display", StringType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("prevert", StringType()),
        StructField("lang", StringType()),
        StructField("lang_diff", DoubleType()),
        StructField("crawl_date", StringType()),
        StructField("modified_date", StringType()),
        StructField("file_type", StringType()),
        StructField("enc_meta", StringType()),
        StructField("enc_chared", StringType()),
        StructField("token_count", LongType()),
        StructField("txt_len", LongType()),
        StructField("raw_len", LongType()),
    ]
)

LINK = StructType(
    [
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
    ]
)

IGNORED = StructType(
    [
        StructField("reason", StringType()),
        StructField("url", StringType()),
    ]
)

# Output of the extract stage (operators/extract.py): DOCUMENTS columns plus
# link arrays (exploded downstream) and per-page error diagnostics.
EXTRACTED = StructType(
    DOCUMENTS.fields
    + [
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("html_hash", LongType()),
        StructField("txt_hash", LongType()),
        StructField("links", ArrayType(LINK)),
        StructField("binfile_links", ArrayType(StringType())),
        StructField("ignored_links", ArrayType(IGNORED)),
        StructField("error_msgs", ArrayType(StringType())),
    ]
)

# Per-round checkpoint rows (north rule: per-partition lineage + metrics).
CHECKPOINTS = StructType(
    [
        StructField("round", LongType()),
        StructField("partition_id", IntegerType()),
        StructField("table", StringType()),
        StructField("version", LongType()),
        StructField("rows", LongType()),
        StructField("urls_selected", LongType()),
        StructField("urls_processed", LongType()),
        StructField("bytes_downloaded", LongType()),
        StructField("bytes_cleaned", LongType()),
    ]
)

DNS = StructType(
    [
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("ip", StringType()),
    ]
)
