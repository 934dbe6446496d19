"""Stateful streaming URL-seen dedup: first-wins must hold ACROSS
micro-batches (the keyed state is the point)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path_sanitised", T.StringType()),
    ]
)


def test_cross_batch_first_wins(spark, tmp_path):
    from macocu_crawler_spark.streaming.stateful import dedup_url_stream

    src = tmp_path / "urls"
    src.mkdir()
    # batch 1: a.no {/x, /y}; b.no {/x}
    pq.write_table(
        pa.table({"scheme": ["http"] * 3, "host": ["a.no", "a.no", "b.no"],
                  "path_sanitised": ["/x", "/y", "/x"]}),
        str(src / "batch1.parquet"),
    )
    # batch 2: /x repeats on a.no (dup), /z new; b.no /y new
    pq.write_table(
        pa.table({"scheme": ["http"] * 3, "host": ["a.no", "a.no", "b.no"],
                  "path_sanitised": ["/x", "/z", "/y"]}),
        str(src / "batch2.parquet"),
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(str(src))
    )
    out = dedup_url_stream(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("t_urlseen_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = {(r.host, r.path_sanitised)
            for r in spark.table("t_urlseen_stream").collect()}
    # /x on a.no must appear exactly once even though batches differ
    assert rows == {("a.no", "/x"), ("a.no", "/y"), ("a.no", "/z"),
                    ("b.no", "/x"), ("b.no", "/y")}
    n_total = spark.table("t_urlseen_stream").count()
    assert n_total == 5  # 6 inputs, 1 cross-batch duplicate dropped
