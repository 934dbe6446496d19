"""Prevertical text sink/source (S6).

The documents table is the primary store; this exports the `prevert`
column as the reference's on-disk prevertical corpus format — concatenated
`<doc ...>...</doc>` blocks (process.py:588-661) — one text file per
partition, and reads such files back into (doc_id, prevert) rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DOC_ID_RE = re.compile(r'<doc id="(\d+)"')


def write_prevert(documents: DataFrame, out_dir: str) -> None:
    """Write prevert blocks as text files (gzip), skipping empty docs.

    The text sink appends one '\\n' per row, and prevert blocks already end
    with '\\n' (process.py:629-635) — strip ours so the on-disk bytes match
    the reference corpus format exactly.
    """
    (
        documents.filter(F.col("prevert") != "")
        .select(F.regexp_replace("prevert", r"\n$", "").alias("value"))
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(out_dir)
    )


def read_prevert(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read prevert files back into (wpage_id, prevert) rows.

    Uses wholetext so multi-line <doc> blocks stay intact, then splits on
    record starts — the same framing the reference's post-tools use
    (util/remove_duplicates.py:18-66 walks <doc ...> headers).
    """
    raw = spark.read.text(path_glob, wholetext=True)
    # JVM-side split on the record-start lookahead (Java regex supports
    # (?=...)) — no Python UDF anywhere in the source
    docs = raw.select(
        F.explode(F.split(F.col("value"), r"(?=<doc )")).alias("prevert")
    ).filter(F.col("prevert").startswith("<doc "))
    return docs.select(
        F.regexp_extract("prevert", _DOC_ID_RE.pattern, 1).cast("long").alias("wpage_id"),
        "prevert",
    )
