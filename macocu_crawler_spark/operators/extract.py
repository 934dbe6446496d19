"""Extract stage: pages → documents + link arrays, as one mapInPandas.

This is the Spark expression of the reference's process.py pipeline
(U1-U8 in SURVEY.md §2.8): charset decode ladder, MT filter, paragraph
making + jusText-style classification, trigram language id, prevert
rendering, link extraction — all per Arrow batch.

Scale notes (the 100 TB story):
- the stage is embarrassingly parallel over pages; input partitioning is
  whatever the scan gives (Iceberg/parquet splits) — no shuffle is needed
  or introduced
- language models / stoplists are built once per executor process via
  module-level lru_caches in textkit (SURVEY §1.1 "Language models")
- the UDF receives only the columns it needs (url, html, http_header,
  warc_ts, ip, wpage_id) — column pruning reaches the scan because
  mapInPandas declares its input via the upstream select
- output rows carry link *arrays*; downstream explodes them after
  filtering, so the shuffle moves only accepted links
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..functions import textkit

_EXTRACT_COLS = ["wpage_id", "url", "html", "http_header", "connect_time", "ip"]


def _make_extract_batches(conversion_enabled: bool):
    """Bind the driver's CONVERSION_ENABLED into the UDF closure at
    plan-build time.  Workers re-import config from THEIR environment, so
    reading the flag worker-side can split-brain against the driver-built
    admission plan (which fetches *.docx/odt/pdf when the driver flag is
    on): the closure value is pickled with the UDF, making the driver the
    single source of truth (ADVICE r3, config.py:42)."""

    def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        col_names = [f.name for f in schemas.EXTRACTED.fields]
        # one paragraph-language-score memo per TASK (guide §4.5 shape:
        # amortised over every batch in the partition, gone when the task
        # ends): boilerplate paragraphs repeat across pages, and
        # lang_difference is pure in (lang, text) — see textkit.any2txt
        diff_cache: dict = {}
        for batch in batches:
            rows = []
            for r in batch.itertuples(index=False):
                html = bytes(r.html) if r.html is not None else b""
                header = bytes(r.http_header) if r.http_header is not None else None
                row = textkit.process_page(
                    int(r.wpage_id), r.url, html, header, r.connect_time, r.ip,
                    conversion_enabled=conversion_enabled,
                    _diff_cache=diff_cache,
                )
                row["ignored_links"] = [
                    {"reason": reason, "url": url}
                    for reason, url in row["ignored_links"]
                ]
                row["links"] = [
                    {"scheme": s, "host": h, "path": p} for s, h, p in row["links"]
                ]
                rows.append([row[c] for c in col_names])
            yield pd.DataFrame(rows, columns=col_names)

    return _extract_batches


def extract_documents(pages: DataFrame) -> DataFrame:
    """pages (input_hint schema + wpage_id/ip/http_header) → EXTRACTED rows.

    ``connect_time`` (reference crawl.py:577 wpage stamp) is derived from
    warc_ts JVM-side so the UDF gets a plain string.
    """
    prepared = pages.select(
        "wpage_id",
        "url",
        "html",
        "http_header",
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("connect_time"),
        "ip",
    )
    from .. import config

    return prepared.mapInPandas(
        _make_extract_batches(config.CONVERSION_ENABLED), schema=schemas.EXTRACTED
    )
