"""Post-processing tools — the reference's util/ standalone scripts as
DataFrame ops.

- remove_duplicates (util/remove_duplicates.py:18-66): drop documents whose
  wpage_id is in duplicate_ids — an anti-join instead of a streaming text
  filter over prevert files.
- paragraph_class_filter (util/paragraph_class_filter.py:1-33): keep only
  <p> blocks with the requested class= values inside each prevert document;
  docs left with no paragraphs are dropped.
- urls_waiting_reformat (util/urls_waiting_reformat.py:41-67, F15): re-admit
  a saved download queue, dropping rows with over-long hostnames and
  capping paths per host.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def remove_duplicates(documents: DataFrame, duplicate_ids: DataFrame) -> DataFrame:
    """Final corpus = documents minus exact duplicates (first winner kept)."""
    return documents.join(duplicate_ids, "wpage_id", "left_anti")


_P_BLOCK_RE = re.compile(r"<p[^>]*>.*?</p>", re.S)
_CLASS_RE = re.compile(r'class="([^"]+)"')


def _filter_prevert(prevert: str, keep_classes: frozenset[str]) -> str | None:
    """Keep only <p> blocks whose class is in keep_classes; None if empty."""
    head_end = prevert.find(">")
    tail_start = prevert.rfind("</doc>")
    if head_end == -1 or tail_start == -1:
        return None
    body = prevert[head_end + 1 : tail_start]
    kept = [
        m.group(0)
        for m in _P_BLOCK_RE.finditer(body)
        if (cm := _CLASS_RE.search(m.group(0))) and cm.group(1) in keep_classes
    ]
    if not kept:
        return None
    return prevert[: head_end + 1] + "\n" + "\n".join(kept) + "\n" + prevert[tail_start:]


def paragraph_class_filter(
    documents: DataFrame, keep_classes: tuple[str, ...] = ("good",)
) -> DataFrame:
    """Rewrite prevert keeping only paragraphs of the given final classes."""
    keep = frozenset(keep_classes)

    @F.pandas_udf(T.StringType())
    def _udf(prevert: pd.Series) -> pd.Series:
        return prevert.map(
            lambda p: _filter_prevert(p, keep) if isinstance(p, str) and p else None
        )

    return (
        documents.withColumn("prevert", _udf(F.col("prevert")))
        .filter(F.col("prevert").isNotNull())
    )


def urls_waiting_reformat(
    frontier: DataFrame,
    max_hostname_len: int = 50,
    max_paths_per_host: int = 200,
) -> DataFrame:
    """F15: drop over-long hostnames; cap paths per host keeping the
    selection order (length(path), batch_id, seq)."""
    w = Window.partitionBy("scheme", "host").orderBy(
        F.length("path").asc(), F.col("batch_id").asc(), F.col("seq").asc()
    )
    return (
        frontier.filter(F.length("host") <= max_hostname_len)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_paths_per_host)
        .drop("rn")
    )
