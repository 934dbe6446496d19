"""Custom stateful streaming operator: cross-micro-batch URL-seen dedup.

The batch crawl keeps URL-seen as a table (operators/urlseen.py).  For a
streaming ingestion path (URLs arriving continuously, e.g. sitemap or
link-stream feeds), the same first-wins semantics become keyed state:

- key: (scheme, host) — the reference's per-domain hash set (domain.py:52)
- state: the set of sanitised paths seen for that host
- output: only first-seen URLs (append mode)

Implemented with applyInPandasWithState; state is bounded per host exactly
like the reference's per-domain set.  At production scale the state store
is RocksDB-backed and the key space shards by host hash — the same
partitioning as every other structure in the engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path_sanitised", T.StringType()),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def _dedup_fn(key, pdf_iter, state: GroupState):
    scheme, host = key
    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for pdf in pdf_iter:
        for path in pdf["path_sanitised"]:
            if path not in seen:
                seen.add(path)
                fresh.append(path)
    state.update((list(seen),))
    yield pd.DataFrame(
        {"scheme": scheme, "host": host, "path_sanitised": fresh}
    )


def dedup_url_stream(urls: DataFrame) -> DataFrame:
    """Streaming first-wins URL dedup keyed by (scheme, host).

    urls: a *streaming* DataFrame with (scheme, host, path_sanitised).
    Returns the stream of first-seen URLs.
    """
    return urls.groupBy("scheme", "host").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
