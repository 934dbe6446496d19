"""URL-seen filtering at scale: partitioned Bloom pre-filter + exact anti-join.

The reference holds per-domain hash sets in RAM (domain.py:52); at a
10^10-URL frontier the seen set is a table, and the membership test becomes
(SURVEY.md §1.1):

1. a **Bloom pre-filter**: one Bloom bitset per host-hash bucket, built by
   applyInPandas over the url_seen table, small enough to broadcast-join
   onto candidate links.  Candidates the Bloom rejects are *definitely new*
   and skip the expensive exact join — on a mature crawl that is the vast
   majority of links.
2. the **exact anti-join** on (scheme, host, path_sanitised) for the
   candidates the Bloom admits — the authoritative check (the north rule
   demands the exact URL-seen set; Bloom is never allowed to drop or admit
   a URL on its own).

Spark's internal BloomFilter aggregate is not exposed as a SQL function in
this build, so the bitset math is a vectorized numpy implementation with
deterministic double hashing (blake2b-derived; stable across executors and
runs).  ``filter_new_candidates`` is a drop-in for the plain anti-join and
is tested equivalent to it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("bits", T.BinaryType()),
        T.StructField("n_keys", T.LongType()),
    ]
)

N_HASHES = 4
BITS_PER_KEY = 12  # ~0.3% false-positive rate at k=4


def _key_hashes(keys: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per key (double hashing h1 + i*h2)."""
    h1 = np.empty(len(keys), dtype=np.uint64)
    h2 = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        d = hashlib.blake2b(k.encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:], "big") | 1  # odd → full-period probe
    return h1, h2


def _seen_key(scheme, host, path_sanitised):
    return F.concat_ws("\x00", scheme, host, path_sanitised)


def build_blooms(url_seen: DataFrame, n_buckets: int = 32) -> DataFrame:
    """url_seen (scheme, host, path_sanitised) → one Bloom bitset per
    host-hash bucket (same bucketing as the frontier tables, so filter
    joins stay co-partitioned)."""
    keyed = url_seen.select(
        F.pmod(F.xxhash64("host"), F.lit(n_buckets)).cast("int").alias("bucket"),
        _seen_key(F.col("scheme"), F.col("host"), F.col("path_sanitised")).alias("key"),
    )

    def make_bloom(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        n = len(pdf)
        m_bits = max(64, 1 << int(np.ceil(np.log2(max(n * BITS_PER_KEY, 1)))))
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h1, h2 = _key_hashes(pdf["key"])
        for i in range(N_HASHES):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bits, (pos // 8).astype(np.int64),
                             (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [bucket], "bits": [bits.tobytes()], "n_keys": [n]}
        )

    return keyed.groupBy("bucket").applyInPandas(make_bloom, schema=BLOOM_SCHEMA)


def _might_contain_udf():
    @F.pandas_udf(T.BooleanType())
    def might_contain(bits: pd.Series, key: pd.Series) -> pd.Series:
        out = np.zeros(len(key), dtype=bool)
        if len(key) == 0:
            return pd.Series(out)
        # group rows by identical bitset to vectorise the probes
        arr_cache: dict[bytes, np.ndarray] = {}
        h1, h2 = _key_hashes(key)
        for idx in range(len(key)):
            raw = bits.iloc[idx]
            if raw is None:
                out[idx] = False  # bucket has no bloom -> nothing seen there
                continue
            raw = bytes(raw)
            arr = arr_cache.get(raw)
            if arr is None:
                arr = np.frombuffer(raw, dtype=np.uint8)
                arr_cache[raw] = arr
            m_bits = np.uint64(len(arr) * 8)
            hit = True
            for i in range(N_HASHES):
                pos = (h1[idx] + np.uint64(i) * h2[idx]) % m_bits
                if not (arr[int(pos) // 8] >> (int(pos) % 8)) & 1:
                    hit = False
                    break
            out[idx] = hit
        return pd.Series(out)

    return might_contain


def filter_new_candidates(
    candidates: DataFrame, url_seen: DataFrame, n_buckets: int = 32,
    blooms: DataFrame | None = None,
) -> DataFrame:
    """Drop candidates already in url_seen: Bloom pre-filter + exact
    anti-join (equivalent to a plain anti-join; tested so).

    candidates must carry (scheme, host, path_sanitised).  Pass a cached
    ``blooms`` (from build_blooms) to amortise Bloom construction across
    rounds — on the real system the blooms live in the checkpoint and are
    updated incrementally per round.
    """
    if blooms is None:
        blooms = build_blooms(url_seen, n_buckets)
    cand = candidates.withColumn(
        "_bucket", F.pmod(F.xxhash64("host"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        "_key", _seen_key(F.col("scheme"), F.col("host"), F.col("path_sanitised"))
    )
    joined = cand.join(
        F.broadcast(blooms.select(F.col("bucket").alias("_bucket"), "bits")),
        "_bucket",
        "left",
    )
    might = _might_contain_udf()
    flagged = joined.withColumn("_maybe_seen", might(F.col("bits"), F.col("_key")))
    definitely_new = flagged.filter(~F.col("_maybe_seen"))
    needs_exact = flagged.filter(F.col("_maybe_seen")).join(
        url_seen, ["scheme", "host", "path_sanitised"], "left_anti"
    )
    return definitely_new.unionByName(needs_exact).drop(
        "_bucket", "_key", "bits", "_maybe_seen"
    )
