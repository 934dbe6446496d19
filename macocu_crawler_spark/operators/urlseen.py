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


def _seen_key(scheme, host, path_sanitised):
    return F.concat_ws("\x00", scheme, host, path_sanitised)


def _probe_hash_cols(key):
    """Two independent 64-bit probe hashes per key, computed JVM-SIDE
    (xxhash64 with two seeds — deterministic across runs/executors) so the
    Python side never hashes strings: the pandas UDFs receive ready int64
    columns and do pure vectorized bit math.  (Earlier form looped blake2b
    per key inside the UDF — the Bloom's main CPU cost at admission time.)"""
    return (
        F.xxhash64(key).alias("_h1"),
        F.xxhash64(key, F.lit(1)).alias("_h2"),
    )


def _as_u64(series: pd.Series) -> np.ndarray:
    return series.to_numpy(dtype=np.int64).view(np.uint64)


def build_blooms(url_seen: DataFrame, n_buckets: int = 32) -> DataFrame:
    """url_seen (scheme, host, path_sanitised) → one Bloom bitset per
    host-hash bucket (same bucketing as the frontier tables, so filter
    joins stay co-partitioned)."""
    key = _seen_key(F.col("scheme"), F.col("host"), F.col("path_sanitised"))
    keyed = url_seen.select(
        F.pmod(F.xxhash64("host"), F.lit(n_buckets)).cast("int").alias("bucket"),
        *_probe_hash_cols(key),
    )

    def make_bloom(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        n = len(pdf)
        m_bits = max(64, 1 << int(np.ceil(np.log2(max(n * BITS_PER_KEY, 1)))))
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h1 = _as_u64(pdf["_h1"])
        h2 = _as_u64(pdf["_h2"]) | np.uint64(1)  # odd → full-period probe
        for i in range(N_HASHES):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bits, (pos // 8).astype(np.int64),
                             (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [bucket], "bits": [bits.tobytes()], "n_keys": [n]}
        )

    return keyed.groupBy("bucket").applyInPandas(make_bloom, schema=BLOOM_SCHEMA)


def _might_contain_udf(bloom_map_bc):
    """Probe UDF over a sc.broadcast({bucket: bitset_bytes}) — the bitsets
    must NEVER travel as a joined column: a broadcast-join would copy the
    whole bloom into every candidate row and Arrow would ship bitset×rows
    bytes to Python (measured 60× slower).  As a broadcast variable each
    executor holds one copy and the UDF input is three scalar columns."""

    @F.pandas_udf(T.BooleanType())
    def might_contain(
        buckets: pd.Series, h1s: pd.Series, h2s: pd.Series
    ) -> pd.Series:
        n = len(h1s)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        bloom_map = bloom_map_bc.value
        h1 = _as_u64(h1s)
        h2 = _as_u64(h2s) | np.uint64(1)
        bvals = buckets.to_numpy()
        for b in np.unique(bvals):
            raw = bloom_map.get(int(b))
            if raw is None:
                continue  # bucket has no bloom -> nothing seen there
            ix = np.nonzero(bvals == b)[0]
            arr = np.frombuffer(raw, dtype=np.uint8)
            m_bits = np.uint64(len(arr) * 8)
            hit = np.ones(len(ix), dtype=bool)
            for i in range(N_HASHES):
                pos = (h1[ix] + np.uint64(i) * h2[ix]) % m_bits
                byte = arr[(pos // np.uint64(8)).astype(np.int64)]
                hit &= (byte >> (pos % np.uint64(8)).astype(np.uint8)) & 1 > 0
            out[ix] = hit
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
    # the bloom relation is tiny (n_buckets rows); ship it as an executor
    # broadcast VARIABLE, not a join column (see _might_contain_udf).  At
    # 10^10 keys, n_buckets scales with the seen set so each bitset stays
    # executor-memory-bounded; past broadcast size, the same probe runs
    # co-partitioned per bucket (mapPartitions over the bucketed layout).
    bloom_map = {
        int(r["bucket"]): bytes(r["bits"])
        for r in blooms.select("bucket", "bits").collect()
    }
    sc = candidates.sparkSession.sparkContext
    might = _might_contain_udf(sc.broadcast(bloom_map))
    key = _seen_key(F.col("scheme"), F.col("host"), F.col("path_sanitised"))
    h1c, h2c = _probe_hash_cols(key)
    flagged = (
        candidates.withColumn(
            "_bucket", F.pmod(F.xxhash64("host"), F.lit(n_buckets)).cast("int")
        )
        .withColumn("_h1", h1c)
        .withColumn("_h2", h2c)
        .withColumn(
            "_maybe_seen", might(F.col("_bucket"), F.col("_h1"), F.col("_h2"))
        )
    )
    definitely_new = flagged.filter(~F.col("_maybe_seen"))
    needs_exact = flagged.filter(F.col("_maybe_seen")).join(
        url_seen, ["scheme", "host", "path_sanitised"], "left_anti"
    )
    return definitely_new.unionByName(needs_exact).drop(
        "_bucket", "_h1", "_h2", "_maybe_seen"
    )
