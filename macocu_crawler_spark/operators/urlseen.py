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

# -- blob framing -------------------------------------------------------------
# Every serialized filter blob (the `bits` column of BLOOM_SCHEMA rows, the
# as_map()/broadcast maps, checkpointed prefilter snapshots) carries an
# 8-byte header: [family tag, format version, 6 reserved zero bytes].  The
# probe UDFs assert it, so a bloom-built map probed as a cuckoo (or vice
# versa), or a stale on-disk format, fails loudly instead of reinterpreting
# raw bitset bytes as a table header and probing garbage (ADVICE r5).  Eight
# bytes (not one) keeps the uint64 reads behind the header aligned.
_BLOB_HEADER = 8
_TAG_BLOOM = 0x42   # 'B'
_TAG_CUCKOO = 0x43  # 'C'
_BLOB_FORMAT = 1


def _wrap_blob(tag: int, payload: bytes) -> bytes:
    return bytes((tag, _BLOB_FORMAT)) + b"\x00" * (_BLOB_HEADER - 2) + payload


def _check_blob(blob: bytes, tag: int) -> None:
    if len(blob) < _BLOB_HEADER or blob[0] != tag or blob[1] != _BLOB_FORMAT:
        raise ValueError(
            f"prefilter blob header mismatch: got {bytes(blob[:2])!r}, want "
            f"tag {bytes((tag,))!r} format {_BLOB_FORMAT} — a bloom-built "
            "map probed as cuckoo (or vice versa), or a stale serialized "
            "filter; rebuild the prefilter from url_seen"
        )


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
        _set_bits(bits, _as_u64(pdf["_h1"]), _as_u64(pdf["_h2"]))
        return pd.DataFrame(
            {"bucket": [bucket], "bits": [_wrap_blob(_TAG_BLOOM, bits.tobytes())],
             "n_keys": [n]}
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
            _check_blob(raw, _TAG_BLOOM)
            ix = np.nonzero(bvals == b)[0]
            arr = np.frombuffer(raw, dtype=np.uint8, offset=_BLOB_HEADER)
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
    blooms: DataFrame | None = None, bloom_map: dict[int, bytes] | None = None,
    bloom_map_bc=None, url_seen_parts: list[DataFrame] | None = None,
    kind: str = "bloom",
) -> DataFrame:
    """Drop candidates already in url_seen: Bloom/cuckoo pre-filter + exact
    anti-join (equivalent to a plain anti-join; tested so).

    candidates must carry (scheme, host, path_sanitised).  Pass a cached
    ``blooms`` (from build_blooms) to amortise Bloom construction across
    rounds — on the real system the blooms live in the checkpoint and are
    updated incrementally per round.  Round loops should pass
    ``bloom_map_bc`` (``BloomState.broadcast_map`` /
    ``CuckooState.broadcast_map`` with kind='cuckoo') so one executor
    broadcast is reused across rounds instead of a fresh copy per call.
    """
    if kind not in ("bloom", "cuckoo"):
        raise ValueError(f"unknown prefilter kind {kind!r}")
    if bloom_map_bc is None:
        if bloom_map is None:
            if blooms is None:
                blooms = (build_blooms if kind == "bloom" else build_cuckoos)(
                    url_seen, n_buckets
                )
            # the bloom relation is tiny (n_buckets rows); ship it as an
            # executor broadcast VARIABLE, not a join column (see
            # _might_contain_udf).  At 10^10 keys, n_buckets scales with the
            # seen set so each bitset stays executor-memory-bounded; past
            # broadcast size, the same probe runs co-partitioned per bucket
            # (mapPartitions over the bucketed layout).  Callers running a
            # round loop pass bloom_map_bc from a BloomState instead — built
            # once, re-broadcast only when the bloom changed.
            bloom_map = {
                int(r["bucket"]): bytes(r["bits"])
                for r in blooms.select("bucket", "bits").collect()
            }
        sc = candidates.sparkSession.sparkContext
        bloom_map_bc = sc.broadcast(bloom_map)
    might = (
        _might_contain_udf(bloom_map_bc)
        if kind == "bloom"
        else _cuckoo_might_contain_udf(bloom_map_bc)
    )
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
    needs_exact = anti_join_seen_parts(
        flagged.filter(F.col("_maybe_seen")),
        url_seen_parts if url_seen_parts else [url_seen],
    )
    return definitely_new.unionByName(needs_exact).drop(
        "_bucket", "_h1", "_h2", "_maybe_seen"
    )


SEEN_KEY_COLS = ["scheme", "host", "path_sanitised"]


def write_bucketed_seen(
    url_seen: DataFrame, location: str, table: str, n_buckets: int = 32
) -> DataFrame:
    """Persist url_seen as a BUCKETED table on the seen key and return the
    bucketed relation.

    This is the Iceberg-bucketing story for the exact anti-join: a plain
    parquet seen set makes every round's admission shuffle BOTH sides of
    the anti-join on the seen key — at 10^10 seen rows, a full reshuffle
    of the biggest table in the system per round.  Bucketed storage makes
    the scan itself hash-partitioned on the join key, so the SortMergeJoin
    needs an Exchange only on the (small) candidates side: the seen side
    is read in place, bucket-for-bucket (plan-asserted in
    tests/test_plans.py).  Appends between compactions stay as small
    delta relations that AQE broadcasts; `anti_join_seen_parts` chains
    the two — equivalent to the anti-join against the union.
    """
    import shutil

    spark = url_seen.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(location, ignore_errors=True)  # stale unregistered dir
    (
        url_seen.select(*SEEN_KEY_COLS)
        # repartition on the bucket key first: bucketBy alone writes one
        # file per (input partition × bucket) — a 32-partition input left
        # 32 files in every bucket, so "one sorted file per bucket" never
        # actually held (found round 6).  repartition and bucketBy share
        # Murmur3 HashPartitioning, so each task holds exactly one bucket
        # and emits exactly one file
        .repartition(n_buckets, *SEEN_KEY_COLS)
        .write.bucketBy(n_buckets, *SEEN_KEY_COLS)
        .sortBy(*SEEN_KEY_COLS)
        .option("path", location)
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )
    return spark.table(table)


def append_bucketed_seen(
    delta: DataFrame, table: str, n_buckets: int = 32
) -> DataFrame:
    """MINOR compaction: merge a (small) delta of new seen keys into the
    existing bucketed table IN PLACE — the Iceberg bucket-transform append.
    Cost is ∝ delta size; the 10^10-row base files are untouched (the
    round-4 stand-in rewrote the ENTIRE table every compaction — VERDICT
    r4 "What's wrong" #1).

    The delta is pre-partitioned on the seen key into n_buckets partitions:
    repartition and bucketBy share Spark's Murmur3 HashPartitioning, so
    each write task holds exactly one bucket's rows and emits exactly one
    file into that bucket.  Repeated appends leave multiple files per
    bucket — the scan stays hash-partitioned (anti-join still needs NO
    Exchange on the seen side; plan-asserted) but Spark only claims
    sortedness for one-file buckets, so the SMJ re-sorts each bucket
    locally.  Periodic MAJOR compaction (write_bucketed_seen) restores one
    sorted file per bucket, exactly Iceberg's minor/major rewrite split."""
    spark = delta.sparkSession
    (
        delta.select(*SEEN_KEY_COLS)
        .repartition(n_buckets, *SEEN_KEY_COLS)
        .write.bucketBy(n_buckets, *SEEN_KEY_COLS)
        .sortBy(*SEEN_KEY_COLS)
        .format("parquet")
        .mode("append")
        .saveAsTable(table)
    )
    spark.catalog.refreshTable(table)
    return spark.table(table)


_BUCKET_FILE_RE = None  # compiled lazily (keep the module import light)


def bucket_files(location: str) -> dict[int, list[str]]:
    """bucket id → data files under a bucketed table's location, parsed
    from Spark's bucketed file naming (``part-<task>-<uuid>_<bucketId>.c000
    .snappy.parquet`` — the ``_NNNNN`` immediately before ``.c<n>`` is the
    bucket id).  Metadata files (_SUCCESS, .crc) never match."""
    import os
    import re

    global _BUCKET_FILE_RE
    if _BUCKET_FILE_RE is None:
        _BUCKET_FILE_RE = re.compile(r"_(\d{5})\.c\d+.*\.parquet$")
    out: dict[int, list[str]] = {}
    for fname in sorted(os.listdir(location)):
        m = _BUCKET_FILE_RE.search(fname)
        if m:
            out.setdefault(int(m.group(1)), []).append(
                os.path.join(location, fname)
            )
    return out


def compact_dirty_buckets(
    spark, table: str, location: str, n_buckets: int, max_files: int = 4
):
    """Per-bucket MAJOR compaction — Iceberg's binpack rewrite.  A bucket
    is dirty when it holds more than ``max_files`` data files (every minor
    append adds one small file per touched bucket — the table buckets on
    the FULL seen key, so delta rows spread near-uniformly and file counts
    grow in lock-step).  For each dirty bucket the SMALL files are merged
    into one, and the bucket's dominant base file is NOT even read — unless
    the small files together outgrew it, in which case the whole bucket
    rewrites to one sorted file (the amortisation rule: rewrite bytes are
    always ≤ 2× delta bytes).  At 10^10 seen rows the old whole-table major
    re-sorted the biggest table in the system every time; this reads and
    writes ∝ accumulated-delta bytes.

    Mechanics: read exactly the selected files, append them back through
    the bucketed writer (repartition and bucketBy share Spark's Murmur3
    hash partitioning, so every row re-lands in its own bucket and each
    write task emits one file), then delete the superseded files and
    refresh.  Returns (refreshed table relation, dirty bucket ids).  Crash
    mid-rewrite is recoverable: the bucketed table is derived state,
    rebuilt from the url_seen snapshot on resume."""
    import os

    files = bucket_files(location)
    dirty = sorted(b for b, fs in files.items() if len(fs) > max_files)
    if not dirty:
        return spark.table(table), []
    old_files: list[str] = []
    for b in dirty:
        by_size = sorted(files[b], key=os.path.getsize)
        largest, small = by_size[-1], by_size[:-1]
        if sum(os.path.getsize(f) for f in small) >= os.path.getsize(largest):
            old_files.extend(by_size)  # deltas outgrew the base: full rewrite
        else:
            old_files.extend(small)    # binpack the small files only
    (
        spark.read.parquet(*old_files)
        .select(*SEEN_KEY_COLS)
        .repartition(n_buckets, *SEEN_KEY_COLS)
        .write.bucketBy(n_buckets, *SEEN_KEY_COLS)
        .sortBy(*SEEN_KEY_COLS)
        .format("parquet")
        .mode("append")
        .saveAsTable(table)
    )
    for f in old_files:
        os.remove(f)
        crc = os.path.join(os.path.dirname(f), "." + os.path.basename(f) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
    spark.catalog.refreshTable(table)
    return spark.table(table), dirty


def anti_join_seen_parts(candidates: DataFrame, parts: list[DataFrame]) -> DataFrame:
    """candidates MINUS every seen relation, as chained left-anti joins —
    set-equivalent to one anti-join against the union, but each part keeps
    its own physical strategy: a bucketed base joins with no Exchange on
    the big side, small delta legs broadcast."""
    out = candidates
    for part in parts:
        out = out.join(part, SEEN_KEY_COLS, "left_anti")
    return out


def probe_hashes(df: DataFrame, n_buckets: int = 32) -> DataFrame:
    """(bucket, _h1, _h2) for rows carrying (scheme, host, path_sanitised) —
    the shared JVM-side hash projection of build + probe + increment."""
    key = _seen_key(F.col("scheme"), F.col("host"), F.col("path_sanitised"))
    return df.select(
        F.pmod(F.xxhash64("host"), F.lit(n_buckets)).cast("int").alias("bucket"),
        *_probe_hash_cols(key),
    )


_STARTER_BYTES = 2048  # 16 Kbit starter bucket, ~1.3k keys capacity


def _set_bits(arr: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> None:
    """Vectorized double-hash bit set into a uint8 bitset (in place) —
    the shared kernel of build_blooms and the incremental paths."""
    m_bits = np.uint64(len(arr) * 8)
    h2 = h2 | np.uint64(1)  # odd → full-period probe
    for i in range(N_HASHES):
        pos = (h1 + np.uint64(i) * h2) % m_bits
        np.bitwise_or.at(arr, (pos // 8).astype(np.int64),
                         (1 << (pos % 8)).astype(np.uint8))


def delta_blooms(
    new_seen: DataFrame, sizes: dict[int, int], n_buckets: int = 32
) -> DataFrame:
    """Distributed incremental increment: per-bucket applyInPandas builds a
    DELTA bitset (only this round's new keys, sized to match the existing
    bucket so the driver can OR it in) — the driver collects ≤n_buckets
    (bucket, bits, n_keys) rows instead of one row per new URL.  ``sizes``
    maps bucket → existing bitset length in BYTES (absent buckets get the
    starter size); it is tiny (n_buckets ints) and ships in the closure."""
    sizes = dict(sizes)  # pin a copy into the closure

    def make_delta(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        n_bytes = sizes.get(bucket, _STARTER_BYTES)
        bits = np.zeros(n_bytes, dtype=np.uint8)
        _set_bits(bits, _as_u64(pdf["_h1"]), _as_u64(pdf["_h2"]))
        return pd.DataFrame(
            {"bucket": [bucket], "bits": [_wrap_blob(_TAG_BLOOM, bits.tobytes())],
             "n_keys": [len(pdf)]}
        )

    return (
        probe_hashes(new_seen, n_buckets)
        .groupBy("bucket")
        .applyInPandas(make_delta, schema=BLOOM_SCHEMA)
    )


class BloomState:
    """Driver-held incremental partitioned Bloom over the url_seen table.

    DERIVED state: admission never trusts it alone (the exact anti-join is
    authoritative), so it is rebuilt from url_seen on resume rather than
    checkpointed.  Per round the driver ORs in only this round's NEW seen
    keys — no per-round rescan of the whole seen set.  Two increment modes:

    - ``vectorized`` (default): collect the round's (bucket, h1, h2) probe
      hashes as Arrow → numpy and set bits with the same vectorized kernel
      as build_blooms.  Right up to ~10^6 new keys/round (~24 MB of int64s
      collected, microseconds of bit math).
    - ``distributed``: per-bucket applyInPandas builds delta bitsets
      executor-side (``delta_blooms``) and the driver collects only
      ≤n_buckets bitsets to OR in — collect volume is O(bloom size), not
      O(new keys); the scale path for very wide rounds.

    When a bucket's key count outgrows its sizing the whole set is rebuilt
    distributed (build_blooms) at the next maintenance call.

    The executor copy is managed by :meth:`broadcast_map`: one broadcast is
    reused across rounds and replaced (old one unpersisted) only when the
    bits changed — a fresh broadcast per round would accumulate full bloom
    copies on the driver and executors for the life of the crawl.
    """

    def __init__(self, n_buckets: int = 32):
        self.n_buckets = n_buckets
        self.bits: dict[int, bytearray] = {}
        self.n_keys: dict[int, int] = {}
        self._bc = None  # current executor broadcast of as_map()
        self._dirty = True

    @classmethod
    def from_url_seen(cls, url_seen: DataFrame, n_buckets: int = 32) -> "BloomState":
        state = cls(n_buckets)
        for r in build_blooms(url_seen, n_buckets).collect():
            blob = bytes(r["bits"])
            _check_blob(blob, _TAG_BLOOM)
            state.bits[int(r["bucket"])] = bytearray(blob[_BLOB_HEADER:])
            state.n_keys[int(r["bucket"])] = int(r["n_keys"])
        return state

    @classmethod
    def from_snapshot(
        cls, rows: list, n_buckets: int = 32
    ) -> "BloomState":
        """Restore from checkpointed (bucket, bits, n_keys) rows — O(filter
        size), NO url_seen scan (the resume fast path; the blob header is
        asserted so a stale/mismatched snapshot fails into the rebuild)."""
        state = cls(n_buckets)
        for r in rows:
            blob = bytes(r["bits"])
            _check_blob(blob, _TAG_BLOOM)
            state.bits[int(r["bucket"])] = bytearray(blob[_BLOB_HEADER:])
            state.n_keys[int(r["bucket"])] = int(r["n_keys"])
        return state

    def snapshot_rows(self) -> list[tuple[int, bytes, int]]:
        """(bucket, blob, n_keys) rows for the checkpoint prefilter table."""
        return [
            (b, _wrap_blob(_TAG_BLOOM, bytes(arr)), int(self.n_keys.get(b, 0)))
            for b, arr in sorted(self.bits.items())
        ]

    def _bucket_arr(self, b: int) -> bytearray:
        arr = self.bits.get(b)
        if arr is None:
            arr = bytearray(_STARTER_BYTES)
            self.bits[b] = arr
            self.n_keys[b] = 0
        return arr

    def add_new_seen(self, new_seen: DataFrame, mode: str = "vectorized") -> None:
        """OR this round's new (scheme, host, path_sanitised) keys into the
        bloom.  A bucket not yet present is created at a default sizing."""
        if mode not in ("vectorized", "distributed"):
            raise ValueError(f"unknown add_new_seen mode {mode!r}")
        if mode == "distributed":
            sizes = {b: len(arr) for b, arr in self.bits.items()}
            rows = delta_blooms(new_seen, sizes, self.n_buckets).collect()
            for r in rows:
                b = int(r["bucket"])
                arr = self._bucket_arr(b)
                blob = bytes(r["bits"])
                _check_blob(blob, _TAG_BLOOM)
                delta = np.frombuffer(blob, dtype=np.uint8, offset=_BLOB_HEADER)
                view = np.frombuffer(arr, dtype=np.uint8)
                np.bitwise_or(view, delta, out=view)
                self.n_keys[b] += int(r["n_keys"])
        else:
            pdf = probe_hashes(new_seen, self.n_buckets).toPandas()
            if len(pdf):
                for b, grp in pdf.groupby("bucket"):
                    b = int(b)
                    arr = self._bucket_arr(b)
                    view = np.frombuffer(arr, dtype=np.uint8)
                    _set_bits(view, _as_u64(grp["_h1"]), _as_u64(grp["_h2"]))
                    self.n_keys[b] += len(grp)
        self._dirty = True

    def over_capacity(self) -> bool:
        """True when any bucket holds more keys than its bitset was sized
        for — FP rate degrades past the ~0.3% design point; rebuild."""
        return any(
            self.n_keys[b] * BITS_PER_KEY > len(arr) * 8
            for b, arr in self.bits.items()
        )

    def as_map(self) -> dict[int, bytes]:
        return {b: _wrap_blob(_TAG_BLOOM, bytes(arr)) for b, arr in self.bits.items()}

    def broadcast_map(self, sc):
        """The executor broadcast of as_map(), re-broadcast only when the
        bits changed since the last call.  The previous broadcast is
        unpersisted (its dependent round output is pinned by then — the
        driver localCheckpoints round state before the next admission), so
        long crawls hold exactly one live bloom copy per executor."""
        if self._bc is not None and not self._dirty:
            return self._bc
        old = self._bc
        self._bc = sc.broadcast(self.as_map())
        self._dirty = False
        if old is not None:
            old.unpersist(blocking=False)
        return self._bc


# -- cuckoo filter variant ---------------------------------------------------
#
# The north rule names a "partitioned Bloom/cuckoo URL-seen filter"; this is
# the cuckoo half.  Same integration contract as BloomState (per-host-hash
# buckets, executor broadcast map, vectorized pandas-UDF probe, exact
# anti-join stays authoritative), different trade: ~20 bits/key at load 0.8
# vs the Bloom's 12, but ~25x lower false-positive rate (2 rows x 4 slots x
# 16-bit fingerprints ~ 1.2e-4 vs ~3e-3) and SUPPORT FOR DELETES — a key
# retired from the url_seen table (dead-host GC) can be retired from the
# prefilter too, which a Bloom can never do.
#
# Zero-false-negative guarantee (the property admission correctness rides
# on: a "definitely new" verdict skips the exact join): an insert that still
# fails after the kick budget goes to a per-bucket OVERFLOW side-list that
# the probe also checks — never dropped — and over_capacity() then reports
# the bucket for a distributed rebuild at the next maintenance point,
# exactly like the Bloom's growth path.
#
# Delete safety: duplicates are STORED, never coalesced — so removing one
# matching (row, fingerprint) entry for a key that was actually inserted
# can never erase another key's entry (the standard cuckoo-filter deletion
# argument).  Deleting a key that was never inserted is forbidden (it could
# evict a real entry and create a false negative); remove_seen is therefore
# documented for keys leaving the url_seen table itself.

_CK_SLOTS = 4          # fingerprints per row (bucketized cuckoo)
_CK_LOAD = 0.8         # target load factor at build time
_CK_MAX_KICKS = 250
_CK_STARTER_ROWS = 512  # 512 rows x 4 slots ~ 1.6k keys at load 0.8
_CK_SPREAD = np.uint64(0x9E3779B97F4A7C15)


def _ck_fp(h1: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the first probe hash (0 = empty)."""
    return (h1 % np.uint64(0xFFFF)).astype(np.uint16) + np.uint16(1)


def _ck_alt_xor(fp: np.ndarray, mask: np.uint64) -> np.ndarray:
    """The XOR term linking a fingerprint's two candidate rows:
    i2 = i1 ^ spread(fp).  Works for scalars and arrays; the uint64
    multiply wraps mod 2^64 BY DESIGN (it's a multiplicative hash) —
    errstate silences numpy's scalar-overflow warning for the same
    arithmetic the array path does silently."""
    with np.errstate(over="ignore"):
        return ((fp.astype(np.uint64) if hasattr(fp, "astype") else np.uint64(fp))
                * _CK_SPREAD >> np.uint64(32)) & mask


def _ck_rows(h2: np.ndarray, fp: np.ndarray, mask: np.uint64):
    i1 = (h2 & mask).astype(np.int64)
    i2 = (i1.view(np.uint64) ^ _ck_alt_xor(fp, mask)).astype(np.int64)
    return i1, i2


class _CuckooTable:
    """One bucket's table: (n_rows x 4) uint16 fingerprints (0 = empty,
    rows kept left-compact) plus the overflow side-list of packed
    (row << 16 | fp) entries."""

    def __init__(self, n_rows: int = _CK_STARTER_ROWS):
        assert n_rows & (n_rows - 1) == 0, "n_rows must be a power of two"
        self.table = np.zeros((n_rows, _CK_SLOTS), dtype=np.uint16)
        self.overflow: list[int] = []
        self.n_keys = 0

    @property
    def mask(self) -> np.uint64:
        return np.uint64(self.table.shape[0] - 1)

    # -- insert ---------------------------------------------------------------
    def _bulk_place(self, rows: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Place each (row, fp) in the first free slot of its row,
        vectorized; returns the placed mask.  Rows are left-compact, so
        occupancy is a count and batch-internal collisions resolve by
        rank within the sorted group."""
        order = np.argsort(rows, kind="stable")
        r_s, f_s = rows[order], fps[order]
        occ = (self.table[r_s] != 0).sum(axis=1)
        group_start = np.r_[0, np.nonzero(np.diff(r_s))[0] + 1]
        group_id = np.cumsum(np.r_[0, (np.diff(r_s) != 0).astype(np.int64)])
        rank = np.arange(len(r_s)) - group_start[group_id]
        slot = occ + rank
        ok = slot < _CK_SLOTS
        self.table[r_s[ok], slot[ok]] = f_s[ok]
        placed = np.zeros(len(rows), dtype=bool)
        placed[order] = ok
        return placed

    def _kick_insert(self, row: int, fp: int) -> None:
        """Sequential cuckoo insert with deterministic eviction (slot
        k % 4 at kick k — no RNG anywhere in the engine).  If the kick
        budget runs out, the entry left homeless at that point — some
        DISPLACED VICTIM, not necessarily the original key — goes to the
        overflow list against one of its two legal rows (``row`` is the
        alternate it was about to be placed in), so no entry is ever
        lost: the zero-false-negative contract."""
        mask = self.mask
        for k in range(_CK_MAX_KICKS):
            slots = self.table[row]
            free = np.nonzero(slots == 0)[0]
            if free.size:
                self.table[row, free[0]] = fp
                return
            victim = int(slots[k % _CK_SLOTS])
            self.table[row, k % _CK_SLOTS] = fp
            fp = victim
            row = int(np.uint64(row) ^ _ck_alt_xor(np.uint16(fp), mask))
        self.overflow.append((row << 16) | fp)

    def insert_bulk(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Insert a batch of keys.  The batch is canonicalised to (h1, h2)
        order first: cuckoo placement depends on insertion order, so sorting
        makes the resulting table a pure function of the key SET — the
        property the vectorized≡distributed bit-identity contract rides on
        (both modes insert the same per-bucket delta as one batch, in
        whatever row order the shuffle happened to deliver)."""
        if not len(h1):
            return
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        fp = _ck_fp(h1)
        i1, i2 = _ck_rows(h2, fp, self.mask)
        placed = self._bulk_place(i1, fp)
        if not placed.all():
            rest = ~placed
            placed2 = self._bulk_place(i2[rest], fp[rest])
            for r0, f0 in zip(i1[rest][~placed2], fp[rest][~placed2]):
                self._kick_insert(int(r0), int(f0))
        self.n_keys += len(fp)

    # -- delete ---------------------------------------------------------------
    def delete_bulk(self, h1: np.ndarray, h2: np.ndarray) -> int:
        """Remove ONE stored entry per key (keys must have been inserted —
        see module note).  Rows are re-compacted so occupancy counting
        stays valid.  Returns how many entries were removed.  The batch is
        canonicalised to (h1, h2) order like insert_bulk, so the resulting
        table is a pure function of the key set — the property the
        vectorized≡distributed delete bit-identity rides on."""
        if not len(h1):
            return 0
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        fp = _ck_fp(h1)
        i1, i2 = _ck_rows(h2, fp, self.mask)
        removed = 0
        for a, b, f in zip(i1, i2, fp):
            done = False
            for row in (int(a), int(b)):
                hits = np.nonzero(self.table[row] == f)[0]
                if hits.size:
                    slots = self.table[row]
                    slots[hits[0]] = 0
                    nz = slots[slots != 0]
                    slots[:] = 0
                    slots[: nz.size] = nz
                    removed += 1
                    done = True
                    break
            if not done:
                # an overflow entry may be recorded against either of the
                # key's two rows (kick chains land on the alternate)
                for packed in ((int(a) << 16) | int(f), (int(b) << 16) | int(f)):
                    if packed in self.overflow:
                        self.overflow.remove(packed)
                        removed += 1
                        break
        self.n_keys = max(0, self.n_keys - removed)
        return removed

    # -- membership / serialization --------------------------------------------
    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        return _ck_probe_blob(self.to_bytes(), h1, h2)

    def over_capacity(self) -> bool:
        cap = self.table.shape[0] * _CK_SLOTS
        return bool(self.overflow) or self.n_keys > 0.85 * cap

    def to_bytes(self) -> bytes:
        ov = np.array(sorted(self.overflow), dtype=np.uint64)
        head = np.array(
            [self.table.shape[0], len(ov), self.n_keys], dtype=np.uint64
        )
        return _wrap_blob(
            _TAG_CUCKOO, head.tobytes() + self.table.tobytes() + ov.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "_CuckooTable":
        _check_blob(blob, _TAG_CUCKOO)
        n_rows, n_ov, n_keys = np.frombuffer(
            blob, dtype=np.uint64, count=3, offset=_BLOB_HEADER
        )
        t = cls.__new__(cls)
        t.table = (
            np.frombuffer(blob, dtype=np.uint16,
                          count=int(n_rows) * _CK_SLOTS, offset=_BLOB_HEADER + 24)
            .reshape(int(n_rows), _CK_SLOTS).copy()
        )
        t.overflow = [
            int(x) for x in np.frombuffer(
                blob, dtype=np.uint64, count=int(n_ov),
                offset=_BLOB_HEADER + 24 + int(n_rows) * _CK_SLOTS * 2,
            )
        ]
        t.n_keys = int(n_keys)
        return t


def _ck_probe_blob(blob: bytes, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized membership over a serialized bucket table."""
    _check_blob(blob, _TAG_CUCKOO)
    n_rows, n_ov, _ = np.frombuffer(
        blob, dtype=np.uint64, count=3, offset=_BLOB_HEADER
    )
    table = np.frombuffer(
        blob, dtype=np.uint16, count=int(n_rows) * _CK_SLOTS,
        offset=_BLOB_HEADER + 24,
    ).reshape(int(n_rows), _CK_SLOTS)
    mask = np.uint64(int(n_rows) - 1)
    fp = _ck_fp(h1)
    i1, i2 = _ck_rows(h2, fp, mask)
    hit = (table[i1] == fp[:, None]).any(axis=1)
    hit |= (table[i2] == fp[:, None]).any(axis=1)
    if int(n_ov):
        ov = np.frombuffer(
            blob, dtype=np.uint64, count=int(n_ov),
            offset=_BLOB_HEADER + 24 + int(n_rows) * _CK_SLOTS * 2,
        )
        packed1 = (i1.view(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
        packed2 = (i2.view(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
        hit |= np.isin(packed1, ov) | np.isin(packed2, ov)
    return hit


def _ck_rows_for(n_keys: int) -> int:
    need = max(_CK_STARTER_ROWS, int(n_keys / (_CK_SLOTS * _CK_LOAD)) + 1)
    return 1 << int(np.ceil(np.log2(need)))


def build_cuckoos(url_seen: DataFrame, n_buckets: int = 32) -> DataFrame:
    """url_seen → one serialized cuckoo table per host-hash bucket (the
    distributed build, mirror of build_blooms)."""
    keyed = probe_hashes(url_seen, n_buckets)

    def make_cuckoo(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        t = _CuckooTable(_ck_rows_for(len(pdf)))
        t.insert_bulk(_as_u64(pdf["_h1"]), _as_u64(pdf["_h2"]))
        return pd.DataFrame(
            {"bucket": [bucket], "bits": [t.to_bytes()], "n_keys": [len(pdf)]}
        )

    return keyed.groupBy("bucket").applyInPandas(make_cuckoo, schema=BLOOM_SCHEMA)


def delta_cuckoos(new_seen: DataFrame, blob_map_bc, n_buckets: int = 32) -> DataFrame:
    """Distributed per-bucket cuckoo increment (the cuckoo mirror of
    delta_blooms).  Cuckoo tables cannot be OR-merged — inserts may kick
    entries — but the buckets are INDEPENDENT by construction (per-host-hash),
    so the increment distributes per bucket instead: group this round's delta
    keys by bucket, replay insert_bulk into that bucket's current blob
    executor-side, and return the new blob.  The driver collects ≤n_buckets
    serialized tables (O(filter size), like the Bloom's delta path) instead
    of O(delta) key hashes, and the 32 serial kick chains run in parallel.

    ``blob_map_bc`` is the state's existing executor broadcast of as_map()
    (the same copy the probe UDF reads — no extra executor memory); a bucket
    with no blob yet starts at the default sizing.  insert_bulk canonicalises
    key order, so the result is bit-identical to the driver-side vectorized
    mode for the same (base, delta) — tested three ways."""

    def insert_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        blob = blob_map_bc.value.get(bucket)
        t = _CuckooTable.from_bytes(blob) if blob is not None else _CuckooTable()
        t.insert_bulk(_as_u64(pdf["_h1"]), _as_u64(pdf["_h2"]))
        return pd.DataFrame(
            {"bucket": [bucket], "bits": [t.to_bytes()], "n_keys": [len(pdf)]}
        )

    return (
        probe_hashes(new_seen, n_buckets)
        .groupBy("bucket")
        .applyInPandas(insert_bucket, schema=BLOOM_SCHEMA)
    )


def delta_cuckoo_deletes(
    gone: DataFrame, blob_map_bc, n_buckets: int = 32
) -> DataFrame:
    """Distributed per-bucket cuckoo DELETE (mirror of delta_cuckoos):
    group the retired keys by bucket, replay delete_bulk into that
    bucket's current blob executor-side, return the new blob with the
    removed count in n_keys.  Same O(filter size) driver collect as the
    distributed increment."""

    def delete_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        blob = blob_map_bc.value.get(bucket)
        if blob is None:
            return pd.DataFrame({"bucket": [bucket], "bits": [None],
                                 "n_keys": [0]})
        t = _CuckooTable.from_bytes(blob)
        removed = t.delete_bulk(_as_u64(pdf["_h1"]), _as_u64(pdf["_h2"]))
        return pd.DataFrame(
            {"bucket": [bucket], "bits": [t.to_bytes()], "n_keys": [removed]}
        )

    return (
        probe_hashes(gone, n_buckets)
        .groupBy("bucket")
        .applyInPandas(delete_bucket, schema=BLOOM_SCHEMA)
    )


def _cuckoo_might_contain_udf(cuckoo_map_bc):
    """Probe UDF over a sc.broadcast({bucket: blob}); same shape and the
    same broadcast-variable-not-join-column rule as _might_contain_udf."""

    @F.pandas_udf(T.BooleanType())
    def might_contain(
        buckets: pd.Series, h1s: pd.Series, h2s: pd.Series
    ) -> pd.Series:
        n = len(h1s)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return pd.Series(out)
        cuckoo_map = cuckoo_map_bc.value
        h1 = _as_u64(h1s)
        h2 = _as_u64(h2s)
        bvals = buckets.to_numpy()
        for b in np.unique(bvals):
            blob = cuckoo_map.get(int(b))
            if blob is None:
                continue
            ix = np.nonzero(bvals == b)[0]
            out[ix] = _ck_probe_blob(blob, h1[ix], h2[ix])
        return pd.Series(out)

    return might_contain


class CuckooState:
    """Driver-held incremental partitioned cuckoo filter over url_seen —
    the deletable alternative to BloomState (same derived-state rules:
    checkpoint-restorable via snapshot_rows/from_snapshot, rebuilt from the
    table on mismatch, never authoritative on its own).

    Two increment modes, mirroring BloomState:

    - ``vectorized`` (default): collect the round's (bucket, h1, h2) probe
      hashes and bulk-insert per bucket driver-side.  Right for typical
      round widths (30k keys ≈ 80 ms of kick chains).
    - ``distributed``: per-bucket applyInPandas replays insert_bulk into
      each bucket's current blob EXECUTOR-side (``delta_cuckoos``) and the
      driver collects only ≤n_buckets new blobs — collect volume is
      O(filter size), not O(new keys), and the serial kick chains run in
      parallel; the scale path for very wide rounds.  Cuckoo tables cannot
      OR-merge (inserts kick), which is why the delta distributes per
      BUCKET rather than per bitset; insert_bulk's canonical key ordering
      makes both modes bit-identical for the same delta.

    remove_seen is the capability the Bloom lacks: keys GC'd from the
    url_seen table leave the prefilter too instead of inflating its
    false-positive rate forever."""

    def __init__(self, n_buckets: int = 32):
        self.n_buckets = n_buckets
        self.tables: dict[int, _CuckooTable] = {}
        self._bc = None
        self._dirty = True

    @classmethod
    def from_url_seen(cls, url_seen: DataFrame, n_buckets: int = 32) -> "CuckooState":
        state = cls(n_buckets)
        for r in build_cuckoos(url_seen, n_buckets).collect():
            state.tables[int(r["bucket"])] = _CuckooTable.from_bytes(bytes(r["bits"]))
        return state

    @classmethod
    def from_snapshot(cls, rows: list, n_buckets: int = 32) -> "CuckooState":
        """Restore from checkpointed (bucket, bits, n_keys) rows — O(filter
        size), no url_seen scan (resume fast path)."""
        state = cls(n_buckets)
        for r in rows:
            state.tables[int(r["bucket"])] = _CuckooTable.from_bytes(bytes(r["bits"]))
        return state

    def snapshot_rows(self) -> list[tuple[int, bytes, int]]:
        """(bucket, blob, n_keys) rows for the checkpoint prefilter table."""
        return [
            (b, t.to_bytes(), int(t.n_keys)) for b, t in sorted(self.tables.items())
        ]

    def _bucket(self, b: int) -> _CuckooTable:
        t = self.tables.get(b)
        if t is None:
            t = _CuckooTable()
            self.tables[b] = t
        return t

    def add_new_seen(self, new_seen: DataFrame, mode: str = "vectorized") -> None:
        if mode not in ("vectorized", "distributed"):
            raise ValueError(f"unknown add_new_seen mode {mode!r}")
        if mode == "distributed":
            sc = new_seen.sparkSession.sparkContext
            # reuse the probe broadcast: it already holds the pre-increment
            # blobs on every executor (broadcast_map re-broadcasts only when
            # dirty, so this is normally a no-op handle fetch)
            bc = self.broadcast_map(sc)
            rows = delta_cuckoos(new_seen, bc, self.n_buckets).collect()
            for r in rows:
                self.tables[int(r["bucket"])] = _CuckooTable.from_bytes(
                    bytes(r["bits"])
                )
            if rows:
                self._dirty = True
            return
        pdf = probe_hashes(new_seen, self.n_buckets).toPandas()
        if len(pdf):
            for b, grp in pdf.groupby("bucket"):
                self._bucket(int(b)).insert_bulk(
                    _as_u64(grp["_h1"]), _as_u64(grp["_h2"])
                )
            self._dirty = True

    def remove_seen(self, gone: DataFrame, mode: str = "vectorized") -> int:
        """Delete keys that are being removed from the url_seen table
        itself (module note on delete safety).  Returns entries removed.
        ``distributed`` replays the delete per independent bucket
        executor-side (delta_cuckoo_deletes) — the same O(filter size)
        collect as the distributed increment; bit-identical to the
        driver-side mode (canonical delete order)."""
        if mode not in ("vectorized", "distributed"):
            raise ValueError(f"unknown remove_seen mode {mode!r}")
        if mode == "distributed":
            sc = gone.sparkSession.sparkContext
            bc = self.broadcast_map(sc)
            removed = 0
            for r in delta_cuckoo_deletes(gone, bc, self.n_buckets).collect():
                if r["bits"] is None:
                    continue  # keys of a bucket this filter never held
                self.tables[int(r["bucket"])] = _CuckooTable.from_bytes(
                    bytes(r["bits"])
                )
                removed += int(r["n_keys"])
            if removed:
                self._dirty = True
            return removed
        pdf = probe_hashes(gone, self.n_buckets).toPandas()
        removed = 0
        for b, grp in pdf.groupby("bucket"):
            t = self.tables.get(int(b))
            if t is not None:
                removed += t.delete_bulk(_as_u64(grp["_h1"]), _as_u64(grp["_h2"]))
        if removed:
            self._dirty = True
        return removed

    def over_capacity(self) -> bool:
        return any(t.over_capacity() for t in self.tables.values())

    def as_map(self) -> dict[int, bytes]:
        return {b: t.to_bytes() for b, t in self.tables.items()}

    def broadcast_map(self, sc):
        """One reused executor broadcast, replaced (old unpersisted) only
        when the tables changed — same lifecycle as BloomState."""
        if self._bc is not None and not self._dirty:
            return self._bc
        old = self._bc
        self._bc = sc.broadcast(self.as_map())
        self._dirty = False
        if old is not None:
            old.unpersist(blocking=False)
        return self._bc
