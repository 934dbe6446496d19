"""Bloom pre-filter correctness (must equal the plain anti-join) and
hot-host salting skew reduction."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def seen(spark):
    rows = [
        ("http", f"host{i % 20}.no", f"/seen{i}.html") for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "scheme string, host string, path_sanitised string"
    ).cache()


@pytest.fixture(scope="module")
def candidates(spark):
    # half overlap with seen, half new
    rows = [("http", f"host{i % 20}.no", f"/seen{i}.html") for i in range(0, 2000, 2)]
    rows += [("http", f"host{i % 20}.no", f"/new{i}.html") for i in range(1500)]
    return spark.createDataFrame(
        rows, "scheme string, host string, path_sanitised string"
    ).cache()


class TestBloomPrefilter:
    def test_equals_plain_antijoin(self, spark, seen, candidates):
        from macocu_crawler_spark.operators.urlseen import filter_new_candidates

        plain = candidates.join(
            seen, ["scheme", "host", "path_sanitised"], "left_anti"
        )
        bloomed = filter_new_candidates(candidates, seen)
        a = {tuple(r) for r in plain.collect()}
        b = {tuple(r) for r in bloomed.collect()}
        assert a == b
        assert len(b) == 1500  # exactly the new candidates

    def test_bloom_rejects_most_new_urls(self, spark, seen, candidates):
        """The pre-filter's value: definitely-new candidates skip the exact
        join.  With 12 bits/key + 4 hashes the FP rate is well under 5%."""
        from macocu_crawler_spark.operators.urlseen import (
            _might_contain_udf,
            _probe_hash_cols,
            _seen_key,
            build_blooms,
        )

        blooms = build_blooms(seen)
        bloom_map = {int(r["bucket"]): bytes(r["bits"])
                     for r in blooms.select("bucket", "bits").collect()}
        might = _might_contain_udf(spark.sparkContext.broadcast(bloom_map))
        new_only = candidates.filter(F.col("path_sanitised").startswith("/new"))
        key = _seen_key(F.col("scheme"), F.col("host"), F.col("path_sanitised"))
        h1c, h2c = _probe_hash_cols(key)
        flagged = new_only.withColumn(
            "_bucket", F.pmod(F.xxhash64("host"), F.lit(32)).cast("int")
        ).withColumn("_h1", h1c).withColumn("_h2", h2c).withColumn(
            "fp", might(F.col("_bucket"), F.col("_h1"), F.col("_h2"))
        )
        fp_rate = flagged.filter("fp").count() / flagged.count()
        assert fp_rate < 0.05, f"false-positive rate {fp_rate:.3f}"

    def test_empty_seen_set(self, spark, candidates):
        from macocu_crawler_spark.operators.urlseen import filter_new_candidates

        empty = spark.createDataFrame(
            [], "scheme string, host string, path_sanitised string"
        )
        assert filter_new_candidates(candidates, empty).count() == candidates.count()


class TestBucketedAppend:
    """Minor-compaction append (round 5): table-level equivalence props
    beyond the plan test in test_plans.py."""

    def _write_base(self, spark, tmp_path, rows, table):
        from macocu_crawler_spark.operators.urlseen import write_bucketed_seen

        base = spark.createDataFrame(
            rows, "scheme string, host string, path_sanitised string"
        )
        return write_bucketed_seen(base, str(tmp_path / table), table, 8)

    def test_randomized_appends_equal_union(self, spark, tmp_path):
        """After several random-sized appends the merged table must equal
        base ∪ deltas exactly — no row lost, none duplicated, regardless
        of how the deltas split across buckets."""
        import random

        from macocu_crawler_spark.operators.urlseen import append_bucketed_seen

        rng = random.Random(7)
        mk = lambda i: ("https" if i % 5 == 0 else "http",
                        f"h{i % 37}.no", f"/p{i}")
        expected = {mk(i) for i in range(500)}
        table = "url_seen_bkt_rand_test"
        try:
            merged = self._write_base(
                spark, tmp_path, sorted(expected), table
            )
            nxt = 500
            for _ in range(3):
                n = rng.randint(1, 400)
                delta_rows = [mk(i) for i in range(nxt, nxt + n)]
                nxt += n
                expected |= set(delta_rows)
                delta = spark.createDataFrame(
                    delta_rows, "scheme string, host string, path_sanitised string"
                )
                merged = append_bucketed_seen(delta, table, 8)
            assert {tuple(r) for r in merged.collect()} == expected
            assert merged.count() == len(expected)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_per_bucket_major_compaction(self, spark, tmp_path):
        """Round 6 (VERDICT r5 #3): the MAJOR compaction binpacks the
        small delta files of buckets whose file count exceeds max_files —
        each dirty bucket's dominant base file is kept in place (not even
        read) unless the deltas outgrew it, clean buckets are
        byte-untouched, the row set is exactly preserved, and the
        anti-join plan still scans bucketed with one candidates-side
        Exchange."""
        import os

        from macocu_crawler_spark.operators.urlseen import (
            anti_join_seen_parts,
            append_bucketed_seen,
            bucket_files,
            compact_dirty_buckets,
        )

        table = "url_seen_bkt_binpack_test"
        location = str(tmp_path / table)
        mk = lambda i: ("http", f"h{i % 37}.no", f"/p{i}")
        # base large enough that each bucket's base file dwarfs the sum of
        # its tiny delta files (parquet per-file overhead is ~2 KB, so a
        # too-small base legitimately triggers the deltas-outgrew-base
        # full-rewrite rule instead of the keep-largest path under test)
        expected = {mk(i) for i in range(20_000)}
        try:
            self._write_base(spark, tmp_path, sorted(expected), table)
            # five tiny deltas: full-key hashing spreads each over the
            # buckets, so file counts climb roughly in lock-step
            nxt = 20_000
            for k in range(5):
                delta_rows = [mk(i) for i in range(nxt, nxt + 6)]
                nxt += 6
                expected |= set(delta_rows)
                append_bucketed_seen(
                    spark.createDataFrame(
                        delta_rows,
                        "scheme string, host string, path_sanitised string",
                    ),
                    table, 8,
                )
            before = bucket_files(location)
            base_of = {b: max(fs, key=os.path.getsize)
                       for b, fs in before.items()}
            max_files = 3
            should_be_dirty = sorted(
                b for b, fs in before.items() if len(fs) > max_files
            )
            assert should_be_dirty, "fixture produced no dirty bucket"
            merged, dirty = compact_dirty_buckets(
                spark, table, location, 8, max_files=max_files
            )
            assert dirty == should_be_dirty
            after = bucket_files(location)
            for b in dirty:
                # small files merged to one; ≤2 files remain and the
                # 20k-row base file was kept in place, not rewritten
                # (tiny deltas can never outgrow it here)
                assert len(after[b]) <= 2, (b, after[b])
                assert len(after[b]) < len(before[b])
                assert base_of[b] in after[b], "base file was rewritten"
            for b in set(before) - set(dirty):  # clean: byte-untouched
                assert after[b] == before[b]
            assert {tuple(r) for r in merged.collect()} == expected
            # plan contract unchanged: seen side scans bucketed in place
            from tests.test_plans import plan_string

            original = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            try:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                cand = spark.createDataFrame(
                    [mk(i) for i in range(50_000, 50_100)],  # disjoint keys
                    "scheme string, host string, path_sanitised string",
                )
                out = anti_join_seen_parts(cand, [merged])
                ps = plan_string(out)
                assert "Bucketed: true" in ps, ps
                assert ps.count("Exchange") == 1, ps
                assert out.count() == 100
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", original
                )
            # idempotent: a second call finds nothing dirty
            _, dirty2 = compact_dirty_buckets(
                spark, table, location, 8, max_files=max_files
            )
            assert dirty2 == []
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_empty_delta_append_is_noop(self, spark, tmp_path):
        """A compaction round in which no new URLs were admitted must not
        corrupt or grow the table (the driver can hit this on stalled
        webs: legs exist but are empty)."""
        from macocu_crawler_spark.operators.urlseen import append_bucketed_seen

        table = "url_seen_bkt_empty_test"
        try:
            self._write_base(
                spark, tmp_path, [("http", "a.no", f"/p{i}") for i in range(50)],
                table,
            )
            empty = spark.createDataFrame(
                [], "scheme string, host string, path_sanitised string"
            )
            merged = append_bucketed_seen(empty, table, 8)
            assert merged.count() == 50
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")


class TestSalting:
    def test_hot_host_spread_across_partitions(self, spark):
        from macocu_crawler_spark.operators.partitioning import (
            partition_sizes,
            repartition_frontier,
        )

        rows = [("http", "hot.no", f"/p{i}.html", f"/p{i}.html", 0, i)
                for i in range(5000)]
        rows += [("http", f"cold{i}.no", "/", "/", 0, i) for i in range(100)]
        frontier = spark.createDataFrame(
            rows,
            "scheme string, host string, path string, path_sanitised string,"
            " batch_id long, seq long",
        )
        unsalted = frontier.repartition(8, F.col("host"))
        salted = repartition_frontier(frontier, n_partitions=8, threshold=500)
        max_unsalted = max(partition_sizes(unsalted))
        max_salted = max(partition_sizes(salted))
        assert max_unsalted >= 5000          # hot host on one partition
        assert max_salted < max_unsalted / 2  # spread by salting

    def test_cold_hosts_untouched(self, spark):
        from macocu_crawler_spark.operators.partitioning import (
            host_salt_factors,
            with_salted_key,
        )

        frontier = spark.createDataFrame(
            [("http", "cold.no", "/a", "/a", 0, 1)],
            "scheme string, host string, path string, path_sanitised string,"
            " batch_id long, seq long",
        )
        factors = host_salt_factors(frontier, threshold=100)
        out = with_salted_key(frontier, factors).collect()
        assert out[0].host_salt == "cold.no"


class TestBloomStateIncremental:
    def test_incremental_adds_never_false_negative(self, spark):
        """The safety property: every key added (at build OR incrementally)
        must probe True — a false negative would let a seen URL back in
        before the exact join catches it (it still would, but the Bloom's
        value claim dies)."""
        import pandas as pd

        from macocu_crawler_spark.operators.urlseen import (
            _BLOB_HEADER,
            BloomState,
            N_HASHES,
            probe_hashes,
        )

        base = spark.range(5000).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % 97).alias("host"),
            F.concat(F.lit("/a"), F.col("id")).alias("path_sanitised"),
        )
        inc = spark.range(3000).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % 97).alias("host"),
            F.concat(F.lit("/b"), F.col("id")).alias("path_sanitised"),
        )
        state = BloomState.from_url_seen(base)
        state.add_new_seen(inc)
        bloom_map = state.as_map()

        def probes_true(df) -> bool:
            rows = probe_hashes(df).collect()
            for r in rows:
                arr = bloom_map[int(r["bucket"])][_BLOB_HEADER:]  # skip tag
                m_bits = len(arr) * 8
                h1 = r["_h1"] & 0xFFFFFFFFFFFFFFFF
                h2 = (r["_h2"] & 0xFFFFFFFFFFFFFFFF) | 1
                for i in range(N_HASHES):
                    pos = (h1 + i * h2) % m_bits
                    if not (arr[pos >> 3] >> (pos & 7)) & 1:
                        return False
            return True

        assert probes_true(base)
        assert probes_true(inc)

    def test_vectorized_equals_loop_and_distributed(self, spark):
        """All three increment paths must produce the exact same bitsets:
        the vectorized default, the distributed delta-bitset path, and a
        straight per-row loop re-derivation of the double-hash contract."""
        from macocu_crawler_spark.operators.urlseen import (
            BloomState,
            N_HASHES,
            probe_hashes,
        )

        base = spark.range(2000).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % 53).alias("host"),
            F.concat(F.lit("/a"), F.col("id")).alias("path_sanitised"),
        )
        inc = spark.range(1500).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % 53).alias("host"),
            F.concat(F.lit("/b"), F.col("id")).alias("path_sanitised"),
        )
        vec = BloomState.from_url_seen(base)
        vec.add_new_seen(inc, mode="vectorized")
        dist = BloomState.from_url_seen(base)
        dist.add_new_seen(inc, mode="distributed")

        # loop reference: set bits per collected row, straight off the
        # documented double-hash contract
        loop = BloomState.from_url_seen(base)
        for r in probe_hashes(inc, loop.n_buckets).collect():
            b = int(r["bucket"])
            arr = loop._bucket_arr(b)
            m_bits = len(arr) * 8
            h1 = r["_h1"] & 0xFFFFFFFFFFFFFFFF
            h2 = (r["_h2"] & 0xFFFFFFFFFFFFFFFF) | 1
            for i in range(N_HASHES):
                pos = (h1 + i * h2) % m_bits
                arr[pos >> 3] |= 1 << (pos & 7)
            loop.n_keys[b] += 1

        assert vec.as_map() == loop.as_map()
        assert dist.as_map() == loop.as_map()
        assert vec.n_keys == loop.n_keys == dist.n_keys

    def test_broadcast_map_reuses_until_dirty(self, spark):
        from macocu_crawler_spark.operators.urlseen import BloomState

        base = spark.range(200).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % 7).alias("host"),
            F.concat(F.lit("/a"), F.col("id")).alias("path_sanitised"),
        )
        inc = base.withColumn(
            "path_sanitised", F.concat(F.lit("/b"), F.col("path_sanitised"))
        )
        state = BloomState.from_url_seen(base)
        sc = spark.sparkContext
        bc1 = state.broadcast_map(sc)
        assert state.broadcast_map(sc) is bc1  # unchanged → same broadcast
        state.add_new_seen(inc)
        bc2 = state.broadcast_map(sc)
        assert bc2 is not bc1                  # changed → fresh broadcast
        assert bc2.value == state.as_map()
        assert state.broadcast_map(sc) is bc2

    def test_over_capacity_flags_growth(self, spark):
        from macocu_crawler_spark.operators.urlseen import BloomState

        small = spark.range(100).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % 7).alias("host"),
            F.concat(F.lit("/a"), F.col("id")).alias("path_sanitised"),
        )
        state = BloomState.from_url_seen(small)
        assert not state.over_capacity()
        big = spark.range(40_000).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % 7).alias("host"),
            F.concat(F.lit("/z"), F.col("id")).alias("path_sanitised"),
        )
        state.add_new_seen(big)
        assert state.over_capacity()


class TestCuckooKernel:
    """Pure-numpy properties of the cuckoo filter (the north rule's
    'bloom/cuckoo URL-seen filter' — deletable alternative to the Bloom).
    The invariant admission correctness rides on: NO FALSE NEGATIVES, ever
    (a 'definitely new' verdict skips the exact join)."""

    @staticmethod
    def _keys(n, seed):
        import numpy as np

        r = np.random.default_rng(seed)
        return (
            r.integers(0, 2**63, size=n, dtype=np.int64).view(np.uint64),
            r.integers(0, 2**63, size=n, dtype=np.int64).view(np.uint64),
        )

    def test_no_false_negatives_and_low_fpp(self):
        from macocu_crawler_spark.operators.urlseen import (
            _CuckooTable,
            _ck_rows_for,
        )

        h1, h2 = self._keys(50_000, 1)
        t = _CuckooTable(_ck_rows_for(50_000))
        t.insert_bulk(h1, h2)
        assert t.contains(h1, h2).all()
        g1, g2 = self._keys(50_000, 2)
        assert t.contains(g1, g2).mean() < 1e-3  # ~25x under the Bloom's

    def test_delete_is_safe_for_remaining_keys(self):
        """Deleting inserted keys must NEVER make another inserted key a
        false negative (duplicates are stored, not coalesced)."""
        from macocu_crawler_spark.operators.urlseen import (
            _CuckooTable,
            _ck_rows_for,
        )

        h1, h2 = self._keys(30_000, 3)
        t = _CuckooTable(_ck_rows_for(30_000))
        t.insert_bulk(h1, h2)
        removed = t.delete_bulk(h1[:15_000], h2[:15_000])
        assert removed == 15_000
        assert t.contains(h1[15_000:], h2[15_000:]).all()
        # deleted keys drop to false-positive-level residuals
        assert t.contains(h1[:15_000], h2[:15_000]).mean() < 1e-2

    def test_overflow_path_keeps_zero_false_negatives(self):
        """Past capacity, failed kick chains go to the overflow side-list
        (including the final displaced VICTIM, not the original key) and
        over_capacity() flags the rebuild — membership never lies."""
        from macocu_crawler_spark.operators.urlseen import _CuckooTable

        h1, h2 = self._keys(4_000, 4)  # 2x the 512x4 capacity
        t = _CuckooTable(512)
        t.insert_bulk(h1, h2)
        assert t.contains(h1, h2).all()
        assert t.over_capacity() and len(t.overflow) > 0

    def test_deterministic_and_serializable(self):
        from macocu_crawler_spark.operators.urlseen import (
            _CuckooTable,
            _ck_rows_for,
        )

        h1, h2 = self._keys(10_000, 5)
        a, b = _CuckooTable(_ck_rows_for(10_000)), _CuckooTable(_ck_rows_for(10_000))
        a.insert_bulk(h1, h2)
        b.insert_bulk(h1, h2)
        assert a.to_bytes() == b.to_bytes()  # no RNG anywhere
        c = _CuckooTable.from_bytes(a.to_bytes())
        assert c.contains(h1, h2).all()


class TestCuckooPrefilter:
    def test_equals_plain_antijoin(self, spark, seen, candidates):
        from macocu_crawler_spark.operators.urlseen import filter_new_candidates

        plain = candidates.join(
            seen, ["scheme", "host", "path_sanitised"], "left_anti"
        )
        cuckooed = filter_new_candidates(candidates, seen, kind="cuckoo")
        a = {tuple(r) for r in plain.collect()}
        b = {tuple(r) for r in cuckooed.collect()}
        assert a == b
        assert len(b) == 1500

    def test_empty_seen_set(self, spark, candidates):
        from macocu_crawler_spark.operators.urlseen import filter_new_candidates

        empty = spark.createDataFrame(
            [], "scheme string, host string, path_sanitised string"
        )
        assert (
            filter_new_candidates(candidates, empty, kind="cuckoo").count()
            == candidates.count()
        )

    def test_incremental_state_matches_membership(self, spark, seen):
        """CuckooState built from a base + add_new_seen increments answers
        membership for every key exactly like a fresh full build (blobs may
        differ — insert order differs — but no key may be missed)."""
        from macocu_crawler_spark.operators.urlseen import (
            CuckooState,
            _cuckoo_might_contain_udf,
            probe_hashes,
        )

        base = seen.filter(F.col("path_sanitised") < "/seen5")
        delta = seen.exceptAll(base)
        inc = CuckooState.from_url_seen(base)
        inc.add_new_seen(delta)
        full = CuckooState.from_url_seen(seen)
        probes = probe_hashes(seen).toPandas()
        import numpy as np

        for state in (inc, full):
            m = state.as_map()
            from macocu_crawler_spark.operators.urlseen import _ck_probe_blob

            for b, grp in probes.groupby("bucket"):
                h1 = grp["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
                h2 = grp["_h2"].to_numpy(dtype=np.int64).view(np.uint64)
                assert _ck_probe_blob(m[int(b)], h1, h2).all()

    def test_distributed_increment_bit_identical_to_vectorized(self, spark, seen):
        """Cuckoo tables cannot OR-merge, so the distributed mode replays
        insert_bulk per independent bucket executor-side (delta_cuckoos).
        With canonical insert ordering the resulting blobs must be
        BIT-IDENTICAL to the driver-side vectorized mode for the same
        (base, delta) — the three-way contract TestBloomStateIncremental
        pins for the Bloom."""
        from macocu_crawler_spark.operators.urlseen import CuckooState

        base = seen.filter(F.col("path_sanitised") < "/seen5")
        delta = seen.exceptAll(base)
        vec = CuckooState.from_url_seen(base)
        vec.add_new_seen(delta, mode="vectorized")
        dist = CuckooState.from_url_seen(base)
        dist.add_new_seen(delta, mode="distributed")
        assert vec.as_map() == dist.as_map()
        # and membership still covers every key (vs a fresh full build)
        full = CuckooState.from_url_seen(seen)
        assert set(vec.as_map()) == set(full.as_map())
        with pytest.raises(ValueError, match="unknown"):
            vec.add_new_seen(delta, mode="bogus")

    def test_mismatched_blob_kind_fails_loudly(self, spark, seen):
        """ADVICE r5: probing a bloom-built map as cuckoo (or vice versa)
        must raise on the header tag, never reinterpret bitset bytes."""
        import numpy as np

        from macocu_crawler_spark.operators.urlseen import (
            BloomState,
            CuckooState,
            _ck_probe_blob,
            filter_new_candidates,
        )

        bloom_map = BloomState.from_url_seen(seen).as_map()
        some_blob = next(iter(bloom_map.values()))
        with pytest.raises(ValueError, match="tag"):
            _ck_probe_blob(some_blob, np.zeros(1, np.uint64), np.zeros(1, np.uint64))
        # end-to-end: a bloom map routed down the cuckoo probe path raises
        # at action time (Spark surfaces the UDF's ValueError text) instead
        # of producing garbage verdicts
        with pytest.raises(Exception, match="blob header mismatch"):
            filter_new_candidates(
                seen.limit(10), seen, bloom_map=bloom_map, kind="cuckoo"
            ).count()
        # and the cuckoo map down the bloom path likewise
        cuckoo_map = CuckooState.from_url_seen(seen).as_map()
        with pytest.raises(Exception, match="blob header mismatch"):
            filter_new_candidates(
                seen.limit(10), seen, bloom_map=cuckoo_map, kind="bloom"
            ).count()

    def test_remove_seen_deletes_from_prefilter(self, spark, seen):
        """The capability the Bloom lacks: keys GC'd from url_seen leave
        the prefilter (so a long crawl's dead-host purges do not inflate
        the FP rate forever), while every remaining key stays present."""
        from macocu_crawler_spark.operators.urlseen import (
            CuckooState,
            _ck_probe_blob,
            probe_hashes,
        )
        import numpy as np

        state = CuckooState.from_url_seen(seen)
        gone = seen.filter(F.col("path_sanitised") < "/seen3")
        kept = seen.exceptAll(gone)
        removed = state.remove_seen(gone)
        assert removed == gone.count()
        m = state.as_map()
        probes = probe_hashes(kept).toPandas()
        for b, grp in probes.groupby("bucket"):
            h1 = grp["_h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = grp["_h2"].to_numpy(dtype=np.int64).view(np.uint64)
            assert _ck_probe_blob(m[int(b)], h1, h2).all()
        # distributed delete (round 6): same removed count, BIT-IDENTICAL
        # final blobs (canonical delete order), executor-side replay
        dist = CuckooState.from_url_seen(seen)
        removed_d = dist.remove_seen(gone, mode="distributed")
        assert removed_d == removed
        assert dist.as_map() == m
        with pytest.raises(ValueError, match="unknown"):
            dist.remove_seen(gone, mode="bogus")
