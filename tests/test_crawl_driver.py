"""Crawl-ordering + URL-seen equivalence (SURVEY.md §5.3-5.5).

The Spark driver must reproduce the simulator's (reference-semantics) fetch
sequence, URL-seen set, dedup decisions and byte-identical documents; its
results must not depend on partitioning; and a resumed run must equal an
uninterrupted one.
"""

import tempfile

import pytest

from macocu_crawler_spark.crawl_driver import CrawlDriver
from macocu_crawler_spark.simulator import CrawlParams, CrawlSimulator

ROUNDS = 10


@pytest.fixture(scope="module")
def sim_result(fixture_web):
    return CrawlSimulator(fixture_web, CrawlParams(max_rounds=ROUNDS)).run()


@pytest.fixture(scope="module")
def driver_result(spark, fixture_dir):
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(),
        CrawlParams(max_rounds=ROUNDS), checkpoint_every=0,
    )
    drv.run()
    return drv


def _fetch_log(drv):
    return [
        (r["round"], r.fetch_seq, r.url)
        for r in drv.fetch_log.orderBy("round", "fetch_seq").collect()
    ]


def test_fetch_order_matches_simulator(sim_result, driver_result):
    sim_log = [(r, s + 1, u) for r, s, u in sim_result.fetch_log]
    assert _fetch_log(driver_result) == sim_log


def test_url_seen_matches_simulator(sim_result, driver_result):
    spark_seen = {
        (r.scheme, r.host, r.path_sanitised)
        for r in driver_result.url_seen.collect()
    }
    assert spark_seen == sim_result.url_seen


def test_duplicates_match_simulator(sim_result, driver_result):
    spark_dups = sorted(r.wpage_id for r in driver_result.duplicates.collect())
    assert spark_dups == sorted(sim_result.duplicate_ids)


def test_documents_byte_identical(sim_result, driver_result):
    sim_docs = {d["url"]: (d["text"], d["prevert"]) for d in sim_result.documents}
    spark_docs = {
        r.url: (r.text, r.prevert)
        for r in driver_result.documents.select("url", "text", "prevert").collect()
    }
    assert spark_docs == sim_docs


def test_domain_counters_match(sim_result, driver_result):
    sim_doms = {
        (k[0], k[1]): (d.count_downloaded, d.bytes_downloaded, d.count_cleaned,
                       d.bytes_cleaned, d.bad)
        for k, d in sim_result.domains.items()
    }
    spark_doms = {
        (r.scheme, r.host): (r.count_downloaded, r.bytes_downloaded,
                             r.count_cleaned, r.bytes_cleaned, r.bad)
        for r in driver_result.domains.collect()
    }
    assert spark_doms == sim_doms


def test_determinism_across_partitioning(spark, fixture_dir, sim_result):
    """North rule: identical results at different parallelism.  Shuffle
    partition count is the parallelism dial inside one JVM; local[8] vs
    local[32] is evidenced in bench.py the same way."""
    logs = []
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n in ("2", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            drv = CrawlDriver(
                spark, fixture_dir, tempfile.mkdtemp(),
                CrawlParams(max_rounds=6), checkpoint_every=0,
            )
            drv.run()
            logs.append(_fetch_log(drv))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert logs[0] == logs[1]
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert logs[0] == sim_prefix


def test_ignored_urls_match_simulator(sim_result, driver_result):
    """S7 ignored-URL sink: per-row reason strings identical (reasons from
    links of processed pages; redirect-reject reasons are logged by the sim
    only for redirect fetches, compared separately)."""
    sim_ignored = {
        (s, h, reason, url) for s, h, reason, url in sim_result.ignored if s
    }
    spark_ignored = {
        (r.src_scheme, r.src_host, r.reason, r.url)
        for r in driver_result.ignored.collect()
    }
    assert spark_ignored == sim_ignored
    assert len(spark_ignored) > 0


def test_bloom_prefilter_driver_equivalence(spark, fixture_dir, sim_result):
    """use_bloom_prefilter must not change any decision (Bloom is a
    pre-filter; the exact anti-join stays authoritative)."""
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(),
        CrawlParams(max_rounds=6, use_bloom_prefilter=True), checkpoint_every=0,
    )
    drv.run()
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert _fetch_log(drv) == sim_prefix


def test_cuckoo_prefilter_driver_equivalence(spark, fixture_dir, sim_result):
    """seen_prefilter='cuckoo' must not change any decision either (same
    prefilter contract as the Bloom: the exact anti-join stays
    authoritative; the cuckoo adds deletability, not semantics)."""
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(),
        CrawlParams(
            max_rounds=6, use_bloom_prefilter=True, seen_prefilter="cuckoo"
        ),
        checkpoint_every=0,
    )
    drv.run()
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert _fetch_log(drv) == sim_prefix


def test_bloom_over_capacity_rebuild_in_loop(
    spark, fixture_dir, sim_result, monkeypatch
):
    """over_capacity growth INSIDE the driver loop (VERDICT r4 task 8):
    with a tiny starter bitset, admitted links push buckets past their
    sizing mid-crawl — the distributed rebuild must fire, admission
    decisions must be unchanged vs the simulator, and each rebuild must
    refresh the executor broadcast exactly once (the replaced state's
    broadcast is adopted and retired by broadcast_map, never leaked)."""
    from macocu_crawler_spark.operators import urlseen

    # 8-byte starter bitset → ~5-key capacity per bucket: the fixture web's
    # per-round admissions overflow within the first rounds
    monkeypatch.setattr(urlseen, "_STARTER_BYTES", 8)
    rebuilds = []
    orig_from_url_seen = urlseen.BloomState.from_url_seen.__func__

    def counting_from_url_seen(cls, url_seen, n_buckets=32):
        rebuilds.append(1)
        return orig_from_url_seen(cls, url_seen, n_buckets)

    monkeypatch.setattr(
        urlseen.BloomState, "from_url_seen",
        classmethod(counting_from_url_seen),
    )
    bcs = []
    orig_broadcast_map = urlseen.BloomState.broadcast_map

    def tracking_broadcast_map(self, sc):
        bc = orig_broadcast_map(self, sc)
        bcs.append(bc)
        return bc

    monkeypatch.setattr(urlseen.BloomState, "broadcast_map", tracking_broadcast_map)
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(),
        CrawlParams(max_rounds=6, use_bloom_prefilter=True), checkpoint_every=0,
    )
    drv.run()
    # init + ≥1 in-loop over_capacity rebuild actually fired
    assert len(rebuilds) >= 2, rebuilds
    # admission decisions unchanged (Bloom is a pre-filter; the exact
    # anti-join stays authoritative even while the bloom is being replaced)
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert _fetch_log(drv) == sim_prefix
    # broadcast discipline: one broadcast_map call per round (each round's
    # increment dirties the state → exactly one refresh per call), every
    # replaced broadcast retired, and the final copy matches the state
    assert len(set(id(b) for b in bcs)) == len(bcs)  # refreshed once per change
    assert drv._bloom._bc is bcs[-1]  # exactly one live copy
    # the final increment left the state dirty; the next broadcast_map call
    # (what round 7's admission would do) must serve the CURRENT bits
    final_bc = drv._bloom.broadcast_map(spark.sparkContext)
    assert final_bc.value == drv._bloom.as_map()


def test_bloom_prefilter_resume_equivalence(spark, fixture_dir, sim_result):
    """Resume with use_bloom_prefilter: the derived BloomState is rebuilt
    from the url_seen snapshot (never checkpointed) and the continued crawl
    still matches the simulator — _init_bloom's resume path end-to-end."""
    workdir = tempfile.mkdtemp()
    drv1 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=3, use_bloom_prefilter=True), checkpoint_every=3,
    )
    drv1.run()
    del drv1  # "crash"
    drv2 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=6, use_bloom_prefilter=True), checkpoint_every=0,
    )
    drv2.resume()
    assert drv2._bloom is not None  # rebuilt from the snapshot
    drv2.run(max_rounds=3)
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert _fetch_log(drv2) == sim_prefix


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_prefilter_checkpoint_restore_skips_rebuild(
    spark, fixture_dir, monkeypatch, kind
):
    """Round 6: commit() snapshots the prefilter blobs (O(filter size)), so
    resume() restores them WITHOUT scanning url_seen — at 10^10 rows the
    rebuild is a full pass over the biggest table in the system.  Proven by
    stubbing the rebuild entry points to raise: resume must succeed anyway,
    with the restored state bit-identical to the committed one.  A kind
    mismatch (bloom checkpoint, cuckoo params) must fall back to the rebuild
    path (which the stub turns into the assertion)."""
    from macocu_crawler_spark.operators import urlseen

    workdir = tempfile.mkdtemp()
    drv1 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=3, use_bloom_prefilter=True, seen_prefilter=kind),
        checkpoint_every=3,
    )
    drv1.run()
    saved = drv1._bloom.as_map()
    del drv1

    def boom(cls, *a, **k):
        raise AssertionError("prefilter rebuild scanned url_seen on resume")

    monkeypatch.setattr(urlseen.BloomState, "from_url_seen", classmethod(boom))
    monkeypatch.setattr(urlseen.CuckooState, "from_url_seen", classmethod(boom))
    drv2 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=6, use_bloom_prefilter=True, seen_prefilter=kind),
        checkpoint_every=0,
    )
    drv2.resume()
    assert drv2._bloom.as_map() == saved  # bit-identical, no url_seen scan
    other = "cuckoo" if kind == "bloom" else "bloom"
    drv3 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(use_bloom_prefilter=True, seen_prefilter=other),
        checkpoint_every=0,
    )
    with pytest.raises(AssertionError, match="rebuild"):
        drv3.resume()


def test_invalid_prefilter_params_rejected_at_init(spark, fixture_dir):
    """ADVICE r5: a bad prefilter knob fails at construction, not at the
    first round-end increment after a round's work is spent."""
    with pytest.raises(ValueError, match="seen_prefilter"):
        CrawlDriver(
            spark, fixture_dir, tempfile.mkdtemp(),
            CrawlParams(seen_prefilter="xor"),
        )
    with pytest.raises(ValueError, match="bloom_increment_mode"):
        CrawlDriver(
            spark, fixture_dir, tempfile.mkdtemp(),
            CrawlParams(bloom_increment_mode="merge"),
        )


def test_cuckoo_distributed_increment_driver_equivalence(
    spark, fixture_dir, sim_result
):
    """Round 6: the cuckoo prefilter with the DISTRIBUTED per-bucket
    increment (delta_cuckoos) must not change any crawl decision — the
    driver-loop equivalence gate for the new scale path."""
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(),
        CrawlParams(
            max_rounds=6, use_bloom_prefilter=True, seen_prefilter="cuckoo",
            bloom_increment_mode="distributed",
        ),
        checkpoint_every=0,
    )
    drv.run()
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert _fetch_log(drv) == sim_prefix


def test_bucketed_seen_driver_equivalence(spark, fixture_dir, sim_result):
    """use_bucketed_seen (the 10^10-scale anti-join path: bucketed base +
    broadcast delta legs, chained anti-joins) must not change any crawl
    decision vs the simulator — with and without the bloom on top."""
    for bloom in (False, True):
        drv = CrawlDriver(
            spark, fixture_dir, tempfile.mkdtemp(),
            CrawlParams(max_rounds=6, use_bucketed_seen=True,
                        use_bloom_prefilter=bloom),
            checkpoint_every=0,
        )
        drv.run()
        assert drv._seen_parts is not None and len(drv._seen_parts) >= 2
        sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
        assert _fetch_log(drv) == sim_prefix, f"bloom={bloom}"
        # the parts decompose the authoritative seen set exactly
        from functools import reduce

        union = reduce(lambda a, b: a.unionByName(b), drv._seen_parts)
        assert (
            sorted(map(tuple, union.collect()))
            == sorted(map(tuple, drv.url_seen.collect()))
        )


def test_bucketed_seen_compaction_cadence_equivalence(spark, fixture_dir, sim_result):
    """Minor (delta-append) AND major (full rewrite) seen compactions
    firing mid-crawl must not change any decision: with compact_every=2 and
    seen_major_every=2, six rounds run minor@2, major@4, minor@6 — the
    fetch log still matches the simulator and the merged bucketed table
    still decomposes the authoritative url_seen exactly."""
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(),
        CrawlParams(max_rounds=6, use_bucketed_seen=True),
        checkpoint_every=0,
    )
    drv.compact_every = 2
    drv.seen_major_every = 2
    drv.run()
    # every compaction folded the legs back into the single bucketed part;
    # rounds after the last compaction (none here — 6 % 2 == 0) would add legs
    assert drv._seen_parts is not None and len(drv._seen_parts) == 1
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert _fetch_log(drv) == sim_prefix
    assert (
        sorted(map(tuple, drv._seen_parts[0].collect()))
        == sorted(map(tuple, drv.url_seen.collect()))
    )


def test_bucketed_seen_resume_equivalence(spark, fixture_dir, sim_result):
    """Resume with use_bucketed_seen: the bucketed base is rebuilt from the
    url_seen snapshot (derived state) and the continued crawl matches."""
    workdir = tempfile.mkdtemp()
    drv1 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=3, use_bucketed_seen=True), checkpoint_every=3,
    )
    drv1.run()
    del drv1
    drv2 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=6, use_bucketed_seen=True), checkpoint_every=0,
    )
    drv2.resume()
    assert drv2._seen_parts is not None  # rebuilt from the snapshot
    drv2.run(max_rounds=3)
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 6]
    assert _fetch_log(drv2) == sim_prefix


def test_multilingual_yield_rule_kills_domain(spark, fixture_dir, fixture_web):
    """MULTILINGUAL mode (domain.py:239-243): with NO primary language
    producible, every text-yielding domain dies once past the minimums —
    simulator and driver agree on fetch log AND bad flags; the same crawl
    without multilingual keeps those domains alive."""
    # the primary-ratio threshold is positive only past 10 downloads
    # (0.05·(log10 n − 1)); a.no needs ~20 rounds to cross it
    kw = dict(max_rounds=26, min_docs_downloaded=3, min_bytes_downloaded=1024)
    ml = dict(kw, multilingual=True, primary_languages=())
    sim_ml = CrawlSimulator(fixture_web, CrawlParams(**ml)).run()
    sim_plain = CrawlSimulator(fixture_web, CrawlParams(**kw)).run()
    ml_bad = {k for k, d in sim_ml.domains.items() if d.bad}
    plain_bad = {k for k, d in sim_plain.domains.items() if d.bad}
    assert ("http", "a.no") in ml_bad - plain_bad, "primary-ratio rule never bound"
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(), CrawlParams(**ml), checkpoint_every=0,
    )
    drv.run()
    assert _fetch_log(drv) == [(r, s + 1, u) for r, s, u in sim_ml.fetch_log]
    drv_bad = {(r.scheme, r.host) for r in drv.domains.collect() if r.bad}
    assert drv_bad == ml_bad
    drv_primary = {
        (r.scheme, r.host): r.bytes_cleaned_primary for r in drv.domains.collect()
    }
    sim_primary = {k: d.bytes_cleaned_primary for k, d in sim_ml.domains.items()}
    assert drv_primary == sim_primary


@pytest.mark.parametrize(
    "params_kw",
    [
        {"ip_cap": 2},            # IP politeness binds (sameip1-3.no share an IP)
        {"max_url_select": 5},    # O4 global ordered limit binds
        {"max_docs_cleaned": 2},  # "domain is done" cap binds (scheduler.py:521)
    ],
)
def test_capped_params_match_simulator(spark, fixture_dir, fixture_web, params_kw):
    params = CrawlParams(max_rounds=6, **params_kw)
    sim = CrawlSimulator(fixture_web, params).run()
    drv = CrawlDriver(spark, fixture_dir, tempfile.mkdtemp(), params, checkpoint_every=0)
    drv.run()
    sim_log = [(r, s + 1, u) for r, s, u in sim.fetch_log]
    assert _fetch_log(drv) == sim_log


def test_no_fulltext_collection(spark, fixture_dir, monkeypatch):
    """The round loop must never collect full-text columns (text / prevert /
    html / link arrays) to the driver — documents flow to the catalog as
    write jobs; the driver holds counts only (VERDICT r1 fix #1)."""
    from pyspark.sql import DataFrame

    banned = {"text", "prevert", "html", "ignored_links", "links"}
    seen: list[set] = []
    orig_topandas, orig_collect = DataFrame.toPandas, DataFrame.collect

    def spy_topandas(self):
        seen.append(set(self.columns))
        return orig_topandas(self)

    def spy_collect(self):
        seen.append(set(self.columns))
        return orig_collect(self)

    monkeypatch.setattr(DataFrame, "toPandas", spy_topandas)
    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    drv = CrawlDriver(
        spark, fixture_dir, tempfile.mkdtemp(),
        CrawlParams(max_rounds=4), checkpoint_every=0,
    )
    drv.run()
    offenders = [cols for cols in seen if cols & banned]
    assert not offenders, f"driver collected full-text columns: {offenders}"


def test_snapshot_expiry_bounds_state_and_resume_works(
    spark, fixture_dir, sim_result
):
    """Iceberg-maintenance expiry (round 5): frequent commits must trim
    state-table snapshots to expire_keep versions — on a 10^5-round crawl
    the per-durable-pin copies of frontier/domains are otherwise the
    biggest storage leak — while resume from the newest snapshot and the
    continued crawl stay exact.  Output tables (the corpus) keep ALL
    versions."""
    workdir = tempfile.mkdtemp()
    drv1 = CrawlDriver(
        spark, fixture_dir, workdir, CrawlParams(max_rounds=5),
        checkpoint_every=2,  # commits at rounds 2 and 4 → expiry fires
    )
    # url_seen/seen_txt/seen_raw are durable-pinned only every
    # compact_every rounds (init pin = v0 here), so by the round-4 commit
    # two commits have happened since their live plans' pin — expiry must
    # PROTECT v0 (the files under the live union chain) or round 5's
    # admission anti-join reads deleted files and the run crashes
    drv1.run()
    for name in CrawlDriver.STATE_TABLES:
        versions = drv1.catalog.versions(name)
        # bound: expire_keep newest + the protected live-pin version
        assert len(versions) <= drv1.expire_keep + 1, (name, versions)
    # outputs are never expired: one version per producing round
    assert len(drv1.catalog.versions("fetch_log")) == 5
    del drv1  # "crash"
    drv2 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=7), checkpoint_every=0,
    )
    drv2.resume()
    drv2.run(max_rounds=2)
    sim_prefix = [(r, s + 1, u) for r, s, u in sim_result.fetch_log if r <= 7]
    assert _fetch_log(drv2) == sim_prefix


def test_resume_equals_uninterrupted(spark, fixture_dir, sim_result, driver_result):
    """Kill after round 5, resume from the committed snapshot, continue to
    ROUNDS — results equal the uninterrupted run (SURVEY §3.3)."""
    workdir = tempfile.mkdtemp()
    drv1 = CrawlDriver(
        spark, fixture_dir, workdir, CrawlParams(max_rounds=5), checkpoint_every=5
    )
    drv1.run()
    del drv1  # "crash"
    drv2 = CrawlDriver(
        spark, fixture_dir, workdir,
        CrawlParams(max_rounds=ROUNDS), checkpoint_every=0,
    )
    drv2.resume()
    drv2.run(max_rounds=ROUNDS - 5)
    assert _fetch_log(drv2) == _fetch_log(driver_result)
    seen1 = {(r.scheme, r.host, r.path_sanitised) for r in drv2.url_seen.collect()}
    seen2 = {(r.scheme, r.host, r.path_sanitised)
             for r in driver_result.url_seen.collect()}
    assert seen1 == seen2
