"""O2/O7 queue-model equivalence (VERDICT r1 #4).

Per-sweep pending→queue batching (MAX_URL_SELECT_PER_DOMAIN,
scheduler.py:126-128), the live host-queue cap with waiting overflow
(MAX_HOST_URL_QUEUE, crawl.py:134-141) and the waiting rotation
(crawl.py:160-217) — exercised with scaled-down caps that BIND on the
queue fixture web, asserted equivalent between the pure-Python simulator
and the Spark driver.
"""

import tempfile

import pytest

from macocu_crawler_spark.crawl_driver import CrawlDriver
from macocu_crawler_spark.fixtures import (
    build_queue_web,
    compute_oracle_columns,
    write_web,
)
from macocu_crawler_spark.simulator import CrawlParams, CrawlSimulator

QPARAMS = dict(
    max_rounds=12,
    max_url_select_per_domain=5,
    max_host_url_queue=8,
    waiting_rotate_every=2,
)


@pytest.fixture(scope="module")
def queue_web():
    web = build_queue_web()
    compute_oracle_columns(web)
    return web


@pytest.fixture(scope="module")
def queue_dir(queue_web, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("queueweb"))
    write_web(out, queue_web)
    return out


def _logs(drv):
    return [
        (r["round"], r.fetch_seq, r.url)
        for r in drv.fetch_log.orderBy("round", "fetch_seq").collect()
    ]


def test_caps_bind_in_simulator(queue_web):
    """Sanity: with the scaled caps, q.no actually overflows its queue into
    waiting AND still holds pending paths mid-crawl — i.e. all three states
    of the O2/O7 model are populated, the caps are not dead parameters."""
    sim = CrawlSimulator(queue_web, CrawlParams(**{**QPARAMS, "max_rounds": 6}))
    sim.run()
    q = sim.domains[("http", "q.no")]
    assert len(q.queue) > 0
    assert len(q.waiting) > 0, "host-queue cap never overflowed"
    assert len(q.pending) > 0, "sweep pulled everything at once (O2 not binding)"


def test_o2_batching_blocks_late_short_path(queue_web):
    """A short path discovered AFTER a longer path was pulled into the
    downloader queue must NOT jump ahead of it (queue FIFO — the
    reference pops its deque; the pre-O2 model re-sorted by length)."""
    sim = CrawlSimulator(queue_web, CrawlParams(**QPARAMS)).run()
    late = [u for _, _, u in sim.fetch_log if "late.no" in u and "robots" not in u]
    assert "http://late.no/s.html" in late
    assert late.index("http://late.no/mellomlang-side-her.html") < late.index(
        "http://late.no/s.html"
    )


def test_waiting_rotation_recovers_urls(queue_web):
    """Every overflow URL eventually fetches once the queue drains — with
    enough rounds the fetch set equals the no-cap fetch set."""
    capped = CrawlSimulator(
        queue_web,
        CrawlParams(max_rounds=60, max_url_select_per_domain=5,
                    max_host_url_queue=8, waiting_rotate_every=2),
    ).run()
    uncapped = CrawlSimulator(queue_web, CrawlParams(max_rounds=60)).run()
    assert {u for _, _, u in capped.fetch_log} == {u for _, _, u in uncapped.fetch_log}


GPARAMS = {**QPARAMS, "max_url_queue": 6}  # global bound that BINDS


def test_global_queue_cap_binds_in_simulator(queue_web):
    """MAX_URL_QUEUE (crawl.py:117-132): with a tiny global bound, sweeps
    route entries to waiting even for hosts with per-host headroom — the
    capped run holds strictly more waiting URLs than the uncapped run."""
    capped = CrawlSimulator(
        queue_web, CrawlParams(**{**GPARAMS, "max_rounds": 6})
    ).run()
    uncapped = CrawlSimulator(
        queue_web, CrawlParams(**{**QPARAMS, "max_rounds": 6})
    ).run()
    n_wait_capped = sum(len(d.waiting) for d in capped.domains.values())
    n_wait_uncapped = sum(len(d.waiting) for d in uncapped.domains.values())
    assert n_wait_capped > n_wait_uncapped, "global cap never bound"
    # and at least one host was pushed to waiting while UNDER its host cap —
    # only the global bound explains that
    assert any(
        d.waiting and len(d.queue) < GPARAMS["max_host_url_queue"]
        for d in capped.domains.values()
    )


def test_global_queue_cap_recovers_all_urls(queue_web):
    """Fetches drain the queue below the bound, rotation feeds waiting back:
    the eventual fetch set equals the uncapped fetch set."""
    capped = CrawlSimulator(
        queue_web, CrawlParams(**{**GPARAMS, "max_rounds": 60})
    ).run()
    uncapped = CrawlSimulator(
        queue_web, CrawlParams(max_rounds=60)
    ).run()
    assert {u for _, _, u in capped.fetch_log} == {
        u for _, _, u in uncapped.fetch_log
    }


def test_global_queue_cap_driver_equivalence(spark, queue_web, queue_dir):
    """Driver == simulator while the GLOBAL queue bound binds (the
    commit-4eef9f8 binding-cap pattern for MAX_URL_QUEUE)."""
    sim = CrawlSimulator(queue_web, CrawlParams(**GPARAMS)).run()
    drv = CrawlDriver(
        spark, queue_dir, tempfile.mkdtemp(), CrawlParams(**GPARAMS),
        checkpoint_every=0,
    )
    drv.run()
    assert _logs(drv) == [(r, s + 1, u) for r, s, u in sim.fetch_log]
    spark_seen = {
        (r.scheme, r.host, r.path_sanitised) for r in drv.url_seen.collect()
    }
    assert spark_seen == sim.url_seen


def test_queue_caps_driver_equivalence(spark, queue_web, queue_dir):
    """Driver == simulator with all caps binding: fetch order, URL-seen."""
    params = CrawlParams(**QPARAMS)
    sim = CrawlSimulator(queue_web, params).run()
    drv = CrawlDriver(
        spark, queue_dir, tempfile.mkdtemp(), CrawlParams(**QPARAMS),
        checkpoint_every=0,
    )
    drv.run()
    assert _logs(drv) == [(r, s + 1, u) for r, s, u in sim.fetch_log]
    spark_seen = {
        (r.scheme, r.host, r.path_sanitised) for r in drv.url_seen.collect()
    }
    assert spark_seen == sim.url_seen


def test_live_salting_preserves_decisions(spark, queue_web, queue_dir, monkeypatch):
    """Hot-host salting is wired into the committed frontier (VERDICT r1
    #8): with the threshold forced tiny so q.no (30 paths) salts, the fetch
    log must be IDENTICAL (salting is layout-only) and the hot host's rows
    must span multiple partitions in the committed layout."""
    from macocu_crawler_spark import config as cfg
    from pyspark.sql import functions as F

    params = CrawlParams(max_rounds=5)
    sim = CrawlSimulator(queue_web, params).run()
    monkeypatch.setattr(cfg, "HOT_HOST_SALT_THRESHOLD", 5)
    drv = CrawlDriver(
        spark, queue_dir, tempfile.mkdtemp(), CrawlParams(max_rounds=5),
        checkpoint_every=0,
    )
    drv.run()
    assert _logs(drv) == [(r, s + 1, u) for r, s, u in sim.fetch_log]
    committed = drv.catalog.read(spark, "frontier")
    parts = (
        committed.filter(F.col("host") == "q.no")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts > 1, "hot host q.no not spread across partitions"


def test_cold_start_ramp_gates_identically(spark, queue_web, queue_dir):
    """O4 cold-start ramp (scheduler.py:156-188): with a reference-like
    MIN_URL_SELECT the crawl stalls once the per-round candidate count
    falls below the ramped minimum — simulator and driver stop at the SAME
    round with identical fetch logs, and earlier than the ungated crawl."""
    kw = dict(max_rounds=30, min_url_select_start=1, min_url_select=10)
    gated_sim = CrawlSimulator(queue_web, CrawlParams(**kw)).run()
    ungated_sim = CrawlSimulator(queue_web, CrawlParams(max_rounds=30)).run()
    assert len(gated_sim.fetch_log) < len(ungated_sim.fetch_log), (
        "gate never bound — fixture/params mismatch"
    )
    drv = CrawlDriver(
        spark, queue_dir, tempfile.mkdtemp(), CrawlParams(**kw), checkpoint_every=0,
    )
    drv.run()
    assert _logs(drv) == [(r, s + 1, u) for r, s, u in gated_sim.fetch_log]


def test_dns_resolution_stage(spark):
    """S10: the mapInPandas resolution stage — batched, pluggable resolver,
    NO_HOST routing for unresolvable hosts (scheduler.py:443-482)."""
    from macocu_crawler_spark.sources.dns import (
        NO_HOST,
        deterministic_fake_resolver,
        resolve_hosts,
    )

    df = spark.createDataFrame(
        [("http", "a.no"), ("http", "dead.no"), ("https", "b.no")],
        "scheme string, host string",
    )
    out = {r.host: r.ip for r in resolve_hosts(df, deterministic_fake_resolver).collect()}
    assert out["dead.no"] == NO_HOST
    assert out["a.no"] == deterministic_fake_resolver("a.no")
    assert out["b.no"].startswith("10.")


def test_queue_default_params_driver_equivalence(spark, queue_web, queue_dir):
    """Same web under DEFAULT caps (nothing binds) still matches."""
    params = CrawlParams(max_rounds=8)
    sim = CrawlSimulator(queue_web, params).run()
    drv = CrawlDriver(
        spark, queue_dir, tempfile.mkdtemp(), CrawlParams(max_rounds=8),
        checkpoint_every=0,
    )
    drv.run()
    assert _logs(drv) == [(r, s + 1, u) for r, s, u in sim.fetch_log]
