#!/usr/bin/env python3
"""Benchmark driver — prints ONE JSON line (driver contract).

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):

1. headline: frontier URLs processed per second through the reprocess path
   (pages → extract → dedup; SURVEY §3.2, the reference's de-facto
   regression/benchmark harness) at TWO parallelism levels — local[8] and
   local[32] — on identical input, reporting throughput at both plus the
   scaling efficiency (the BASELINE.json N→4N criterion, evidenced
   in-sandbox per BASELINE.md)
2. the crawl round loop (select→fetch→extract→merge) wall time on a wide
   bench web at local[$SPARK_GRAFT_CPUS]
3. per-query wall seconds for every oracle-checked queries() entry

Output contract: the LAST stdout line is one COMPACT JSON object —
{"metric", "value" (headline urls/sec at 4N, median-of-3), "unit",
"queries": {name: sec}, "sf", urls_per_sec_local8/32,
scaling_efficiency_8_to_32} — small enough for the driver's tail-capture
window.  Full detail (skew/control/microbench/bloom tables, per-sample
headline walls) is written to bench/BENCH_local_latest.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1"

# bench-web sizing per sf (pages ≈ hosts × pages/host); sized so the
# measured job runs for many seconds at 32 cores (per-page pipeline cost is
# ~2.6 ms — smaller webs measure scheduler overhead, not throughput)
BENCH_SIZES = {"0.001": (200, 10), "0.01": (1200, 25), "0.1": (4000, 25)}
N_HOSTS, PAGES_PER_HOST = BENCH_SIZES.get(SF, (500, 20))
CRAWL_ROUNDS = 4


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_web_dir() -> str:
    """Deterministic bench web, cached across runs."""
    cache = f"/tmp/macocu-benchweb-{N_HOSTS}x{PAGES_PER_HOST}"
    if not os.path.exists(os.path.join(cache, "pages.parquet")):
        from macocu_crawler_spark.fixtures import build_bench_web, write_web

        log(f"building bench web {N_HOSTS}x{PAGES_PER_HOST} -> {cache}")
        write_web(cache, build_bench_web(N_HOSTS, PAGES_PER_HOST))
    return cache


def make_spark(cores: int):
    from macocu_crawler_spark.session import get_spark

    return get_spark(
        app_name=f"macocu-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )


def reprocess_throughput(spark, pages_dir: str) -> tuple[float, int]:
    """pages → extract → dedup decisions, fully materialised; returns
    (seconds, n_pages).

    Input is repartitioned to the session parallelism and cached before the
    clock starts: the single-parquet-file layout is a sandbox artifact (one
    split = one task), and the metric is pipeline compute throughput — at
    production scale the scan parallelises over Iceberg file splits."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from macocu_crawler_spark.operators.extract import extract_documents

    cores = spark.sparkContext.defaultParallelism
    pages = (
        spark.read.parquet(f"{pages_dir}/pages.parquet")
        .repartition(cores * 3)
        .withColumn("wpage_id", F.monotonically_increasing_id())
        .cache()
    )
    pages.count()  # materialise off-clock
    t0 = time.time()
    docs = extract_documents(pages)
    dedup_w = Window.partitionBy("txt_hash").orderBy("wpage_id")
    out = (
        docs.filter(F.col("txt_len") > 0)
        .withColumn("rn", F.row_number().over(dedup_w))
        .withColumn("is_dup", F.col("rn") > 1)
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("is_dup").cast("long")).alias("dups"),
            F.sum("token_count").alias("tokens"),
        )
    )
    out.collect()
    wall = time.time() - t0
    n = pages.count()
    pages.unpersist()
    return wall, n


def _alu_control(procs: int) -> float:
    """Wall seconds for a fixed pure-Python ALU workload at `procs`
    processes — the hardware-ceiling probe the scaling ratio is paired
    against."""
    import multiprocessing as mp

    work = [6_000_000] * 32  # constant total work
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_burn, work)
    return time.time() - t0


def run_scaling(pages_dir: str) -> dict:
    """Same job at two parallelism levels (8 and CPUS cores) — the in-sandbox
    evidence for the N→4N executor scaling criterion.

    PAIRED against the ALU hardware-ceiling control (VERDICT r5 #2): the raw
    8→32 ratio swings with box state (r5's driver sample measured 0.39 vs
    0.54 for the same code that sampled 0.57-0.60 elsewhere), so each engine
    leg is bracketed by the ALU control at the SAME core count in the same
    minutes; eff_vs_alu_paired = engine efficiency / ALU efficiency is the
    box-state-cancelling statistic (≥1.0 = the engine scales at least as
    well as raw ALU work on this box)."""
    result = {}
    alu: dict[int, float] = {}
    for cores in (8, CPUS):
        alu_pre = _alu_control(cores)
        spark = make_spark(cores)
        try:
            # warm-up = one FULL off-clock run: a 256-page warm leaves the
            # first measured run systematically ~40% slow (python worker
            # pool + JIT still ramping), which biases a median upward
            warm_wall, _ = reprocess_throughput(spark, pages_dir)
            # HEADLINE is median-of-3 post-warm runs: round-3 showed
            # best-of-2 noise on this shared box (±15-20%) exceeding
            # round-over-round deltas, so a real 10% regression was
            # undetectable (VERDICT r3 #3)
            walls = []
            for _ in range(3):
                wall, n = reprocess_throughput(spark, pages_dir)
                walls.append(wall)
            wall = sorted(walls)[1]
        finally:
            spark.stop()
        alu_post = _alu_control(cores)
        alu[cores] = (alu_pre + alu_post) / 2  # brackets the engine leg
        result[cores] = {"sec": round(wall, 2), "pages": n,
                         "urls_per_sec": round(n / wall, 1),
                         "samples_sec": [round(w, 2) for w in walls],
                         "warmup_sec": round(warm_wall, 2),
                         "alu_control_sec": [round(alu_pre, 2),
                                             round(alu_post, 2)]}
        log(f"local[{cores}]: {n} pages in {wall:.1f}s = {n / wall:.0f} urls/s"
            f" (ALU control {alu_pre:.2f}/{alu_post:.2f}s)")
    lo, hi = result[8], result[CPUS]
    eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / (CPUS / 8)
    alu_eff = (alu[8] / alu[CPUS]) / (CPUS / 8)
    result["scaling_efficiency"] = round(eff, 3)
    result["alu_efficiency_paired"] = round(alu_eff, 3)
    result["eff_vs_alu_paired"] = round(eff / alu_eff, 3)
    return result


def run_crawl_rounds(pages_dir: str) -> dict:
    """End-to-end round loop on the wide bench web, measured in BOTH
    admission configurations (VERDICT r4 task 5): the plain anti-join
    path AND the 100×-scale configuration (Bloom pre-filter with
    distributed increments + bucketed seen base) — the scale path must
    stay within ~10% of plain at fixture scale, where its avoided
    seen-side Exchange cannot pay off yet.

    Best-of-2 full runs per configuration (the first also warms the JVM +
    Python-worker pool, which is one-time session startup, not round-loop
    cost — the same warm-up policy run_scaling applies)."""
    import tempfile

    from macocu_crawler_spark.crawl_driver import CrawlDriver
    from macocu_crawler_spark.simulator import CrawlParams

    spark = make_spark(CPUS)
    try:
        results = {}
        for label, mk_params in (
            ("plain", lambda: CrawlParams(max_rounds=CRAWL_ROUNDS)),
            ("scale_path", lambda: CrawlParams(
                max_rounds=CRAWL_ROUNDS, use_bloom_prefilter=True,
                bloom_increment_mode="distributed", use_bucketed_seen=True,
            )),
        ):
            best = None
            for attempt in (1, 2):
                drv = CrawlDriver(
                    spark, pages_dir, tempfile.mkdtemp(prefix="macocu-bench-"),
                    mk_params(), checkpoint_every=0,
                )
                t0 = time.time()
                drv.run()
                wall = time.time() - t0
                fetched = sum(m["selected"] for m in drv.metrics)
                processed = sum(m["processed"] for m in drv.metrics)
                log(f"crawl_rounds[{label}] attempt {attempt}: "
                    f"{fetched} urls in {wall:.1f}s")
                if best is None or wall < best["sec"]:
                    best = {
                        "sec": round(wall, 2),
                        "rounds": drv.round_no,
                        "urls_fetched": fetched,
                        "urls_processed": processed,
                        "urls_per_sec": round(fetched / wall, 1),
                    }
            results[label] = best
        results["scale_path_overhead"] = round(
            results["scale_path"]["sec"] / results["plain"]["sec"], 3
        )
        return results
    finally:
        spark.stop()


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def run_scheduler_microbench(
    sizes: tuple[int, ...] = (2_000_000,), n_hosts: int = 50_000
) -> list[dict]:
    """Selection-query cost over a large synthetic frontier — the component
    whose cost actually grows with frontier size (the extract pipeline is
    per-fetched-page, but the scheduler scans/windows the whole queue).

    Measures one full select_urls materialisation per frontier size at
    fixed host count and local[CPUS] — the multi-size curve is the
    "per-host, not per-row" scale evidence (near-flat wall as the frontier
    grows 16× is what lets the same plan serve a 10^10-row frontier)."""
    import pyspark.sql.functions as F

    from macocu_crawler_spark.operators.scheduler_round import select_urls
    from macocu_crawler_spark.simulator import CrawlParams

    spark = make_spark(CPUS)
    results = []
    try:
        domains = (
            spark.range(n_hosts)
            .select(
                F.lit("http").alias("scheme"),
                F.concat(F.lit("host"), F.col("id")).alias("host"),
                F.concat(F.lit("10.0."), F.col("id") % 200, F.lit("."), F.col("id") % 250)
                .alias("ip"),
                F.lit(1).alias("distance"),
                F.lit(False).alias("bad"),
                F.lit("empty").alias("robot_state"),
                F.lit(None).cast("string").alias("robot_body"),
                *[F.lit(0).cast("long").alias(c) for c in (
                    "count_downloaded", "count_cleaned",
                    "bytes_downloaded", "bytes_cleaned")],
            )
            .cache()
        )
        domains.count()
        params = CrawlParams()
        for n_urls in sizes:
            frontier = (
                spark.range(n_urls)
                .select(
                    F.lit("http").alias("scheme"),
                    F.concat(F.lit("host"), (F.col("id") % n_hosts)).alias("host"),
                    F.concat(F.lit("/p"), F.col("id"), F.lit(".html")).alias("path"),
                    F.concat(F.lit("/p"), F.col("id"), F.lit(".html")).alias("path_sanitised"),
                    (F.col("id") % 7).alias("batch_id"),
                    F.col("id").alias("seq"),
                    # O2/O7 queue model: frontier rows carry status + queue keys
                    F.lit("queued").alias("status"),
                    F.lit(1).alias("q_round"),
                    F.lit(1).alias("q_phase"),
                    (F.col("id") / n_hosts).cast("int").alias("q_rank"),
                )
                .repartition(CPUS * 3, "host")
                .cache()
            )
            frontier.count()
            best = None
            for _ in range(2):
                t0 = time.time()
                n_sel = select_urls(frontier, domains, params).count()
                wall = time.time() - t0
                best = wall if best is None else min(best, wall)
            frontier.unpersist()
            log(f"scheduler: {n_urls} frontier rows -> {n_sel} selected in {best:.1f}s")
            results.append({
                "frontier_rows": n_urls,
                "hosts": n_hosts,
                "selected": n_sel,
                "sec": round(best, 2),
                "frontier_rows_per_sec": round(n_urls / best, 0),
            })
        return results
    finally:
        spark.stop()


def run_bloom_bench(n_seen: int = 10_000_000, n_probe: int = 1_000_000) -> dict:
    """URL-seen Bloom at 10^7 seen keys (VERDICT r3 #7): distributed build,
    probe throughput over a half-seen/half-new candidate batch, incremental
    increment cost for a 10^6-new-keys round (both modes), and the
    over_capacity growth policy actually triggering a distributed rebuild
    at this scale."""
    import pyspark.sql.functions as F

    from macocu_crawler_spark.operators.urlseen import (
        BloomState,
        filter_new_candidates,
    )

    spark = make_spark(CPUS)
    try:
        def seen_df(start: int, n: int):
            return (
                spark.range(start, start + n)
                .select(
                    F.lit("http").alias("scheme"),
                    F.concat(F.lit("h"), F.col("id") % 100_000).alias("host"),
                    F.concat(F.lit("/p"), F.col("id")).alias("path_sanitised"),
                )
                .repartition(CPUS * 2)
            )

        seen = seen_df(0, n_seen).cache()
        seen.count()
        t0 = time.time()
        state = BloomState.from_url_seen(seen)
        build_sec = time.time() - t0
        # candidates: half seen, half new
        cand = (
            seen_df(n_seen - n_probe // 2, n_probe)
            .withColumn("path", F.col("path_sanitised"))
            .cache()
        )
        cand.count()
        bc = state.broadcast_map(spark.sparkContext)
        t0 = time.time()
        n_new = filter_new_candidates(cand, seen, bloom_map_bc=bc).count()
        probe_sec = time.time() - t0
        # incremental increment: a 10^6-new-keys round, both modes
        inc = seen_df(n_seen + n_probe, 1_000_000).cache()
        inc.count()
        t0 = time.time()
        state.add_new_seen(inc, mode="vectorized")
        inc_vec_sec = time.time() - t0
        t0 = time.time()
        state.add_new_seen(inc, mode="distributed")
        inc_dist_sec = time.time() - t0
        # growth policy: the two increments pushed buckets past their
        # BITS_PER_KEY sizing → over_capacity must flag, and the rebuild is
        # the distributed build (same cost class as build_sec)
        over = state.over_capacity()
        t0 = time.time()
        if over:
            state = BloomState.from_url_seen(seen.unionByName(inc))
        rebuild_sec = time.time() - t0
        log(f"bloom: build {build_sec:.1f}s, probe {probe_sec:.1f}s, "
            f"inc vec {inc_vec_sec:.2f}s / dist {inc_dist_sec:.2f}s, "
            f"over_capacity={over}, rebuild {rebuild_sec:.1f}s")
        return {
            "seen_keys": n_seen,
            "probe_candidates": n_probe,
            "probe_new": n_new,
            "build_sec": round(build_sec, 2),
            "probe_sec": round(probe_sec, 2),
            "probe_urls_per_sec": round(n_probe / probe_sec, 0),
            "increment_keys": 1_000_000,
            "increment_vectorized_sec": round(inc_vec_sec, 2),
            "increment_distributed_sec": round(inc_dist_sec, 2),
            "over_capacity_triggered": over,
            "rebuild_sec": round(rebuild_sec, 2),
        }
    finally:
        spark.stop()


def run_cuckoo_bench(n_seen: int = 10_000_000, n_probe: int = 1_000_000) -> dict:
    """The cuckoo prefilter at the same 10^7-key scale as run_bloom_bench:
    distributed build, probe throughput, vectorized increment, and a
    dead-host delete of 10^5 keys (the capability the Bloom lacks)."""
    import pyspark.sql.functions as F

    from macocu_crawler_spark.operators.urlseen import (
        CuckooState,
        filter_new_candidates,
    )

    spark = make_spark(CPUS)
    try:
        def seen_df(start: int, n: int):
            return (
                spark.range(start, start + n)
                .select(
                    F.lit("http").alias("scheme"),
                    F.concat(F.lit("h"), F.col("id") % 100_000).alias("host"),
                    F.concat(F.lit("/p"), F.col("id")).alias("path_sanitised"),
                )
                .repartition(CPUS * 2)
            )

        seen = seen_df(0, n_seen).cache()
        seen.count()
        t0 = time.time()
        state = CuckooState.from_url_seen(seen)
        build_sec = time.time() - t0
        cand = (
            seen_df(n_seen - n_probe // 2, n_probe)
            .withColumn("path", F.col("path_sanitised"))
            .cache()
        )
        cand.count()
        bc = state.broadcast_map(spark.sparkContext)
        t0 = time.time()
        n_new = filter_new_candidates(
            cand, seen, bloom_map_bc=bc, kind="cuckoo"
        ).count()
        probe_sec = time.time() - t0
        inc = seen_df(n_seen + n_probe, 1_000_000).cache()
        inc.count()
        t0 = time.time()
        state.add_new_seen(inc)
        inc_sec = time.time() - t0
        # distributed per-bucket increment (round 6): a FRESH 10^6-key
        # delta replayed executor-side — the driver collects ≤n_buckets
        # blobs instead of 10^6 key hashes, and the 32 kick chains run in
        # parallel.  Target: within ~2x of the Bloom's distributed
        # increment at the same delta size
        inc2 = seen_df(n_seen + n_probe + 1_000_000, 1_000_000).cache()
        inc2.count()
        t0 = time.time()
        state.add_new_seen(inc2, mode="distributed")
        inc_dist_sec = time.time() - t0
        gone = seen_df(0, 100_000)
        t0 = time.time()
        n_removed = state.remove_seen(gone)
        del_sec = time.time() - t0
        over = state.over_capacity()
        log(f"cuckoo: build {build_sec:.1f}s, probe {probe_sec:.1f}s, "
            f"inc vec {inc_sec:.2f}s / dist {inc_dist_sec:.2f}s, "
            f"delete 1e5 {del_sec:.2f}s (removed {n_removed}), "
            f"over_capacity={over}")
        return {
            "seen_keys": n_seen,
            "probe_candidates": n_probe,
            "probe_new": n_new,
            "build_sec": round(build_sec, 2),
            "probe_sec": round(probe_sec, 2),
            "probe_urls_per_sec": round(n_probe / probe_sec, 0),
            "increment_keys": 1_000_000,
            "increment_vectorized_sec": round(inc_sec, 2),
            "increment_distributed_sec": round(inc_dist_sec, 2),
            "delete_keys": 100_000,
            "delete_removed": n_removed,
            "delete_sec": round(del_sec, 2),
            "over_capacity_triggered": over,
        }
    finally:
        spark.stop()


def run_skew_bench(n_hot: int = 1_000_000, n_cold_hosts: int = 2000,
                   rows_per_cold: int = 100) -> dict:
    """Hot-host skew: one host with 10^6 frontier rows among 2000 cold
    hosts.  Without salting, host-hash partitioning puts the whole hot
    queue in ONE partition; repartition_frontier spreads it across salt
    shards.  Reports the max-partition share both ways (VERDICT r1 #8)."""
    import pyspark.sql.functions as F

    from macocu_crawler_spark.operators.partitioning import (
        partition_sizes,
        repartition_frontier,
    )

    spark = make_spark(CPUS)
    try:
        hot = spark.range(n_hot).select(
            F.lit("http").alias("scheme"),
            F.lit("hot.example").alias("host"),
            F.concat(F.lit("/h"), F.col("id")).alias("path"),
        )
        cold = spark.range(n_cold_hosts * rows_per_cold).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("cold"), F.col("id") % n_cold_hosts).alias("host"),
            F.concat(F.lit("/c"), F.col("id")).alias("path"),
        )
        frontier = hot.unionByName(cold).cache()
        total = frontier.count()
        t0 = time.time()
        unsalted = max(partition_sizes(frontier.repartition(CPUS, "host")))
        t_unsalted = time.time() - t0
        t0 = time.time()
        salted = max(partition_sizes(
            repartition_frontier(frontier, n_partitions=CPUS, threshold=10_000)
        ))
        t_salted = time.time() - t0
        log(f"skew: max partition {unsalted}/{total} unsalted, "
            f"{salted}/{total} salted")
        return {
            "rows": total,
            "hot_rows": n_hot,
            "max_partition_unsalted": unsalted,
            "max_partition_salted": salted,
            "max_share_unsalted": round(unsalted / total, 3),
            "max_share_salted": round(salted / total, 3),
            "sec_unsalted": round(t_unsalted, 2),
            "sec_salted": round(t_salted, 2),
        }
    finally:
        spark.stop()


def run_ip_skew_bench(n_urls: int = 500_000, n_hosts: int = 50_000) -> dict:
    """Many-hosts-one-IP politeness skew (VERDICT r2 #6): the same
    select_urls frontier with (a) uniform host→IP mapping and (b) half the
    hosts behind ONE CDN IP.  The per-IP window compiles to a map-side
    Partial WindowGroupLimit (asserted in TestSchedulerPlanShape), so the
    hot IP is capped at ip_cap rows per map task before the shuffle and the
    skewed run must stay within noise of the uniform run."""
    import pyspark.sql.functions as F

    from macocu_crawler_spark.operators.scheduler_round import select_urls
    from macocu_crawler_spark.simulator import CrawlParams

    spark = make_spark(CPUS)
    try:
        frontier = (
            spark.range(n_urls)
            .select(
                F.lit("http").alias("scheme"),
                F.concat(F.lit("host"), F.col("id") % n_hosts).alias("host"),
                F.concat(F.lit("/p"), F.col("id"), F.lit(".html")).alias("path"),
                F.concat(F.lit("/p"), F.col("id"), F.lit(".html")).alias("path_sanitised"),
                (F.col("id") % 7).alias("batch_id"),
                F.col("id").alias("seq"),
                F.lit("queued").alias("status"),
                F.lit(1).alias("q_round"),
                F.lit(1).alias("q_phase"),
                (F.col("id") / n_hosts).cast("int").alias("q_rank"),
            )
            .repartition(CPUS * 3, "host")
            .cache()
        )
        frontier.count()
        params = CrawlParams()
        result = {"frontier_rows": n_urls, "hosts": n_hosts}
        for label, ip_col in (
            ("uniform_ips", F.concat(F.lit("10.0."), F.col("id") % 200,
                                     F.lit("."), F.col("id") % 250)),
            # half the hosts behind one CDN IP
            ("one_cdn_ip_half_hosts", F.when(F.col("id") % 2 == 0,
                                             F.lit("203.0.113.7"))
             .otherwise(F.concat(F.lit("10.0."), F.col("id") % 200,
                                 F.lit("."), F.col("id") % 250))),
        ):
            domains = (
                spark.range(n_hosts)
                .select(
                    F.lit("http").alias("scheme"),
                    F.concat(F.lit("host"), F.col("id")).alias("host"),
                    ip_col.alias("ip"),
                    F.lit(1).alias("distance"),
                    F.lit(False).alias("bad"),
                    F.lit("empty").alias("robot_state"),
                    F.lit(None).cast("string").alias("robot_body"),
                    *[F.lit(0).cast("long").alias(c) for c in (
                        "count_downloaded", "count_cleaned",
                        "bytes_downloaded", "bytes_cleaned")],
                )
                .cache()
            )
            domains.count()
            best = None
            for _ in range(2):
                t0 = time.time()
                n_sel = select_urls(frontier, domains, params).count()
                best = (time.time() - t0) if best is None else min(best, time.time() - t0)
            result[label] = {"sec": round(best, 2), "selected": n_sel}
            domains.unpersist()
            log(f"ip_skew {label}: {n_sel} selected in {best:.1f}s")
        frontier.unpersist()
        result["skew_slowdown"] = round(
            result["one_cdn_ip_half_hosts"]["sec"]
            / max(result["uniform_ips"]["sec"], 1e-9), 3)
        return result
    finally:
        spark.stop()


def run_seen_join_bench(n_seen: int = 10_000_000, n_cand: int = 1_000_000) -> dict:
    """The URL-seen exact anti-join at 10^7 seen keys, both storage
    layouts: plain parquet (both sides shuffle on the seen key — what a
    naive seen table costs every round) vs the bucketed table
    (urlseen.write_bucketed_seen: seen side scans in place, only the
    candidates shuffle).  Broadcast is disabled — at 10^10 rows no
    broadcast is possible, so SMJ is the real plan."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from macocu_crawler_spark.operators.urlseen import (
        anti_join_seen_parts,
        write_bucketed_seen,
    )

    spark = make_spark(CPUS)
    tmp = tempfile.mkdtemp(prefix="macocu-seenbench-")
    original = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def keyed(start, n, pref):
            return spark.range(start, start + n).select(
                F.when(F.col("id") % 7 == 0, "https").otherwise("http")
                .alias("scheme"),
                F.concat(F.lit("h"), F.col("id") % 100_000).alias("host"),
                F.concat(F.lit(pref), F.col("id")).alias("path_sanitised"),
            )

        seen = keyed(0, n_seen, "/p")
        plain_path = f"{tmp}/seen_plain"
        seen.write.parquet(plain_path)
        plain = spark.read.parquet(plain_path)
        bucketed = write_bucketed_seen(
            seen, f"{tmp}/seen_bkt", "url_seen_bkt_bench", n_buckets=CPUS
        )
        cand = keyed(n_seen - n_cand // 2, n_cand, "/p").cache()  # half seen
        cand.count()
        result = {"seen_keys": n_seen, "candidates": n_cand}
        for label, rel in (("plain_parquet", plain), ("bucketed_table", bucketed)):
            best = None
            for _ in range(2):
                t0 = time.time()
                n_new = anti_join_seen_parts(cand, [rel]).count()
                best = (time.time() - t0) if best is None else min(best, time.time() - t0)
            result[label] = {"sec": round(best, 2), "new": n_new}
            log(f"seen-join {label}: {n_new} new in {best:.1f}s")
        result["speedup"] = round(
            result["plain_parquet"]["sec"] / result["bucketed_table"]["sec"], 2
        )
        return result
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", original)
        spark.sql("DROP TABLE IF EXISTS url_seen_bkt_bench")
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def run_seen_compaction_bench(
    n_base: int = 10_000_000, deltas: tuple[int, ...] = (100_000, 1_000_000)
) -> dict:
    """Seen-set compaction cost split (VERDICT r4 task 1): MAJOR (full
    bucketed rewrite of the base — what every compaction cost in round 4)
    vs MINOR (append_bucketed_seen: delta legs merged into their buckets in
    place).  The claim under test: minor wall ∝ delta size, independent of
    the 10^7-row base — at 10^10 rows that is the difference between
    rewriting the biggest table in the system every compact_every rounds
    and an O(delta) append."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from macocu_crawler_spark.operators.urlseen import (
        append_bucketed_seen,
        write_bucketed_seen,
    )

    spark = make_spark(CPUS)
    tmp = tempfile.mkdtemp(prefix="macocu-compactbench-")
    try:
        def keyed(start, n):
            return spark.range(start, start + n).select(
                F.when(F.col("id") % 7 == 0, "https").otherwise("http")
                .alias("scheme"),
                F.concat(F.lit("h"), F.col("id") % 100_000).alias("host"),
                F.concat(F.lit("/p"), F.col("id")).alias("path_sanitised"),
            )

        t0 = time.time()
        write_bucketed_seen(
            keyed(0, n_base), f"{tmp}/seen_bkt", "url_seen_bkt_compact_bench",
            n_buckets=CPUS,
        )
        major_sec = time.time() - t0
        result = {
            "base_keys": n_base,
            "major_rewrite_sec": round(major_sec, 2),
        }
        start = n_base
        for n_delta in deltas:
            delta = keyed(start, n_delta).cache()
            delta.count()  # materialise off-clock
            t0 = time.time()
            merged = append_bucketed_seen(
                delta, "url_seen_bkt_compact_bench", n_buckets=CPUS
            )
            minor_sec = time.time() - t0
            delta.unpersist()
            start += n_delta
            result[f"minor_append_{n_delta}_sec"] = round(minor_sec, 2)
            log(f"seen-compaction: minor append of {n_delta} onto {n_base} "
                f"base in {minor_sec:.2f}s (major rewrite: {major_sec:.1f}s)")
        result["rows_after"] = merged.count()
        result["minor_vs_major_speedup"] = round(
            major_sec / max(result[f"minor_append_{deltas[0]}_sec"], 1e-9), 1
        )
        # per-bucket MAJOR binpack (round 6, VERDICT r5 #3): after three
        # more small minors every bucket exceeds the file threshold; the
        # binpack merges only each bucket's SMALL delta files — the 10^7-row
        # base files are kept in place unread — so the wall is ∝
        # accumulated-delta bytes, a fraction of the full-table rewrite
        import os as _os

        from macocu_crawler_spark.operators.urlseen import (
            bucket_files,
            compact_dirty_buckets,
        )

        for k in range(3):
            extra = keyed(start, 100_000).cache()
            extra.count()
            append_bucketed_seen(extra, "url_seen_bkt_compact_bench",
                                 n_buckets=CPUS)
            extra.unpersist()
            start += 100_000
        files_before = bucket_files(f"{tmp}/seen_bkt")
        total_bytes = sum(
            _os.path.getsize(f) for fs in files_before.values() for f in fs
        )
        t0 = time.time()
        merged, dirty = compact_dirty_buckets(
            spark, "url_seen_bkt_compact_bench", f"{tmp}/seen_bkt", CPUS,
            max_files=4,
        )
        binpack_sec = time.time() - t0
        files_after = bucket_files(f"{tmp}/seen_bkt")
        kept = {f for fs in files_after.values() for f in fs} & {
            f for fs in files_before.values() for f in fs
        }
        kept_bytes = sum(_os.path.getsize(f) for f in kept)
        result["binpack_dirty_buckets"] = len(dirty)
        result["binpack_total_buckets"] = len(files_before)
        result["binpack_sec"] = round(binpack_sec, 2)
        result["binpack_vs_full_major"] = round(binpack_sec / major_sec, 3)
        result["binpack_base_bytes_kept_in_place"] = kept_bytes
        result["binpack_bytes_rewritten"] = total_bytes - kept_bytes
        result["rows_after_binpack"] = merged.count()
        log(f"seen-compaction: binpack of {len(dirty)} dirty buckets in "
            f"{binpack_sec:.2f}s ({binpack_sec / major_sec:.2f}x of the full "
            f"rewrite; {total_bytes - kept_bytes:,} delta bytes rewritten, "
            f"{kept_bytes:,} base bytes untouched)")
        return result
    finally:
        spark.sql("DROP TABLE IF EXISTS url_seen_bkt_compact_bench")
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def run_streaming_ingest_bench(pages_dir: str, n_files: int = 8) -> dict:
    """Streaming ingest drain throughput (VERDICT r4 task 6): the bench
    web's pages landed as n_files parquet files, drained availableNow with
    one file per micro-batch through the SAME extract pipeline as the
    round loop, with and without the dedup_horizon watermark.  Reports
    urls/s, per-micro-batch latency, and state-store row growth across
    batches (recentProgress.stateOperators) — a state-store bottleneck
    would show up here as super-linear batch latency or unbounded state."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from macocu_crawler_spark.streaming.ingest import run_ingest

    spark = make_spark(CPUS)
    base = tempfile.mkdtemp(prefix="macocu-streambench-")
    try:
        landing = f"{base}/landing"
        pages = (
            spark.read.parquet(f"{pages_dir}/pages.parquet")
            .withColumn("wpage_id", F.monotonically_increasing_id())
            .select("wpage_id", "url", "warc_ts", "html", "http_header", "ip")
        )
        pages.repartition(n_files).write.parquet(landing)
        n_pages = spark.read.parquet(landing).count()
        result = {"pages": n_pages, "micro_batches": n_files}
        for label, horizon in (("no_horizon", None), ("horizon_1h", "1 hour")):
            out = f"{base}/docs-{label}"
            t0 = time.time()
            q = run_ingest(spark, landing, out, f"{base}/ckpt-{label}",
                           dedup_horizon=horizon)
            wall = time.time() - t0
            progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
            batch_secs = [
                p["durationMs"]["triggerExecution"] / 1000.0 for p in progress
            ]
            state_rows = [
                sum(op["numRowsTotal"] for op in p["stateOperators"])
                for p in progress if p.get("stateOperators")
            ]
            result[label] = {
                "sec": round(wall, 2),
                "urls_per_sec": round(n_pages / wall, 1),
                "batches_run": len(progress),
                "batch_sec_median": round(sorted(batch_secs)[len(batch_secs) // 2], 2)
                if batch_secs else None,
                "batch_sec_max": round(max(batch_secs), 2) if batch_secs else None,
                "state_rows_per_batch": state_rows,
                "docs_out": spark.read.parquet(out).count(),
            }
            log(f"streaming[{label}]: {n_pages} pages in {wall:.1f}s "
                f"({result[label]['urls_per_sec']} urls/s, "
                f"{len(progress)} batches)")
        return result
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


def wide_web_dir(n_hosts: int = 40_000, pages_per_host: int = 25) -> str:
    """Distributed generation of the WIDE bench web (VERDICT r4 task 7):
    40k hosts ≈ per-round selected width at the MAX_URL_SELECT=30k cap
    (reference config.py:98), where the fixed ~17-job round cost
    amortises.  Driver-side Python generation at 10^6 pages would take
    minutes; the page rendering runs as a mapInPandas over the host range
    instead (same render_page kernel, deterministic per host), writing the
    pages parquet directly from executors.  Cached across runs."""
    cache = f"/tmp/macocu-widebenchweb-{n_hosts}x{pages_per_host}"
    if os.path.exists(os.path.join(cache, "seeds.txt")):
        return cache
    import random

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from macocu_crawler_spark.fixtures import (
        BASE_TS,
        HDR,
        NO_SENTENCES,
        _paragraphs,
        render_page,
    )

    log(f"building wide bench web {n_hosts}x{pages_per_host} -> {cache}")
    os.makedirs(cache, exist_ok=True)
    spark = make_spark(CPUS)
    try:
        out_schema = T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("ip", T.StringType()),
            T.StructField("http_header", T.BinaryType()),
        ])

        def gen_pages(batches):
            import datetime as dt
            for batch in batches:
                rows = []
                for hi in batch["id"]:
                    hi = int(hi)
                    host = f"host{hi:05d}.no"
                    rng = random.Random(1000 + hi)
                    for p in range(1, pages_per_host + 1):
                        links = []
                        if p < pages_per_host:
                            links.append((f"side{p + 1}.html",
                                          "neste side i serien"))
                        if p == 1 and hi + 1 < n_hosts:
                            links.append(
                                (f"http://host{hi + 1:05d}.no/side1.html",
                                 "naboside"))
                        html = render_page(
                            rng, f"{host} side {p}",
                            _paragraphs(rng, NO_SENTENCES, 3), links,
                            nav_links=["/", "/arkiv.html"],
                        )
                        idx = hi * pages_per_host + (p - 1)
                        rows.append((
                            f"http://{host}/side{p}.html",
                            BASE_TS + dt.timedelta(seconds=idx % 86_400),
                            html, "", "", "10.9.9.9", HDR,
                        ))
                yield pd.DataFrame(rows, columns=[f.name for f in out_schema])

        (
            spark.range(n_hosts)
            .repartition(CPUS * 2)
            .mapInPandas(gen_pages, schema=out_schema)
            .write.mode("overwrite")
            .parquet(os.path.join(cache, "pages.parquet"))
        )
    finally:
        spark.stop()
    hosts = [f"host{i:05d}.no" for i in range(n_hosts)]
    pq.write_table(pa.table({
        "scheme": ["http"] * n_hosts, "host": hosts,
        "state": ["EMPTY"] * n_hosts, "body": [""] * n_hosts,
    }), os.path.join(cache, "robots.parquet"))
    pq.write_table(pa.table({
        "scheme": ["http"] * n_hosts, "host": hosts,
        "ip": [f"10.{2 + i // 62500}.{(i // 250) % 250}.{i % 250}"
               for i in range(n_hosts)],
    }), os.path.join(cache, "dns.parquet"))
    pq.write_table(pa.table({
        "url": pa.array([], type=pa.string()),
        "location": pa.array([], type=pa.string()),
    }), os.path.join(cache, "redirects.parquet"))
    with open(os.path.join(cache, "seeds.txt"), "w") as f:
        f.write("\n".join(f"http://{h}/side1.html" for h in hosts) + "\n")
    return cache


def run_wide_crawl(n_hosts: int = 40_000, pages_per_host: int = 25,
                   rounds: int = 5) -> dict:
    """Round loop at MAX_URL_SELECT width (VERDICT r4 task 7): per-round
    selected ≈ the 30k global cap, so the fixed per-round job cost
    amortises over 7.5× more fetches than the 4k-host web — this is the
    wide-crawl regime the design targets.  One measured run, per-round
    walls reported (the first round includes Python-worker warm-up; the
    first two rounds are robots + domain-root fetches by the round model,
    so page extraction is wide from round 3 on)."""
    import tempfile

    from macocu_crawler_spark.crawl_driver import CrawlDriver
    from macocu_crawler_spark.simulator import CrawlParams

    pages_dir = wide_web_dir(n_hosts, pages_per_host)
    spark = make_spark(CPUS)
    try:
        drv = CrawlDriver(
            spark, pages_dir, tempfile.mkdtemp(prefix="macocu-widebench-"),
            CrawlParams(max_rounds=rounds), checkpoint_every=0,
        )
        t0 = time.time()
        drv.init_from_seeds()
        init_sec = time.time() - t0
        round_secs = []
        for _ in range(rounds):
            t0 = time.time()
            n = drv.run_round()
            round_secs.append(round(time.time() - t0, 2))
            if n == 0:
                break
        fetched = sum(m["selected"] for m in drv.metrics)
        processed = sum(m["processed"] for m in drv.metrics)
        wall = sum(round_secs)
        log(f"wide crawl {n_hosts} hosts: {fetched} urls in {wall:.1f}s "
            f"(rounds: {round_secs})")
        return {
            "hosts": n_hosts,
            "pages_per_host": pages_per_host,
            "init_sec": round(init_sec, 2),
            "round_secs": round_secs,
            "sec": round(wall, 2),
            "urls_fetched": fetched,
            "urls_processed": processed,
            "urls_per_sec": round(fetched / wall, 1),
        }
    finally:
        spark.stop()


_PAIRED_RUNNER = """
import sys, json
import bench
spark = bench.make_spark(bench.CPUS)
try:
    bench.reprocess_throughput(spark, sys.argv[1])  # warm-up, off-clock
    walls, n = [], 0
    for _ in range(2):
        w, n = bench.reprocess_throughput(spark, sys.argv[1])
        walls.append(w)
finally:
    spark.stop()
print("PAIRED_RESULT " + json.dumps({"walls": walls, "pages": n}))
"""


def run_cc_bench(n_edges: int = 1_000_000) -> dict:
    """Connected-components at 10^6 edges: 120k 5-vertex path-cliques (the
    realistic shallow near-dup shape) PLUS 40 chains of 10^4 vertices
    (diameter 10^4 — impossible for plain label propagation under the
    20-round cap; converges only because of the pointer-jumping shortcut).
    Validates every chain/clique collapses to its min vertex."""
    import pyspark.sql.functions as F

    from macocu_crawler_spark.pipeline.dedup_text import cc_clusters

    spark = make_spark(CPUS)
    try:
        # vertex ids: cliques occupy [0, 600k); chains [10^6, 10^6 + 400k)
        n_cliques, clique = 120_000, 5
        n_chains, chain_len = 40, 10_000
        def path_edges(n_paths: int, length: int, base: int):
            grp = F.floor(F.col("id") / (length - 1)).cast("long")
            off = F.col("id") % (length - 1)
            a = F.lit(base) + grp * length + off
            return spark.range(n_paths * (length - 1)).select(
                a.alias("doc_a"), (a + 1).alias("doc_b")
            )

        chain_base = 1_000_000
        clique_edges = path_edges(n_cliques, clique, 0)
        chain_edges = path_edges(n_chains, chain_len, chain_base)
        pairs = clique_edges.unionByName(chain_edges).cache()
        n_pairs = pairs.count()
        docs = (
            spark.range(n_cliques * clique)
            .select(F.col("id").alias("doc_id"))
            .unionByName(
                spark.range(chain_base, chain_base + n_chains * chain_len)
                .select(F.col("id").alias("doc_id"))
            )
            .withColumn("text", F.lit(""))
            .cache()
        )
        n_docs = docs.count()
        t0 = time.time()
        out = cc_clusters(docs, pairs=pairs).cache()
        # correctness spot: every rep is its component's min vertex
        bad = out.filter(
            (F.col("cluster_rep") != (F.col("doc_id") - F.col("doc_id") % clique))
            & (F.col("doc_id") < chain_base)
        ).count() + out.filter(
            (F.col("doc_id") >= chain_base)
            & (F.col("cluster_rep") != (
                F.lit(chain_base)
                + (F.col("doc_id") - chain_base) - (F.col("doc_id") - chain_base) % chain_len
            ))
        ).count()
        n_out = out.count()
        wall = time.time() - t0
        out.unpersist()
        pairs.unpersist()
        docs.unpersist()
        log(f"cc_at_1e6: {n_out} vertices labelled in {wall:.1f}s, bad={bad}")
        return {
            "edges": n_pairs,
            "vertices": n_docs,
            "chain_diameter": chain_len - 1,
            "sec": round(wall, 2),
            "edges_per_sec": round(n_pairs / wall, 0),
            "wrong_reps": bad,
        }
    finally:
        spark.stop()


def run_paired_ab(pages_dir: str) -> dict | None:
    """Paired A/B headline bench (VERDICT r4 task 2): cross-session box
    drift (±20%) swamps round-over-round deltas, so the PREVIOUS round's
    committed code is checked out into a worktree and the headline job is
    run interleaved with the current code in THIS session — the per-pair
    delta is a paired sample, immune to host drift between sessions.  Each
    leg is a fresh subprocess (own JVM, same warm-up policy), 2 measured
    walls per leg → 4 paired samples.

    Leg order is ABBA (prev,cur then cur,prev): the round-6 adjudication
    (bench/BENCH_paired_recheck_r06.json) showed that with a fixed
    prev-first order, monotone within-session drift aliases straight into
    the delta (+20.8% one session, −20.3% the next, parity overall);
    balancing the order cancels linear drift in the median."""
    import shutil
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))

    def git(*args):
        return subprocess.run(
            ["git", *args], cwd=repo, capture_output=True, text=True
        )

    prev = git("log", "--grep", "^round [0-9]*:", "--format=%H", "-n", "1")
    prev_rev = prev.stdout.strip()
    if not prev_rev:
        log("paired A/B: no previous-round commit found; skipping")
        return None
    worktree = f"/tmp/macocu-prev-{prev_rev[:10]}"
    if not os.path.exists(os.path.join(worktree, "bench.py")):
        shutil.rmtree(worktree, ignore_errors=True)
        git("worktree", "prune")
        r = git("worktree", "add", "--detach", worktree, prev_rev)
        if r.returncode != 0:
            log(f"paired A/B: worktree add failed: {r.stderr.strip()}")
            return None

    def run_leg(version_dir: str) -> dict | None:
        env = dict(os.environ, PYTHONPATH=version_dir)
        r = subprocess.run(
            [sys.executable, "-c", _PAIRED_RUNNER, pages_dir],
            cwd=version_dir, env=env, capture_output=True, text=True,
            timeout=900,
        )
        for line in r.stdout.splitlines():
            if line.startswith("PAIRED_RESULT "):
                return json.loads(line[len("PAIRED_RESULT "):])
        log(f"paired A/B leg failed in {version_dir}: "
            f"{(r.stderr or r.stdout)[-500:]}")
        return None

    pairs = []
    legs = {"prev": [], "cur": []}
    orders = {1: ("prev", "cur"), 2: ("cur", "prev")}  # ABBA
    dirs = {"prev": worktree, "cur": repo}
    for session in (1, 2):
        for label in orders[session]:
            vdir = dirs[label]
            res = run_leg(vdir)
            if res is None:
                return None
            legs[label].extend(res["walls"])
            log(f"paired A/B session {session} {label} "
                f"({prev_rev[:8] if label == 'prev' else 'HEAD'}): "
                f"walls {[round(w, 2) for w in res['walls']]}")
    n_pages = res["pages"]
    for a, b in zip(legs["prev"], legs["cur"]):
        pairs.append(round((a / b - 1.0) * 100, 1))  # +% = cur faster
    pairs_sorted = sorted(pairs)
    mid = len(pairs_sorted) // 2
    return {
        "prev_rev": prev_rev[:12],
        "pages": n_pages,
        "prev_walls_sec": [round(w, 2) for w in legs["prev"]],
        "cur_walls_sec": [round(w, 2) for w in legs["cur"]],
        "pair_delta_pct": pairs,
        "paired_delta_pct": pairs_sorted[mid],
        "paired_delta_spread_pct": [pairs_sorted[0], pairs_sorted[-1]],
    }


def run_controls() -> dict:
    """Hardware-ceiling controls: the same 8→32-core comparison for (a) a
    pure-ALU Python workload and (b) a pure-JVM hash aggregation.  These
    bound what ANY engine can achieve on this box — single-host memory
    bandwidth and clock scaling cap 8→32 efficiency well below 1.0, which
    is what separates the in-sandbox number from the N→4N multi-executor
    criterion (each executor brings its own memory bandwidth).
    """
    alu = {procs: _alu_control(procs) for procs in (8, 32)}
    alu_eff = (alu[8] / alu[32]) / (32 / 8)

    jvm = {}
    import pyspark.sql.functions as F

    for cores in (8, 32):
        spark = make_spark(cores)
        try:
            df = spark.range(0, 20_000_000, 1, cores * 3).withColumn(
                "h", F.md5(F.col("id").cast("string"))
            )
            df.count()  # warm
            t0 = time.time()
            df.withColumn("b", F.substring("h", 1, 4)).groupBy("b").agg(
                F.count("*"), F.min("h")
            ).count()
            jvm[cores] = time.time() - t0
        finally:
            spark.stop()
    jvm_eff = (jvm[8] / jvm[32]) / (32 / 8)
    log(f"controls: ALU eff {alu_eff:.2f}, JVM hash-agg eff {jvm_eff:.2f}")
    return {
        "pure_python_alu_efficiency": round(alu_eff, 3),
        "jvm_hash_agg_efficiency": round(jvm_eff, 3),
    }


def run_queries() -> dict:
    import __spark_entry__ as entrymod

    spark = make_spark(CPUS)
    timings = {}
    try:
        qs = entrymod.queries()
        oracle_names = set(entrymod.oracle_sql())
        for name, fn in qs.items():
            if name not in oracle_names or name == "crawl_rounds":
                continue  # rows-only ops + the full round loop (timed by
                # run_crawl_rounds; its oracle is for correctness, not speed)
            best = None
            for _ in range(2):  # best-of-2: exclude one-time planning/warm-up
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                best = wall if best is None else min(best, wall)
            timings[name] = round(best, 3)
            log(f"query {name}: {timings[name]}s")
            # entries that cache tiny gate intermediates (ann_lsh/ann_ivf)
            # return lazy plans and cannot unpersist them; clearing here
            # keeps a 40-entry session from accumulating cached relations
            # in executor storage (ADVICE r5)
            spark.catalog.clearCache()
    finally:
        spark.stop()
    return timings


DETAIL_ARTIFACT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench", "BENCH_local_latest.json"
)


def main() -> None:
    pages_dir = bench_web_dir()
    # full-depth scale evidence (32M-row frontier, 10^7-key bloom) runs at
    # the driver's per-round scale only; the sf0.01 dev loop stays fast
    full = SF == "0.1"
    scaling = run_scaling(pages_dir)
    paired = run_paired_ab(pages_dir) if full else None
    crawl = run_crawl_rounds(pages_dir)
    wide_crawl = run_wide_crawl() if full else None
    streaming = run_streaming_ingest_bench(pages_dir)
    # one more decade per round 6 (VERDICT r5 #7): 128M rows is the widest
    # frontier the 128 GiB box holds cached; each measured decade
    # strengthens the per-host-not-per-row extrapolation to 10^10
    scheduler = run_scheduler_microbench(
        sizes=(2_000_000, 8_000_000, 32_000_000, 128_000_000)
        if full else (2_000_000,)
    )
    bloom = run_bloom_bench() if full else None
    cuckoo = run_cuckoo_bench() if full else None
    seen_join = run_seen_join_bench() if full else None
    seen_compaction = run_seen_compaction_bench() if full else None
    cc = run_cc_bench() if full else None
    skew = run_skew_bench()
    ip_skew = run_ip_skew_bench()
    queries = run_queries()
    controls = run_controls()

    # the driver machine-parses the LAST stdout line; keep it compact
    # (round 3's line outgrew the driver's tail-capture window and parsed
    # as null — VERDICT r3 #2).  Everything else goes to the artifact file.
    compact = {
        "metric": (
            "frontier URLs processed per second through the reprocess path "
            f"(pages→extract→dedup) at local[{CPUS}]"
        ),
        "value": scaling[CPUS]["urls_per_sec"],
        "unit": "urls/sec",
        "queries": queries,
        "sf": float(SF),
        "urls_per_sec_local8": scaling[8]["urls_per_sec"],
        f"urls_per_sec_local{CPUS}": scaling[CPUS]["urls_per_sec"],
        "scaling_efficiency_8_to_32": scaling["scaling_efficiency"],
        # engine efficiency / bracketing-ALU-control efficiency, measured
        # interleaved in this session — the box-state-cancelling statistic
        "eff_vs_alu_paired": scaling["eff_vs_alu_paired"],
    }
    if paired is not None:
        # vs the previous round's committed code, interleaved in-session:
        # positive = current code faster; the paired design cancels box drift
        compact["paired_delta_pct"] = paired["paired_delta_pct"]
    detail = dict(compact)
    detail.update({
        "bench_web": {"hosts": N_HOSTS, "pages_per_host": PAGES_PER_HOST},
        "headline_policy": "median-of-3 per parallelism level",
        "headline_samples": {
            "local8_sec": scaling[8]["samples_sec"],
            f"local{CPUS}_sec": scaling[CPUS]["samples_sec"],
        },
        "hardware_ceiling_controls": controls,
        "crawl_rounds": crawl,
        "streaming_ingest": streaming,
        "scheduler_select": scheduler[0],
        "scheduler_frontier_scaling": scheduler,
        "hot_host_skew": skew,
        "cdn_ip_skew": ip_skew,
    })
    if bloom is not None:
        detail["bloom_at_1e7"] = bloom
    if cuckoo is not None:
        detail["cuckoo_at_1e7"] = cuckoo
    if seen_join is not None:
        detail["seen_join_at_1e7"] = seen_join
    if seen_compaction is not None:
        detail["seen_compaction_at_1e7"] = seen_compaction
    if cc is not None:
        detail["cc_at_1e6"] = cc
    if wide_crawl is not None:
        detail["wide_crawl_at_select_cap"] = wide_crawl
    if paired is not None:
        detail["paired_ab_vs_prev_round"] = paired
    os.makedirs(os.path.dirname(DETAIL_ARTIFACT), exist_ok=True)
    with open(DETAIL_ARTIFACT, "w") as f:
        json.dump(detail, f, indent=1)
    log(f"detail artifact: {DETAIL_ARTIFACT}")
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
