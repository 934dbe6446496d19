"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps the engine's operator inventory (SURVEY.md §2) onto the
driver's tables; every SQL-expressible operator has a DuckDB oracle in
``oracle_sql()`` with IDENTICAL column names and float rounding.  Crawl-
specific operators carry DIFFERENTIAL oracles: expected tables generated at
fixture time by the reference's own code (robots_filter, langid_trigram) or
by the pure-Python simulator/pipeline kernel (crawl_rounds, crawl_extract,
streaming_ingest, multimodal_features), which DuckDB then serves — so the
driver value-hashes the distributed path against an independent
implementation.  ann_lsh_topk goes further: its md5-derived hyperplanes are
engine-reproducible, so the whole multi-table multiprobe search is
re-derived in pure DuckDB SQL.  ann_ivf_topk uses the deterministic
quantizer (similarity.ann_ivf_det_topk) so it too is value-hash-checked
(_ann_ivf_expected_path) — EVERY entry now carries an oracle.

Float policy: every computed double is round(x, 4) (money: round(x, 2)) on
BOTH sides so cross-engine summation-order differences cannot flip the
value hash.  Embeddings are cast to double before any math on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from macocu_crawler_spark.pipeline import (  # noqa: E402
    curation, dedup_text, similarity, textstats,
)
from macocu_crawler_spark.streaming import windows as streamwin  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table, spread to session parallelism.

    The testdata tables are single parquet files with one row group — a
    sandbox artifact that pins the whole scan (and everything pipelined on
    it: tokenize + md5 + partial aggregation) into ONE task.  At production
    scale the Iceberg table is many file splits and this repartition would
    be a no-op cost-wise; here it is a ~10 MB shuffle that unlocks 32-way
    execution of the token-hash stages (same policy bench.py applies to the
    reprocess path).  Scan-light single-pass queries (exact dedup,
    bucketing, regex filter, fingerprints) deliberately use the plain scan:
    shuffling the full text costs more than the one-task scan it would
    parallelise.

    Round 7: the spread is keyed by doc_id (unique → skew-free) instead of
    round-robin — a keyless repartition(n) first pays a local sort of its
    input rows (spark.sql.execution.sortBeforeRepartition, guide §2.5) so
    retried tasks reproduce their row→partition assignment; hashing the
    unique key is deterministic without the sort and drops the
    full-text-row sort from every _docs consumer's plan."""
    return _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, F.col("doc_id")
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deliberately ROUND-ROBIN (unlike _docs): hashing by vec_id aliases
    # into the ann entries' query_id, so Catalyst elides the pre-window
    # exchange and the whole per-pair cosine stage collapses onto the ≤10
    # partitions the 10 query ids hash into — measured +35% on
    # ann_bruteforce/ann_lsh at sf1.0; the sort-before-repartition cost is
    # trivial at embedding row sizes
    return (
        _t(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus-quality summary — exact dedup + token stats +
    quality classes per language over the documents table (the
    post-crawl corpus pipeline in one query)."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    stats = textstats.token_stats(docs)
    quality = textstats.quality_scores(docs)
    dedup = dedup_text.exact_dedup(docs).select("doc_id")
    return (
        docs.join(stats, "doc_id")
        .join(quality, "doc_id")
        .join(dedup.withColumn("is_canonical", F.lit(1)), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("is_canonical", F.lit(0))).alias("n_unique"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(
                F.sum(F.when(F.col("quality_class") == "good", 1).otherwise(0))
                / F.count("*"),
                4,
            ).alias("good_frac"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# relational operator inventory (SURVEY §2.3-2.7) on the TPC-H-ish tables
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf):  # A1/A4 aggregation shape
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-01")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_revenue_orders(spark, sf):  # J1 join + O4 ordered limit
    # Round 7 (guide §2.3 "aggregate before you shuffle"): revenue is
    # pre-aggregated per l_orderkey BEFORE the join — o_orderkey is unique
    # in orders, so grouping by it post-join is the same partition of
    # lineitem rows; the join then probes 1.5M aggregated rows instead of
    # 6M raw ones and the post-join aggregate disappears (2.9 s → 1.3 s at
    # sf1.0, result equality checked row-for-row).
    li, orders = _t(spark, sf, "lineitem"), _t(spark, sf, "orders")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("rev_raw")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey", "o_orderdate", F.round("rev_raw", 2).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_topk_per_key(spark, sf):  # O1/O2 per-domain ordered cap
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 2)
        .select("l_orderkey", "l_linenumber", "rn")
    )


def q_politeness_pick(spark, sf):  # politeness: 1 per (host, tick)
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("tick"),
            "event_id",
        )
    )


def q_yield_rule(spark, sf):  # A2 yield-kill algebra
    ev = _t(spark, sf, "events")
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_downloaded"),
        F.round(F.sum("value"), 4).alias("bytes_downloaded"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)),
            4,
        ).alias("bytes_cleaned"),
    )
    threshold = F.lit(0.05) * (F.log10(F.col("n_downloaded")) - 1)
    return (
        agg.filter(F.col("n_downloaded") >= 10)
        .withColumn(
            "is_bad",
            (F.col("bytes_cleaned") / F.col("bytes_downloaded")) < threshold,
        )
        .select("user_id", "n_downloaded", "bytes_downloaded", "bytes_cleaned", "is_bad")
    )


def q_seen_antijoin(spark, sf):  # F6/J6 anti-join dedup shape
    return _t(spark, sf, "customer").join(
        _t(spark, sf, "orders"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_name")


def q_semijoin(spark, sf):  # left-semi "domain exists" shape
    return _t(spark, sf, "part").join(
        _t(spark, sf, "lineitem"),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_semi",
    ).select("p_partkey", "p_brand")


def q_distance_min(spark, sf):  # J4 min-combine relaxation shape
    sup, nat = _t(spark, sf, "supplier"), _t(spark, sf, "nation")
    return (
        sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.min("s_acctbal") + 1, 2).alias("relaxed_min"))
    )


def q_broadcast_star(spark, sf):  # J2 broadcast dimension joins
    o, c = _t(spark, sf, "orders"), _t(spark, sf, "customer")
    n, r = _t(spark, sf, "nation"), _t(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_host_queue_counts(spark, sf):  # A3/O7 per-host queue count + cap
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_queued"))
        .filter(F.col("n_queued") > 15)
    )


def q_union_dedup(spark, sf):  # §2.7 set ops
    a = _t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    b = _t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    return a.unionByName(b).distinct()


def q_running_min(spark, sf):  # admission running-min distance window
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.min("value").over(w), 4).alias("running_min")
    )


def q_doc_len_buckets(spark, sf):  # P10 doc-length bucketing
    docs = _t(spark, sf, "documents")  # scan-light: no repartition
    bucket = (
        F.when(F.col("n_chars") >= 1000, "1k+")
        .when(F.col("n_chars") >= 500, "500-1k")
        .when(F.col("n_chars") >= 100, "100-500")
        .otherwise("0-100")
    )
    return docs.groupBy(bucket.alias("len_bucket")).agg(F.count("*").alias("n_docs"))


def q_date_format(spark, sf):  # P9/P14 date handling
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("day_value"))


def q_regexp_filter(spark, sf):  # F1-style regex admission
    docs = _t(spark, sf, "documents")  # scan-light: no repartition
    return docs.filter(F.col("text").rlike("join .*join")).select("doc_id", "lang")


def q_events_tumbling(spark, sf):  # §2.9 streaming agg (batch-equivalent form)
    return streamwin.windowed_counts_batch(spark, sf)


def q_global_seq(spark, sf):
    """The scale-safe global numbering primitive (partitioning.bucketed_seq
    — two-pass bucketed ranks, no single-partition window) must equal SQL
    row_number() over the same total order."""
    from macocu_crawler_spark.operators.partitioning import bucketed_seq

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    return bucketed_seq(
        li, "l_orderkey", [F.col("l_orderkey"), F.col("l_linenumber")],
        "seq", width=512,
    )


def q_queue_sweep(spark, sf):
    """One O2/O7 sweep (operators/frontier_queue.sweep_frontier) over a
    frontier built from the events table: per-host pull of the 5 shortest
    paths, queue cap 3 → ranks 1-4 queued, rank 5 waiting, rest pending."""
    from macocu_crawler_spark.operators.frontier_queue import sweep_frontier
    from macocu_crawler_spark.simulator import CrawlParams

    ev = _t(spark, sf, "events")
    frontier = ev.select(
        F.lit("http").alias("scheme"),
        F.col("user_id").cast("string").alias("host"),
        F.concat(F.lit("/"), F.col("event_id").cast("string")).alias("path"),
        F.concat(F.lit("/"), F.col("event_id").cast("string")).alias("path_sanitised"),
        F.lit(0).cast("long").alias("batch_id"),
        F.col("event_id").cast("long").alias("seq"),
        F.lit("pending").alias("status"),
        F.lit(None).cast("int").alias("q_round"),
        F.lit(None).cast("int").alias("q_phase"),
        F.lit(None).cast("int").alias("q_rank"),
    )
    domains = ev.select(
        F.lit("http").alias("scheme"),
        F.col("user_id").cast("string").alias("host"),
    ).distinct().select(
        "scheme", "host",
        F.lit("1.2.3.4").alias("ip"),
        F.lit(1).alias("distance"),
        F.lit(False).alias("bad"),
        F.lit("empty").alias("robot_state"),
        F.lit(None).cast("string").alias("robot_body"),
        *[F.lit(0).cast("long").alias(c) for c in (
            "count_downloaded", "count_cleaned",
            "bytes_downloaded", "bytes_cleaned")],
    )
    params = CrawlParams(
        max_url_select_per_domain=5, max_host_url_queue=3,
        waiting_rotate_every=0,
    )
    return sweep_frontier(frontier, domains, round_no=1, params=params).select(
        "host", "path", "status", "q_rank"
    )


# ---------------------------------------------------------------------------
# URL kernel on an inline URL list (P1-P5/F1-F4 reason cascade)
# ---------------------------------------------------------------------------

ADMISSION_URLS = [
    "http://example.no/page.html",
    "https://example.no/a/b.html?q=1",
    "short",
    "ftp://files.example.no/x.dat",
    "http://" + "a" * 60 + ".no/x.html",
    "http://www.www.example.no/x.html",
    "http://spam.tk/free.html",
    "http://ok.no/" + "seg/" * 40 + "deep.html",
    "http://ok.no/x/x/x/x/x/x/x",
    "http://ok.no/image.jpg",
    "http://ok.no/report.pdf",
    "http://ok.no/fine/path.html",
]


def q_url_admission(spark, sf):
    from macocu_crawler_spark.functions import urlkit

    rows = []
    for u in ADMISSION_URLS:
        parts, reason = urlkit.url_split_and_check_parts(u)
        rows.append((u, reason or "accepted"))
    return spark.createDataFrame(rows, "url string, reason string")


URL_ADMISSION_ORACLE_VALUES = ", ".join(f"('{u}')" for u in ADMISSION_URLS)
URL_ADMISSION_ORACLE = f"""
WITH urls(url) AS (VALUES {URL_ADMISSION_ORACLE_VALUES}),
parsed AS (
  SELECT url,
         regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
         regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         coalesce(nullif(regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1), ''), '/') AS path
  FROM urls
)
SELECT url,
  CASE
    WHEN NOT regexp_matches(url, '^https?://.+\\..+') OR length(url) < 12
      THEN 'url-invalid-or-short'
    WHEN scheme NOT IN ('http', 'https') THEN 'scheme-unsupported'
    WHEN length(host) > 50 THEN 'host-too-long'
    WHEN host LIKE 'www.www.%'
         OR len(list_distinct(string_split(host, '.'))) + 3 < len(string_split(host, '.'))
      THEN 'host-repetitive'
    WHEN regexp_matches(host, '\\.tk$') THEN 'host-blacklisted-TLD'
    WHEN length(path) > 500
         OR len(string_split(path, '/')) - 1 > 30
         OR len(string_split(path, '.')) - 1 > 30
      THEN 'path-too-long'
    WHEN len(list_distinct(string_split(path, '/'))) + 4 < len(string_split(path, '/'))
      THEN 'path-repetitive'
    WHEN regexp_matches(lower(path), '\\.(7z|jpg|jpeg|png|gif|zip|css|js|xml|mp3|mp4)$')
      THEN 'path-bad-file-type'
    WHEN regexp_matches(lower(path), '\\.(doc|docx|odt|pdf|ps)$') THEN 'path-binary-file'
    ELSE 'accepted'
  END AS reason
FROM parsed
"""


# ---------------------------------------------------------------------------
# crawl-specific rows-only entries (non-SQL; gated by tests/)
# ---------------------------------------------------------------------------

_FIXTURE_CACHE: dict[str, str] = {}


def _kernel_code_bytes(*modules) -> bytes:
    """Source bytes of the kernel modules an expectation table is computed
    FROM — folded into every expectation cache key so editing a kernel can
    never silently reuse a stale /tmp or fixture-dir expectation (the
    stale-cache class ADVICE r4 flagged for content, extended to code)."""
    chunks = []
    for mod in modules:
        with open(mod.__file__, "rb") as f:
            chunks.append(f.read())
    return b"\x00".join(chunks)


def _functions_pkg_bytes() -> bytes:
    """Source bytes of the whole functions/ package (the page-pipeline
    kernel closure: textkit, boilerplate, charset, trigram, urlkit, ...)."""
    import glob as _glob

    chunks = []
    pkg_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "macocu_crawler_spark", "functions",
    )
    for p in sorted(_glob.glob(os.path.join(pkg_dir, "*.py"))):
        with open(p, "rb") as f:
            chunks.append(f.read())
    return b"\x00".join(chunks)


def _fixture_dir() -> str:
    if "dir" not in _FIXTURE_CACHE:
        import tempfile

        from macocu_crawler_spark.fixtures import write_fixtures

        d = tempfile.mkdtemp(prefix="macocu-entry-fixtures-")
        _FIXTURE_CACHE["web"] = write_fixtures(d)
        _FIXTURE_CACHE["dir"] = d
    return _FIXTURE_CACHE["dir"]


def _fixture_web():
    _fixture_dir()
    return _FIXTURE_CACHE["web"]


def q_streaming_ingest(spark, sf):
    """The page-extract pipeline as a Structured Streaming job: fixture
    pages land as files, availableNow drains them through the SAME
    mapInPandas extract stage as the round loop into a parquet documents
    sink (checkpointed, exactly-once), with streaming first-wins exact
    dedup in the state store.

    Projection contract: which URL wins a txt_hash is micro-batch
    arrival-order-dependent (ingest.extract_stream docstring), so the
    driver-checked projection carries only arrival-independent columns —
    (txt_hash, lang, token_count, txt_len) are all pure functions of the
    text.  The DuckDB oracle is the simulator-differential extract
    expectation (pure-Python textkit.process_page per page) deduped on
    txt_hash — so the value hash checks the ENTIRE streaming path (file
    source, streaming mapInPandas, state-store dedup, parquet sink)
    against the plain-Python kernel."""
    import tempfile

    from macocu_crawler_spark.streaming.ingest import run_ingest

    base = tempfile.mkdtemp(prefix="macocu-stream-")
    pages = (
        spark.read.parquet(f"{_fixture_dir()}/pages.parquet")
        .withColumn("wpage_id", F.monotonically_increasing_id())
        .select("wpage_id", "url", "warc_ts", "html", "http_header", "ip")
    )
    landing = f"{base}/landing"
    pages.repartition(3).write.parquet(landing)
    # round 7: drain the 3 landing files in ONE availableNow trigger —
    # the checked projection is arrival-order-independent (docstring), so
    # micro-batch granularity cannot change the result, and each extra
    # trigger costs ~1.2 s of pure streaming machinery (plan + state-store
    # commit + sink commit) at fixture scale.  Per-file micro-batching
    # stays covered by tests/test_streaming_ingest and by bench.py's own
    # streaming row (file-per-trigger there, unchanged).
    run_ingest(
        spark, landing, f"{base}/docs", f"{base}/ckpt",
        max_files_per_trigger=3,
    )
    return (
        spark.read.parquet(f"{base}/docs")
        .select("txt_hash", "lang", "token_count", "txt_len")
        .orderBy("txt_hash")
    )


def q_crawl_rounds(spark, sf):
    """5 crawl rounds on the fixture web → deterministic fetch log."""
    import tempfile

    from macocu_crawler_spark.crawl_driver import CrawlDriver
    from macocu_crawler_spark.simulator import CrawlParams

    drv = CrawlDriver(
        spark, _fixture_dir(), tempfile.mkdtemp(),
        CrawlParams(max_rounds=5), checkpoint_every=0,
    )
    drv.run()
    return drv.fetch_log.orderBy("round", "fetch_seq")


def q_crawl_extract(spark, sf):
    """The page pipeline over the fixture pages (byte-identical contract
    is asserted in tests; here: stable scalar projection)."""
    from macocu_crawler_spark.operators.extract import extract_documents

    # deterministic page id with NO window at all (url is unique in the
    # fixture): an unpartitioned Window.orderBy would contradict the
    # repo's no-single-partition-window policy (VERDICT r3 #4) — the id
    # only keys extraction, it is not in the projection
    pages = spark.read.parquet(f"{_fixture_dir()}/pages.parquet").withColumn(
        "wpage_id", F.pmod(F.xxhash64("url"), F.lit(1 << 40))
    )
    return extract_documents(pages).select(
        "url", "lang", "txt_len", "token_count", "txt_hash"
    )


ROBOTS_PROBE_PATHS = ["/", "/privat/skjult.html", "/nyhet1.html", "/ingen/x.html"]


_REF_MODULES_CACHE: tuple | None = None


def _reference_modules():
    """Import the reference's pure-Python kernels (/root/reference is
    PUBLIC read-only content; its modules are used ONLY to generate oracle
    expectations, never shipped).  The reference robotparser hard-requires
    re2 — a stdlib-re stub is injected, safe for these small benign rule
    files (same shim as tests/test_reference_differential.py).

    The shim is SCOPED (ADVICE r4): sys.path and the re2/util entries in
    sys.modules are saved and restored around the import, so a real re2
    is never shadowed and no reference module leaks into later imports in
    this process — the returned module objects keep their own internal
    references to the stub, which is all they need."""
    global _REF_MODULES_CACHE
    if _REF_MODULES_CACHE is not None:
        return _REF_MODULES_CACHE
    import importlib
    import re as _re
    import types

    shim_keys = ("re2", "util", "util.robotparser", "util.trigrams")
    saved_modules = {k: sys.modules.get(k) for k in shim_keys}
    saved_path = list(sys.path)
    try:
        fake = types.ModuleType("re2")
        fake.escape, fake.compile = _re.escape, _re.compile
        fake.match, fake.sub = _re.match, _re.sub
        sys.modules["re2"] = fake
        for k in ("util", "util.robotparser", "util.trigrams"):
            sys.modules.pop(k, None)  # force the REFERENCE's util package
        sys.path.append("/root/reference")
        robotparser = importlib.import_module("util.robotparser")
        trigrams = importlib.import_module("util.trigrams")
    finally:
        sys.path[:] = saved_path
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    _REF_MODULES_CACHE = (robotparser, trigrams)
    return _REF_MODULES_CACHE


def _robots_expected_path() -> str:
    """Expected allow/deny per fixture (host, path), computed by the
    REFERENCE robotparser — a true differential oracle: the driver's hash
    check then compares our vectorized rules UDF against the reference's
    own matching, value by value (VERDICT r3 task 3)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from macocu_crawler_spark import config

    fd = _fixture_dir()
    tbl = pq.read_table(
        os.path.join(fd, "robots.parquet"), columns=["host", "body"]
    ).to_pydict()
    # cache keyed on robots CONTENT + probe paths + agent (ADVICE r4): a
    # regenerated fixture with different robots bodies can never silently
    # reuse a stale expectation table
    key_h = hashlib.md5()
    for host, body in zip(tbl["host"], tbl["body"]):
        key_h.update(repr((host, body)).encode())
    key_h.update(repr((ROBOTS_PROBE_PATHS, config.AGENT)).encode())
    out = os.path.join(fd, f"robots_expected-{key_h.hexdigest()[:16]}.parquet")
    if not os.path.exists(out):
        robotparser, _ = _reference_modules()
        hosts, paths, allowed = [], [], []
        for host, body in zip(tbl["host"], tbl["body"]):
            for p in ROBOTS_PROBE_PATHS:
                if body is None or not body.strip():
                    a = True
                else:
                    try:
                        ref = robotparser.RobotExclusionRulesParser()
                        ref.parse(body)
                        a = bool(ref.is_allowed(config.AGENT, p))
                    except Exception:
                        a = config.IGNORE_ROBOTS_WHEN_FAILED
                hosts.append(host)
                paths.append(p)
                allowed.append(a)
        pq.write_table(
            pa.table({"host": hosts, "path": paths, "allowed": allowed}), out
        )
    return out


def _langid_expected_path() -> str:
    """Expected (text_md5 → best_lang, lang_diff) over the documents texts
    of EVERY testdata sf, computed with the reference trigrams.Trigram —
    models trained by the reference code on the same lang_samples our
    models use.  The diff math is bit-identical on both sides (integer dot
    product and norms; one float division), so the driver's value hash is
    an exact check.  Cached in /tmp keyed by input content."""
    import glob
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from macocu_crawler_spark import config
    from macocu_crawler_spark.functions.textkit import _read_data

    doc_files = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    texts: dict[str, str] = {}
    key_h = hashlib.md5()
    for f in doc_files:
        for t in pq.read_table(f, columns=["text"]).column("text").to_pylist():
            t = t or ""
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in texts:
                texts[h] = t
    for h in sorted(texts):
        key_h.update(h.encode())
    # the expectation also depends on the model side (ADVICE r4): fold the
    # language list and each training sample's content into the cache key
    for lang in config.LANGUAGES:
        key_h.update(lang.encode())
        key_h.update(_read_data("lang_samples", lang).encode("utf-8"))
    out = f"/tmp/macocu-langid-expected-{key_h.hexdigest()[:16]}.parquet"
    if not os.path.exists(out):
        _, trigrams = _reference_modules()
        models = []
        for lang in config.LANGUAGES:  # same deterministic order as the UDF
            m = trigrams.Trigram()
            m.parseLines([_read_data("lang_samples", lang)])
            models.append((lang, m))
        md5s, langs, diffs = [], [], []
        for h, t in texts.items():
            if not t:
                best, best_diff = None, None
            else:
                doc = trigrams.Trigram()
                doc.parseLines([t])
                best, best_diff = None, 1.0
                for lang, m in models:
                    d = m - doc  # 1 - cosine, reference __sub__
                    if d < best_diff:
                        best, best_diff = lang, d
                best_diff = round(best_diff, 6)
            md5s.append(h)
            langs.append(best)
            diffs.append(best_diff)
        pq.write_table(
            pa.table({
                "text_md5": md5s,
                "best_lang": pa.array(langs, type=pa.string()),
                "lang_diff": pa.array(diffs, type=pa.float64()),
            }),
            out,
        )
    return out


def _crawl_rounds_expected_path() -> str:
    """Expected 5-round fetch log, produced by the pure-Python simulator
    (the reference-semantics model the driver is equivalence-tested
    against) — promoting crawl ordering, the north rule, from a
    pytest-only gate to a driver-visible value-hash check (VERDICT r4
    task 4).  Cache keyed on fixture content + params."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from macocu_crawler_spark.simulator import CrawlParams, CrawlSimulator

    fd = _fixture_dir()
    key_h = hashlib.md5()
    for name in ("pages.parquet", "robots.parquet", "dns.parquet",
                 "redirects.parquet", "seeds.txt"):
        with open(os.path.join(fd, name), "rb") as f:
            key_h.update(f.read())
    key_h.update(b"max_rounds=5")
    # the expectation is computed BY the simulator — key its code too
    from macocu_crawler_spark import simulator as _sim_mod

    key_h.update(_kernel_code_bytes(_sim_mod))
    key_h.update(_functions_pkg_bytes())
    out = os.path.join(fd, f"fetchlog_expected-{key_h.hexdigest()[:16]}.parquet")
    if not os.path.exists(out):
        sim = CrawlSimulator(_fixture_web(), CrawlParams(max_rounds=5)).run()
        # driver fetch_seq is 1-based (simulator seq is 0-based)
        rounds = [r for r, _s, _u in sim.fetch_log]
        seqs = [s + 1 for _r, s, _u in sim.fetch_log]
        urls = [u for _r, _s, u in sim.fetch_log]
        pq.write_table(
            pa.table({
                "round": pa.array(rounds, type=pa.int64()),
                "fetch_seq": pa.array(seqs, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
            }),
            out,
        )
    return out


def _crawl_extract_expected_path() -> str:
    """Expected per-page extract projection (url, lang, txt_len,
    token_count, txt_hash) over the fixture pages, computed by calling the
    pure-Python pipeline kernel (textkit.process_page) row by row — the
    driver's value hash then checks the whole distributed plumbing
    (mapInPandas batching, Arrow binary round-trip, charset ladder) against
    the plain-Python result (VERDICT r4 task 3).  The projected fields do
    not depend on wpage_id/connect_time/ip (those feed only the prevert
    header), so dummies are passed.  Cache keyed on pages content +
    conversion flag."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from macocu_crawler_spark import config
    from macocu_crawler_spark.functions import textkit

    fd = _fixture_dir()
    key_h = hashlib.md5()
    with open(os.path.join(fd, "pages.parquet"), "rb") as f:
        key_h.update(f.read())
    key_h.update(repr(config.CONVERSION_ENABLED).encode())
    # the expectation is computed BY the pipeline kernel — key its code too
    key_h.update(_functions_pkg_bytes())
    out = os.path.join(fd, f"extract_expected-{key_h.hexdigest()[:16]}.parquet")
    if not os.path.exists(out):
        tbl = pq.read_table(
            os.path.join(fd, "pages.parquet"),
            columns=["url", "html", "http_header"],
        ).to_pydict()
        urls, langs, txt_lens, token_counts, txt_hashes = [], [], [], [], []
        for url, html, header in zip(tbl["url"], tbl["html"], tbl["http_header"]):
            row = textkit.process_page(
                0, url, bytes(html) if html is not None else b"",
                bytes(header) if header is not None else None,
                "20230815100000", None,
                conversion_enabled=config.CONVERSION_ENABLED,
            )
            urls.append(url)
            langs.append(row["lang"])
            txt_lens.append(row["txt_len"])
            token_counts.append(row["token_count"])
            txt_hashes.append(row["txt_hash"])
        pq.write_table(
            pa.table({
                "url": pa.array(urls, type=pa.string()),
                "lang": pa.array(langs, type=pa.string()),
                "txt_len": pa.array(txt_lens, type=pa.int64()),
                "token_count": pa.array(token_counts, type=pa.int64()),
                "txt_hash": pa.array(txt_hashes, type=pa.int64()),
            }),
            out,
        )
    return out


def q_robots_filter(spark, sf):
    """Robots allowance matrix for fixture (host, path) pairs via the
    vectorized rules UDF (F5/U10); oracle = the reference robotparser's
    own verdicts (_robots_expected_path)."""
    from macocu_crawler_spark.operators.domains import robots_allowed_udf

    robots = spark.read.parquet(f"{_fixture_dir()}/robots.parquet")
    paths = spark.createDataFrame([(p,) for p in ROBOTS_PROBE_PATHS], "path string")
    return robots.crossJoin(paths).select(
        "host", "path", robots_allowed_udf(F.col("body"), F.col("path")).alias("allowed")
    )


def _multimodal_expected_path() -> str:
    """Expected (media_id, kind, payload_bytes, dim, feat_sum) over the
    deterministic synthetic media table, computed by calling the real
    decoders (_decode_real: stdlib wave / struct+numpy BMP / RIFF-AVI walk)
    row by row in plain Python — the driver's value hash then checks the
    whole distributed mapInPandas plumbing (Arrow binary round-trip,
    batching, array<float> schema) against the single-node result, the
    same kernel-differential pattern as crawl_extract.

    The float32 features are summed as exact doubles in list order on both
    sides (Spark F.aggregate is an ordered fold), so the raw sums are
    bit-identical; feat_sum is then rounded with
    similarity.F_round_half_up — decimal HALF_UP on the shortest repr,
    Spark's exact BigDecimal.valueOf semantic.  (DuckDB's round() scales
    the BINARY double instead and diverges from Spark on 4th-decimal
    ties, so the rounding deliberately does NOT happen in the oracle SQL.)
    Cache keyed on payload content + feature dim + decoder source."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from macocu_crawler_spark.pipeline import multimodal as _mm_mod
    from macocu_crawler_spark.pipeline.multimodal import (
        FEATURE_DIM,
        _decode_real,
        synthetic_media_rows,
    )
    from macocu_crawler_spark.pipeline.similarity import F_round_half_up

    rows = synthetic_media_rows()
    key_h = hashlib.md5()
    for r in rows:
        key_h.update(repr((r[0], r[1])).encode())
        key_h.update(bytes(r[2]))
    key_h.update(repr(FEATURE_DIM).encode())
    # the expectation is computed BY the decoders and rounded by
    # similarity.F_round_half_up — key both modules' code
    from macocu_crawler_spark.pipeline import similarity as _sim_pipe

    key_h.update(_kernel_code_bytes(_mm_mod, _sim_pipe))
    out = f"/tmp/macocu-multimodal-expected-{key_h.hexdigest()[:16]}.parquet"
    if not os.path.exists(out):
        ids, kinds, sizes, dims, sums = [], [], [], [], []
        for media_id, kind, payload, *_rest in rows:
            feature = _decode_real(kind, bytes(payload)).tolist()
            ids.append(media_id)
            kinds.append(kind)
            sizes.append(len(payload))
            dims.append(len(feature))
            acc = 0.0
            for v in feature:  # same ordered fold as F.aggregate
                acc = acc + v
            sums.append(F_round_half_up(acc, 4))
        pq.write_table(
            pa.table({
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "payload_bytes": pa.array(sizes, type=pa.int64()),
                "dim": pa.array(dims, type=pa.int32()),
                "feat_sum": pa.array(sums, type=pa.float64()),
            }),
            out,
        )
    return out


def q_multimodal_features(spark, sf):
    from macocu_crawler_spark.pipeline import multimodal

    media = multimodal.synthetic_media(spark)
    feats = multimodal.extract_features(media)
    return feats.select(
        "media_id", "kind", "payload_bytes", F.size("feature").alias("dim"),
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, v: a + v), 4).alias("feat_sum"),
    )


def q_langid_trigram(spark, sf):
    return textstats.langid_trigram(_docs(spark, sf))


ANN_RECALL_FLOOR = 0.8


def q_ann_lsh(spark, sf):
    """Rows carry per-query recall@k vs brute force, PLUS a summary row
    (query_id = -1, cos = mean recall) that exists ONLY while mean recall
    clears the 0.8 floor — so a recall regression changes the entry's row
    count in CORRECTNESS, not just a pytest assertion (VERDICT r2 #8)."""
    df = similarity.ann_lsh_with_recall(_emb(spark, sf))
    per_query = df.select("query_id", "recall_at_k").dropDuplicates(["query_id"])
    gate = (
        per_query.groupBy()
        .agg(F.round(F.avg("recall_at_k"), 4).alias("mean_recall"))
        .filter(F.col("mean_recall") >= ANN_RECALL_FLOOR)
        .select(
            F.lit(-1).cast("long").alias("query_id"),
            F.lit(-1).cast("long").alias("neighbor_id"),
            F.col("mean_recall").alias("cos"),
            F.lit(0).cast("int").alias("rank"),
            F.col("mean_recall").alias("recall_at_k"),
        )
    )
    return df.unionByName(gate)


def _ann_ivf_expected_path(
    n_queries=10, k=5, n_cells=8, n_probe=5, n_iter=10, n_train=4096
) -> str:
    """Expected ann_ivf_det_topk output (+ the recall gate row) for EVERY
    testdata sf, computed by a plain-Python replica of the deterministic
    IVF (similarity.ivf_det_codebook / ann_ivf_det_topk) — md5-ordered
    bounded training sample, 4-decimal HALF_UP rounding of every
    assignment distance, centroid component and cosine, argmin ties to
    the smallest cell.

    Bit-equality contract: every quantity Spark computes as an ORDERED
    fold (norms, distances, dots) is reproduced here with a left-to-right
    Python loop — identical IEEE op sequence, identical bits; the
    codebook trainer is driver-side in the engine too (Lloyd's on the
    md5-ordered sample), but this replica keeps its OWN independent loop
    rather than importing the engine's, and the centroid mean stays
    fixed-point on both sides — per-vector 1e-6 quantisation to ints,
    whose sums are exactly associative — so member order cannot produce
    even a last-bit difference.  Rounding uses
    similarity.F_round_half_up (decimal HALF_UP on repr, the BigDecimal
    semantic of Spark's F.round) — Python's round() is banker's and would
    diverge on exact ties.

    oracle_sql() has no sf parameter, so rows carry a content
    discriminator — (n_vecs, fp_sum = round(sum of first components, 3),
    fp_sum2 = same over LAST components) — and the oracle filters on the
    live embeddings view's own fingerprint.  A collision between datasets
    on the full discriminator RAISES instead of silently serving one
    dataset's expectations for the other (ADVICE r5).  Cache keyed on all
    embeddings content + params."""
    import glob
    import hashlib
    from math import sqrt

    import duckdb as _duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from macocu_crawler_spark.pipeline.similarity import F_round_half_up as r

    files = sorted(glob.glob("/root/testdata/sf*/embeddings.parquet"))
    key_h = hashlib.md5()
    for f in files:
        with open(f, "rb") as fh:
            key_h.update(hashlib.md5(fh.read()).digest())
    key_h.update(repr((n_queries, k, n_cells, n_probe, n_iter, n_train)).encode())
    # the expectation replicates similarity's det-IVF — key both codes
    import inspect

    from macocu_crawler_spark.pipeline import similarity as _sim_pipe

    key_h.update(_kernel_code_bytes(_sim_pipe))
    key_h.update(inspect.getsource(_ann_ivf_expected_path).encode())
    out = f"/tmp/macocu-ann-ivf-expected-{key_h.hexdigest()[:16]}.parquet"
    if os.path.exists(out):
        return out

    def fold_sq(v):  # ordered fold of v*v (the _unit_col norm)
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return acc

    cols = {"query_id": [], "neighbor_id": [], "cos": [], "rank": [],
            "n_vecs": [], "fp_sum": [], "fp_sum2": []}
    seen_fps = set()
    for f in files:
        tbl = pq.read_table(f, columns=["vec_id", "embedding"]).to_pydict()
        ids = tbl["vec_id"]
        embs = [[float(x) for x in e] for e in tbl["embedding"]]
        n_vecs = len(ids)
        fp_sum, fp_sum2 = _duckdb.sql(
            f"SELECT round(sum(embedding[1]::DOUBLE), 3), "
            f"round(sum(embedding[len(embedding)]::DOUBLE), 3) "
            f"FROM read_parquet('{f}')"
        ).fetchone()
        if (n_vecs, fp_sum, fp_sum2) in seen_fps:
            raise RuntimeError(
                f"ann_ivf oracle: embeddings dataset {f} collides with "
                f"another sf on the content discriminator "
                f"(n_vecs={n_vecs}, fp_sum={fp_sum}, fp_sum2={fp_sum2}) — "
                "the oracle WHERE clause could not tell them apart; "
                "extend the discriminator"
            )
        seen_fps.add((n_vecs, fp_sum, fp_sum2))
        units = [
            [x / sqrt(fold_sq(e)) for x in e] for e in embs
        ]
        # --- codebook (ivf_det_codebook replica) ---
        order = sorted(
            range(n_vecs),
            key=lambda j: (hashlib.md5(str(ids[j]).encode()).hexdigest(), ids[j]),
        )
        # like Spark's .limit(): fewer vectors than cells → fewer cells
        # (zero-norm embeddings stay out of contract on both sides: the
        # embeddings tables carry non-degenerate vectors).  Training is
        # bounded to the first n_train of the SAME md5 order, mirroring
        # ivf_det_codebook's sample contract (all rows at testdata scale)
        train = order[:n_train]
        centroids = [[r(x, 4) for x in units[j]] for j in train[:n_cells]]
        cells = range(len(centroids))

        def d2_of(u, c):  # ordered fold of (a-b)^2, rounded like Spark
            acc = 0.0
            for a, b in zip(u, c):
                d = a - b
                acc = acc + d * d
            return r(acc, 4)

        dim = len(embs[0])
        # iteration-invariant fixed-point quantisation, hoisted exactly
        # as lloyd_fixed_point hoists it (same values either way)
        scaled = {j: [int(r(x * 1e6, 0)) for x in units[j]] for j in train}
        for _ in range(n_iter):
            members: list[list[int]] = [[] for _ in cells]
            for j in train:
                best = min(
                    (d2_of(units[j], centroids[cell]), cell)
                    for cell in cells
                )
                members[best[1]].append(j)
            for cell in cells:
                if members[cell]:
                    m = len(members[cell])
                    # fixed-point mean (exact int sums — member order
                    # cannot matter)
                    centroids[cell] = [
                        r(float(sum(
                            scaled[j][p] for j in members[cell]
                        )) / (1e6 * m), 4)
                        for p in range(dim)
                    ]
        # --- final assignment + probes + search (ann_ivf_det_topk replica) ---
        cell_of = {}
        for j in range(n_vecs):
            cell_of[ids[j]] = min(
                (d2_of(units[j], centroids[cell]), cell) for cell in cells
            )[1]
        by_cell: dict[int, list[int]] = {}
        for j in range(n_vecs):
            by_cell.setdefault(cell_of[ids[j]], []).append(j)

        def cos_of(a, b):  # ordered folds: dot, |a|, |b| (the _cos replica)
            dot = 0.0
            for x, y in zip(a, b):
                dot = dot + x * y
            return r(dot / (sqrt(fold_sq(a)) * sqrt(fold_sq(b))), 4)

        idx = {ids[j]: j for j in range(n_vecs)}
        ivf_pairs = []
        for qid in sorted(i for i in ids if i < n_queries):
            qj = idx[qid]
            probed = sorted(
                cells, key=lambda cell: (d2_of(units[qj], centroids[cell]), cell)
            )[:n_probe]
            cand = {
                ids[j] for cell in probed for j in by_cell.get(cell, [])
            } - {qid}
            scored = sorted(
                ((cos_of(embs[qj], embs[idx[nid]]), nid) for nid in cand),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            for rank0, (cs, nid) in enumerate(scored):
                ivf_pairs.append((qid, nid, cs, rank0 + 1))
        # --- recall gate vs brute force (q_ann_ivf replica) ---
        bf = set()
        for qid in sorted(i for i in ids if i < n_queries):
            qj = idx[qid]
            scored = sorted(
                ((cos_of(embs[qj], embs[j]), ids[j])
                 for j in range(n_vecs) if ids[j] != qid),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            bf |= {(qid, nid) for _c, nid in scored}
        hits = sum(1 for qid, nid, _c, _r in ivf_pairs if (qid, nid) in bf)
        recall = r(hits / (n_queries * k), 4)
        rows = list(ivf_pairs)
        if recall >= ANN_RECALL_FLOOR:
            rows.append((-1, -1, recall, 0))
        for qid, nid, cs, rk in rows:
            cols["query_id"].append(qid)
            cols["neighbor_id"].append(nid)
            cols["cos"].append(cs)
            cols["rank"].append(rk)
            cols["n_vecs"].append(n_vecs)
            cols["fp_sum"].append(fp_sum)
            cols["fp_sum2"].append(fp_sum2)
    pq.write_table(
        pa.table({
            "query_id": pa.array(cols["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(cols["neighbor_id"], type=pa.int64()),
            "cos": pa.array(cols["cos"], type=pa.float64()),
            "rank": pa.array(cols["rank"], type=pa.int32()),
            "n_vecs": pa.array(cols["n_vecs"], type=pa.int64()),
            "fp_sum": pa.array(cols["fp_sum"], type=pa.float64()),
            "fp_sum2": pa.array(cols["fp_sum2"], type=pa.float64()),
        }),
        out,
    )
    return out


def q_ann_ivf(spark, sf, n_queries=10, k=5):
    """IVF (k-means cell) ANN with the same CORRECTNESS recall gate shape
    as q_ann_lsh: a (-1, -1, recall, 0) summary row exists only while
    recall@k vs brute force clears the floor.  Uses the DETERMINISTIC
    quantizer (similarity.ann_ivf_det_topk — md5-seeded init + rounded
    Lloyd's, engine-reproducible) so the driver can value-hash the result
    against the plain-Python replica (_ann_ivf_expected_path); the Spark-ML
    k-means|| variant stays in the library as similarity.ann_ivf_topk."""
    emb = _emb(spark, sf)
    # cached: feeds both the gate aggregate and the final union — without
    # it one action runs the broadcast search twice (n_queries × k rows).
    # Lifecycle is caller-owned (this returns a lazy plan): long-lived
    # sessions clear between entries — bench.run_queries clearCache()s
    ivf = similarity.ann_ivf_det_topk(emb, n_queries=n_queries, k=k).cache()
    bf = similarity.ann_bruteforce_topk(emb, n_queries=n_queries, k=k).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    gate = (
        ivf.join(bf, ["query_id", "neighbor_id"], "left")
        .groupBy()
        .agg(
            F.round(F.sum(F.coalesce("hit", F.lit(0))) / F.lit(n_queries * k), 4)
            .alias("recall")
        )
        .filter(F.col("recall") >= ANN_RECALL_FLOOR)
        .select(
            F.lit(-1).cast("long").alias("query_id"),
            F.lit(-1).cast("long").alias("neighbor_id"),
            F.col("recall").alias("cos"),
            F.lit(0).cast("int").alias("rank"),
        )
    )
    return ivf.unionByName(gate)


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational inventory
        "q_pricing_summary": q_pricing_summary,
        "q_top_revenue_orders": q_top_revenue_orders,
        "q_topk_per_key": q_topk_per_key,
        "q_politeness_pick": q_politeness_pick,
        "q_yield_rule": q_yield_rule,
        "q_seen_antijoin": q_seen_antijoin,
        "q_semijoin": q_semijoin,
        "q_distance_min": q_distance_min,
        "q_broadcast_star": q_broadcast_star,
        "q_host_queue_counts": q_host_queue_counts,
        "q_union_dedup": q_union_dedup,
        "q_running_min": q_running_min,
        "q_doc_len_buckets": q_doc_len_buckets,
        "q_date_format": q_date_format,
        "q_regexp_filter": q_regexp_filter,
        "q_events_tumbling": q_events_tumbling,
        "q_global_seq": q_global_seq,
        "q_queue_sweep": q_queue_sweep,
        "q_url_admission": q_url_admission,
        # training-data pipeline ops
        "dedup_exact": lambda s, sf: dedup_text.exact_dedup(_t(s, sf, "documents")),
        "dedup_minhash_lsh": lambda s, sf: dedup_text.minhash_lsh_pairs(
            _docs(s, sf)
        ),
        "dedup_simhash": lambda s, sf: dedup_text.simhash(_docs(s, sf)),
        "dedup_simhash_groups": lambda s, sf: dedup_text.simhash_dup_groups(
            _docs(s, sf)
        ),
        "dedup_onion": lambda s, sf: dedup_text.onion_dedup(_docs(s, sf)),
        "dedup_simhash64": lambda s, sf: dedup_text.simhash64(_docs(s, sf)),
        "dedup_simhash64_pairs": lambda s, sf: dedup_text.simhash64_dup_pairs(
            _docs(s, sf)
        ),
        # threshold 0.08 (not the production 0.5): the testdata corpus has
        # exactly ONE pair above 0.5 — a near-vacuous hash match (VERDICT
        # r5 #6); 0.08 puts 44 pairs (sf0.01) / 52 (sf0.001) under the
        # value-hash oracle so the whole gram/intersection/union pipeline
        # is actually exercised
        "dedup_ngram_jaccard": lambda s, sf: dedup_text.ngram_jaccard_pairs(
            _docs(s, sf), threshold=0.08
        ),
        # cluster canonicalisation over the LSH pair graph (round 6)
        "dedup_cc_clusters": lambda s, sf: dedup_text.cc_clusters(_docs(s, sf)),
        # Lee-et-al-style exact duplicate-span detection + removal (round 6)
        "dedup_dup_spans": lambda s, sf: dedup_text.dup_spans(_docs(s, sf)),
        "dedup_remove_spans": lambda s, sf: dedup_text.remove_dup_spans(
            _docs(s, sf)
        ),
        # benchmark n-gram decontamination (round 6)
        "decontaminate": lambda s, sf: curation.decontaminate(_docs(s, sf)),
        # per-language token-quota sampling (round 6; _docs per ADVICE r6 —
        # the scan+tokenize stage no longer runs as one task)
        "sample_lang_quota": lambda s, sf: curation.lang_quota_sample(
            _docs(s, sf)
        ),
        "dedup_embedding_cosine": lambda s, sf: similarity.cosine_pairs(
            _emb(s, sf), threshold=0.3
        ),
        "dedup_embedding_cosine_lsh": lambda s, sf: similarity.cosine_pairs_lsh(
            _emb(s, sf), threshold=0.3
        ),
        # semantic dedup clusters: cc over the cosine-LSH pair graph (round 6)
        "dedup_semantic_clusters": lambda s, sf: similarity.semantic_clusters(
            _emb(s, sf)
        ),
        "ann_bruteforce_topk": lambda s, sf: similarity.ann_bruteforce_topk(_emb(s, sf)),
        "text_token_stats": lambda s, sf: textstats.token_stats(_docs(s, sf)),
        "text_subword_stats": lambda s, sf: textstats.subword_token_stats(
            _docs(s, sf)
        ),
        "text_quality_scores": lambda s, sf: textstats.quality_scores(
            _docs(s, sf)
        ),
        "doc_fingerprints": lambda s, sf: dedup_text.fingerprints(
            _t(s, sf, "documents")
        ),
        # rows-only (non-SQL-expressible; correctness gated in tests/)
        "langid_trigram": q_langid_trigram,
        "ann_lsh_topk": q_ann_lsh,
        "ann_ivf_topk": q_ann_ivf,
        "crawl_rounds": q_crawl_rounds,
        "streaming_ingest": q_streaming_ingest,
        "crawl_extract": q_crawl_extract,
        "robots_filter": q_robots_filter,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_top_revenue_orders": """
            SELECT o_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """,
        "q_topk_per_key": """
            SELECT l_orderkey, l_linenumber, rn FROM (
              SELECT l_orderkey, l_linenumber,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
              FROM lineitem
            ) WHERE rn <= 2
        """,
        "q_politeness_pick": """
            SELECT user_id, tick, event_id FROM (
              SELECT user_id, date_trunc('hour', ts) AS tick, event_id,
                     row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                       ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "q_yield_rule": """
            SELECT user_id, n_downloaded, bytes_downloaded, bytes_cleaned,
                   (bytes_cleaned / bytes_downloaded) < 0.05 * (log10(n_downloaded) - 1)
                     AS is_bad
            FROM (
              SELECT user_id, count(*) AS n_downloaded,
                     round(sum(value), 4) AS bytes_downloaded,
                     round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4)
                       AS bytes_cleaned
              FROM events GROUP BY user_id
            ) WHERE n_downloaded >= 10
        """,
        "q_seen_antijoin": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "q_semijoin": """
            SELECT p_partkey, p_brand FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        """,
        "q_distance_min": """
            SELECT n_name, round(min(s_acctbal) + 1, 2) AS relaxed_min
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_broadcast_star": """
            SELECT r_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q_host_queue_counts": """
            SELECT user_id, count(*) AS n_queued FROM events
            GROUP BY user_id HAVING count(*) > 15
        """,
        "q_union_dedup": """
            SELECT DISTINCT custkey FROM (
              SELECT o_custkey AS custkey FROM orders
              UNION ALL SELECT c_custkey AS custkey FROM customer
            )
        """,
        "q_running_min": """
            SELECT user_id, event_id,
                   round(min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_min
            FROM events
        """,
        "q_doc_len_buckets": """
            SELECT CASE WHEN n_chars >= 1000 THEN '1k+'
                        WHEN n_chars >= 500 THEN '500-1k'
                        WHEN n_chars >= 100 THEN '100-500'
                        ELSE '0-100' END AS len_bucket,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "q_date_format": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
                   round(sum(value), 4) AS day_value
            FROM events GROUP BY 1
        """,
        "q_regexp_filter": """
            SELECT doc_id, lang FROM documents WHERE regexp_matches(text, 'join .*join')
        """,
        "q_events_tumbling": streamwin.WINDOWED_COUNTS_ORACLE,
        "q_global_seq": """
            SELECT l_orderkey, l_linenumber,
                   row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS seq
            FROM lineitem
        """,
        "q_queue_sweep": """
            WITH ranked AS (
              SELECT CAST(user_id AS VARCHAR) AS host,
                     '/' || CAST(event_id AS VARCHAR) AS path,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY length('/' || CAST(event_id AS VARCHAR)), event_id
                     ) AS prn
              FROM events
            )
            SELECT host, path,
                   CASE WHEN prn > 5 THEN 'pending'
                        WHEN prn <= 4 THEN 'queued'
                        ELSE 'waiting' END AS status,
                   CASE WHEN prn <= 5 THEN prn ELSE NULL END AS q_rank
            FROM ranked
        """,
        "q_url_admission": URL_ADMISSION_ORACLE,
        "dedup_exact": dedup_text.EXACT_DEDUP_ORACLE,
        "dedup_minhash_lsh": dedup_text.MINHASH_PAIRS_ORACLE,
        "dedup_cc_clusters": dedup_text.CC_CLUSTERS_ORACLE,
        "dedup_dup_spans": dedup_text.DUP_SPANS_ORACLE,
        "dedup_remove_spans": dedup_text.REMOVE_DUP_SPANS_ORACLE,
        "decontaminate": curation.DECONTAMINATE_ORACLE,
        "sample_lang_quota": curation.LANG_QUOTA_ORACLE,
        "dedup_simhash": dedup_text.SIMHASH_ORACLE,
        "dedup_simhash_groups": dedup_text.SIMHASH_GROUPS_ORACLE,
        "dedup_onion": dedup_text.ONION_ORACLE,
        "dedup_simhash64": dedup_text.SIMHASH64_ORACLE,
        "dedup_simhash64_pairs": dedup_text.SIMHASH64_PAIRS_ORACLE,
        "dedup_ngram_jaccard": dedup_text.ngram_jaccard_oracle(threshold=0.08),
        "dedup_embedding_cosine": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cos
            FROM embeddings a JOIN embeddings b ON a.label = b.label
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 4) >= 0.3
        """,
        "dedup_semantic_clusters": similarity.semantic_clusters_oracle(),
        "dedup_embedding_cosine_lsh": similarity.cosine_pairs_lsh_oracle(
            threshold=0.3
        ),
        "ann_bruteforce_topk": """
            SELECT query_id, neighbor_id, cos, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  c.embedding::DOUBLE[]), 4) AS cos,
                     row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                             c.embedding::DOUBLE[]), 4) DESC,
                                c.vec_id ASC) AS rank
              FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
              WHERE q.vec_id < 10
            ) WHERE rank <= 5
        """,
        "text_token_stats": textstats.TOKEN_STATS_ORACLE,
        "text_subword_stats": textstats.SUBWORD_STATS_ORACLE,
        "text_quality_scores": textstats.QUALITY_ORACLE,
        "doc_fingerprints": dedup_text.FINGERPRINT_ORACLE,
        # reference-differential oracles (VERDICT r3 task 3): the expected
        # parquets are generated by the REFERENCE's own robotparser /
        # trigrams code (see _robots_expected_path / _langid_expected_path)
        "robots_filter": f"""
            SELECT host, path, allowed
            FROM read_parquet('{_robots_expected_path()}')
        """,
        "langid_trigram": f"""
            SELECT d.doc_id, e.best_lang, e.lang_diff
            FROM documents d
            JOIN read_parquet('{_langid_expected_path()}') e
              ON md5(d.text) = e.text_md5
        """,
        # simulator-differential oracles (VERDICT r4 tasks 3+4): expected
        # tables generated by the pure-Python round model / pipeline kernel
        # at fixture time (_crawl_rounds_expected_path /
        # _crawl_extract_expected_path)
        "crawl_rounds": f"""
            SELECT round, fetch_seq, url
            FROM read_parquet('{_crawl_rounds_expected_path()}')
        """,
        "crawl_extract": f"""
            SELECT url, lang, txt_len, token_count, txt_hash
            FROM read_parquet('{_crawl_extract_expected_path()}')
        """,
        # streaming ingest ≡ the same extract expectation, deduped on
        # txt_hash and restricted to accepted (txt_len > 0) docs — the
        # projection is arrival-order-independent (q_streaming_ingest
        # docstring), so the value hash covers the full streaming path
        "streaming_ingest": f"""
            SELECT DISTINCT txt_hash, lang, token_count, txt_len
            FROM read_parquet('{_crawl_extract_expected_path()}')
            WHERE txt_len > 0
        """,
        # kernel-differential (same pattern as crawl_extract): expected
        # features computed by the real decoders row-by-row in plain
        # Python, pre-rounded with Spark's exact repr-HALF_UP semantic
        # (DuckDB's round() diverges on binary-tie values —
        # _multimodal_expected_path docstring)
        "multimodal_features": f"""
            SELECT media_id, kind, payload_bytes, dim, feat_sum
            FROM read_parquet('{_multimodal_expected_path()}')
        """,
        # independent full re-derivation of the deterministic multi-table
        # multiprobe LSH search + recall gate inside DuckDB itself
        "ann_lsh_topk": similarity.ann_lsh_topk_oracle(),
        # plain-Python replica of the deterministic IVF (md5-seeded init +
        # rounded Lloyd's); rows are selected by the live embeddings
        # view's content fingerprint since oracle_sql() has no sf
        # parameter (_ann_ivf_expected_path)
        "ann_ivf_topk": f"""
            SELECT query_id, neighbor_id, cos, rank
            FROM read_parquet('{_ann_ivf_expected_path()}')
            WHERE n_vecs = (SELECT count(*) FROM embeddings)
              AND abs(fp_sum - (SELECT round(sum(embedding[1]::DOUBLE), 3)
                                FROM embeddings)) < 1e-6
              AND abs(fp_sum2 - (SELECT round(
                                   sum(embedding[len(embedding)]::DOUBLE), 3)
                                 FROM embeddings)) < 1e-6
        """,
    }
