"""The crawl driver: a deterministic round loop over Spark state tables.

One round (SURVEY.md §3.1 "Spark rebuild lifecycle"):

  yield rule → select (scheduler_round) → mock fetch (join vs pages fixture;
  U11's network layer is out of sandbox scope, interface kept) → extract
  (mapInPandas) → dedup → counters → robots arrivals → frontier update →
  link admission → commit

State tables: domains, frontier (pending URLs), url_seen, seen_hashes.
Outputs: documents, duplicate_ids, fetch_log, metrics.

Every ``checkpoint_every`` rounds the state is committed to the
SnapshotCatalog (per-round lineage + metrics, north rule); ``resume()``
reopens the latest committed round and continues — the reference's three
ad-hoc restart mechanisms collapse into snapshot semantics (SURVEY §3.3).

Determinism: all orderings use the total key (bucket, host, scheme,
path-length, batch, seq); no ordering depends on partition count, so
local[8] and local[32] produce identical fetch logs (tested).

Iteration mechanics (local-mode pragmatics, production notes inline):
- mutable state (frontier, domains) is localCheckpoint'ed once per round to
  truncate lineage — in production these are Iceberg MERGE targets and the
  commit itself is the truncation
- append-only state (url_seen, seen_hashes) grows by pinned increments —
  in production: table appends
- per-round outputs (fetch log, documents + their ignored links, duplicate
  ids) are appended to the SnapshotCatalog as one version per round — the
  driver holds only row COUNTS; no full-text column is ever collected
  (asserted by tests/test_crawl_driver.py::test_no_fulltext_collection).
  Re-running a round after a crash overwrites the same version, so resume
  is idempotent.
- all global sequence numbers (fetch_seq, wpage_id, link seq) are assigned
  scale-safely: fetch_seq by ordered-limit-then-number over the bounded
  fetch batch, the rest by two-pass bucketed numbering
  (operators/partitioning.bucketed_seq) — no single-partition windows.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import config, schemas
from .functions import urlkit
from .operators.admission import admit_links
from .operators.dedup import dedup_batch
from .operators.domains import (
    apply_robots_arrivals,
    apply_yield_rule,
    merge_counters,
    parse_robots_redirect_udf,
    robots_allowed_udf,
)
from .operators.extract import extract_documents
from .operators.frontier_queue import sweep_frontier
from .operators.partitioning import bucketed_seq, repartition_frontier
from .operators.scheduler_round import select_urls
from .simulator import CrawlParams

REDIR_CHECK_SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("reason", T.StringType()),
    ]
)


@pandas_udf(REDIR_CHECK_SCHEMA)
def check_redirect_udf(src_host: pd.Series, redir_url: pd.Series) -> pd.DataFrame:
    """url_split_and_check_parts for redirect targets (process.py:455)."""
    rows = []
    for h, u in zip(src_host, redir_url):
        parts, reason = urlkit.url_split_and_check_parts(u, h)
        if parts:
            rows.append((parts[0], parts[1], parts[2], None))
        else:
            rows.append((None, None, None, reason))
    return pd.DataFrame(rows, columns=["scheme", "host", "path", "reason"])


DOMAINS_SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("distance", T.IntegerType()),
        T.StructField("bad", T.BooleanType()),
        T.StructField("robot_state", T.StringType()),
        T.StructField("robot_body", T.StringType()),
        T.StructField("count_downloaded", T.LongType()),
        T.StructField("count_cleaned", T.LongType()),
        T.StructField("bytes_downloaded", T.LongType()),
        T.StructField("bytes_cleaned", T.LongType()),
        # MULTILINGUAL (domain.py:43-61): primary-language clean bytes
        T.StructField("bytes_cleaned_primary", T.LongType()),
    ]
)
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("path_sanitised", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        # O2/O7 downloader-queue model (operators/frontier_queue.py)
        T.StructField("status", T.StringType()),
        T.StructField("q_round", T.IntegerType()),
        T.StructField("q_phase", T.IntegerType()),
        T.StructField("q_rank", T.IntegerType()),
    ]
)
URL_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path_sanitised", T.StringType()),
    ]
)
SEEN_HASH_SCHEMA = T.StructType(
    [T.StructField("hash", T.LongType()), T.StructField("wpage_id", T.LongType())]
)
RR_SCHEMA = T.StructType(
    [
        T.StructField("src_scheme", T.StringType()),
        T.StructField("src_host", T.StringType()),
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("redir_count", T.IntegerType()),
        T.StructField("seq", T.LongType()),
    ]
)
LINKS_SCHEMA = T.StructType(
    [
        T.StructField("src_scheme", T.StringType()),
        T.StructField("src_host", T.StringType()),
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

# scalar (non-array) EXTRACTED columns — the documents table
DOC_COLUMNS = [f.name for f in schemas.DOCUMENTS.fields] + [
    "scheme", "host", "path", "html_hash", "txt_hash",
]


class CrawlDriver:
    def __init__(
        self,
        spark: SparkSession,
        fixture_dir: str,
        workdir: str,
        params: CrawlParams | None = None,
        checkpoint_every: int = 10,
    ) -> None:
        from .tables import SnapshotCatalog

        self.spark = spark
        self.params = params or CrawlParams()
        # validate prefilter knobs up front (ADVICE r5): a bad combination
        # must fail at construction, not at the first round-end increment
        # after a round's work is already spent
        kind = getattr(self.params, "seen_prefilter", "bloom")
        if kind not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_prefilter must be 'bloom' or 'cuckoo', got {kind!r}")
        mode = getattr(self.params, "bloom_increment_mode", "vectorized")
        if mode not in ("vectorized", "distributed"):
            raise ValueError(
                f"bloom_increment_mode must be 'vectorized' or 'distributed', got {mode!r}"
            )
        self.catalog = SnapshotCatalog(workdir)
        self.checkpoint_every = checkpoint_every
        self.round_no = 0
        self.wpage_base = 0
        self.batches_emitted = 0  # O4 cold-start ramp position
        self.durable_every = 4    # frontier/domains durable-snapshot cadence
        # static fixture inputs (in production: Iceberg pages/robots/dns)
        self.pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet")).cache()
        self.robots = spark.read.parquet(os.path.join(fixture_dir, "robots.parquet")).cache()
        self.dns = spark.read.parquet(os.path.join(fixture_dir, "dns.parquet")).cache()
        self.redirects = spark.read.parquet(
            os.path.join(fixture_dir, "redirects.parquet")
        ).cache()
        self.seeds_path = os.path.join(fixture_dir, "seeds.txt")
        # static fast-path flags: when the web has no redirects / no
        # redirecting robots, the corresponding per-round plumbing is
        # skipped entirely (identical semantics, fewer jobs per round)
        self._has_redirects = self.redirects.limit(1).count() > 0
        self._has_redir_robots = (
            self.robots.filter(F.col("state") == "REDIR").limit(1).count() > 0
        )
        # mutable Spark state
        self.domains: DataFrame | None = None
        self.frontier: DataFrame | None = None
        self.url_seen: DataFrame | None = None
        # scale path: [bucketed base] + per-round delta legs (or None)
        self._seen_parts: list[DataFrame] | None = None
        # seen compaction cadence: every compact_every rounds the delta
        # legs are MERGED INTO the bucketed base in place (minor — cost ∝
        # delta); every seen_major_every-th compaction additionally
        # binpacks the buckets whose file count exceeds
        # seen_major_max_files back to one sorted file each (major,
        # per-bucket — cost ∝ dirty buckets, never the whole table).
        # Iceberg's minor/major rewrite split; see
        # urlseen.append_bucketed_seen / compact_dirty_buckets.
        self.compact_every = 8
        self.seen_major_every = 4
        self.seen_major_max_files = 4
        self._minor_compactions = 0
        # snapshot expiry at commit (Iceberg maintenance): keep the newest
        # N state-table snapshots; 0 disables.  Must stay ≥2 when enabled —
        # live DataFrames read from the last durable pin, which can be one
        # version behind the committing round (tables.expire_snapshots).
        # _pin_versions records, per state table, the version its live
        # DataFrame currently scans; expiry protects it unconditionally
        self.expire_keep = 2
        self._pin_versions: dict[str, int] = {}
        self._seen_table: str | None = None
        self._seen_n_buckets: int | None = None
        self.seen_txt: DataFrame | None = None
        self.seen_raw: DataFrame | None = None
        self.robot_redirects: DataFrame | None = None
        # driver-side bookkeeping is COUNTS ONLY — outputs live in the
        # catalog (one version per round; see module docstring)
        self.metrics: list[dict] = []

    # -- helpers -----------------------------------------------------------------
    def _empty(self, schema: T.StructType) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    @staticmethod
    def _concurrently(*thunks):
        """Run independent Spark actions from driver threads (standard
        concurrent-jobs pattern): small per-round jobs overlap instead of
        queueing serially, hiding stage-scheduling latency.  Results in
        thunk order."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
            futures = [ex.submit(t) for t in thunks]
            return [f.result() for f in futures]

    @staticmethod
    def _pin(df: DataFrame) -> DataFrame:
        """Materialise + truncate lineage (within-round subtrees).

        NB: localCheckpoint PRESERVES the origin plan's size statistics, so
        it must not be used for state that feeds next round's joins — join
        size estimates multiply, the carried sizeInBytes grows
        exponentially across rounds, and Catalyst's stats visitor ends up
        doing million-digit BigInteger math (observed as a planning stall
        around round 15).  Cross-round state goes through _pin_durable.
        """
        return df.localCheckpoint(eager=True)

    def _pin_durable(self, name: str, df: DataFrame) -> DataFrame:
        """Commit state to the catalog and read it back: truncates lineage
        AND resets statistics to the true on-disk size (the production
        equivalent — the Iceberg MERGE commit — does exactly this).
        Records the version the returned live plan scans so snapshot
        expiry never deletes it (commit() passes it as protect_from)."""
        self.catalog.write(name, df, version=self.round_no,
                           metrics={"round": self.round_no})
        self._pin_versions[name] = self.round_no
        return self.catalog.read(self.spark, name, version=self.round_no)

    # -- bootstrap ---------------------------------------------------------------
    def init_from_seeds(self) -> None:
        """Seed parsing per scheduler.py:661-714 (comments, bare hosts)."""
        seed_links = []
        with open(self.seeds_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if "://" not in line:
                    line = f"http://{line}"
                parts, _reason = urlkit.url_split_and_check_parts(line)
                if parts:
                    seed_links.append(parts)
        links = self.spark.createDataFrame(
            [(None, None, s, h, p, i) for i, (s, h, p) in enumerate(seed_links)],
            LINKS_SCHEMA,
        )
        self.domains = self._empty(DOMAINS_SCHEMA)
        self.url_seen = self._empty(URL_SEEN_SCHEMA)
        self.seen_txt = self._empty(SEEN_HASH_SCHEMA)
        self.seen_raw = self._empty(SEEN_HASH_SCHEMA)
        self.robot_redirects = self._empty(RR_SCHEMA)
        new_rows, new_seen, domains2 = admit_links(
            links, self.domains, self.url_seen, self.dns, round_no=0, params=self.params
        )
        self.frontier = self._pin_durable("frontier", new_rows)
        self.url_seen = self._pin_durable("url_seen", new_seen)
        self.domains = self._pin_durable("domains", domains2)
        self._init_bloom()
        self._compact_seen_parts()
        # the remaining state tables are empty at init — they stay
        # in-memory and hit the catalog at the first commit()

    def _prefilter_cls(self):
        from .operators.urlseen import BloomState, CuckooState

        kind = getattr(self.params, "seen_prefilter", "bloom")
        return CuckooState if kind == "cuckoo" else BloomState

    def _init_bloom(self) -> None:
        """Incremental Bloom/cuckoo over url_seen (derived state — REBUILT
        from the table; the slow path).  The family is
        params.seen_prefilter; both expose the same state API
        (from_url_seen / add_new_seen / over_capacity / broadcast_map).
        commit() also snapshots the blobs so resume() normally restores
        through _restore_or_init_bloom without scanning url_seen."""
        old = getattr(self, "_bloom", None)
        self._bloom = None
        if getattr(self.params, "use_bloom_prefilter", False):
            self._bloom = self._prefilter_cls().from_url_seen(self.url_seen)
            self._adopt_bloom_broadcast(old)
        elif old is not None and old._bc is not None:
            old._bc.unpersist(blocking=False)

    def _restore_or_init_bloom(self) -> None:
        """Resume fast path: restore the Bloom/cuckoo prefilter from the
        checkpoint's ``prefilter`` snapshot — O(filter size), NO scan of
        url_seen, which at 10^10 rows is the biggest table in the system.
        Falls back to the derived-state rebuild (_init_bloom) on any kind /
        blob-format / missing-snapshot mismatch, and on capacity overflow
        (the restored filter would degrade, so rebuild at the right size)."""
        if not getattr(self.params, "use_bloom_prefilter", False):
            self._init_bloom()
            return
        from .operators.urlseen import _BLOB_FORMAT

        kind = getattr(self.params, "seen_prefilter", "bloom")
        meta = None
        if self.catalog.exists("prefilter"):
            meta = next(
                (v for v in self.catalog.metrics("prefilter")
                 if v["version"] == self.round_no),
                None,
            )
        if (
            meta is None
            or meta["metrics"].get("kind") != kind
            or meta["metrics"].get("format") != _BLOB_FORMAT
        ):
            self._init_bloom()
            return
        try:
            rows = self.catalog.read(
                self.spark, "prefilter", version=self.round_no
            ).collect()
            state = self._prefilter_cls().from_snapshot(
                rows, n_buckets=int(meta["metrics"]["n_buckets"])
            )
        except (ValueError, FileNotFoundError):
            self._init_bloom()  # stale/corrupt blob → rebuild from the table
            return
        if state.over_capacity():
            self._init_bloom()
            return
        old = getattr(self, "_bloom", None)
        self._bloom = state
        self._adopt_bloom_broadcast(old)

    def _adopt_bloom_broadcast(self, old) -> None:
        """Hand a replaced BloomState's live executor broadcast to the new
        state so broadcast_map's replace-and-unpersist path retires it at
        the next call — dropping the old state on the floor would leave the
        stale full-bloom copy pinned until GC (ADVICE r4)."""
        if old is not None and old is not self._bloom and old._bc is not None:
            self._bloom._bc = old._bc
            self._bloom._dirty = True

    def _compact_seen_parts(self) -> None:
        """Scale path (use_bucketed_seen), MAJOR compaction: rewrite the
        full seen set as a bucketed table on the seen key — the admission
        anti-join then needs an Exchange only on the (small) candidates
        side; the base scan is read bucket-for-bucket in place
        (urlseen.write_bucketed_seen), one sorted file per bucket.  Runs at
        init/resume only (the base must exist); in-crawl maintenance is
        _merge_seen_deltas (minor, cost ∝ delta) and _major_compact_seen
        (per-bucket binpack, cost ∝ dirty buckets).  Between compactions,
        each round's new-seen leg rides the parts list and AQE broadcasts
        it in the chained anti-join."""
        self._seen_parts = None
        if not getattr(self.params, "use_bucketed_seen", False):
            return
        import hashlib

        from .operators.urlseen import write_bucketed_seen

        root = self.catalog.root
        table = "url_seen_bkt_" + hashlib.md5(root.encode()).hexdigest()[:10]
        location = os.path.join(root, "url_seen_bucketed")
        n_buckets = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        base = write_bucketed_seen(self.url_seen, location, table, n_buckets)
        self._seen_parts = [base]
        self._seen_table = table
        self._seen_location = location
        self._seen_n_buckets = n_buckets
        self._minor_compactions = 0

    def _merge_seen_deltas(self) -> None:
        """MINOR compaction: append the accumulated delta legs into the
        bucketed base in place — the 10^10-row base files are untouched,
        the wall cost is proportional to the delta (BENCH_r05
        seen_compaction row).  Equivalent row set to the chained parts
        (tested); the refreshed table becomes the single part again."""
        if self._seen_parts is None or len(self._seen_parts) <= 1:
            return
        from functools import reduce

        from .operators.urlseen import append_bucketed_seen

        delta = reduce(DataFrame.unionByName, self._seen_parts[1:])
        base = append_bucketed_seen(delta, self._seen_table, self._seen_n_buckets)
        self._seen_parts = [base]

    def _major_compact_seen(self) -> None:
        """MAJOR compaction, per-bucket binpack (round 6 — was a full-table
        rewrite): fold outstanding delta legs in first (minor append), then
        merge the small delta files of buckets whose file count exceeds
        seen_major_max_files (urlseen.compact_dirty_buckets).  Each
        bucket's dominant base file is not even read unless the deltas
        outgrew it, so major wall cost is ∝ accumulated-delta bytes — at
        10^10 rows the base files are the table and never rewrite."""
        from .operators.urlseen import compact_dirty_buckets

        self._merge_seen_deltas()
        base, _dirty = compact_dirty_buckets(
            self.spark, self._seen_table, self._seen_location,
            self._seen_n_buckets, max_files=self.seen_major_max_files,
        )
        self._seen_parts = [base]

    # -- one round ------------------------------------------------------------------
    def run_round(self) -> int:
        self.round_no += 1
        r = self.round_no
        domains = apply_yield_rule(self.domains, self.params)
        # O7 rotation + O2 sweep: move waiting→queue and pending→queue
        # (per-host keyed windows; the sweep result is this round's frontier,
        # pinned once — it feeds both selection and the end-of-round update)
        self.frontier = self._pin(sweep_frontier(self.frontier, domains, r, self.params))
        selected = select_urls(
            self.frontier, domains, self.params,
            robot_redirects=self.robot_redirects if self._has_redir_robots else None,
        )
        selected.persist()
        n_selected = selected.count()
        if n_selected == 0:
            selected.unpersist()
            self.domains = self._pin(domains)
            self.metrics.append({"round": r, "selected": 0, "processed": 0})
            return 0
        # O4 cold-start gate (scheduler.py:134-140, 177-188; mirrors
        # simulator.run_round): below the current minimum batch size the
        # scheduler keeps accumulating — in the round model that is a stall
        if n_selected < self.params.batch_min(self.batches_emitted):
            selected.unpersist()
            self.domains = self._pin(domains)
            self.metrics.append(
                {"round": r, "selected": 0, "processed": 0, "gated": n_selected}
            )
            return 0
        self.batches_emitted += 1
        # --- mock fetch (U11): join selected vs fixture web ---
        page_sel = selected.filter(~F.col("is_robot") & ~F.col("is_rr"))
        if self._has_redirects:
            redirect_hits = page_sel.join(
                self.redirects.withColumnRenamed("url", "r_url"),
                page_sel.url == F.col("r_url"),
            )
            not_redirected = page_sel.join(
                self.redirects.withColumnRenamed("url", "r_url"),
                page_sel.url == F.col("r_url"),
                "left_anti",
            )
        else:  # fast path: no redirects in this web
            redirect_hits = None
            not_redirected = page_sel
        page_hits = (
            not_redirected
            .join(self.pages.select("url", "warc_ts", "html", "http_header"), "url")
            .filter(
                (F.length("html") >= 200) & (F.length("html") <= 10 * 1024 * 1024)
            )
        )
        # wpage_id: fetch-order rank via bucketed two-pass numbering (the
        # driver sees only per-bucket counts, never rows)
        page_hits = bucketed_seq(
            page_hits, "fetch_seq", [F.col("fetch_seq")], "wpage_id",
            start=self.wpage_base,
        ).persist()
        docs = extract_documents(page_hits).join(
            page_hits.select("wpage_id", "fetch_seq"), "wpage_id"
        )
        docs.persist()
        # two independent actions in parallel: the fetch-log append (S-output,
        # never held driver-side) and the extract materialisation
        _, n_processed = self._concurrently(
            lambda: self.catalog.write(
                "fetch_log",
                selected.select(
                    F.lit(r).cast("long").alias("round"), F.col("fetch_seq"), "url"
                ),
                version=r, metrics={"round": r},
            ),
            docs.count,
        )
        page_hits.unpersist()
        self.wpage_base += n_processed
        if n_processed:
            # --- dedup ---
            dup_ids, new_txt, new_raw = dedup_batch(docs, self.seen_txt, self.seen_raw)
            # S6/S7/S11 outputs in ONE write: documents carry their
            # ignored-link arrays and an is_duplicate flag (the duplicates
            # accessor filters it) — the driver never holds rows
            docs_out = docs.select(*DOC_COLUMNS, "ignored_links").join(
                dup_ids.withColumn("is_duplicate", F.lit(True)), "wpage_id", "left"
            ).withColumn("is_duplicate", F.coalesce("is_duplicate", F.lit(False)))
            # the documents append and the seen-hash increment pin are
            # independent actions — concurrent jobs (both read the docs cache)
            _, inc = self._concurrently(
                lambda: self.catalog.write(
                    "documents", docs_out, version=r, metrics={"round": r}
                ),
                lambda: self._pin(
                    new_txt.withColumn("_set", F.lit("t")).unionByName(
                        new_raw.withColumn("_set", F.lit("r"))
                    )
                ),
            )
            self.seen_txt = self.seen_txt.unionByName(
                inc.filter(F.col("_set") == "t").drop("_set")
            )
            self.seen_raw = self.seen_raw.unionByName(
                inc.filter(F.col("_set") == "r").drop("_set")
            )
        # --- counters + robots answers (own fetches and redirect-target
        # fetches; the latter apply to their SOURCE domain) ---
        domains = merge_counters(domains, docs, self.params)
        own_robot_fetches = selected.filter(F.col("is_robot") & ~F.col("is_rr"))
        if not self._has_redir_robots:
            # fast path: no REDIR robots exist — answers are final as-is
            final_answers = own_robot_fetches.select("scheme", "host").join(
                self.robots, ["scheme", "host"], "left"
            ).select("scheme", "host", "state", "body")
            domains = self._pin(apply_robots_arrivals(domains, final_answers))
            return self._finish_round(
                r, domains, selected, page_sel, docs, redirect_hits,
                final_answers, n_selected, n_processed,
            )
        rr_fetches = selected.filter(F.col("is_rr"))
        # each answer row keeps the fetch_seq of the fetch that produced it —
        # the simulator appends redirect follow-ups in fetch-processing order,
        # so fetch_seq IS the total order for new rr seq assignment
        answers = (
            own_robot_fetches.select(
                "scheme", "host", "fetch_seq",
                F.col("scheme").alias("dom_scheme"), F.col("host").alias("dom_host"),
                "redir_count",
            )
            .unionByName(
                rr_fetches.select(
                    "scheme", "host", "fetch_seq",
                    F.col("src_scheme").alias("dom_scheme"),
                    F.col("src_host").alias("dom_host"),
                    "redir_count",
                )
            )
            .join(self.robots, ["scheme", "host"], "left")
        )
        # REDIR answers (crawl.py:394-420): follow up to MAX_ROBOT_REDIRECTS
        is_redir = F.col("state") == "REDIR"
        over_cap = is_redir & (F.col("redir_count") >= config.MAX_ROBOT_REDIRECTS)
        follow = answers.filter(is_redir & ~over_cap).withColumn(
            "tgt", parse_robots_redirect_udf(F.col("body"))
        ).join(
            F.broadcast(
                self.dns.select(
                    F.col("scheme").alias("t_scheme"), F.col("host").alias("t_host"),
                    F.col("ip").alias("t_ip"),
                )
            ),
            (F.col("tgt.scheme") == F.col("t_scheme"))
            & (F.col("tgt.host") == F.col("t_host")),
            "left",
        ).withColumn(
            "t_ip",
            F.when(F.col("t_ip") == "NO_HOST", F.lit(None)).otherwise(F.col("t_ip")),
        )
        follow.persist()
        rr_ok = follow.filter(F.col("tgt.scheme").isNotNull() & F.col("t_ip").isNotNull())
        # new rr seq: bucketed two-pass numbering by the triggering fetch_seq
        # (unique per answer) — no single-partition window
        rr_ok = bucketed_seq(
            rr_ok, "fetch_seq", [F.col("fetch_seq")], "rr_rank", start=1
        )
        new_rr = rr_ok.select(
            F.col("dom_scheme").alias("src_scheme"),
            F.col("dom_host").alias("src_host"),
            F.col("tgt.scheme").alias("scheme"),
            F.col("tgt.host").alias("host"),
            F.col("tgt.path").alias("path"),
            F.col("t_ip").alias("ip"),
            (F.col("redir_count") + 1).cast("int").alias("redir_count"),
            (F.lit(r * 1_000_000_000 + 600_000_000) + F.col("rr_rank")).alias("seq"),
        )
        rr_failed = follow.filter(
            F.col("tgt.scheme").isNull() | F.col("t_ip").isNull()
        ).select(
            F.col("dom_scheme").alias("scheme"), F.col("dom_host").alias("host"),
            F.lit("FAIL").alias("state"), F.lit(None).cast("string").alias("body"),
        )
        final_answers = (
            answers.filter(~is_redir)
            .select(
                F.col("dom_scheme").alias("scheme"), F.col("dom_host").alias("host"),
                "state", "body",
            )
            .unionByName(
                answers.filter(over_cap).select(
                    F.col("dom_scheme").alias("scheme"),
                    F.col("dom_host").alias("host"),
                    F.lit("FAIL").alias("state"),
                    F.lit(None).cast("string").alias("body"),
                )
            )
            .unionByName(rr_failed)
            .unionByName(
                rr_ok.select(
                    F.col("dom_scheme").alias("scheme"),
                    F.col("dom_host").alias("host"),
                    F.lit("INIT").alias("state"),
                    F.lit(None).cast("string").alias("body"),
                )
            )
        )
        domains = self._pin(apply_robots_arrivals(domains, final_answers))
        # robot-redirect queue: drop fetched entries, add follow-ups
        self.robot_redirects = self._pin_durable(
            "robot_redirects",
            self.robot_redirects.join(
                rr_fetches.select(F.col("seq").alias("f_seq")),
                self.robot_redirects.seq == F.col("f_seq"),
                "left_anti",
            ).unionByName(new_rr),
        )
        follow.unpersist()
        return self._finish_round(
            r, domains, selected, page_sel, docs, redirect_hits,
            final_answers, n_selected, n_processed,
        )

    def _finish_round(
        self, r, domains, selected, page_sel, docs, redirect_hits,
        final_answers, n_selected, n_processed,
    ) -> int:
        """Frontier update + link admission + bookkeeping (shared tail)."""
        # --- frontier: drop fetched; filter newly-ready hosts by robots ---
        fetched_keys = page_sel.select("scheme", "host", "path", "batch_id", "seq")
        frontier = self.frontier.join(
            fetched_keys, ["scheme", "host", "path", "batch_id", "seq"], "left_anti"
        )
        newly_ready = final_answers.select("scheme", "host").join(
            domains.filter(F.col("robot_state") == "ready").select(
                "scheme", "host", "robot_body"
            ),
            ["scheme", "host"],
        )
        # robots-filter ONLY the rows of newly-ready hosts: a when()-guarded
        # pandas UDF would still round-trip the ENTIRE frontier through
        # Python every round (vectorised UDFs don't short-circuit) — the
        # split join keeps the Python pass proportional to the hosts whose
        # robots just arrived.  Arrow ships the robots body once per ROW
        # here; that is one body-copy per frontier row per host LIFETIME
        # (only the arrival round), parse itself is executor-cached
        # (_RULES_CACHE).  If a pathological host held 10^5+ pending rows at
        # robots arrival, the array-agg form (collect paths per host, one
        # body per group, explode allowed) would cap the transfer — not
        # worth the per-host memory risk at current scales.
        untouched = frontier.join(newly_ready, ["scheme", "host"], "left_anti")
        checked = (
            frontier.join(newly_ready, ["scheme", "host"])
            .filter(robots_allowed_udf(F.col("robot_body"), F.col("path")))
            .drop("robot_body")
        )
        frontier = untouched.unionByName(checked)
        # --- link admission ---
        doc_links = (
            docs.filter((F.col("txt_len") > 0) & (F.size("links") > 0))
            .select(
                F.col("scheme").alias("src_scheme"),
                F.col("host").alias("src_host"),
                "fetch_seq",
                F.posexplode("links").alias("pos", "link"),
            )
            .select(
                "src_scheme", "src_host", "fetch_seq", "pos",
                F.col("link.scheme").alias("scheme"),
                F.col("link.host").alias("host"),
                F.col("link.path").alias("path"),
            )
        )
        links = doc_links
        if redirect_hits is not None:
            redir_links = (
                redirect_hits.select(
                    F.col("scheme").alias("src_scheme"),
                    F.col("host").alias("src_host"),
                    "fetch_seq",
                    F.lit(-1).alias("pos"),
                    check_redirect_udf(F.col("host"), F.col("location")).alias("chk"),
                )
                .select(
                    "src_scheme", "src_host", "fetch_seq", "pos",
                    F.col("chk.scheme").alias("scheme"),
                    F.col("chk.host").alias("host"),
                    F.col("chk.path").alias("path"),
                )
                .filter(F.col("scheme").isNotNull())
            )
            links = links.unionByName(redir_links)
        # link seq: bucketed two-pass numbering over (fetch_seq, pos) —
        # all links of one page share a bucket, so buckets are contiguous
        # ranges of the total order; no single-partition window
        links = bucketed_seq(
            links, "fetch_seq", [F.col("fetch_seq"), F.col("pos")], "link_rank",
        ).withColumn(
            "seq", F.lit(r * 1_000_000_000) + F.col("link_rank")
        ).drop("fetch_seq", "pos", "link_rank")
        # pin: the links subtree is referenced many times inside admit_links
        # (distance, new-domain, seen and robots joins) — without truncation
        # the analysed plan replicates the whole extract stage per reference
        links = self._pin(links)
        new_rows, new_seen, domains2 = admit_links(
            links, domains, self.url_seen, self.dns, round_no=r,
            params=self.params,
            url_seen_parts=self._seen_parts,
            bloom_map_bc=(
                self._bloom.broadcast_map(self.spark.sparkContext)
                if self._bloom
                else None
            ),
        )
        # F13 dead-host purge: drop queued rows of bad domains (GC — they are
        # never selected; purging bounds frontier growth at scale)
        frontier = frontier.join(
            domains.filter(F.col("bad")).select("scheme", "host"),
            ["scheme", "host"],
            "left_anti",
        )
        # hot-host salting (north rule): the committed frontier layout
        # spreads any host above the threshold across salt shards so no
        # partition carries a whole hot domain; cold webs pay only a
        # broadcast of the (usually empty) salt-factor relation — same plan,
        # no extra job (operators/partitioning.py)
        n_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        new_frontier = repartition_frontier(
            frontier.unionByName(new_rows), n_partitions=n_parts
        )
        # durable snapshot every durable_every rounds (plus at every
        # commit): in between, localCheckpoint truncates lineage; origin
        # statistics multiply only durable_every rounds deep, which stays
        # bounded (unbounded growth was the round-1 stats bug).
        # The three state materialisations are independent — run them as
        # concurrent Spark jobs (driver threads)
        if r % self.durable_every == 0:
            frontier_pinned, domains_pinned, seen_pinned = self._concurrently(
                lambda: self._pin_durable("frontier", new_frontier),
                lambda: self._pin_durable("domains", domains2),
                lambda: self._pin(new_seen),
            )
        else:
            frontier_pinned, domains_pinned, seen_pinned = self._concurrently(
                lambda: self._pin(new_frontier),
                lambda: self._pin(domains2),
                lambda: self._pin(new_seen),
            )
        self.frontier = frontier_pinned
        self.domains = domains_pinned
        self.url_seen = self.url_seen.unionByName(seen_pinned)
        if self._seen_parts is not None:
            self._seen_parts.append(seen_pinned)
        if self._bloom is not None:
            # incremental maintenance: only this round's new keys are
            # collected (bucket + two int64 hashes per key); a bucket past
            # its sizing triggers a distributed rebuild from the table
            self._bloom.add_new_seen(
                seen_pinned,
                mode=getattr(self.params, "bloom_increment_mode", "vectorized"),
            )
            if self._bloom.over_capacity():
                old = self._bloom
                self._bloom = self._prefilter_cls().from_url_seen(self.url_seen)
                self._adopt_bloom_broadcast(old)
        docs.unpersist()
        selected.unpersist()
        # compact the append-only union chains periodically: beyond ~10 legs
        # the Catalyst analysis of the admission joins dominates the round
        # (observed: planning stall around round 40 without this)
        if r % self.compact_every == 0:
            self.url_seen, self.seen_txt, self.seen_raw = self._concurrently(
                lambda: self._pin_durable("url_seen", self.url_seen),
                lambda: self._pin_durable("seen_txt", self.seen_txt),
                lambda: self._pin_durable("seen_raw", self.seen_raw),
            )
            if self._seen_parts is not None:
                self._minor_compactions += 1
                if self._minor_compactions % self.seen_major_every == 0:
                    self._major_compact_seen()  # major: binpack dirty buckets
                else:
                    self._merge_seen_deltas()   # minor: delta-only append
        self.metrics.append({"round": r, "selected": n_selected, "processed": n_processed})
        if self.checkpoint_every and r % self.checkpoint_every == 0:
            self.commit()
        return n_selected

    # -- output accessors (catalog-backed; the driver never holds rows) -----------
    OUTPUT_TABLES = ("fetch_log", "documents")

    def _read_output(self, name: str, schema) -> DataFrame:
        try:
            return self.catalog.read_all(self.spark, name)
        except FileNotFoundError:
            return self._empty(schema) if not isinstance(schema, str) else (
                self.spark.createDataFrame([], schema)
            )

    @property
    def fetch_log(self) -> DataFrame:
        return self._read_output("fetch_log", "round long, fetch_seq long, url string")

    @property
    def duplicates(self) -> DataFrame:
        """S11: duplicate wpage ids — the is_duplicate flag on documents.

        Pruned at the scan (VERDICT r2 #9): the explicit 2-column select
        before the filter keeps the parquet ReadSchema to
        (wpage_id, is_duplicate) with the flag as a pushed filter — a
        10^5-round catalog never reads document text to list duplicate ids
        (asserted by TestAccessorPlanPruning)."""
        try:
            docs = self.catalog.read_all(self.spark, "documents")
        except FileNotFoundError:
            return self.spark.createDataFrame([], "wpage_id long")
        return (
            docs.select("wpage_id", "is_duplicate")
            .filter(F.col("is_duplicate"))
            .select("wpage_id")
        )

    @property
    def ignored(self) -> DataFrame:
        """S7: per-document ignored-link arrays, exploded at read time —
        the scan reads only (scheme, host, ignored_links), never text."""
        schema = "src_scheme string, src_host string, reason string, url string"
        try:
            docs = self.catalog.read_all(self.spark, "documents")
        except FileNotFoundError:
            return self.spark.createDataFrame([], schema)
        return docs.select("scheme", "host", "ignored_links").select(
            F.col("scheme").alias("src_scheme"),
            F.col("host").alias("src_host"),
            F.explode("ignored_links").alias("ig"),
        ).select(
            "src_scheme", "src_host",
            F.col("ig.reason").alias("reason"), F.col("ig.url").alias("url"),
        )

    @property
    def documents(self) -> DataFrame:
        schema = T.StructType(
            [f for f in schemas.EXTRACTED.fields if f.name in DOC_COLUMNS]
        )
        try:
            return self.catalog.read_all(self.spark, "documents").select(
                *[f.name for f in schema.fields]
            )
        except FileNotFoundError:
            return self._empty(schema)

    # -- checkpoint / resume -----------------------------------------------------
    STATE_TABLES = ("domains", "frontier", "url_seen", "seen_txt", "seen_raw",
                    "robot_redirects")

    def commit(self) -> None:
        """Commit a snapshot of all state at the current round.

        frontier/domains/robot_redirects are already committed per round by
        _pin_durable; the append-only sets are committed here (and at their
        periodic compaction).  Per-round outputs are already in the catalog
        (one version per round) — nothing to copy."""
        for name in self.STATE_TABLES:
            df = getattr(self, name)
            # a table whose latest committed version IS this round was just
            # written (per-round _pin_durable or the periodic compaction) and
            # the in-memory df reads from that snapshot — rewriting it would
            # overwrite the parquet files underneath their own scan
            if self.catalog.latest_version(name) != self.round_no:
                self.catalog.write(
                    name, df, version=self.round_no,
                    metrics={"round": self.round_no},
                )
        if getattr(self, "_bloom", None) is not None:
            # prefilter snapshot (O(filter size)): lets resume() restore the
            # Bloom/cuckoo without rescanning url_seen.  Derived state — a
            # kind/format/capacity mismatch at restore falls back to rebuild
            from .operators.urlseen import _BLOB_FORMAT, BLOOM_SCHEMA

            self.catalog.write(
                "prefilter",
                self.spark.createDataFrame(
                    self._bloom.snapshot_rows(), BLOOM_SCHEMA
                ),
                version=self.round_no,
                metrics={
                    "round": self.round_no,
                    "kind": getattr(self.params, "seen_prefilter", "bloom"),
                    "n_buckets": self._bloom.n_buckets,
                    "format": _BLOB_FORMAT,
                },
            )
        if self.expire_keep:
            # state snapshots older than the last expire_keep are
            # unreachable by resume (which opens the newest) — reclaim
            # them, EXCEPT any version a live DataFrame still scans: a
            # table durable-pinned less often than commit() runs (url_seen
            # on compact_every vs checkpoint_every) would otherwise lose
            # the files under its own plan after two commits between pins
            # and crash the next round.  protect = the live plan's pin
            # version.  Output tables are corpus history, never expired
            for name in self.STATE_TABLES:
                self.catalog.expire_snapshots(
                    name, keep_last=self.expire_keep,
                    protect=self._pin_versions.get(name),
                )
            if self.catalog.exists("prefilter"):
                # blobs are collected eagerly at restore — no live lazy
                # plan to protect
                self.catalog.expire_snapshots(
                    "prefilter", keep_last=self.expire_keep
                )
        meta = {
            "round": self.round_no,
            "wpage_base": self.wpage_base,
            "batches_emitted": self.batches_emitted,
            "params": asdict(self.params),
            "metrics": self.metrics,
        }
        with open(os.path.join(self.catalog.root, "driver_meta.json"), "w") as f:
            json.dump(meta, f)

    def resume(self) -> None:
        with open(os.path.join(self.catalog.root, "driver_meta.json")) as f:
            meta = json.load(f)
        self.round_no = meta["round"]
        self.wpage_base = meta["wpage_base"]
        self.batches_emitted = meta.get("batches_emitted", 0)
        self.metrics = meta["metrics"]
        for name in self.STATE_TABLES:
            setattr(self, name, self.catalog.read(self.spark, name, version=self.round_no))
            self._pin_versions[name] = self.round_no
        self._restore_or_init_bloom()
        self._compact_seen_parts()
        # outputs appended by rounds AFTER the resumed snapshot belong to the
        # crashed run — drop their manifest entries (the re-run overwrites
        # the same versions, so readers never see torn/stale rounds)
        for name in self.OUTPUT_TABLES:
            self.catalog.truncate_after(name, self.round_no)

    def run(self, max_rounds: int | None = None) -> None:
        if self.domains is None:
            self.init_from_seeds()
        limit = max_rounds if max_rounds is not None else self.params.max_rounds
        start = self.round_no
        while self.round_no - start < limit:
            if self.run_round() == 0:
                break
        self.commit()


def main() -> None:
    """CLI: run a crawl over the built-in fixture web (or a fixture dir).

    Example: python -m macocu_crawler_spark.crawl_driver --rounds 5
    In production the same loop is submitted via spark-submit --py-files
    with the Iceberg catalog configured in place of the fixture dir.
    """
    import argparse
    import tempfile

    from .fixtures import write_fixtures
    from .session import get_spark

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--workdir", default=None, help="snapshot catalog dir")
    parser.add_argument("--fixture-dir", default=None,
                        help="pages/robots/dns parquet dir (default: generate)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--scale", type=int, default=1)
    parser.add_argument("--master", default=None)
    parser.add_argument("--use-bloom", action="store_true",
                        help="route URL-seen through the partitioned Bloom "
                             "pre-filter (exact anti-join stays authoritative)")
    parser.add_argument("--bloom-increment", default="vectorized",
                        choices=["vectorized", "distributed"],
                        help="per-round Bloom maintenance mode")
    parser.add_argument("--bucketed-seen", action="store_true",
                        help="store the compacted URL-seen set as a bucketed "
                             "table so the exact anti-join never reshuffles "
                             "the seen side")
    parser.add_argument("--seen-prefilter", default="bloom",
                        choices=["bloom", "cuckoo"],
                        help="prefilter family --use-bloom enables: bloom "
                             "(OR-mergeable, 12 bits/key) or cuckoo "
                             "(~25x lower FP rate, deletable)")
    args = parser.parse_args()
    fixture_dir = args.fixture_dir
    if fixture_dir is None:
        fixture_dir = tempfile.mkdtemp(prefix="macocu-fixtures-")
        write_fixtures(fixture_dir, scale=args.scale)
    workdir = args.workdir or tempfile.mkdtemp(prefix="macocu-crawl-")
    spark = get_spark(app_name="macocu-crawl", master=args.master)
    params = None
    if args.use_bloom or args.bucketed_seen:
        from .simulator import CrawlParams

        params = CrawlParams(
            use_bloom_prefilter=args.use_bloom,
            bloom_increment_mode=args.bloom_increment,
            use_bucketed_seen=args.bucketed_seen,
            seen_prefilter=args.seen_prefilter,
        )
    driver = CrawlDriver(spark, fixture_dir, workdir, params=params)
    if args.resume:
        driver.resume()
    driver.run(max_rounds=args.rounds)
    print(f"workdir: {workdir}")
    for m in driver.metrics[-args.rounds:]:
        print(f"round {m['round']}: selected={m['selected']} processed={m['processed']}")
    total = sum(m["selected"] for m in driver.metrics)
    print(f"total fetches: {total}; documents: {driver.documents.count()}; "
          f"url_seen: {driver.url_seen.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
