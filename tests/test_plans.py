"""Physical-plan audits: the optimizations the 100 TB story depends on must
actually appear in the executed plans (SURVEY.md §4)."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR


from macocu_crawler_spark.plans.audit import (
    count_exchanges,
    plan_string,
    pushed_filters,
    read_schemas,
    uses_broadcast_join,
)


def _plan(df) -> str:
    return plan_string(df)


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    # other modules cache these tables; a cached relation replaces the file
    # scan and hides pushdown/pruning from the plan
    spark.catalog.clearCache()
    yield


class TestPushdownAndPruning:
    def test_filter_pushdown_reaches_parquet_scan(self, spark):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        q = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
        pushed = pushed_filters(q)
        assert any("l_orderkey" in p for p in pushed), pushed

    def test_column_pruning_reaches_scan(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        q = docs.select("doc_id")
        schemas = read_schemas(q)
        assert schemas and all("text" not in rs for rs in schemas), schemas

    def test_extract_input_pruned_to_needed_columns(self, spark, fixture_dir):
        """The mapInPandas extract stage must not drag unrelated columns
        (e.g. the oracle text/lang) through Arrow."""
        from macocu_crawler_spark.operators.extract import extract_documents

        pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").withColumn(
            "wpage_id", F.monotonically_increasing_id()
        )
        schemas = read_schemas(extract_documents(pages))
        assert schemas and all(
            "text" not in rs and "lang" not in rs for rs in schemas), schemas

    def test_broadcast_join_used_for_dims(self, spark):
        import __spark_entry__ as em

        assert uses_broadcast_join(em.queries()["q_broadcast_star"](spark, SF_DIR))

    def test_whole_stage_codegen_and_partial_agg(self, spark):
        import __spark_entry__ as em

        df = em.queries()["q_pricing_summary"](spark, SF_DIR)
        plan = _plan(df)
        assert "partial_sum" in plan  # map-side combine before the shuffle
        df.collect()  # AQE finalises the plan only on execution
        final = _plan(df)
        # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
        assert "isFinalPlan=true" in final and "*(" in final, final

    def test_dns_join_broadcast_in_admission(self, spark):
        from macocu_crawler_spark.operators.admission import admit_links
        from macocu_crawler_spark.simulator import CrawlParams

        links = spark.createDataFrame(
            [(None, None, "http", "x.no", "/a", 1)],
            "src_scheme string, src_host string, scheme string, host string,"
            " path string, seq long",
        )
        empty_domains = spark.createDataFrame(
            [], "scheme string, host string, ip string, distance int, bad boolean,"
            " robot_state string, robot_body string, count_downloaded long,"
            " count_cleaned long, bytes_downloaded long, bytes_cleaned long,"
            " bytes_cleaned_primary long")
        empty_seen = spark.createDataFrame(
            [], "scheme string, host string, path_sanitised string")
        dns = spark.createDataFrame([("http", "x.no", "1.1.1.1")],
                                    "scheme string, host string, ip string")
        new_rows, _, _ = admit_links(
            links, empty_domains, empty_seen, dns, 1, CrawlParams())
        assert uses_broadcast_join(new_rows)


class TestPrevertSink:
    def test_round_trip(self, spark, fixture_dir, tmp_path):
        from macocu_crawler_spark.operators.extract import extract_documents
        from macocu_crawler_spark.sources.prevert import read_prevert, write_prevert

        pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").withColumn(
            "wpage_id", F.monotonically_increasing_id()
        )
        docs = extract_documents(pages).cache()
        out = str(tmp_path / "prevert")
        write_prevert(docs, out)
        back = read_prevert(spark, out)
        orig = {r.wpage_id: r.prevert
                for r in docs.filter("prevert != ''").collect()}
        got = {r.wpage_id: r.prevert for r in back.collect()}
        assert got == orig


class TestSchedulerPlanShape:
    """VERDICT r1 #2 done-criterion: no single task may process the whole
    frontier.  The executed select_urls plan must (a) cap globally with a
    TakeOrderedAndProject (parallel partial TopK), (b) keep every window
    that runs over frontier-sized input KEYED (with WindowGroupLimit rank
    pushdown), and (c) place the only unkeyed window ABOVE the TopK, i.e.
    over the bounded ≤ max_url_select batch."""

    def test_select_urls_no_global_window_over_frontier(self, spark):
        import re

        from macocu_crawler_spark.operators.scheduler_round import select_urls
        from macocu_crawler_spark.simulator import CrawlParams

        n_urls, n_hosts = 10_000, 500
        frontier = spark.range(n_urls).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id") % n_hosts).alias("host"),
            F.concat(F.lit("/p"), F.col("id")).alias("path"),
            F.concat(F.lit("/p"), F.col("id")).alias("path_sanitised"),
            (F.col("id") % 7).alias("batch_id"),
            F.col("id").alias("seq"),
            F.lit("queued").alias("status"),
            F.lit(1).alias("q_round"),
            F.lit(1).alias("q_phase"),
            (F.col("id") / n_hosts).cast("int").alias("q_rank"),
        )
        domains = spark.range(n_hosts).select(
            F.lit("http").alias("scheme"),
            F.concat(F.lit("h"), F.col("id")).alias("host"),
            F.concat(F.lit("10.0."), F.col("id") % 250, F.lit("."),
                     F.col("id") % 200).alias("ip"),
            F.lit(1).alias("distance"),
            F.lit(False).alias("bad"),
            F.lit("empty").alias("robot_state"),
            F.lit(None).cast("string").alias("robot_body"),
            *[F.lit(0).cast("long").alias(c) for c in (
                "count_downloaded", "count_cleaned",
                "bytes_downloaded", "bytes_cleaned")],
        )
        sel = select_urls(frontier, domains, CrawlParams())
        ps = plan_string(sel)
        lines = ps.splitlines()
        topk = [i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l]
        assert topk, "global ordered cap must compile to TakeOrderedAndProject"
        # a window whose spec has no partition columns starts with an
        # ordering arg ("col ASC/DESC NULLS ...") instead of a bare column
        global_windows = [
            i for i, l in enumerate(lines)
            if "windowspecdefinition(" in l
            and re.search(r"windowspecdefinition\([^,()]*\s(ASC|DESC)\b", l)
        ]
        assert global_windows, "fetch_seq numbering window missing"
        assert all(i < min(topk) for i in global_windows), (
            "an unkeyed window consumes frontier-sized input (below the TopK)"
        )
        # rank-limit pushdown on the keyed politeness/queue windows
        assert "WindowGroupLimit" in ps
        # the per-IP politeness window specifically (VERDICT r2 #6): a CDN
        # IP shared by 10^6 hosts must not collect 10^6 rows in one window
        # partition — the ip_rn <= ip_cap filter must push down to a
        # PARTIAL WindowGroupLimit on [ip] (map-side cap before the
        # shuffle), bounding the skewed key at ip_cap rows per map task
        ip_cap = CrawlParams().ip_cap
        assert re.search(
            rf"WindowGroupLimit \[ip#\d+\],.*row_number\(\), {ip_cap}, Partial",
            ps,
        ), "per-IP window lacks map-side rank-limit pushdown"
        assert sel.count() == n_hosts  # 1 per host, all under max_url_select


class TestBucketedSeenPlan:
    def test_anti_join_reads_seen_side_without_exchange(self, spark, tmp_path):
        """The 10^10-scale URL-seen anti-join: with url_seen stored as a
        bucketed table on the seen key, the SortMergeJoin needs an Exchange
        ONLY on the (small) candidates side — the seen side scans in place,
        bucket-for-bucket (Bucketed: true).  A plain parquet seen set would
        reshuffle the biggest table in the system every round."""
        from macocu_crawler_spark.operators.urlseen import (
            anti_join_seen_parts,
            write_bucketed_seen,
        )

        def keyed(n, pref):
            return spark.range(n).select(
                F.when(F.col("id") % 7 == 0, "https").otherwise("http")
                .alias("scheme"),
                F.concat(F.lit("h"), F.col("id") % 97).alias("host"),
                F.concat(F.lit(pref), F.col("id")).alias("path_sanitised"),
            )

        base = write_bucketed_seen(
            keyed(50_000, "/p"), str(tmp_path / "seen_bkt"),
            "url_seen_bkt_plan_test", n_buckets=32,
        )
        original = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force the SMJ (the seen side is tiny here; at 10^10 rows no
            # broadcast is possible and SMJ is the real plan)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = anti_join_seen_parts(keyed(500, "/q"), [base])
            ps = plan_string(out)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", original)
            spark.sql("DROP TABLE IF EXISTS url_seen_bkt_plan_test")
        assert "Bucketed: true" in ps, ps
        assert ps.count("Exchange") == 1  # candidates side only
        assert out.count() == 500  # all candidates new

    def test_append_keeps_bucketed_scan_and_merges_delta(self, spark, tmp_path):
        """Minor compaction (urlseen.append_bucketed_seen): appending a
        delta leaves multiple files per bucket, but the scan must STAY
        hash-partitioned — anti-join still exchanges only the candidates
        side — and the merged table must equal base ∪ delta exactly."""
        from macocu_crawler_spark.operators.urlseen import (
            anti_join_seen_parts,
            append_bucketed_seen,
            write_bucketed_seen,
        )

        def keyed(start, n, pref):
            return spark.range(start, start + n).select(
                F.when(F.col("id") % 7 == 0, "https").otherwise("http")
                .alias("scheme"),
                F.concat(F.lit("h"), F.col("id") % 97).alias("host"),
                F.concat(F.lit(pref), F.col("id")).alias("path_sanitised"),
            )

        write_bucketed_seen(
            keyed(0, 20_000, "/p"), str(tmp_path / "seen_bkt2"),
            "url_seen_bkt_append_test", n_buckets=32,
        )
        original = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            merged = append_bucketed_seen(
                keyed(20_000, 2_000, "/p"), "url_seen_bkt_append_test",
                n_buckets=32,
            )
            assert merged.count() == 22_000  # base ∪ delta, nothing lost
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            # candidates (ONE relation — a union would let Catalyst push
            # the join below it and double the candidate-side Exchange):
            # 300 keys inside the APPENDED delta range (must be filtered by
            # the merged table) + 200 genuinely new
            cand = spark.range(21_000, 21_500).select(
                F.when(F.col("id") % 7 == 0, "https").otherwise("http")
                .alias("scheme"),
                F.concat(F.lit("h"), F.col("id") % 97).alias("host"),
                F.concat(
                    F.when(F.col("id") < 21_300, "/p").otherwise("/q"),
                    F.col("id"),
                ).alias("path_sanitised"),
            )
            out = anti_join_seen_parts(cand, [merged])
            ps = plan_string(out)
            assert "Bucketed: true" in ps, ps
            assert ps.count("Exchange") == 1, ps  # candidates side only
            assert out.count() == 200
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", original)
            spark.sql("DROP TABLE IF EXISTS url_seen_bkt_append_test")


class TestAnnIvfPlanShape:
    def test_search_broadcasts_queries_never_shuffles_the_table(self, spark):
        """The det-IVF search at 10^9 vectors: the full embeddings side
        must stay a scan + row-local projection (literal-centroid argmin
        assignment) probed by a BroadcastHashJoin whose BUILD side is the
        tiny queries×probes list — the big side never exchanges.  The
        single hash Exchange in the plan is the keyed per-query top-k
        window over candidate rows (~n_probe/n_cells of the table), which
        is the operator's output, not a table reshuffle."""
        from macocu_crawler_spark.pipeline.similarity import ann_ivf_det_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ps = _plan(ann_ivf_det_topk(emb))
        assert "BroadcastHashJoin" in ps, ps
        assert ps.count("Exchange hashpartitioning") == 1, ps
        # the broadcast build side is the filtered query list (its
        # vec_id < n_queries filter reaches the parquet scan), not the table
        assert "BroadcastExchange" in ps, ps
        assert "LessThan(vec_id,10)" in ps, ps


class TestAnnLshPlanShape:
    def test_known_dim_plan_carries_no_per_row_hash_derivation(self, spark):
        """With the embedding dimension known, the hyperplane signs are
        literals — the physical plan must contain NO md5 (the row-dependent
        fallback derives every plane component with an md5 + substring +
        ascii per row, ~2M hash calls per pass at 4 tables × 4 planes ×
        dim 64, measured dominant before the fix)."""
        from macocu_crawler_spark.pipeline.similarity import ann_lsh_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ps = _plan(ann_lsh_topk(emb))
        assert "md5" not in ps, ps


class TestNoUnkeyedWindowsAnywhere:
    """Repo-wide window policy (VERDICT r3 #6): NO driver entry may plan an
    unkeyed (single-partition) window over unbounded input.  Unkeyed
    windows are tolerated only when their subtree is provably bounded — an
    aggregate output (bucketed_seq's per-bucket counts), a TopK
    (TakeOrderedAndProject), or an explicit Limit."""

    # these entries RUN a crawl/streaming job to produce their result
    # table; their returned DataFrame is a post-run scan, not a query plan
    SKIP = {"crawl_rounds", "streaming_ingest"}
    BOUNDED_NODES = (
        "HashAggregate", "SortAggregate", "ObjectHashAggregate",
        "TakeOrderedAndProject", "GlobalLimit", "LocalLimit",
    )

    @staticmethod
    def _indent(line: str) -> int:
        import re

        return re.match(r"^[\s:+|-]*", line).end()

    def _unkeyed_window_violations(self, ps: str) -> list[str]:
        import re

        lines = ps.splitlines()
        bad = []
        for i, line in enumerate(lines):
            # a windowspecdefinition with no partition cols starts with an
            # ordering argument ("col ASC/DESC ...") instead of a column list
            if not (
                "windowspecdefinition(" in line
                and re.search(r"windowspecdefinition\([^,()]*\s(ASC|DESC)\b", line)
            ):
                continue
            d = self._indent(line)
            subtree = []
            for nxt in lines[i + 1:]:
                if nxt.strip() and self._indent(nxt) <= d:
                    break
                subtree.append(nxt)
            if not any(n in s for s in subtree for n in self.BOUNDED_NODES):
                bad.append(line.strip()[:160])
        return bad

    def test_rule_catches_a_global_window(self, spark):
        from pyspark.sql import Window

        df = spark.range(100).withColumn(
            "rn", F.row_number().over(Window.orderBy("id"))
        )
        assert self._unkeyed_window_violations(_plan(df))
        # ...and accepts the bounded form (window above an aggregate)
        agg = spark.range(100).groupBy((F.col("id") % 5).alias("b")).count()
        ok = agg.withColumn("rn", F.row_number().over(Window.orderBy("b")))
        assert not self._unkeyed_window_violations(_plan(ok))

    def test_every_query_entry_plan_is_clean(self, spark):
        import __spark_entry__ as entrymod

        failures = {}
        for name, fn in entrymod.queries().items():
            if name in self.SKIP:
                continue
            bad = self._unkeyed_window_violations(_plan(fn(spark, SF_DIR)))
            if bad:
                failures[name] = bad
        assert not failures, failures
    """VERDICT r2 #9: the duplicates/ignored output accessors union every
    committed round version — their scans must prune to the columns they
    need (never text/prevert) and push the is_duplicate filter down."""

    @pytest.fixture()
    def driver_like(self, spark, tmp_path):
        """A catalog with two committed 'documents' versions and a minimal
        object exposing the CrawlDriver accessors (the real driver's crawl
        loop is irrelevant to the read-path plan)."""
        from macocu_crawler_spark.crawl_driver import CrawlDriver
        from macocu_crawler_spark.tables import SnapshotCatalog

        cat = SnapshotCatalog(str(tmp_path / "cat"))
        schema = (
            "wpage_id long, scheme string, host string, text string, "
            "prevert string, is_duplicate boolean, "
            "ignored_links array<struct<reason:string,url:string>>"
        )
        for v in range(2):
            df = spark.createDataFrame(
                [
                    (10 * v + 1, "http", "a.no", "x" * 50, "p" * 50, True,
                     [("path-bad-file-type", "http://a.no/x.exe")]),
                    (10 * v + 2, "http", "b.no", "y" * 50, "q" * 50, False, []),
                ],
                schema,
            )
            cat.write("documents", df, version=v)
        drv = CrawlDriver.__new__(CrawlDriver)
        drv.spark = spark
        drv.catalog = cat
        return drv

    def test_duplicates_scan_pruned(self, driver_like):
        df = driver_like.duplicates
        assert {r.wpage_id for r in df.collect()} == {1, 11}
        schemas = read_schemas(df)
        assert schemas, "no parquet scan in accessor plan"
        for rs in schemas:
            assert "text" not in rs and "prevert" not in rs, rs
            assert "wpage_id" in rs
        assert any("is_duplicate" in p for p in pushed_filters(df))

    def test_ignored_scan_pruned(self, driver_like):
        df = driver_like.ignored
        rows = df.collect()
        assert {(r.reason, r.url) for r in rows} == {
            ("path-bad-file-type", "http://a.no/x.exe")
        }
        for rs in read_schemas(df):
            assert "text" not in rs and "prevert" not in rs, rs
            assert "ignored_links" in rs
