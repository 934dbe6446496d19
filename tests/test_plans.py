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
            " count_cleaned long, bytes_downloaded long, bytes_cleaned long")
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
