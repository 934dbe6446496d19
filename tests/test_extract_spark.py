"""The per-row invariant (BASELINE.json input_hint): the vectorized Spark
extract stage must produce byte-identical text per url versus the row-level
reference pipeline (which wrote the fixtures' oracle columns)."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def extracted(spark, fixture_dir):
    from macocu_crawler_spark.operators.extract import extract_documents

    pages = (
        spark.read.parquet(f"{fixture_dir}/pages.parquet")
        .withColumn("wpage_id", F.monotonically_increasing_id())
    )
    out = extract_documents(pages).cache()
    oracle = pages.select("url", F.col("text").alias("oracle_text"),
                          F.col("lang").alias("oracle_lang"))
    return out, oracle


def test_byte_identical_text_per_url(extracted):
    out, oracle = extracted
    joined = out.join(oracle, "url", "inner")
    mismatches = joined.filter(
        (F.col("text") != F.col("oracle_text"))
        | (F.col("lang") != F.col("oracle_lang"))
    )
    rows = mismatches.select("url", "text", "oracle_text").take(3)
    assert rows == [], f"text mismatch for {[r.url for r in rows]}"
    assert joined.count() == oracle.count()


def test_accepted_pages_have_prevert_doc_header(extracted):
    out, _ = extracted
    bad = out.filter(
        (F.col("txt_len") > 0) & ~F.col("prevert").startswith('<doc id="')
    ).count()
    assert bad == 0


def test_rejected_pages_produce_no_links(extracted):
    out, _ = extracted
    # process.py:607-624: html_root stays None for pages without accepted text
    assert out.filter((F.col("txt_len") == 0) & (F.size("links") > 0)).count() == 0


def test_hashes_match_row_level(extracted, fixture_web):
    from macocu_crawler_spark.functions import textkit

    out, _ = extracted
    spark_hashes = {r.url: (r.txt_hash, r.html_hash)
                    for r in out.select("url", "txt_hash", "html_hash").collect()}
    for idx, p in enumerate(fixture_web.pages[:20]):
        row = textkit.process_page(
            idx, p["url"], p["html"], p["http_header"],
            p["warc_ts"].strftime("%Y%m%d%H%M%S"), p["ip"])
        assert spark_hashes[p["url"]] == (row["txt_hash"], row["html_hash"]), p["url"]


def test_plan_has_no_shuffle(spark, fixture_dir):
    from macocu_crawler_spark.operators.extract import extract_documents

    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").withColumn(
        "wpage_id", F.monotonically_increasing_id())
    plan = extract_documents(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
