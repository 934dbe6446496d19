"""Replicates the driver's correctness gate: every queries()[name] with an
oracle must match DuckDB on row count, column names and values (floats
pre-rounded in-query on both sides)."""

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as em

    return em


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "i":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark, entrymod):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"lang", "n_docs", "n_unique"} <= set(df.columns)


def test_every_query_runs_and_oracles_cover(entrymod):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(os_) <= set(qs)
    # every driver entry is oracle-checked (round 5: streaming_ingest,
    # multimodal_features, ann_lsh_topk and ann_ivf_topk — the last via
    # the deterministic quantizer — were the final promotions)
    assert set(os_) == set(qs)


@pytest.mark.parametrize(
    "name",
    [
        "q_pricing_summary", "q_top_revenue_orders", "q_topk_per_key",
        "q_politeness_pick", "q_yield_rule", "q_seen_antijoin", "q_semijoin",
        "q_distance_min", "q_broadcast_star", "q_host_queue_counts",
        "q_union_dedup", "q_running_min", "q_doc_len_buckets", "q_date_format",
        "q_regexp_filter", "q_events_tumbling", "q_global_seq",
        "q_queue_sweep", "q_url_admission",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_simhash_groups", "dedup_simhash64", "dedup_simhash64_pairs",
        "dedup_onion", "dedup_ngram_jaccard", "dedup_embedding_cosine",
        "dedup_embedding_cosine_lsh",
        "dedup_cc_clusters", "dedup_dup_spans", "dedup_remove_spans",
        "dedup_semantic_clusters", "decontaminate", "sample_lang_quota",
        "ann_bruteforce_topk", "text_token_stats", "text_subword_stats",
        "text_quality_scores",
        "doc_fingerprints",
        "robots_filter", "langid_trigram",
        "crawl_rounds", "crawl_extract",
        "streaming_ingest", "multimodal_features", "ann_lsh_topk",
        "ann_ivf_topk",
    ],
)
def test_query_matches_oracle(spark, entrymod, duck, name):
    sdf = _norm(entrymod.queries()[name](spark, SF_DIR).toPandas())
    odf = _norm(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


def test_ann_gate_rows_present(spark, entrymod):
    """Both ANN entries must carry their (-1, -1, recall, 0) gate row —
    its absence (recall below the floor) changes the row count the driver
    records, which is the point of the in-entry gate."""
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        df = entrymod.queries()[name](spark, SF_DIR)
        assert df.filter("query_id = -1").count() == 1
