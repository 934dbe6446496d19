"""Exact content dedup — first-wins, reference scheduler.py:304-318.

The reference keeps two global in-RAM int sets (txt_hashes, raw_hashes) and
processes docmeta rows in arrival order: a doc is a duplicate if its txt
hash was seen; otherwise its txt hash is recorded and its RAW hash is
checked/recorded the same way.  Note the asymmetry: a txt-duplicate does NOT
record its raw hash, and a raw-duplicate HAS already recorded its txt hash.

Spark expression: arrival order is wpage_id (dense, assigned in fetch
order), so first-wins = min(wpage_id) windows over hash, with the global
seen sets unioned in.  No UDF, two shuffles (one per hash key), both on
LongType keys — at 10^10 scale these become bucketed anti-joins against the
seen_hashes table, with a partitioned Bloom filter as pre-filter
(SURVEY.md §1.1); the exact join stays authoritative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_batch(
    docs: DataFrame, seen_txt: DataFrame, seen_raw: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """docs: EXTRACTED rows of one round (must carry wpage_id, txt_hash,
    html_hash, txt_len).  seen_txt / seen_raw: (hash, wpage_id).

    Returns (duplicate_ids, new_seen_txt, new_seen_raw) where duplicate_ids
    has column wpage_id and the new_seen_* are the batch's additions.
    """
    texted = docs.filter(F.col("txt_len") > 0).select(
        "wpage_id", F.col("txt_hash").alias("t_hash"), F.col("html_hash").alias("r_hash")
    )
    # txt first-wins: batch rows vs global seen (seen rows always win — they
    # have earlier wpage ids by construction, but guard with a flag anyway)
    txt_all = texted.select("t_hash", "wpage_id", F.lit(False).alias("is_seen")).unionByName(
        seen_txt.select(
            F.col("hash").alias("t_hash"), "wpage_id", F.lit(True).alias("is_seen")
        )
    )
    w_txt = Window.partitionBy("t_hash").orderBy(
        F.col("is_seen").desc(), F.col("wpage_id").asc()
    )
    txt_ranked = txt_all.withColumn("rn", F.row_number().over(w_txt))
    txt_dups = txt_ranked.filter(~F.col("is_seen") & (F.col("rn") > 1)).select("wpage_id")
    txt_winners = txt_ranked.filter(~F.col("is_seen") & (F.col("rn") == 1)).select(
        F.col("t_hash"), "wpage_id"
    )
    # raw check only for txt-unique rows (reference: add_unique_ on txt
    # succeeded before raw is attempted)
    raw_cand = texted.join(txt_dups.withColumnRenamed("wpage_id", "d_id"),
                           texted.wpage_id == F.col("d_id"), "left_anti")
    raw_all = raw_cand.select("r_hash", "wpage_id", F.lit(False).alias("is_seen")).unionByName(
        seen_raw.select(
            F.col("hash").alias("r_hash"), "wpage_id", F.lit(True).alias("is_seen")
        )
    )
    w_raw = Window.partitionBy("r_hash").orderBy(
        F.col("is_seen").desc(), F.col("wpage_id").asc()
    )
    raw_ranked = raw_all.withColumn("rn", F.row_number().over(w_raw))
    raw_dups = raw_ranked.filter(~F.col("is_seen") & (F.col("rn") > 1)).select("wpage_id")
    raw_winners = raw_ranked.filter(~F.col("is_seen") & (F.col("rn") == 1)).select(
        F.col("r_hash"), "wpage_id"
    )
    duplicate_ids = txt_dups.unionByName(raw_dups)
    new_seen_txt = txt_winners.select(F.col("t_hash").alias("hash"), "wpage_id")
    new_seen_raw = raw_winners.select(F.col("r_hash").alias("hash"), "wpage_id")
    return duplicate_ids, new_seen_txt, new_seen_raw
