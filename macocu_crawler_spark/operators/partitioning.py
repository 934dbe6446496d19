"""Frontier partitioning + explicit hot-host salting (north rule).

The frontier/domains/url_seen tables are host-hash bucketed so admission
joins are co-partitioned.  Hash-partitioning alone breaks down on hot
domains (the reference throttles them with per-domain record caps,
process.py:503-524): one host with 10^7 queued URLs lands its whole queue
on one partition.  The rebuild's answer is explicit salting:

  salt_factor(host) = ceil(rows(host) / HOT_HOST_SALT_THRESHOLD), capped
  partition key     = concat(host, '#', pmod(xxhash64(url), salt_factor))

Salting is a *layout* decision only — the per-host politeness window still
orders by (length(path), batch_id, seq) across salt shards because the
selection window partitions by (scheme, host), which AQE skew-join handles;
salting kicks in on the storage/shuffle axes (write distribution and the
admission anti-joins), where key-balance is what matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import config


def host_salt_factors(frontier: DataFrame, threshold: int | None = None,
                      max_factor: int | None = None) -> DataFrame:
    """(scheme, host, salt_factor) for hosts above the row threshold."""
    threshold = threshold or config.HOT_HOST_SALT_THRESHOLD
    max_factor = max_factor or config.HOT_HOST_SALT_FACTOR
    return (
        frontier.groupBy("scheme", "host")
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > threshold)
        .select(
            "scheme", "host",
            F.least(
                F.ceil(F.col("n_rows") / threshold).cast("int"), F.lit(max_factor)
            ).alias("salt_factor"),
        )
    )


def with_salted_key(df: DataFrame, salt_factors: DataFrame,
                    url_col: str = "path") -> DataFrame:
    """Add ``host_salt``: the host for cold hosts, host#<shard> for hot ones."""
    out = df.join(F.broadcast(salt_factors), ["scheme", "host"], "left")
    return out.withColumn(
        "host_salt",
        F.when(
            F.col("salt_factor").isNotNull(),
            F.concat_ws(
                "#",
                F.col("host"),
                F.pmod(F.xxhash64(F.col(url_col)), F.col("salt_factor")).cast("string"),
            ),
        ).otherwise(F.col("host")),
    ).drop("salt_factor")


def repartition_frontier(frontier: DataFrame, n_partitions: int | None = None,
                         threshold: int | None = None) -> DataFrame:
    """Host-hash repartition with hot hosts salted across shards."""
    n_partitions = n_partitions or config.FRONTIER_BUCKETS
    factors = host_salt_factors(frontier, threshold=threshold)
    return with_salted_key(frontier, factors).repartition(
        n_partitions, F.col("host_salt")
    ).drop("host_salt")


def bucketed_seq(
    df: DataFrame,
    dense_col: str,
    order_cols: list,
    out_col: str,
    start: int = 1,
    width: int = 1024,
) -> DataFrame:
    """Scale-safe global row numbering (two-pass partition-offset pattern).

    Replaces ``row_number().over(Window.orderBy(...))`` — which forces ALL
    rows into a single partition — for orderings whose leading key
    ``dense_col`` is a bounded positive integer (here: ``fetch_seq``,
    which is ≤ MAX_URL_SELECT by construction).

    Pass 1: rows are bucketed by ``(dense_col - 1) // width`` — buckets are
    contiguous, data-independent ranges of the total order, so no sampling
    is involved and the result is deterministic across parallelism.  A
    keyed window numbers rows within each bucket.
    Pass 2: per-bucket counts (O(max_url_select / width) rows — tens, not
    millions) get cumulative offsets via a window over the tiny counts
    relation, broadcast-joined back.  Everything stays in ONE lazy plan —
    no driver collect, no extra Spark job; the only single-partition window
    runs over the bucket-count rows, whose cardinality is bounded by
    max(dense_col) / width.

    ``order_cols`` must start with ``dense_col`` and be a total order.
    Output: ``out_col = start + global_rank - 1``.
    """
    from pyspark.sql import Window

    bucketed = df.withColumn(
        "_bseq_bucket", ((F.col(dense_col) - 1) / width).cast("int")
    )
    w = Window.partitionBy("_bseq_bucket").orderBy(*order_cols)
    local = bucketed.withColumn("_bseq_lrn", F.row_number().over(w))
    off_w = (
        Window.orderBy("_bseq_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("_bseq_bucket")
        .agg(F.count("*").alias("_bseq_n"))
        .withColumn("_bseq_off", F.coalesce(F.sum("_bseq_n").over(off_w), F.lit(0)))
        .drop("_bseq_n")
    )
    return (
        local.join(F.broadcast(offsets), "_bseq_bucket")
        .withColumn(
            out_col,
            (F.lit(start) + F.col("_bseq_off") + F.col("_bseq_lrn") - 1).cast("long"),
        )
        .drop("_bseq_bucket", "_bseq_lrn", "_bseq_off")
    )


def partition_sizes(df: DataFrame) -> list[int]:
    """Row count per partition (diagnostic for skew tests/bench)."""
    return [
        r.n for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
