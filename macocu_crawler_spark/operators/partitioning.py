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


def partition_sizes(df: DataFrame) -> list[int]:
    """Row count per partition (diagnostic for skew tests/bench)."""
    return [
        r.n for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
