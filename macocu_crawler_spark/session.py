"""SparkSession factory with the settings the engine is designed around.

Designed for multi-executor clusters (spark-submit --py-files); in this
sandbox we run local[N].  AQE is on so skewed frontier joins get runtime
re-planning; shuffle partitions default to the core count so the per-round
jobs neither under- nor over-partition at test scale.  At 100 TB the same
plans run with spark.sql.shuffle.partitions sized to the cluster (the code
never hard-codes partition counts into the logical plan).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from . import config


def get_spark(
    app_name: str = "macocu-crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", config.SHUFFLE_PARTITIONS)
    )
    # Join strategy (guide §3.1) A/B knobs — measured in round 7 on this
    # box: forcing shuffled-hash joins (preferSortMergeJoin=false +
    # maxShuffledHashJoinLocalMapThreshold=128m) was a net LOSS on the
    # bench queries (dedup_minhash_lsh 5.3→7.0 s, dedup_embedding_cosine
    # 9.9→11.6 s, dedup_cc_clusters 22.4→29.2 s at sf1.0), so the defaults
    # stay Spark's; the env knobs remain for cluster-side tuning where the
    # trade-off differs (larger executors, slower disks for sort spill).
    shj_threshold = os.environ.get("SPARK_SHJ_LOCAL_MAP_THRESHOLD", "0")
    prefer_smj = os.environ.get("SPARK_PREFER_SORTMERGEJOIN", "true")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.join.preferSortMergeJoin", prefer_smj)
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            shj_threshold,
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(config.ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
