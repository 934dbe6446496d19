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
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
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
