"""Link admission: new URLs → frontier + url_seen + domains.

The Spark expression of reference scheduler.py:358-441 (process_new_urls)
plus domain.py:136-167 (add_new_paths):

1. exact 5-tuple dedup, first-wins in link order (reference: q_new_urls set)
2. distance: running min over the batch in link order of src_distance + 1
   (the reference's dom_distances dict is updated while iterating, so a
   link's cap check sees the min *so far* — replicated with an ordered
   window), capped at MAX_DOMAIN_DISTANCE
3. new target domains get a synthetic '/' path appended AFTER their batch
   paths (scheduler.py:410 add_new_paths(paths + ['/'])) and an IP from the
   dns table (NO_HOST/missing → bad, domain.py:77-83)
4. URL-seen: insert-or-skip on sanitised path, BEFORE the robots check
   (domain.py:142-148) — disallowed paths still enter the seen set
5. robots gate: paths of robots-ready domains are checked; undecided
   (none/init) and empty pass through

Scale notes: every join here keys on (scheme, host) or the sanitised path —
the same bucketing as the frontier/url_seen tables, so at 10^10 scale these
are co-partitioned merge joins; the dns dimension is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import config
from ..functions.urlkit import PATH_BOILERPLATE
from .domains import robots_allowed_udf

NO_HOST = "NO_HOST"


def sanitise(col):
    return F.regexp_replace(col, "(?i)" + PATH_BOILERPLATE, "")


def admit_links(
    links: DataFrame,
    domains: DataFrame,
    url_seen: DataFrame,
    dns: DataFrame,
    round_no: int,
    params,
    bloom_map: dict[int, bytes] | None = None,
    bloom_map_bc=None,
    url_seen_parts: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """links: (src_scheme, src_host, scheme, host, path, seq) — seq is the
    in-batch admission order (fetch order × link position).

    Returns (new_frontier_rows, new_url_seen_rows, domains_updated).
    """
    # 1. exact 5-tuple dedup, first wins
    tup_w = Window.partitionBy(
        "src_scheme", "src_host", "scheme", "host", "path"
    ).orderBy("seq")
    links = links.withColumn("tup_rn", F.row_number().over(tup_w)).filter(
        F.col("tup_rn") == 1
    ).drop("tup_rn")

    # 2. distance: src_distance + 1 (seeds: src NULL → 0), running min per target
    src_dist = domains.select(
        F.col("scheme").alias("src_scheme"),
        F.col("host").alias("src_host"),
        F.col("distance").alias("src_distance"),
    )
    links = links.join(src_dist, ["src_scheme", "src_host"], "left").withColumn(
        "tgt_dist",
        F.when(F.col("src_scheme").isNull(), F.lit(0)).otherwise(
            F.coalesce("src_distance", F.lit(0)) + 1
        ),
    )
    run_w = (
        Window.partitionBy("scheme", "host")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    links = links.withColumn("run_dist", F.min("tgt_dist").over(run_w)).filter(
        F.col("run_dist") <= params.max_domain_distance
    )

    # 3. split existing / new target domains
    dom_keys = domains.select("scheme", "host", F.lit(True).alias("dom_exists"))
    links = links.join(dom_keys, ["scheme", "host"], "left")
    new_hosts = (
        links.filter(F.col("dom_exists").isNull())
        .groupBy("scheme", "host")
        .agg(F.min("run_dist").alias("distance"), F.max("seq").alias("max_seq"))
    )
    # synthetic '/' rows for new domains, ordered after their batch paths
    root_rows = new_hosts.select(
        F.lit(None).cast("string").alias("src_scheme"),
        F.lit(None).cast("string").alias("src_host"),
        "scheme", "host",
        F.lit("/").alias("path"),
        (F.col("max_seq") + F.lit(500_000_000)).alias("seq"),
    )
    new_domains = (
        new_hosts.join(F.broadcast(dns), ["scheme", "host"], "left")
        .select(
            "scheme", "host",
            F.when(F.col("ip") == NO_HOST, F.lit(None)).otherwise(F.col("ip")).alias("ip"),
            "distance",
            (F.col("ip").isNull() | (F.col("ip") == NO_HOST)).alias("bad"),
            F.lit("none").alias("robot_state"),
            F.lit(None).cast("string").alias("robot_body"),
            F.lit(0).cast("long").alias("count_downloaded"),
            F.lit(0).cast("long").alias("count_cleaned"),
            F.lit(0).cast("long").alias("bytes_downloaded"),
            F.lit(0).cast("long").alias("bytes_cleaned"),
            F.lit(0).cast("long").alias("bytes_cleaned_primary"),
        )
    )
    # existing domains: relax distance (least of old and batch min)
    batch_min = links.groupBy("scheme", "host").agg(F.min("run_dist").alias("batch_dist"))
    domains_updated = (
        domains.join(batch_min, ["scheme", "host"], "left")
        .withColumn("distance", F.least("distance", F.coalesce("batch_dist", F.col("distance"))))
        .drop("batch_dist")
        .unionByName(new_domains)
    )

    # 4. URL-seen gate on sanitised path (first-wins within batch).
    # With use_bloom_prefilter the membership test routes through the
    # partitioned Bloom (operators/urlseen.py): definitely-new candidates
    # skip the exact join; the exact anti-join stays authoritative — tested
    # equivalent to the plain anti-join.
    cand = (
        links.select("scheme", "host", "path", "seq")
        .unionByName(root_rows.select("scheme", "host", "path", "seq"))
        .withColumn("path_sanitised", sanitise(F.col("path")))
    )
    # url_seen_parts (scale path): the seen set as [bucketed base] +
    # small delta legs — the chained anti-join is set-equivalent to the
    # union join but the bucketed base needs no Exchange (urlseen.py)
    from .urlseen import anti_join_seen_parts

    seen_parts = url_seen_parts if url_seen_parts else [url_seen]
    if getattr(params, "use_bloom_prefilter", False):
        from .urlseen import filter_new_candidates

        cand = filter_new_candidates(
            cand, url_seen, bloom_map=bloom_map, bloom_map_bc=bloom_map_bc,
            url_seen_parts=seen_parts,
            kind=getattr(params, "seen_prefilter", "bloom"),
        )
    else:
        cand = anti_join_seen_parts(cand, seen_parts)
    seen_w = Window.partitionBy("scheme", "host", "path_sanitised").orderBy("seq")
    cand = cand.withColumn("seen_rn", F.row_number().over(seen_w)).filter(
        F.col("seen_rn") == 1
    ).drop("seen_rn")
    new_url_seen = cand.select("scheme", "host", "path_sanitised")

    # 5. robots gate for ready domains (seen already recorded above)
    dom_robot = domains_updated.select(
        "scheme", "host", "robot_state", "robot_body"
    )
    admitted = (
        cand.join(dom_robot, ["scheme", "host"], "left")
        .withColumn(
            "allowed",
            F.when(F.col("robot_state") == "ready",
                   robots_allowed_udf(F.col("robot_body"), F.col("path")))
            .when(F.col("robot_state") == "fail",
                  F.lit(config.IGNORE_ROBOTS_WHEN_FAILED))
            .otherwise(F.lit(True)),
        )
        .filter(F.col("allowed"))
        .select(
            "scheme", "host", "path", "path_sanitised",
            F.lit(round_no).cast("long").alias("batch_id"),
            "seq",
            # O2/O7 queue model: new rows are PENDING until a sweep pulls
            # them into the per-host downloader queue (frontier_queue.py)
            F.lit("pending").alias("status"),
            F.lit(None).cast("int").alias("q_round"),
            F.lit(None).cast("int").alias("q_phase"),
            F.lit(None).cast("int").alias("q_rank"),
        )
    )
    return admitted, new_url_seen, domains_updated
