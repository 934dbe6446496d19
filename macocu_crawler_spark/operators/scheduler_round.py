"""Per-round URL selection — the scheduler's priority queue as one query.

Reference semantics (SURVEY.md §2.6 O1-O7):
- O5 robots-first: a domain whose robot_state is 'none' selects /robots.txt
  (domain.py:173-175)
- O1 per-domain order: (length(path), batch_id, seq) (domain.py:155)
- politeness: ≤1 URL per host per round (HOST_CONN_INTERVAL == 1 round);
  ≤ip_cap domains per IP per round (IP_CONN_INTERVAL grouping,
  crawl.py:239-283)
- O3 domain sweep order: (hostname-len bucket, distance bucket, host,
  scheme) — buckets disabled in default config (single range), the
  host/scheme tie-break is the total order that makes results identical
  across parallelism levels (north rule)
- O4 global cap MAX_URL_SELECT (ordered limit)

Scale notes: the per-domain pick is one shuffle by (scheme, host) — the
same partitioning the frontier table is bucketed by, so with a bucketed
frontier this is shuffle-free.  The global ordered limit is a TopK
(TakeOrderedAndProject), driver-light at k=30k, applied BEFORE the
fetch_seq numbering — the final global row_number runs over the ≤k
surviving rows, never over the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urlkit import ROBOT_PATH


def bucket_index_col(value_col, ranges) -> F.Column:
    """Index of the first range threshold >= value (scheduler.py:117-124)."""
    expr = F.lit(len(ranges))
    for i in reversed(range(len(ranges))):
        expr = F.when(value_col <= ranges[i], F.lit(i)).otherwise(expr)
    return expr


def select_urls(
    frontier: DataFrame,
    domains: DataFrame,
    params,
    robot_redirects: DataFrame | None = None,
) -> DataFrame:
    """Returns the round's fetch list: (scheme, host, path, ip, distance,
    is_robot, is_rr, src_scheme, src_host, redir_count, batch_id, seq,
    fetch_seq, url) ordered by fetch_seq.

    robot_redirects (optional): pending robots-redirect fetches
    (src_scheme, src_host, scheme, host, path, ip, redir_count, seq) —
    fetched with top priority (crawl.py:413-415 appendleft), charged to the
    TARGET host's politeness slot; at most one fetch per (scheme, host) per
    round overall.
    """
    live = domains.filter(~F.col("bad") & F.col("ip").isNotNull())
    null_src = [
        F.lit(None).cast("string").alias("src_scheme"),
        F.lit(None).cast("string").alias("src_host"),
        F.lit(0).alias("redir_count"),
    ]
    robot_cand = (
        live.filter(F.col("robot_state") == "none")
        .select(
            "scheme", "host", "ip", "distance",
            F.lit(ROBOT_PATH).alias("path"),
            F.lit(True).alias("is_robot"),
            F.lit(False).alias("is_rr"),
            *null_src,
            F.lit(None).cast("long").alias("batch_id"),
            F.lit(None).cast("long").alias("seq"),
            F.lit(1).alias("priority"),
        )
    )
    ready = live.filter(F.col("robot_state").isin("ready", "empty")).select(
        "scheme", "host", "ip", "distance"
    )
    # O2/O6: fetch the per-host downloader-queue HEAD — FIFO by the queue
    # entry key assigned at sweep/rotation time (frontier_queue.py); the
    # (len(path), batch, seq) order was applied when the row was PULLED
    # into the queue, exactly as the reference pops its sorted deque
    per_domain = Window.partitionBy("scheme", "host").orderBy(
        F.col("q_round").asc(), F.col("q_phase").asc(), F.col("q_rank").asc()
    )
    page_cand = (
        frontier.filter(F.col("status") == "queued")
        .join(ready, ["scheme", "host"])
        .withColumn("rn", F.row_number().over(per_domain))
        .filter(F.col("rn") == 1)
        .select(
            "scheme", "host", "ip", "distance", "path",
            F.lit(False).alias("is_robot"),
            F.lit(False).alias("is_rr"),
            *null_src,
            "batch_id", "seq",
            F.lit(1).alias("priority"),
        )
    )
    cand = robot_cand.unionByName(page_cand)
    if robot_redirects is not None:
        per_rr = Window.partitionBy("scheme", "host").orderBy("seq")
        rr_cand = (
            robot_redirects.withColumn("rn", F.row_number().over(per_rr))
            .filter(F.col("rn") == 1)
            .select(
                "scheme", "host", "ip",
                F.lit(0).alias("distance"),
                "path",
                F.lit(True).alias("is_robot"),
                F.lit(True).alias("is_rr"),
                "src_scheme", "src_host", "redir_count",
                F.lit(None).cast("long").alias("batch_id"),
                "seq",
                F.lit(0).alias("priority"),
            )
        )
        cand = cand.unionByName(rr_cand)
    cand = cand.withColumn(
        "hb", bucket_index_col(F.length("host"), list(params.hostname_len_ranges))
    ).withColumn(
        "db", bucket_index_col(F.col("distance"), list(params.distance_ranges))
    )
    order = [
        F.col("priority").asc(), F.col("hb").asc(), F.col("db").asc(),
        F.col("host").asc(), F.col("scheme").asc(),
    ]
    # one fetch per (scheme, host) per round — rr wins over the domain's own
    # candidate (priority)
    host_w = Window.partitionBy("scheme", "host").orderBy(*order)
    cand = cand.withColumn("host_rn", F.row_number().over(host_w)).filter(
        F.col("host_rn") == 1
    )
    ip_w = Window.partitionBy("ip").orderBy(*order)
    cand = cand.withColumn("ip_rn", F.row_number().over(ip_w)).filter(
        F.col("ip_rn") <= params.ip_cap
    )
    # O4 ordered global cap: TopK FIRST (TakeOrderedAndProject — parallel
    # per-partition partial sort, driver-light k-row merge), THEN number the
    # ≤ max_url_select survivors.  The numbering window therefore runs over
    # the bounded fetch batch, never over the frontier.
    capped = cand.orderBy(*order).limit(params.max_url_select)
    fetch_w = Window.orderBy(*order)
    selected = (
        capped.withColumn("fetch_seq", F.row_number().over(fetch_w))
        .withColumn(
            "url",
            F.concat(
                F.col("scheme"), F.lit("://"), F.col("host"),
                F.when(F.col("path").startswith("/"), F.col("path")).otherwise(
                    F.concat(F.lit("/"), F.col("path"))
                ),
            ),
        )
        .drop("hb", "db", "ip_rn", "host_rn", "priority")
    )
    return selected
