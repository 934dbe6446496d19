"""O2/O7 frontier queue model: pending → per-host downloader queue → fetch.

Reference semantics:
- O2 (scheduler.py:126-128, domain.py:169-209): per sweep — one per round —
  each ready domain moves ≤ max_url_select_per_domain of its shortest
  pending paths (order: length(path), batch_id, seq) into the downloader
  queue.  Fetches then take the queue head FIFO, so a shorter path admitted
  later does NOT jump ahead of already-queued paths.
- O7 (crawl.py:134-141): the per-entry cap check — a host already holding
  > max_host_url_queue queued URLs sends the entry to the waiting FIFO
  instead (the entry is still consumed from pending, exactly as the
  reference consumes it from the domain deque).
- Waiting rotation (crawl.py:160-217): every waiting_rotate_every rounds,
  per-host waiting prefixes move back into the queue up to the cap
  headroom.  Rotation precedes the sweep, so the sweep's cap check sees the
  post-rotation queue.

Frontier rows carry ``status ∈ {pending, queued, waiting}`` and the queue
order key ``(q_round, q_phase, q_rank)``: the round the row entered its
status, phase 0 = rotated-in / 1 = swept-in, rank = per-host position
within the phase.  Every window here partitions by (scheme, host) — the
same key the frontier is bucketed by, so at scale these are co-partitioned
single-shuffle (or shuffle-free) operations; nothing global.

The exact round model is defined in simulator.CrawlSimulator's docstring;
this module and the simulator change together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BY_HOST = ["scheme", "host"]

FRONTIER_COLS = [
    "scheme", "host", "path", "path_sanitised", "batch_id", "seq",
    "status", "q_round", "q_phase", "q_rank",
]


def _as_frontier(df: DataFrame) -> DataFrame:
    return df.select(*FRONTIER_COLS)


def _with_queue_key(df: DataFrame, round_no: int, phase: int, rank_col: str) -> DataFrame:
    return (
        df.withColumn("status", F.lit("queued"))
        .withColumn("q_round", F.lit(round_no))
        .withColumn("q_phase", F.lit(phase))
        .withColumn("q_rank", F.col(rank_col).cast("int"))
    )


def sweep_frontier(
    frontier: DataFrame, domains: DataFrame, round_no: int, params
) -> DataFrame:
    """One round's rotation + sweep over the status'd frontier."""
    cap = params.max_host_url_queue
    gcap = params.max_url_queue
    k = params.max_url_select_per_domain

    pending = frontier.filter(F.col("status") == "pending")
    queued = frontier.filter(F.col("status") == "queued")
    waiting = frontier.filter(F.col("status") == "waiting")

    # global downloader-queue bound (crawl.py:117-132): evaluated once per
    # phase against the then-current queue, like the reference's per-batch
    # q_urls_full — a 1-row aggregate broadcast, no driver action
    def q_full_of(qdf: DataFrame) -> DataFrame:
        return F.broadcast(
            qdf.groupBy().agg((F.count("*") > gcap).alias("_q_full"))
        )

    # --- waiting rotation (phase 0) ---
    rotate = bool(params.waiting_rotate_every) and (
        round_no % params.waiting_rotate_every == 0
    )
    if rotate:
        # bad domains are skipped by rotation (crawl.py:169 `if domain.bad:
        # continue`; simulator._rotate_waiting) — their waiting rows stay put
        bad_hosts = domains.filter(F.col("bad")).select(
            *BY_HOST, F.lit(True).alias("_bad")
        )
        qcounts = queued.groupBy(*BY_HOST).agg(F.count("*").alias("n_queued"))
        w_wait = Window.partitionBy(*BY_HOST).orderBy("q_round", "q_phase", "q_rank")
        ranked = (
            waiting.join(bad_hosts, BY_HOST, "left")
            .withColumn("wrn", F.row_number().over(w_wait))
            .join(qcounts, BY_HOST, "left")
            .crossJoin(q_full_of(queued))
            .withColumn(
                "headroom",
                F.lit(cap + 1) - F.coalesce("n_queued", F.lit(0)),
            )
        )
        promotable = (
            ~F.col("_q_full")
            & F.col("_bad").isNull()
            & (F.col("wrn") <= F.col("headroom"))
        )
        promoted = _as_frontier(
            _with_queue_key(ranked.filter(promotable), round_no, 0, "wrn")
        )
        waiting = _as_frontier(ranked.filter(~promotable))
        queued = queued.unionByName(promoted)

    # --- sweep (phase 1) ---
    ready = domains.filter(
        ~F.col("bad")
        & F.col("ip").isNotNull()
        & F.col("robot_state").isin("ready", "empty")
    ).select(*BY_HOST, F.lit(True).alias("_ready"))
    w_pend = Window.partitionBy(*BY_HOST).orderBy(
        F.length("path").asc(), F.col("batch_id").asc(), F.col("seq").asc()
    )
    # Round 7: the three pending outcomes (stay pending / enqueue /
    # overflow to waiting) are ONE row-local decision once prn, the host
    # queue count and the global bound are attached — emitted as a single
    # CASE projection instead of three filtered union branches.  The r6
    # plan evaluated the per-host ranking window (Exchange + Sort + Window
    # over the whole pending frontier) once per branch because the
    # branches' subtrees diverge (the prn<=k branch picks up
    # WindowGroupLimit, the others cannot), so nothing was reused
    # (guide §2.4); the merged form ranks the frontier exactly once.
    qcounts2 = queued.groupBy(*BY_HOST).agg(F.count("*").alias("n_queued2"))
    pend_r = (
        pending.join(ready, BY_HOST, "left")
        .withColumn("prn", F.row_number().over(w_pend))
        .join(qcounts2, BY_HOST, "left")
        .crossJoin(q_full_of(queued))  # post-rotation queue, as in the sim
        .withColumn("nq", F.coalesce("n_queued2", F.lit(0)))
    )
    picked = F.col("_ready").isNotNull() & (F.col("prn") <= k)
    # sequential cap semantics: entry i enqueues iff nq + (i-1) <= cap,
    # AND the global bound was not already exceeded pre-sweep
    fits = ~F.col("_q_full") & (F.col("nq") + F.col("prn") - 1 <= cap)
    swept = pend_r.select(
        *BY_HOST, "path", "path_sanitised", "batch_id", "seq",
        F.when(~picked, F.col("status"))
        .when(fits, F.lit("queued"))
        .otherwise(F.lit("waiting"))
        .alias("status"),
        F.when(~picked, F.col("q_round"))
        .otherwise(F.lit(round_no))
        .alias("q_round"),
        F.when(~picked, F.col("q_phase")).otherwise(F.lit(1)).alias("q_phase"),
        F.when(~picked, F.col("q_rank"))
        .otherwise(F.col("prn").cast("int"))
        .alias("q_rank"),
    )
    return (
        _as_frontier(swept)
        .unionByName(_as_frontier(queued))
        .unionByName(waiting)
    )
