"""Embedding similarity: near-dup filtering and ANN top-k search.

Over the `embeddings` table (vec_id, embedding: array<float/double>, label).

- cosine is computed JVM-side with F.zip_with + F.aggregate (no Python);
  scores are rounded to 4 decimals BEFORE any comparison so the Spark and
  DuckDB (list_cosine_similarity) results agree bit-for-bit
- brute-force top-k is the correctness baseline; `ann_lsh_topk` is the
  scale path: sign-random-projection buckets (deterministic, md5-seeded)
  shrink the candidate set so the cross join is per-bucket, not global

Scale notes: brute force is O(Q·N) — fine for Q small or as a per-bucket
kernel. At 10^9 vectors: bucket by LSH signature (shuffle on bucket key),
search within bucket ± multiprobe; this is the IVF-style layout, expressed
as a bucket-key join, so Catalyst handles it like any other equi-join
(AQE-skew-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(F.col(b), F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )
    return dot / (na * nb)


def _grouped_cosine_pairs(
    embeddings: DataFrame, key: str, threshold: float,
    n_groups_hint: int | None = None,
) -> DataFrame:
    """All within-group pairs (vec_a < vec_b) with rounded cosine ≥
    threshold, computed per blocking-key group in numpy (guide §4.2: ship
    the group's vectors across the Python boundary ONCE — O(group) rows —
    and run the O(group²·dim) arithmetic through vectorised native code
    instead of one interpreted JVM fold per candidate pair).

    BIT-IDENTICAL to the JVM form by op-sequence construction, not by
    accident: the dot/norm accumulators are built elementwise across the
    component axis (acc += x_p · y_p), which runs each pair's fold in the
    same IEEE order as F.aggregate(zip_with(...)); the division is the
    same dot / (na · nb) (the two norm factors commute exactly in IEEE);
    and rounding goes through _round_half_up_arr, the Spark-F.round
    replica pinned bitwise by TestRoundHalfUpDifferential.  Verified
    pair-for-pair equal to the join form on every testdata sf
    (150,941 pairs at sf1.0).

    BLOCK-PAIR GRID: when the blocking key has fewer groups than the
    session has cores, one task per group underuses the cluster and a
    giant group would exceed one task — so each group is split into
    n_splits deterministic id-hash blocks and every unordered BLOCK PAIR
    (bi ≤ bj) becomes its own task (row replicated n_splits ways; each
    vector pair lands in exactly one (min,max) block-pair group).
    n_splits adapts to ceil(sqrt(parallelism / n_groups)) — 1 when there
    are already enough groups — so the same code runs one-task-per-group
    on a many-label corpus and a grid on a few-label one.  Row-blocks of
    1024 inside the kernel bound task memory either way."""
    import math

    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    if n_groups_hint is None:
        # one column-pruned aggregate; at any scale this is a partial-
        # aggregated distinct over the blocking key only
        n_groups_hint = embeddings.select(key).distinct().count()
    par = spark.sparkContext.defaultParallelism
    n_splits = max(
        1, math.ceil(math.sqrt(par / max(int(n_groups_hint), 1)))
    )

    empty = {"vec_a": "int64", "vec_b": "int64", "cos": "float64"}

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in empty.items()})

    def _norms(E: np.ndarray) -> np.ndarray:
        nrm = np.zeros(len(E))
        for p in range(E.shape[1]):
            x = E[:, p]
            nrm += x * x
        return np.sqrt(nrm)

    def _stack(col) -> np.ndarray:
        return np.stack([np.asarray(e, dtype=np.float64) for e in col])

    def _triangle(ids, E):
        na = _norms(E)
        m = len(ids)
        outa, outb, outc = [], [], []
        for i0 in range(0, m, 1024):
            i1 = min(i0 + 1024, m)
            acc = np.zeros((i1 - i0, m))
            for p in range(E.shape[1]):
                acc += E[i0:i1, p][:, None] * E[None, :, p]
            cos = acc / (na[i0:i1, None] * na[None, :])
            cos4 = _round_half_up_arr(cos, 4)
            ii, jj = np.nonzero(cos4 >= threshold)
            keep = (ii + i0) < jj  # vec_a < vec_b (ids ascending by sort)
            ii, jj = ii[keep], jj[keep]
            outa.append(ids[ii + i0])
            outb.append(ids[jj])
            outc.append(cos4[ii, jj])
        return outa, outb, outc

    def _cross(idsA, EA, idsB, EB):
        naA, naB = _norms(EA), _norms(EB)
        mB = len(idsB)
        outa, outb, outc = [], [], []
        for i0 in range(0, len(idsA), 1024):
            i1 = min(i0 + 1024, len(idsA))
            acc = np.zeros((i1 - i0, mB))
            for p in range(EA.shape[1]):
                acc += EA[i0:i1, p][:, None] * EB[None, :, p]
            cos = acc / (naA[i0:i1, None] * naB[None, :])
            cos4 = _round_half_up_arr(cos, 4)
            ii, jj = np.nonzero(cos4 >= threshold)
            ida, idb = idsA[ii + i0], idsB[jj]
            outa.append(np.minimum(ida, idb))
            outb.append(np.maximum(ida, idb))
            outc.append(cos4[ii, jj])
        return outa, outb, outc

    def _result(parts):
        outa, outb, outc = parts
        if not outa:
            return _empty()
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(outa),
                "vec_b": np.concatenate(outb),
                "cos": np.concatenate(outc),
            }
        )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return _empty()
        gi, gj = int(pdf["_gi"].iloc[0]), int(pdf["_gj"].iloc[0])
        if gi == gj:
            pdf = pdf.sort_values("vec_id")
            return _result(
                _triangle(pdf["vec_id"].to_numpy(), _stack(pdf["embedding"]))
            )
        a = pdf[pdf["_b"] == gi].sort_values("vec_id")
        b = pdf[pdf["_b"] == gj].sort_values("vec_id")
        if len(a) == 0 or len(b) == 0:
            return _empty()
        return _result(
            _cross(
                a["vec_id"].to_numpy(), _stack(a["embedding"]),
                b["vec_id"].to_numpy(), _stack(b["embedding"]),
            )
        )

    blk = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_splits)).cast("int")
    grid = F.explode(
        F.array(
            *[
                F.struct(
                    F.least(F.col("_b"), F.lit(o)).alias("gi"),
                    F.greatest(F.col("_b"), F.lit(o)).alias("gj"),
                )
                for o in range(n_splits)
            ]
        )
    )
    return (
        embeddings.select("vec_id", "embedding", F.col(key).alias("_k"))
        .withColumn("_b", blk)
        .select("vec_id", "embedding", "_k", "_b", grid.alias("_g"))
        .select(
            "vec_id", "embedding", "_k", "_b",
            F.col("_g.gi").alias("_gi"), F.col("_g.gj").alias("_gj"),
        )
        .groupBy("_k", "_gi", "_gj")
        .applyInPandas(fn, "vec_a long, vec_b long, cos double")
    )


def cosine_pairs(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """(vec_a, vec_b, cos) for same-label pairs above the threshold —
    embedding-cosine near-dup, blocked by `label` (the scale contract:
    never all-pairs).  Round 7: per-group vectorised kernel
    (_grouped_cosine_pairs) instead of the pair join — one interpreted
    O(dim) fold per candidate pair was the dominant cost."""
    return _grouped_cosine_pairs(embeddings, "label", threshold)


def cosine_pairs_oracle(threshold: float = 0.9) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.label = b.label
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.embedding, b.embedding), 4) >= {threshold}
"""


def cosine_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.3, n_planes: int = 4
) -> DataFrame:
    """Embedding near-dup with the LSH bucket as the BLOCKING key — the
    corpus-scale form of cosine_pairs (no label column needed; the bucket
    join bounds the pair space, exactly like minhash bands for text).
    Pairs that straddle a hyperplane are missed by design (recall/cost
    trade — use more planes/tables per ann_lsh_topk for higher recall)."""
    b = embeddings.select(
        "vec_id", "embedding",
        lsh_bucket_col(
            n_planes=n_planes, dim=_emb_dim(embeddings)
        ).alias("bucket"),
    )
    # round 7: same per-group vectorised kernel as cosine_pairs, keyed by
    # the LSH bucket instead of the label; the group count is known
    # statically (2^n_planes), so no distinct-count pre-pass is needed
    return _grouped_cosine_pairs(
        b, "bucket", threshold, n_groups_hint=1 << n_planes
    )


def cosine_pairs_lsh_oracle(threshold: float = 0.3, n_planes: int = 4) -> str:
    """DuckDB replica of lsh_bucket_col (table 0) + the bucket-blocked
    pair join.  Projections are rounded to 6 decimals before the sign test
    on BOTH sides so cross-engine float-summation order cannot flip a
    bucket bit."""
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), pos AS (
  SELECT vec_id, emb, generate_subscripts(emb, 1) AS i FROM e
), proj AS (
  SELECT vec_id, p,
         round(sum(emb[i] * ((ascii(substr(md5('0:' || p || ':' || (i - 1)), 1, 1)) % 2) * 2 - 1)), 6) AS pr
  FROM pos, range(0, {n_planes}) AS r(p)
  GROUP BY vec_id, p
), bucket AS (
  SELECT vec_id, CAST(sum(CASE WHEN pr >= 0 THEN 2 ** p ELSE 0 END) AS INT) AS bucket
  FROM proj GROUP BY vec_id
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) AS cos
FROM bucket a
JOIN bucket b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 4) >= {threshold}
"""


def semantic_clusters(
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_planes: int = 4,
    max_iters: int = 20,
) -> DataFrame:
    """(vec_id, cluster_rep, cluster_size) for EVERY embedding: transitive
    closure of the cosine_pairs_lsh near-dup graph — semantic dedup's
    cluster-canonicalisation step (keep vec_id == cluster_rep, drop the
    rest).  Pure composition: the LSH-bucketed pair join bounds the pair
    space, and dedup_text.cc_clusters (min-label propagation + pointer
    jumping, O(log diameter) rounds) collapses the clusters — the same
    loop that canonicalises text near-dups, fed by embedding pairs."""
    from macocu_crawler_spark.pipeline import dedup_text

    pairs = cosine_pairs_lsh(embeddings, threshold, n_planes).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    docs = embeddings.select(F.col("vec_id").alias("doc_id"))
    return dedup_text.cc_clusters(docs, pairs=pairs, max_iters=max_iters).select(
        F.col("doc_id").alias("vec_id"), "cluster_rep", "cluster_size"
    )


def semantic_clusters_oracle(threshold: float = 0.3, n_planes: int = 4) -> str:
    """Recursive-CTE transitive closure over the cosine_pairs_lsh oracle."""
    pairs_sql = cosine_pairs_lsh_oracle(threshold, n_planes)
    return f"""
WITH RECURSIVE pairs AS (
  SELECT vec_a, vec_b FROM ({pairs_sql}) q
), edges AS (
  SELECT vec_a AS u, vec_b AS v FROM pairs
  UNION
  SELECT vec_b, vec_a FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), reps AS (
  SELECT u AS vec_id, least(u, min(v)) AS cluster_rep FROM reach GROUP BY u
), lab AS (
  SELECT e.vec_id, coalesce(r.cluster_rep, e.vec_id) AS cluster_rep
  FROM embeddings e LEFT JOIN reps r USING (vec_id)
)
SELECT vec_id, cluster_rep,
       count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
FROM lab
"""


def ann_bruteforce_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbours for the first `n_queries` vectors.

    (query_id, neighbor_id, cos, rank); ties broken by neighbor_id so the
    result is total-ordered (cross-engine determinism)."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_cos("eq", "ec"), 4))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ann_bruteforce_oracle(n_queries: int = 10, k: int = 5) -> str:
    return f"""
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding, c.embedding), 4) AS cos,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(q.embedding, c.embedding), 4) DESC,
                    c.vec_id ASC
         ) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {n_queries}
) WHERE rank <= {k}
"""


def _emb_dim(embeddings: DataFrame, emb: str = "embedding") -> int | None:
    """Probe the embedding dimension (one limit-1 job) so bucket signs can
    be precomputed driver-side; None on an empty table (callers fall back
    to the row-dependent sign derivation)."""
    row = embeddings.select(emb).first()
    return len(row[0]) if row is not None and row[0] is not None else None


def lsh_plane_signs(n_planes: int, table: int, dim: int) -> list[list[float]]:
    """The deterministic {-1.0, +1.0} normal of plane ``p`` in hash table
    ``table``: component i is md5('table:p:i') first hex char, odd→+1 —
    exactly the derivation lsh_bucket_col used to evaluate JVM-side per
    row, and the one the DuckDB oracle (ann_lsh_topk_oracle) re-derives
    in SQL, so buckets stay engine-reproducible."""
    import hashlib

    return [
        [
            float((ord(hashlib.md5(
                f"{table}:{p}:{i}".encode()
            ).hexdigest()[0]) % 2) * 2 - 1)
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_col(
    emb: str = "embedding", n_planes: int = 4, table: int = 0,
    dim: int | None = None,
):
    """Deterministic sign-random-projection bucket: plane p's normal in
    hash table `table` is derived from md5(table ':' p ':' i) in
    {-1, +1} — no RNG, reproducible across engines/runs.

    When ``dim`` is known the signs are precomputed driver-side
    (lsh_plane_signs) and embedded as literal arrays — the row-dependent
    form recomputes an md5 + substring + ascii PER COMPONENT PER ROW
    (size() blocks constant folding), measured as the dominant cost of
    the LSH search at 4 tables × 4 planes × dim 64.  Values are
    identical either way; callers that know the table's dimension should
    pass it."""
    bucket = F.lit(0)
    signs = lsh_plane_signs(n_planes, table, dim) if dim is not None else None
    for p in range(n_planes):
        if signs is not None:
            plane = F.expr(
                "array(" + ",".join(repr(s) + "D" for s in signs[p]) + ")"
            )
        else:
            plane = F.transform(
                F.sequence(F.lit(0), F.size(F.col(emb)) - 1),
                lambda i: (
                    (
                        F.ascii(
                            F.substring(
                                F.md5(
                                    F.concat_ws(
                                        ":", F.lit(table), F.lit(p), i.cast("string")
                                    )
                                ),
                                1, 1,
                            )
                        )
                        % 2
                    )
                    * 2
                    - 1
                ).cast("double"),
            )
        proj = F.aggregate(
            F.zip_with(F.col(emb), plane, lambda x, s: x * s),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        # round before the sign test so cross-engine float-summation order
        # cannot flip a bucket bit (the DuckDB oracle rounds identically)
        bucket = bucket + F.when(F.round(proj, 6) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE sign-LSH: candidates are vectors
    sharing a bucket with the query in ANY of `n_tables` independent hash
    tables, each probed at Hamming distance ≤ 1 (multiprobe).

    The scale path for 10^9 vectors: per-(table, bucket) equi-joins instead
    of a global cross join; multiprobe and tables multiply QUERY rows (the
    cheap side), never candidate rows.  At corpus scale, n_planes grows
    with log2(N / target_bucket_size) — the 4-plane default fits the test
    corpus; the plan shape (bucket-key join, AQE-skew-safe) is invariant.
    Recall ≥ 0.8 vs ann_bruteforce_topk is enforced in
    tests/test_pipeline.py and carried as a column by ann_lsh_with_recall.
    """
    dim = _emb_dim(embeddings)
    per_table = []
    for t in range(n_tables):
        per_table.append(
            embeddings.select(
                "vec_id", "embedding",
                F.lit(t).alias("table"),
                lsh_bucket_col(
                    n_planes=n_planes, table=t, dim=dim
                ).alias("bucket"),
            )
        )
    bucketed = per_table[0]
    for t_df in per_table[1:]:
        bucketed = bucketed.unionByName(t_df)
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
    )
    q = (
        bucketed.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("eq"),
            "table",
            F.explode(probes).alias("bucket"),
        )
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ec"),
        "table",
        "bucket",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(c, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", F.round(_cos("eq", "ec"), 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ann_lsh_with_recall(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """ann_lsh_topk rows carrying their own quality gate: per-query
    recall@k vs the exact brute-force baseline as a column, so the driver's
    rows-only check sees the quality floor (VERDICT r1 #5).

    The LSH result is cached: it feeds both the recall aggregate and the
    final join, and without the cache each action runs the whole
    multi-table search twice (the cached relation is n_queries × k
    rows).  Lifecycle: the cache lives until the session clears it — a
    long-lived session running many entries should
    spark.catalog.clearCache() between entries (bench.run_queries does),
    since this function returns a lazy plan and cannot know when its
    consumer's action completes (ADVICE r5)."""
    lsh = ann_lsh_topk(embeddings, n_queries=n_queries, k=k).cache()
    bf = ann_bruteforce_topk(embeddings, n_queries=n_queries, k=k).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    recall = (
        lsh.join(bf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(F.sum(F.coalesce("hit", F.lit(0))) / F.lit(k), 4).alias(
                "recall_at_k"
            )
        )
    )
    return lsh.join(recall, "query_id").select(
        "query_id", "neighbor_id", "cos", "rank", "recall_at_k"
    )


def ann_lsh_topk_oracle(
    n_queries: int = 10,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    recall_floor: float = 0.8,
) -> str:
    """Full DuckDB replica of ann_lsh_with_recall + the CORRECTNESS gate
    row — possible because the LSH is deterministic by construction: the
    hyperplane signs come from md5(table ':' plane ':' dim), not an RNG, so
    a second engine can rebuild the exact same buckets (lsh_bucket_col).
    Projections are rounded to 6 decimals before the sign test on BOTH
    sides (same pragma as cosine_pairs_lsh_oracle) so cross-engine float
    summation order cannot flip a bucket bit; cosines are rounded to 4
    before ranking, ties broken by neighbor_id.

    This is the strongest oracle form in the repo — not a fixture-time
    kernel differential but an independent re-derivation of the whole
    multi-table multiprobe search inside another SQL engine.  (The ML
    k-means|| IVF variant has no such oracle by nature — its RNG stream is
    not reproducible outside Spark; the driver entry therefore uses the
    deterministic quantizer, ann_ivf_det_topk, which a plain-Python
    replica reproduces bit-for-bit.)"""
    probes = ", ".join(["(0)"] + [f"({1 << p})" for p in range(n_planes)])
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), pos AS (
  SELECT vec_id, emb, generate_subscripts(emb, 1) AS i FROM e
), proj AS (
  SELECT t.t AS tbl, p.p AS plane, vec_id,
         round(sum(emb[i] * ((ascii(substr(md5(t.t || ':' || p.p || ':' || (i - 1)), 1, 1)) % 2) * 2 - 1)), 6) AS pr
  FROM pos, range(0, {n_tables}) AS t(t), range(0, {n_planes}) AS p(p)
  GROUP BY t.t, p.p, vec_id
), bucket AS (
  SELECT tbl, vec_id,
         CAST(sum(CASE WHEN pr >= 0 THEN 2 ** plane ELSE 0 END) AS INT) AS bucket
  FROM proj GROUP BY tbl, vec_id
), qprobe AS (
  SELECT DISTINCT tbl, vec_id AS query_id, xor(bucket, pb) AS bucket
  FROM bucket, (VALUES {probes}) AS probes(pb)
  WHERE vec_id < {n_queries}
), cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM qprobe q JOIN bucket c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.query_id != c.vec_id
), lsh AS (
  SELECT query_id, neighbor_id, cos, CAST(rk AS INT) AS rank FROM (
    SELECT cand.query_id, cand.neighbor_id,
           round(list_cosine_similarity(eq.embedding::DOUBLE[],
                                        ec.embedding::DOUBLE[]), 4) AS cos,
           row_number() OVER (
             PARTITION BY cand.query_id
             ORDER BY round(list_cosine_similarity(eq.embedding::DOUBLE[],
                                                   ec.embedding::DOUBLE[]), 4) DESC,
                      cand.neighbor_id ASC) AS rk
    FROM cand
    JOIN embeddings eq ON eq.vec_id = cand.query_id
    JOIN embeddings ec ON ec.vec_id = cand.neighbor_id
  ) WHERE rk <= {k}
), bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                   c.embedding::DOUBLE[]), 4) DESC,
                      c.vec_id ASC) AS rk
    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {n_queries}
  ) WHERE rk <= {k}
), recall AS (
  SELECT l.query_id,
         round(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / {k}, 4)
           AS recall_at_k
  FROM lsh l
  LEFT JOIN bf b ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
  GROUP BY l.query_id
), gate AS (
  SELECT CAST(-1 AS BIGINT) AS query_id, CAST(-1 AS BIGINT) AS neighbor_id,
         mean_recall AS cos, CAST(0 AS INT) AS rank, mean_recall AS recall_at_k
  FROM (SELECT round(avg(recall_at_k), 4) AS mean_recall FROM recall)
  WHERE mean_recall >= {recall_floor}
)
SELECT CAST(l.query_id AS BIGINT) AS query_id,
       CAST(l.neighbor_id AS BIGINT) AS neighbor_id,
       l.cos, l.rank, r.recall_at_k
FROM lsh l JOIN recall r ON l.query_id = r.query_id
UNION ALL SELECT * FROM gate
"""


def _unit_col(emb: str = "embedding"):
    """L2-normalised double copy of an embedding column.  The norm is an
    ORDERED left fold (F.aggregate), so a single-node replica that sums in
    list order reproduces it bit-for-bit.

    The norm is routed through array_repeat + zip_with instead of being
    referenced inside a transform() lambda: a lambda body is evaluated
    per ELEMENT, and Catalyst's projection collapsing inlines the alias,
    so the naive form recomputes the O(dim) norm fold dim times per row —
    O(dim^2), measured as the dominant cost of the det-IVF search
    projection.  array_repeat evaluates the norm ONCE per row; the
    per-element division (x / norm) is the identical IEEE op."""
    v = F.col(emb).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    return F.zip_with(
        v, F.array_repeat(norm, F.size(v)), lambda x, n: x / n
    )


def _cell_rank_pairs(centroids: list[list[float]]):
    """array<struct<d2,cell>> of the rounded squared distance from the
    row's ``unit`` vector to each LITERAL centroid, paired with the cell
    id.  Struct comparison is field-order lexicographic, so
    F.array_min(...) is argmin with ties to the smallest cell and
    F.slice(F.array_sort(...), 1, p) is the p nearest cells — all
    row-local (whole-stage-codegen projection, no join, no shuffle).  The
    distance is the same ordered (a-b)^2 fold, rounded to 4 decimals
    HALF_UP, that the plain-Python oracle replica computes."""
    # one F.expr round trip instead of n_cells × dim F.lit py4j calls
    # (the calls alone cost ~0.5 s per iteration at 8×64); repr is the
    # shortest round-trip decimal form, and the D suffix makes Spark
    # parse it with Double.parseDouble — the exact same double back
    cents = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
            for c in centroids
        ) + ")"
    )
    d2s = F.transform(
        cents,
        lambda cen: F.round(
            F.aggregate(
                F.zip_with(F.col("unit"), cen, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ),
            4,
        ),
    )
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    return F.zip_with(
        d2s, idx, lambda d, i: F.struct(d.alias("d2"), i.alias("cell"))
    )


def lloyd_fixed_point(
    units: list[list[float]], n_cells: int, n_iter: int
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over pre-ordered unit vectors — the
    single-node trainer behind ivf_det_codebook.  No RNG anywhere:

    - init: the first ``n_cells`` vectors of the given order (the caller
      orders by md5(vec_id) — a hash-spread sample reproducible from the
      table alone)
    - every assignment distance and every centroid component is rounded
      to 4 decimals (decimal HALF_UP via F_round_half_up, Spark's F.round
      semantic) BEFORE use; argmin ties go to the smallest cell id
    - the centroid mean is FIXED POINT: each component quantised to an
      int at 1e-6 per vector, and int sums are exactly associative, so
      the mean is independent of summation order by construction
    - fixed ``n_iter`` iterations (no convergence test — another hidden
      nondeterminism source); empty cells keep their previous centroid

    Every op is an ordered left fold or an exact int sum, so any replica
    that processes the same vectors in the same order reproduces the
    centroids bit-for-bit.

    Round 7: vectorised with numpy, keeping the IEEE op sequence of the
    scalar loop EXACTLY — the distance fold runs as elementwise
    (d = a - b; acc = acc + d*d) across the component axis, so each
    (vector, cell) accumulator sees the same float ops in the same order
    as the old per-pair Python fold; the centroid mean stays an exact
    int64 sum divided by the same (1e6 * m) float; every rounding goes
    through _round_half_up_arr, whose ambiguous band falls back to the
    Decimal path (see F_round_half_up).  Argmin ties break to the
    smallest cell id (np.argmin keeps the first minimum — same rule as
    min((d2, cell))).  The scalar trainer cost ~3 s at 4096×8×10
    (21M interpreted folds + 3.3M Decimal roundings); the vectorised form
    is 64 array ops per assignment pass."""
    import numpy as np

    if not units:
        return []
    U = np.asarray(units, dtype=np.float64)
    cents = _round_half_up_arr(U[:n_cells].copy(), 4)
    # the 1e-6 quantisation of each component is iteration-invariant —
    # hoist it; sums of these int64s are exactly associative, so the mean
    # is independent of summation order by construction
    scaled = _round_half_up_arr(U * 1e6, 0).astype(np.int64)
    n, dim = U.shape
    n_c = cents.shape[0]
    for _ in range(n_iter):
        acc = np.zeros((n, n_c), dtype=np.float64)
        for p in range(dim):
            d = U[:, p, None] - cents[None, :, p]
            acc += d * d
        assign = np.argmin(_round_half_up_arr(acc, 4), axis=1)
        for cell in range(n_c):
            mask = assign == cell
            m = int(mask.sum())
            if m:
                s = scaled[mask].sum(axis=0, dtype=np.int64)
                cents[cell] = _round_half_up_arr(
                    s.astype(np.float64) / (1e6 * m), 4
                )
    return [[float(x) for x in row] for row in cents]


def _round_half_up_arr(a, n: int):
    """Vectorised F_round_half_up over a numpy array: the same fast path
    (scale, floor, off-boundary nearest integer, exact division by 10^n),
    with the ambiguous |frac - 0.5| < 1e-9 band — and any |t| ≥ 1e12 —
    routed element-by-element through the Decimal reference.  Returns a
    new float64 array; -0.0 is normalised like the scalar form."""
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    scale = 10.0 ** n
    t = a * scale
    fl = np.floor(t)
    f = t - fl
    out = (fl + (f > 0.5)) / scale + 0.0
    fallback = ~(np.abs(t) < 1e12) | (np.abs(f - 0.5) < 1e-9)
    if fallback.any():
        idx = np.nonzero(fallback)
        vals = a[idx]
        out[idx] = [_round_half_up_decimal(float(v), n) for v in vals]
    return out


def ivf_det_codebook(
    embeddings: DataFrame,
    n_cells: int = 8,
    n_iter: int = 10,
    n_train: int = 4096,
) -> list[list[float]]:
    """Deterministic IVF codebook — the engine-reproducible alternative to
    Spark ML's k-means|| (whose RNG stream no other engine can replay).
    One Spark job collects the training sample: the ``n_train`` vectors
    with the smallest md5(vec_id) (TakeOrdered — per-partition top-k then
    a driver merge, never a global sort), L2-normalised JVM-side by the
    same ordered-fold expression the search uses; Lloyd's then runs
    driver-side on that bounded sample (lloyd_fixed_point) — the standard
    ML-pipeline shape for clustering at scale (sample → train locally →
    broadcast the model), and the deterministic counterpart of
    ML's model.clusterCenters() driver-side footprint.  At 10^9 vectors
    the sample is still ``n_train`` × dim; assignment and search of the
    FULL table stay distributed in ann_ivf_det_topk (and are what the
    driver's value-hash oracle checks against an independent replica).

    The default n_train is sized for the pure-Python trainer: its exact
    arithmetic (ordered folds + decimal HALF_UP per distance, the price
    of engine-reproducibility) costs O(n_train × n_cells × n_iter) d2
    evaluations — ~3 s at 4096×8×10.  Raising n_cells for a bigger
    codebook warrants raising n_train with it (≥ ~500 vectors/cell)."""
    rows = (
        embeddings.select(
            "vec_id",
            _unit_col().alias("unit"),
            F.md5(F.col("vec_id").cast("string").cast("binary")).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(n_train)
        .collect()
    )
    units = [[float(x) for x in r.unit] for r in rows]
    return lloyd_fixed_point(units, n_cells=n_cells, n_iter=n_iter)


def _round_half_up_decimal(x: float, n: int) -> float:
    """The exact (slow) Decimal form of F_round_half_up — kept as the
    fallback for the ambiguous band and as the reference the fast path is
    differentially tested against."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP
    )) + 0.0


def F_round_half_up(x: float, n: int) -> float:
    """Python replica of Spark's F.round / java BigDecimal.valueOf(x)
    .setScale(n, HALF_UP): decimal HALF_UP on the shortest string form of
    the double (Double.toString ≡ repr).  The ``+ 0.0`` normalises -0.0
    to 0.0 — java.math.BigDecimal has no signed zero, so F.round never
    returns -0.0 while Python's Decimal preserves the sign (e.g.
    round(-0.00395, 0): Spark 0.0, naive Decimal -0.0 — caught by the
    bit-differential test, TestRoundHalfUpDifferential).

    Round 7 fast path (this is the hottest call of the driver-side Lloyd
    trainer): scale by 10^n and round to the unambiguous nearest integer
    without Decimal.  Correct because (a) |x·10^n computed in float −
    decimal(repr(x))·10^n| < ~1e-10 absolute for the |t| ≤ 1e7 range used
    here, so when the scaled value is ≥ 1e-9 away from a .5 boundary both
    paths pick the SAME grid integer, and (b) m / 10^n is a correctly
    rounded division by an exactly representable power of ten, i.e. the
    nearest double to the decimal m·10^-n — exactly what float(Decimal)
    returns.  Values inside the ambiguous band (or huge) fall back to
    Decimal.  Bit-equality with the Decimal form is pinned by
    TestRoundHalfUpDifferential."""
    import math

    x = float(x)
    scale = 10.0 ** n
    t = x * scale
    if not (abs(t) < 1e12):  # huge or NaN/inf: take the exact path
        return _round_half_up_decimal(x, n)
    fl = math.floor(t)
    f = t - fl
    if abs(f - 0.5) < 1e-9:
        return _round_half_up_decimal(x, n)
    return (fl + (f > 0.5)) / scale + 0.0


def ann_ivf_det_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 5,
    n_iter: int = 10,
) -> DataFrame:
    """ann_ivf_topk with the DETERMINISTIC codebook (ivf_det_codebook)
    instead of Spark ML k-means|| — every step is reproducible by a
    single-node replica, so the driver entry can carry a full DuckDB
    value-hash oracle (the ML variant stays available as ann_ivf_topk).
    Assignment and probe ranking reuse the codebook's literal-centroid
    array expression (_cell_rank_pairs): cell assignment is a row-local
    argmin projection over the full table (no shuffle), the n_probe
    nearest cells per query come from a row-local array_sort+slice, and
    the search itself broadcasts the (n_queries × n_probe)-row probe list
    against the assigned table — at 10^9 vectors the big side never
    exchanges; only the ~n_probe/n_cells share of candidate rows shuffles
    into the per-query top-k window.  Cosines are rounded to 4 before
    ranking, ties to the smallest neighbor_id.  A neighbor appears at
    most once per query by construction (one cell per neighbor, distinct
    probed cells), so no dedup pass is needed."""
    centroids = ivf_det_codebook(embeddings, n_cells=n_cells, n_iter=n_iter)
    pairs = _cell_rank_pairs(centroids)
    vecs = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        _unit_col().alias("unit"),
    )
    assigned = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ec"),
        F.array_min(pairs)["cell"].alias("cell"),
    )
    q = (
        vecs.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("eq"),
            F.explode(
                F.transform(
                    F.slice(F.array_sort(pairs), 1, n_probe),
                    lambda s: s["cell"],
                )
            ).alias("cell"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q).join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(_cos("eq", "ec"), 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer: a
    k-means codebook assigns every vector to a cell; a query searches only
    its `n_probe` nearest cells.

    The second ANN scale path beside the LSH tables (round 3): at 10^9
    vectors the codebook is trained on a sample, assignment is one JVM
    model.transform pass, and search is a per-cell equi-join — the same
    bucket-key plan shape as the LSH path, with data-adaptive buckets
    (k-means cells follow the embedding distribution where random
    hyperplanes cannot).  The centroid table is n_cells × dim — broadcast
    by construction.  At corpus scale n_cells grows with
    sqrt(N)·(N / target_cell_size) heuristics; the plan is invariant.

    Correctness gate: this Spark-ML k-means|| variant cannot have a
    value-hash oracle (its RNG stream is not reproducible outside Spark);
    its gate is tests/test_pipeline.py::TestSimilarity::
    test_ann_ivf_recall_floor — recall ≥ 0.8 vs brute force plus
    fixed-seed determinism.  The DRIVER entry uses ann_ivf_det_topk, the
    deterministic quantizer with a bit-exact plain-Python oracle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = embeddings.sparkSession
    # quantize on the unit sphere: cosine ranking ≈ euclidean distance on
    # L2-normalised vectors, so the euclidean k-means codebook matches the
    # cosine search metric
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v * v,
        )
    )
    unit = F.transform(
        F.col("embedding").cast("array<double>"), lambda v: v / norm
    )
    vecs = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        unit.alias("unit"),
        array_to_vector(unit).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", "embedding", "unit", F.col("prediction").alias("cell")
    )
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, center array<double>",
    )
    # query → n_probe nearest cells (Q × n_cells rows: trivially small)
    sqdist = F.aggregate(
        F.zip_with(F.col("uq"), F.col("center"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("cell").asc()
    )
    q = (
        assigned.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("eq"),
            F.col("unit").alias("uq"),
        )
        .crossJoin(F.broadcast(centroids))
        .withColumn("d2", sqdist)
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "eq", "cell")
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ec"), "cell"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", F.round(_cos("eq", "ec"), 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
