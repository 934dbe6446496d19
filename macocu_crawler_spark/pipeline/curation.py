"""Corpus curation ops for training-data pipelines: benchmark
decontamination and per-language token-quota sampling.

These sit downstream of dedup in a 100 TB pipeline: after duplicates are
resolved, the corpus is (a) scrubbed of evaluation-benchmark text and
(b) mixed to a per-language token budget.  Both are pure
`pyspark.sql.functions` column algebra with DuckDB oracle SQL adjacent
(same md5 / integer-arithmetic primitives in both engines).

Scale notes:
- Decontamination shuffles once, keyed by gram hash; the benchmark side of
  the semi-join is a STATIC eval-set gram table in production (tiny —
  broadcast), so the per-doc cost is a map-side explode + broadcast probe.
  Here the benchmark set is carved deterministically out of the corpus
  (doc_id % BENCH_MOD) so the op is self-contained on the test tables, and
  the join is left as a plain semi-join for AQE to broadcast when small.
- Quota sampling is implemented as the two-phase bucket plan: phase 1
  aggregates tokens per (lang, n_tokens) bucket (bounded cardinality — one
  row per distinct doc length per language) and prefix-sums those buckets
  with a window whose partitions are SMALL; phase 2 resolves only
  within-bucket order (ties by doc_id).  A naive cumulative window
  directly over (lang) would buffer a whole language's corpus as one
  window group — the bucket split keeps every window partition bounded
  while producing byte-identical output (the oracle uses the naive form:
  correct is correct, only the plan differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DECON_N = 8       # gram order for contamination checks
BENCH_MOD = 7     # doc_id % BENCH_MOD == 0 -> benchmark ("eval") document

QUOTA_NUM = 3     # per-language token budget = 3/10 of the language's
QUOTA_DEN = 10    # total tokens (integer arithmetic: engine-exact)


def _distinct_grams(n: int):
    """Distinct n-token grams of the whitespace tokens (empty for docs
    shorter than n tokens)."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size(split(text, ' ')) >= {n} THEN "
            f"transform(sequence(1, size(split(text, ' ')) - {n} + 1),"
            f" i -> concat_ws(' ', slice(split(text, ' '), i, {n}))) "
            f"ELSE array() END"
        )
    )


def decontaminate(
    documents: DataFrame,
    n: int = DECON_N,
    bench_mod: int = BENCH_MOD,
    benchmark: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, n_hit_grams, contaminated): n_hit_grams counts a doc's
    distinct n-grams that also occur in any benchmark doc — the GPT-3-style
    n-gram overlap decontamination rule.

    Two forms: pass `benchmark` (any DataFrame with a `text` column — the
    production shape, a static eval-set table, tiny → broadcast) to score
    EVERY input doc against it; or omit it and the benchmark set is carved
    out of the corpus by doc_id % bench_mod == 0 (the self-contained form
    the driver entry uses; carved docs are excluded from the output)."""
    if benchmark is not None:
        grams = documents.select(
            "doc_id", F.explode(_distinct_grams(n)).alias("g")
        )
        bench = F.broadcast(
            benchmark.select(F.explode(_distinct_grams(n)).alias("g")).distinct()
        )
        train = grams
        base = documents.select("doc_id")
    else:
        # round 7: the carve-out form uses the gram stream on BOTH sides
        # (bench distinct + train probe), so the per-doc gram arrays are
        # projected once and localCheckpoint'd instead of re-tokenising
        # the corpus per branch (2.44 s → 1.34 s at sf1.0, output equal);
        # the checkpoint write carries the same gram bytes either branch's
        # explode produced
        ck = documents.select(
            "doc_id", _distinct_grams(n).alias("gs")
        ).localCheckpoint(eager=False)
        grams = ck.select("doc_id", F.explode("gs").alias("g"))
        bench = (
            grams.filter(F.col("doc_id") % bench_mod == 0)
            .select("g").distinct()
        )
        train = grams.filter(F.col("doc_id") % bench_mod != 0)
        base = ck.filter(F.col("doc_id") % bench_mod != 0).select("doc_id")
    hits = (
        train.join(bench, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("hits", F.lit(0)).cast("long").alias("n_hit_grams"),
            (F.coalesce("hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


DECONTAMINATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+{DECON_N - 1}], ' ') AS g
  FROM pos WHERE i <= len(t) - {DECON_N} + 1
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0
), hits AS (
  SELECT doc_id, count(*) AS n FROM grams
  WHERE doc_id % {BENCH_MOD} != 0 AND g IN (SELECT g FROM bench)
  GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hit_grams,
       CASE WHEN coalesce(h.n, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {BENCH_MOD} != 0
"""


def lang_quota_sample(
    documents: DataFrame, num: int = QUOTA_NUM, den: int = QUOTA_DEN
) -> DataFrame:
    """(doc_id, lang, n_tokens, cum_tokens): the greedy per-language prefix
    under a token budget of num/den of each language's total tokens —
    longest documents first, ties by doc_id; a doc is taken while the
    budget is not yet exhausted BEFORE it (so the boundary doc that
    crosses the budget is included).  Integer arithmetic throughout —
    no float budget comparisons to diverge between engines.

    Caveat: phase 2's window partitions by (lang, n_tokens), which is
    bounded by the docs SHARING one exact length — degenerate only for a
    corpus with a single dominant length (e.g. all-20-token snippets);
    there, sub-bucket the boundary length by hash(doc_id) ranges and
    prefix-sum those sub-buckets the same way phase 1 does lengths."""
    d = documents.select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    totals = d.groupBy("lang").agg(F.sum("n_tokens").alias("total_tokens"))
    # phase 1: per-(lang, n_tokens) bucket sums, prefix-summed longest-first
    # (window partitions = one row per distinct length per lang — bounded)
    buckets = d.groupBy("lang", "n_tokens").agg(F.sum("n_tokens").alias("btok"))
    by_len = Window.partitionBy("lang").orderBy(F.col("n_tokens").desc())
    buckets = buckets.withColumn(
        "bucket_cum", F.sum("btok").over(by_len)
    ).withColumn("bucket_before", F.col("bucket_cum") - F.col("btok"))
    # phase 2: within-bucket order by doc_id (every doc in a bucket has the
    # same n_tokens, so within-bucket cum = row_number * n_tokens)
    in_bucket = Window.partitionBy("lang", "n_tokens").orderBy("doc_id")
    return (
        d.join(buckets.select("lang", "n_tokens", "bucket_before"),
               ["lang", "n_tokens"])
        .join(F.broadcast(totals), "lang")
        .withColumn(
            "cum_tokens",
            F.col("bucket_before")
            + F.row_number().over(in_bucket) * F.col("n_tokens"),
        )
        .filter(
            (F.col("cum_tokens") - F.col("n_tokens")) * den
            < F.col("total_tokens") * num
        )
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


LANG_QUOTA_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), t AS (
  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM d GROUP BY lang
), c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY lang
              ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS cum_tokens
  FROM d
)
SELECT c.doc_id, c.lang, c.n_tokens, c.cum_tokens
FROM c JOIN t USING (lang)
WHERE (c.cum_tokens - c.n_tokens) * {QUOTA_DEN} < t.total_tokens * {QUOTA_NUM}
"""
