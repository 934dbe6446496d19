"""Text dedup for training-data pipelines: exact, MinHash+LSH, SimHash,
n-gram Jaccard, fingerprinting.

These generalise the crawler's exact dedup (scheduler.py:304-318) to the
near-dup family a 100 TB corpus pipeline needs.  Every op is:

- pure `pyspark.sql.functions` column algebra (JVM-side, whole-stage
  codegen; no Python UDFs in the hot path), and
- paired with a DuckDB oracle SQL (same math via md5/ascii primitives that
  both engines implement identically), kept adjacent so they stay in sync.

Scale notes:
- MinHash+LSH: the band self-join is the scale path — candidates are pairs
  sharing a band bucket, so the shuffle is by band key, never all-pairs.
  Hot buckets (boilerplate-heavy corpora) are handled by AQE skew join; a
  salting pass can cap bucket size if needed.
- SimHash groups by 16-bit fingerprint — a bounded-cardinality shuffle.
- n-gram Jaccard is quadratic per group: ALWAYS gate it behind a blocking
  key (here: `source`; in the crawler: LSH bucket or host).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINHASH_K = 8
LSH_BANDS = 4  # band size = MINHASH_K / LSH_BANDS = 2


def tokens_col(text: str = "text"):
    return F.split(F.col(text), " ")


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy, first-wins by doc_id)
# ---------------------------------------------------------------------------

def exact_dedup(documents: DataFrame) -> DataFrame:
    """One row per distinct text: winner doc_id + duplicate count.

    A pure hash aggregate (first-wins = min(doc_id)): map-side combined,
    no window — a text duplicated 10^7 times contributes one combined row
    per map partition to the shuffle instead of one window group holding
    every copy."""
    return (
        documents.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            (F.count("*") - 1).alias("dup_count"),
        )
        .select("doc_id", F.col("h").alias("text_hash"), "dup_count")
    )


EXACT_DEDUP_ORACLE = """
SELECT doc_id, text_hash, dup_count FROM (
  SELECT doc_id, md5(text) AS text_hash,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY md5(text)) - 1 AS dup_count
  FROM documents
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# MinHash + LSH (shingle -> K minhashes -> bands -> bucket join)
# ---------------------------------------------------------------------------

def _shingles(n: int = 2):
    """Distinct n-gram shingles of the whitespace tokens (n=2)."""
    toks = tokens_col()
    return F.array_distinct(
        F.expr(
            f"transform(sequence(0, greatest(size(split(text, ' ')) - {n}, 0)),"
            f" i -> concat_ws(' ', slice(split(text, ' '), i + 1, {n})))"
        )
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, k, minhash): K min-over-md5 signatures per doc.

    Hash family: md5(k || ':' || shingle) — k-salted md5, min taken as the
    lexicographically smallest hex string (identical in both engines).
    """
    sh = documents.select("doc_id", F.explode(_shingles()).alias("shingle"))
    ks = sh.select(
        "doc_id", "shingle", F.explode(F.sequence(F.lit(0), F.lit(MINHASH_K - 1))).alias("k")
    )
    return ks.groupBy("doc_id", "k").agg(
        F.min(F.md5(F.concat_ws(":", F.col("k"), F.col("shingle")))).alias("minhash")
    )


def minhash_lsh_bands(documents: DataFrame) -> DataFrame:
    """(doc_id, band, band_key): the LSH band keys, computed in WIDE form.

    Round-7 plan shape: ONE groupBy(doc_id) carrying MINHASH_K parallel
    ``min(md5(k || ':' || shingle))`` aggregates over the shingle stream
    replaces the previous explode(k) × groupBy(doc_id, k) ×
    groupBy(doc_id, band) pipeline — the shuffle no longer carries K× the
    shingle rows and two of the three aggregation exchanges disappear
    (guide §2.3 "aggregate before you shuffle" / §2.4).  Band keys are
    identical to the old form: ``concat_ws('|', array_sort(array(m_i...)))``
    equals ``concat_ws('|', sort_array(collect_list(minhash)))`` because
    both sort the same band's minhash strings ascending."""
    # Round 7 (second pass): the K mins are PER-ROW reductions over the
    # doc's own shingle array — no explode, no shuffle, no aggregation at
    # all: array_min(transform(sh, s -> md5(k:s))) per k.  The shingle
    # array is projected once and localCheckpoint'd because Catalyst's
    # projection collapsing would otherwise inline the shingle transform
    # into all K expressions (K× the tokenisation — measured 9.0 s vs
    # 0.6 s at sf1.0); the checkpoint write is ∝ the same shingle bytes
    # the removed groupBy exchange used to carry, so the 100 TB story is
    # a wash on I/O and strictly better on compute.  Values identical:
    # min over the same md5 set (array_min ≡ min over exploded rows).
    # NB the per-k lambda is built by a one-arg factory — a two-parameter
    # lambda would make transform() pass the element INDEX as the second
    # argument and silently shadow k (caught during this rewrite by the
    # wide-form equality check).
    def _mk(k: int):
        return lambda s: F.md5(F.concat_ws(":", F.lit(k), s))

    sh = documents.select(
        "doc_id", _shingles().alias("sh")
    ).localCheckpoint(eager=False)
    wide = sh.select(
        "doc_id",
        *[
            F.array_min(F.transform(F.col("sh"), _mk(k))).alias(f"m{k}")
            for k in range(MINHASH_K)
        ],
    )
    band_size = MINHASH_K // LSH_BANDS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.concat_ws(
                    "|",
                    F.array_sort(
                        F.array(
                            *[
                                F.col(f"m{b * band_size + j}")
                                for j in range(band_size)
                            ]
                        )
                    ),
                ).alias("band_key"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return wide.select("doc_id", F.explode(band_structs).alias("p")).select(
        "doc_id", "p.band", "p.band_key"
    )


def minhash_lsh_pairs(documents: DataFrame) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band.

    Bands: MINHASH_K/LSH_BANDS consecutive signatures concatenated
    (minhash_lsh_bands wide form).
    Returns (doc_a, doc_b, n_bands) with doc_a < doc_b.
    """
    bands = minhash_lsh_bands(documents)
    left = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_bands"))
    )


MINHASH_PAIRS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), positions AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks
), shingles AS (
  SELECT DISTINCT doc_id,
         t[i] || CASE WHEN i < len(t) THEN ' ' || t[i+1] ELSE '' END AS shingle
  FROM positions
  WHERE i <= greatest(len(t) - 1, 1)
), sigs AS (
  SELECT doc_id, k, min(md5(k || ':' || shingle)) AS minhash
  FROM shingles, range(0, {MINHASH_K}) AS r(k)
  GROUP BY doc_id, k
), bands AS (
  -- NB: // (integer division) — DuckDB's CAST(x/2 AS INT) *rounds*,
  -- Spark's cast truncates; // matches Spark's floor semantics
  SELECT doc_id, CAST(k // {MINHASH_K // LSH_BANDS} AS INT) AS band,
         string_agg(minhash, '|' ORDER BY minhash) AS band_key
  FROM sigs GROUP BY doc_id, CAST(k // {MINHASH_K // LSH_BANDS} AS INT)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-nibble bit source)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash of the token multiset.

    bit_j(token) = ascii(md5(token)[j]) % 2 (portable across engines);
    fingerprint bit j is 1 iff sum over tokens of (2*bit_j - 1) >= 0.

    Round 7: WIDE form, same rewrite as _simhash64_wide — md5 once per
    token and the 16 bit-position sums as parallel aggregates of ONE
    groupBy(doc_id), instead of exploding sequence(0,15) per token (16×
    the shuffle rows) and aggregating twice.  bit·2^j is folded into the
    same long arithmetic (2^j exact in double for j ≤ 15, so the old
    pow-then-cast value is identical).
    """
    tok = documents.select("doc_id", F.explode(tokens_col()).alias("tok"))
    hashed = tok.select("doc_id", F.md5("tok").alias("h"))
    sums = [
        F.sum((F.ascii(F.substring("h", j + 1, 1)) % 2) * 2 - 1).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    wide = hashed.groupBy("doc_id").agg(*sums)
    fingerprint = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        fingerprint = fingerprint + F.when(
            F.col(f"s{j}") >= 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return wide.select("doc_id", fingerprint.alias("simhash"))


SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), bits AS (
  SELECT doc_id, j,
         CASE WHEN sum((ascii(substr(md5(tok), j + 1, 1)) % 2) * 2 - 1) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM tok, range(0, {SIMHASH_BITS}) AS r(j)
  GROUP BY doc_id, j
)
SELECT doc_id, CAST(sum(bit * (2 ** j)) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


def simhash_dup_groups(documents: DataFrame) -> DataFrame:
    """Fingerprint buckets with more than one doc (near-dup groups)."""
    return (
        simhash(documents)
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


SIMHASH_GROUPS_ORACLE = (
    "WITH s AS (" + SIMHASH_ORACLE + ") "
    "SELECT simhash, count(*) AS n_docs, min(doc_id) AS first_doc "
    "FROM s GROUP BY simhash HAVING count(*) > 1"
)


# ---------------------------------------------------------------------------
# SimHash-64: corpus-scale near-dup (4 × 16-bit bands, banded Hamming join)
# ---------------------------------------------------------------------------
# 16-bit SimHash collides everything at corpus scale; the production form is
# 64 bits split into 4 bands of 16 — candidates share ≥1 band (equi-join on
# (band, band_val); a doc pair within Hamming distance 3 ALWAYS shares at
# least one exact band by pigeonhole), then the full 64-bit Hamming distance
# verifies.  The shuffle key is (band, band_val) — bounded fan-out, never
# all-pairs.  Bit source: md5(tok)||md5('s:'||tok) = 64 hex chars; bit j =
# parity of hex char j (portable: identical in Spark and DuckDB).

SIMHASH64_BANDS = 4
SIMHASH64_BAND_BITS = 16


def _simhash64_wide(documents: DataFrame) -> DataFrame:
    """(doc_id, b0..b3): the four 16-bit band values, one row per doc.

    Plan shape (the scale-critical part): md5 runs ONCE per token, then the
    64 bit-position sums are 64 parallel `sum()` aggregates over that single
    token row — a hash aggregate with map-side partial combine, so the
    shuffle carries ONE combined 64-long row per (doc, map partition).  The
    previous plan exploded `sequence(0,63)` per token (64× shuffle rows,
    ~10^8 at sf0.1, 17 s); this one is a single groupBy(doc_id).
    """
    tok = documents.select("doc_id", F.explode(tokens_col()).alias("tok"))
    h = F.concat(F.md5("tok"), F.md5(F.concat(F.lit("s:"), F.col("tok"))))
    hashed = tok.select("doc_id", h.alias("h"))
    sums = [
        F.sum((F.ascii(F.substring("h", j + 1, 1)) % 2) * 2 - 1).alias(f"s{j}")
        for j in range(64)
    ]
    wide = hashed.groupBy("doc_id").agg(*sums)

    def band_val(b: int):
        terms = [
            F.when(F.col(f"s{j}") >= 0, F.lit(1 << (j % SIMHASH64_BAND_BITS)))
            .otherwise(F.lit(0))
            for j in range(b * SIMHASH64_BAND_BITS, (b + 1) * SIMHASH64_BAND_BITS)
        ]
        expr = terms[0]
        for t in terms[1:]:
            expr = expr + t
        return expr.cast("long").alias(f"b{b}")

    return wide.select("doc_id", *[band_val(b) for b in range(SIMHASH64_BANDS)])


def simhash64_bands(documents: DataFrame) -> DataFrame:
    """(doc_id, band, band_val): 4 × 16-bit SimHash bands per doc."""
    wide = _simhash64_wide(documents)
    pairs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"), F.col(f"b{b}").alias("band_val")
            )
            for b in range(SIMHASH64_BANDS)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.band", "p.band_val"
    )


def simhash64(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash_hex): the 64-bit fingerprint as 16 hex chars
    (band 0 first) — avoids signed-long overflow portably."""
    wide = _simhash64_wide(documents)
    hexes = [F.lpad(F.lower(F.hex(F.col(f"b{b}"))), 4, "0") for b in range(SIMHASH64_BANDS)]
    return wide.select("doc_id", F.concat(*hexes).alias("simhash_hex"))


def simhash64_dup_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming): near-dup pairs within 64-bit Hamming
    distance ≤ max_hamming, found via the banded equi-join (complete for
    max_hamming ≤ 3 by pigeonhole over 4 bands)."""
    # Each join side carries ALL four band values alongside the exploded
    # (band, band_val) key, so the full 64-bit Hamming distance is computable
    # directly on the joined row — no verification re-join.  The shuffle key
    # stays (band, band_val): bounded fan-out, never all-pairs.
    #
    # Round 7: the wide aggregate is localCheckpoint'd so the token
    # explode + 2×md5 + 64-sum aggregation runs ONCE — the r6 plan
    # evaluated the identical subtree on BOTH sides of the self-join
    # (2× Scan/Generate/HashAggregate).  The checkpointed relation is one
    # 5-column row per doc (guide §3.3 "materialising an intermediate
    # truncates the plan"; cost ∝ docs, not tokens).
    wide = _simhash64_wide(documents).localCheckpoint(eager=True)

    def exploded(side: str) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(b).cast("int").alias("band"),
                    F.col(f"b{b}").alias("band_val"),
                )
                for b in range(SIMHASH64_BANDS)
            ]
        )
        return wide.select(
            F.col("doc_id").alias(f"doc_{side}"),
            *[F.col(f"b{b}").alias(f"{side}{b}") for b in range(SIMHASH64_BANDS)],
            F.explode(pairs).alias("p"),
        ).select(
            f"doc_{side}",
            *[f"{side}{b}" for b in range(SIMHASH64_BANDS)],
            "p.band",
            "p.band_val",
        )

    ham = F.lit(0)
    for b in range(SIMHASH64_BANDS):
        ham = ham + F.bit_count(F.col(f"x{b}").bitwiseXOR(F.col(f"y{b}")))
    return (
        exploded("x")
        .withColumnRenamed("doc_x", "doc_a")
        .join(
            exploded("y").withColumnRenamed("doc_y", "doc_b"),
            ["band", "band_val"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


_SIMHASH64_BANDS_SQL = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), bits AS (
  SELECT doc_id, j,
         CASE WHEN sum((ascii(substr(md5(tok) || md5('s:' || tok), j + 1, 1)) % 2) * 2 - 1) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM tok, range(0, 64) AS r(j)
  GROUP BY doc_id, j
), bands AS (
  SELECT doc_id, CAST(j // 16 AS INT) AS band,
         CAST(sum(bit * (2 ** (j % 16))) AS BIGINT) AS band_val
  FROM bits GROUP BY doc_id, CAST(j // 16 AS INT)
)"""

SIMHASH64_ORACLE = (
    "WITH " + _SIMHASH64_BANDS_SQL + """
SELECT doc_id,
       string_agg(printf('%04x', band_val), '' ORDER BY band) AS simhash_hex
FROM bands GROUP BY doc_id
"""
)

SIMHASH64_PAIRS_ORACLE = (
    "WITH " + _SIMHASH64_BANDS_SQL + """
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
  WHERE a.doc_id < b.doc_id
), ham AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT) AS hamming
  FROM cand c
  JOIN bands x ON x.doc_id = c.doc_a
  JOIN bands y ON y.doc_id = c.doc_b AND y.band = x.band
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
"""
)


# ---------------------------------------------------------------------------
# n-gram Jaccard within a blocking key
# ---------------------------------------------------------------------------

# dense-bincount cutoff (nd² cells) and emission-chunk bound for the
# ngram pair-count kernel; module-level so the differential test can
# force the sparse path and multi-chunk merging
_NGRAM_DENSE_LIMIT = 1 << 26
_NGRAM_CHUNK_ROWS = 1 << 23


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.5, n: int = 2
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for same-`source` doc pairs with token-
    bigram Jaccard >= threshold.  Blocking by `source` keeps the pair
    space quadratic only within groups (the scale-path contract).

    Round 7 plan shape: ONE explode of the per-doc distinct shingles,
    shuffled once by the blocking key into a per-group pair-count kernel
    (guide §4.2 / §2.3: the r6 gram self-join produced 51.5M candidate
    pair rows at sf1.0 and pushed them through a corpus-wide aggregate
    plus two size joins; here only the O(grams) rows cross the shuffle
    and the Python boundary, and the pair counting runs vectorised per
    group).  EXACT, not approximate: intersection sizes are integer
    counts of shared gram ids (grams factorised on the real strings —
    no hashing), per-doc sizes are the group's row counts, and the only
    float op is the single n/(na+nb-n) division followed by
    _round_half_up_arr — the Spark-F.round bitwise replica — i.e. the
    identical arithmetic the old JVM plan ran (verified pair-for-pair
    equal at sf1.0 and against the unchanged DuckDB oracle).

    Scale caveat (unchanged from r6): one blocking group is one task; a
    group whose shared-gram pair space explodes needs the block-pair grid
    extension, exactly as the join form needed AQE skew handling."""
    grams = documents.select(
        "doc_id", "source", F.explode(_shingles(n)).alias("g")
    )
    thr = float(threshold)

    def fn(pdf):
        import numpy as np
        import pandas as pd

        from macocu_crawler_spark.pipeline.similarity import (
            _round_half_up_arr,
        )

        ginv, _ = pd.factorize(pdf["g"], sort=False)
        docs_u, dinv = np.unique(pdf["doc_id"].to_numpy(), return_inverse=True)
        nd = len(docs_u)
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
        if nd < 2:
            return empty
        na = np.bincount(dinv, minlength=nd).astype(np.int64)
        gcnt = np.bincount(ginv)
        order = np.argsort(ginv, kind="stable")
        dsorted = dinv[order]
        starts = np.concatenate([[0], np.cumsum(gcnt)])
        # pair emission in bounded CHUNKS (~2^23 codes): hot shared grams
        # make the raw emission Σm² per group, which must not be held in
        # memory at once — chunks are folded into the count structure as
        # they fill, so task memory is O(chunk + distinct pairs), not
        # O(pair emissions)
        dense = nd * nd <= _NGRAM_DENSE_LIMIT  # dense count for small groups
        counts = np.zeros(nd * nd, dtype=np.int64) if dense else None
        sparse_codes: list = []
        sparse_counts: list = []
        chunks: list = []
        chunk_rows = 0

        def flush():
            nonlocal chunk_rows
            if not chunks:
                return
            codes = np.concatenate(chunks)
            chunks.clear()
            chunk_rows = 0
            if dense:
                counts[:] = counts + np.bincount(codes, minlength=nd * nd)
            else:
                cu, cc = np.unique(codes, return_counts=True)
                sparse_codes.append(cu)
                sparse_counts.append(cc)

        for gi in np.flatnonzero(gcnt > 1):
            s, e = starts[gi], starts[gi + 1]
            mem = np.sort(dsorted[s:e])  # distinct per gram (input is
            # (doc, g)-distinct), ascending -> pairs come out doc_a < doc_b
            ii, jj = np.triu_indices(e - s, 1)
            chunks.append(mem[ii].astype(np.int64) * nd + mem[jj])
            chunk_rows += len(ii)
            if chunk_rows >= _NGRAM_CHUNK_ROWS:
                flush()
        flush()
        if dense:
            pair_codes = np.flatnonzero(counts)
            n_inter = counts[pair_codes]
        else:
            if not sparse_codes:
                return empty
            allc = np.concatenate(sparse_codes)
            alln = np.concatenate(sparse_counts)
            o = np.argsort(allc, kind="stable")
            allc, alln = allc[o], alln[o]
            bound = np.concatenate(
                [[0], np.flatnonzero(allc[1:] != allc[:-1]) + 1]
            )
            pair_codes = allc[bound]
            n_inter = np.add.reduceat(alln, bound)
        if len(pair_codes) == 0:
            return empty
        ia, ib = pair_codes // nd, pair_codes % nd
        jac = _round_half_up_arr(
            n_inter.astype(np.float64)
            / (na[ia] + na[ib] - n_inter).astype(np.float64),
            4,
        )
        keep = jac >= thr
        return pd.DataFrame(
            {
                "doc_a": docs_u[ia[keep]],
                "doc_b": docs_u[ib[keep]],
                "jaccard": jac[keep],
            }
        )

    return grams.groupBy("source").applyInPandas(
        fn, "doc_a long, doc_b long, jaccard double"
    )


def ngram_jaccard_oracle(threshold: float = 0.5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), positions AS (
  SELECT doc_id, source, t, generate_subscripts(t, 1) AS i FROM toks
), grams AS (
  SELECT DISTINCT doc_id, source,
         t[i] || CASE WHEN i < len(t) THEN ' ' || t[i+1] ELSE '' END AS g
  FROM positions
  WHERE i <= greatest(len(t) - 1, 1)
), sizes AS (
  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM grams a JOIN grams b ON a.source = b.source AND a.g = b.g
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter / (sa.n_grams + sb.n_grams - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.n_grams + sb.n_grams - n_inter), 4) >= {threshold}
"""


# ---------------------------------------------------------------------------
# document fingerprint (normalised-content hash)
# ---------------------------------------------------------------------------

def fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 of lowercased, whitespace-collapsed text —
    the P11 content-hash generalised to normalised form."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return documents.select(
        "doc_id", F.substring(F.md5(norm), 1, 16).alias("fingerprint")
    )


FINGERPRINT_ORACLE = r"""
SELECT doc_id,
       substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16)
         AS fingerprint
FROM documents
"""


# ---------------------------------------------------------------------------
# onion-style duplicated-content ratio (paragraph/n-gram resemblance dedup)
# ---------------------------------------------------------------------------
# MaCoCu's corpus post-processing deduplicates with onion (SURVEY §1 north
# star: "onion/MinHash-style near-duplicate detection"): a document is
# dropped when too large a fraction of its token n-grams was already seen
# in previously-processed text.  The distributed form: one shuffle keyed by
# n-gram to find each gram's first-seeing doc (min doc_id — the stable
# stand-in for onion's stream order), then a per-doc aggregate of the
# already-seen fraction.  The gram keyspace is huge and near-uniform, so
# the shuffle is balanced; stop-gram hot keys are handled by AQE skew
# splitting because the per-gram state is a single min.

ONION_N = 5          # onion's default n-gram order
ONION_THRESHOLD = 0.5  # drop when >= 50% of n-grams are duplicate


def _occurrence_grams(n: int):
    """All token n-gram occurrences in order (not distinct — onion scores
    occurrences); docs with < n tokens yield no grams."""
    return F.expr(
        f"CASE WHEN size(split(text, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split(text, ' ')) - {n} + 1),"
        f" i -> concat_ws(' ', slice(split(text, ' '), i, {n}))) "
        f"ELSE array() END"
    )


def onion_dedup(
    documents: DataFrame, n: int = ONION_N, threshold: float = ONION_THRESHOLD
) -> DataFrame:
    """(doc_id, n_grams, n_dup, dup_ratio, keep): onion-style resemblance
    to previously-seen text.  A gram occurrence is duplicate iff a doc with
    a smaller doc_id contains the same gram; keep = rounded ratio below
    threshold."""
    grams = documents.select("doc_id", F.explode(_occurrence_grams(n)).alias("gram"))
    # first-seer via partial-aggregated groupBy + equi-join (NOT a window
    # over the gram partition: a boilerplate gram occurring 10^7 times
    # would buffer as ONE window group, while the aggregate combines
    # map-side and the join is AQE-skew-splittable).
    #
    # Round 7: only grams seen in MORE THAN ONE doc can make an occurrence
    # duplicate (a gram confined to one doc has first_doc == doc_id), so
    # the join side keeps just those — max(doc_id) > min(doc_id) is the
    # exact multi-doc test without a countDistinct Expand — which shrinks
    # the broadcast/join side from every-distinct-gram to the shared tail
    # (guide §3.2 shape: pre-filter the build side).  n_grams is the
    # occurrence count, a pure per-row expression (array size), so the
    # per-doc totals no longer ride through the join; docs whose grams are
    # all unique re-enter via the left join with n_dup = 0 — the same rows
    # the old inner join produced, since every occurrence matched its own
    # gram's first_doc row.
    firsts_shared = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mx") > F.col("first_doc"))
        .select("gram", "first_doc")
    )
    dup_counts = (
        grams.join(firsts_shared, "gram")
        .filter(F.col("doc_id") > F.col("first_doc"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup"))
    )
    # occurrence count is ARITHMETIC (ntok-n+1), never build the gram
    # array for it: size(transform(...)) is an interpreted higher-order
    # expression that the pushed-down filter evaluates a second time —
    # measured 15 s alone at sf1.0 vs 0.8 s for the closed form
    ntok = F.size(F.split(F.col("text"), " "))
    base = documents.select(
        "doc_id",
        F.when(ntok >= n, ntok - (n - 1)).otherwise(0).cast("long").alias("n_grams"),
    ).filter(F.col("n_grams") > 0)
    return (
        base.join(dup_counts, "doc_id", "left")
        .withColumn("n_dup", F.coalesce("n_dup", F.lit(0)).cast("long"))
        .withColumn("dup_ratio", F.round(F.col("n_dup") / F.col("n_grams"), 4))
        .withColumn("keep", F.col("dup_ratio") < threshold)
        .select("doc_id", "n_grams", "n_dup", "dup_ratio", "keep")
    )


ONION_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), positions AS (
  SELECT doc_id, ts, generate_subscripts(ts, 1) AS i FROM tok
), g AS (
  SELECT doc_id, array_to_string(ts[i:i+{ONION_N - 1}], ' ') AS gram
  FROM positions WHERE i <= len(ts) - {ONION_N} + 1
), m AS (
  SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
), agg AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         CAST(sum(CASE WHEN g.doc_id > m.first_doc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup
  FROM g JOIN m USING (gram) GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_dup,
       round(n_dup::DOUBLE / n_grams, 4) AS dup_ratio,
       round(n_dup::DOUBLE / n_grams, 4) < {ONION_THRESHOLD} AS keep
FROM agg
"""

# ---------------------------------------------------------------------------
# near-dup cluster canonicalisation (connected components over LSH pairs)
# ---------------------------------------------------------------------------
# Pair lists (minhash_lsh_pairs) are only half of dedup: a corpus pipeline
# must pick ONE canonical doc per transitive near-dup CLUSTER (a~b, b~c =>
# {a,b,c} keep min).  The distributed form is min-label propagation over the
# pair graph — every vertex takes the min label among itself and its
# neighbours — plus a pointer-jumping shortcut (label(v) <- label(label(v)))
# each round, so convergence is O(log diameter): near-dup graphs are
# shallow quasi-cliques (diameter 2-4) that finish in 2-3 rounds, and even
# a pathological 10^5-long chain finishes in ~17.  Each round is two
# vertex-keyed shuffles and stays a pure DataFrame loop (the same recipe
# as the O(log^2 n) large-star/small-star alternation, with simpler
# rounds).  Convergence is detected with a decimal sum aggregate (labels
# only ever decrease; the sum is strictly decreasing until fixpoint), one
# tiny action per round.

def cc_clusters(
    documents: DataFrame,
    pairs: DataFrame | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """(doc_id, cluster_rep, cluster_size) for EVERY document: cluster_rep
    is the min doc_id reachable through near-dup pair edges (singletons
    are their own rep), cluster_size the member count.  Pairs default to
    minhash_lsh_pairs; any (doc_a, doc_b) pair source (simhash64 bands,
    embedding cosine) clusters the same way."""
    if pairs is None:
        # Round 7 — bucket-star contraction: the minhash pair graph within
        # one (band, band_key) bucket is a CLIQUE (m members → m(m-1)/2
        # pair edges; 15.7M edges over 50k docs at sf1.0), but connected
        # components only need CONNECTIVITY, and a star — every bucket
        # member linked to the bucket's min doc_id — has exactly the same
        # components (any two members stay connected through the rep,
        # transitively across buckets).  Edge count drops to ≤ LSH_BANDS
        # per doc (200k at sf1.0, a 78× cut), which is what every
        # propagation round then scans.  The rep is an aggregate + join,
        # not a window, so a 10^7-member boilerplate bucket stays
        # map-side-combined and AQE-skew-splittable; `bands` is
        # localCheckpoint'd so the shingle→minhash aggregation runs once,
        # not once per join branch.
        bands = minhash_lsh_bands(documents).localCheckpoint(eager=True)
        reps = bands.groupBy("band", "band_key").agg(
            F.min("doc_id").alias("rep")
        )
        # no distinct: a doc reaching the same rep through several buckets
        # just repeats an edge, and every consumer is a min/distinct
        # aggregate (labels init, min-label propagation) — duplicate edges
        # cannot change the fixpoint, and dropping the dedup removes an
        # exchange + aggregation over the edge list
        pairs = (
            bands.join(reps, ["band", "band_key"])
            .filter(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
    pairs = pairs.select("doc_a", "doc_b")
    # both edge directions via ONE evaluation of the pair source (the r6
    # union re-ran the whole pair join on each branch), then pre-partition
    # AND pre-sort by dst so every propagation round's sort-merge join
    # reuses the cached layout instead of re-exchanging + re-sorting the
    # edge table (guide §2.4: two operations keyed the same way share one
    # exchange) — measured 3.4 s → 1.3 s per round at sf1.0.
    nparts = int(
        documents.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .repartition(nparts, F.col("dst"))
        .sortWithinPartitions("dst")
        .persist()
    )
    # every iteration references `labels` TWICE (union + join), so a
    # persist()-only loop doubles the LOGICAL plan each round (persist
    # short-circuits execution, not analysis) and Catalyst OOMs around
    # iteration 20 on 2^20 nodes.  localCheckpoint truncates the lineage
    # to a LogicalRDD each round — the iterative-algorithm contract; its
    # blocks are freed when the superseded DataFrame is GC'd.
    # eager=False: the convergence-sum action right below materialises the
    # checkpoint, so each round runs ONE job instead of a checkpoint job
    # plus an aggregate job (round 7; same blocks, same lineage truncation).
    # Seeding: labels start at min(v, min neighbour) — exactly one
    # propagation step ahead of the identity labelling, for the same price
    # (a groupBy over the edge list replaces the former distinct over it),
    # so the loop typically converges one round earlier.  Same fixpoint:
    # any labelling between the identity and the final minima propagates
    # to the identical result.
    labels = (
        edges.groupBy("dst").agg(F.min("src").alias("mn"))
        .select(
            F.col("dst").alias("v"), F.least("dst", "mn").alias("lbl")
        )
        .localCheckpoint(eager=False)
    )
    prev = labels.agg(
        F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    if prev is not None:  # empty pair graph -> all singletons, skip the loop
        converged = False
        for _ in range(max_iters):
            neigh = edges.join(
                labels.withColumnRenamed("v", "dst"), "dst"
            ).select(F.col("src").alias("v"), "lbl")
            prop = labels.union(neigh).groupBy("v").agg(
                F.min("lbl").alias("lbl")
            )
            # pointer-jumping shortcut: label(v) <- label(label(v)).  One
            # extra self-join per round turns O(diameter) convergence into
            # O(log diameter) — a 10^5-long path needs ~17 rounds, not
            # 10^5 (every label IS a vertex id, so the lookup always
            # resolves; left+coalesce guards the invariant anyway).
            lut = prop.select(
                F.col("v").alias("lbl"), F.col("lbl").alias("lbl2")
            )
            labels = (
                prop.join(lut, "lbl", "left")
                .select(
                    "v",
                    F.least(
                        F.col("lbl"), F.coalesce("lbl2", "lbl")
                    ).alias("lbl"),
                )
            ).localCheckpoint(eager=False)
            cur = labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]
            if cur == prev:
                converged = True
                break
            prev = cur
        if not converged:
            # a silently-unconverged fixpoint would hand out WRONG reps;
            # max_iters=20 with doubling covers diameter ~10^6 — hitting
            # this means the pair graph is pathological, not the cap low
            raise ValueError(
                f"cc_clusters did not converge in {max_iters} rounds"
            )
    final = labels
    edges.unpersist(blocking=False)
    lab = (
        documents.select("doc_id")
        .join(final.withColumnRenamed("v", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("lbl", F.col("doc_id")).alias("cluster_rep")
        )
    )
    # size via aggregate + join, not a window: a 10^7-member boilerplate
    # cluster would buffer as ONE window group, while the aggregate
    # combines map-side and AQE splits the skewed join key
    sizes = lab.groupBy("cluster_rep").agg(F.count("*").alias("cluster_size"))
    return lab.join(sizes, "cluster_rep").select(
        "doc_id", "cluster_rep", "cluster_size"
    )


CC_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({MINHASH_PAIRS_ORACLE}) mp
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), reps AS (
  SELECT u AS doc_id, least(u, min(v)) AS cluster_rep FROM reach GROUP BY u
), lab AS (
  SELECT d.doc_id, coalesce(r.cluster_rep, d.doc_id) AS cluster_rep
  FROM documents d LEFT JOIN reps r USING (doc_id)
)
SELECT doc_id, cluster_rep,
       count(*) OVER (PARTITION BY cluster_rep) AS cluster_size
FROM lab
"""


# ---------------------------------------------------------------------------
# duplicate-span detection (exact substring dedup, window-granular)
# ---------------------------------------------------------------------------
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") removes exact substrings >= ~50 tokens shared across documents.
# The suffix-array construction they use is replaced here by the
# distributable window form: hash every W-token window, find hashes seen in
# MORE THAN ONE doc (one map-side-combined aggregate keyed by hash — the
# only big shuffle), then merge each doc's duplicated windows into maximal
# spans with a gaps-and-islands window over (doc_id, position) — per-doc
# group size is bounded by document length, never corpus size.  The window
# stream is derived twice (once into the ownership aggregate, once into
# the probe join — the same shape as onion_dedup): Catalyst cannot reuse
# the exchange because the two branches shuffle different shapes, so the
# corpus is tokenised+hashed twice.  That is deliberate — the single-pass
# alternative (collect_list of (doc_id, pos) per hash) buffers a hot
# boilerplate window's 10^7 occurrences as ONE aggregation group, while
# the join form is AQE-skew-splittable; the extra pass is embarrassingly
# parallel map work with no extra shuffle.  W-granular
# means a shared substring is reported iff it spans >= W tokens, and span
# boundaries are token-exact at both ends (every covered window is dup).

DUP_SPAN_W = 8


def dup_spans(documents: DataFrame, window: int = DUP_SPAN_W) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows): maximal token-index spans
    [span_start, span_end] (1-based, inclusive) covered by `window`-token
    windows that also occur verbatim in at least one OTHER document."""
    wins = documents.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(split(text, ' ')) >= {window} THEN "
                f"transform(sequence(1, size(split(text, ' ')) - {window} + 1),"
                f" i -> named_struct('i', i, 'h',"
                f" md5(concat_ws(' ', slice(split(text, ' '), i, {window}))))) "
                f"ELSE array() END"
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.i").alias("i"), F.col("w.h").alias("h"))
    # round 7: "seen in >1 doc" as max(doc_id) > min(doc_id) — the same
    # predicate without countDistinct's Expand-based double aggregation
    cross_doc = (
        wins.groupBy("h")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mx") > F.col("_mn"))
        .select("h")
    )
    dup = wins.join(cross_doc, "h").withColumn(
        "e", F.col("i") + F.lit(window - 1)
    )
    by_pos = Window.partitionBy("doc_id").orderBy("i")
    prev_max_end = F.max("e").over(
        by_pos.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "new_span",
        F.when(prev_max_end.isNull() | (F.col("i") > prev_max_end), 1).otherwise(0),
    ).withColumn("span_id", F.sum("new_span").over(by_pos))
    return (
        flagged.groupBy("doc_id", "span_id")
        .agg(
            F.min("i").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


DUP_SPANS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks
), wins AS (
  SELECT doc_id, i, md5(array_to_string(t[i:i+{DUP_SPAN_W - 1}], ' ')) AS h
  FROM pos WHERE i <= len(t) - {DUP_SPAN_W} + 1
), cross_doc AS (
  SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) > 1
), dup AS (
  SELECT doc_id, i, i + {DUP_SPAN_W - 1} AS e FROM wins
  WHERE h IN (SELECT h FROM cross_doc)
), flagged AS (
  SELECT doc_id, i, e,
         CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR i > max(e) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_span
  FROM dup
), sp AS (
  SELECT doc_id, i, e,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY i) AS span_id
  FROM flagged
)
SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
       CAST(max(e) AS BIGINT) AS span_end, count(*) AS n_windows
FROM sp GROUP BY doc_id, span_id
"""


def remove_dup_spans(documents: DataFrame, window: int = DUP_SPAN_W) -> DataFrame:
    """(doc_id, clean_text, n_removed): the removal half of exact substring
    dedup — every token covered by a `window`-token window whose FIRST
    occurrence (min doc_id) is in another document is cut; the first-seer
    keeps its copy (Lee et al. 2022 keep-one semantics, onion-style
    first-wins ownership).  Every document appears; clean_text == text
    when nothing was removed, '' when everything was.

    Plan: the window-hash ownership aggregate is the one corpus-wide
    shuffle (map-side combined); redundant window starts then collapse to
    ONE array row per affected doc, and the text re-attaches through a
    doc_id-keyed join (the same re-attach shape as onion's scored join).
    Token filtering is a JVM higher-order `filter` with an `exists` over
    the starts array — per-doc cost O(tokens x spans), no Python."""
    wins = documents.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(split(text, ' ')) >= {window} THEN "
                f"transform(sequence(1, size(split(text, ' ')) - {window} + 1),"
                f" i -> named_struct('i', i, 'h',"
                f" md5(concat_ws(' ', slice(split(text, ' '), i, {window}))))) "
                f"ELSE array() END"
            )
        ).alias("w"),
    ).select("doc_id", F.col("w.i").alias("i"), F.col("w.h").alias("h"))
    # round 7: a window can only be redundant (doc_id > owner) when its
    # hash spans MORE THAN ONE doc — filtering the ownership table to
    # max(doc_id) > min(doc_id) shrinks the join's build side from every
    # distinct window hash to the cross-doc-shared tail (exact: windows
    # confined to one doc always have owner == doc_id and contributed
    # nothing downstream)
    owners = (
        wins.groupBy("h")
        .agg(F.min("doc_id").alias("owner"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mx") > F.col("owner"))
        .select("h", "owner")
    )
    starts = (
        wins.join(owners, "h")
        .filter(F.col("doc_id") > F.col("owner"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("i")).alias("starts"))
    )
    # Round 7 (VERDICT r6 #2): merge the raw window starts into DISJOINT
    # maximal [s, e] spans before the per-token filter — the r6 form
    # scanned the raw starts list per token, O(tokens × windows) for a
    # heavily duplicated doc (starts ≈ tokens → quadratic per doc); the
    # merged form scans O(spans).  Equivalent coverage by construction:
    # starts is sorted, each start covers [s, s+W-1], and adjacent-or-
    # overlapping windows (next start ≤ prev end + 1) union into exactly
    # one interval — the same gaps-and-islands merge dup_spans uses.
    # Linear merge: with fixed width W every interval is [x, x+W-1] and
    # starts is ascending, so two consecutive starts belong to one span
    # iff next <= prev + W; a span's head is a start that breaks that
    # chain, its tail the start before the next break — heads and tails
    # align 1:1 and zip into the disjoint spans.  (An aggregate() fold
    # building the span array would COPY the accumulator per element —
    # O(starts × spans) allocations, measured slower than the unmerged
    # form at sf1.0 — the filter/zip_with form is one linear pass.)
    merged = F.expr(
        f"zip_with("
        f"filter(starts, (x, j) -> j = 0 OR x > element_at(starts, j) + {window}), "
        f"filter(starts, (x, j) -> j = size(starts) - 1 "
        f"OR element_at(starts, j + 2) > x + {window}), "
        f"(h, t) -> named_struct('s', h, 'e', t + {window} - 1))"
    )
    return (
        documents.join(starts, "doc_id", "left")
        .withColumn("spans", merged)
        .withColumn(
            "kept",
            F.expr(
                f"CASE WHEN starts IS NULL THEN split(text, ' ') ELSE "
                f"filter(split(text, ' '), (tok, j) -> NOT exists(spans,"
                f" m -> j + 1 >= m.s AND j + 1 <= m.e)) END"
            ),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("kept")).alias("clean_text"),
            (F.size(F.split(F.col("text"), " ")) - F.size("kept"))
            .cast("long")
            .alias("n_removed"),
        )
    )


REMOVE_DUP_SPANS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), pos AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks
), wins AS (
  SELECT doc_id, i, md5(array_to_string(t[i:i+{DUP_SPAN_W - 1}], ' ')) AS h
  FROM pos WHERE i <= len(t) - {DUP_SPAN_W} + 1
), own AS (
  SELECT h, min(doc_id) AS owner FROM wins GROUP BY h
), red AS (
  SELECT w.doc_id, w.i FROM wins w JOIN own o USING (h)
  WHERE w.doc_id > o.owner
), rem AS (
  SELECT DISTINCT p.doc_id, p.i FROM pos p
  JOIN red r ON r.doc_id = p.doc_id
            AND p.i >= r.i AND p.i <= r.i + {DUP_SPAN_W - 1}
), kept AS (
  SELECT p.doc_id, p.i, p.t[p.i] AS tok FROM pos p
  ANTI JOIN rem USING (doc_id, i)
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), n AS (
  SELECT doc_id, len(t) AS n_tokens FROM toks
)
SELECT n.doc_id, coalesce(a.clean_text, '') AS clean_text,
       CAST(n.n_tokens - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM n LEFT JOIN agg a USING (doc_id)
"""
