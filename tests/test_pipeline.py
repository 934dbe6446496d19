"""Training-data pipeline ops: semantic checks beyond the oracle equality
(which test_entry_oracle covers) — ANN recall, streaming/batch equivalence,
multimodal plumbing, langid sanity."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )


class TestDedup:
    def test_ngram_jaccard_kernel_matches_join_form(self, spark):
        """Round 7 replaced ngram_jaccard_pairs' gram self-join with a
        per-source pair-count kernel; prove exact equality against the
        pre-round-7 JVM join form on a corpus with hot shared grams,
        multiple sources, singleton sources and short docs."""
        from macocu_crawler_spark.pipeline.dedup_text import (
            _shingles,
            ngram_jaccard_pairs,
        )

        import random

        rng = random.Random(42)
        vocab = [f"w{i}" for i in range(30)]
        rows = []
        for d in range(120):
            src = f"s{d % 3}"
            toks = [rng.choice(vocab) for _ in range(rng.randint(1, 40))]
            rows.append((d, src, " ".join(toks)))
        rows.append((900, "lonely", "a b c d e"))
        rows.append((901, "s0", "x"))  # single-token doc
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

        def join_form(documents, threshold, n):
            grams = documents.select(
                "doc_id", "source", F.explode(_shingles(n)).alias("g")
            ).dropDuplicates(["doc_id", "g"])
            sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
            a = grams.select("source", F.col("doc_id").alias("doc_a"), "g")
            b = grams.select("source", F.col("doc_id").alias("doc_b"), "g")
            inter = (
                a.join(b, ["source", "g"])
                .filter(F.col("doc_a") < F.col("doc_b"))
                .groupBy("doc_a", "doc_b")
                .agg(F.count("*").alias("n_inter"))
            )
            sa = sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na")
            )
            sb = sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb")
            )
            return (
                inter.join(sa, "doc_a").join(sb, "doc_b")
                .withColumn(
                    "jaccard",
                    F.round(
                        F.col("n_inter")
                        / (F.col("na") + F.col("nb") - F.col("n_inter")),
                        4,
                    ),
                )
                .filter(F.col("jaccard") >= threshold)
                .select("doc_a", "doc_b", "jaccard")
            )

        from macocu_crawler_spark.pipeline import dedup_text as dt

        want_low = sorted(tuple(r) for r in join_form(docs, 0.02, 2).collect())
        assert len(want_low) > 5, "vacuous corpus"
        # three kernel regimes: dense bincount (default), sparse merge,
        # and sparse merge with tiny emission chunks — identical output
        for dense_limit, chunk_rows in (
            (dt._NGRAM_DENSE_LIMIT, dt._NGRAM_CHUNK_ROWS),
            (1, dt._NGRAM_CHUNK_ROWS),
            (1, 64),
        ):
            old = dt._NGRAM_DENSE_LIMIT, dt._NGRAM_CHUNK_ROWS
            dt._NGRAM_DENSE_LIMIT, dt._NGRAM_CHUNK_ROWS = dense_limit, chunk_rows
            try:
                for thr, want in (
                    (0.02, want_low),
                    (0.1, sorted(tuple(r) for r in join_form(docs, 0.1, 2).collect())),
                ):
                    got = sorted(
                        tuple(r) for r in ngram_jaccard_pairs(docs, thr).collect()
                    )
                    assert got == want, (dense_limit, chunk_rows, thr, len(got))
            finally:
                dt._NGRAM_DENSE_LIMIT, dt._NGRAM_CHUNK_ROWS = old

    def test_exact_dedup_finds_injected_dup(self, spark, docs):
        from macocu_crawler_spark.pipeline.dedup_text import exact_dedup

        one = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
        with_dup = docs.unionByName(one)
        res = exact_dedup(with_dup)
        assert res.count() == docs.count()  # duplicate collapsed
        assert res.agg(F.sum("dup_count")).first()[0] == 1

    def test_minhash_identical_docs_share_all_bands(self, spark, docs):
        from macocu_crawler_spark.pipeline.dedup_text import (
            LSH_BANDS,
            minhash_lsh_pairs,
        )

        one = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
        pairs = minhash_lsh_pairs(docs.unionByName(one))
        injected = pairs.filter(F.col("doc_b") >= 100000).collect()
        assert len(injected) >= 1
        assert injected[0].n_bands == LSH_BANDS

    def test_onion_dedup_drops_resembling_doc(self, spark):
        """Onion-style n-gram resemblance: a doc that is a superset of an
        earlier doc scores a high duplicate ratio and is dropped; unique
        docs keep; docs shorter than the n-gram order yield no row."""
        from macocu_crawler_spark.pipeline.dedup_text import onion_dedup

        docs = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j"),
                (2, "a b c d e f g h i j k"),   # superset of doc 1
                (3, "z y x w v u t s r q"),     # unique
                (4, "kort"),                    # < ONION_N tokens
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in onion_dedup(docs).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1].keep and out[1].dup_ratio == 0.0  # first-seen wins
        assert not out[2].keep and out[2].dup_ratio > 0.8
        assert out[3].keep
        # occurrence counts: doc 2 has 11 tokens → 7 5-grams, 6 duplicate
        assert (out[2].n_grams, out[2].n_dup) == (7, 6)

    def test_simhash_is_16bit(self, docs):
        from macocu_crawler_spark.pipeline.dedup_text import simhash

        mx = simhash(docs).agg(F.max("simhash"), F.min("simhash")).first()
        assert 0 <= mx[1] and mx[0] < 2**16

    def test_simhash64_finds_injected_near_dup(self, spark, docs):
        """A doc with ONE token changed lands within Hamming ≤ 3 of the
        original and the banded join surfaces the pair (VERDICT r1 #6)."""
        from macocu_crawler_spark.pipeline.dedup_text import simhash64_dup_pairs

        base = docs.limit(8)
        near = base.limit(1).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" ekstra")).alias("text"),
            *[c for c in ("source", "lang") if c in docs.columns],
        )
        pairs = simhash64_dup_pairs(
            base.select("doc_id", "text").unionByName(near.select("doc_id", "text")),
            max_hamming=16,
        )
        injected = pairs.filter(F.col("doc_b") >= 200000).collect()
        assert len(injected) == 1
        exact = base.limit(1).select((F.col("doc_id") + 300000).alias("doc_id"), "text")
        pairs0 = simhash64_dup_pairs(
            base.select("doc_id", "text").unionByName(exact), max_hamming=0
        )
        assert pairs0.filter(F.col("doc_b") >= 300000).first().hamming == 0


class TestClusterCanon:
    def test_cc_transitive_chain_converges(self, spark):
        """A path graph 1-2-3-...-8 (diameter 7, needs multiple label-
        propagation rounds) collapses to one cluster with rep=1; an
        isolated pair and a singleton stay separate."""
        from macocu_crawler_spark.pipeline.dedup_text import cc_clusters

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(1, 12)], "doc_id long, text string"
        )
        chain = [(i, i + 1) for i in range(1, 8)]  # 1..8 path
        pairs = spark.createDataFrame(
            chain + [(9, 10)], "doc_a long, doc_b long"
        )
        out = {r.doc_id: r for r in cc_clusters(docs, pairs=pairs).collect()}
        assert set(out) == set(range(1, 12))
        for i in range(1, 9):
            assert out[i].cluster_rep == 1 and out[i].cluster_size == 8
        for i in (9, 10):
            assert out[i].cluster_rep == 9 and out[i].cluster_size == 2
        assert out[11].cluster_rep == 11 and out[11].cluster_size == 1

    def test_cc_long_chain_needs_pointer_jumping(self, spark):
        """A 100-vertex path has diameter 99 > max_iters: plain label
        propagation cannot converge in 20 rounds — the pointer-jumping
        shortcut must (O(log diameter)), ending with rep=1 everywhere."""
        from macocu_crawler_spark.pipeline.dedup_text import cc_clusters

        docs = spark.createDataFrame(
            [(i, "x") for i in range(1, 101)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 100)], "doc_a long, doc_b long"
        )
        out = cc_clusters(docs, pairs=pairs).collect()
        assert all(r.cluster_rep == 1 and r.cluster_size == 100 for r in out)

    def test_cc_no_pairs_all_singletons(self, spark):
        from macocu_crawler_spark.pipeline.dedup_text import cc_clusters

        docs = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        out = {r.doc_id: r for r in cc_clusters(docs, pairs=pairs).collect()}
        assert all(
            r.cluster_rep == d and r.cluster_size == 1 for d, r in out.items()
        )

    def test_cc_identical_docs_cluster_via_minhash(self, spark, docs):
        """Default pair source: two identical copies of one doc cluster
        with the original (rep = min doc_id of the three)."""
        from macocu_crawler_spark.pipeline.dedup_text import cc_clusters

        base = docs.limit(1)
        base_id = base.first().doc_id
        copies = base.select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang",
            "source", "n_chars",
        ).unionByName(
            base.select(
                (F.col("doc_id") + 600000).alias("doc_id"), "text", "lang",
                "source", "n_chars",
            )
        )
        out = cc_clusters(docs.unionByName(copies))
        hit = {
            r.doc_id: r
            for r in out.filter(F.col("doc_id") >= 500000).collect()
        }
        assert len(hit) == 2
        for r in hit.values():
            assert r.cluster_rep == base_id and r.cluster_size >= 3


class TestSemanticClusters:
    def test_near_identical_embeddings_cluster(self, spark):
        """Two near-identical vectors cluster (rep = min vec_id); an
        orthogonal vector stays a singleton.  Composition check:
        cosine_pairs_lsh pairs -> cc_clusters closure."""
        from macocu_crawler_spark.pipeline.similarity import semantic_clusters

        base = [1.0, 0.2, 0.1, 0.05] * 4           # dim 16
        near = [1.0, 0.2, 0.1, 0.06] * 4           # cos ~ 1
        far = [-1.0, 0.5, -0.3, 1.0] * 4
        emb = spark.createDataFrame(
            [(3, base, "a"), (7, near, "a"), (9, far, "b")],
            "vec_id long, embedding array<double>, label string",
        )
        out = {r.vec_id: r for r in semantic_clusters(emb, threshold=0.9).collect()}
        assert set(out) == {3, 7, 9}
        assert out[3].cluster_rep == 3 and out[7].cluster_rep == 3
        assert out[3].cluster_size == 2 and out[7].cluster_size == 2
        assert out[9].cluster_rep == 9 and out[9].cluster_size == 1


class TestDupSpans:
    def test_shared_run_becomes_one_merged_span(self, spark):
        """A 12-token run shared between two docs yields ONE maximal span
        per doc (overlapping 8-token windows merged), token-exact at both
        ends."""
        from macocu_crawler_spark.pipeline.dedup_text import dup_spans

        shared = " ".join(f"s{i}" for i in range(12))
        docs = spark.createDataFrame(
            [
                (1, shared + " t1 t2 t3 t4 t5"),      # run at tokens 1..12
                (2, "h1 h2 h3 h4 h5 " + shared),      # run at tokens 6..17
                (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),    # no shared window
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in dup_spans(docs).collect()}
        assert set(rows) == {1, 2}
        assert (rows[1].span_start, rows[1].span_end, rows[1].n_windows) == (1, 12, 5)
        assert (rows[2].span_start, rows[2].span_end, rows[2].n_windows) == (6, 17, 5)

    def test_disjoint_runs_stay_separate_spans(self, spark):
        from macocu_crawler_spark.pipeline.dedup_text import dup_spans

        run_a = " ".join(f"a{i}" for i in range(8))
        run_b = " ".join(f"b{i}" for i in range(8))
        gap = " ".join(f"g{i}" for i in range(8))
        docs = spark.createDataFrame(
            [
                (1, f"{run_a} {gap} {run_b}"),
                (2, run_a),
                (3, run_b),
            ],
            "doc_id long, text string",
        )
        spans = sorted(
            (r.span_start, r.span_end)
            for r in dup_spans(docs).filter("doc_id = 1").collect()
        )
        assert spans == [(1, 8), (17, 24)]

    def test_remove_dup_spans_first_seer_keeps(self, spark):
        """Removal half: the min-doc_id owner keeps its copy; later docs
        lose exactly the covered tokens; untouched docs round-trip."""
        from macocu_crawler_spark.pipeline.dedup_text import remove_dup_spans

        shared = " ".join(f"s{i}" for i in range(10))
        docs = spark.createDataFrame(
            [
                (1, shared + " t1 t2"),
                (2, "h1 h2 " + shared),
                (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in remove_dup_spans(docs).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1].clean_text == shared + " t1 t2" and out[1].n_removed == 0
        assert out[2].clean_text == "h1 h2" and out[2].n_removed == 10
        assert out[3].clean_text == "u1 u2 u3 u4 u5 u6 u7 u8 u9"
        assert out[3].n_removed == 0

    def test_remove_dup_spans_full_doc_removed(self, spark):
        from macocu_crawler_spark.pipeline.dedup_text import remove_dup_spans

        t = " ".join(f"w{i}" for i in range(8))
        docs = spark.createDataFrame(
            [(1, t), (2, t)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in remove_dup_spans(docs).collect()}
        assert out[1].clean_text == t and out[1].n_removed == 0
        assert out[2].clean_text == "" and out[2].n_removed == 8

    def test_remove_dup_spans_merged_intervals_worst_case(self, spark):
        """Round 7 (VERDICT r6 #2): the removal filter scans MERGED
        disjoint spans, not raw window starts.  Worst-case shape — one
        long doc duplicated in alternating stretches (~50% covered, many
        separate spans): interleaved shared/unique 12-token stretches, so
        every shared stretch merges to one interval and the unique
        stretches survive verbatim."""
        from macocu_crawler_spark.pipeline.dedup_text import remove_dup_spans

        n_stretch = 40
        shared = [
            " ".join(f"s{k}_{i}" for i in range(12)) for k in range(n_stretch)
        ]
        unique = [
            " ".join(f"u{k}_{i}" for i in range(12)) for k in range(n_stretch)
        ]
        owner_text = " ".join(shared)          # doc 1 owns every window
        victim_text = " ".join(
            s + " " + u for s, u in zip(shared, unique)
        )
        docs = spark.createDataFrame(
            [(1, owner_text), (2, victim_text)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in remove_dup_spans(docs).collect()}
        assert out[1].clean_text == owner_text and out[1].n_removed == 0
        # doc 2: within each stretch pair, the windows fully inside the
        # 12-token shared run are removed; windows straddling into the
        # unique run do not exist in doc 1, so the unique tokens stay
        kept = out[2].clean_text.split(" ")
        assert all(t.startswith("u") for t in kept), kept[:5]
        assert out[2].n_removed == n_stretch * 12
        assert [t for t in kept if t.startswith("u0_")] == [
            f"u0_{i}" for i in range(12)
        ]

    def test_intra_doc_repeat_is_not_cross_doc(self, spark):
        """A window repeated within ONE doc only is not a duplicate span —
        the contract is cross-document sharing."""
        from macocu_crawler_spark.pipeline.dedup_text import dup_spans

        run = " ".join(f"r{i}" for i in range(8))
        docs = spark.createDataFrame(
            [(1, f"{run} x1 x2 {run}"), (2, "q0 q1 q2 q3 q4 q5 q6 q7")],
            "doc_id long, text string",
        )
        assert dup_spans(docs).count() == 0


class TestCuration:
    def test_decontaminate_flags_benchmark_overlap(self, spark):
        """doc 7 (doc_id % 7 == 0) is benchmark; a train doc sharing an
        8-gram with it is flagged, others are clean; benchmark docs are
        excluded from the output."""
        from macocu_crawler_spark.pipeline.curation import decontaminate

        bench_text = " ".join(f"b{i}" for i in range(10))
        docs = spark.createDataFrame(
            [
                (7, bench_text),
                (1, "x1 x2 " + " ".join(f"b{i}" for i in range(8))),
                (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
                (3, "short text"),                      # < 8 tokens: no grams
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in decontaminate(docs).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1].contaminated == 1 and out[1].n_hit_grams == 1
        assert out[2].contaminated == 0 and out[2].n_hit_grams == 0
        assert out[3].contaminated == 0

    def test_decontaminate_explicit_benchmark_table(self, spark):
        """Production form: an explicit benchmark DataFrame scores EVERY
        input doc (no mod carve-out), broadcast-joined."""
        from macocu_crawler_spark.pipeline.curation import decontaminate

        bench = spark.createDataFrame(
            [(0, " ".join(f"e{i}" for i in range(9)))],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                (7, "p0 " + " ".join(f"e{i}" for i in range(8))),  # overlaps
                (14, "z0 z1 z2 z3 z4 z5 z6 z7 z8"),                # clean
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in decontaminate(docs, benchmark=bench).collect()}
        # both docs scored, including ones a mod-7 carve-out would drop
        assert set(out) == {7, 14}
        assert out[7].contaminated == 1 and out[7].n_hit_grams == 1
        assert out[14].contaminated == 0

    def test_lang_quota_greedy_prefix(self, spark):
        """Budget 3/10 of total tokens per language, longest-first, ties by
        doc_id; the doc that CROSSES the budget is included, the next is
        not."""
        from macocu_crawler_spark.pipeline.curation import lang_quota_sample

        def text(n, tag):
            return " ".join(f"{tag}{i}" for i in range(n))

        # en: 100 total tokens -> budget 30: take 40-token doc (crosses), stop
        # de: 20 total -> budget 6: take the first 10-token doc (ties: doc 20)
        docs = spark.createDataFrame(
            [
                (1, "en", text(40, "a")),
                (2, "en", text(35, "b")),
                (3, "en", text(25, "c")),
                (20, "de", text(10, "d")),
                (21, "de", text(10, "e")),
            ],
            "doc_id long, lang string, text string",
        )
        out = {r.doc_id: r for r in lang_quota_sample(docs).collect()}
        assert set(out) == {1, 20}
        assert out[1].cum_tokens == 40
        assert out[20].cum_tokens == 10

    def test_lang_quota_two_phase_equals_naive_window(self, spark, docs):
        """The bucketed two-phase plan must equal the naive global
        cumulative window on the real corpus (same order, same boundary)."""
        from pyspark.sql import Window
        from macocu_crawler_spark.pipeline.curation import (
            QUOTA_DEN, QUOTA_NUM, lang_quota_sample,
        )

        d = docs.select(
            "doc_id", "lang",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        w = Window.partitionBy("lang").orderBy(
            F.col("n_tokens").desc(), F.col("doc_id")
        )
        naive = (
            d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .join(
                d.groupBy("lang").agg(F.sum("n_tokens").alias("tt")), "lang"
            )
            .filter(
                (F.col("cum_tokens") - F.col("n_tokens")) * QUOTA_DEN
                < F.col("tt") * QUOTA_NUM
            )
            .select("doc_id", "lang", "n_tokens", "cum_tokens")
        )
        got = lang_quota_sample(docs)
        assert got.exceptAll(naive).count() == 0
        assert naive.exceptAll(got).count() == 0


class TestRoundHalfUpDifferential:
    def test_matches_spark_round_bitwise(self, spark):
        """similarity.F_round_half_up claims to be a bit-exact replica of
        Spark's F.round (java BigDecimal.valueOf(x).setScale(n, HALF_UP)) —
        the ann_ivf_topk and multimodal_features oracles ride on that
        equivalence, so prove it differentially: Spark rounds a column of
        adversarial doubles, Python rounds the same values, results must
        be IDENTICAL BITS.  Adversarial set: exact decimal ties at the
        target scale (x.xxxx5 — where banker's rounding would diverge),
        tie-adjacent neighbours via nextafter, negatives (HALF_UP must go
        away from zero), magnitudes spanning 1e-8..1e8, and seeded random
        uniforms; scales 0 and 4 (the two the oracles use)."""
        import math
        import random
        import struct

        from macocu_crawler_spark.pipeline.similarity import F_round_half_up

        rng = random.Random(20260817)
        vals: list[float] = []
        for k in range(-40, 40):
            tie = k * 1e-4 + 5e-5  # repr may or may not land on ...5
            vals += [tie, math.nextafter(tie, -math.inf),
                     math.nextafter(tie, math.inf)]
        # exact decimal ties (constructed in decimal, so repr ends in 5)
        vals += [float(f"{s}{i}.{frac:04d}5") for s in ("", "-")
                 for i in (0, 1, 7) for frac in (0, 1, 2499, 5000, 9999)]
        vals += [k * 0.5 for k in range(-21, 21)]  # scale-0 .5 ties
        vals += [rng.uniform(-1, 1) * 10 ** rng.randint(-8, 8)
                 for _ in range(2000)]
        for scale in (0, 4):
            df = spark.createDataFrame(
                [(i, v) for i, v in enumerate(vals)], "i long, x double"
            ).select("i", F.round("x", scale).alias("r"))
            got = {r.i: r.r for r in df.collect()}
            for i, v in enumerate(vals):
                mine = F_round_half_up(v, scale)
                assert struct.pack("<d", got[i]) == struct.pack("<d", mine), (
                    scale, v, got[i], mine
                )


class TestGroupedCosineGrid:
    def test_block_pair_grid_equals_single_group_kernel(self, spark):
        """Round 7's block-pair grid (each blocking group split into
        id-hash blocks, one task per unordered block pair) must emit
        exactly the same pair set as the one-task-per-group kernel —
        every unordered pair lands in exactly one (min,max) block-pair
        group.  Forced via n_groups_hint: a huge hint ⇒ n_splits=1
        (diagonal only), a tiny hint ⇒ a real grid."""
        import random

        from pyspark.sql import functions as F

        from macocu_crawler_spark.pipeline.similarity import (
            _grouped_cosine_pairs,
        )

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)], i % 2)
            for i in range(300)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        single = sorted(
            tuple(r)
            for r in _grouped_cosine_pairs(
                emb, "label", 0.2, n_groups_hint=10_000
            ).collect()
        )
        grid = sorted(
            tuple(r)
            for r in _grouped_cosine_pairs(
                emb, "label", 0.2, n_groups_hint=1
            ).collect()
        )
        assert len(single) > 20, "vacuous corpus"
        assert single == grid


class TestLloydVectorised:
    """Round 7 vectorised the driver-side Lloyd trainer (numpy) and gave
    F_round_half_up a non-Decimal fast path; both claim BIT equality with
    the old scalar forms — prove it against inline scalar references."""

    @staticmethod
    def _scalar_lloyd(units, n_cells, n_iter):
        # the pre-round-7 pure-Python trainer, kept verbatim as reference
        from macocu_crawler_spark.pipeline.similarity import F_round_half_up as r

        centroids = [[r(x, 4) for x in u] for u in units[:n_cells]]
        dim = len(units[0]) if units else 0
        scaled = [[int(r(x * 1e6, 0)) for x in u] for u in units]

        def d2_of(u, c):
            acc = 0.0
            for a, b in zip(u, c):
                d = a - b
                acc = acc + d * d
            return r(acc, 4)

        cells = range(len(centroids))
        for _ in range(n_iter):
            members = [[] for _ in cells]
            for j, u in enumerate(units):
                best = min((d2_of(u, centroids[cell]), cell) for cell in cells)
                members[best[1]].append(j)
            for cell in cells:
                if members[cell]:
                    m = len(members[cell])
                    centroids[cell] = [
                        r(float(sum(scaled[j][p] for j in members[cell]))
                          / (1e6 * m), 4)
                        for p in range(dim)
                    ]
        return centroids

    def test_vectorised_lloyd_bitwise_equals_scalar(self):
        import random
        import struct
        from math import sqrt

        from macocu_crawler_spark.pipeline.similarity import lloyd_fixed_point

        rng = random.Random(20260821)
        for n, dim, cells, iters in ((40, 8, 4, 6), (257, 16, 8, 10)):
            raw = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]
            units = []
            for v in raw:
                acc = 0.0
                for x in v:
                    acc = acc + x * x
                nrm = sqrt(acc)
                units.append([x / nrm for x in v])
            got = lloyd_fixed_point(units, n_cells=cells, n_iter=iters)
            want = self._scalar_lloyd(units, n_cells=cells, n_iter=iters)
            assert len(got) == len(want)
            for g, w in zip(got, want):
                for a, b in zip(g, w):
                    assert struct.pack("<d", a) == struct.pack("<d", b), (a, b)

    def test_array_rounder_matches_scalar(self):
        import math
        import random
        import struct

        import numpy as np

        from macocu_crawler_spark.pipeline.similarity import (
            _round_half_up_arr,
            _round_half_up_decimal,
        )

        rng = random.Random(7)
        vals = []
        for k in range(-40, 40):
            tie = k * 1e-4 + 5e-5
            vals += [tie, math.nextafter(tie, -math.inf),
                     math.nextafter(tie, math.inf)]
        vals += [float(f"{s}{i}.{frac:04d}5") for s in ("", "-")
                 for i in (0, 1, 7) for frac in (0, 1, 2499, 5000, 9999)]
        vals += [k * 0.5 for k in range(-21, 21)]
        vals += [rng.uniform(-1, 1) * 10 ** rng.randint(-8, 8)
                 for _ in range(2000)]
        vals += [1.5e12, -3.7e13]  # beyond the fast-path magnitude gate
        for scale in (0, 4):
            got = _round_half_up_arr(np.array(vals), scale)
            for v, g in zip(vals, got):
                want = _round_half_up_decimal(v, scale)
                assert struct.pack("<d", float(g)) == struct.pack("<d", want), (
                    scale, v, g, want
                )


class TestSimilarity:
    def test_ann_lsh_recall_floor(self, emb):
        """Quality gate (VERDICT r1 #5): multi-table LSH ANN must recover
        ≥ 0.8 of the exact top-5 on the sf embeddings."""
        from macocu_crawler_spark.pipeline.similarity import (
            ann_bruteforce_topk,
            ann_lsh_topk,
        )

        exact = {
            (r.query_id, r.neighbor_id) for r in ann_bruteforce_topk(emb).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id) for r in ann_lsh_topk(emb).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"LSH ANN recall {recall:.2f} below 0.8 floor"

    def test_ann_ivf_recall_floor(self, emb):
        """The IVF (k-means cell) ANN path must clear the same 0.8 recall
        floor as the LSH path, and be deterministic under the fixed seed."""
        from macocu_crawler_spark.pipeline.similarity import (
            ann_bruteforce_topk,
            ann_ivf_topk,
        )

        exact = {
            (r.query_id, r.neighbor_id) for r in ann_bruteforce_topk(emb).collect()
        }
        approx = {(r.query_id, r.neighbor_id) for r in ann_ivf_topk(emb).collect()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"IVF ANN recall {recall:.2f} below 0.8 floor"
        again = {(r.query_id, r.neighbor_id) for r in ann_ivf_topk(emb).collect()}
        assert approx == again

    def test_ann_ivf_det_recall_floor_and_determinism(self, emb):
        """The DETERMINISTIC quantizer variant (md5-seeded init + rounded
        Lloyd's — the driver-entry path, oracle-checked) must clear the
        same 0.8 floor and be partitioning-independent: the same rows
        regardless of input layout."""
        from macocu_crawler_spark.pipeline.similarity import (
            ann_bruteforce_topk,
            ann_ivf_det_topk,
        )

        exact = {
            (r.query_id, r.neighbor_id) for r in ann_bruteforce_topk(emb).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id) for r in ann_ivf_det_topk(emb).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"det-IVF recall {recall:.2f} below 0.8 floor"
        again = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_det_topk(emb.repartition(7)).collect()
        }
        assert approx == again

    def test_ann_lsh_recall_column(self, emb):
        """ann_lsh_with_recall rows carry per-query recall@k; the mean must
        clear the same floor (this is the form the driver grades)."""
        from macocu_crawler_spark.pipeline.similarity import ann_lsh_with_recall

        rows = ann_lsh_with_recall(emb).collect()
        per_query = {r.query_id: r.recall_at_k for r in rows}
        mean_recall = sum(per_query.values()) / len(per_query)
        assert mean_recall >= 0.8, f"mean recall@5 {mean_recall:.2f} < 0.8"

    def test_cosine_self_similarity(self, emb):
        from macocu_crawler_spark.pipeline.similarity import _cos

        a = emb.select(
            F.col("embedding").alias("ea"), F.col("embedding").alias("eb")
        ).withColumn("c", F.round(_cos("ea", "eb"), 4))
        assert a.filter(F.col("c") != 1.0).count() == 0


class TestStreamingIngest:
    def test_streaming_extract_equals_batch(self, spark, fixture_dir, tmp_path):
        """The FULL extract pipeline under Structured Streaming: pages
        landing files drained with availableNow through the same
        mapInPandas stage as the batch path must yield the same accepted,
        deduped document set (txt_hash level) as batch extract."""
        from macocu_crawler_spark.operators.extract import extract_documents
        from macocu_crawler_spark.streaming.ingest import run_ingest

        pages = (
            spark.read.parquet(f"{fixture_dir}/pages.parquet")
            .withColumn("wpage_id", F.monotonically_increasing_id())
            .select("wpage_id", "url", "warc_ts", "html", "http_header", "ip")
            .cache()
        )
        landing = str(tmp_path / "landing")
        # several landing files → several micro-batches
        pages.repartition(3).write.parquet(landing)
        out, ckpt = str(tmp_path / "docs"), str(tmp_path / "ckpt")
        run_ingest(spark, landing, out, ckpt)

        streamed = spark.read.parquet(out)
        batch = extract_documents(pages).filter(F.col("txt_len") > 0)
        s_hashes = {r.txt_hash for r in streamed.select("txt_hash").collect()}
        b_hashes = {r.txt_hash for r in batch.select("txt_hash").collect()}
        assert s_hashes == b_hashes and len(s_hashes) > 0
        # dedup: one doc per hash in the sink
        assert streamed.count() == len(s_hashes)
        # prevert bytes of the kept docs match the batch pipeline for the
        # same wpage_id (same code path, so byte-identical)
        kept = {r.wpage_id: r.prevert for r in streamed.collect()}
        bmap = {r.wpage_id: r.prevert for r in batch.collect()}
        assert all(bmap[w] == p for w, p in kept.items())

    def test_dedup_horizon_ages_state_out(self, spark, fixture_dir, tmp_path):
        """The documented corpus-scale contract of dedup_horizon (VERDICT r3
        #5): dropDuplicatesWithinWatermark bounds dedup state — a duplicate
        arriving INSIDE the horizon is dropped, but once the watermark has
        passed first-seen + horizon the state ages out and a later
        duplicate IS re-admitted.  Four single-file micro-batches:

          b1: P0 (hash H, t0)            → emitted
          b2: P1 (hash H, t0+5m)         → dropped (within 30m horizon)
          b3: Q  (hash G, t0+3h)         → emitted; watermark advances to
                                           t0+2h30m after this batch
          b4: R  (hash I, t0+3h+1m)      → emitted; state cleanup runs with
                                           the advanced watermark, evicting
                                           H's entry (expiry t0+35m) — the
                                           eviction lands one batch after
                                           the advance (verified empirically)
          b5: P2 (hash H, t0+3h+10m)     → RE-ADMITTED (state aged out)
        """
        import datetime as dt
        import os
        import time

        from macocu_crawler_spark.streaming.ingest import run_ingest

        pages = (
            spark.read.parquet(f"{fixture_dir}/pages.parquet")
            .withColumn("wpage_id", F.monotonically_increasing_id())
            .select("wpage_id", "url", "warc_ts", "html", "http_header", "ip")
        )
        # two distinct accepted pages: P (duplicated 3×) and Q (the
        # watermark advancer)
        from macocu_crawler_spark.operators.extract import extract_documents

        accepted = extract_documents(pages).filter(F.col("txt_len") > 0)
        hashes = [r.txt_hash for r in
                  accepted.select("txt_hash").distinct().limit(3).collect()]
        assert len(hashes) == 3
        by_hash = {
            r.txt_hash: r.wpage_id
            for r in accepted.filter(F.col("txt_hash").isin(hashes))
            .select("txt_hash", "wpage_id").collect()
        }
        p_row = pages.filter(F.col("wpage_id") == by_hash[hashes[0]]).first()
        q_row = pages.filter(F.col("wpage_id") == by_hash[hashes[1]]).first()
        r_row = pages.filter(F.col("wpage_id") == by_hash[hashes[2]]).first()

        t0 = dt.datetime(2023, 8, 15, 10, 0, 0)
        batches = [
            (1000, p_row, t0),
            (1001, p_row, t0 + dt.timedelta(minutes=5)),
            (2000, q_row, t0 + dt.timedelta(hours=3)),
            (3000, r_row, t0 + dt.timedelta(hours=3, minutes=1)),
            (1002, p_row, t0 + dt.timedelta(hours=3, minutes=10)),
        ]
        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        seen_parts: set[str] = set()
        for i, (wid, row, ts) in enumerate(batches):
            df = spark.createDataFrame(
                [(wid, row.url, ts, bytes(row.html),
                  bytes(row.http_header) if row.http_header else None, row.ip)],
                "wpage_id long, url string, warc_ts timestamp, html binary,"
                " http_header binary, ip string",
            )
            df.coalesce(1).write.mode("append").parquet(landing)
            # the file source orders micro-batches by mtime; pin each new
            # part file to a strictly increasing timestamp in write order
            new = {
                f for f in os.listdir(landing) if f.startswith("part-")
            } - seen_parts
            for fname in new:
                t = time.time() - 1000 + i * 10
                os.utime(os.path.join(landing, fname), (t, t))
            seen_parts |= new
        out, ckpt = str(tmp_path / "docs"), str(tmp_path / "ckpt")
        run_ingest(spark, landing, out, ckpt, dedup_horizon="30 minutes")
        sunk = spark.read.parquet(out).select("wpage_id", "txt_hash").collect()
        got = {r.wpage_id for r in sunk}
        assert 1000 in got          # first occurrence emitted
        assert 1001 not in got      # duplicate inside the horizon: dropped
        assert 2000 in got          # the advancer
        assert 3000 in got          # the eviction batch
        assert 1002 in got          # duplicate after state aged out: re-admitted
        # the same hash is genuinely in the sink twice — bounded state, by design
        assert sum(1 for r in sunk if r.txt_hash == hashes[0]) == 2

    def test_streaming_ingest_resumes_from_checkpoint(self, spark, fixture_dir, tmp_path):
        """Exactly-once: draining, adding a new landing file, and draining
        again with the SAME checkpoint processes only the new file."""
        from macocu_crawler_spark.streaming.ingest import run_ingest

        pages = (
            spark.read.parquet(f"{fixture_dir}/pages.parquet")
            .withColumn("wpage_id", F.monotonically_increasing_id())
            .select("wpage_id", "url", "warc_ts", "html", "http_header", "ip")
            .cache()
        )
        first = pages.filter("wpage_id % 2 = 0")
        second = pages.filter("wpage_id % 2 = 1")
        landing = str(tmp_path / "landing")
        out, ckpt = str(tmp_path / "docs"), str(tmp_path / "ckpt")
        first.coalesce(1).write.mode("append").parquet(landing)
        run_ingest(spark, landing, out, ckpt)
        n1 = spark.read.parquet(out).count()
        second.coalesce(1).write.mode("append").parquet(landing)
        run_ingest(spark, landing, out, ckpt)
        df = spark.read.parquet(out)
        assert df.count() > n1
        # no wpage_id ingested twice
        assert df.count() == df.select("wpage_id").distinct().count()


class TestStreaming:
    def test_stream_equals_batch(self, spark):
        from macocu_crawler_spark.streaming.windows import (
            run_stream_to_memory,
            windowed_counts_batch,
        )

        stream_out = run_stream_to_memory(spark, SF_DIR, table="t_stream_eq")
        batch_out = windowed_counts_batch(spark, SF_DIR)
        s = {tuple(r) for r in stream_out.collect()}
        b = {tuple(r) for r in batch_out.collect()}
        assert s == b and len(s) > 0


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from macocu_crawler_spark.pipeline.multimodal import (
            FEATURE_DIM,
            extract_features,
            synthetic_media,
        )

        media = synthetic_media(spark, n=32)
        feats = extract_features(media)
        rows = feats.collect()
        assert len(rows) == 32
        assert all(len(r.feature) == FEATURE_DIM for r in rows)
        assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)
        # determinism: same payload -> same feature
        again = {r.media_id: r.feature for r in extract_features(media).collect()}
        assert all(again[r.media_id] == r.feature for r in rows)

    def test_compressed_formats_still_marked_todo(self, spark):
        """PNG/MP4 need PIL/ffmpeg (absent here) — the real decoder refuses
        them rather than faking; 'auto' mode falls back to the marked fake."""
        from macocu_crawler_spark.pipeline.multimodal import _decode_real

        with pytest.raises(NotImplementedError):
            _decode_real("image", b"\x89PNG")
        with pytest.raises(NotImplementedError):
            _decode_real("video", b"\x00\x00\x00\x18ftyp")

    # malformed web media: each raises a PARSE error (not
    # NotImplementedError) in the strict decoder, and must degrade to the
    # digest fake in 'auto' / pass through in resize — never fail the task
    MALFORMED = [
        ("image", b"BM" + b"\x00" * 8 + b"\xff\xff\x00\x00" + b"\x28" + b"\x00" * 60),
        ("image", b"P5\nnotanumber 4\n255\n\x00\x01"),  # non-numeric PNM header
        ("image", b"BM\x36\x00"),                        # truncated BMP header
        ("audio", b"RIFF\x10\x00\x00\x00WAVEfmt "),      # truncated WAV
        ("video", b"RIFF\x10\x00\x00\x00AVI LIST"),      # truncated AVI list
    ]

    def test_malformed_payloads_degrade_not_crash(self, spark):
        """ADVICE r3: untrusted web bytes that defeat the parsers (truncated
        BMP, junk PNM header, lying RIFF sizes) raise ValueError/struct.error
        — 'auto' must fall back to the digest fake instead of failing the
        Spark task."""
        import numpy as np

        from macocu_crawler_spark.pipeline.multimodal import (
            MEDIA_SCHEMA,
            _decode_fake,
            _decode_real,
            _parse_errors,
            extract_features,
        )

        # every fixture genuinely defeats the strict decoder, and none of
        # them by NotImplementedError alone (that path was already handled)
        for kind, payload in self.MALFORMED:
            with pytest.raises(_parse_errors()):
                _decode_real(kind, payload)

        rows = [
            (i, kind, bytearray(payload), "application/octet-stream", 4, 2, 100)
            for i, (kind, payload) in enumerate(self.MALFORMED)
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        feats = {r.media_id: r.feature for r in extract_features(media).collect()}
        assert len(feats) == len(self.MALFORMED)
        for i, (kind, payload) in enumerate(self.MALFORMED):
            assert np.allclose(feats[i], _decode_fake(kind, payload))

    def test_malformed_image_resize_passes_through(self, spark):
        from macocu_crawler_spark.pipeline.multimodal import (
            MEDIA_SCHEMA,
            resize_media,
        )

        rows = [
            (i, kind, bytearray(payload), "application/octet-stream", 4, 2, 100)
            for i, (kind, payload) in enumerate(self.MALFORMED)
        ]
        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r.media_id: bytes(r.payload) for r in resize_media(media, 2, 2).collect()}
        for i, (_kind, payload) in enumerate(self.MALFORMED):
            assert out[i] == payload  # untouched

    def test_real_decoder_covers_every_fixture_kind(self, spark):
        """decoder='real' (raise-where-unimplemented) succeeds over the
        WHOLE synthetic media table: BMP images, WAV audio and AVI video are
        all really decoded — the digest fake is used for no fixture kind."""
        from macocu_crawler_spark.pipeline.multimodal import (
            FEATURE_DIM,
            _decode_fake,
            extract_features,
            synthetic_media,
        )

        media = synthetic_media(spark, n=24)
        rows = extract_features(media, decoder="real").collect()
        assert len(rows) == 24
        assert {r.kind for r in rows} == {"image", "audio", "video"}
        assert all(len(r.feature) == FEATURE_DIM for r in rows)
        # and none of them equals the digest fake of the same payload
        payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
        import numpy as np

        for r in rows:
            fake = _decode_fake(r.kind, payloads[r.media_id])
            assert not np.allclose(np.array(r.feature), fake)

    def test_real_image_decoder(self):
        import numpy as np

        from macocu_crawler_spark.pipeline.multimodal import (
            _decode_real,
            _parse_bmp_rgb,
            synthetic_bmp,
        )

        b5, b6 = synthetic_bmp(5), synthetic_bmp(6)
        f5, f6 = _decode_real("image", b5), _decode_real("image", b6)
        assert f5.shape == f6.shape == (16,)
        assert not np.allclose(f5, f6)  # per-index patterns differ
        assert np.array_equal(f5, _decode_real("image", synthetic_bmp(5)))
        # odd-width stride padding round-trips exactly
        from macocu_crawler_spark.pipeline.multimodal import _bmp_bytes, _pattern_rgb

        rgb = _pattern_rgb(3, 33, 24)
        assert np.array_equal(_parse_bmp_rgb(_bmp_bytes(rgb)), rgb)

    def test_real_video_decoder_routes_through_image_path(self):
        """AVI frames are decoded with the same DIB layout as BMP and the
        video feature is the mean of per-frame image features."""
        import numpy as np

        from macocu_crawler_spark.pipeline.multimodal import (
            VIDEO_SAMPLE_FRAMES,
            _decode_real,
            _image_features,
            _parse_avi_frames,
            synthetic_avi,
        )

        avi = synthetic_avi(2, n_frames=7)
        frames = _parse_avi_frames(avi)
        assert len(frames) == 7
        assert not np.allclose(frames[0], frames[3])
        idx = np.linspace(0, 6, VIDEO_SAMPLE_FRAMES).round().astype(int)
        expected = np.mean([_image_features(frames[i]) for i in idx], axis=0)
        assert np.allclose(_decode_real("video", avi), expected, atol=1e-6)

    def test_resize_media_real(self, spark):
        import numpy as np

        from macocu_crawler_spark.pipeline.multimodal import (
            _image_rgb,
            resize_media,
            synthetic_media,
        )

        media = synthetic_media(spark, n=12)
        out = resize_media(media, 8, 6)
        imgs = out.filter("kind = 'image'").collect()
        assert imgs and all(r.meta_width == 8 and r.meta_height == 6 for r in imgs)
        for r in imgs:
            rgb = _image_rgb(bytes(r.payload))
            assert rgb.shape == (6, 8, 3)
        # non-image payloads pass through untouched
        orig_audio = {r.media_id: bytes(r.payload)
                      for r in media.filter("kind = 'audio'").collect()}
        for r in out.filter("kind = 'audio'").collect():
            assert bytes(r.payload) == orig_audio[r.media_id]
        # nearest-neighbour: resizing to the same size is identity
        same = resize_media(media, 32, 24).filter("media_id = 0").collect()[0]
        src = media.filter("media_id = 0").collect()[0]
        assert np.array_equal(
            _image_rgb(bytes(same.payload)), _image_rgb(bytes(src.payload))
        )

    def test_real_audio_decoder(self, spark):
        """The audio path is REAL (stdlib wave): distinct frequencies give
        distinct RMS-slice features; decoding is deterministic."""
        import numpy as np

        from macocu_crawler_spark.pipeline.multimodal import (
            FEATURE_DIM,
            _decode_real,
            synthetic_wav,
        )

        f1 = _decode_real("audio", synthetic_wav(1))
        f2 = _decode_real("audio", synthetic_wav(2))
        assert f1.shape == (FEATURE_DIM,) and f2.shape == (FEATURE_DIM,)
        assert not np.allclose(f1, f2)
        assert np.array_equal(f1, _decode_real("audio", synthetic_wav(1)))
        # the amplitude step is visible: later slices carry more energy
        assert f1[:FEATURE_DIM // 2].mean() < f1[FEATURE_DIM // 2:].mean()

    def test_multimodal_features_feed_similarity(self, spark):
        """E2E (VERDICT r1 #10): extract_features → similarity ops.  An
        exact-duplicate payload must surface as the rank-1 ANN neighbour
        with cosine 1.0; self-similarity of every feature is 1.0."""
        from macocu_crawler_spark.pipeline import similarity
        from macocu_crawler_spark.pipeline.multimodal import (
            extract_features,
            synthetic_media,
        )

        media = synthetic_media(spark, n=24)
        feats = extract_features(media)
        emb = feats.select(
            F.col("media_id").cast("long").alias("vec_id"),
            F.col("feature").cast("array<double>").alias("embedding"),
            F.col("kind").alias("label"),
        )
        dup = emb.filter("vec_id < 6").withColumn(
            "vec_id", F.col("vec_id") + 1000
        )
        combined = emb.unionByName(dup).cache()
        top1 = {
            r.query_id: (r.neighbor_id, r.cos)
            for r in similarity.ann_lsh_topk(combined, n_queries=6, k=3)
            .filter("rank = 1")
            .collect()
        }
        assert top1 == {q: (q + 1000, 1.0) for q in range(6)}
        from macocu_crawler_spark.pipeline.similarity import _cos

        self_cos = combined.select(
            F.round(_cos("embedding", "embedding"), 4).alias("c")
        )
        assert self_cos.filter(F.col("c") != 1.0).count() == 0

    def test_frame_sample_plan(self, spark):
        from macocu_crawler_spark.pipeline.multimodal import (
            frame_sample_plan,
            synthetic_media,
        )

        plan = frame_sample_plan(synthetic_media(spark, n=12))
        rows = plan.collect()
        assert all(r.ts_ms == r.frame_idx * 1000 for r in rows)
        assert len(rows) > 0


class TestLangid:
    def test_langid_on_real_language_text(self, spark):
        from macocu_crawler_spark.pipeline.textstats import langid_trigram

        df = spark.createDataFrame(
            [
                (1, "The council announced a new plan to improve the transport."),
                (2, "Kommunen la fram en ny plan for å forbedre kollektivtrafikken."),
            ],
            "doc_id long, text string",
        )
        res = {r.doc_id: r.best_lang for r in langid_trigram(df).collect()}
        assert res == {1: "English", 2: "Norwegian"}

    def test_langid_accuracy_on_labeled_fixture(self, spark):
        """Quality gate (VERDICT r1 #5): 100% accuracy on clean labeled
        samples built from the fixture sentence pools."""
        from macocu_crawler_spark.fixtures import EN_SENTENCES, NO_SENTENCES
        from macocu_crawler_spark.pipeline.textstats import langid_trigram

        rows, labels = [], {}
        doc_id = 0
        for lang, pool in (("English", EN_SENTENCES), ("Norwegian", NO_SENTENCES)):
            for i in range(len(pool) - 2):
                rows.append((doc_id, " ".join(pool[i:i + 3])))
                labels[doc_id] = lang
                doc_id += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        res = {r.doc_id: r.best_lang for r in langid_trigram(df).collect()}
        wrong = {d: (res[d], labels[d]) for d in labels if res[d] != labels[d]}
        assert not wrong, f"langid misclassified: {wrong}"
