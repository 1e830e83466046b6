"""Corpus profiling + deterministic sampling tests."""

from pyspark.sql import functions as F

from eva_opentargets_spark.operators.corpus import corpus_stats, hash_sample


def _docs(spark):
    rows = [(i, f"doc number {i} with the usual words", "en", f"s{i % 2}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_hash_sample_deterministic_and_partition_independent(spark):
    d = _docs(spark)
    s1 = {r.doc_id for r in hash_sample(d, pct=20, salt="x").collect()}
    s2 = {r.doc_id for r in hash_sample(d.repartition(7), pct=20, salt="x").collect()}
    assert s1 == s2 and 0 < len(s1) < 200  # same sample under any partitioning


def test_hash_sample_monotone_and_salt_independent(spark):
    d = _docs(spark)
    small = {r.doc_id for r in hash_sample(d, pct=10, salt="x").collect()}
    big = {r.doc_id for r in hash_sample(d, pct=50, salt="x").collect()}
    assert small <= big  # pct is a bucket threshold: samples are nested
    other = {r.doc_id for r in hash_sample(d, pct=10, salt="y").collect()}
    assert small != other  # a different salt draws a different sample


def test_corpus_stats_one_row_per_stratum(spark):
    out = {(r.source, r.lang): r for r in corpus_stats(_docs(spark)).collect()}
    assert set(out) == {("s0", "en"), ("s1", "en")}
    assert out[("s0", "en")].n_docs == 100
    assert out[("s0", "en")].total_tokens == 100 * 7


def test_decontaminate_counts_distinct_shared_ngrams(spark):
    """Overlap = DISTINCT doc trigrams present anywhere in the benchmark
    set; the flag fires at min_overlap; clean docs report 0."""
    from eva_opentargets_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris", "en", "b")],
        "doc_id long, text string, lang string, source string",
    )
    corpus = spark.createDataFrame(
        [
            # shares trigrams: 'what is the', 'is the capital', 'the capital of',
            # 'capital of france' -> 4 distinct hits
            (1, "tell me what is the capital of france please", "en", "s"),
            # exactly one shared trigram ('capital of france') -> below min_overlap=2
            (2, "capital of france only once here", "en", "s"),
            (3, "nothing in common with that benchmark at all", "en", "s"),
            # repeated contaminated trigram counts ONCE (distinct shingles)
            (4, "what is the zzz what is the", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r.doc_id: (r.n_contaminated_ngrams, r.contaminated)
        for r in decontaminate(corpus, bench, n=3, min_overlap=2).collect()
    }
    assert out == {1: (4, True), 2: (1, False), 3: (0, False), 4: (1, False)}


def test_pack_sequences_layout(spark):
    """Concat-and-chunk invariants: within each shard, seq positions follow
    the running token sum in doc_id order; offsets stay inside the window;
    the layout is identical under any input partitioning (deterministic)."""
    from eva_opentargets_spark.operators.corpus import pack_sequences

    d = _docs(spark)
    out = pack_sequences(d, ctx_len=16, n_shards=4).collect()
    assert len(out) == 200
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r.shard < 4 and 0 <= r.seq_offset < 16
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1  # hash shard actually spreads docs
    for rows in by_shard.values():
        cum = 0
        for r in sorted(rows, key=lambda r: r.doc_id):
            assert r.seq_idx == cum // 16 and r.seq_offset == cum % 16
            cum += r.n_tokens
    again = pack_sequences(d.repartition(7), ctx_len=16, n_shards=4).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_repetition_stats_known_values(spark):
    from pyspark.sql import functions as F

    from eva_opentargets_spark.functions.text import repetition_stats

    rows = [
        (1, "a a a b"),      # dup 0.5, top 0.75, bigrams: 'a a'x2,'a b' -> 2/3
        (2, "x y z"),        # all distinct: dup 0, top 1/3, bigrams unique 1/2
        (3, "w"),            # single token: bigram frac null
        (4, ""),             # empty: all null
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.dup_token_frac, r.top_token_frac, r.top_bigram_frac)
        for r in d.select(
            "doc_id", F.inline(F.array(repetition_stats(F.col("text"))))
        ).collect()
    }
    assert out[1] == (0.5, 0.75, 0.6667)
    assert out[2] == (0.0, 0.3333, 0.5)
    assert out[3] == (0.0, 1.0, None)
    assert out[4] == (None, None, None)


def test_curation_funnel_reasons(spark):
    """Every funnel stage fires in pipeline order: exact-dup loses to its
    canonical, near-dup non-canonicals drop, low quality drops, the rest
    keep — and an exact duplicate is reported as exact (first matching
    reason), not near."""
    from eva_opentargets_spark.operators.corpus import curate
    from eva_opentargets_spark.operators.dedup import near_dup_clusters

    rows = [
        (1, "a long enough document with plenty of interesting words here", "en", "s"),
        (2, "a long enough document with plenty of interesting words here", "en", "s"),  # exact dup of 1
        (3, "a long enough document with plenty of interesting words too", "en", "s"),   # near dup of 1
        (4, "the the the the", "en", "s"),                                               # low quality
        (5, "completely unrelated text about other topics and subjects entirely", "en", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    clusters = near_dup_clusters(docs, pairs, rounds=3)
    out = {r.doc_id: r.drop_reason for r in curate(docs, clusters, min_quality=0.5).collect()}
    assert out == {
        1: "keep",
        2: "exact_duplicate",
        3: "near_duplicate",
        4: "low_quality",
        5: "keep",
    }


def test_boilerplate_score_flags_template_heavy_docs(spark):
    """Docs made of a shared template trigram-block score high; unique
    docs score 0; counts are over DISTINCT per-doc shingles."""
    from eva_opentargets_spark.operators.corpus import boilerplate_score

    template = "all rights reserved contact us here"
    rows = [
        (1, template, "en", "s"),
        (2, template, "en", "s"),
        (3, template + " plus some unique trailing words appended", "en", "s"),
        (4, "a wholly original document with distinct vocabulary entirely", "en", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.doc_id: r for r in boilerplate_score(docs, n=3, min_df=3, max_frac=0.5).collect()}
    # template = 6 tokens -> 4 trigrams, each in docs 1,2,3 (df=3 >= min_df)
    assert out[1].n_shingles == 4 and out[1].n_flagged == 4
    assert out[1].boilerplate_frac == 1.0 and out[1].is_boilerplate
    assert out[3].n_flagged == 4 and not out[3].is_boilerplate  # 4 of 10 shingles
    assert out[4].n_flagged == 0 and out[4].boilerplate_frac == 0.0


def test_mix_sources_hits_quotas_and_is_deterministic(spark):
    from eva_opentargets_spark.operators.corpus import MIX_BUCKETS, mix_sources

    rows = [(i, f"document body {i}", "en", f"src{i % 4}") for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = mix_sources(docs, {"src0": 3, "src1": 1}, total=400)
    rows1 = {(r.doc_id, r.source) for r in out.collect()}
    rows2 = {(r.doc_id, r.source) for r in mix_sources(docs.repartition(13), {"src0": 3, "src1": 1}, total=400).collect()}
    assert rows1 == rows2  # deterministic under any partitioning
    by_src = {}
    for _, s in rows1:
        by_src[s] = by_src.get(s, 0) + 1
    assert set(by_src) == {"src0", "src1"}  # unweighted sources dropped
    # quotas: src0 -> 300 of 1000, src1 -> 100 of 1000; hash sampling is
    # approximate around the threshold, so allow a ~20% band
    assert 240 <= by_src["src0"] <= 360
    assert 70 <= by_src["src1"] <= 130
    thr = {r.source: r.accept_threshold for r in out.select("source", "accept_threshold").distinct().collect()}
    assert thr == {"src0": 300000, "src1": 100000}
    assert thr["src0"] < MIX_BUCKETS


def test_mix_sources_caps_at_keep_everything(spark):
    """A source smaller than its quota keeps all docs (threshold capped)."""
    from eva_opentargets_spark.operators.corpus import mix_sources

    rows = [(i, f"body {i}", "en", "tiny" if i < 5 else "big") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = mix_sources(docs, {"tiny": 1, "big": 1}, total=800).collect()
    tiny = [r for r in out if r.source == "tiny"]
    assert len(tiny) == 5 and all(r.accept_threshold == 1000000 for r in tiny)


def test_unigram_logprob_matches_hand_computation(spark):
    import math

    from eva_opentargets_spark.operators.corpus import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b", "en", "s"), (2, "b c", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    # corpus: a=2, b=2, c=1, total=5
    out = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    lp = {t: -math.log(c / 5) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    assert out[1].n_tokens == 3
    assert out[1].avg_neg_logprob == round((2 * lp["a"] + lp["b"]) / 3, 4)
    assert out[2].avg_neg_logprob == round((lp["b"] + lp["c"]) / 2, 4)


def test_select_by_budget_equals_global_greedy(spark):
    """The banded parallel scheme reproduces the naive global greedy
    prefix exactly, including the boundary doc."""
    from pyspark.sql import Window

    from eva_opentargets_spark.functions.text import quality_score, token_count
    from eva_opentargets_spark.operators.corpus import select_by_budget

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range((i % 29) + 3)) + (" the a of" if i % 3 == 0 else ""), "en", "s")
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    budget = 1500
    got = {
        (r.doc_id, r.n_tokens, r.quality, r.cum_tokens)
        for r in select_by_budget(docs, budget).collect()
    }
    naive = (
        docs.select(
            "doc_id",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            F.round(quality_score(F.col("text")), 4).alias("quality"),
        )
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(Window.orderBy(F.col("quality").desc(), "doc_id")),
        )
        .filter(F.col("cum_tokens") <= budget)
    )
    want = {(r.doc_id, r.n_tokens, r.quality, r.cum_tokens) for r in naive.collect()}
    assert got == want and 0 < len(got) < 300
    # the kept set is a true prefix: max cum <= budget, and adding the next
    # doc would overflow
    assert max(c for *_, c in got) <= budget


def test_stratified_sample_k_exact_quota_and_deterministic(spark):
    from eva_opentargets_spark.operators.corpus import stratified_sample_k

    rows = [(i, f"body {i}", "en", "big" if i < 90 else "tiny") for i in range(93)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = stratified_sample_k(docs, k=5)
    got = {(r.doc_id, r.strata, r.sample_rank) for r in out.collect()}
    # exact 5 from the big stratum, ALL 3 of the tiny one
    assert sum(1 for _, s, _ in got if s == "big") == 5
    assert sum(1 for _, s, _ in got if s == "tiny") == 3
    again = {
        (r.doc_id, r.strata, r.sample_rank)
        for r in stratified_sample_k(docs.repartition(11), k=5).collect()
    }
    assert got == again  # partitioning-independent


def test_length_quantiles_match_numpy(spark):
    import numpy as np

    from eva_opentargets_spark.operators.corpus import length_quantiles

    lengths = {"s0": [3, 5, 8, 13, 21, 34], "s1": [2, 2, 9]}
    rows, i = [], 0
    for src, ls in lengths.items():
        for n in ls:
            rows.append((i, " ".join(["w"] * n), "en", src))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r.source: r for r in length_quantiles(docs).collect()}
    for src, ls in lengths.items():
        want = np.percentile(ls, [25, 50, 75, 95])  # linear interpolation
        assert (out[src].p25, out[src].p50, out[src].p75, out[src].p95) == tuple(
            round(float(x), 4) for x in want
        )
        assert out[src].n_docs == len(ls)


def test_pack_manifest_tiles_and_matches_placement(spark):
    """Slices tile each window exactly, cover each doc exactly, and the
    first slice of every doc agrees with pack_sequences' placement."""
    from eva_opentargets_spark.operators.corpus import pack_manifest, pack_sequences

    rows = [
        (0, " ".join(["w"] * 4), "en", "s"),
        (1, " ".join(["w"] * 9), "en", "s"),
        (2, " ".join(["w"] * 12), "en", "s"),
        (3, " ".join(["w"] * 5), "en", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    man = pack_manifest(docs, ctx_len=10, n_shards=1).collect()
    got = {(r.doc_id, r.seq_idx): (r.doc_offset, r.seq_offset, r.slice_len) for r in man}
    # starts: 0, 4, 13, 25 (doc_id order within the single shard)
    assert got == {
        (0, 0): (0, 0, 4),
        (1, 0): (0, 4, 6),
        (1, 1): (6, 0, 3),
        (2, 1): (0, 3, 7),
        (2, 2): (7, 0, 5),
        (3, 2): (0, 5, 5),
    }
    # tiling invariant: every full window sums to ctx_len, the tail to less
    per_seq = {}
    for r in man:
        per_seq[r.seq_idx] = per_seq.get(r.seq_idx, 0) + r.slice_len
    assert per_seq == {0: 10, 1: 10, 2: 10}
    # per-doc coverage = token count
    per_doc = {}
    for r in man:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.slice_len
    assert per_doc == {0: 4, 1: 9, 2: 12, 3: 5}
    # first-slice placement agrees with pack_sequences
    placed = {r.doc_id: (r.seq_idx, r.seq_offset) for r in pack_sequences(docs, ctx_len=10, n_shards=1).collect()}
    firsts = {d: min((s, r) for (dd, s), (do, r, _l) in got.items() if dd == d and do == 0) for d in per_doc}
    assert placed == firsts


def test_vocab_coverage_curve(spark):
    """Coverage at k = share of occurrences held by the top-k types."""
    from eva_opentargets_spark.queries import corpus_vocab_coverage
    import os, tempfile

    rows = [(1, "a a a a b b c", "en", "s"), (2, "a b d", "en", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r.k: (r.coverage, r.vocab_used) for r in corpus_vocab_coverage(spark, td).collect()}
    # tf: a=5, b=3, c=1, d=1 (10 total); all ks >= vocab size 4 -> full coverage
    assert out == {8: (1.0, 4), 16: (1.0, 4), 32: (1.0, 4)}
