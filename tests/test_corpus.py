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
