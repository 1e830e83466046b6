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
