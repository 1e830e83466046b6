"""Evaluation-harness tests (J9 synonym bridging, A7 uniqueness, A9
obsolete counters) + the F7/P9 scalar functions."""

import pytest
from pyspark.sql import functions as F

from eva_opentargets_spark.functions.normalize import (
    colon_to_vcf,
    has_ambiguous_bases,
    vcf_to_colon,
)
from eva_opentargets_spark.operators.evaluation import (
    assert_unique_per_key,
    evaluate,
    obsolete_counters,
)


def test_synonym_bridged_evaluation(spark):
    # gold says A; engine says A2 which is a synonym of A -> exact_match (J9)
    pairs = spark.createDataFrame(
        [("k1", ["A"], ["A2"]), ("k2", ["B"], ["C"])],
        "key string, gold_terms array<string>, got_terms array<string>",
    )
    synonyms = spark.createDataFrame([("A2", "A")], "term_id string, canonical_id string")
    got = {r.category: r["count"] for r in evaluate(pairs, synonyms).collect()}
    assert got == {"exact_match": 1, "mismatch": 1}


def test_unique_per_key_assertion(spark):
    ok = spark.createDataFrame([("r1", "g1", "t1"), ("r1", "g2", "t2")], "rcv string, gene string, t string")
    assert_unique_per_key(ok, ["rcv", "gene"], "t")
    bad = spark.createDataFrame([("r1", "g1", "t1"), ("r1", "g1", "t2")], "rcv string, gene string, t string")
    with pytest.raises(AssertionError):
        assert_unique_per_key(bad, ["rcv", "gene"], "t")


def test_obsolete_counters(spark, terms):
    used = spark.createDataFrame([("EFO:0001",), ("EFO:0008",), ("NOPE:1",)], "term_id string")
    row = obsolete_counters(used, terms).first()
    assert row["total"] == 3 and row["obsolete"] == 1  # EFO:0008 is obsolete


def test_vcf_conversions(spark):
    row = spark.range(1).select(
        colon_to_vcf(F.lit("1:12345:A:G")).alias("v"),
        vcf_to_colon(F.lit("1 12345 . A G")).alias("c"),
        has_ambiguous_bases(F.lit("ACGN")).alias("amb"),
        has_ambiguous_bases(F.lit("ACGT")).alias("ok"),
    ).first()
    assert row["v"] == "1 12345 . A G"
    assert row["c"] == "1:12345:A:G"
    assert row["amb"] is True and row["ok"] is False
