"""End-to-end pipeline golden tests on the deterministic synthetic corpus:
the P/R >= 0.95 gate (BASELINE.json metric; set_metrics.py:78-86 analog),
duplicate and tally invariants.
"""

from pyspark.sql import functions as F

from eva_opentargets_spark import synth
from eva_opentargets_spark.operators.report import check_tally, precision_recall
from eva_opentargets_spark.operators.triples import assert_no_duplicate_triples
from eva_opentargets_spark.pipeline import compute_metrics, run_pipeline


def test_pipeline_precision_recall(spark):
    transcripts, expected = synth.generate(spark, n_convs=15, turns_per_conv=8, seed=7)
    res = run_pipeline(spark, transcripts)
    p, r = precision_recall(res.triples, expected)
    # ground truth is derived from the same acceptance semantics -> exact
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0, (p, r)


def test_pipeline_invariants(spark):
    transcripts, _ = synth.generate(spark, n_convs=10, turns_per_conv=6, seed=11)
    res = run_pipeline(spark, transcripts)
    assert_no_duplicate_triples(res.triples)
    metrics = compute_metrics(spark, res)
    totals = {r.counter: r.value for r in metrics.collect()}
    check_tally(totals)
    assert totals["turns_total"] == 60
    assert totals["mentions_valid"] == totals["mentions_total"] - totals["mentions_stoplisted"]


def test_excluded_turns_produce_no_triples(spark):
    transcripts, _ = synth.generate(spark, n_convs=6, turns_per_conv=6, seed=3)
    res = run_pipeline(spark, transcripts)
    excluded = transcripts.filter(F.col("tool") == "redacted").select("conv_id", "turn_idx")
    leaked = res.triples.join(excluded, ["conv_id", "turn_idx"], "inner").count()
    assert leaked == 0
