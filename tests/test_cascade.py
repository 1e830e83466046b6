"""Priority-cascade join, guarded lookup, most-severe tests (J4/J8/A6)."""

from eva_opentargets_spark.operators.cascade import (
    guarded_lookup,
    most_severe,
    priority_cascade_join,
)


def test_priority_order_and_fallthrough(spark):
    facts = spark.createDataFrame(
        [("r1", "k1", "h1"), ("r2", "kX", "h2"), ("r3", "kX", "hX")],
        "row_id string, acc string, hgvs string",
    )
    by_acc = spark.createDataFrame([("k1", "gene_by_acc")], "acc string, gene string")
    by_hgvs = spark.createDataFrame(
        [("h1", "gene_by_hgvs"), ("h2", "gene_by_hgvs2")], "hgvs string, gene string"
    )
    out = priority_cascade_join(facts, [("acc", by_acc, "acc"), ("hgvs", by_hgvs, "hgvs")], ["gene"])
    rows = {r.row_id: (r.gene, r.matched_by) for r in out.collect()}
    assert rows["r1"] == ("gene_by_acc", "acc")  # level 1 wins even though h1 also matches
    assert rows["r2"] == ("gene_by_hgvs2", "hgvs")  # falls to level 2
    assert rows["r3"] == (None, None)  # no match anywhere


def test_guarded_lookup(spark):
    # MAX_TARGET_GENES guard (clinvar_to_evidence_strings.py:23,300-311)
    dim = spark.createDataFrame(
        [("v1", "g1"), ("v1", "g2"), ("v1", "g3"), ("v1", "g4"), ("v2", "g1")],
        "variant string, gene string",
    )
    kept = guarded_lookup(dim, "variant", max_values=3)
    assert {r.variant for r in kept.collect()} == {"v2"}


def test_most_severe(spark):
    facts = spark.createDataFrame(
        [("v1", "missense"), ("v1", "stop_gained"), ("v2", "synonymous")],
        "variant string, so_term string",
    )
    ranks = spark.createDataFrame(
        [("stop_gained", 1), ("missense", 5), ("synonymous", 9)], "so_term string, rank int"
    )
    out = {r.variant: r.so_term for r in most_severe(facts, ["variant"], ranks, "so_term").collect()}
    assert out == {"v1": "stop_gained", "v2": "synonymous"}
