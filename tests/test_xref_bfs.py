"""Bounded xref BFS tests (OxO distance semantics, oxo.py:182-209)."""

from eva_opentargets_spark.operators.xref_bfs import xref_closure, xref_targets_at_distance


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_curie string, dst_curie string")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "seed_id string")


def test_closure_distances(spark):
    # a -> b -> c -> d -> e: distance capped at 3; shortcut a -> c keeps min distance
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")])
    got = {(r.node, r.distance) for r in xref_closure(_seeds(spark, ["a"]), e).collect()}
    assert got == {("b", 1), ("c", 1), ("d", 2), ("e", 3)}


def test_closure_cycle_terminates(spark):
    e = _edges(spark, [("a", "b"), ("b", "a")])
    got = {(r.node, r.distance) for r in xref_closure(_seeds(spark, ["a"]), e).collect()}
    assert got == {("b", 1), ("a", 0)} - {("a", 0)} | {("b", 1)}  # only b at distance 1


def test_targets_at_distance(spark, terms):
    e = _edges(spark, [("MONDO:0010", "EFO:0011"), ("EFO:0011", "EFO:0013")])
    out = {(r.seed_id, r.term_id, r.distance) for r in
           xref_targets_at_distance(_seeds(spark, ["MONDO:0010"]), e, terms, accept_distance=1).collect()}
    assert out == {("MONDO:0010", "EFO:0011", 1)}
    out2 = {(r.term_id, r.distance) for r in
            xref_targets_at_distance(_seeds(spark, ["MONDO:0010"]), e, terms, accept_distance=2).collect()}
    assert out2 == {("EFO:0013", 2)}
