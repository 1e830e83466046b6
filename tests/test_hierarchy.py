"""is_a-descendants operator tests (reference
bin/trait_mapping/get_children_with_keywords.py semantics)."""

from __future__ import annotations

from eva_opentargets_spark.operators.hierarchy import descendants_with_keyword
from eva_opentargets_spark.sources.dictionary import demo_is_a, demo_terms


def _run(spark, **kw):
    return {
        r.term_id: (r.label, r.depth)
        for r in descendants_with_keyword(
            demo_terms(spark), demo_is_a(spark), **kw
        ).collect()
    }


def test_descendants_bounded_depth_and_min_depth_diamond(spark):
    got = _run(spark, root="EFO:0001", max_depth=3)
    assert got == {
        "EFO:0002": ("hash join", 1),
        "EFO:0003": ("sort merge", 1),
        "EFO:0004": ("table scan", 2),
        # diamond: reachable via two depth-2 paths -> appears ONCE at min depth
        "EFO:0005": ("window", 2),
        "EFO:0006": ("merge", 3),
        "EFO:0007": ("merge", 3),
        # EFO:0009 is at depth 4 (out of bound); EFO:0014 is in a disjoint
        # subtree; neither appears
    }


def test_descendants_keyword_filter(spark):
    got = _run(spark, root="EFO:0001", keyword="merge", max_depth=3)
    assert set(got) == {"EFO:0003", "EFO:0006", "EFO:0007"}
    # case-insensitive
    got_uc = _run(spark, root="EFO:0001", keyword="MERGE", max_depth=3)
    assert set(got_uc) == set(got)


def test_descendants_depth_bound_expands(spark):
    got = _run(spark, root="EFO:0001", max_depth=4)
    assert got["EFO:0009"] == ("fast scan", 4)


def test_descendants_from_inner_node(spark):
    got = _run(spark, root="EFO:0002", max_depth=3)
    assert got == {
        "EFO:0004": ("table scan", 1),
        "EFO:0005": ("window", 1),
        "EFO:0006": ("merge", 2),
        "EFO:0007": ("merge", 2),
        "EFO:0009": ("fast scan", 3),
    }
