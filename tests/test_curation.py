"""Curation-routing tests, mirroring tests/trait_mapping/test_output.py and
the spreadsheet decoration rules.
"""

from pyspark.sql import functions as F

from eva_opentargets_spark.operators.curation import (
    assert_no_duplicate_mappings,
    curation_table,
    merge_mapping_databases,
    rank_candidates,
)
from eva_opentargets_spark.operators.linking import fuzzy_candidates, link_cascade
from eva_opentargets_spark.pipeline import mappings_from_links

import pytest


def _mentions(spark, names):
    return spark.createDataFrame([(n,) for n in names], "mention_norm string")


def test_candidate_ranking(spark, terms):
    # W1 — (confidence, in_ontology, is_current) desc (zooma.py:53-55)
    cands = fuzzy_candidates(_mentions(spark, ["merge"]), terms)
    ranked = rank_candidates(cands).orderBy("rank").collect()
    assert [r.term_id for r in ranked] == ["EFO:0006", "EFO:0007"]  # tie -> term_id asc


def test_curation_table_routing(spark, terms, xrefs):
    dm = _mentions(spark, ["dup", "batch", "spark"]).withColumn("freq", F.lit(3)).withColumn(
        "occurrences", F.lit(3)
    ).withColumn("n_conversations", F.lit(2))
    links, cands, unresolved = link_cascade(dm, terms, xrefs)
    table = curation_table(unresolved, cands, dm)
    rows = {r.mention_norm: r for r in table.collect()}
    # finished mentions are not routed to curation (output.py:71-84);
    # "batch" resolves at the normalized tier, "spark" at exact
    assert set(rows) == {"dup"}
    # packed cell format (F11/F12): term|label|confidence|status
    assert rows["dup"].candidates == ["MONDO:0012|dup|HIGH|NOT_CONTAINED"]


def test_status_labels(spark, terms):
    # F12 — EFO_CURRENT / EFO_OBSOLETE / NOT_CONTAINED
    cands = fuzzy_candidates(_mentions(spark, ["slow", "vector"]), terms)
    un = _mentions(spark, ["slow", "vector"])
    dm = un.withColumn("freq", F.lit(1))
    t = curation_table(un, cands, dm)
    cells = {r.mention_norm: r.candidates for r in t.collect()}
    assert cells["slow"] == ["EFO:0008|slow|HIGH|EFO_OBSOLETE"]
    assert cells["vector"] == ["MONDO:0010|vector|HIGH|NOT_CONTAINED"]


def test_mapping_merge_semantics(spark, terms, xrefs):
    # J7 — previous kept only when absent from new (export_curation_spreadsheet.nf:119-140)
    links, _, _ = link_cascade(_mentions(spark, ["spark"]), terms, xrefs)
    new = mappings_from_links(links, terms)
    prev = spark.createDataFrame(
        [("spark", "http://old/iri", "old spark"), ("batch", "http://old/batch", "old batch")],
        "mention_norm string, iri string, label string",
    )
    merged = {r.mention_norm: r.iri for r in merge_mapping_databases(prev, new).collect()}
    assert merged["spark"] == "http://www.ebi.ac.uk/efo/EFO_0001"  # new wins
    assert merged["batch"] == "http://old/batch"  # previous kept


def test_duplicate_mapping_assertion(spark):
    ok = spark.createDataFrame(
        [("a", "i1", "l1"), ("b", "i1", "l1")], "mention_norm string, iri string, label string"
    )
    assert_no_duplicate_mappings(ok)
    bad = spark.createDataFrame(
        [("a", "i1", "l1"), ("a", "i1", "l2")], "mention_norm string, iri string, label string"
    )
    with pytest.raises(AssertionError):
        assert_no_duplicate_mappings(bad)
