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


def _decor_terms(spark):
    rows = [
        # (term_id, iri, ontology, label, in_target, obsolete, replaced_by)
        ("EFO:1", "http://www.ebi.ac.uk/efo/EFO_1", "EFO", "Alive", True, False, None),
        ("EFO:2", "http://www.ebi.ac.uk/efo/EFO_2", "EFO", "Dead", True, True, "EFO:3"),
        ("EFO:3", "http://www.ebi.ac.uk/efo/EFO_3", "EFO", "Also Dead", True, True, "EFO:4"),
        ("EFO:4", "http://www.ebi.ac.uk/efo/EFO_4", "EFO", "Final", True, False, None),
        ("EFO:5", "http://www.ebi.ac.uk/efo/EFO_5", "EFO", "Dead End", True, True, None),
    ]
    from eva_opentargets_spark.schemas import ONTOLOGY_TERMS

    return spark.createDataFrame(
        [(t, i, o, l, None, a, b, r) for t, i, o, l, a, b, r in rows],
        ONTOLOGY_TERMS,
    )


def test_previous_mapping_decoration_chain(spark):
    """Reference create_table_for_manual_curation.py:13-34: previously-used
    cell always emitted with the term's status; replacement follows at most
    one extra obsolete hop (max_depth=1), and an obsolete dead end yields
    an empty replacement cell."""
    from eva_opentargets_spark.operators.curation import previous_mapping_cells
    from eva_opentargets_spark.schemas import TRAIT_MAPPINGS

    prev = spark.createDataFrame(
        [
            ("m1", "http://www.ebi.ac.uk/efo/EFO_1", "Alive"),      # current
            ("m2", "http://www.ebi.ac.uk/efo/EFO_2", "Dead"),       # 2-hop chain
            ("m3", "http://www.ebi.ac.uk/efo/EFO_5", "Dead End"),   # obsolete, no repl
            ("m4", "http://www.ebi.ac.uk/efo/EFO_99", "Gone"),      # not in dict
        ],
        TRAIT_MAPPINGS,
    )
    out = {r.mention_norm: r for r in previous_mapping_cells(prev, _decor_terms(spark)).collect()}
    assert out["m1"].previous_mapping == "EFO:1|alive|NOT_SPECIFIED|previously-used|EFO_CURRENT"
    assert out["m1"].replacement_mapping == ""
    # EFO:2 -> EFO:3 (obsolete, hop again) -> EFO:4 (current)
    assert out["m2"].previous_mapping == "EFO:2|dead|NOT_SPECIFIED|previously-used|EFO_OBSOLETE"
    assert out["m2"].replacement_mapping == "EFO:4|final|NOT_SPECIFIED|replacement|EFO_CURRENT"
    assert out["m3"].replacement_mapping == ""  # obsolete with no replacement
    assert out["m4"].previous_mapping == "EFO:99|gone|NOT_SPECIFIED|previously-used|NOT_CONTAINED"


def test_curation_sheet_nt_ordering(spark, terms, xrefs):
    """W4 decorated ordering: (notes, freq) DESCENDING — an NT-expansion
    mention outranks a higher-frequency plain mention (reference :103)."""
    from eva_opentargets_spark.schemas import TRAIT_MAPPINGS

    dm = spark.createDataFrame(
        [("dup", 5, 5, 2), ("zzz unknown", 50, 50, 9)],
        "mention_norm string, freq long, occurrences long, n_conversations long",
    )
    links, cands, unresolved = link_cascade(dm, terms, xrefs)
    prev = spark.createDataFrame([], TRAIT_MAPPINGS)
    nt = spark.createDataFrame([("dup",)], "mention_norm string")
    table = curation_table(
        unresolved, cands, dm, previous_mappings=prev, terms=terms, nt_mentions=nt
    )
    rows = table.collect()
    assert [r.mention_norm for r in rows] == ["dup", "zzz unknown"]
    assert rows[0].notes == "NT expansion" and rows[1].notes == ""
    assert rows[0].previous_mapping == "" and rows[0].replacement_mapping == ""
