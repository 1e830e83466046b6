"""Curated-mapping join + A2 grouping tests — including a round-trip against
the reference's REAL mapping table (mappings/latest_mappings.tsv, 13,211
rows), the strongest fixture-parity check available offline.
"""

import pytest
from pyspark.sql import functions as F

from eva_opentargets_spark.operators.evidence import curated_mapping_join, group_mentions_by_term
from eva_opentargets_spark.sources.dictionary import load_mapping_tsv

REF_TSV = "/root/reference/mappings/latest_mappings.tsv"


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, pos int, mention_norm string")


@pytest.fixture(scope="module")
def ref_mappings(spark):
    df, ontology = load_mapping_tsv(spark, REF_TSV)
    assert ontology == "EFO"
    return df.cache()


def test_loader_shape(spark, ref_mappings):
    # 13,211 lines = 3 '#' headers + 13,208 data rows; keys lowercased
    # (clinvar_to_evidence_strings.py:326-349)
    assert ref_mappings.count() == 13208
    assert ref_mappings.filter(F.col("mention_norm") != F.lower("mention_norm")).count() == 0


def test_multi_mapping_product(spark, ref_mappings):
    # one name -> many terms multiplies rows (J5 product analog); the
    # canonical example from FIXTURES.md §4
    name = "coronary artery disease/myocardial infarction"
    n_terms = ref_mappings.filter(F.col("mention_norm") == name).count()
    assert n_terms >= 2
    m = _mentions(spark, [("c1", 0, 0, name)])
    triples = curated_mapping_join(m, ref_mappings).collect()
    assert len(triples) == n_terms
    assert all(t.match_type == "curated" for t in triples)


def test_round_trip_pr(spark, ref_mappings):
    # sample 200 curated names, synthesize one occurrence each, join back:
    # every occurrence must produce exactly its curated term set (P/R == 1)
    sample = [r.mention_norm for r in ref_mappings.select("mention_norm").distinct().limit(200).collect()]
    m = _mentions(spark, [("c1", i, 0, name) for i, name in enumerate(sample)])
    triples = curated_mapping_join(m, ref_mappings)
    got = triples.groupBy("mention_text").count()
    expected = (
        ref_mappings.filter(F.col("mention_norm").isin(sample))
        .groupBy("mention_norm")
        .agg(F.count_distinct("iri").alias("n"))
    )
    joined = got.join(expected, got.mention_text == expected.mention_norm, "full")
    mismatches = joined.filter(
        F.col("mention_text").isNull() | F.col("mention_norm").isNull() | (F.col("count") != F.col("n"))
    ).count()
    assert mismatches == 0


def test_group_by_term_representative(spark):
    mappings = spark.createDataFrame(
        [
            ("zeta name", "http://www.ebi.ac.uk/efo/EFO_0100", "term a"),
            ("alpha name", "http://www.ebi.ac.uk/efo/EFO_0100", "term a"),
            ("other", "http://www.ebi.ac.uk/efo/EFO_0200", "term b"),
        ],
        "mention_norm string, iri string, label string",
    )
    m = _mentions(
        spark,
        [("c1", 0, 0, "zeta name"), ("c1", 0, 1, "alpha name"), ("c1", 0, 2, "unmapped thing")],
    )
    rows = {r.term_id: r for r in group_mentions_by_term(m, mappings).collect()}
    # lexicographically-first representative (W5, clinvar_to_evidence_strings.py:420-422)
    assert rows["EFO:0100"].representative_mention == "alpha name"
    assert rows["EFO:0100"].grouped_mentions == ["alpha name", "zeta name"]
    # unmapped mentions keep a NULL term (the medgen/NULL branch of A2)
    assert rows[None].representative_mention == "unmapped thing"
