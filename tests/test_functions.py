"""Scalar-function tests (SURVEY.md §2.7), mirroring the reference's
CURIE/IRI tests (tests/trait_mapping/test_oxo.py:9-33).
"""

from pyspark.sql import functions as F

from eva_opentargets_spark.functions.normalize import (
    format_creation_date,
    normalize_significance,
    string_to_set,
)
from eva_opentargets_spark.functions.ontology import curie_from_iri, iri_for, repair_curie_to_iri


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_iri_templates(spark):
    # F1 — ontology_uri.py:11-26 templates
    cases = {
        ("Orphanet", "1756"): "http://www.orpha.net/ORDO/Orphanet_1756",
        ("OMIM", "612773"): "https://www.omim.org/entry/612773",
        ("EFO", "EFO_0005137"): "http://www.ebi.ac.uk/efo/EFO_0005137",
        ("MeSH", "D065630"): "http://identifiers.org/mesh/D065630",
        ("MedGen", "C0235833"): "http://identifiers.org/medgen/C0235833",
        ("MONDO", "MONDO:0013353"): "http://purl.obolibrary.org/obo/MONDO_0013353",
        ("Human Phenotype Ontology", "HP:0011147"): "http://purl.obolibrary.org/obo/HP_0011147",
    }
    for (db, id_), want in cases.items():
        assert _one(spark, iri_for(F.lit(db), F.lit(id_))) == want


def test_curie_from_iri(spark):
    # F2 — ontology_uri.py:35-67
    cases = {
        "http://purl.obolibrary.org/obo/MONDO_0013353": "MONDO:0013353",
        "http://www.ebi.ac.uk/efo/EFO_0005137": "EFO:0005137",
        "http://identifiers.org/medgen/C0235833": None,  # medgen not in curie map
        "https://www.omim.org/entry/612773": "OMIM:612773",
        "http://www.orpha.net/ORDO/Orphanet_1756": "Orphanet:1756",
        "http://identifiers.org/mesh/D065630": None,
    }
    for iri, want in cases.items():
        assert _one(spark, curie_from_iri(F.lit(iri))) == want


def test_repair_curie(spark):
    # F3 — ols.py:124-133: MONDO:0020783 / HP_0045074 -> IRI
    assert (
        _one(spark, repair_curie_to_iri(F.lit("MONDO:0020783")))
        == "http://purl.obolibrary.org/obo/MONDO_0020783"
    )
    assert (
        _one(spark, repair_curie_to_iri(F.lit("HP_0045074")))
        == "http://purl.obolibrary.org/obo/HP_0045074"
    )


def test_normalize_significance(spark):
    # P6 — clinical_classification.py:73-78
    got = _one(spark, normalize_significance(F.lit("Pathogenic/Likely_pathogenic, risk factor")))
    assert got == ["likely pathogenic", "pathogenic", "risk factor"]


def test_format_creation_date(spark):
    assert _one(spark, format_creation_date(F.lit("created 2023-07-15 etc"))) == "2023-07-15"


def test_string_to_set(spark):
    assert sorted(_one(spark, string_to_set(F.lit("{'B', 'A'}")))) == ["A", "B"]
    assert _one(spark, string_to_set(F.lit(""))) == []


def test_rolling_fingerprint_polynomial(spark):
    """The winnowing fingerprint equals min over windows of the polynomial
    hash sum(code * B^(k-1-j)) % M, including the partial-window (<k chars)
    and empty-text edges."""
    from pyspark.sql import functions as F

    from eva_opentargets_spark.functions.text import (
        ROLL_B,
        ROLL_K,
        ROLL_M,
        rolling_fingerprint,
    )

    def py_hash(s):
        h = 0
        for ch in s:
            h = (h * ROLL_B + ord(ch)) % ROLL_M
        return h

    def py_winnow(s):
        if not s:
            return None
        if len(s) < ROLL_K:
            return py_hash(s)
        return min(py_hash(s[i : i + ROLL_K]) for i in range(len(s) - ROLL_K + 1))

    texts = ["hello world, this is a longer document", "tiny", "", "exactly8"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.fp for r in df.select(rolling_fingerprint(F.col("text")).alias("fp")).collect()]
    assert got == [py_winnow(t) for t in texts]
