"""Golden evidence-string parity against the reference's OWN fixtures.

The reference's flagship output test (tests/output_generation/
test_clinvar_to_evidence_strings.py:160-211) feeds one real ClinVar record
through generate_evidence_string and byte-compares the sorted, indented JSON
to expected_{genetics,somatic,multiple_names}_evidence_string.json. This
test drives the SAME record XML through the engine's record-grain scan
(sources/clinvar_xml.parse_clinvar_records) + the column-level evidence
builder (operators/evidence.ot_evidence_json) with the same per-test inputs
(allele origins, disease attributes, consequence attributes from the
reference's snp2gene extract), then byte-compares against the reference's
expected files after canonical re-serialization (json.dumps sort_keys
indent=2 — formatting only; every key and value must match byte-for-byte).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from eva_opentargets_spark import fixtures
from eva_opentargets_spark.operators.consequences import load_consequences
from eva_opentargets_spark.operators.evidence import ot_evidence_json
from eva_opentargets_spark.sources.clinvar_xml import parse_clinvar_records

RES = "/root/reference/tests/output_generation/resources"
SNP2GENE = os.path.join(RES, "snp2gene_extract.tsv")


def _expected(name: str) -> str:
    with open(os.path.join(RES, f"expected_{name}_evidence_string.json")) as fh:
        return fh.read()


def _canon(spark_json: str) -> str:
    """Formatting-only canonicalization: the reference golden files are
    json.dumps(..., sort_keys=True, indent=2)."""
    return json.dumps(json.loads(spark_json), sort_keys=True, indent=2)


def _evidence_for(spark, xml_name, allele_origins, disease_name, disease_source_id,
                  disease_mapped_efo_id):
    records = parse_clinvar_records(spark, [os.path.join(RES, xml_name)])
    # consequence attributes exactly like the reference test: snp2gene row
    # for the record's coordinate id (GENE_MAPPINGS[...][0]) — loaded via the
    # S5 TSV loader (4-column file -> NULL transcript_id), SO accession via
    # the broadcast SO dimension
    cons = load_consequences(spark, SNP2GENE)
    so_dim = spark.createDataFrame(fixtures.SO_ACCESSIONS, "so_term string, so_accession string")
    joined = (
        records.withColumn("__coord", F.lit("14:67729209:A:G"))
        .join(
            F.broadcast(cons.select("variant_id", "ensembl_gene_id", "so_term")),
            F.col("__coord") == F.col("variant_id"),
            "left",
        )
        .join(F.broadcast(so_dim), "so_term", "left")
        .withColumn("allele_origins", F.array(*[F.lit(o) for o in allele_origins]))
        .withColumn("disease_name", F.lit(disease_name))
        .withColumn("disease_source_id", F.lit(disease_source_id))
        .withColumn("disease_mapped_efo_id", F.lit(disease_mapped_efo_id).cast("string"))
        .withColumnRenamed("ensembl_gene_id", "target_gene_id")
    )
    rows = ot_evidence_json(joined).collect()
    assert len(rows) == 1
    return _canon(rows[0]["evidence"])


def test_genetics_evidence_string(spark):
    got = _evidence_for(
        spark,
        "test_clinvar_record.xml.gz",
        ["germline"],
        "Rare congenital non-syndromic heart malformation",
        "C4017284",
        "Orphanet_88991",
    )
    assert got == _expected("genetics")


def test_somatic_evidence_string(spark):
    got = _evidence_for(
        spark,
        "test_clinvar_record.xml.gz",
        ["somatic"],
        "Rare congenital non-syndromic heart malformation",
        "C4017284",
        "Orphanet_88991",
    )
    assert got == _expected("somatic")


def test_multiple_trait_names_evidence_string(spark):
    got = _evidence_for(
        spark,
        "multiple_names.xml.gz",
        ["somatic"],
        "Skeletal dysplasia",
        "C0410528",
        "HP_0002652",
    )
    assert got == _expected("multiple_names")


def test_no_mapping_strips_mapped_id(spark):
    """disease_mapped_efo_id=None -> diseaseFromSourceMappedId absent
    (reference test_no_mapping_evidence_string)."""
    got = _evidence_for(
        spark,
        "test_clinvar_record.xml.gz",
        ["somatic"],
        "Rare congenital non-syndromic heart malformation",
        "C4017284",
        None,
    )
    assert "diseaseFromSourceMappedId" not in json.loads(got)
