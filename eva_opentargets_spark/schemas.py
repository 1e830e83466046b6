"""Typed schemas for every table the engine reads or writes.

Replaces the reference's implicit/lazy-XPath schema
(cmat/clinvar_xml_io/clinvar_record.py:17-45) with explicit StructTypes
so Catalyst can prune columns and push filters to the scan.
"""

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Primary input (BASELINE.json input_hint): Iceberg/parquet table of
# multi-turn transcripts. Analog of the ClinVar XML dump scanned by
# cmat/clinvar_xml_io/clinvar_dataset.py:22-28.
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Broadcast ontology dictionary (FIXTURES.md §2). Replaces the OLS/ZOOMA/OxO
# HTTP surface (cmat/trait_mapping/{ols,zooma,oxo}.py) with a static table.
ONTOLOGY_TERMS = StructType(
    [
        StructField("term_id", StringType(), False),  # CURIE, e.g. EFO:0000001
        StructField("iri", StringType(), False),
        StructField("ontology", StringType(), False),
        StructField("label", StringType(), False),
        StructField("synonyms", ArrayType(StringType()), True),
        StructField("in_target_ontology", BooleanType(), False),
        StructField("is_obsolete", BooleanType(), False),
        StructField("replaced_by", StringType(), True),  # nullable CURIE
    ]
)

# Cross-reference edges (FIXTURES.md §3; OxO analog, cmat/trait_mapping/oxo.py:138-179).
ONTOLOGY_XREFS = StructType(
    [
        StructField("src_curie", StringType(), False),
        StructField("dst_curie", StringType(), False),
        StructField("distance", IntegerType(), False),
        StructField("source", StringType(), True),
    ]
)

# Curated mention->term mapping table (mappings/latest_mappings.tsv shape,
# loader cmat/output_generation/clinvar_to_evidence_strings.py:326-349).
TRAIT_MAPPINGS = StructType(
    [
        StructField("mention_norm", StringType(), False),
        StructField("iri", StringType(), False),
        StructField("label", StringType(), False),
    ]
)

# One extracted mention occurrence (post-explode).
MENTIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("pos", IntegerType(), False),  # 0-based token index of match start
        StructField("mention_norm", StringType(), False),
    ]
)

# Emitted KG triples (FIXTURES.md §6). An evidence string in the reference
# is a reified triple (clinvar_to_evidence_strings.py:204-263).
TRIPLES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("mention_text", StringType(), False),
        StructField("match_type", StringType(), False),  # exact|fuzzy|xref|replacement
        StructField("confidence", StringType(), True),
    ]
)

# Per-partition run counters (FIXTURES.md §7; Report analog,
# cmat/output_generation/report.py:17-77).
METRICS = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition", StringType(), False),
        StructField("counter", StringType(), False),
        StructField("value", LongType(), False),
    ]
)
