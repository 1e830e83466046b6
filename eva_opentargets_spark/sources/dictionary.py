"""Ontology-dictionary sources.

Replaces the reference's entire external-service surface (OLS/ZOOMA/OxO,
cmat/trait_mapping/{ols,zooma,oxo}.py + retry/backoff utils.py:13-20) with
pre-materialized dimension tables that are broadcast to every executor.
Loaders also cover the reference's TSV shapes:
  * trait->ontology mapping TSV with '#ontology=' header
    (cmat/output_generation/clinvar_to_evidence_strings.py:326-349)
  * consequence TSV (cmat/consequence_prediction/common/consequence_type.py:17-51)
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import fixtures
from ..schemas import ONTOLOGY_TERMS, ONTOLOGY_XREFS, TRAIT_MAPPINGS

# Round-6: the demo dictionaries are memoized per session and created as
# SINGLE-SLICE local frames. createDataFrame defaults to defaultParallelism
# pickled slices, so every tiny dictionary job launched 32 tasks for ~30
# rows (145 ms vs 62 ms per trivial job at local[32]) — and coalesce(1)
# over those slices is a TRAP: the one task iterates 32 parent partitions,
# each opening its own Python-runner round trip (~3.5-4.5 s per
# materialization, measured; this briefly cost the flagship 3x).
# parallelize(rows, 1) gives one slice = one python round trip.
# Memoization also lets the cascade cache the dictionary row count (its
# fuzzy-path gate) on the frame itself.


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Single-slice local dimension frame (see module comment)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


@lru_cache(maxsize=4)
def demo_terms(spark: SparkSession) -> DataFrame:
    syns: dict[str, list[str]] = {}
    for tid, syn in fixtures.TERM_SYNONYMS:
        syns.setdefault(tid, []).append(syn)
    rows = [
        (tid, iri, ont, label, sorted(syns[tid]) if tid in syns else None, in_t, obs, rep)
        for tid, iri, ont, label, in_t, obs, rep in fixtures.ONTOLOGY_TERMS
    ]
    return local_df(spark, rows, ONTOLOGY_TERMS)


@lru_cache(maxsize=4)
def demo_xrefs(spark: SparkSession) -> DataFrame:
    return local_df(spark, fixtures.ONTOLOGY_XREFS, ONTOLOGY_XREFS)


@lru_cache(maxsize=4)
def demo_previous_mappings(spark: SparkSession) -> DataFrame:
    return local_df(spark, fixtures.PREVIOUS_MAPPINGS, TRAIT_MAPPINGS)


@lru_cache(maxsize=4)
def demo_is_a(spark: SparkSession) -> DataFrame:
    """is_a hierarchy edges (parent_id, child_id) — input of the
    descendants-search operator (operators/hierarchy.py)."""
    return local_df(spark, fixtures.ONTOLOGY_IS_A, "parent_id string, child_id string")


def load_mapping_tsv(spark: SparkSession, path: str) -> tuple[DataFrame, str]:
    """Load a latest_mappings.tsv-shaped file; returns (df, target_ontology).

    Mirrors load_ontology_mapping (clinvar_to_evidence_strings.py:326-349):
    '#ontology=XXX' header names the target ontology; keys are lowercased.
    """
    raw = spark.read.text(path)
    header = raw.filter(F.col("value").startswith("#ontology=")).limit(1).collect()
    ontology = header[0]["value"].split("=", 1)[1].strip() if header else "EFO"
    df = (
        raw.filter(~F.col("value").startswith("#"))
        .filter(F.col("value") != "")
        .select(F.split("value", "\t").alias("f"))
        .select(
            F.lower(F.col("f")[0]).alias("mention_norm"),
            F.col("f")[1].alias("iri"),
            F.col("f")[2].alias("label"),
        )
    )
    return df, ontology


def terms_from_mappings(mappings: DataFrame, ontology: str = "EFO") -> DataFrame:
    """Lift a curated mapping table into the ontology_terms shape so the
    linking cascade can run against reference-derived fixtures."""
    from ..functions.ontology import curie_from_iri

    return mappings.select(
        curie_from_iri(F.col("iri")).alias("term_id"),
        F.col("iri"),
        F.lit(ontology).alias("ontology"),
        F.col("label"),
        F.lit(None).cast("array<string>").alias("synonyms"),
        F.lit(True).alias("in_target_ontology"),
        F.lit(False).alias("is_obsolete"),
        F.lit(None).cast("string").alias("replaced_by"),
    ).dropDuplicates(["term_id", "label"])
