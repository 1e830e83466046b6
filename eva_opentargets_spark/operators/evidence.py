"""Evidence-generation-style operators: the curated-mapping join and the
group-by-mapped-term aggregation.

Reference analogs:
  * the flagship dictionary join of evidence generation — every record
    trait name looked up in the curated mapping table, lowercased
    (cmat/output_generation/clinvar_to_evidence_strings.py:326-349,411)
  * A2 — group a record's mentions by mapped term id, keep the
    lexicographically-first mention as the group representative, explode
    multi-mappings, keep unmapped mentions as NULL-term rows
    (clinvar_to_evidence_strings.py:383-423)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PRED_DIRECT
from ..functions.ontology import curie_from_iri


def curated_mapping_join(mentions: DataFrame, mappings: DataFrame) -> DataFrame:
    """Direct lookup of mention occurrences in the curated mapping table
    (broadcast; one mention may map to several terms -> row multiplication,
    the J5 product analog). Emits curated triples."""
    m = mappings.select(
        F.col("mention_norm"),
        F.coalesce(curie_from_iri(F.col("iri")), F.col("iri")).alias("obj"),
        F.col("label"),
    )
    return (
        mentions.join(F.broadcast(m), "mention_norm", "inner")
        .select(
            F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"), "mention_norm").alias("subj"),
            F.lit(PRED_DIRECT).alias("pred"),
            "obj",
            "conv_id",
            "turn_idx",
            F.col("mention_norm").alias("mention_text"),
            F.lit("curated").alias("match_type"),
            F.lit("HIGH").alias("confidence"),
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )


def group_mentions_by_term(mentions: DataFrame, mappings: DataFrame) -> DataFrame:
    """A2 — per turn, group mentions by mapped term; the group representative
    is the lexicographically-first mention (W5 tie-break discipline,
    clinvar_to_evidence_strings.py:420-422); unmapped mentions keep a NULL
    term (the (name, medgen, NULL) branch of :404-410)."""
    m = mappings.select(
        "mention_norm", F.coalesce(curie_from_iri(F.col("iri")), F.col("iri")).alias("term_id")
    )
    joined = mentions.join(F.broadcast(m), "mention_norm", "left")
    return (
        joined.groupBy("conv_id", "turn_idx", "term_id")
        .agg(
            F.min("mention_norm").alias("representative_mention"),
            F.sort_array(F.collect_set("mention_norm")).alias("grouped_mentions"),
            F.count("*").alias("n_occurrences"),
        )
    )
