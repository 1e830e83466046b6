"""Enrichment write-back: original transcript columns + an `annotations`
array column.

Reference analog: S8 — AnnotatedClinVarRecord re-serializes each record with
injected XRef/AttributeSet elements, preserving everything else byte-for-byte
(cmat/clinvar_xml_io/clinvar_dataset.py:40-60, annotated_clinvar.py:214-258).
Here the invariant is column-level: every original column passes through
untouched (the per-turn text-equality invariant), and the enrichment is an
added array<struct> column — never a mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def annotate_transcripts(transcripts: DataFrame, triples: DataFrame) -> DataFrame:
    """transcripts + annotations: array<struct(mention, term_id, pred,
    match_type, confidence)>, sorted for determinism; turns with no links get
    an empty array."""
    per_turn = (
        triples.groupBy("conv_id", "turn_idx")
        .agg(
            F.array_sort(
                F.collect_set(
                    F.struct(
                        F.col("mention_text").alias("mention"),
                        F.col("obj").alias("term_id"),
                        F.col("pred"),
                        F.col("match_type"),
                        F.col("confidence"),
                    )
                )
            ).alias("annotations")
        )
    )
    return transcripts.join(per_turn, ["conv_id", "turn_idx"], "left").withColumn(
        "annotations",
        F.coalesce(
            F.col("annotations"),
            F.array().cast(
                "array<struct<mention:string,term_id:string,pred:string,"
                "match_type:string,confidence:string>>"
            ),
        ),
    )
