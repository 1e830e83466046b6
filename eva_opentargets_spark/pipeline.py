"""End-to-end KG-construction pipeline: transcripts -> triples + metrics +
curation, as one lazy DataFrame DAG per output.

Reference analog: the annotation pipeline DAG
(pipelines/annotation_pipeline.nf:43-95) + trait-curation pipeline
(pipelines/generate_curation_spreadsheet.nf:43-56), collapsed into a single
Spark plan: Nextflow chunking/concat/counter-summing become native
partitioning and partial aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import fixtures
from .config import STOPLIST
from .operators.curation import curation_table, merge_mapping_databases
from .operators.linking import link_cascade
from .operators.mentions import (
    distinct_mentions,
    extract_mentions,
    turn_filter,
    unique_mentions_per_turn,
)
from .operators.triples import emit_triples
from .sources.dictionary import demo_terms, demo_xrefs


@dataclass
class PipelineResult:
    transcripts: DataFrame
    mentions_all: DataFrame  # includes stop-listed (for counters)
    mentions: DataFrame
    distinct: DataFrame
    links: DataFrame
    candidates: DataFrame
    unresolved: DataFrame
    triples: DataFrame
    curation: DataFrame


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    terms: DataFrame | None = None,
    xrefs: DataFrame | None = None,
    vocabulary: list[str] | None = None,
    persist_mentions: bool = False,
) -> PipelineResult:
    terms = terms if terms is not None else demo_terms(spark)
    xrefs = xrefs if xrefs is not None else demo_xrefs(spark)
    vocabulary = vocabulary or fixtures.mention_vocabulary()

    mentions_all = extract_mentions(transcripts, vocabulary, drop_stoplisted=False)
    if persist_mentions:
        # Off by default: caching the full occurrence table measurably SLOWED
        # the pipeline at high core counts (first reader of the 6M-row cache
        # paid a one-time multi-10s stall at local[32]); the narrow
        # scan+extract recompute is cheaper than the cache. At full 100 TB
        # scale, materialize the mention table to storage between stages
        # instead of executor memory.
        mentions_all = mentions_all.persist()
    mentions = mentions_all.filter(~F.col("mention_norm").isin(*sorted(STOPLIST)))
    distinct = distinct_mentions(mentions)
    links, candidates, unresolved = link_cascade(distinct, terms, xrefs)
    # shuffle-free triple path: per-turn uniqueness established inside the
    # extraction row (array_distinct), not via a cluster-wide dropDuplicates
    per_turn = unique_mentions_per_turn(transcripts, vocabulary)
    triples = emit_triples(per_turn, links, unique_per_turn=True)
    curation = curation_table(unresolved, candidates, distinct)
    return PipelineResult(
        transcripts=transcripts,
        mentions_all=mentions_all,
        mentions=mentions,
        distinct=distinct,
        links=links,
        candidates=candidates,
        unresolved=unresolved,
        triples=triples,
        curation=curation,
    )


def compute_metrics(spark: SparkSession, result: PipelineResult, run_id: str = "run") -> DataFrame:
    """A3 — the Report-counter analog, computed as aggregations over the same
    DAG (cmat/output_generation/report.py:17-77). Returned long-format
    (FIXTURES.md §7); per-partition splits come from the checkpoint runner.
    """
    # One pass over turns, one pass over the (cached) mention table, and the
    # tiny links/distinct tables — not one job per counter.
    turn_counts = result.transcripts.agg(
        F.count("*").alias("turns_total"),
        F.sum((~turn_filter()).cast("long")).alias("turns_excluded"),
    ).first()
    # single aggregation pass over the occurrence stream (no caching — see
    # run_pipeline note on the occurrence-cache pathology)
    stop = sorted(STOPLIST)
    mention_counts = result.mentions_all.agg(
        F.count("*").alias("mentions_total"),
        F.sum(F.col("mention_norm").isin(*stop).cast("long")).alias("mentions_stoplisted"),
    ).first()
    counters = [
        ("turns_total", turn_counts["turns_total"]),
        ("turns_excluded", turn_counts["turns_excluded"] or 0),
        ("mentions_total", mention_counts["mentions_total"]),
        ("mentions_stoplisted", mention_counts["mentions_stoplisted"] or 0),
        ("mentions_valid", mention_counts["mentions_total"] - (mention_counts["mentions_stoplisted"] or 0)),
        ("mentions_distinct", result.distinct.count()),
        ("unmapped", result.unresolved.count()),
        ("triples_emitted", result.triples.count()),
    ]
    by_type = {
        r["match_type"]: r["n"]
        for r in result.links.select("mention_norm", "match_type")
        .distinct()
        .groupBy("match_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for mt in ("exact", "normalized", "fuzzy", "xref", "replacement"):
        counters.append((f"linked_{mt}", int(by_type.get(mt, 0))))
    rows = [(run_id, "all", k, int(v)) for k, v in counters]
    return spark.createDataFrame(rows, "run_id string, partition string, counter string, value long")


def mappings_from_links(links: DataFrame, terms: DataFrame) -> DataFrame:
    """Finished links in the latest_mappings.tsv shape (mention, iri, label) —
    output_trait_mapping analog (cmat/trait_mapping/output.py:7-26)."""
    return (
        links.join(F.broadcast(terms.select("term_id", "iri", "label")), "term_id", "inner")
        .select("mention_norm", "iri", "label")
        .distinct()
    )


__all__ = [
    "PipelineResult",
    "run_pipeline",
    "compute_metrics",
    "mappings_from_links",
    "merge_mapping_databases",
]
