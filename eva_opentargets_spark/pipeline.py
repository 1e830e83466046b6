"""End-to-end KG-construction pipeline: transcripts -> triples + metrics +
curation, as one lazy DataFrame DAG per output.

Reference analog: the annotation pipeline DAG
(pipelines/annotation_pipeline.nf:43-95) + trait-curation pipeline
(pipelines/generate_curation_spreadsheet.nf:43-56), collapsed into a single
Spark plan: Nextflow chunking/concat/counter-summing become native
partitioning and partial aggregation.

Scan discipline (round-2 fix): the extraction pandas UDF is applied in ONE
place (`extract_turn_mentions`); the occurrence view, the per-turn-distinct
view, the metrics counters and the triple path all derive from that single
`ms` array column. See run_pipeline for the measured cache-vs-recompute
tradeoff; at full 100 TB scale the extraction table is materialized to
storage between stages (the per-wave checkpoint runner does this), never
executor-memory cached.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import fixtures
from .config import STOPLIST
from .operators.curation import curation_table, merge_mapping_databases
from .operators.linking import link_cascade, unpersist_cascade
from .operators.mentions import (
    distinct_mentions,
    extract_turn_mentions,
    occurrences,
    turn_filter,
    unique_per_turn,
)
from .operators.triples import emit_triples
from .sources.dictionary import demo_terms, demo_xrefs


@dataclass
class PipelineResult:
    transcripts: DataFrame
    extracted: DataFrame  # one row per turn: (conv_id, turn_idx, valid, ms)
    mentions_all: DataFrame  # includes stop-listed (for counters)
    mentions: DataFrame
    distinct_all: DataFrame  # A1 pre-agg incl. stop-listed rows (persisted)
    distinct: DataFrame
    links: DataFrame
    candidates: DataFrame
    unresolved: DataFrame
    triples: DataFrame
    curation: DataFrame

    def unpersist(self) -> None:
        """Release the executor-memory footprint of a finished run (the
        extracted cache + the dictionary-scale distinct/cascade persists)."""
        self.extracted.unpersist()
        self.distinct_all.unpersist()
        unpersist_cascade(self.links)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    terms: DataFrame | None = None,
    xrefs: DataFrame | None = None,
    vocabulary: list[str] | None = None,
    persist_extracted: bool = False,
    spill_dir: str | None = None,
) -> PipelineResult:
    terms = terms if terms is not None else demo_terms(spark)
    xrefs = xrefs if xrefs is not None else demo_xrefs(spark)
    vocabulary = vocabulary or fixtures.mention_vocabulary()

    # ONE extraction definition that every downstream view derives from.
    # persist_extracted=False by default: measured head-to-head, recomputing
    # the extraction for the second consumer branch beats caching it — the
    # columnar cache has no vectorized path for array<struct> columns, so
    # cache build+read is SLOWER than the UDF recompute at >=8 cores
    # (local[8], 2M turns: 46.7 s recompute vs 54.9 s cached; at local[32]
    # the gap widens — the same pathology round 1 hit with the occurrence
    # cache). At 100 TB the right move is materializing the extraction to a
    # bucketed table between stages (the checkpoint runner does exactly
    # that per wave), not executor-memory caching. persist_extracted=True
    # remains available for low-core/memory-rich profiles, where halving
    # the UDF passes wins (local[2]: 78.6 s cached vs 154.8 s recompute).
    extracted = extract_turn_mentions(transcripts, vocabulary, include_invalid=True)
    if persist_extracted:
        extracted = extracted.persist()

    mentions_all = occurrences(extracted, drop_stoplisted=False)
    mentions = mentions_all.filter(~F.col("mention_norm").isin(*sorted(STOPLIST)))
    # A1 pre-agg over ALL mentions (stoplisted rows retained, filtered
    # after the groupBy — identical groups, since the stoplist predicate is
    # on the group key). distinct_all is dictionary-scale and persisted: it
    # is the ONE corpus scan that runs the extraction UDF on the metrics
    # path — the cascade and every mention-grain counter derive from it.
    # With spill_dir set, the persist becomes an explicit storage
    # materialization instead (S6 parse/process phase boundary, reference
    # trait_mapping/main.py:78-97) — the right choice at 100 TB, where the
    # boundary must survive executor loss.
    distinct_all = distinct_mentions(mentions_all)
    if spill_dir:
        from .plans.checkpoint import spill_reload

        distinct_all = spill_reload(distinct_all, f"{spill_dir}/distinct_mentions")
    else:
        distinct_all = distinct_all.persist()
    distinct = distinct_all.filter(~F.col("mention_norm").isin(*sorted(STOPLIST)))
    links, candidates, unresolved = link_cascade(distinct, terms, xrefs)
    # shuffle-free triple path: per-turn uniqueness established inside the
    # extraction row (array_distinct on the same ms column), not via a
    # cluster-wide dropDuplicates
    per_turn = unique_per_turn(extracted)
    triples = emit_triples(per_turn, links, unique_per_turn=True)
    curation = curation_table(unresolved, candidates, distinct)
    return PipelineResult(
        transcripts=transcripts,
        extracted=extracted,
        mentions_all=mentions_all,
        mentions=mentions,
        distinct_all=distinct_all,
        distinct=distinct,
        links=links,
        candidates=candidates,
        unresolved=unresolved,
        triples=triples,
        curation=curation,
    )


def compute_metrics(
    spark: SparkSession,
    result: PipelineResult,
    run_id: str = "run",
    partition: str = "all",
    corpus_only: bool = False,
) -> DataFrame:
    """A3 — the Report-counter analog (cmat/output_generation/report.py:17-77).

    Scan discipline (round-3 fix — the round-2 standalone path re-ran the
    extraction UDF for `result.distinct.count()`): the extraction UDF runs in
    exactly ONE corpus scan — the one that materializes the persisted
    `distinct_all` pre-aggregation — and every mention-grain counter derives
    from that dictionary-scale table:
      * mentions_total / mentions_stoplisted: sums of its `occurrences`
      * mentions_distinct: its non-stoplisted row count
      * triples_emitted: sum(freq x link-fanout) over non-stoplisted rows —
        freq counts distinct (conv, turn) pairs per mention, so the sum IS
        the per-turn-distinct triple count, no per-turn pass needed
    The only other corpus scan (turn counters) prunes the `ms` column away,
    so it never evaluates the UDF. Link-grain counters come from the
    persisted cascade tables.
    """
    stop = sorted(STOPLIST)
    trow = result.extracted.agg(
        F.count("*").alias("turns_total"),
        F.sum((~F.col("valid")).cast("long")).alias("turns_excluded"),
    ).first()
    fanout = result.links.groupBy("mention_norm").agg(F.count("*").alias("__n"))
    is_stop = F.col("mention_norm").isin(*stop)
    zero = F.lit(0).cast("long")
    mrow = (
        result.distinct_all.join(F.broadcast(fanout), "mention_norm", "left")
        .agg(
            F.sum("occurrences").alias("mentions_total"),
            F.sum(F.when(is_stop, F.col("occurrences")).otherwise(zero)).alias(
                "mentions_stoplisted"
            ),
            F.sum(
                F.when(~is_stop, F.col("freq") * F.coalesce(F.col("__n"), zero)).otherwise(zero)
            ).alias("triples_emitted"),
            F.sum((~is_stop).cast("long")).alias("mentions_distinct"),
        )
        .first()
    )
    counters = [
        ("turns_total", trow["turns_total"]),
        ("turns_excluded", trow["turns_excluded"] or 0),
        ("mentions_total", mrow["mentions_total"] or 0),
        ("mentions_stoplisted", mrow["mentions_stoplisted"] or 0),
        ("mentions_valid", (mrow["mentions_total"] or 0) - (mrow["mentions_stoplisted"] or 0)),
        ("triples_emitted", mrow["triples_emitted"] or 0),
    ]
    if not corpus_only:
        # link-grain counters are NOT additive across disjoint corpus waves
        # (the same mention can resolve in several waves) — wave callers pass
        # corpus_only=True and compute these once from the global cascade.
        counters.insert(5, ("mentions_distinct", mrow["mentions_distinct"] or 0))
        counters.insert(6, ("unmapped", result.unresolved.count()))
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
    rows = [(run_id, partition, k, int(v)) for k, v in counters]
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
    "turn_filter",
]
