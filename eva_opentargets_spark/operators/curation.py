"""Curation routing: unresolved mentions -> a curation table with ranked,
packed candidate cells; resolved mentions -> the mappings table; plus the
mapping-database merge.

Reference analogs:
  * output routing (cmat/trait_mapping/output.py:71-84)
  * best-candidate ordering (W1: zooma.py:53-55 — (confidence, in_ontology,
    is_current) descending)
  * packed '|' cells + status labels (F11/F12: output.py:56-66,
    bin/trait_mapping/create_table_for_manual_curation.py:49-57)
  * top-50 cap (W3: create_table_for_manual_curation.py:96)
  * row ordering by (notes, frequency) desc (W4: :103)
  * previous-mappings anti-join merge (J7:
    pipelines/export_curation_spreadsheet.nf:119-140)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import CURATION_MAX_CANDIDATES, TARGET_ONTOLOGY


def rank_candidates(candidates: DataFrame) -> DataFrame:
    """W1 — total order (confidence, in_ontology, is_current) desc, with
    deterministic tie-breaks (W5 lexicographic-first discipline): term_id,
    then — since the synonym tier can surface the same term through several
    label variants — (lev, label_norm) when those columns are present, so
    row_number is a TOTAL order and packed cells are stable across runs."""
    conf_rank = (
        F.when(F.col("confidence") == "HIGH", 4)
        .when(F.col("confidence") == "GOOD", 3)
        .when(F.col("confidence") == "MEDIUM", 2)
        .otherwise(1)
    )
    order = [
        conf_rank.desc(),
        F.col("in_ontology").desc(),
        F.col("is_current").desc(),
        F.col("term_id").asc(),
    ]
    for tie in ("lev", "label_norm"):
        if tie in candidates.columns:
            order.append(F.col(tie).asc())
    w = Window.partitionBy("mention_norm").orderBy(*order)
    return candidates.withColumn("rank", F.row_number().over(w))


def dedupe_surface_variants(candidates: DataFrame) -> DataFrame:
    """One candidate row per (mention, term): the best (lowest-lev, then
    lexicographically-first label) surface variant represents the term —
    synonym-tier fan-out must not consume top-N candidate slots or make the
    packed cell's label nondeterministic (link_fuzzy applies the same rule
    to accepted links).

    Same column-presence guard as rank_candidates: a candidates frame
    without lev/label_norm (which rank_candidates explicitly supports) has
    no surface variants to collapse — ordering on the columns that ARE
    present keeps the row_number deterministic."""
    order = [F.col(c).asc() for c in ("lev", "label_norm") if c in candidates.columns]
    if not order:
        return candidates.dropDuplicates(["mention_norm", "term_id"])
    w = Window.partitionBy("mention_norm", "term_id").orderBy(*order)
    return (
        candidates.withColumn("__sv", F.row_number().over(w))
        .filter(F.col("__sv") == 1)
        .drop("__sv")
    )


def curation_table(
    unresolved: DataFrame,
    candidates: DataFrame,
    distinct_mentions: DataFrame,
    max_candidates: int = CURATION_MAX_CANDIDATES,
    ontology: str = TARGET_ONTOLOGY,
) -> DataFrame:
    """One row per unresolved mention: frequency, priority note, and up to
    `max_candidates` packed candidate cells ordered best-first."""
    status = F.when(
        F.col("in_ontology") & F.col("is_current"), F.lit(f"{ontology}_CURRENT")
    ).when(
        F.col("in_ontology") & ~F.col("is_current"), F.lit(f"{ontology}_OBSOLETE")
    ).otherwise(F.lit("NOT_CONTAINED"))
    cell = F.concat_ws("|", "term_id", "label_norm", "confidence", status)
    ranked = (
        rank_candidates(
            dedupe_surface_variants(candidates.join(unresolved, "mention_norm", "inner"))
        )
        .filter(F.col("rank") <= max_candidates)
        .withColumn("cell", cell)
        .groupBy("mention_norm")
        .agg(F.array_sort(F.collect_list(F.struct("rank", "cell"))).alias("rc"))
        .select("mention_norm", F.col("rc.cell").alias("candidates"))
    )
    return (
        unresolved.join(distinct_mentions, "mention_norm", "left")
        .join(ranked, "mention_norm", "left")
        .select(
            "mention_norm",
            F.coalesce("freq", F.lit(0)).alias("freq"),
            F.coalesce("candidates", F.array().cast("array<string>")).alias("candidates"),
        )
        .orderBy(F.col("freq").desc(), F.col("mention_norm").asc())
    )


def merge_mapping_databases(previous: DataFrame, new: DataFrame) -> DataFrame:
    """J7 — keep previous mappings whose mention is absent from the new set,
    union with the new set (export_curation_spreadsheet.nf:119-140:
    `join -t$'\\t' ...` + `comm -23`), dedup like `sort -u` (SO2)."""
    kept_previous = previous.join(new, "mention_norm", "left_anti")
    return new.unionByName(kept_previous).distinct()


def assert_no_duplicate_mappings(mappings: DataFrame) -> None:
    """A4 on the mapping table (export_curation_spreadsheet.nf:174-189)."""
    dups = mappings.groupBy("mention_norm", "iri").count().filter(F.col("count") > 1)
    if dups.limit(1).count():
        raise AssertionError("duplicate (mention, iri) rows in mapping table")
