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
        # no surface-variant columns: still pick the survivor by a TOTAL
        # order over the remaining columns (dropDuplicates would keep an
        # arbitrary row — nondeterministic packed cells)
        order = [
            F.col(c).asc()
            for c in sorted(candidates.columns)
            if c not in ("mention_norm", "term_id")
        ]
        if not order:
            return candidates.dropDuplicates(["mention_norm", "term_id"])
    w = Window.partitionBy("mention_norm", "term_id").orderBy(*order)
    return (
        candidates.withColumn("__sv", F.row_number().over(w))
        .filter(F.col("__sv") == 1)
        .drop("__sv")
    )


def _term_status(in_ontology, is_current, ontology: str):
    """F12 — CURRENT/OBSOLETE/NOT_CONTAINED status label
    (create_table_for_manual_curation.py:49-57)."""
    return (
        F.when(in_ontology & is_current, F.lit(f"{ontology}_CURRENT"))
        .when(in_ontology & ~is_current, F.lit(f"{ontology}_OBSOLETE"))
        .otherwise(F.lit("NOT_CONTAINED"))
    )


def previous_mapping_cells(
    previous_mappings: DataFrame, terms: DataFrame, ontology: str = TARGET_ONTOLOGY
) -> DataFrame:
    """Decoration dims for the curation sheet (reference
    create_table_for_manual_curation.py:13-34,60-107): one row per
    previously-used mapping of a mention with its packed
    'term|label|NOT_SPECIFIED|previously-used|status' cell, plus the
    replacement cell when the previous term is obsolete and has a
    replacement — following at most one extra obsolete hop
    (find_replacement_mapping max_depth=1, :24-34). All term lookups are
    broadcast joins against the dictionary-scale terms table."""
    from ..functions.ontology import curie_from_iri

    t = F.broadcast(
        terms.select(
            "term_id",
            F.lower(F.col("label")).alias("t_label"),
            "in_target_ontology",
            "is_obsolete",
            "replaced_by",
        )
    )
    prev = previous_mappings.select(
        "mention_norm",
        curie_from_iri(F.col("iri")).alias("prev_term"),
        F.lower(F.col("label")).alias("prev_label"),
    )

    def status_of(alias: str):
        in_ont = F.col(f"{alias}.in_target_ontology")
        return F.when(
            F.col(f"{alias}.term_id").isNull(), F.lit("NOT_CONTAINED")
        ).otherwise(_term_status(in_ont, in_ont & ~F.col(f"{alias}.is_obsolete"), ontology))

    joined = (
        prev.join(t.alias("p"), prev.prev_term == F.col("p.term_id"), "left")
        .join(t.alias("r1"), F.col("p.replaced_by") == F.col("r1.term_id"), "left")
        .join(t.alias("r2"), F.col("r1.replaced_by") == F.col("r2.term_id"), "left")
    )
    prev_cell = F.concat_ws(
        "|", "prev_term", "prev_label", F.lit("NOT_SPECIFIED"),
        F.lit("previously-used"), status_of("p"),
    )
    r1_cell = F.concat_ws(
        "|", F.col("p.replaced_by"), F.coalesce(F.col("r1.t_label"), F.lit("")),
        F.lit("NOT_SPECIFIED"), F.lit("replacement"), status_of("r1"),
    )
    r2_cell = F.concat_ws(
        "|", F.col("r1.replaced_by"), F.coalesce(F.col("r2.t_label"), F.lit("")),
        F.lit("NOT_SPECIFIED"), F.lit("replacement"), status_of("r2"),
    )
    r1_is_obsolete_status = status_of("r1") == f"{ontology}_OBSOLETE"
    replacement_cell = (
        F.when(F.col("p.replaced_by").isNull(), F.lit(""))
        .when(~r1_is_obsolete_status, r1_cell)
        .when(F.col("r1.replaced_by").isNull(), F.lit(""))
        .otherwise(r2_cell)
    )
    return joined.select(
        "mention_norm",
        prev_cell.alias("previous_mapping"),
        replacement_cell.alias("replacement_mapping"),
    )


def curation_table(
    unresolved: DataFrame,
    candidates: DataFrame,
    distinct_mentions: DataFrame,
    max_candidates: int = CURATION_MAX_CANDIDATES,
    ontology: str = TARGET_ONTOLOGY,
    previous_mappings: DataFrame | None = None,
    terms: DataFrame | None = None,
    nt_mentions: DataFrame | None = None,
) -> DataFrame:
    """One row per unresolved mention: frequency, priority note, and up to
    `max_candidates` packed candidate cells ordered best-first.

    With `previous_mappings` + `terms` the sheet is DECORATED like the
    reference's create_table_for_manual_curation.py:60-107: one output row
    per previously-used mapping of the mention (single empty-cell row when
    there is none), an `exact_mapping` cell (the best-ranked candidate
    whose label equals the mention, :37-41), a `replacement_mapping` cell
    for obsolete previous terms, a `notes` column ('NT expansion' when
    `nt_mentions` flags the mention — output.py:51-53), and the reference's
    (notes, freq) DESCENDING row order (:103) with deterministic
    (mention, previous_mapping) tie-breaks."""
    status = _term_status(F.col("in_ontology"), F.col("is_current"), ontology)
    cell = F.concat_ws("|", "term_id", "label_norm", "confidence", status)
    ranked_rows = (
        rank_candidates(
            dedupe_surface_variants(candidates.join(unresolved, "mention_norm", "inner"))
        )
        .filter(F.col("rank") <= max_candidates)
        .withColumn("cell", cell)
    )
    ranked = (
        ranked_rows.groupBy("mention_norm")
        .agg(F.array_sort(F.collect_list(F.struct("rank", "cell"))).alias("rc"))
        .select("mention_norm", F.col("rc.cell").alias("candidates"))
    )
    base = (
        unresolved.join(distinct_mentions, "mention_norm", "left")
        .join(ranked, "mention_norm", "left")
        .select(
            "mention_norm",
            F.coalesce("freq", F.lit(0)).alias("freq"),
            F.coalesce("candidates", F.array().cast("array<string>")).alias("candidates"),
        )
    )
    if previous_mappings is None or terms is None:
        return base.orderBy(F.col("freq").desc(), F.col("mention_norm").asc())

    # exact_mapping from the SAME aggregation pass as the packed cells
    # below would be ideal; base already aggregated, so derive it with one
    # conditional aggregate over the same ranked_rows subtree — Spark
    # reuses the exchange, not a second ranking pipeline
    exact_m = (
        ranked_rows.groupBy("mention_norm")
        .agg(
            F.min(
                F.when(
                    F.col("label_norm") == F.col("mention_norm"),
                    F.struct("rank", "cell"),
                )
            )["cell"].alias("exact_mapping")
        )
        .filter(F.col("exact_mapping").isNotNull())
    )
    prev_cells = previous_mapping_cells(previous_mappings, terms, ontology)
    notes = F.lit("")
    decorated = base.join(exact_m, "mention_norm", "left").join(
        prev_cells, "mention_norm", "left"
    )
    if nt_mentions is not None:
        nt = nt_mentions.select("mention_norm").distinct().withColumn("__nt", F.lit(1))
        decorated = decorated.join(F.broadcast(nt), "mention_norm", "left")
        notes = F.when(F.col("__nt").isNotNull(), "NT expansion").otherwise("")
    return (
        decorated.select(
            "mention_norm",
            "freq",
            notes.alias("notes"),
            F.coalesce("previous_mapping", F.lit("")).alias("previous_mapping"),
            F.coalesce("exact_mapping", F.lit("")).alias("exact_mapping"),
            F.coalesce("replacement_mapping", F.lit("")).alias("replacement_mapping"),
            "candidates",
        )
        .orderBy(
            F.col("notes").desc(),
            F.col("freq").desc(),
            F.col("mention_norm").asc(),
            F.col("previous_mapping").asc(),
        )
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
