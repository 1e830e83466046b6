"""String/date normalization functions (SURVEY.md §2.7 F4-F12, §2.2 P5/P6),
all as native column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def norm_mention(col: Column) -> Column:
    """P5 — case normalization before every lookup
    (cmat/trait_mapping/main.py:52,57; clinvar_to_evidence_strings.py:346,411),
    plus whitespace collapsing so dictionary keys are stable."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def normalize_significance(col: Column) -> Column:
    """P6 — split a raw clinical-significance-like string on '/', ', ', '; ';
    lowercase; '_'->' '; dedup; sort (clinical_classification.py:73-78)."""
    return F.array_sort(
        F.array_distinct(
            F.split(F.regexp_replace(F.lower(col), "_", " "), r"/|, |; ")
        )
    )


def format_creation_date(col: Column) -> Column:
    """F4 — regex-extract YYYY-MM-DD (clinvar_to_evidence_strings.py:195-201)."""
    return F.regexp_extract(col, r"\d{4}-\d{2}-\d{2}", 0)


def composite_key(*cols: Column, sep: str = "_") -> Column:
    """F8 — chr_pos_ref_alt-style composite key (clinvar_measure.py:210-214)."""
    return F.concat_ws(sep, *cols)


def string_to_set(col: Column) -> Column:
    """F9 — parse a "{'A', 'B'}" set literal into an array
    (annotated_clinvar.py:312-313)."""
    cleaned = F.regexp_replace(col, r"[{}']", "")
    return F.when(cleaned == "", F.array().cast("array<string>")).otherwise(
        F.transform(F.split(cleaned, ","), lambda x: F.trim(x))
    )


def pack_cell(*cols: Column) -> Column:
    """F11 — '|'-packed candidate cell (output.py:56-66)."""
    return F.concat_ws("|", *cols)


def colon_to_vcf(col: Column) -> Column:
    """F7 — 'chr:pos:ref:alt' -> 'chr pos . ref alt' (VEP input format,
    cmat/consequence_prediction/snp_indel_variants/pipeline.py:31-43)."""
    p = F.split(col, ":")
    return F.concat_ws(" ", p[0], p[1], F.lit("."), p[2], p[3])


def vcf_to_colon(col: Column) -> Column:
    """F7 inverse — 'chr pos . ref alt' -> 'chr:pos:ref:alt'."""
    p = F.split(col, " ")
    return F.concat_ws(":", p[0], p[1], p[3], p[4])


def microsatellite_category(
    variant_type: Column,
    has_complete_coordinates: Column,
    vcf_ref: Column,
    vcf_alt: Column,
) -> Column:
    """P8 — classify a Microsatellite measure (cmat/clinvar_xml_io/
    clinvar_measure.py:165-178): with complete coordinates, the explicit
    insertion length len(alt) - len(ref) (:160-163) decides deletion /
    short_expansion / repeat_expansion at REPEAT_EXPANSION_THRESHOLD (:21);
    without coordinates it is no_complete_coords. Non-Microsatellite
    measures classify as NULL."""
    from ..config import REPEAT_EXPANSION_THRESHOLD

    ins_len = F.length(vcf_alt) - F.length(vcf_ref)
    return F.when(
        variant_type == "Microsatellite",
        F.when(~has_complete_coordinates, "no_complete_coords")
        .when(ins_len < 0, "deletion")
        .when(ins_len < REPEAT_EXPANSION_THRESHOLD, "short_expansion")
        .otherwise("repeat_expansion"),
    )


def is_repeat_expansion_variant(category: Column) -> Column:
    """P8 — the coordinate-span form of the repeat-expansion predicate
    (clinvar_measure.py:180-183): repeat_expansion, or a Microsatellite
    without complete coordinates (given the benefit of the doubt)."""
    return F.coalesce(
        category.isin("repeat_expansion", "no_complete_coords"), F.lit(False)
    )


def has_ambiguous_bases(col: Column) -> Column:
    """P9 — true when an allele contains non-ACGT bases; such variants are
    skipped (cmat/output_generation/clinvar_to_evidence_strings.py:20,300-302,
    bin/consequence_prediction/extract_variants_for_vep.py:14-22)."""
    return col.rlike("[^ACGT]")
