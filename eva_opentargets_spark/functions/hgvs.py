"""HGVS identifier parsing + repeat-expansion classification (F5/F6), as
native column expressions (regexp_extract battery — JVM-side, codegen).

Faithful to the reference's four regex families and their precedence:
  * sequence info           cmat/clinvar_xml_io/hgvs_variant.py:29-37,68-87
  * single-position variant hgvs_variant.py:89-99
  * simple range            hgvs_variant.py:101-108
  * repeat w/ coord pivots  hgvs_variant.py:118-162
  * structural type rules   hgvs_variant.py:110-116
  * repeat-type inference   cmat/clinvar_xml_io/repeat_variant.py:22-99
    (protein HGVS => trinucleotide; unit length priority over span; trailing
    'del'/'del)' never an expansion; description-notation fallback)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

IUPAC = "GATCRYWSMKHBVDN"

_SEQ_ID = r"^([a-zA-Z][a-zA-Z0-9_.]+)(?:\([a-zA-Z0-9_.]+\))?:"
_ANY_SEQ = _SEQ_ID + r"([cgnpmor])\."
_PIVOT = r"(?:[-+]?[0-9]+(?=[-+]))?"

_SINGLE_POS = _ANY_SEQ + r"([0-9]+)([a-zA-Z0-9>]*)"
_RANGE = _ANY_SEQ + r"([0-9]+)_([0-9]+)([a-zA-Z0-9]*)$"
_PIVOTED = (
    _ANY_SEQ
    + _PIVOT
    + r"\*?([+-]?[0-9]+)"
    + r"(?:_" + _PIVOT + r"\*?([+-]?[0-9]+))?"
    + rf"([{IUPAC}]*)"
)
_DESCRIPTION = rf"\(?([{IUPAC}]+)\)?\(?n\)?(?: REPEAT)? EXPANSION"

_SEQ_TYPE = {
    "c": "coding",
    "g": "genomic",
    "n": "noncoding",
    "p": "protein",
    "m": "mitochondrial",
    "o": "circular",
    "r": "rna",
}


def _nullif_empty(c: Column) -> Column:
    return F.when(c != "", c)


def _structural_type(suffix: Column, prev: Column) -> Column:
    """hgvs_variant.py:110-116 — elif chain with the delins guards."""
    return (
        F.when(suffix.contains("del") & ~suffix.contains("delins"), "deletion")
        .when(suffix.contains("dup"), "duplication")
        .when(suffix.contains("ins") & ~suffix.contains("delins"), "insertion")
        .otherwise(prev)
    )


def parse_hgvs(text: Column) -> Column:
    """Returns struct(reference_sequence, sequence_type, variant_type, start,
    stop, repeat_sequence) with the reference's exact match precedence."""
    ref = _nullif_empty(F.regexp_extract(text, _ANY_SEQ, 1))
    seq_letter = F.regexp_extract(text, _ANY_SEQ, 2)
    seq_type = F.lit(None).cast("string")
    for letter, name in _SEQ_TYPE.items():
        seq_type = F.when(seq_letter == letter, name).otherwise(seq_type)

    # single-position: needs BOTH the position and a non-empty suffix (:92)
    sp_pos = F.regexp_extract(text, _SINGLE_POS, 3)
    sp_suffix = F.regexp_extract(text, _SINGLE_POS, 4)
    sp_hit = (sp_pos != "") & (sp_suffix != "")
    var_type = F.when(
        sp_hit,
        F.when(sp_suffix.contains(">"), "substitution").otherwise(
            _structural_type(sp_suffix, F.lit(None).cast("string"))
        ),
    )
    start = F.when(sp_hit, sp_pos.cast("int"))
    stop = start

    # simple range overwrites (:101-108); its suffix is optional
    r_start = F.regexp_extract(text, _RANGE, 3)
    r_stop = F.regexp_extract(text, _RANGE, 4)
    r_suffix = F.regexp_extract(text, _RANGE, 5)
    r_hit = (r_start != "") & (r_stop != "")
    start = F.when(r_hit, r_start.cast("int")).otherwise(start)
    stop = F.when(r_hit, r_stop.cast("int")).otherwise(stop)
    var_type = F.when(r_hit & (r_suffix != ""), _structural_type(r_suffix, var_type)).otherwise(
        var_type
    )

    # pivoted coordinates: only fill the span if there is no valid precise
    # span yet (:157-159); repeat sequence always taken from here (:162)
    p_start = F.regexp_extract(text, _PIVOTED, 3)
    p_stop = F.regexp_extract(text, _PIVOTED, 4)
    p_seq = _nullif_empty(F.regexp_extract(text, _PIVOTED, 5))
    has_span = start.isNotNull() & stop.isNotNull() & (stop > start)
    p_hit = ~has_span & (p_start != "") & (p_stop != "")
    start = F.when(p_hit, p_start.cast("int")).otherwise(start)
    stop = F.when(p_hit, p_stop.cast("int")).otherwise(stop)

    return F.struct(
        ref.alias("reference_sequence"),
        seq_type.alias("sequence_type"),
        var_type.alias("variant_type"),
        start.alias("start"),
        stop.alias("stop"),
        p_seq.alias("repeat_sequence"),
    )


def _type_from_length(length: Column) -> Column:
    """repeat_variant.py:67-70."""
    return F.when(
        length.isNotNull() & (length > 0),
        F.when(length % 3 == 0, "trinucleotide_repeat_expansion").otherwise(
            "short_tandem_repeat_expansion"
        ),
    )


def infer_repeat_info(text: Column) -> Column:
    """repeat_variant.py:22-99 — returns struct(repeat_type, transcript_id)."""
    h = parse_hgvs(text)
    is_gc = h["sequence_type"].isin("genomic", "coding")
    transcript = F.when(is_gc & h["reference_sequence"].startswith("NM"), h["reference_sequence"])
    span = F.when(
        h["start"].isNotNull() & h["stop"].isNotNull() & (h["stop"] > h["start"]),
        h["stop"] - h["start"] + 1,
    )
    unit_len = F.length(h["repeat_sequence"])
    desc_len = F.length(_nullif_empty(F.regexp_extract(text, _DESCRIPTION, 1)))

    repeat_type = (
        F.when(is_gc, F.coalesce(_type_from_length(unit_len), _type_from_length(span)))
        .when(h["sequence_type"] == "protein", F.lit("trinucleotide_repeat_expansion"))
        .otherwise(_type_from_length(desc_len))
    )
    # trailing simple deletions are never expansions (repeat_variant.py:93-97)
    repeat_type = F.when(
        text.endswith("del") | text.endswith("del)"), F.lit(None).cast("string")
    ).otherwise(repeat_type)
    return F.struct(repeat_type.alias("repeat_type"), transcript.alias("transcript_id"))
