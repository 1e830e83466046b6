"""HGVS parsing + repeat classification tests, using the reference's own
docstring examples (hgvs_variant.py:135, repeat_variant.py:25-31) and its
test expectations."""

from pyspark.sql import functions as F

from eva_opentargets_spark.functions.hgvs import infer_repeat_info, parse_hgvs


def _parse(spark, text):
    return spark.range(1).select(parse_hgvs(F.lit(text)).alias("h")).first()["h"]


def _repeat(spark, text):
    return spark.range(1).select(infer_repeat_info(F.lit(text)).alias("r")).first()["r"]


def test_sequence_info(spark):
    h = _parse(spark, "NM_001256054.2(C9orf72):c.-45+63_-45+80GGGGCC(2_25)")
    assert h["reference_sequence"] == "NM_001256054.2"
    assert h["sequence_type"] == "coding"
    # pivot-based span: pivots (-45) stripped, coords +63..+80 (hgvs_variant.py:118-159)
    assert (h["start"], h["stop"]) == (63, 80)
    assert h["repeat_sequence"] == "GGGGCC"


def test_single_position_substitution(spark):
    h = _parse(spark, "NC_000001.10:g.100A>G")
    assert h["sequence_type"] == "genomic"
    assert h["variant_type"] == "substitution"
    assert (h["start"], h["stop"]) == (100, 100)


def test_simple_range_and_structural_types(spark):
    assert _parse(spark, "NM_1:c.100_200del")["variant_type"] == "deletion"
    assert _parse(spark, "NM_1:c.100_200dup")["variant_type"] == "duplication"
    assert _parse(spark, "NM_1:c.100_200ins")["variant_type"] == "insertion"
    # delins matches neither del nor ins branch (hgvs_variant.py:110-116)
    assert _parse(spark, "NM_1:c.100_200delins")["variant_type"] is None
    h = _parse(spark, "NM_1:c.100_200del")
    assert (h["start"], h["stop"]) == (100, 200)


def test_repeat_inference_examples(spark):
    # repeat_variant.py:25-31 docstring examples
    r = _repeat(spark, "NC_000004.11:g.3076606GCA[27_35]")
    assert r["repeat_type"] == "trinucleotide_repeat_expansion"
    assert r["transcript_id"] is None  # NC accession, not NM

    r = _repeat(spark, "NP_002964.3:p.Gln166(>=33)")
    assert r["repeat_type"] == "trinucleotide_repeat_expansion"  # protein rule

    r = _repeat(spark, "ATXN8, (CAG)n REPEAT EXPANSION")
    assert r["repeat_type"] == "trinucleotide_repeat_expansion"

    r = _repeat(spark, "TNRC6A, 5-BP INS, TTTCA(n) REPEAT EXPANSION")
    assert r["repeat_type"] == "short_tandem_repeat_expansion"  # unit len 5


def test_del_guard_and_transcript(spark):
    # trailing del) -> never an expansion (repeat_variant.py:93-97), even
    # though span/unit would classify it
    r = _repeat(spark, "NM_000044.4(AR):c.172_174CAG(7_34) (p.Gln66_Gln80del)")
    assert r["repeat_type"] is None
    assert r["transcript_id"] == "NM_000044.4"

    # same name without the deletion suffix classifies by unit length
    r2 = _repeat(spark, "NM_000044.4(AR):c.172_174CAG(7_34)")
    assert r2["repeat_type"] == "trinucleotide_repeat_expansion"
    assert r2["transcript_id"] == "NM_000044.4"
