"""Record-model tests mirroring the reference's own unit tests:

  * convert_allele_origins grouping semantics —
    tests/output_generation/test_clinvar_to_evidence_strings.py:243-300
    (somatic split off; germline-ish combined + sorted; dedup; empty ->
    single empty group)
  * clinical classification: score_map star ratings + significance
    normalization + INVALID filter (clinical_classification.py:17-33,73-78)
  * deterministic record attrs are consistent between the Spark column
    expressions and the DuckDB twin SQL (cross-engine, both from the same
    fixtures)
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from eva_opentargets_spark import fixtures
from eva_opentargets_spark.operators.records import (
    doc_id_sql,
    origin_groups_col,
    record_attrs_sql,
    with_record_attrs,
)


@pytest.mark.parametrize(
    "origins, expected",
    [
        # reference test cases: germline-ish combined, somatic split
        (["germline"], [("germline", False)]),
        (["somatic"], [("somatic", True)]),
        (["germline", "somatic"], [("somatic", True), ("germline", False)]),
        (["inherited", "germline", "de novo"], [("de novo,germline,inherited", False)]),
        (["Somatic", "SOMATIC"], [("somatic", True)]),  # case-fold + dedup
        (["germline", "germline"], [("germline", False)]),
        ([], [("", False)]),  # no origins -> one empty (germline-routed) group
    ],
)
def test_convert_allele_origins_py(origins, expected):
    assert fixtures.convert_allele_origins_py(origins) == expected


def test_origin_groups_col_matches_python_twin(spark):
    """The Spark array-algebra twin must agree with the Python twin (which
    also feeds the oracle's precomputed VALUES) on every fixture pattern."""
    rows = [(i, pat) for i, pat in enumerate(fixtures.ORIGIN_PATTERNS)]
    df = spark.createDataFrame(rows, "residue int, origins array<string>")
    got = {
        r["residue"]: [(g["allele_origins"], g["is_somatic"]) for g in r["groups"]]
        for r in df.select("residue", origin_groups_col(F.col("origins")).alias("groups")).collect()
    }
    for i, pat in enumerate(fixtures.ORIGIN_PATTERNS):
        assert got[i] == fixtures.convert_allele_origins_py(pat), pat


def test_significance_normalization_and_invalid_filter():
    # clinical_classification.py:73-78 worked example
    assert fixtures.normalize_significance_py("Benign/Likely benign, risk_factor") == [
        "benign",
        "likely benign",
        "risk factor",
    ]
    # INVALID-only -> empty valid list -> fatal_no_clinical_significance
    assert fixtures.valid_significances_py("no classifications from unflagged records") == []
    # dedup across delimiters
    assert fixtures.valid_significances_py("Pathogenic, risk_factor; Pathogenic") == [
        "pathogenic",
        "risk factor",
    ]


def test_star_score_map_is_reference_verbatim():
    """score_map parity (clinical_classification.py:17-29)."""
    stars = dict(fixtures.REVIEW_STATUS_STARS)
    assert stars["practice guideline"] == 4
    assert stars["reviewed by expert panel"] == 3
    assert stars["criteria provided, multiple submitters, no conflicts"] == 2
    assert stars["criteria provided, single submitter"] == 1
    assert stars["no assertion criteria provided"] == 0


def test_record_attrs_spark_vs_duckdb_twin(spark):
    """Cross-engine: with_record_attrs (Spark columns) vs record_attrs_sql
    (DuckDB) over the same synthetic (conv_id, turn_idx) grid."""
    turns = [(f"c{i:04d}", j) for i in range(0, 100, 7) for j in range(4)]
    sdf = spark.createDataFrame(turns, "conv_id string, turn_idx int")
    cols = [
        "study_id",
        "review_status",
        "stars",
        "clinical_significances",
        "has_valid_significance",
        "n_classifications",
        "has_measure",
        "has_complete_coordinates",
        "rcv_key",
        "coord_key",
        "hgvs_key",
        "variant_rs_id",
        "variant_nsv_id",
        "literature",
        "release_date",
        "allelic_requirements",
    ]
    got = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols)
        for r in with_record_attrs(sdf).collect()
    }
    con = duckdb.connect()
    values = ", ".join(f"('{c}', {t})" for c, t in turns)
    dsql = f"""
    WITH t(conv_id, turn_idx) AS (VALUES {values}),
    recs0 AS (SELECT conv_id, turn_idx, {doc_id_sql()} AS doc_id FROM t)
    SELECT conv_id, turn_idx, {record_attrs_sql('doc_id')} FROM recs0
    """
    want_rows = con.execute(dsql).fetchdf()
    for _, row in want_rows.iterrows():
        key = (row["conv_id"], int(row["turn_idx"]))
        want = tuple(None if (v is None or v != v) else v for v in (row[c] for c in cols))
        norm_got = tuple(
            int(v) if isinstance(v, bool) is False and isinstance(v, int) else v for v in got[key]
        )
        # normalize numpy/int/bool differences
        assert [str(a) for a in norm_got] == [str(b) for b in want], key
