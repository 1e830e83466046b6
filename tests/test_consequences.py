"""S5/J4 tests mirroring the reference's consequence-pairing unit tests
(tests/output_generation/test_clinvar_to_evidence_strings.py:119-140):
3-level priority, coordinate gating, and the MAX_TARGET_GENES rejection.
"""

import pytest
from pyspark.sql import functions as F

from eva_opentargets_spark.operators.consequences import (
    consequence_cascade,
    consequence_match_flags,
    demo_consequences,
)


@pytest.fixture(scope="module")
def records(spark):
    # (id, rcv_key, coord_key, hgvs_key) probing every route:
    rows = [
        ("rcv_wins", "r3", "v1", "h2"),        # rcv match beats coord+hgvs
        ("coord_wins", "r99", "v22", "h2"),    # coord level; v22 -> 2 genes
        ("hgvs_ok", "r99", "v99", "h5"),       # hgvs with 2 genes (<= 3)
        ("hgvs_guarded", "r99", "v99", "h11"), # hgvs with 4 genes -> rejected
        ("no_coords", "r99", None, "h2"),      # NULL coord falls to hgvs
        ("nothing", "r99", "v99", "h99"),      # no match anywhere
    ]
    return spark.createDataFrame(
        rows, "rec string, rcv_key string, coord_key string, hgvs_key string"
    )


def test_cascade_levels_and_guard(spark, records):
    out = consequence_cascade(records, demo_consequences(spark), keep_unmatched=False)
    got = {
        (r["rec"], r["matched_by"], r["ensembl_gene_id"])
        for r in out.collect()
    }
    assert ("rcv_wins", "REPEAT", "ENSG0003") in got
    # rcv winner must NOT also match at coord level
    assert not any(r == "rcv_wins" and m != "REPEAT" for r, m, _ in got)
    assert {g for r, m, g in got if r == "coord_wins"} == {"ENSG0122", "ENSG0123"}
    assert all(m == "SIMPLE" for r, m, _ in got if r == "coord_wins")
    assert {g for r, m, g in got if r == "hgvs_ok"} == {"ENSG0205", "ENSG0206"}
    assert ("no_coords", "COMPLEX", "ENSG0202") in got
    # the 4-gene key annotates NOTHING (guard, :311-315)
    assert not any(r == "hgvs_guarded" for r, _, _ in got)
    assert not any(r == "nothing" for r, _, _ in got)


def test_cascade_keep_unmatched(spark, records):
    out = consequence_cascade(records, demo_consequences(spark), keep_unmatched=True)
    unmatched = {r["rec"] for r in out.filter(F.col("matched_by").isNull()).collect()}
    assert unmatched == {"hgvs_guarded", "nothing"}


def test_match_flags_agree_with_cascade(spark, records):
    flags = {
        r["rec"]: (r["matched_by"], r["n_consequences"])
        for r in consequence_match_flags(records, demo_consequences(spark)).collect()
    }
    assert flags["rcv_wins"] == ("REPEAT", 1)
    assert flags["coord_wins"] == ("SIMPLE", 2)
    assert flags["hgvs_ok"] == ("COMPLEX", 2)
    assert flags["hgvs_guarded"] == (None, 0)
    assert flags["no_coords"] == ("COMPLEX", 1)
    assert flags["nothing"] == (None, 0)
