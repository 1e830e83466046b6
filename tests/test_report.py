"""Set-comparison metrics tests, mirroring the category semantics of
cmat/output_generation/evaluation/set_metrics.py:27-54.
"""

from eva_opentargets_spark.operators.report import set_comparison_metrics


def test_categories(spark):
    rows = [
        (["a", "b"], ["a", "b"]),  # exact_match
        (["a"], ["a", "b"]),  # cmat_superset (fp, no fn)
        (["a", "b"], ["a"]),  # cmat_subset (fn, no fp)
        (["a", "b"], ["a", "c"]),  # divergent_match (tp>0, fp, fn)
        (["a"], ["b"]),  # mismatch (tp==0)
        ([], ["a"]),  # cv_missing
        (["a"], []),  # cmat_missing
        ([], []),  # both_missing
    ]
    df = spark.createDataFrame(rows, "cv array<string>, cmat array<string>")
    got = {r.category: r for r in set_comparison_metrics(df, "cv", "cmat").collect()}
    for cat in (
        "exact_match",
        "cmat_superset",
        "cmat_subset",
        "divergent_match",
        "mismatch",
        "cv_missing",
        "cmat_missing",
        "both_missing",
    ):
        assert got[cat]["count"] == 1, cat
    assert got["exact_match"].avg_f1 == 1.0
    # f1 for superset case: tp=1 fp=1 fn=0 -> 2/3 (set_metrics.py:78-86)
    assert abs(got["cmat_superset"].avg_f1 - 2 / 3) < 1e-9
    assert got["mismatch"].avg_f1 == 0.0
