"""Pipeline counters + set-comparison metrics.

Reference analogs: the Report counter struct, closed under '+' for
distributed aggregation (cmat/output_generation/report.py:17-108), and
SetComparisonMetrics (cmat/output_generation/evaluation/set_metrics.py) —
the harness behind the P/R >= 0.95 target.

In Spark, counters are just aggregations over the same DAG (partial
aggregation replaces Report.__add__), emitted as a long-format metrics
table (FIXTURES.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def counters_from_pairs(spark, run_id: str, partition: str, pairs: list[tuple[str, int]]) -> DataFrame:
    rows = [(run_id, partition, k, int(v)) for k, v in pairs]
    return spark.createDataFrame(rows, "run_id string, partition string, counter string, value long")


def sum_counters(metrics: DataFrame) -> DataFrame:
    """Report.__add__ analog: partial per-partition counters sum to totals."""
    return metrics.groupBy("counter").agg(F.sum("value").alias("value"))


def check_tally(totals: dict[str, int]) -> None:
    """Consistency check (report.py:100-108): every distinct mention is
    either linked by exactly one stage or unmapped."""
    linked = (
        totals.get("linked_exact", 0)
        + totals.get("linked_normalized", 0)
        + totals.get("linked_fuzzy", 0)
        + totals.get("linked_xref", 0)
        + totals.get("linked_replacement", 0)
    )
    expected = totals.get("mentions_distinct", 0)
    if linked + totals.get("unmapped", 0) != expected:
        raise AssertionError(
            f"counter tally mismatch: linked={linked} unmapped={totals.get('unmapped', 0)} "
            f"!= distinct={expected}"
        )


def set_comparison_metrics(pairs: DataFrame, left_col: str, right_col: str) -> DataFrame:
    """A5 — per-key set-vs-set F1 with the 8 outcome categories of
    set_metrics.py:27-54, in pure column math. `pairs` has one row per key
    with two array columns (e.g. expected vs actual term sets)."""
    l, r = F.col(left_col), F.col(right_col)
    tp = F.size(F.array_intersect(r, l))
    fp = F.size(F.array_except(r, l))
    fn = F.size(F.array_except(l, r))
    f1 = F.when(tp + fp + fn > 0, 2 * tp / (2 * tp + fp + fn)).otherwise(F.lit(0.0))
    category = (
        F.when((F.size(l) == 0) & (F.size(r) > 0), "cv_missing")
        .when((F.size(l) > 0) & (F.size(r) == 0), "cmat_missing")
        .when((F.size(l) == 0) & (F.size(r) == 0), "both_missing")
        .when((fp > 0) & (fn == 0), "cmat_superset")
        .when((fp == 0) & (fn > 0), "cmat_subset")
        .when((fp == 0) & (fn == 0), "exact_match")
        .when(tp > 0, "divergent_match")
        .otherwise("mismatch")
    )
    scored = pairs.select(
        category.alias("category"),
        f1.alias("f1"),
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
    )
    return scored.groupBy("category").agg(
        F.count("*").alias("count"),
        F.avg("f1").alias("avg_f1"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
    )


def precision_recall(triples: DataFrame, expected: DataFrame) -> tuple[float, float]:
    """Corpus-level P/R on (subj, pred, obj) — the BASELINE.json gate."""
    keys = ["subj", "pred", "obj"]
    got = triples.select(*keys).distinct()
    exp = expected.select(*keys).distinct()
    tp = got.join(exp, keys, "inner").count()
    n_got = got.count()
    n_exp = exp.count()
    precision = tp / n_got if n_got else 0.0
    recall = tp / n_exp if n_exp else 0.0
    return precision, recall
