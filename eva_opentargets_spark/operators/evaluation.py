"""Evaluation harness: compare engine output against a gold standard with
synonym bridging, per-key set metrics, and obsolete-term counters.

Reference analogs:
  * J9 — synonym-bridged comparison join: two term ids count as a match if
    either appears in the other's synonym set
    (cmat/output_generation/annotated_clinvar.py:161-170)
  * A5 — SetComparisonMetrics (evaluation/set_metrics.py) — reused from
    operators/report.py
  * A7 — uniqueness assertion: per key, exactly one distinct value
    (cmat/consequence_prediction/repeat_expansion_variants/pipeline.py:191-210)
  * A9 — obsolete-term counters (annotated_clinvar.py:52-57,142-159)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .report import set_comparison_metrics


def bridge_synonyms(pairs: DataFrame, synonyms: DataFrame,
                    left_col: str = "gold_terms", right_col: str = "got_terms") -> DataFrame:
    """J9 — canonicalize both term-set columns through a synonym table
    (term_id -> canonical_id) before comparison: a term matches if it OR any
    synonym matches. synonyms: (term_id, canonical_id)."""
    syn = F.broadcast(synonyms)

    def canon(df, col):
        exploded = df.select("key", F.explode_outer(col).alias("term_id"))
        mapped = exploded.join(syn, "term_id", "left").select(
            "key", F.coalesce("canonical_id", "term_id").alias("t")
        )
        return mapped.groupBy("key").agg(F.array_sort(F.collect_set("t")).alias(col))

    left = canon(pairs, left_col)
    right = canon(pairs, right_col)
    return left.join(right, "key", "outer").select(
        "key",
        F.coalesce(left_col, F.array().cast("array<string>")).alias(left_col),
        F.coalesce(right_col, F.array().cast("array<string>")).alias(right_col),
    )


def evaluate(pairs: DataFrame, synonyms: DataFrame | None = None) -> DataFrame:
    """pairs: (key, gold_terms array, got_terms array) -> category metrics
    (A5), optionally synonym-bridged first (J9)."""
    if synonyms is not None:
        pairs = bridge_synonyms(pairs, synonyms)
    return set_comparison_metrics(pairs, "gold_terms", "got_terms")


def assert_unique_per_key(df: DataFrame, key_cols: list[str], value_col: str) -> None:
    """A7 — every key maps to exactly one distinct value (repeat-type
    uniqueness check, repeat pipeline.py:191-210)."""
    bad = (
        df.groupBy(*key_cols)
        .agg(F.count_distinct(value_col).alias("n"))
        .filter(F.col("n") > 1)
    )
    if bad.limit(1).count():
        raise AssertionError(f"non-unique {value_col} per {key_cols}")


def obsolete_counters(terms_used: DataFrame, terms: DataFrame) -> DataFrame:
    """A9 — total/obsolete counts for a set of used term ids against the
    dictionary (annotated_clinvar.py:52-57)."""
    joined = terms_used.select(F.col("term_id")).join(
        F.broadcast(terms.select("term_id", "is_obsolete")), "term_id", "left"
    )
    return joined.agg(
        F.count("*").alias("total"),
        F.sum(F.coalesce(F.col("is_obsolete").cast("long"), F.lit(0))).alias("obsolete"),
    )
