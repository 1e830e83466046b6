"""Explicit skew-handling utilities (north_rule: "partitioning / shuffle /
skew handled explicitly").

The engine's primary skew defenses are structural — the stop-list kills the
degenerate heads (P2), and the distinct-mention pre-aggregation (A1) collapses
hot strings before any scoring — but two generic tools cover the rest:

  * salted two-phase aggregation, for aggregations whose single hot key would
    otherwise overload one reducer;
  * salted broadcast-side explosion for joining a skewed fact table against a
    dimension that must be shuffled (only needed when the dimension is too
    large to broadcast — with broadcastable dimensions, prefer F.broadcast).

AQE's runtime skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
session.py) remains the backstop for what these don't cover.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt derived from the row content (xxhash64 of all
    columns mod n_salts) — reproducible, unlike rand()."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int"))


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16) -> DataFrame:
    """Two-phase count: groupBy(key, salt) -> partial counts spread over
    n_salts reducers -> groupBy(key) final sum. Use when one key holds a
    dominant share of all rows."""
    stage1 = (
        salted(df, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return stage1.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))


def salt_join_skewed(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join a skewed fact table against a non-broadcastable dimension:
    facts get a random-ish (hash-derived) salt, the dimension is exploded
    n_salts ways, and the join key becomes (key, salt) — hot keys spread over
    n_salts reducers."""
    f = facts.withColumn("_salt", F.pmod(F.xxhash64(*facts.columns), F.lit(n_salts)).cast("int"))
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d, [key, "_salt"], "inner").drop("_salt")


def bucket_by_conv(df: DataFrame, n_buckets: int = 32) -> Column:
    """The conv_id bucketing column used across the engine (Iceberg bucket
    transform analog): pmod(xxhash64(conv_id), n)."""
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
