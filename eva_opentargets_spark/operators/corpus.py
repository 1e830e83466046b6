"""Corpus-level profiling and sampling operators for training-data
pipelines (engine-new; the reference has no corpus surface — SURVEY.md §2.4
A-series is the aggregation-shape precedent).

Both are one-pass, JVM-side column math:
  * corpus_stats — the profiling rollup a data curator reads before and
    after every filtering stage: per (source, lang) doc counts, token
    volume, length and quality distribution. ONE aggregation (map-side
    partial) over a pruned two-column-plus scan.
  * hash_sample — DETERMINISTIC sampling: membership depends only on
    (doc_id, salt), never on partitioning, executor count, or Spark's RNG
    seeds, so a sample is reproducible across clusters and re-runs and
    composable (the 10% sample of a 50% sample with different salts is an
    unbiased 5%). This is the sampling discipline a 100 TB corpus needs:
    df.sample() re-draws on every action unless seeded AND partitioning-
    stable; a content-hash predicate is pushdown-friendly and stable by
    construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import quality_score, tokens


def corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(source, lang) profiling rollup: docs, token volume, mean doc
    length, mean quality score. One partial-aggregated groupBy."""
    toks = F.size(tokens(F.col(text_col)))
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(toks).alias("total_tokens"),
            F.round(F.avg(toks), 4).alias("avg_tokens"),
            F.round(F.avg(F.length(text_col)), 4).alias("avg_chars"),
            F.round(F.avg(quality_score(F.col(text_col))), 4).alias("avg_quality"),
        )
    )


def sample_bucket(id_col, salt: str = "") -> F.Column:
    """Deterministic bucket in [0, 100): first 8 md5 hex chars of
    '<salt>:<id>' as an int, mod 100. Identical formula in the DuckDB
    oracle twin."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % 100


def hash_sample(
    docs: DataFrame, pct: int = 10, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~pct% of docs by the deterministic content-hash bucket — a
    narrow filter (no shuffle, no RNG state), reproducible anywhere the
    same ids exist."""
    return docs.filter(sample_bucket(F.col(id_col), salt) < pct)


def curate(
    docs: DataFrame,
    clusters: DataFrame,
    min_quality: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """The corpus-curation funnel as ONE composed plan: every doc gets its
    first matching drop reason, in pipeline order —
      exact_duplicate  — not the canonical (min doc_id) of its content
                         fingerprint group
      near_duplicate   — not the canonical survivor of its near-dup
                         cluster (`clusters` = dedup.near_dup_clusters
                         output over any pair generator)
      low_quality      — quality_score < min_quality
      keep             — survives all stages.
    Returns (doc_id, quality, drop_reason).

    Plan shape: one window over the fingerprint groups (shuffle on the
    md5 fingerprint — same key exact dedup shuffles on), one equi-join to
    the cluster table, everything else in-row; the funnel is ONE scan of
    the corpus, not one scan per stage."""
    from pyspark.sql import Window

    from ..functions.text import fingerprint

    fp = fingerprint(F.col(text_col))
    w = Window.partitionBy("__fp").orderBy("doc_id")
    staged = (
        docs.withColumn("__fp", fp)
        .withColumn("__fp_canon", F.row_number().over(w) == 1)
        .join(
            clusters.select("doc_id", F.col("is_canonical").alias("__nd_canon")),
            "doc_id",
            "left",
        )
        .withColumn("__q", F.round(quality_score(F.col(text_col)), 4))
    )
    reason = (
        F.when(~F.col("__fp_canon"), "exact_duplicate")
        .when(~F.coalesce(F.col("__nd_canon"), F.lit(True)), "near_duplicate")
        .when(F.col("__q") < min_quality, "low_quality")
        .otherwise("keep")
    )
    return staged.select("doc_id", F.col("__q").alias("quality"), reason.alias("drop_reason"))
