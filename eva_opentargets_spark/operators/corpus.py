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


def sample_bucket(id_col, salt: str = "", buckets: int = 100) -> F.Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of
    '<salt>:<id>' as an int, mod buckets. Identical formula in the DuckDB
    oracle twin."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % buckets


def hash_sample(
    docs: DataFrame, pct: int = 10, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~pct% of docs by the deterministic content-hash bucket — a
    narrow filter (no shuffle, no RNG state), reproducible anywhere the
    same ids exist."""
    return docs.filter(sample_bucket(F.col(id_col), salt) < pct)


def _word_shingles(text_col: str, n: int) -> F.Column:
    """In-row word n-gram array (the blocked_jaccard_pairs shingle recipe,
    dedup.py:233-236): docs shorter than n tokens contribute ONE short
    shingle of whatever tokens exist."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    if n <= 1:
        return toks
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination — the eval-leak scrub every LLM training
    corpus runs before training (the n-gram-overlap discipline of GPT-3
    appendix C / PaLM / Llama: a training doc is contaminated if it shares
    >= min_overlap word n-grams with any benchmark/eval document).
    Returns (doc_id, n_contaminated_ngrams, contaminated) for every corpus
    doc; n_contaminated_ngrams counts the doc's DISTINCT shingles that
    appear anywhere in the benchmark set.

    Scale shape: the benchmark side is eval suites — thousands of docs, not
    billions — so its distinct shingle set is BROADCAST; the corpus side is
    one in-row shingle build + explode (map-side, no shuffle) into a
    broadcast-hash semi-join, and the only shuffle in the plan is the
    doc-grain overlap count. The corpus is never self-joined and never
    shuffled at shingle grain."""
    sh = _word_shingles(text_col, n)
    bench_sh = benchmark.select(F.explode(F.array_distinct(sh)).alias("sh")).distinct()
    doc_sh = docs.select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("int")
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_hits.alias("n_contaminated_ngrams"),
            (n_hits >= min_overlap).alias("contaminated"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 128,
    n_shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for LLM training — the concat-and-chunk layout:
    docs are concatenated in stable (shard, doc_id) order and the token
    stream is cut into fixed ctx_len windows; each doc learns which
    training sequence it starts in and at what offset. Returns
    (doc_id, shard, n_tokens, seq_idx, seq_offset) where seq_idx is the
    window holding the doc's FIRST token and seq_offset its position
    within that window.

    Scale shape: a single global concatenation order would be one
    unpartitioned window function — a single-task sort at corpus scale.
    Packing is therefore SHARDED: shard = deterministic hash of doc_id
    (reproducible anywhere, like hash_sample), windows never cross shard
    boundaries, and the cumulative sum runs per shard in parallel — in
    production n_shards scales with the cluster (thousands), each shard's
    running sum is one sorted partition, and the waste is bounded by
    < ctx_len tokens per shard tail. Deterministic by construction:
    re-running packing on the same corpus yields byte-identical layouts,
    which is what makes training resumable mid-epoch."""
    from pyspark.sql import Window

    from ..functions.text import token_count

    d = docs.select(
        "doc_id",
        sample_bucket(F.col("doc_id"), "pack", n_shards).cast("int").alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(start / ctx_len).cast("int").alias("seq_idx"),
        (start % ctx_len).cast("int").alias("seq_offset"),
    )


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
