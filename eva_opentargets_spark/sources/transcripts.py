"""Transcript sources.

The engine's primary input is a table of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts) — the analog of the reference's
streaming ClinVar XML scan (cmat/clinvar_xml_io/clinvar_dataset.py:22-28,
xml_parsing.py:40-49). In production this is an Iceberg table bucketed by
conv_id; in the sandbox we read parquet, and for driver-checked queries we
derive a deterministic transcript view from the synthetic `documents` table
(one document row == one turn; 100 conversations round-robin on doc_id).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import TRANSCRIPTS

N_CONVERSATIONS = 100
TS_EPOCH = "2025-01-01 00:00:00"


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts derived from documents.parquet.

    doc_id % 100 -> conversation, doc_id // 100 -> turn index, so turn order
    is stable (per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering). `tool` is populated so the exclusion
    filter (cmat/clinvar_xml_io/filtering.py:4-12 analog) has work to do.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # conv_id-hash repartition mirrors the production bucketed-table layout
    # (write_transcripts below) — but ONLY when the input layout actually
    # under-parallelizes the scan (the testdata is one parquet file = 1-2
    # input splits, which would serialize the extraction UDF onto 2 cores).
    # A properly bucketed production table skips this shuffle entirely.
    from ..session import estimated_input_splits

    n_parts = spark.sparkContext.defaultParallelism
    if estimated_input_splits(docs) < n_parts // 2:
        docs = docs.repartition(n_parts, (F.col("doc_id") % N_CONVERSATIONS))
    return docs.select(*_transcript_cols())


@lru_cache(maxsize=1)
def _transcript_cols() -> tuple:
    """The static transcript-derivation select list, built once per
    process (round 6: pure driver plan-construction latency — this
    derivation fronts every kg_* query)."""
    return (
        F.concat(F.lit("c"), F.lpad((F.col("doc_id") % N_CONVERSATIONS).cast("string"), 4, "0")).alias("conv_id"),
        (F.col("doc_id") / N_CONVERSATIONS).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("user"))
        .when(F.col("doc_id") % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
        .alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 17 == 0, F.lit("redacted"))
        .when(F.col("doc_id") % 5 == 0, F.col("source"))
        .otherwise(F.lit(None).cast("string"))
        .alias("tool"),
        F.expr(f"timestamp'{TS_EPOCH}' + make_interval(0, 0, 0, 0, 0, 0, doc_id)").alias("ts"),
    )


def derive_transcripts_duckdb_sql(sf_dir: str) -> str:
    """The same derivation in DuckDB dialect — oracle-side twin of
    :func:`derive_transcripts`. Kept adjacent so they cannot drift."""
    return f"""
    SELECT
      'c' || lpad(CAST(doc_id % {N_CONVERSATIONS} AS VARCHAR), 4, '0') AS conv_id,
      CAST(doc_id // {N_CONVERSATIONS} AS INT) AS turn_idx,
      CASE doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
      text,
      CASE WHEN doc_id % 17 = 0 THEN 'redacted'
           WHEN doc_id % 5 = 0 THEN source
           ELSE NULL END AS tool,
      TIMESTAMP '{TS_EPOCH}' + to_seconds(doc_id) AS ts
    FROM documents
    """


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a materialized transcript table (parquet dir or Iceberg table
    name if an Iceberg catalog is configured)."""
    if path.startswith("iceberg:"):
        return spark.read.format("iceberg").load(path[len("iceberg:"):])
    return spark.read.schema(TRANSCRIPTS).parquet(path)


def write_transcripts(df: DataFrame, path: str, buckets: int = 32) -> None:
    """Materialize transcripts partitioned by a conv_id hash bucket so the
    downstream mention-extraction stage is shuffle-free and skew-bounded
    (north_rule: explicit partition/skew handling)."""
    (
        df.withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)))
        .repartition(buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
