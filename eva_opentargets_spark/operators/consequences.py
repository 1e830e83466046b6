"""S5 + J4: the consequence dictionary and the 3-level priority pairing.

Reference analogs:
  * S5 — TSV consequence load into variant_id -> [(gene, so_term)] with
    NA-gene rows dropped (cmat/output_generation/consequence_type.py:17-51)
  * J4 — get_consequence_types (clinvar_to_evidence_strings.py:266-318):
    probe the dictionary with (1) the RCV accession (repeat-expansion
    route), else (2) the chr:pos:ref:alt coordinate id (only when the
    measure has complete coordinates), else (3) the preferred HGVS id —
    rejected entirely when it maps to more than MAX_TARGET_GENES genes.

Spark shape: the dictionary is a broadcast dimension; each priority level
is a broadcast inner join whose probe side is the previous level's
left_anti remainder (shrinking probe, zero shuffles of the fact table).
The record's payload columns ride through every join, so downstream
consumers (the evidence product) never need a join-back on the turn key.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import fixtures
from ..config import MAX_TARGET_GENES

CONSEQUENCE_SCHEMA = "variant_id string, ensembl_gene_id string, gene_symbol string, so_term string"


def demo_consequences(spark: SparkSession) -> DataFrame:
    return _demo_consequences(spark)


@lru_cache(maxsize=4)
def _demo_consequences(spark: SparkSession) -> DataFrame:
    # single-slice + memoized, like the demo ontology dictionaries
    # (sources/dictionary.py round-6 note)
    from ..sources.dictionary import local_df

    return local_df(spark, fixtures.CONSEQUENCES, CONSEQUENCE_SCHEMA)


def load_consequences(spark: SparkSession, path: str) -> DataFrame:
    """S5 — TSV loader in the consequence_type.py:17-51 shape: 4-5 tab
    columns (the 5th, transcript id, optional and ignored there), short
    (<4 column) lines skipped, gene_id 'NA' rows dropped.

    An explicit nullable 5-column schema makes 4-column files load with a
    NULL transcript_id (schema inference would raise on the missing column)
    and mixed 4/5-column files parse per-line; the <4-column skip is the
    explicit non-null filter on the first four fields."""
    schema = "variant_id string, ensembl_gene_id string, gene_symbol string, so_term string, transcript_id string"
    raw = spark.read.option("sep", "\t").schema(schema).csv(path)
    return raw.filter(
        F.col("variant_id").isNotNull()
        & F.col("ensembl_gene_id").isNotNull()
        & F.col("gene_symbol").isNotNull()
        & F.col("so_term").isNotNull()
        & (F.col("ensembl_gene_id") != "NA")
    )


_PAYLOAD = ["ensembl_gene_id", "gene_symbol", "so_term"]


def consequence_match_flags(
    records: DataFrame,
    consequences: DataFrame,
    max_target_genes: int = MAX_TARGET_GENES,
) -> DataFrame:
    """Per-RECORD consequence match info WITHOUT row multiplication: adds
    matched_by ('REPEAT'/'SIMPLE'/'COMPLEX'/NULL) and n_consequences (genes
    at the winning level, 0 when unmatched) via three broadcast left joins
    against per-key gene counts. This is what the failure gauntlet needs —
    existence + multiplicity — in one narrow pass (no explode, no groupBy
    over the corpus)."""
    counts = consequences.groupBy("variant_id").agg(F.count("*").alias("n"))
    r = F.broadcast(counts.select(F.col("variant_id").alias("__rk"), F.col("n").alias("__rn")))
    c = F.broadcast(counts.select(F.col("variant_id").alias("__ck"), F.col("n").alias("__cn")))
    h = F.broadcast(
        counts.filter(F.col("n") <= max_target_genes).select(
            F.col("variant_id").alias("__hk"), F.col("n").alias("__hn")
        )
    )
    out = (
        records.join(r, records["rcv_key"] == F.col("__rk"), "left")
        .join(c, records["coord_key"] == F.col("__ck"), "left")
        .join(h, records["hgvs_key"] == F.col("__hk"), "left")
    )
    matched_by = (
        F.when(F.col("__rn").isNotNull(), "REPEAT")
        .when(F.col("__cn").isNotNull(), "SIMPLE")
        .when(F.col("__hn").isNotNull(), "COMPLEX")
    )
    n_cons = F.coalesce(F.col("__rn"), F.col("__cn"), F.col("__hn"), F.lit(0)).cast("int")
    return (
        out.withColumn("matched_by", matched_by)
        .withColumn("n_consequences", n_cons)
        .drop("__rk", "__rn", "__ck", "__cn", "__hk", "__hn")
    )


def consequence_cascade(
    records: DataFrame,
    consequences: DataFrame,
    max_target_genes: int = MAX_TARGET_GENES,
    keep_unmatched: bool = True,
) -> DataFrame:
    """records (with rcv_key / coord_key / hgvs_key, possibly NULL) ->
    one row per (record x consequence) with matched_by in
    ('REPEAT', 'SIMPLE', 'COMPLEX') — the reference's level labels — plus,
    when keep_unmatched, one row per unmatched record with NULL payload
    (so the failure gauntlet can count skip_no_functional_consequences
    without a second pass).

    Plan shape: the naive formulation (per-level inner join + left_anti
    remainder, unioned) evaluates the record subtree once per level — three
    corpus scans. Instead the winning level is decided with
    consequence_match_flags (three broadcast LEFT joins, one narrow
    pipeline), and a single broadcast join on the winning key fetches that
    level's gene rows: ONE scan of the records, no union. Key namespaces
    are disjoint across levels (a dictionary variant_id is an accession, a
    coordinate id, or an HGVS string — never two of them), so the winning
    key pulls exactly the winning level's payload."""
    flagged = consequence_match_flags(records, consequences, max_target_genes)
    win_key = (
        F.when(F.col("matched_by") == "REPEAT", F.col("rcv_key"))
        .when(F.col("matched_by") == "SIMPLE", F.col("coord_key"))
        .when(F.col("matched_by") == "COMPLEX", F.col("hgvs_key"))
    )
    dim = F.broadcast(consequences.select("variant_id", *_PAYLOAD))
    out = (
        flagged.withColumn("__wk", win_key)
        .join(dim, F.col("__wk") == dim["variant_id"], "left" if keep_unmatched else "inner")
        .drop("variant_id", "__wk")
    )
    return out
