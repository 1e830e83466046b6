"""Priority-cascade equi-joins + guards.

Reference analogs:
  * J4 — consequence pairing by 3-level key priority: RCV accession, then
    chr:pos:ref:alt, then preferred HGVS; a level is rejected when the
    dictionary maps the key to more than MAX_TARGET_GENES=3 genes
    (cmat/output_generation/clinvar_to_evidence_strings.py:266-318,23)
  * J8 — BioMart gene annotation: try HGNC id, then symbol, then transcript;
    annotated rows leave the queue (pandas outer-merge + `_merge` indicator,
    cmat/consequence_prediction/repeat_expansion_variants/pipeline.py:95-162)
  * A6 — most-severe-consequence: per group, min by a broadcast severity
    rank with lexicographic tie-break (cmat/trait_mapping... vep.py:51-107)

Spark shape: a loop of broadcast inner joins where each round's probe side
is the previous round's left_anti remainder — the probe shrinks every round
and no round shuffles the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def priority_cascade_join(
    facts: DataFrame,
    dims: list[tuple[str, DataFrame, str]],
    payload_cols: list[str],
) -> DataFrame:
    """facts joined against a prioritized list of (fact_key_col, dim, dim_key_col).

    Each fact row is annotated by the FIRST dimension that matches its key
    (earlier entries win; unmatched rows fall through with NULL payload and a
    NULL matched_by). Returns facts + payload_cols + matched_by.
    """
    remaining = facts
    results = []
    for fact_key, dim, dim_key in dims:
        d = F.broadcast(
            dim.select(F.col(dim_key).alias("__k"), *[F.col(c) for c in payload_cols]).dropDuplicates(["__k"])
        )
        hit = (
            remaining.join(d, remaining[fact_key] == F.col("__k"), "inner")
            .drop("__k")
            .withColumn("matched_by", F.lit(fact_key))
        )
        results.append(hit)
        remaining = remaining.join(
            F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()), fact_key, "left_anti"
        )
    fallthrough = remaining
    for c in payload_cols:
        fallthrough = fallthrough.withColumn(c, F.lit(None).cast("string"))
    fallthrough = fallthrough.withColumn("matched_by", F.lit(None).cast("string"))
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.unionByName(fallthrough)


def guarded_lookup(dim: DataFrame, key_col: str, max_values: int) -> DataFrame:
    """MAX_TARGET_GENES-style guard (clinvar_to_evidence_strings.py:23,300-311):
    drop dictionary keys that map to more than `max_values` distinct payload
    rows — ambiguous keys must not annotate."""
    counts = dim.groupBy(key_col).agg(F.count("*").alias("__n"))
    return dim.join(
        F.broadcast(counts.filter(F.col("__n") <= max_values).select(key_col)), key_col, "inner"
    )


def most_severe(
    facts: DataFrame,
    group_cols: list[str],
    rank_dim: DataFrame,
    value_col: str,
    rank_col: str = "rank",
) -> DataFrame:
    """A6 — per group keep the row whose value has the lowest severity rank
    (broadcast rank dimension; lexicographic tie-break on the value for
    determinism, vep.py:53-59)."""
    ranked = facts.join(F.broadcast(rank_dim), value_col, "inner")
    w = Window.partitionBy(*group_cols).orderBy(F.col(rank_col).asc(), F.col(value_col).asc())
    return (
        ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
