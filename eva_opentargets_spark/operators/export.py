"""Curation-export pipeline (SURVEY.md §3.3): merge manually-curated
mappings with automated ones and the previous mapping database.

Reference analogs (replicated output-for-output; tests prove byte-level
row parity with tests/pipelines/resources/expected/
trait_names_to_ontology_mappings.tsv):
  * exportTable — spreadsheet CSV -> DONE rows (3 cols) + curator comments
    (bin/trait_mapping/export_curation_table.py:8-21)
  * combineManualAndAutomated — `sort -u` union (export_curation_spreadsheet.nf:97-112)
  * mergeWithLatestMappings — previous rows whose name is absent from the
    new set are appended (`join` + `comm -23`, nf:119-140)
  * checkDuplicates — no full-row duplicates (nf:174-189)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_raw_mappings(spark: SparkSession, path: str) -> DataFrame:
    """Headerless 3-column mapping TSV, case PRESERVED (unlike the linking
    loader, which lowercases keys)."""
    return (
        spark.read.text(path)
        .filter(~F.col("value").startswith("#"))
        .filter(F.col("value") != "")
        .select(F.split("value", "\t").alias("f"))
        .select(
            F.col("f")[0].alias("mention_norm"),
            F.col("f")[1].alias("iri"),
            F.col("f")[2].alias("label"),
        )
    )


def export_curation_spreadsheet(spark: SparkSession, csv_path: str) -> tuple[DataFrame, DataFrame]:
    """Spreadsheet CSV (one leading banner row, then a header row) ->
    (done_mappings, curator_comments). Curation spreadsheets are
    driver-sized by construction (human-curated), so pandas parses and Spark
    owns the relational steps."""
    import pandas as pd

    table = pd.read_csv(csv_path, skiprows=1, header=0)
    done = table[table["Status"] == "DONE"][
        ["ClinVar label", "URI of selected mapping", "Label of selected mapping"]
    ]
    done_df = spark.createDataFrame(
        done.rename(
            columns={
                "ClinVar label": "mention_norm",
                "URI of selected mapping": "iri",
                "Label of selected mapping": "label",
            }
        )
    )
    comments = table[table["Comment"].notna() & table["Status"].notna()][["ClinVar label", "Comment"]]
    comments = comments.astype(str)
    comments["Comment"] = comments["Comment"].str.replace('"', "")
    comments_df = spark.createDataFrame(
        comments.rename(columns={"ClinVar label": "mention_norm", "Comment": "comment"})
    )
    return done_df, comments_df


def export_merged_mappings(
    automated: DataFrame, manual_done: DataFrame, previous: DataFrame
) -> DataFrame:
    """The full export merge: (automated ∪ manual, distinct) + previous rows
    for names absent from that union. Exactly nf:97-140."""
    new = automated.unionByName(manual_done).distinct()
    kept_previous = previous.join(new.select("mention_norm").distinct(), "mention_norm", "left_anti")
    return new.unionByName(kept_previous)
