"""ClinVar XML ingest adapter: the reference's native input format, mapped
into the engine's transcript shape so a user of the reference can run their
existing data through this engine unchanged.

Reference analogs:
  * S1 — streaming iterparse over gzipped ClinVar XML, clearing elements as
    it goes (cmat/clinvar_xml_io/xml_parsing.py:40-49, clinvar_dataset.py:22-28)
  * P1 — preferred_or_other_valid_name: the Preferred name if valid, else the
    lexicographically-first valid name (clinvar_trait.py:36-60)
  * P2 — NONSPECIFIC_TRAITS stop-list (clinvar_trait.py:15-18)
  * P7 — traits_with_valid_names (clinvar_record.py:96-99)

Scale shape: one task per XML file via mapInPandas over a path list — at
real scale (thousands of dump shards) this parallelizes per shard; within a
shard, iterparse keeps memory bounded exactly like the reference.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

# clinvar_trait.py:15-18
NONSPECIFIC_TRAITS = {
    "", "allhighlypenetrant", "disease", "none provided", "not provided",
    "not specified", "reclassified - variant of unknown significance",
    "see cases", "variant of unknown significance",
}

TRAIT_SCHEMA = (
    "rcv string, trait_id string, trait_name string, preferred_name string, "
    "all_names array<string>, date_updated string"
)


def _preferred_or_other_valid_name(preferred: str | None, all_names: list[str]) -> str | None:
    """clinvar_trait.py:53-60."""
    if preferred and preferred.lower() not in NONSPECIFIC_TRAITS:
        return preferred
    valid = [n for n in sorted(all_names) if n.lower() not in NONSPECIFIC_TRAITS]
    return valid[0] if valid else None


def _iter_traits(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        for _, elem in ET.iterparse(fh):
            if elem.tag != "ClinVarSet":
                continue
            rcv = elem.find("ReferenceClinVarAssertion")
            if rcv is not None:
                acc_el = rcv.find("ClinVarAccession")
                acc = acc_el.attrib.get("Acc") if acc_el is not None else None
                updated = acc_el.attrib.get("DateUpdated") if acc_el is not None else None
                trait_set = rcv.find("TraitSet")
                if acc and trait_set is not None:
                    for trait in trait_set.findall("Trait"):
                        names = [n.text for n in trait.findall("./Name/ElementValue") if n.text]
                        preferred = next(
                            (n.text for n in trait.findall('./Name/ElementValue[@Type="Preferred"]')),
                            None,
                        )
                        name = _preferred_or_other_valid_name(preferred, names)
                        if name is not None:  # P7: only traits with valid names
                            yield (
                                acc,
                                trait.attrib.get("ID", "").strip(),
                                name,
                                preferred,
                                sorted(names),
                                updated,
                            )
            elem.clear()  # bounded memory, xml_parsing.py:47-49


def parse_clinvar_traits(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per (RCV record, trait) across the given XML files."""
    paths_df = spark.createDataFrame([(p,) for p in paths], "path string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                rows = list(_iter_traits(path))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "rcv", "trait_id", "trait_name", "preferred_name",
                        "all_names", "date_updated",
                    ],
                )

    return paths_df.mapInPandas(parse, TRAIT_SCHEMA)


def clinvar_to_transcripts(traits: DataFrame) -> DataFrame:
    """Map parsed traits into the engine's transcript shape: the RCV record
    is the conversation, each trait a turn, the trait name the text — the
    ClinVar analog of the transcript data model (SURVEY.md §1.3)."""
    from pyspark.sql import Window

    w = Window.partitionBy("rcv").orderBy("trait_id", "trait_name")
    return traits.select(
        F.col("rcv").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("trait").alias("role"),
        F.col("trait_name").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp("date_updated", "yyyy-MM-dd").alias("ts"),
    )
