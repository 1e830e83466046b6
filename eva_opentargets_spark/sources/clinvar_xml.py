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


# --- full record scan (S1 record grain, for evidence generation) ----------

RECORD_SCHEMA = (
    "accession string, vcv_id string, created_date string, "
    "review_status string, significance_raw string, n_classifications int, "
    "mode_of_inheritance array<string>, pubmed_refs array<string>, "
    "allele_origins array<string>, variant_type string, rs_id string, "
    "nsv_id string, chr string, vcf_pos string, vcf_ref string, "
    "vcf_alt string, preferred_current_hgvs string, "
    "cohort_phenotypes array<string>"
)


def _hgvs_ref_seq(text: str) -> str | None:
    """Sequence id before the ':' minus the parenthetical (the
    reference_sequence group of hgvs_variant.py:29-37)."""
    import re

    m = re.match(r"^([a-zA-Z][a-zA-Z0-9_.]+)(?:\([a-zA-Z0-9_.]+\))?:", text)
    return m.group(1) if m else None


def _measure_fields(measure) -> dict:
    """Measure-grain attributes (clinvar_measure.py): rs/nsv xrefs, GRCh38
    VCF coordinates (skipped for Translocations or ambiguous locations,
    :215-228), and preferred_current_hgvs with the reference's preference
    order (:134-153): top-level RefSeq, else current∩genomic with the
    location accession preferred, else lexicographically-first current."""
    out: dict = {}
    out["variant_type"] = measure.attrib.get("Type")
    rs = [e.attrib["ID"] for e in measure.findall('./XRef[@DB="dbSNP"]')]
    out["rs_id"] = "rs" + rs[0] if len(rs) == 1 else None
    nsv = [
        e.attrib["ID"]
        for e in measure.findall('./XRef[@DB="dbVar"]')
        if e.attrib.get("ID", "").startswith("nsv")
    ]
    out["nsv_id"] = nsv[0] if len(nsv) == 1 else None
    locs = measure.findall('./SequenceLocation[@Assembly="GRCh38"]')
    loc = locs[0] if len(locs) == 1 and out["variant_type"] != "Translocation" else None
    for col, attr in (
        ("chr", "Chr"), ("vcf_pos", "positionVCF"),
        ("vcf_ref", "referenceAlleleVCF"), ("vcf_alt", "alternateAlleleVCF"),
    ):
        out[col] = loc.attrib.get(attr) if loc is not None else None
    hgvs_types = {}
    for attr_set in measure.findall("./AttributeSet"):
        for a in attr_set.findall("./Attribute"):
            t = a.attrib.get("Type", "")
            if t.startswith("HGVS") and a.text:
                hgvs_types[a.text] = {p.lower().strip() for p in t.split(",")}
    toplevel = [h for h, ts in hgvs_types.items() if ts == {"hgvs", "genomic", "top level"}]
    current = {h for h, ts in hgvs_types.items() if "previous" not in ts}
    genomic = {h for h, ts in hgvs_types.items() if "genomic" in ts}
    if toplevel:
        out["preferred_current_hgvs"] = toplevel[0]
    elif current:
        current_genomic = sorted(current & genomic)
        if current_genomic:
            loc_acc = loc.attrib.get("Accession") if loc is not None else None
            out["preferred_current_hgvs"] = next(
                (h for h in current_genomic if _hgvs_ref_seq(h) == loc_acc),
                current_genomic[0],
            )
        else:
            out["preferred_current_hgvs"] = sorted(current)[0]
    else:
        out["preferred_current_hgvs"] = None
    return out


def _iter_records(path: str):
    """One dict per RCV record, carrying every attribute evidence generation
    needs (clinvar_record.py / clinvar_reference_record.py semantics;
    supports both XSD v2 <Classifications> children and v1
    <ClinicalSignificance>)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        for _, elem in ET.iterparse(fh):
            if elem.tag != "ClinVarSet":
                continue
            rcv = elem.find("ReferenceClinVarAssertion")
            if rcv is None:
                elem.clear()
                continue
            acc_el = rcv.find("ClinVarAccession")
            row: dict = {
                "accession": acc_el.attrib.get("Acc") if acc_el is not None else None,
                "created_date": acc_el.attrib.get("DateCreated") if acc_el is not None else None,
            }
            ms = rcv.find('./MeasureSet[@Type="Variant"]')
            any_ms = rcv.find("./MeasureSet")
            row["vcv_id"] = any_ms.attrib.get("Acc") if any_ms is not None else None
            classifications = rcv.findall("./Classifications/*")
            if not classifications:  # XSD v1 fallback
                classifications = rcv.findall("./ClinicalSignificance")
            row["n_classifications"] = len(classifications)
            first = classifications[0] if classifications else None
            row["review_status"] = (
                first.findtext("./ReviewStatus") if first is not None else None
            )
            row["significance_raw"] = (
                first.findtext("./Description") if first is not None else None
            )
            row["mode_of_inheritance"] = sorted(
                {
                    a.text
                    for a in rcv.findall('./AttributeSet/Attribute[@Type="ModeOfInheritance"]')
                    if a.text
                }
            )
            # int-parse like the reference (clinvar_record.py:102-106), back
            # to str for the literature list (:229)
            row["pubmed_refs"] = [
                str(int(e.text))
                for e in rcv.findall('./ObservedIn/ObservedData/Citation/ID[@Source="PubMed"]')
                if e.text and e.text.strip().isdigit()
            ]
            row["allele_origins"] = sorted(
                {o.text for o in rcv.findall("./ObservedIn/Sample/Origin") if o.text}
            )
            measures = ms.findall("./Measure") if ms is not None else []
            measure = measures[0] if len(measures) == 1 else None
            if measure is not None:
                row.update(_measure_fields(measure))
            else:
                row.update(
                    {
                        k: None
                        for k in (
                            "variant_type", "rs_id", "nsv_id", "chr", "vcf_pos",
                            "vcf_ref", "vcf_alt", "preferred_current_hgvs",
                        )
                    }
                )
            # cohortPhenotypes: all valid names of traits that have a valid
            # name (clinvar_to_evidence_strings.py:246-247)
            names: set[str] = set()
            trait_set = rcv.find("TraitSet")
            for trait in trait_set.findall("Trait") if trait_set is not None else []:
                all_names = [n.text for n in trait.findall("./Name/ElementValue") if n.text]
                preferred = next(
                    (n.text for n in trait.findall('./Name/ElementValue[@Type="Preferred"]')),
                    None,
                )
                if _preferred_or_other_valid_name(preferred, all_names) is not None:
                    names.update(
                        n for n in all_names if n.lower() not in NONSPECIFIC_TRAITS
                    )
            row["cohort_phenotypes"] = sorted(names)
            yield row
            elem.clear()


def parse_clinvar_records(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per RCV record across the given XML files — the record-grain
    S1 scan feeding OT evidence generation (one task per shard, bounded
    memory via iterparse)."""
    cols = [f.split(" ")[0] for f in RECORD_SCHEMA.split(", ")]
    paths_df = spark.createDataFrame([(p,) for p in paths], "path string")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                rows = list(_iter_records(path))
                yield pd.DataFrame(rows, columns=cols)

    return paths_df.mapInPandas(parse, RECORD_SCHEMA)


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
