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


# --- S8: annotated-XML write-back -----------------------------------------
#
# The reference re-serializes every RCV with injected annotation elements
# (annotated_clinvar.py:214-258 + clinvar_dataset.py:40-60). The engine's
# Spark shape: one task per XML shard (mapInPandas over a path list), each
# yielding the fully serialized `<ClinVarSet>` string per record — a
# distributed sink column; the tiny serialization/injection procedure below
# IS the output format (byte parity with the reference's golden file
# requires the identical minidom pretty-print + line-join steps), cited
# per-function.

PROCESSOR = "CMAT"  # the provider stamp the format defines (annotated_clinvar.py:13)
MAX_TARGET_GENES = 3  # clinvar_to_evidence_strings.py:23

ANNOTATED_XML_SCHEMA = (
    "path string, record_idx int, accession string, clinvar_set_xml binary"
)


def load_trait_mappings_py(path: str) -> tuple[dict, str]:
    """Driver-side twin of load_ontology_mapping
    (clinvar_to_evidence_strings.py:326-349): '#ontology=' header names the
    target ontology (default EFO), keys lowercased, per-name list in file
    order."""
    import re

    mappings: dict[str, list[tuple[str, str]]] = {}
    ontology = "EFO"
    in_header = True
    with open(path) as fh:
        for line in fh:
            line = line.rstrip()
            if in_header:
                m = re.match(r"^#ontology=(.*?)$", line)
                if m and m.group(1):
                    ontology = m.group(1).upper()
            if line.startswith("#") or not line:
                continue
            in_header = False
            fields = line.split("\t")
            if len(fields) != 3:
                # the reference asserts the same 3-column contract
                # (clinvar_to_evidence_strings.py:344)
                raise ValueError(
                    f"trait mapping line must have 3 tab-separated fields, "
                    f"got {len(fields)}: {line!r}"
                )
            name, uri, label = fields
            mappings.setdefault(name.lower(), []).append((uri, label))
    return mappings, ontology


def load_gene_mappings_py(path: str) -> dict:
    """Driver-side twin of process_consequence_type_file
    (consequence_type.py:17-51): variant_id -> [(gene, so_term,
    transcript|None)] in file order, <4-column lines and 'NA' genes
    skipped."""
    out: dict[str, list[tuple[str, str, str | None]]] = {}
    with open(path) as fh:
        for line in fh:
            cols = line.rstrip().split("\t")
            if len(cols) < 4 or cols[1] == "NA":
                continue
            out.setdefault(cols[0], []).append(
                (cols[1], cols[3], cols[4] if len(cols) >= 5 else None)
            )
    return out


def _consequences_for(measure, accession: str, gene_map: dict):
    """get_consequence_types (clinvar_to_evidence_strings.py:266-318):
    RCV accession first (repeat-expansion pipeline IDs), then the
    chr:pos:ref:alt coordinate id, then preferred_current_hgvs with the
    MAX_TARGET_GENES guard."""
    if accession in gene_map:
        return gene_map[accession]
    mf = _measure_fields(measure)
    if all(mf.get(k) for k in ("chr", "vcf_pos", "vcf_ref", "vcf_alt")):
        coord = f"{mf['chr']}:{mf['vcf_pos']}:{mf['vcf_ref']}:{mf['vcf_alt']}"
        if coord in gene_map:
            return gene_map[coord]
    hgvs = mf.get("preferred_current_hgvs")
    if hgvs and hgvs in gene_map:
        conseqs = gene_map[hgvs]
        if len(conseqs) > MAX_TARGET_GENES:
            return []
        return conseqs
    return []


def _format_ontology_id(ontology_id: str) -> str:
    """annotated_clinvar.py:233-237."""
    if ontology_id.startswith("http"):
        return ontology_id.split("/")[-1].replace("_", ":")
    return ontology_id


def _annotate_rcv(rcv, trait_map, gene_map, so_map, target_ontology) -> None:
    """Inject the reference's annotation elements in place
    (annotated_clinvar.py:84-95,214-258): per-consequence AttributeSet
    blocks on the unique variant measure, per-valid-trait XRef elements
    with Status='annotated'."""
    acc_el = rcv.find("ClinVarAccession")
    accession = acc_el.attrib.get("Acc") if acc_el is not None else None
    measures = rcv.findall('./MeasureSet[@Type="Variant"]/Measure')
    measure = measures[0] if len(measures) == 1 else None
    if measure is not None:
        for gene_id, so_name, transcript in _consequences_for(measure, accession, gene_map):
            attr_set = ET.Element("AttributeSet", attrib={"providedBy": PROCESSOR})
            attr = ET.Element("Attribute", attrib={"Type": "MolecularConsequence"})
            attr.text = so_name.replace("_", " ")
            elts = [
                attr,
                ET.Element("XRef", attrib={
                    "ID": so_map[so_name].replace("_", ":"), "DB": "Sequence Ontology",
                }),
                ET.Element("XRef", attrib={"ID": gene_id, "DB": "Ensembl Gene"}),
            ]
            if transcript:
                elts.append(
                    ET.Element("XRef", attrib={"ID": transcript, "DB": "Ensembl Transcript"})
                )
            attr_set.extend(elts)
            measure.append(attr_set)
    trait_set = rcv.find("TraitSet")
    for trait in trait_set.findall("Trait") if trait_set is not None else []:
        names = [n.text for n in trait.findall("./Name/ElementValue") if n.text]
        preferred = next(
            (n.text for n in trait.findall('./Name/ElementValue[@Type="Preferred"]')), None
        )
        name = _preferred_or_other_valid_name(preferred, names)
        if name is None:
            continue
        for ontology_id, _label in trait_map.get(name.lower(), []):
            trait.append(
                ET.Element("XRef", attrib={
                    "ID": _format_ontology_id(ontology_id), "DB": target_ontology,
                    "Status": "annotated", "providedBy": PROCESSOR,
                })
            )


def _serialize_clinvar_set(rcv) -> bytes:
    """The reference's record serialization procedure, byte for byte
    (clinvar_record.py:50-57 + clinvar_dataset.py:54-56): minidom
    pretty-print of the RCV, XML declaration stripped, blank lines dropped,
    two-space re-join, wrapped in a bare <ClinVarSet> pair. This procedure
    IS the output format — the golden comparison requires it exactly."""
    import re
    from xml.dom import minidom

    xml_str = minidom.parseString(ET.tostring(rcv)).toprettyxml(indent="  ", encoding="utf-8")
    if xml_str.startswith(b"<?xml"):
        xml_str = re.sub(rb"<\?xml.*?>", b"", xml_str)
    xml_str = b"  ".join([s for s in xml_str.strip().splitlines(True) if s.strip()])
    xml_str += b"\n"
    return b"<ClinVarSet>\n  " + xml_str + b"</ClinVarSet>\n"


def release_set_header(path: str, last_processed: str) -> bytes:
    """ReleaseSet open tag with original attributes + LastProcessed +
    ProcessedBy (xml_parsing.py:9-28 + clinvar_dataset.py:18-19,40-45 +
    annotated_clinvar.py:23)."""
    opener = gzip.open if path.endswith(".gz") else open
    attrib = {}
    with opener(path, "rb") as fh:
        for _event, elem in ET.iterparse(fh, events=["start"]):
            if elem.tag == "ReleaseSet":
                for attr, val in elem.attrib.items():
                    if attr == "{http://www.w3.org/2001/XMLSchema-instance}noNamespaceSchemaLocation":
                        attrib["xmlns:xsi"] = "http://www.w3.org/2001/XMLSchema-instance"
                        attrib["xsi:noNamespaceSchemaLocation"] = val
                    else:
                        attrib[attr] = val
                break
    attrib["LastProcessed"] = last_processed
    attrib["ProcessedBy"] = PROCESSOR
    header = b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n<ReleaseSet'
    for attr, val in attrib.items():
        # escape only when needed: clean values stay byte-identical to the
        # reference's unescaped writer (clinvar_dataset.py:40-45); dirty
        # values become valid XML instead of a malformed header
        val = val.replace("&", "&amp;").replace('"', "&quot;").replace("<", "&lt;")
        header += f' {attr}="{val}"'.encode()
    return header + b">\n"


def annotate_clinvar_xml(
    spark: SparkSession,
    paths: list[str],
    trait_mapping_tsv: str,
    gene_mapping_tsv: str,
    so_accessions: dict[str, str] | None = None,
) -> DataFrame:
    """S8 as a Spark sink column: one row per RCV with the fully annotated,
    fully serialized `<ClinVarSet>` bytes — the distributed form of the
    reference's annotated-XML write-back (one task per shard; dimension
    dicts ride the task closure; record_idx preserves in-shard order so a
    driver-side concat reproduces the reference's single-file output
    exactly)."""
    if so_accessions is None:
        from .. import fixtures

        so_accessions = dict(fixtures.SO_ACCESSIONS)
    trait_map, target_ontology = load_trait_mappings_py(trait_mapping_tsv)
    gene_map = load_gene_mappings_py(gene_mapping_tsv)
    # fail fast on the driver: an SO term missing from the dimension would
    # otherwise KeyError inside the executors mid-job
    missing_so = {
        so for cons in gene_map.values() for _g, so, _t in cons if so not in so_accessions
    }
    if missing_so:
        raise ValueError(
            f"gene mapping uses SO terms absent from so_accessions: {sorted(missing_so)}"
        )
    paths_df = spark.createDataFrame([(p,) for p in paths], "path string")

    def annotate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                rows = []
                opener = gzip.open if path.endswith(".gz") else open
                with opener(path, "rb") as fh:
                    for _event, elem in ET.iterparse(fh):
                        if elem.tag != "ClinVarSet":
                            continue
                        rcv = elem.find("ReferenceClinVarAssertion")
                        if rcv is not None:
                            _annotate_rcv(rcv, trait_map, gene_map, so_accessions, target_ontology)
                            acc_el = rcv.find("ClinVarAccession")
                            rows.append(
                                (
                                    path,
                                    len(rows),
                                    acc_el.attrib.get("Acc") if acc_el is not None else None,
                                    _serialize_clinvar_set(rcv),
                                )
                            )
                        elem.clear()
                yield pd.DataFrame(
                    rows, columns=["path", "record_idx", "accession", "clinvar_set_xml"]
                )

    return paths_df.mapInPandas(annotate, ANNOTATED_XML_SCHEMA)
