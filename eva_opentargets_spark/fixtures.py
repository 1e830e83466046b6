"""Deterministic demo fixtures shared by the Spark queries AND the DuckDB
oracle SQL (__spark_entry__.oracle_sql builds VALUES clauses from these same
constants, so the two sides cannot drift).

The demo ontology dictionary is defined over the vocabulary of the driver's
synthetic `documents` table (31 lowercase words), playing the role of the
reference's 13,211-row mappings/latest_mappings.tsv + OLS term payloads
(tests/trait_mapping/resources/test_ols_data.py). It deliberately exercises
every linking tier:

  * plain unambiguous exact matches (unigram + bigram labels)        -> J1
  * an AMBIGUOUS label ("merge" -> 2 IRIs) rejected at the exact tier
    per the uniqueness rule (cmat/trait_mapping/ols.py:158-160) and
    recovered at the fuzzy tier via the exact-label acceptance rule
    (cmat/trait_mapping/trait.py:64-65)                              -> J2
  * a Levenshtein-distance fuzzy match ("query" ~ "querys")          -> J2
  * an obsolete term with replaced_by ("slow" -> EFO:0009)           -> J10
  * an out-of-target term canonicalized through a distance==1 xref
    ("vector": MONDO:0010 -> EFO:0011, cmat/trait_mapping/trait.py:76) -> J3
  * an out-of-target term whose only xref has distance 2 ("dup")
    -> rejected, routed to curation                                  -> J3/W-routing
  * stop-listed mentions ("the", "a", "data", "value"), the analog of
    NONSPECIFIC_TRAITS (cmat/clinvar_xml_io/clinvar_trait.py:15-18)  -> P2
"""

from __future__ import annotations

# (term_id, iri, ontology, label, in_target_ontology, is_obsolete, replaced_by)
ONTOLOGY_TERMS: list[tuple[str, str, str, str, bool, bool, str | None]] = [
    ("EFO:0001", "http://www.ebi.ac.uk/efo/EFO_0001", "EFO", "spark", True, False, None),
    ("EFO:0002", "http://www.ebi.ac.uk/efo/EFO_0002", "EFO", "hash join", True, False, None),
    ("EFO:0003", "http://www.ebi.ac.uk/efo/EFO_0003", "EFO", "sort merge", True, False, None),
    ("EFO:0004", "http://www.ebi.ac.uk/efo/EFO_0004", "EFO", "table scan", True, False, None),
    ("EFO:0005", "http://www.ebi.ac.uk/efo/EFO_0005", "EFO", "window", True, False, None),
    # ambiguous pair: exact tier must reject, fuzzy tier accepts BOTH
    ("EFO:0006", "http://www.ebi.ac.uk/efo/EFO_0006", "EFO", "merge", True, False, None),
    ("EFO:0007", "http://www.ebi.ac.uk/efo/EFO_0007", "EFO", "merge", True, False, None),
    # obsolete with replacement
    ("EFO:0008", "http://www.ebi.ac.uk/efo/EFO_0008", "EFO", "slow", True, True, "EFO:0009"),
    ("EFO:0009", "http://www.ebi.ac.uk/efo/EFO_0009", "EFO", "fast scan", True, False, None),
    # out-of-target, canonicalizable via distance-1 xref
    ("MONDO:0010", "http://purl.obolibrary.org/obo/MONDO_0010", "MONDO", "vector", False, False, None),
    ("EFO:0011", "http://www.ebi.ac.uk/efo/EFO_0011", "EFO", "vector disorder", True, False, None),
    # out-of-target, xref only at distance 2 -> must NOT link
    ("MONDO:0012", "http://purl.obolibrary.org/obo/MONDO_0012", "MONDO", "dup", False, False, None),
    ("EFO:0013", "http://www.ebi.ac.uk/efo/EFO_0013", "EFO", "duplication syndrome", True, False, None),
    ("EFO:0014", "http://www.ebi.ac.uk/efo/EFO_0014", "EFO", "stream filter", True, False, None),
    # fuzzy-only: label is Levenshtein-1 from vocab word "query"
    ("EFO:0015", "http://www.ebi.ac.uk/efo/EFO_0015", "EFO", "querys", True, False, None),
    ("EFO:0016", "http://www.ebi.ac.uk/efo/EFO_0016", "EFO", "customer group", True, False, None),
    # normalized-tier only: label folds to "batch" (punctuation stripped);
    # mention "batch" has no exact label match but resolves here
    ("EFO:0018", "http://www.ebi.ac.uk/efo/EFO_0018", "EFO", "batch!", True, False, None),
]

# Term synonyms (round 2): the reference matches against synonym sets from
# OLS payloads (eval side: cmat/output_generation/annotated_clinvar.py:161-170;
# OLS terms carry 'synonyms'). The exact/normalized/fuzzy tiers match
# against labels UNION synonyms with the SAME uniqueness rule:
#   * "filter" / "join" — unambiguous synonym-exact matches        -> J1
#   * "sort" — synonym of TWO terms: rejected at the exact tier
#     (uniqueness rule), recovered at the fuzzy tier as a double
#     link, like the ambiguous-label "merge" case                  -> J2
TERM_SYNONYMS: list[tuple[str, str]] = [
    ("EFO:0002", "join"),
    ("EFO:0003", "sort"),
    ("EFO:0004", "sort"),
    ("EFO:0014", "filter"),
]

SYNONYM_COLUMNS = ["term_id", "synonym"]


def synonyms_sql() -> str:
    return values_clause(TERM_SYNONYMS, SYNONYM_COLUMNS)


# (parent_id, child_id) is_a hierarchy edges — the descendants-search
# operator's input (reference bin/trait_mapping/get_children_with_keywords
# .py:26-60, OLS hierarchicalDescendants). Shapes exercised: a 3-level
# chain under the EFO:0001 root, a DIAMOND (EFO:0005 reachable at depth 2
# via two parents -> min-depth semantics), a depth-4 node beyond the
# default bound, and a disjoint subtree that must never appear.
ONTOLOGY_IS_A: list[tuple[str, str]] = [
    ("EFO:0001", "EFO:0002"),  # spark -> hash join         (depth 1)
    ("EFO:0001", "EFO:0003"),  # spark -> sort merge        (depth 1)
    ("EFO:0002", "EFO:0004"),  # hash join -> table scan    (depth 2)
    ("EFO:0003", "EFO:0005"),  # sort merge -> window       (depth 2)
    ("EFO:0002", "EFO:0005"),  # diamond: window also via hash join (depth 2)
    ("EFO:0004", "EFO:0006"),  # table scan -> merge        (depth 3)
    ("EFO:0005", "EFO:0007"),  # window -> merge            (depth 3)
    ("EFO:0006", "EFO:0009"),  # merge -> fast scan         (depth 4: out of bound)
    ("EFO:0013", "EFO:0014"),  # disjoint subtree (not under the root)
]

IS_A_COLUMNS = ["parent_id", "child_id"]


def is_a_sql() -> str:
    return values_clause(ONTOLOGY_IS_A, IS_A_COLUMNS)


# (src_curie, dst_curie, distance, source)
ONTOLOGY_XREFS: list[tuple[str, str, int, str]] = [
    ("MONDO:0010", "EFO:0011", 1, "mondo"),
    ("MONDO:0012", "EFO:0013", 2, "mondo"),
    # noise edges: must be ignored (wrong direction / too far / dst not in target)
    ("EFO:0011", "MONDO:0010", 1, "mondo"),
    ("MONDO:0010", "MONDO:0012", 3, "mondo"),
]

# Curated mention->term mapping table (latest_mappings.tsv shape, FIXTURES.md
# §4): the direct-lookup dictionary of evidence generation
# (clinvar_to_evidence_strings.py:326-349). "merge" maps to TWO terms (the
# multi-mapping product case, FIXTURES.md example).
CURATED_MAPPINGS: list[tuple[str, str, str]] = [
    ("window", "http://www.ebi.ac.uk/efo/EFO_0005", "window"),
    ("batch", "http://purl.obolibrary.org/obo/MONDO_0099", "batch syndrome"),
    ("merge", "http://www.ebi.ac.uk/efo/EFO_0006", "merge variant a"),
    ("merge", "http://purl.obolibrary.org/obo/MONDO_0098", "merge variant b"),
    ("dup", "http://www.ebi.ac.uk/efo/EFO_0013", "duplication syndrome"),
]

# --- Record-model fixtures (round 2: evidence product, S5/J4, stars) -----

# Review-status -> star rating, the reference's score_map verbatim
# (cmat/clinvar_xml_io/clinical_classification.py:17-29). A record's review
# status is picked deterministically by doc_id % len (records.py).
REVIEW_STATUS_STARS: list[tuple[str, int]] = [
    ("no assertion criteria provided", 0),
    ("criteria provided, single submitter", 1),
    ("criteria provided, conflicting classifications", 1),
    ("criteria provided, multiple submitters, no conflicts", 2),
    ("reviewed by expert panel", 3),
    ("practice guideline", 4),
    ("no classification provided", 0),
]

# Raw clinical-significance strings exercising the P6 normalization
# (clinical_classification.py:73-78: split on '/', ', ', '; '; lowercase;
# '_'->' '; dedup; sort) and the INVALID filter (:32-33 + valid_clinical_
# significances). Index = doc_id % len.
SIGNIFICANCE_RAW: list[str] = [
    "Pathogenic",
    "Benign/Likely benign",
    "Uncertain significance",
    "Pathogenic, risk_factor; Pathogenic",
    "Likely benign",
    # INVALID -> valid list empty -> fatal_no_clinical_significance
    "no classifications from unflagged records",
]

INVALID_SIGNIFICANCES = frozenset({"no classifications from unflagged records"})

# Consequence dictionary (S5: cmat/output_generation/consequence_type.py:17-51
# TSV shape: variant_id, ensembl_gene_id, gene_symbol, so_term). Keys are
# probed at the three J4 priority levels (clinvar_to_evidence_strings.py:
# 266-318): rcv-accession analogs ('r<n>', the repeat-expansion route),
# coordinate analogs ('v<n>'), and HGVS analogs ('h<n>', subject to the
# MAX_TARGET_GENES=3 guard — 'h11' maps to 4 genes and must be rejected).
CONSEQUENCES: list[tuple[str, str, str, str]] = [
    ("r3", "ENSG0003", "GENE3", "SO:0001590"),
    ("r7", "ENSG0007", "GENE7", "SO:0002165"),
    ("v1", "ENSG0101", "CGENE1", "SO:0001583"),
    ("v4", "ENSG0104", "CGENE4", "SO:0001627"),
    ("v9", "ENSG0109", "CGENE9", "SO:0001619"),
    ("v15", "ENSG0115", "CGENE15", "SO:0001583"),
    ("v22", "ENSG0122", "CGENE22", "SO:0001574"),
    ("v22", "ENSG0123", "CGENE22B", "SO:0001583"),
    ("h2", "ENSG0202", "HGENE2", "SO:0001583"),
    ("h5", "ENSG0205", "HGENE5", "SO:0001587"),
    ("h5", "ENSG0206", "HGENE5B", "SO:0001583"),
    ("h11", "ENSG0211", "HGENE11A", "SO:0001583"),
    ("h11", "ENSG0212", "HGENE11B", "SO:0001583"),
    ("h11", "ENSG0213", "HGENE11C", "SO:0001583"),
    ("h11", "ENSG0214", "HGENE11D", "SO:0001583"),
]

CONSEQUENCE_COLUMNS = ["variant_id", "ensembl_gene_id", "gene_symbol", "so_term"]

# SO term name -> accession. The reference fetches this dictionary from OLS
# over REST at import time (consequence_type.py:55-72 get_so_accession_dict);
# the engine replaces the REST source with a broadcast dimension (the S10
# pattern). Accessions are the public Sequence Ontology ids.
SO_ACCESSIONS: list[tuple[str, str]] = [
    ("missense_variant", "SO_0001583"),
    ("synonymous_variant", "SO_0001819"),
    ("intron_variant", "SO_0001627"),
    ("frameshift_variant", "SO_0001589"),
    ("splice_donor_variant", "SO_0001575"),
    ("splice_region_variant", "SO_0001630"),
    ("stop_gained", "SO_0001587"),
    ("trinucleotide_repeat_expansion", "SO_0002165"),
    ("short_tandem_repeat_expansion", "SO_0002162"),
]

# Measure variant types, indexed by doc_id % len — the XML Type attribute
# (cmat/clinvar_xml_io/clinvar_measure.py:156-157). 'Microsatellite' rows
# feed the P8 microsatellite classifier (clinvar_measure.py:165-183); the
# synthetic vcf ref/alt lengths (records.py) put insertion lengths on BOTH
# sides of REPEAT_EXPANSION_THRESHOLD=12 and below 0.
VARIANT_TYPES: list[str] = [
    "single nucleotide variant",
    "Microsatellite",
    "Deletion",
    "Microsatellite",
    "copy number gain",
    "Microsatellite",
]

# Allele-origin patterns, indexed by doc_id % len — chosen to exercise every
# branch of convert_allele_origins (clinvar_to_evidence_strings.py:369-380):
# somatic-only, mixed (two groups), multi-germline, empty (one empty group).
ORIGIN_PATTERNS: list[list[str]] = [
    ["somatic"],
    ["germline", "somatic"],
    ["inherited", "germline"],
    ["maternal"],
    ["germline"],
    ["de novo", "somatic"],
    [],
]


def convert_allele_origins_py(origins: list[str]) -> list[tuple[str, bool]]:
    """Python twin of the reference's convert_allele_origins
    (clinvar_to_evidence_strings.py:369-380), used to precompute the oracle's
    origin-group dimension and to cross-check the Spark array-logic twin
    (operators/records.py) in tests. Returns [(group_csv, is_somatic)]."""
    rest = sorted({o.lower() for o in origins} - {"somatic"})
    groups: list[tuple[str, bool]] = []
    if "somatic" in {o.lower() for o in origins}:
        groups.append(("somatic", True))
    if rest:
        groups.append((",".join(rest), False))
    return groups if groups else [("", False)]


def normalize_significance_py(raw: str) -> list[str]:
    """Python twin of P6 (clinical_classification.py:73-78), used to
    precompute the oracle's per-residue significance constants."""
    import re

    return sorted(set(re.split("/|, |; ", raw.lower().replace("_", " "))))


def valid_significances_py(raw: str) -> list[str]:
    return [s for s in normalize_significance_py(raw) if s not in INVALID_SIGNIFICANCES]


def consequences_sql() -> str:
    return values_clause(CONSEQUENCES, CONSEQUENCE_COLUMNS)


def review_status_sql() -> str:
    return values_clause(REVIEW_STATUS_STARS, ["review_status", "stars"])


# Gold-standard mention->term sets for the evaluation harness (A5
# SetComparisonMetrics, set_metrics.py:27-86), designed so the engine's
# actual links at any SF produce every reachable outcome category:
# exact_match, cmat_superset ("sort" links 2, gold 1), cmat_subset
# ("window"/"query" gold has an extra term), divergent_match ("merge"),
# mismatch ("batch"), cmat_missing ("dup" never links), cv_missing (engine
# links like "filter"/"slow" absent from gold), plus a J9 synonym-bridged
# exact match ("table scan" via EFO:0104 -> EFO:0004).
EVAL_GOLD: list[tuple[str, str]] = [
    ("spark", "EFO:0001"),
    ("hash join", "EFO:0002"),
    ("merge", "EFO:0006"),
    ("merge", "EFO:0096"),
    ("sort", "EFO:0003"),
    ("window", "EFO:0005"),
    ("window", "EFO:0099"),
    ("query", "EFO:0015"),
    ("query", "EFO:0097"),
    ("table scan", "EFO:0104"),
    ("batch", "EFO:0098"),
    ("dup", "EFO:0013"),
]

# J9 — synonym bridge (annotated_clinvar.py:161-170): EFO:0104 is a synonym
# id canonicalized to EFO:0004 before set comparison.
EVAL_BRIDGE: list[tuple[str, str]] = [
    ("EFO:0104", "EFO:0004"),
]


def eval_gold_sql() -> str:
    return values_clause(EVAL_GOLD, ["key", "term_id"])


def eval_bridge_sql() -> str:
    return values_clause(EVAL_BRIDGE, ["term_id", "canonical_id"])


# F5/F6 — HGVS parse + repeat-classification cases with pinned expected
# outputs (reference docstring examples, hgvs_variant.py:135 +
# repeat_variant.py:25-31, plus structural-suffix and del-guard cases).
# The oracle for hgvs_parse is this golden table verbatim: DuckDB's RE2
# cannot express the (?=...) lookahead the pivot regex family needs, so the
# expectations are pinned rather than recomputed (the key rows are
# independently asserted in tests/test_hgvs.py against reference semantics).
# Columns: hgvs, reference_sequence, sequence_type, variant_type, start,
# stop, repeat_sequence, repeat_type, transcript_id
HGVS_CASES: list[tuple] = [
    ("NM_001256054.2(C9orf72):c.-45+63_-45+80GGGGCC(2_25)", "NM_001256054.2", "coding", None, 63, 80, "GGGGCC", "trinucleotide_repeat_expansion", "NM_001256054.2"),
    ("NC_000001.10:g.100A>G", "NC_000001.10", "genomic", "substitution", 100, 100, "A", "short_tandem_repeat_expansion", None),
    ("NM_1:c.100_200del", "NM_1", "coding", "deletion", 100, 200, None, None, "NM_1"),
    ("NM_1:c.100_200dup", "NM_1", "coding", "duplication", 100, 200, None, "short_tandem_repeat_expansion", "NM_1"),
    ("NM_1:c.100_200ins", "NM_1", "coding", "insertion", 100, 200, None, "short_tandem_repeat_expansion", "NM_1"),
    ("NM_1:c.100_200delins", "NM_1", "coding", None, 100, 200, None, "short_tandem_repeat_expansion", "NM_1"),
    ("NC_000004.11:g.3076606GCA[27_35]", "NC_000004.11", "genomic", None, 3076606, 3076606, "GCA", "trinucleotide_repeat_expansion", None),
    ("NP_002964.3:p.Gln166(>=33)", "NP_002964.3", "protein", None, None, None, None, "trinucleotide_repeat_expansion", None),
    ("ATXN8, (CAG)n REPEAT EXPANSION", None, None, None, None, None, None, "trinucleotide_repeat_expansion", None),
    ("TNRC6A, 5-BP INS, TTTCA(n) REPEAT EXPANSION", None, None, None, None, None, None, "short_tandem_repeat_expansion", None),
    ("NM_000044.4(AR):c.172_174CAG(7_34) (p.Gln66_Gln80del)", "NM_000044.4", "coding", None, 172, 174, "CAG", None, "NM_000044.4"),
    ("NM_000044.4(AR):c.172_174CAG(7_34)", "NM_000044.4", "coding", None, 172, 174, "CAG", "trinucleotide_repeat_expansion", "NM_000044.4"),
    ("NC_000012.11:g.112036755_112036823CTG(9_24)", "NC_000012.11", "genomic", None, 112036755, 112036823, "CTG", "trinucleotide_repeat_expansion", None),
    ("not an hgvs at all", None, None, None, None, None, None, None, None),
]

HGVS_COLUMNS = [
    "hgvs",
    "reference_sequence",
    "sequence_type",
    "variant_type",
    "start",
    "stop",
    "repeat_sequence",
    "repeat_type",
    "transcript_id",
]


def hgvs_cases_sql() -> str:
    return values_clause(HGVS_CASES, HGVS_COLUMNS)


# Event-type severity ranking (most-severe-consequence analog, A6:
# cmat/consequence_prediction/common/vep.py:51-65).
EVENT_SEVERITY: list[tuple[str, int]] = [
    ("error", 1),
    ("purchase", 2),
    ("signup", 3),
    ("click", 4),
    ("view", 5),
]


def curated_mappings_sql() -> str:
    return values_clause(CURATED_MAPPINGS, MAPPING_COLUMNS)


def event_severity_sql() -> str:
    return values_clause(EVENT_SEVERITY, ["event_type", "rank"])


# Previous curated mapping DB for the J7 anti-join merge demo
# (pipelines/export_curation_spreadsheet.nf:119-140): "spark" also exists in
# the new mappings (new wins), "batch" exists only here (kept).
PREVIOUS_MAPPINGS: list[tuple[str, str, str]] = [
    ("spark", "http://www.ebi.ac.uk/efo/EFO_9001", "legacy spark term"),
    ("batch", "http://www.ebi.ac.uk/efo/EFO_9002", "legacy batch term"),
    # curation-sheet decoration coverage ("dup" is the corpus's unresolved
    # mention): one previously-used mapping to the OBSOLETE EFO:0008
    # (exercises the replacement chain -> EFO:0009) and one to a term
    # missing from the dictionary (exercises the NOT_CONTAINED status)
    ("dup", "http://www.ebi.ac.uk/efo/EFO_0008", "slow"),
    ("dup", "http://www.ebi.ac.uk/efo/EFO_9003", "vanished term"),
]


def _sql_quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_clause(rows, columns) -> str:
    """Render rows as an ANSI VALUES derived table usable in both DuckDB and Spark SQL."""
    body = ",\n    ".join("(" + ", ".join(_sql_quote(v) for v in row) + ")" for row in rows)
    return "(VALUES\n    " + body + "\n) AS t(" + ", ".join(columns) + ")"


TERM_COLUMNS = ["term_id", "iri", "ontology", "label", "in_target_ontology", "is_obsolete", "replaced_by"]
XREF_COLUMNS = ["src_curie", "dst_curie", "distance", "source"]
MAPPING_COLUMNS = ["mention_norm", "iri", "label"]


def terms_sql() -> str:
    return values_clause(ONTOLOGY_TERMS, TERM_COLUMNS)


def xrefs_sql() -> str:
    return values_clause(ONTOLOGY_XREFS, XREF_COLUMNS)


def previous_mappings_sql() -> str:
    return values_clause(PREVIOUS_MAPPINGS, MAPPING_COLUMNS)


def stoplist_sql() -> str:
    from .config import STOPLIST

    return "(" + ", ".join(_sql_quote(s) for s in sorted(STOPLIST)) + ")"


def gazetteer_labels() -> list[str]:
    """All lowercase dictionary labels + synonyms (the full match surface)."""
    return sorted(
        {label.lower() for _, _, _, label, _, _, _ in ONTOLOGY_TERMS}
        | {syn.lower() for _, syn in TERM_SYNONYMS}
    )


# Candidate-mention words that are NOT dictionary labels. In the reference,
# candidate trait names come from the data itself, independent of the mapping
# dictionary (cmat/trait_mapping/trait_names_parsing.py:8-53): "query" only
# resolves via the Levenshtein fuzzy tier ("querys"); "batch" resolves only
# at the normalized tier ("batch!" folds to "batch").
EXTRA_MENTION_WORDS: list[str] = ["query", "batch"]


def mention_vocabulary() -> list[str]:
    """Everything the gazetteer extractor treats as a candidate mention:
    dictionary labels + known data-side candidate words + the stop-list
    (stop-listed mentions are extracted, counted, then dropped — mirroring
    parse-then-filter in cmat/trait_mapping/main.py:100-107)."""
    from .config import STOPLIST

    return sorted(set(gazetteer_labels()) | set(EXTRA_MENTION_WORDS) | set(STOPLIST))
