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
    """All lowercase dictionary labels."""
    return sorted({label.lower() for _, _, _, label, _, _, _ in ONTOLOGY_TERMS})


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
