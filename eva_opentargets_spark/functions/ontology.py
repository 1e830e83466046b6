"""Ontology identifier functions (F1-F3 in SURVEY.md §2.7), as pure Spark
column expressions — no UDFs, so they stay inside whole-stage codegen.

Reference: cmat/clinvar_xml_io/ontology_uri.py:11-26 (db->IRI templates),
:35-67 (uri_to_curie), cmat/trait_mapping/ols.py:124-133 (CURIE repair).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# db (lowercased) -> IRI prefix; MONDO/HP swap ':' for '_' in the local id.
_TEMPLATES = {
    "orphanet": "http://www.orpha.net/ORDO/Orphanet_{id}",
    "omim": "https://www.omim.org/entry/{id}",
    "efo": "http://www.ebi.ac.uk/efo/{id}",
    "mesh": "http://identifiers.org/mesh/{id}",
    "medgen": "http://identifiers.org/medgen/{id}",
    "mondo": "http://purl.obolibrary.org/obo/{id}",
    "hp": "http://purl.obolibrary.org/obo/{id}",
}

_CURIE_DB = {
    "ordo": "Orphanet",
    "orphanet": "Orphanet",
    "omim": "OMIM",
    "efo": "EFO",
    "hp": "HP",
    "mondo": "MONDO",
    "go": "GO",
}


def iri_for(db: Column, id_: Column) -> Column:
    """F1 — OntologyUri(db, id) -> IRI (ontology_uri.py:11-26). 'Human
    Phenotype Ontology' is canonicalized to HP (:25)."""
    db_norm = F.when(F.lower(db) == "human phenotype ontology", "hp").otherwise(F.lower(db))
    id_underscore = F.regexp_replace(id_, ":", "_")
    expr = F.lit(None).cast("string")
    for name, template in _TEMPLATES.items():
        prefix, suffix = template.split("{id}")
        local = id_underscore if name in ("mondo", "hp") else id_
        expr = F.when(db_norm == name, F.concat(F.lit(prefix), local, F.lit(suffix))).otherwise(expr)
    return expr


def curie_from_iri(iri: Column) -> Column:
    """F2 — IRI -> 'DB:ID' (ontology_uri.py:35-67): handles identifiers.org,
    omim.org, trailing 'DB_ID' and already-CURIE last components."""
    trimmed = F.regexp_replace(iri, "/+$", "")
    last = F.element_at(F.split(trimmed, "/"), -1)
    second_last = F.element_at(F.split(trimmed, "/"), -2)

    def canon(db: Column) -> Column:
        out = F.lit(None).cast("string")
        for k, v in _CURIE_DB.items():
            out = F.when(F.lower(db) == k, F.lit(v)).otherwise(out)
        return out

    underscore_db = canon(F.split(last, "_")[0])
    ident_db = canon(second_last)
    return (
        # unmapped dbs (medgen, mesh, ...) -> NULL, like the reference's
        # early `return None` (ontology_uri.py:47-48,63-65)
        F.when(
            trimmed.contains("identifiers.org"),
            F.when(ident_db.isNotNull(), F.concat_ws(":", ident_db, last)),
        )
        .when(trimmed.contains("omim.org"), F.concat(F.lit("OMIM:"), last))
        .when(last.contains(":"), last)
        .when(last.contains("_") & underscore_db.isNotNull(),
              F.concat_ws(":", underscore_db, F.split(last, "_")[1]))
        .otherwise(F.lit(None).cast("string"))
    )


def repair_curie_to_iri(curie: Column) -> Column:
    """F3 — 'MONDO:0020783' / 'HP_0045074' -> full IRI (ols.py:124-133:
    split on ':' or '_', rebuild via the db template).

    Deliberate deviation: the reference passes only the numeric part into the
    template, yielding e.g. obo/0020783 (prefix lost); we rebuild the proper
    DB_ID local id for prefix-carrying ontologies (EFO/MONDO/HP) so the
    repaired IRI is resolvable.
    """
    parts = F.split(curie, "[:_]")
    db = parts[0]
    local = F.when(
        F.lower(db).isin("efo", "mondo", "hp"),
        F.concat(F.upper(db), F.lit("_"), parts[1]),
    ).otherwise(parts[1])
    return iri_for(db, local)
