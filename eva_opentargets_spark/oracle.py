"""DuckDB oracle SQL for every driver-checked query.

Each SQL string is the ANSI/DuckDB twin of a Spark query in
__spark_entry__.py, built from the SAME fixture constants
(eva_opentargets_spark.fixtures) so the two sides cannot drift. The CTE
chain mirrors the pipeline stage-for-stage; comments cite the reference
semantics each stage reproduces.
"""

from __future__ import annotations

from . import fixtures
from .config import EXCLUDED_TOOLS, STOPLIST
from .sources.transcripts import derive_transcripts_duckdb_sql


def _in_list(values) -> str:
    return "(" + ", ".join("'" + v.replace("'", "''") + "'" for v in sorted(values)) + ")"


def kg_prefix(sf_dir: str = "") -> str:
    """WITH-clause prefix shared by all KG queries (DuckDB dialect).

    Stages: derive transcripts -> turn gauntlet -> tokenize -> gazetteer
    match (unigram+bigram) -> stoplist -> distinct-mention pre-agg ->
    exact (uniqueness rule, ols.py:156-160) -> fuzzy (levenshtein tiers,
    acceptance trait.py:61-67) -> xref (gate main.py:59-63, distance==1
    trait.py:76) -> replacement (ols.py:111-134) -> triples.
    """
    vocab = fixtures.mention_vocabulary()
    unigrams = [w for w in vocab if " " not in w]
    bigrams = [w for w in vocab if " " in w]
    excluded = _in_list(EXCLUDED_TOOLS)
    stop = _in_list(STOPLIST)
    return f"""
WITH transcripts AS ({derive_transcripts_duckdb_sql(sf_dir)}),
valid_turns AS (
  SELECT * FROM transcripts
  WHERE text IS NOT NULL AND text <> ''
    AND (tool IS NULL OR tool NOT IN {excluded})
),
toks AS (
  SELECT conv_id, turn_idx,
         unnest(string_split(lower(text), ' ')) AS tok,
         CAST(unnest(range(len(string_split(lower(text), ' ')))) AS INT) AS pos
  FROM valid_turns
),
grams AS (
  SELECT conv_id, turn_idx, pos, tok AS g1,
         tok || ' ' || lead(tok) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS g2
  FROM toks
),
mentions_all AS (
  SELECT conv_id, turn_idx, pos, g1 AS mention_norm FROM grams WHERE g1 IN {_in_list(unigrams)}
  UNION ALL
  SELECT conv_id, turn_idx, pos, g2 AS mention_norm FROM grams WHERE g2 IN {_in_list(bigrams)}
),
mentions AS (
  SELECT * FROM mentions_all WHERE mention_norm NOT IN {stop}
),
dm AS (
  SELECT mention_norm,
         count(DISTINCT (conv_id, turn_idx)) AS freq,
         count(*) AS occurrences,
         count(DISTINCT conv_id) AS n_conversations
  FROM mentions GROUP BY mention_norm
),
terms AS (SELECT * FROM {fixtures.terms_sql()}),
cur_terms AS (SELECT * FROM terms WHERE in_target_ontology AND NOT is_obsolete),
syns AS (SELECT * FROM {fixtures.synonyms_sql()}),
surface AS (
  -- labels UNION synonyms, carrying the term's metadata (linking.py
  -- label_surface twin)
  SELECT term_id, label, in_target_ontology, is_obsolete, replaced_by FROM terms
  UNION ALL
  SELECT s.term_id, s.synonym AS label, t.in_target_ontology, t.is_obsolete, t.replaced_by
  FROM syns s JOIN terms t USING (term_id)
),
cur_surface AS (SELECT * FROM surface WHERE in_target_ontology AND NOT is_obsolete),
exact_agg AS (
  SELECT m.mention_norm, count(DISTINCT t.term_id) AS n_terms, min(t.term_id) AS term_id
  FROM dm m JOIN cur_surface t ON lower(t.label) = m.mention_norm
  GROUP BY m.mention_norm
),
exact_links AS (
  SELECT mention_norm, term_id, 'exact' AS match_type, 'HIGH' AS confidence, 'mapped_to' AS pred
  FROM exact_agg WHERE n_terms = 1
),
un0 AS (SELECT m.* FROM dm m ANTI JOIN exact_links e USING (mention_norm)),
norm_links AS (
  SELECT mention_norm, term_id, 'normalized' AS match_type, 'HIGH' AS confidence,
         'mapped_to' AS pred
  FROM (
    SELECT m.mention_norm, count(DISTINCT t.term_id) AS n_terms, min(t.term_id) AS term_id
    FROM un0 m JOIN cur_surface t
      ON trim(regexp_replace(regexp_replace(lower(t.label), '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))
       = trim(regexp_replace(regexp_replace(m.mention_norm, '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))
    GROUP BY m.mention_norm
  ) WHERE n_terms = 1
),
un1 AS (SELECT m.* FROM un0 m ANTI JOIN norm_links n USING (mention_norm)),
cands AS (
  SELECT u.mention_norm, t.term_id, lower(t.label) AS label_norm,
         t.in_target_ontology AS in_ontology,
         (t.in_target_ontology AND NOT t.is_obsolete) AS is_current,
         t.is_obsolete, t.replaced_by,
         levenshtein(u.mention_norm, lower(t.label)) AS lev,
         CASE WHEN levenshtein(u.mention_norm, lower(t.label)) <= 1 THEN 'HIGH'
              WHEN levenshtein(u.mention_norm, lower(t.label)) = 2 THEN 'GOOD'
              ELSE 'MEDIUM' END AS confidence
  FROM un1 u JOIN surface t
    ON levenshtein(u.mention_norm, lower(t.label))
       <= least(3, greatest(0, length(u.mention_norm) - 4))
),
fuzzy_links AS (
  -- one link per (mention, term): best (lowest-lev) surface variant sets
  -- the confidence (linking.link_fuzzy twin)
  SELECT mention_norm, term_id, 'fuzzy' AS match_type,
         CASE WHEN min(lev) <= 1 THEN 'HIGH' WHEN min(lev) = 2 THEN 'GOOD'
              ELSE 'MEDIUM' END AS confidence,
         'mapped_to' AS pred
  FROM cands
  WHERE in_ontology AND is_current AND (confidence = 'HIGH' OR label_norm = mention_norm)
  GROUP BY mention_norm, term_id
),
un2 AS (SELECT u.* FROM un1 u ANTI JOIN fuzzy_links f USING (mention_norm)),
gate AS (
  SELECT mention_norm FROM cands GROUP BY mention_norm
  HAVING max(CASE WHEN is_current THEN 1 ELSE 0 END) = 0
),
xref_edges AS (SELECT * FROM {fixtures.xrefs_sql()}),
seeds AS (
  SELECT DISTINCT c.mention_norm, c.term_id AS seed_id
  FROM cands c JOIN un2 USING (mention_norm) JOIN gate USING (mention_norm)
  WHERE c.confidence = 'HIGH'
),
xref_links AS (
  SELECT DISTINCT s.mention_norm, x.dst_curie AS term_id,
         'xref' AS match_type, 'HIGH' AS confidence, 'is_a' AS pred
  FROM seeds s
  JOIN xref_edges x ON x.src_curie = s.seed_id AND x.distance = 1
  JOIN cur_terms d ON d.term_id = x.dst_curie
),
un3 AS (SELECT u.* FROM un2 u ANTI JOIN xref_links x USING (mention_norm)),
repl_links AS (
  SELECT DISTINCT c.mention_norm, r.term_id,
         'replacement' AS match_type, 'HIGH' AS confidence, 'is_a' AS pred
  FROM cands c JOIN un3 USING (mention_norm)
  JOIN cur_terms r ON r.term_id = c.replaced_by
  WHERE c.lev = 0 AND c.is_obsolete AND c.replaced_by IS NOT NULL
),
un4 AS (SELECT u.* FROM un3 u ANTI JOIN repl_links r USING (mention_norm)),
links AS (
  SELECT * FROM exact_links UNION ALL SELECT * FROM norm_links
  UNION ALL SELECT * FROM fuzzy_links
  UNION ALL SELECT * FROM xref_links UNION ALL SELECT * FROM repl_links
),
triples AS (
  SELECT DISTINCT
         m.conv_id || ':' || CAST(m.turn_idx AS VARCHAR) || ':' || m.mention_norm AS subj,
         l.pred, l.term_id AS obj,
         m.conv_id, m.turn_idx, m.mention_norm AS mention_text, l.match_type, l.confidence
  FROM mentions m JOIN links l USING (mention_norm)
)
"""


def kg_queries() -> dict[str, str]:
    p = kg_prefix()
    prev = fixtures.previous_mappings_sql()
    return {
        "kg_transcripts": p
        + """
SELECT conv_id, turn_idx, role, text, tool, CAST(epoch(ts) AS BIGINT) AS ts_epoch
FROM transcripts""",
        "kg_valid_turns": p + "SELECT conv_id, turn_idx, role, text FROM valid_turns",
        "kg_mentions": p + "SELECT conv_id, turn_idx, pos, mention_norm FROM mentions",
        "kg_distinct_mentions": p
        + "SELECT mention_norm, freq, occurrences, n_conversations FROM dm",
        "kg_exact_links": p
        + "SELECT mention_norm, term_id, match_type, confidence, pred FROM exact_links",
        "kg_fuzzy_candidates": p
        + """
SELECT mention_norm, term_id, label_norm, in_ontology, is_current, lev, confidence
FROM cands""",
        "kg_links": p
        + "SELECT mention_norm, term_id, match_type, confidence, pred FROM links",
        "kg_unmapped": p + "SELECT mention_norm, freq, occurrences, n_conversations FROM un4",
        "kg_triples": p
        + """
SELECT subj, pred, obj, conv_id, turn_idx, mention_text, match_type, confidence
FROM triples""",
        "kg_mapping_merge": p
        + f"""
, new_mappings AS (
  SELECT DISTINCT l.mention_norm, t.iri, t.label
  FROM links l JOIN terms t ON t.term_id = l.term_id
),
previous AS (SELECT * FROM {prev})
SELECT mention_norm, iri, label FROM new_mappings
UNION
SELECT p.mention_norm, p.iri, p.label
FROM previous p ANTI JOIN new_mappings n USING (mention_norm)""",
        "kg_best_candidate": p
        + """
SELECT mention_norm, term_id, confidence, rank FROM (
  SELECT mention_norm, term_id, confidence,
         row_number() OVER (
           PARTITION BY mention_norm
           ORDER BY CASE confidence WHEN 'HIGH' THEN 4 WHEN 'GOOD' THEN 3
                                    WHEN 'MEDIUM' THEN 2 ELSE 1 END DESC,
                    in_ontology DESC, is_current DESC, term_id ASC,
                    lev ASC, label_norm ASC
         ) AS rank
  FROM cands
) WHERE rank = 1""",
        "kg_metrics": p
        + f"""
SELECT counter, value FROM (
  SELECT 'turns_total' AS counter, count(*)::BIGINT AS value FROM transcripts
  UNION ALL SELECT 'turns_excluded', count(*)::BIGINT FROM transcripts
    WHERE NOT (text IS NOT NULL AND text <> ''
               AND (tool IS NULL OR tool NOT IN {_in_list(EXCLUDED_TOOLS)}))
  UNION ALL SELECT 'mentions_total', count(*)::BIGINT FROM mentions_all
  UNION ALL SELECT 'mentions_stoplisted', count(*)::BIGINT FROM mentions_all
    WHERE mention_norm IN {_in_list(STOPLIST)}
  UNION ALL SELECT 'mentions_valid', count(*)::BIGINT FROM mentions
  UNION ALL SELECT 'mentions_distinct', count(*)::BIGINT FROM dm
  UNION ALL SELECT 'unmapped', count(*)::BIGINT FROM un4
  UNION ALL SELECT 'triples_emitted', count(*)::BIGINT FROM triples
  UNION ALL SELECT 'linked_exact', count(DISTINCT mention_norm)::BIGINT FROM exact_links
  UNION ALL SELECT 'linked_normalized', count(DISTINCT mention_norm)::BIGINT FROM norm_links
  UNION ALL SELECT 'linked_fuzzy', count(DISTINCT mention_norm)::BIGINT FROM fuzzy_links
  UNION ALL SELECT 'linked_xref', count(DISTINCT mention_norm)::BIGINT FROM xref_links
  UNION ALL SELECT 'linked_replacement', count(DISTINCT mention_norm)::BIGINT FROM repl_links
)""",
        # W2-W4 + F11/F12 + round-4 decoration — the curation sheet: surface
        # variants deduped per (mention, term) keeping the (lev, label)
        # minimum, then the W1 total order, top-50 cap, '|'-packed cells
        # joined best-first, PLUS the reference's sheet decoration
        # (create_table_for_manual_curation.py:13-41,49-57,96-107): one row
        # per previously-used mapping, exact-mapping cell, replacement cell
        # (<=1 extra obsolete hop), 'NT expansion' notes from the record
        # model's repeat-expansion turns. Uses record_prefix (not kg_prefix)
        # because the notes column needs the per-turn record attributes.
        "kg_curation": record_prefix()
        + f"""
, cand_un AS (
  SELECT c.* FROM cands c JOIN un4 USING (mention_norm)
),
cands_dd AS (
  SELECT * FROM (
    SELECT c.*, row_number() OVER (
      PARTITION BY mention_norm, term_id ORDER BY lev ASC, label_norm ASC
    ) AS sv
    FROM cand_un c
  ) WHERE sv = 1
),
ranked AS (
  SELECT mention_norm, label_norm,
         term_id || '|' || label_norm || '|' || confidence || '|' ||
         CASE WHEN in_ontology AND is_current THEN 'EFO_CURRENT'
              WHEN in_ontology AND NOT is_current THEN 'EFO_OBSOLETE'
              ELSE 'NOT_CONTAINED' END AS cell,
         row_number() OVER (
           PARTITION BY mention_norm
           ORDER BY CASE confidence WHEN 'HIGH' THEN 4 WHEN 'GOOD' THEN 3
                                    WHEN 'MEDIUM' THEN 2 ELSE 1 END DESC,
                    in_ontology DESC, is_current DESC, term_id ASC,
                    lev ASC, label_norm ASC
         ) AS rank
  FROM cands_dd
),
packed AS (
  SELECT mention_norm, array_to_string(list(cell ORDER BY rank), ';') AS candidates_packed
  FROM ranked WHERE rank <= 50 GROUP BY mention_norm
),
exact_m AS (
  SELECT mention_norm, arg_min(cell, rank) AS exact_mapping
  FROM ranked WHERE rank <= 50 AND label_norm = mention_norm
  GROUP BY mention_norm
),
nt_m AS (
  SELECT DISTINCT t.mention_norm
  FROM tm t JOIN recs r USING (conv_id, turn_idx)
  WHERE r.valid AND r.has_measure AND r.is_repeat_expansion
),
prevm AS (
  SELECT mention_norm,
         replace(list_extract(string_split(iri, '/'), -1), '_', ':') AS prev_term,
         lower(label) AS prev_label
  FROM {prev}
),
tstat AS (
  SELECT term_id, lower(label) AS t_label, in_target_ontology, is_obsolete,
         replaced_by
  FROM terms
),
pj AS (
  SELECT pm.mention_norm, pm.prev_term, pm.prev_label,
         p.term_id AS p_id, p.in_target_ontology AS p_in,
         p.is_obsolete AS p_obs, p.replaced_by AS p_rep,
         r1.term_id AS r1_id, r1.t_label AS r1_label,
         r1.in_target_ontology AS r1_in, r1.is_obsolete AS r1_obs,
         r1.replaced_by AS r1_rep,
         r2.term_id AS r2_id, r2.t_label AS r2_label,
         r2.in_target_ontology AS r2_in, r2.is_obsolete AS r2_obs
  FROM prevm pm
  LEFT JOIN tstat p ON p.term_id = pm.prev_term
  LEFT JOIN tstat r1 ON r1.term_id = p.replaced_by
  LEFT JOIN tstat r2 ON r2.term_id = r1.replaced_by
),
prev_cells AS (
  SELECT mention_norm,
    prev_term || '|' || prev_label || '|NOT_SPECIFIED|previously-used|' ||
      CASE WHEN p_id IS NULL THEN 'NOT_CONTAINED'
           WHEN p_in AND NOT p_obs THEN 'EFO_CURRENT'
           WHEN p_in THEN 'EFO_OBSOLETE' ELSE 'NOT_CONTAINED' END
      AS previous_mapping,
    CASE WHEN p_rep IS NULL THEN ''
         WHEN NOT (CASE WHEN r1_id IS NULL THEN FALSE
                        WHEN r1_in AND r1_obs THEN TRUE ELSE FALSE END)
           THEN p_rep || '|' || coalesce(r1_label, '')
                || '|NOT_SPECIFIED|replacement|'
                || CASE WHEN r1_id IS NULL THEN 'NOT_CONTAINED'
                        WHEN r1_in AND NOT r1_obs THEN 'EFO_CURRENT'
                        WHEN r1_in THEN 'EFO_OBSOLETE'
                        ELSE 'NOT_CONTAINED' END
         WHEN r1_rep IS NULL THEN ''
         ELSE r1_rep || '|' || coalesce(r2_label, '')
              || '|NOT_SPECIFIED|replacement|'
              || CASE WHEN r2_id IS NULL THEN 'NOT_CONTAINED'
                      WHEN r2_in AND NOT r2_obs THEN 'EFO_CURRENT'
                      WHEN r2_in THEN 'EFO_OBSOLETE'
                      ELSE 'NOT_CONTAINED' END
    END AS replacement_mapping
  FROM pj
)
SELECT u.mention_norm, u.freq,
       CASE WHEN n.mention_norm IS NOT NULL THEN 'NT expansion' ELSE '' END AS notes,
       coalesce(pc.previous_mapping, '') AS previous_mapping,
       coalesce(e.exact_mapping, '') AS exact_mapping,
       coalesce(pc.replacement_mapping, '') AS replacement_mapping,
       coalesce(p.candidates_packed, '') AS candidates_packed
FROM un4 u
LEFT JOIN packed p USING (mention_norm)
LEFT JOIN exact_m e USING (mention_norm)
LEFT JOIN nt_m n USING (mention_norm)
LEFT JOIN prev_cells pc USING (mention_norm)""",
        "kg_annotated": p
        + """
, per_turn AS (
  SELECT conv_id, turn_idx,
         array_to_string(
           list_sort(list(DISTINCT mention_text || '|' || obj || '|' || pred || '|' || match_type)),
           ';') AS packed
  FROM triples GROUP BY conv_id, turn_idx
)
SELECT t.conv_id, t.turn_idx, t.text,
       coalesce(a.packed, '') AS annotations_packed
FROM transcripts t LEFT JOIN per_turn a USING (conv_id, turn_idx)""",
        # curated direct-lookup join (clinvar_to_evidence_strings.py:326-349);
        # the CURIE conversion twin only needs the obo/efo IRI family used in
        # the fixture (last path component, '_' -> ':').
        "kg_curated_triples": p
        + f"""
, curated AS (
  SELECT mention_norm,
         replace(list_extract(string_split(iri, '/'), -1), '_', ':') AS obj
  FROM {fixtures.curated_mappings_sql()}
)
SELECT DISTINCT
       m.conv_id || ':' || CAST(m.turn_idx AS VARCHAR) || ':' || m.mention_norm AS subj,
       'mapped_to' AS pred, c.obj,
       m.conv_id, m.turn_idx, m.mention_norm AS mention_text,
       'curated' AS match_type, 'HIGH' AS confidence
FROM mentions m JOIN curated c USING (mention_norm)""",
        "kg_grouped_by_term": p
        + f"""
, curated AS (
  SELECT mention_norm,
         replace(list_extract(string_split(iri, '/'), -1), '_', ':') AS term_id
  FROM {fixtures.curated_mappings_sql()}
)
SELECT m.conv_id, m.turn_idx, c.term_id,
       min(m.mention_norm) AS representative_mention,
       array_to_string(list_sort(list(DISTINCT m.mention_norm)), ',') AS grouped,
       count(*)::BIGINT AS n_occurrences
FROM mentions m LEFT JOIN curated c USING (mention_norm)
GROUP BY m.conv_id, m.turn_idx, c.term_id""",
    }


def record_prefix(sf_dir: str = "") -> str:
    """kg_prefix + the record-model CTE chain (operators/records.py twins):
    per-turn record attributes, per-turn mention aggregates, disease groups
    (A2), consequence match counts (J4 flags), origin groups (precomputed
    via the convert_allele_origins Python twin)."""
    from .operators.records import doc_id_sql, origin_groups_values_sql, record_attrs_sql

    excluded = _in_list(EXCLUDED_TOOLS)
    n_residues = len(fixtures.ORIGIN_PATTERNS)
    return (
        kg_prefix(sf_dir)
        + f"""
, recs0 AS (
  SELECT conv_id, turn_idx,
         (text IS NOT NULL AND text <> ''
          AND (tool IS NULL OR tool NOT IN {excluded})) AS valid,
         {doc_id_sql()} AS doc_id
  FROM transcripts
),
recs AS (
  SELECT conv_id, turn_idx, valid, doc_id, {record_attrs_sql('doc_id')}
  FROM recs0
),
tm AS (SELECT DISTINCT conv_id, turn_idx, mention_norm FROM mentions),
ptm AS (
  SELECT conv_id, turn_idx, count(*) AS n_names,
         array_to_string(list_sort(list(mention_norm)), ',') AS cohort_phenotypes
  FROM tm GROUP BY 1, 2
),
curated AS (
  SELECT mention_norm, list_extract(string_split(iri, '/'), -1) AS term, iri
  FROM {fixtures.curated_mappings_sql()}
),
mapped AS (
  SELECT DISTINCT t.conv_id, t.turn_idx, t.mention_norm, c.term
  FROM tm t JOIN curated c USING (mention_norm)
),
tpt AS (
  SELECT conv_id, turn_idx, count(DISTINCT term) AS n_mapped_terms
  FROM mapped GROUP BY 1, 2
),
dgroups AS (
  SELECT conv_id, turn_idx, min(mention_norm) AS disease_from_source,
         term AS disease_mapped_id
  FROM mapped GROUP BY conv_id, turn_idx, term
  UNION ALL
  SELECT t.conv_id, t.turn_idx, t.mention_norm, NULL
  FROM tm t ANTI JOIN curated c USING (mention_norm)
),
cons AS (SELECT * FROM {fixtures.consequences_sql()}),
cons_counts AS (SELECT variant_id, count(*) AS n FROM cons GROUP BY 1),
og AS (SELECT * FROM {origin_groups_values_sql()}),
ogc AS (SELECT origin_residue, count(*) AS n FROM og GROUP BY 1),
recs2 AS (
  SELECT r.*, coalesce(p.n_names, 0) AS n_names,
         coalesce(p.cohort_phenotypes, '') AS cohort_phenotypes,
         coalesce(tp.n_mapped_terms, 0) AS n_mapped_terms,
         rr.n AS rn, cc.n AS cn, hh.n AS hn,
         o.n AS n_origin_groups
  FROM recs r
  LEFT JOIN ptm p USING (conv_id, turn_idx)
  LEFT JOIN tpt tp USING (conv_id, turn_idx)
  LEFT JOIN cons_counts rr ON r.rcv_key = rr.variant_id
  LEFT JOIN cons_counts cc ON r.coord_key = cc.variant_id
  LEFT JOIN (SELECT * FROM cons_counts WHERE n <= 3) hh ON r.hgvs_key = hh.variant_id
  JOIN ogc o ON (r.doc_id % {n_residues}) = o.origin_residue
)
"""
    )


_GAUNTLET_REASON = """
CASE WHEN NOT valid THEN 'fatal_excluded_submission'
     WHEN n_classifications > 1 THEN 'skip_multiple_clinical_classifications'
     WHEN n_names = 0 THEN 'fatal_no_valid_traits'
     WHEN NOT has_valid_significance THEN 'fatal_no_clinical_significance'
     WHEN NOT has_measure THEN 'skip_unsupported_variation'
     WHEN coalesce(rn, cn, hn) IS NULL THEN 'skip_no_functional_consequences'
     WHEN n_mapped_terms = 0 THEN 'skip_missing_efo_mapping'
     WHEN n_origin_groups * n_mapped_terms * coalesce(rn, cn, hn) = 1
          THEN 'done_one_complete_evidence_string'
     ELSE 'done_multiple_complete_evidence_strings' END
"""


def _cascade_union(src: str) -> str:
    """The 3-level priority cascade as SQL (J4 twin of
    consequences.consequence_cascade): REPEAT on rcv, SIMPLE on coord for
    rcv-misses, COMPLEX on (guarded) hgvs for the remainder."""
    return f"""
  SELECT s.*, 'REPEAT' AS matched_by, k.ensembl_gene_id, k.gene_symbol, k.so_term
  FROM {src} s JOIN cons k ON s.rcv_key = k.variant_id
  UNION ALL
  SELECT s.*, 'SIMPLE', k.ensembl_gene_id, k.gene_symbol, k.so_term
  FROM {src} s JOIN cons k ON s.coord_key = k.variant_id WHERE s.rn IS NULL
  UNION ALL
  SELECT s.*, 'COMPLEX', k.ensembl_gene_id, k.gene_symbol, k.so_term
  FROM {src} s JOIN cons k ON s.hgvs_key = k.variant_id
  WHERE s.rn IS NULL AND s.cn IS NULL AND s.hn IS NOT NULL
"""


def record_queries() -> dict[str, str]:
    n_residues = len(fixtures.ORIGIN_PATTERNS)
    p = record_prefix()
    return {
        "kg_classification": p
        + """
SELECT conv_id, turn_idx, review_status, stars, clinical_significances,
       n_classifications
FROM recs WHERE valid""",
        "kg_consequences": p
        + f"""
, cons_src AS (SELECT * FROM recs2 WHERE valid AND has_measure),
cas AS (
{_cascade_union('cons_src')}
)
SELECT conv_id, turn_idx, matched_by, ensembl_gene_id, gene_symbol, so_term
FROM cas""",
        "kg_microsatellite": p
        + """
SELECT conv_id, turn_idx, variant_type, vcf_ref, vcf_alt,
       microsatellite_category, is_repeat_expansion
FROM recs WHERE valid AND has_measure""",
        "kg_gauntlet": p
        + f"""
SELECT {_GAUNTLET_REASON} AS reason, count(*)::BIGINT AS n_records
FROM recs2 GROUP BY 1""",
        "kg_evidence": p
        + f"""
, elig AS (
  SELECT * FROM recs2
  WHERE valid AND n_classifications = 1 AND n_names > 0
    AND has_valid_significance AND has_measure
),
ecas AS (
{_cascade_union('elig')}
)
SELECT e.conv_id, e.turn_idx,
       CASE WHEN g.is_somatic THEN 'eva_somatic' ELSE 'eva' END AS datasource_id,
       CASE WHEN g.is_somatic THEN 'somatic_mutation' ELSE 'genetic_association' END AS datatype_id,
       g.allele_origins, e.allelic_requirements, e.clinical_significances,
       e.review_status AS confidence, e.stars, e.literature, e.study_id,
       e.release_date,
       e.ensembl_gene_id AS target_from_source_id,
       e.so_term AS variant_consequence_id, e.matched_by,
       e.coord_key AS variant_id, e.variant_rs_id, e.variant_vcv_id,
       e.hgvs_key AS variant_hgvs_id, e.cohort_phenotypes,
       d.disease_from_source,
       'MG:' || d.disease_from_source AS disease_from_source_id,
       d.disease_mapped_id
FROM ecas e
JOIN og g ON (e.doc_id % {n_residues}) = g.origin_residue
JOIN dgroups d ON d.conv_id = e.conv_id AND d.turn_idx = e.turn_idx""",
        "kg_feedback": p
        + """
, fb_src AS (SELECT * FROM recs2 WHERE valid AND has_measure),
vids AS (
  SELECT conv_id, turn_idx, study_id, variant_rs_id AS bioentity
  FROM fb_src WHERE variant_rs_id IS NOT NULL
  UNION ALL
  SELECT conv_id, turn_idx, study_id, variant_nsv_id
  FROM fb_src WHERE variant_nsv_id IS NOT NULL
)
SELECT v.study_id AS study, v.bioentity, 'disease' AS property_type,
       t.mention_norm AS property_value, c.iri AS semantic_tag,
       'clinvar-xrefs' AS annotator
FROM vids v
JOIN tm t USING (conv_id, turn_idx)
JOIN curated c USING (mention_norm)""",
        "kg_eval_metrics": kg_prefix()
        + f"""
, gold AS (SELECT * FROM {fixtures.eval_gold_sql()}),
bridge AS (SELECT * FROM {fixtures.eval_bridge_sql()}),
got0 AS (SELECT mention_norm AS key, term_id FROM links),
gkeys AS (SELECT DISTINCT key FROM gold UNION SELECT DISTINCT key FROM got0),
cg AS (
  SELECT g.key, list_sort(list(DISTINCT coalesce(b.canonical_id, g.term_id))) AS gold_terms
  FROM gold g LEFT JOIN bridge b USING (term_id) GROUP BY g.key
),
ct AS (
  SELECT t.key, list_sort(list(DISTINCT coalesce(b.canonical_id, t.term_id))) AS got_terms
  FROM got0 t LEFT JOIN bridge b USING (term_id) GROUP BY t.key
),
pairs AS (
  SELECT k.key,
         coalesce(cg.gold_terms, []) AS l,
         coalesce(ct.got_terms, []) AS r
  FROM gkeys k LEFT JOIN cg USING (key) LEFT JOIN ct USING (key)
),
scored AS (
  SELECT key,
         len(list_intersect(r, l)) AS tp,
         len(list_filter(r, x -> NOT list_contains(l, x))) AS fp,
         len(list_filter(l, x -> NOT list_contains(r, x))) AS fn,
         len(l) AS nl, len(r) AS nr
  FROM pairs
),
cat AS (
  SELECT *,
         CASE WHEN nl = 0 AND nr > 0 THEN 'cv_missing'
              WHEN nl > 0 AND nr = 0 THEN 'cmat_missing'
              WHEN nl = 0 AND nr = 0 THEN 'both_missing'
              WHEN fp > 0 AND fn = 0 THEN 'cmat_superset'
              WHEN fp = 0 AND fn > 0 THEN 'cmat_subset'
              WHEN fp = 0 AND fn = 0 THEN 'exact_match'
              WHEN tp > 0 THEN 'divergent_match'
              ELSE 'mismatch' END AS category,
         CASE WHEN tp + fp + fn > 0 THEN 2.0 * tp / (2 * tp + fp + fn)
              ELSE 0.0 END AS f1
  FROM scored
)
SELECT category, count(*)::BIGINT AS count, round(avg(f1), 4) AS avg_f1_r,
       sum(tp)::BIGINT AS tp, sum(fp)::BIGINT AS fp, sum(fn)::BIGINT AS fn
FROM cat GROUP BY category""",
        # F5/F6 golden table (see fixtures.HGVS_CASES for why this oracle is
        # pinned rather than recomputed: RE2 lacks the lookahead the pivot
        # regex family requires)
        "hgvs_parse": f"SELECT * FROM {fixtures.hgvs_cases_sql()}",
        "kg_metadata": kg_prefix()
        + """
SELECT * FROM (
  SELECT 'schema_version' AS key, 'transcripts.v1' AS value
  UNION ALL SELECT 'n_columns', '6'
  UNION ALL SELECT 'n_turns', CAST(count(*) AS VARCHAR) FROM transcripts
  UNION ALL SELECT 'n_conversations', CAST(count(DISTINCT conv_id) AS VARCHAR) FROM transcripts
  UNION ALL SELECT 'min_ts', CAST(CAST(floor(epoch(min(ts))) AS BIGINT) AS VARCHAR) FROM transcripts
  UNION ALL SELECT 'max_ts', CAST(CAST(floor(epoch(max(ts))) AS BIGINT) AS VARCHAR) FROM transcripts
  UNION ALL SELECT 'max_turn_idx', CAST(max(turn_idx) AS VARCHAR) FROM transcripts
)""",
    }


def doc_prefix() -> str:
    return """
WITH doc_tokens AS (
  SELECT doc_id, lang, source,
         unnest(string_split(lower(text), ' ')) AS tok,
         CAST(unnest(range(len(string_split(lower(text), ' ')))) AS INT) AS pos
  FROM documents
)
"""


def data_queries() -> dict[str, str]:
    """Training-data pipeline oracles over documents/embeddings/events."""
    q: dict[str, str] = {}

    # bpe_tokens: Spark splits on alnum/other class boundaries + spaces and
    # drops empties — equivalently, the count of maximal [a-z0-9]+ or
    # [^a-z0-9 ]+ runs (RE2 has no lookarounds, so the oracle counts runs
    # instead of boundaries; the two formulations are provably identical).
    # lang: argmax of marker-word profile fractions, alphabetically-first
    # tie-break (the iterative strict-> of functions/text.py:lang_id).
    def _lang_frac(markers: list[str]) -> str:
        marks = ", ".join(f"'{m}'" for m in markers)
        return (
            "(len(list_filter(string_split(lower(text), ' '), t -> t IN (" + marks + "))) * 1.0"
            " / greatest(len(string_split(lower(text), ' ')), 1))"
        )

    from .functions.text import LANG_MARKERS

    sde = _lang_frac(LANG_MARKERS["de"])
    sen = _lang_frac(LANG_MARKERS["en"])
    ses = _lang_frac(LANG_MARKERS["es"])
    # Polynomial rolling-hash winnowing twin: per-position direct evaluation
    # of the SAME window hashes the engine's single-pass rolling recurrence
    # produces (functions/text.rolling_fingerprint). Direct form: sum of
    # ascii(char) * B^(m-1-j) mod-M weights over the (possibly partial)
    # window — each term <= 255*(M-1) and <=8 terms, so one final % M is
    # exact in int64.
    from .functions.text import ROLL_B, ROLL_K, ROLL_M

    pw = [pow(ROLL_B, e, ROLL_M) for e in range(ROLL_K)]
    pw_lit = "[" + ", ".join(str(x) for x in pw) + "]"
    w = f"substr(text, s, {ROLL_K})"
    winnow_sql = (
        f"(list_min(list_transform(range(1, greatest(len(text) - {ROLL_K - 1}, 1) + 1), "
        f"s -> (list_sum(list_transform(range(1, len({w}) + 1), "
        f"j -> ascii(substr({w}, j, 1))::BIGINT * ({pw_lit}[len({w}) - j + 1]))) % {ROLL_M}))))::BIGINT"
    )
    q["text_stats"] = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]+')) AS bpe_tokens,
       CASE WHEN {ses} > greatest({sde}, {sen}) THEN 'es'
            WHEN {sen} > {sde} THEN 'en' ELSE 'de' END AS lang,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       {winnow_sql} AS winnow_fp,
       round(0.5 * least(1.0, len(string_split(lower(text), ' ')) / 20.0)
           + 0.5 * (1 - len(list_filter(string_split(lower(text), ' '),
                                        t -> t IN ('the', 'a', 'of', 'and', 'is')))
                    / greatest(len(string_split(lower(text), ' ')), 1)), 4) AS quality
FROM documents"""

    # Corpus profiling rollup + deterministic hash sample (operators/corpus
    # twins; the quality formula matches functions/text.quality_score).
    q["corpus_stats"] = """
SELECT source, lang,
       count(*)::BIGINT AS n_docs,
       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
       round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
       round(avg(len(text)), 4) AS avg_chars,
       round(avg(0.5 * least(1.0, len(string_split(lower(text), ' ')) / 20.0)
           + 0.5 * (1 - len(list_filter(string_split(lower(text), ' '),
                                        t -> t IN ('the', 'a', 'of', 'and', 'is')))
                    / greatest(len(string_split(lower(text), ' ')), 1))), 4) AS avg_quality
FROM documents GROUP BY source, lang"""

    q["doc_sample"] = """
SELECT doc_id, source, lang FROM documents
WHERE (('0x' || substr(md5('r4:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100) < 10"""

    # PII redaction + vocabulary (functions/text.PII_PATTERNS imported so
    # the two sides cannot drift; patterns are RE2-compatible by design).
    from .functions.text import PII_PATTERNS

    def _sq(v: str) -> str:
        return "'" + v.replace("'", "''") + "'"

    red = "text"
    cnt = "0"
    for _n, pat, tok in PII_PATTERNS:
        cnt += f" + len(regexp_extract_all({red}, {_sq(pat)}))"
        red = f"regexp_replace({red}, {_sq(pat)}, {_sq(tok)}, 'g')"
    q["text_redact"] = f"""
SELECT doc_id, {red} AS redacted, ({cnt})::INT AS n_redactions
FROM documents"""

    q["corpus_vocabulary"] = """
SELECT tok, count(*)::BIGINT AS tf, count(DISTINCT doc_id)::BIGINT AS df
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
GROUP BY tok"""

    # Zipf coverage curve (queries.corpus_vocab_coverage twin).
    q["corpus_vocab_coverage"] = """
WITH vocab AS (
  SELECT tok, count(*)::BIGINT AS tf
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT tok, tf, row_number() OVER (ORDER BY tf DESC, tok) AS rank FROM vocab
),
ks AS (SELECT unnest([8, 16, 32]) AS k)
SELECT k,
       round(sum(CASE WHEN rank <= k THEN tf END) * 1.0 / sum(tf), 4) AS coverage,
       max(CASE WHEN rank <= k THEN rank END)::INT AS vocab_used
FROM ranked CROSS JOIN ks GROUP BY k"""

    # Gopher-style repetition stats (functions/text.repetition_stats twin):
    # counts via unnest + groupBy here where Spark folds in-row — same math.
    q["text_repetition"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS tl
  FROM documents
),
tok_counts AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(tl) AS tok FROM toks) GROUP BY doc_id, tok
),
tok_stats AS (
  SELECT doc_id, sum(c) AS n, count(*) AS n_distinct, max(c) AS top
  FROM tok_counts GROUP BY doc_id
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tl) - 1, 0) + 1),
         i -> tl[i] || ' ' || tl[i + 1])) AS b
  FROM toks WHERE len(tl) > 1
),
bg_counts AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
bg_stats AS (SELECT doc_id, max(c) AS topbg, sum(c) AS nbg FROM bg_counts GROUP BY doc_id)
SELECT d.doc_id,
       CASE WHEN t.n > 0 THEN round(1 - t.n_distinct * 1.0 / t.n, 4) END AS dup_token_frac,
       CASE WHEN t.n > 0 THEN round(t.top * 1.0 / t.n, 4) END AS top_token_frac,
       CASE WHEN b.topbg IS NOT NULL THEN round(b.topbg * 1.0 / b.nbg, 4) END
         AS top_bigram_frac
FROM documents d
LEFT JOIN tok_stats t USING (doc_id)
LEFT JOIN bg_stats b USING (doc_id)"""

    # Benchmark decontamination (operators/corpus.decontaminate twin):
    # deterministic ~5% hash sample as the eval set, word-trigram shingles
    # built with the dedup_shingle_jaccard slice recipe, overlap counted on
    # the doc's DISTINCT shingles.
    q["corpus_decontaminate"] = """
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tl,
         (('0x' || substr(md5('bench:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100) < 5
           AS is_bench
  FROM documents
),
sh AS (
  SELECT doc_id, is_bench,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(tl) - 2, 1) + 1),
           i -> array_to_string(list_slice(tl, i, i + 2), ' ')))) AS s
  FROM base
),
bench_set AS (SELECT DISTINCT s FROM sh WHERE is_bench),
hits AS (
  SELECT sh.doc_id, count(*) AS n
  FROM sh JOIN bench_set USING (s)
  WHERE NOT sh.is_bench GROUP BY sh.doc_id
)
SELECT d.doc_id, coalesce(h.n, 0)::INT AS n_contaminated_ngrams,
       coalesce(h.n, 0) >= 2 AS contaminated
FROM base d LEFT JOIN hits h USING (doc_id)
WHERE NOT d.is_bench"""

    # Sequence packing (operators/corpus.pack_sequences twin): deterministic
    # 8-way shard, running token sum in (shard, doc_id) order, 128-token
    # windows.
    q["corpus_pack"] = """
WITH d AS (
  SELECT doc_id,
         ((('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT % 8))::INT
           AS shard,
         len(string_split(text, ' '))::INT AS n_tokens
  FROM documents
)
SELECT doc_id, shard, n_tokens,
       CAST(floor((sum(n_tokens) OVER w - n_tokens) / 128) AS INT) AS seq_idx,
       CAST((sum(n_tokens) OVER w - n_tokens) % 128 AS INT) AS seq_offset
FROM d
WINDOW w AS (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""

    # Boilerplate scoring (operators/corpus.boilerplate_score twin): word
    # trigrams built with the same slice recipe as decontaminate, per-doc
    # fraction of distinct shingles that are corpus-frequent (df >= 3).
    q["corpus_boilerplate"] = """
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tl FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(tl) - 2, 1) + 1),
           i -> array_to_string(list_slice(tl, i, i + 2), ' ')))) AS s
  FROM base
),
freq AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 3),
flagged AS (
  SELECT doc_id, count(*) AS n_flagged FROM sh JOIN freq USING (s) GROUP BY doc_id
),
per AS (
  SELECT doc_id,
         len(list_distinct(list_transform(
           range(1, greatest(len(tl) - 2, 1) + 1),
           i -> array_to_string(list_slice(tl, i, i + 2), ' '))))::INT AS n_shingles
  FROM base
)
SELECT p.doc_id, p.n_shingles, coalesce(f.n_flagged, 0)::INT AS n_flagged,
       round(coalesce(f.n_flagged, 0) * 1.0 / greatest(p.n_shingles, 1), 4)
         AS boilerplate_frac,
       round(coalesce(f.n_flagged, 0) * 1.0 / greatest(p.n_shingles, 1), 4) >= 0.5
         AS is_boilerplate
FROM per p LEFT JOIN flagged f USING (doc_id)"""

    # Source mixing (operators/corpus.mix_sources twin): integer-math
    # thresholds in millionths, deterministic md5 bucket accept test.
    q["corpus_mix"] = """
WITH counts AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
quotas AS (
  SELECT source,
         least(1000000,
               floor(40 * p.parts * 1000000 / (10 * n_src)))::BIGINT
           AS accept_threshold
  FROM counts
  JOIN (VALUES ('src0', 5), ('src1', 3), ('src2', 2)) AS p(source, parts)
    USING (source)
)
SELECT doc_id, source, accept_threshold
FROM documents JOIN quotas USING (source)
WHERE (('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000)
      < accept_threshold"""

    # Unigram-LM scoring (operators/corpus.unigram_logprob twin).
    q["corpus_lm_score"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
vocab AS (SELECT tok, count(*)::BIGINT AS tf FROM toks GROUP BY tok),
tot AS (SELECT sum(tf)::BIGINT AS total_tf FROM vocab),
scored AS (SELECT tok, -ln(tf::DOUBLE / total_tf) AS neg_lp FROM vocab, tot)
SELECT doc_id, count(*)::INT AS n_tokens, round(avg(neg_lp), 4) AS avg_neg_logprob
FROM toks JOIN scored USING (tok) GROUP BY doc_id"""

    # Token-budget selection (operators/corpus.select_by_budget twin): the
    # oracle states the SPEC directly — one global greedy window — which the
    # engine's banded scheme must reproduce exactly.
    q["corpus_budget_select"] = """
WITH d AS (
  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
         round(0.5 * least(1.0, len(string_split(lower(text), ' ')) / 20.0)
           + 0.5 * (1 - len(list_filter(string_split(lower(text), ' '),
                                        t -> t IN ('the', 'a', 'of', 'and', 'is')))
                    / greatest(len(string_split(lower(text), ' ')), 1)), 4) AS quality
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens, quality,
         sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum_tokens
  FROM d
)
SELECT doc_id, n_tokens, quality, cum_tokens FROM c WHERE cum_tokens <= 15000"""

    # Packing manifest (operators/corpus.pack_manifest twin): same sharded
    # running sum as corpus_pack, then one row per touched 128-token window
    # via unnest(range(first_seq, last_seq + 1)) — all integer math.
    q["corpus_pack_manifest"] = """
WITH d AS (
  SELECT doc_id,
         ((('0x' || substr(md5('pack:' || doc_id::VARCHAR), 1, 8))::BIGINT % 8))::INT
           AS shard,
         len(string_split(text, ' '))::BIGINT AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, shard, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens)::BIGINT AS start
  FROM d
),
exploded AS (
  SELECT doc_id, shard, start, n_tokens,
         unnest(range(start // 128, (start + n_tokens - 1) // 128 + 1)) AS seq_idx
  FROM placed WHERE n_tokens > 0
)
SELECT shard, seq_idx::INT AS seq_idx, doc_id,
       (greatest(start, seq_idx * 128) - start)::INT AS doc_offset,
       (greatest(start, seq_idx * 128) - seq_idx * 128)::INT AS seq_offset,
       (least(start + n_tokens, (seq_idx + 1) * 128)
          - greatest(start, seq_idx * 128))::INT AS slice_len
FROM exploded"""

    q["dedup_exact"] = """
SELECT fingerprint, count(*)::BIGINT AS n_docs, min(doc_id) AS canonical_doc_id
FROM (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
) GROUP BY fingerprint"""

    # TextRank (operators/graph twin): weighted PageRank over the
    # undirected bigram graph, 3 rounds unrolled — same discipline as the
    # kmeans/BPE unrolled-CTE oracles. Damping literals are generated from
    # the same Python doubles the engine uses (1.0 - 0.85 is NOT the
    # double nearest 0.15).
    _pr_d = 0.85
    _pr_rounds = 3
    pr_ctes = [
        """tl0 AS (
  SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS tl
  FROM documents
),
bgd AS (
  SELECT tl[i] AS src, tl[i + 1] AS dst
  FROM (SELECT tl, unnest(range(1, len(tl))) AS i FROM tl0 WHERE len(tl) > 1)
),
sym AS (SELECT src, dst FROM bgd UNION ALL SELECT dst AS src, src AS dst FROM bgd),
edges AS (SELECT src, dst, count(*)::DOUBLE AS weight FROM sym GROUP BY src, dst),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
outw AS (SELECT src, sum(weight) AS outw FROM edges GROUP BY src),
ne AS (SELECT e.src, e.dst, e.weight / o.outw AS share
       FROM edges e JOIN outw o ON e.src = o.src),
p0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn)"""
    ]
    for r in range(1, _pr_rounds + 1):
        pr_ctes.append(
            f"""c{r} AS (
  SELECT ne.dst AS node, sum(ne.share * p.pr) AS contrib
  FROM ne JOIN p{r - 1} p ON ne.src = p.node GROUP BY ne.dst
),
d{r} AS (
  SELECT coalesce(sum(pr), 0.0) AS dmass FROM p{r - 1}
  WHERE node NOT IN (SELECT src FROM outw)
),
p{r} AS (
  SELECT nodes.node,
         {1.0 - _pr_d!r} / n + {_pr_d!r} * (coalesce(c.contrib, 0.0) + d.dmass / n)
           AS pr
  FROM nodes CROSS JOIN nn CROSS JOIN d{r} d
  LEFT JOIN c{r} c ON nodes.node = c.node
)"""
        )
    q["corpus_textrank"] = (
        "WITH "
        + ",\n".join(pr_ctes)
        + f"\nSELECT node, round(pr, 6) AS rank FROM p{_pr_rounds}"
    )

    # Exact-quota stratified sampling (operators/corpus.stratified_sample_k
    # twin): per-stratum rank in content-hash order.
    q["corpus_stratified_k"] = """
SELECT doc_id, strata, sample_rank FROM (
  SELECT doc_id, source AS strata,
         (row_number() OVER (PARTITION BY source
                             ORDER BY md5('strat:' || doc_id::VARCHAR), doc_id))::INT
           AS sample_rank
  FROM documents
) WHERE sample_rank <= 5"""

    # Per-source token-length quantiles (operators/corpus.length_quantiles
    # twin): quantile_cont uses the same linear interpolation as Spark's
    # exact percentile.
    q["corpus_length_quantiles"] = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       round(quantile_cont(len(string_split(text, ' ')), 0.25), 4) AS p25,
       round(quantile_cont(len(string_split(text, ' ')), 0.5), 4) AS p50,
       round(quantile_cont(len(string_split(text, ' ')), 0.75), 4) AS p75,
       round(quantile_cont(len(string_split(text, ' ')), 0.95), 4) AS p95
FROM documents GROUP BY source"""

    # Multinomial Naive Bayes (operators/classify twin): priors +
    # Laplace-smoothed likelihoods on the deterministic 50% train split,
    # log-posterior per (held-out doc, class); prediction is argmax over
    # the ROUNDED scores with label-name tie-break.
    nb_scores_sql = """
WITH split AS (
  SELECT doc_id, lang, text,
         (('0x' || substr(md5('nbtrain:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100) < 50
           AS is_train
  FROM documents
),
toks_tr AS (
  SELECT lang AS label, unnest(string_split(lower(text), ' ')) AS tok
  FROM split WHERE is_train
),
tc AS (SELECT label, tok, count(*)::BIGINT AS c FROM toks_tr GROUP BY label, tok),
ct AS (SELECT label, sum(c)::BIGINT AS t_label FROM tc GROUP BY label),
vs AS (SELECT count(DISTINCT tok)::BIGINT AS v FROM tc),
cd AS (SELECT lang AS label, count(*)::BIGINT AS n_docs FROM split WHERE is_train GROUP BY lang),
tot AS (SELECT sum(n_docs)::BIGINT AS n_total FROM cd),
pri AS (
  SELECT cd.label,
         ln(n_docs::DOUBLE / n_total) AS log_prior,
         ln(1.0 / (t_label + 1.0 * v)) AS log_oov
  FROM cd CROSS JOIN tot JOIN ct ON cd.label = ct.label CROSS JOIN vs
),
lik AS (
  SELECT tc.label, tok, ln((c + 1.0) / (t_label + 1.0 * v)) AS log_lik
  FROM tc JOIN ct ON tc.label = ct.label CROSS JOIN vs
),
toks_te AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
  FROM split WHERE NOT is_train
),
st AS (
  SELECT t.doc_id, p.label, coalesce(l.log_lik, p.log_oov) AS ll
  FROM toks_te t
  CROSS JOIN pri p
  LEFT JOIN lik l ON l.label = p.label AND l.tok = t.tok
),
agg AS (SELECT doc_id, label, sum(ll) AS sum_ll FROM st GROUP BY doc_id, label)
SELECT a.doc_id, a.label, round(p.log_prior + a.sum_ll, 4) AS score
FROM agg a JOIN pri p ON a.label = p.label"""
    q["classify_nb_scores"] = nb_scores_sql
    q["classify_nb_predict"] = f"""
WITH scores AS ({nb_scores_sql}),
ranked AS (
  SELECT doc_id, label,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label) AS rn
  FROM scores
)
SELECT doc_id, label AS predicted FROM ranked WHERE rn = 1"""

    # Winnowing substring-overlap pairs (operators/dedup.
    # winnow_substring_pairs twin): per-position k-gram polynomial hashes
    # over lower(text), window-min selection, df-capped fingerprint
    # self-join counting shared DISTINCT fingerprints.
    from .functions.text import WINNOW_W
    from .operators.dedup import WINNOW_MAX_DF

    wsub = f"substr(lower(text), i, {ROLL_K})"
    whash = (
        f"(list_sum(list_transform(range(1, len({wsub}) + 1), "
        f"j -> ascii(substr({wsub}, j, 1))::BIGINT * ({pw_lit}[len({wsub}) - j + 1]))) % {ROLL_M})"
    )
    q["dedup_winnow_pairs"] = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(text) - {ROLL_K - 1}, 1) + 1),
                        i -> {whash}) AS hs
  FROM documents
),
fp AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(hs) >= {WINNOW_W}
           THEN list_transform(range(1, len(hs) - {WINNOW_W} + 2),
                               s -> list_min(hs[s:s+{WINNOW_W - 1}]))
           ELSE [list_min(hs)] END) AS fps
  FROM h
),
e AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
keep AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DF}),
e2 AS (SELECT doc_id, fp FROM e JOIN keep USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::INT AS n_shared
FROM e2 a JOIN e2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 8"""

    # MinHash signatures: N hash families h_i(tok) = md5(i || ':' || tok),
    # signature component = lexicographic min (uniform over fixed-width hex).
    # Parameters imported from operators.dedup so the two sides cannot drift.
    from .operators.dedup import MAX_TOKEN_DF, N_BANDS, N_MINHASHES

    q["dedup_minhash_signatures"] = (
        doc_prefix()
        + """
SELECT doc_id,
"""
        + ",\n".join(
            f"       min(md5('{i}:' || tok)) AS h{i}" for i in range(N_MINHASHES)
        )
        + "\nFROM doc_tokens GROUP BY doc_id"
    )

    # LSH banding: N_BANDS bands x (N/N_BANDS) rows; candidates share a band key.
    rows_per_band = N_MINHASHES // N_BANDS
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, md5("
        + " || ".join(f"h{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band))
        + ") AS band_key FROM sigs"
        for b in range(N_BANDS)
    )
    q["dedup_minhash_pairs"] = (
        doc_prefix()
        + """
, sigs AS (
  SELECT doc_id,
"""
        + ",\n".join(f"         min(md5('{i}:' || tok)) AS h{i}" for i in range(N_MINHASHES))
        + f"""
  FROM doc_tokens GROUP BY doc_id
),
bands AS (
{band_selects}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""
    )

    # Near-dup clusters: the minhash pair graph + 3 unrolled rounds of
    # min-label propagation (each round: every doc takes the min cluster_id
    # among itself and its neighbors), then canonical = label == own id.
    # Identical fixed-rounds semantics to dedup.near_dup_clusters(rounds=3).
    prop_layers = []
    for r in range(1, 4):
        prop_layers.append(f"""l{r} AS (
  SELECT l.doc_id,
         least(l.cluster_id, coalesce(m.nmin, l.cluster_id)) AS cluster_id
  FROM l{r - 1} l LEFT JOIN (
    SELECT e.src AS doc_id, min(n.cluster_id) AS nmin
    FROM edges e JOIN l{r - 1} n ON n.doc_id = e.dst
    GROUP BY e.src
  ) m USING (doc_id)
)""")
    q["dedup_clusters"] = (
        q["dedup_minhash_pairs"].replace(
            "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\nFROM bands a JOIN bands b\n  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id",
            """, pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
l0 AS (SELECT doc_id, doc_id AS cluster_id FROM documents),
"""
            + ",\n".join(prop_layers)
            + """
SELECT doc_id, cluster_id, (cluster_id = doc_id) AS is_canonical FROM l3""",
        )
    )

    # The curation funnel (operators/corpus.curate twin): the cluster CTE
    # chain above + exact-dup canonical window + quality gate, first
    # matching drop reason in pipeline order.
    q["corpus_curate"] = q["dedup_clusters"].replace(
        """SELECT doc_id, cluster_id, (cluster_id = doc_id) AS is_canonical FROM l3""",
        ", nd AS (SELECT doc_id, (cluster_id = doc_id) AS nd_canon FROM l3),\nfpc AS (\n  SELECT doc_id,\n         (row_number() OVER (\n            PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))\n            ORDER BY doc_id) = 1) AS fp_canon,\n         round(0.5 * least(1.0, len(string_split(lower(text), ' ')) / 20.0)\n           + 0.5 * (1 - len(list_filter(string_split(lower(text), ' '),\n                                        t -> t IN ('the', 'a', 'of', 'and', 'is')))\n                    / greatest(len(string_split(lower(text), ' ')), 1)), 4) AS q\n  FROM documents\n)\nSELECT f.doc_id, f.q AS quality,\n       CASE WHEN NOT f.fp_canon THEN 'exact_duplicate'\n            WHEN NOT coalesce(n.nd_canon, TRUE) THEN 'near_duplicate'\n            WHEN f.q < 0.5 THEN 'low_quality'\n            ELSE 'keep' END AS drop_reason\nFROM fpc f LEFT JOIN nd n USING (doc_id)",
    )

    # Blocked token-set Jaccard near-dup: block on source, df-capped token
    # sets (tokens with block-local doc frequency > MAX_TOKEN_DF dropped from
    # the sets first — the identical cap the engine applies), then exact set
    # Jaccard >= 0.8 within a block.
    q["dedup_ngram_jaccard"] = (
        doc_prefix()
        + f"""
, dt0 AS (SELECT DISTINCT doc_id, source, tok FROM doc_tokens),
rare AS (
  SELECT source, tok FROM dt0 GROUP BY source, tok HAVING count(*) <= {MAX_TOKEN_DF}
),
dt AS (SELECT dt0.* FROM dt0 JOIN rare USING (source, tok)),
sizes AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM dt a JOIN dt b ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8"""
    )

    # Word-bigram shingle Jaccard (blocked_jaccard_pairs(shingle=2) twin):
    # shingles built in-row from the token list, then the identical
    # df-cap/equi-join/Jaccard machinery.
    q["dedup_shingle_jaccard"] = f"""
WITH toks0 AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS tl FROM documents
),
dt0 AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(tl) - 1, 1) + 1),
           i -> array_to_string(list_slice(tl, i, i + 1), ' ')))) AS tok
  FROM toks0
),
rare AS (
  SELECT source, tok FROM dt0 GROUP BY source, tok HAVING count(*) <= {MAX_TOKEN_DF}
),
dt AS (SELECT dt0.* FROM dt0 JOIN rare USING (source, tok)),
sizes AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM dt a JOIN dt b ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(shared * 1.0 / (sa.n + sb.n - shared), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8"""

    # SimHash fingerprints: 32-bit token hash = first 8 hex chars of md5;
    # per-bit +/-1 majority vote (identical formula to operators/dedup.py).
    simhash_core = (
        doc_prefix()
        + """
, toks AS (SELECT DISTINCT doc_id, tok FROM doc_tokens),
hashed AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed, (SELECT unnest(range(32)) AS bit) bits
  GROUP BY doc_id, bit
),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
)
"""
    )
    q["dedup_simhash"] = simhash_core + "SELECT doc_id, simhash FROM sim"

    # Hamming near-dups via pigeonhole blocking (max_hamming+1 = 4 chunks of
    # 8 bits; a <=3-bit-distant pair must agree exactly on >=1 chunk), the
    # identical scheme to dedup.hamming_near_dups: candidates from an
    # equi-join on (chunk, chunk_value), deduped, scored once.
    q["dedup_simhash_pairs"] = (
        simhash_core
        + """
, chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (8 * c)) & 255 AS ckey
  FROM sim, (SELECT unnest(range(4)) AS c) cs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b))::INT AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3"""
    )

    # Brute-force cosine top-k: queries are vec_id < 10, k = 5.
    q["ann_cosine_topk"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
              * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos
  FROM v q JOIN v c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 5"""

    # Random-hyperplane LSH top-k (the ANN scale path): weights derived from
    # md5 exactly as similarity.hyperplane_weight does — fmod matches Spark's
    # double %; the addition order of the projection matches F.aggregate's
    # left fold, so signs (and buckets) agree bit-for-bit.
    n_planes, dim = 8, 64

    def _w(p: int, d: int) -> str:
        return (
            f"(fmod(('0x' || substr(md5('{p}:{d}'), 1, 8))::BIGINT::DOUBLE, 2000.0)"
            " - 1000.0) / 1000.0"
        )

    plane_projs = [
        "(" + " + ".join(f"e[{d + 1}] * ({_w(p, d)})" for d in range(dim)) + ")"
        for p in range(n_planes)
    ]
    bucket_expr = " + ".join(
        f"(CASE WHEN {plane_projs[p]} > 0 THEN {1 << p} ELSE 0 END)" for p in range(n_planes)
    )
    q["ann_lsh_topk"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
vs AS (SELECT vec_id, e, ({bucket_expr})::BIGINT AS bucket FROM v),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
              * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos
  FROM vs q JOIN vs c ON q.bucket = c.bucket AND q.vec_id < 10 AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 5"""

    # IVF ANN: centroids = vec_id < 16; assignment = argmax-cosine centroid
    # (centroid-id tie-break); queries probe their 4 best cells; candidates
    # equi-join on cell; top-5 by (cos desc, neighbor asc).
    q["ann_ivf_topk"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS cell, e AS ce FROM v WHERE vec_id < 16),
assign0 AS (
  SELECT v.vec_id AS vid, c.cell,
         list_sum(list_transform(list_zip(v.e, c.ce), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(v.e, x -> x * x)))
              * sqrt(list_sum(list_transform(c.ce, x -> x * x)))) AS ccos
  FROM v, cents c
),
cells AS (
  SELECT vid, cell FROM (
    SELECT vid, cell,
           row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cell ASC) AS rn
    FROM assign0
  ) WHERE rn = 1
),
probes AS (
  SELECT vid AS query_id, cell FROM (
    SELECT vid, cell,
           row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cell ASC) AS rn
    FROM assign0 WHERE vid < 10
  ) WHERE rn <= 4
),
pairs AS (
  SELECT p.query_id, a.vid AS neighbor_id,
         list_sum(list_transform(list_zip(q.e, c.e), x -> x[1] * x[2]))
           / (sqrt(list_sum(list_transform(q.e, x -> x * x)))
              * sqrt(list_sum(list_transform(c.e, x -> x * x)))) AS cos
  FROM probes p
  JOIN cells a ON a.cell = p.cell
  JOIN v q ON q.vec_id = p.query_id
  JOIN v c ON c.vec_id = a.vid
  WHERE a.vid <> p.query_id
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 5"""

    # Embedding-cosine near-dup pairs: OR-amplified hyperplane LSH with the
    # SAME driver-side numeric weights (similarity.nd_weight) inlined, so
    # buckets agree bit-for-bit; candidates scored once, cos >= 0.4.
    from .operators.similarity import nd_weight

    nd_tables, nd_planes, nd_dim, nd_thr = 8, 6, 64, 0.4
    table_rows = []
    for t in range(nd_tables):
        bucket_terms = []
        for p in range(nd_planes):
            proj = " + ".join(
                f"e[{d + 1}] * ({nd_weight(t, p, d)!r})" for d in range(nd_dim)
            )
            bucket_terms.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END)")
        table_rows.append(
            f"SELECT vec_id, {t} AS t, ({' + '.join(bucket_terms)})::BIGINT AS b FROM v"
        )
    nd_buckets = "\n  UNION ALL\n".join(table_rows)
    q["dedup_embedding_pairs"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
buckets AS (
{nd_buckets}
),
cands AS (
  SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM buckets a JOIN buckets c ON a.t = c.t AND a.b = c.b AND a.vec_id < c.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         list_sum(list_transform(list_zip(va.e, vb.e), p -> p[1] * p[2]))
           / (sqrt(list_sum(list_transform(va.e, x -> x * x)))
              * sqrt(list_sum(list_transform(vb.e, x -> x * x)))) AS cos
  FROM cands
  JOIN v va ON va.vec_id = vec_a
  JOIN v vb ON vb.vec_id = vec_b
)
SELECT vec_a, vec_b, round(cos, 4) AS cos_r FROM scored WHERE cos >= {nd_thr}"""

    # Lloyd k-means, unrolled (round-3 verdict #1): the Spark query runs a
    # driver loop with k=4, max_iters=3 and DETERMINISTIC parts throughout —
    # seeds are the first k vectors by id, assignment is argmin squared-L2
    # with a lowest-centroid-id tie-break, update is the per-cell
    # per-dimension mean with empty cells keeping their centroid — so the
    # whole iteration is SQL-expressible as max_iters unrolled CTE layers
    # (assignment = row_number over the cross join with the k-row centroid
    # relation; update = parallel-unnest per-dimension SUM/COUNT re-listed in
    # dimension order). Final layer = one more assignment + per-cell counts,
    # exactly what queries.ann_kmeans_cells returns.
    km_k, km_iters = 4, 3
    km_dist = (
        "list_sum(list_transform(list_zip(v.e, c.ce),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )

    def _km_assign(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vid, e, cell FROM (
    SELECT v.vid, v.e, c.cell,
           row_number() OVER (PARTITION BY v.vid
                              ORDER BY {km_dist} ASC, c.cell ASC) AS rn
    FROM v v CROSS JOIN {cents} c
  ) WHERE rn = 1
)"""

    def _km_update(name: str, assigned: str, prev_cents: str) -> str:
        # mean = SUM/COUNT (matches the engine's F.sum(element_at)/count
        # update); LEFT JOIN keeps the previous centroid for empty cells
        return f"""{name} AS (
  SELECT p.cell, coalesce(u.me, p.ce) AS ce
  FROM {prev_cents} p LEFT JOIN (
    SELECT cell, list(m ORDER BY d) AS me FROM (
      SELECT cell, d, sum(x) / count(*) AS m
      FROM (SELECT cell, unnest(e) AS x,
                   CAST(unnest(range(len(e))) AS INT) AS d FROM {assigned})
      GROUP BY cell, d
    ) GROUP BY cell
  ) u USING (cell)
)"""

    def _km_ctes() -> list[str]:
        """The shared unrolled-Lloyd CTE chain: v (vectors), c0 (seeds),
        a1/c1..a{iters}/c{iters} — final centroids live in c{km_iters}."""
        ctes = [
            "v AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS e FROM embeddings)",
            f"c0 AS (SELECT vid AS cell, e AS ce FROM v WHERE vid < {km_k})",
        ]
        for i in range(1, km_iters + 1):
            ctes.append(_km_assign(f"a{i}", f"c{i - 1}"))
            ctes.append(_km_update(f"c{i}", f"a{i}", f"c{i - 1}"))
        return ctes

    q["ann_kmeans_cells"] = (
        "WITH "
        + ",\n".join(_km_ctes() + [_km_assign("afinal", f"c{km_iters}")])
        + """
SELECT cell::INT AS cell, count(*)::BIGINT AS n_vectors
FROM afinal GROUP BY cell"""
    )

    # IVF ANN over the Lloyd-REFINED quantizer (operators/kmeans.
    # ivf_kmeans_topk): same unrolled centroid chain, then per-vector
    # assignment (rn=1) and per-query n_probe-cell probing by the same
    # (squared-L2, cell) order, candidate equi-join on cell, cosine top-5.
    km_cos = (
        "list_sum(list_transform(list_zip(q.e, c.e), x -> x[1] * x[2]))"
        " / (sqrt(list_sum(list_transform(q.e, x -> x * x)))"
        " * sqrt(list_sum(list_transform(c.e, x -> x * x))))"
    )
    q["ann_ivf_kmeans_topk"] = (
        "WITH "
        + ",\n".join(_km_ctes())
        + f"""
, ranked AS (
  SELECT v.vid, c.cell,
         row_number() OVER (PARTITION BY v.vid
                            ORDER BY {km_dist} ASC, c.cell ASC) AS rn
  FROM v v CROSS JOIN c{km_iters} c
),
assigned AS (SELECT vid, cell FROM ranked WHERE rn = 1),
probes AS (SELECT vid AS query_id, cell FROM ranked WHERE vid < 10 AND rn <= 2),
pairs AS (
  SELECT p.query_id, a.vid AS neighbor_id, {km_cos} AS cos
  FROM probes p
  JOIN assigned a ON a.cell = p.cell
  JOIN v q ON q.vid = p.query_id
  JOIN v c ON c.vid = a.vid
  WHERE a.vid <> p.query_id
)
SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos_r
FROM (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 5"""
    )

    # is_a-descendants search, unrolled (operators/hierarchy twin): 3 CTE
    # layers of first-visit BFS (each layer anti-filters every earlier
    # layer, so diamond children keep their MINIMUM depth), obsolete terms
    # excluded, keyword predicate surfaced as a flag column.
    q["kg_descendants"] = f"""
WITH edges AS (SELECT * FROM {fixtures.is_a_sql()}),
terms AS (SELECT * FROM {fixtures.terms_sql()}),
d0 AS (SELECT 'EFO:0001' AS node),
d1 AS (
  SELECT DISTINCT e.child_id AS node, 1 AS depth
  FROM edges e JOIN d0 ON e.parent_id = d0.node
  WHERE e.child_id NOT IN (SELECT node FROM d0)
),
d2 AS (
  SELECT DISTINCT e.child_id AS node, 2 AS depth
  FROM edges e JOIN d1 ON e.parent_id = d1.node
  WHERE e.child_id NOT IN (SELECT node FROM d0 UNION SELECT node FROM d1)
),
d3 AS (
  SELECT DISTINCT e.child_id AS node, 3 AS depth
  FROM edges e JOIN d2 ON e.parent_id = d2.node
  WHERE e.child_id NOT IN (SELECT node FROM d0 UNION SELECT node FROM d1
                           UNION SELECT node FROM d2)
),
desc_all AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
SELECT t.term_id, t.label, d.depth, contains(t.label, 'merge') AS matches_merge
FROM desc_all d JOIN terms t ON t.term_id = d.node
WHERE NOT t.is_obsolete"""

    # BPE merge training, unrolled (operators/bpe.bpe_merges twin): the
    # Spark query is a driver loop with fixed n_merges=6 and deterministic
    # parts throughout (top pair by count DESC, lhs ASC, rhs ASC; greedy
    # left-to-right merge application via literal replace on the
    # SEP-wrapped symbol string), so the loop unrolls into 6 CTE layers —
    # the ann_kmeans_cells discipline applied to tokenizer training.
    from .operators.bpe import SEP as _BSEP

    bpe_rounds = 6
    bpe_ctes = [
        f"""w0 AS (
  SELECT word, regexp_replace(word, '(.)', '{_BSEP}\\1{_BSEP}', 'g') AS s,
         count(*) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
  WHERE word <> '' AND NOT contains(word, '{_BSEP}')
  GROUP BY word
)"""
    ]
    for r in range(1, bpe_rounds + 1):
        bpe_ctes.append(f"""p{r} AS (
  SELECT sl[i] AS lhs, sl[i + 1] AS rhs, sum(freq) AS cnt
  FROM (
    SELECT freq, sl, unnest(range(1, greatest(len(sl), 1))) AS i
    FROM (SELECT freq, string_split(trim(s, '{_BSEP}'), '{_BSEP}{_BSEP}') AS sl
          FROM w{r - 1})
  )
  GROUP BY 1, 2
)""")
        bpe_ctes.append(
            f"t{r} AS (SELECT lhs, rhs, cnt FROM p{r} "
            "ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1)"
        )
        bpe_ctes.append(f"""w{r} AS (
  SELECT w.word,
         replace(w.s, '{_BSEP}' || t.lhs || '{_BSEP}{_BSEP}' || t.rhs || '{_BSEP}',
                 '{_BSEP}' || t.lhs || t.rhs || '{_BSEP}') AS s, w.freq
  FROM w{r - 1} w, t{r} t
)""")
    q["corpus_bpe_merges"] = (
        "WITH "
        + ",\n".join(bpe_ctes)
        + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT {r} AS merge_rank, lhs, rhs, cnt::BIGINT AS pair_count FROM t{r}"
            for r in range(1, bpe_rounds + 1)
        )
    )

    # BPE tokenization (operators/bpe.apply_merges twin): the same unrolled
    # training chain, whose final layer w6 IS the word -> merged-symbols
    # vocabulary; per-doc token count = sum of symbol-list lengths over the
    # doc's words (LEFT JOIN keeps all-empty docs at 0, matching the
    # engine's empty-token filter).
    q["corpus_bpe_tokenize"] = (
        "WITH "
        + ",\n".join(bpe_ctes)
        + f"""
SELECT dd.doc_id, coalesce(t.n, 0)::INT AS n_bpe_tokens
FROM documents dd LEFT JOIN (
  SELECT d.doc_id,
         sum(len(string_split(trim(v.s, '{_BSEP}'), '{_BSEP}{_BSEP}'))) AS n
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents) d
  JOIN w{bpe_rounds} v USING (word)
  GROUP BY d.doc_id
) t USING (doc_id)"""
    )

    # Incremental (daily-ingest) minhash dedup: same signatures/bands as
    # dedup_minhash_pairs, new-batch membership by the SAME deterministic
    # hash-sample formula as corpus.sample_bucket(salt='inc'), pairs
    # restricted to those touching a new doc (normalized least/greatest).
    q["dedup_incremental_pairs"] = (
        doc_prefix()
        + """
, sigs AS (
  SELECT doc_id,
"""
        + ",\n".join(f"         min(md5('{i}:' || tok)) AS h{i}" for i in range(N_MINHASHES))
        + f"""
  FROM doc_tokens GROUP BY doc_id
),
bands AS (
{band_selects}
),
flagged AS (
  SELECT b.*,
         (('0x' || substr(md5('inc:' || b.doc_id::VARCHAR), 1, 8))::BIGINT % 100) < 10
           AS is_new
  FROM bands b
)
SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b
FROM flagged a JOIN flagged b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id <> b.doc_id
WHERE a.is_new"""
    )

    # Signed random projection (operators/similarity.project_embeddings
    # twin): the SAME driver-side ±1 matrix inlined as a literal, so the
    # two sides cannot drift; scale literal generated from the engine's
    # own double.
    import math as _math

    from .operators.similarity import projection_signs as _proj_signs

    _pj = _proj_signs(16, 64)
    _pscale = 1.0 / _math.sqrt(16)
    _pj_lit = (
        "[" + ", ".join("[" + ", ".join(repr(v) for v in row) + "]" for row in _pj) + "]"
    )
    q["embed_project"] = f"""
SELECT vec_id, i::INT AS comp,
       round(list_dot_product(embedding::DOUBLE[], ({_pj_lit})[i + 1]) * {_pscale!r}, 6)
         AS value
FROM embeddings CROSS JOIN (SELECT unnest(range(0, 16)) AS i)"""

    # Event-stream tumbling 1-hour aggregation (batch twin of the
    # Structured Streaming job in streaming/ingest.py).
    q["events_hourly"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2"""

    # Backward as-of join (operators/events.asof_join twin): DuckDB's
    # native ASOF LEFT JOIN states the spec; the engine's union-window
    # form must reproduce it, inclusive ties and no-match nulls included.
    q["events_asof"] = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
v AS (SELECT * FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
       p.value AS purchase_value,
       v.value AS view_value,
       v.event_id AS view_event_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"""

    # Gap-based sessionization (30-minute inactivity gap).
    # NB: floor(epoch(...)) matches Spark's unix_timestamp() truncation of
    # fractional-second timestamps (DuckDB's epoch() is fractional and a
    # plain BIGINT cast would round instead).
    q["events_sessionize"] = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS INT) AS session_id,
       count(*)::BIGINT AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS start_epoch,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS end_epoch
FROM sessions GROUP BY user_id, session_id"""

    # Relational coverage demos (A-series aggregation + broadcast join shape).
    q["tpch_q1_pricing"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus"""

    # A6 — most-severe per group via broadcast rank dim + row_number
    q["events_most_severe"] = f"""
WITH ranks AS (SELECT * FROM {fixtures.event_severity_sql()})
SELECT user_id, event_type, rank FROM (
  SELECT e.user_id, e.event_type, r.rank,
         row_number() OVER (PARTITION BY e.user_id ORDER BY r.rank ASC, e.event_type ASC) AS rn
  FROM events e JOIN ranks r USING (event_type)
) WHERE rn = 1"""

    q["orders_by_nation"] = """
SELECT n.n_name AS nation, count(*)::BIGINT AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name"""

    return q


def all_oracle_sql() -> dict[str, str]:
    out = dict(kg_queries())
    out.update(record_queries())
    out.update(data_queries())
    return out
