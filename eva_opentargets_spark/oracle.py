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
exact_agg AS (
  SELECT m.mention_norm, count(DISTINCT t.term_id) AS n_terms, min(t.term_id) AS term_id
  FROM dm m JOIN cur_terms t ON lower(t.label) = m.mention_norm
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
    FROM un0 m JOIN cur_terms t
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
  FROM un1 u JOIN terms t
    ON levenshtein(u.mention_norm, lower(t.label))
       <= least(3, greatest(0, length(u.mention_norm) - 4))
),
fuzzy_links AS (
  SELECT mention_norm, term_id, 'fuzzy' AS match_type, confidence, 'mapped_to' AS pred
  FROM cands
  WHERE in_ontology AND is_current AND (confidence = 'HIGH' OR label_norm = mention_norm)
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
                    in_ontology DESC, is_current DESC, term_id ASC
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

    q["text_stats"] = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
       round(0.5 * least(1.0, len(string_split(lower(text), ' ')) / 20.0)
           + 0.5 * (1 - len(list_filter(string_split(lower(text), ' '),
                                        t -> t IN ('the', 'a', 'of', 'and', 'is')))
                    / greatest(len(string_split(lower(text), ' ')), 1)), 4) AS quality
FROM documents"""

    q["dedup_exact"] = """
SELECT fingerprint, count(*)::BIGINT AS n_docs, min(doc_id) AS canonical_doc_id
FROM (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
) GROUP BY fingerprint"""

    # MinHash signatures: 8 hash families h_i(tok) = md5(i || ':' || tok),
    # signature component = lexicographic min (uniform over fixed-width hex).
    q["dedup_minhash_signatures"] = (
        doc_prefix()
        + """
SELECT doc_id,
"""
        + ",\n".join(
            f"       min(md5('{i}:' || tok)) AS h{i}" for i in range(8)
        )
        + "\nFROM doc_tokens GROUP BY doc_id"
    )

    # LSH banding: 2 bands x 4 rows; candidate pairs share a band key.
    band0 = " || ".join(f"h{i}" for i in range(4))
    band1 = " || ".join(f"h{i}" for i in range(4, 8))
    q["dedup_minhash_pairs"] = (
        doc_prefix()
        + f"""
, sigs AS (
  SELECT doc_id,
"""
        + ",\n".join(f"         min(md5('{i}:' || tok)) AS h{i}" for i in range(8))
        + f"""
  FROM doc_tokens GROUP BY doc_id
),
bands AS (
  SELECT doc_id, 0 AS band, md5({band0}) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, 1 AS band, md5({band1}) AS band_key FROM sigs
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id"""
    )

    # Blocked n-gram (token-set) Jaccard near-dup: block on source,
    # exact set Jaccard >= 0.8 within a block.
    q["dedup_ngram_jaccard"] = (
        doc_prefix()
        + """
, dt AS (SELECT DISTINCT doc_id, source, tok FROM doc_tokens),
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

    # Event-stream tumbling 1-hour aggregation (batch twin of the
    # Structured Streaming job in streaming/ingest.py).
    q["events_hourly"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2"""

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
    out.update(data_queries())
    return out
