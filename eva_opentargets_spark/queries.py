"""Driver-facing query registry: one Spark callable per implemented
operator (SURVEY.md §2), each with a DuckDB oracle twin in oracle.py.

Every callable takes (spark, sf_dir) and returns a DataFrame whose column
names match the oracle exactly (the driver's compare sorts columns by name
before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import fixtures
from .config import STOPLIST
from .functions.text import fingerprint, quality_score
from .operators import dedup, events, similarity
from .operators.curation import rank_candidates
from .operators.linking import (
    fuzzy_candidates,
    link_cascade,
    link_exact,
    link_normalized,
)
from .operators.mentions import distinct_mentions, extract_mentions, valid_turns
from .pipeline import compute_metrics, mappings_from_links, merge_mapping_databases, run_pipeline
from .sources.dictionary import demo_previous_mappings, demo_terms, demo_xrefs
from .sources.transcripts import derive_transcripts


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _pipeline(spark: SparkSession, sf_dir: str):
    return run_pipeline(spark, derive_transcripts(spark, sf_dir))


# --- KG pipeline queries -------------------------------------------------


def kg_transcripts(spark, sf_dir):
    return derive_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


def kg_valid_turns(spark, sf_dir):
    return valid_turns(derive_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "role", "text"
    )


def kg_mentions(spark, sf_dir):
    return extract_mentions(derive_transcripts(spark, sf_dir), fixtures.mention_vocabulary())


def kg_distinct_mentions(spark, sf_dir):
    return distinct_mentions(kg_mentions(spark, sf_dir))


def kg_exact_links(spark, sf_dir):
    return link_exact(kg_distinct_mentions(spark, sf_dir), demo_terms(spark))


def kg_fuzzy_candidates(spark, sf_dir):
    dm = kg_distinct_mentions(spark, sf_dir)
    terms = demo_terms(spark)
    unresolved = dm.join(link_exact(dm, terms), "mention_norm", "left_anti")
    unresolved = unresolved.join(link_normalized(unresolved, terms), "mention_norm", "left_anti")
    return fuzzy_candidates(unresolved, terms).select(
        "mention_norm", "term_id", "label_norm", "in_ontology", "is_current", "lev", "confidence"
    )


def kg_links(spark, sf_dir):
    links, _, _ = link_cascade(kg_distinct_mentions(spark, sf_dir), demo_terms(spark), demo_xrefs(spark))
    return links


def kg_unmapped(spark, sf_dir):
    dm = kg_distinct_mentions(spark, sf_dir)
    _, _, unresolved = link_cascade(dm, demo_terms(spark), demo_xrefs(spark))
    return unresolved.join(dm, "mention_norm", "inner").select(
        "mention_norm", "freq", "occurrences", "n_conversations"
    )


def kg_triples(spark, sf_dir):
    return _pipeline(spark, sf_dir).triples


def kg_mapping_merge(spark, sf_dir):
    res = _pipeline(spark, sf_dir)
    new = mappings_from_links(res.links, demo_terms(spark))
    return merge_mapping_databases(demo_previous_mappings(spark), new)


def kg_best_candidate(spark, sf_dir):
    cands = kg_fuzzy_candidates(spark, sf_dir)
    return (
        rank_candidates(cands)
        .filter(F.col("rank") == 1)
        .select("mention_norm", "term_id", "confidence", "rank")
    )


def kg_metrics(spark, sf_dir):
    res = _pipeline(spark, sf_dir)
    return compute_metrics(spark, res).select("counter", "value")


def _curated_mappings(spark):
    from .schemas import TRAIT_MAPPINGS

    return spark.createDataFrame(fixtures.CURATED_MAPPINGS, TRAIT_MAPPINGS)


def kg_curated_triples(spark, sf_dir):
    from .operators.evidence import curated_mapping_join

    return curated_mapping_join(kg_mentions(spark, sf_dir), _curated_mappings(spark))


def kg_grouped_by_term(spark, sf_dir):
    from .operators.evidence import group_mentions_by_term

    grouped = group_mentions_by_term(kg_mentions(spark, sf_dir), _curated_mappings(spark))
    return grouped.select(
        "conv_id",
        "turn_idx",
        "term_id",
        "representative_mention",
        F.concat_ws(",", "grouped_mentions").alias("grouped"),
        "n_occurrences",
    )


def kg_annotated(spark, sf_dir):
    """S8 — enrichment write-back: originals + packed annotation cells
    (array packed to a string so the value-hash comparison is portable)."""
    from .operators.annotate import annotate_transcripts

    res = _pipeline(spark, sf_dir)
    annotated = annotate_transcripts(res.transcripts, res.triples)
    # pack first, then sort the packed strings, so the order matches the
    # oracle's plain string sort
    packed = F.concat_ws(
        ";",
        F.array_sort(
            F.transform(
                "annotations",
                lambda a: F.concat_ws("|", a["mention"], a["term_id"], a["pred"], a["match_type"]),
            )
        ),
    )
    return annotated.select(
        "conv_id", "turn_idx", "text", packed.alias("annotations_packed")
    )


def events_most_severe(spark, sf_dir):
    from .operators.cascade import most_severe

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "event_type")
    ranks = spark.createDataFrame(fixtures.EVENT_SEVERITY, "event_type string, rank int")
    return most_severe(ev, ["user_id"], ranks, "event_type")


# --- training-data pipeline queries --------------------------------------


def text_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        fingerprint(F.col("text")).alias("fingerprint"),
        F.round(quality_score(F.col("text")), 4).alias("quality"),
    )


def dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def dedup_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir))


def dedup_minhash_pairs(spark, sf_dir):
    return dedup.minhash_candidate_pairs(_docs(spark, sf_dir))


def dedup_ngram_jaccard(spark, sf_dir):
    return dedup.blocked_jaccard_pairs(_docs(spark, sf_dir))


def ann_cosine_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.cosine_topk(emb, lambda vid: vid < 10, k=5)


def events_hourly(spark, sf_dir):
    return events.hourly_rollup(spark.read.parquet(f"{sf_dir}/events.parquet"))


def events_sessionize(spark, sf_dir):
    return events.sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))


def tpch_q1_pricing(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


def orders_by_nation(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


QUERIES = {
    "kg_transcripts": kg_transcripts,
    "kg_valid_turns": kg_valid_turns,
    "kg_mentions": kg_mentions,
    "kg_distinct_mentions": kg_distinct_mentions,
    "kg_exact_links": kg_exact_links,
    "kg_fuzzy_candidates": kg_fuzzy_candidates,
    "kg_links": kg_links,
    "kg_unmapped": kg_unmapped,
    "kg_triples": kg_triples,
    "kg_mapping_merge": kg_mapping_merge,
    "kg_best_candidate": kg_best_candidate,
    "kg_metrics": kg_metrics,
    "kg_curated_triples": kg_curated_triples,
    "kg_grouped_by_term": kg_grouped_by_term,
    "kg_annotated": kg_annotated,
    "events_most_severe": events_most_severe,
    "text_stats": text_stats,
    "dedup_exact": dedup_exact,
    "dedup_minhash_signatures": dedup_minhash_signatures,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "ann_cosine_topk": ann_cosine_topk,
    "events_hourly": events_hourly,
    "events_sessionize": events_sessionize,
    "tpch_q1_pricing": tpch_q1_pricing,
    "orders_by_nation": orders_by_nation,
}
