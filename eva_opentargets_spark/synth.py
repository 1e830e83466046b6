"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Plays the role of the reference's bundled test extract
(tests/pipelines/resources/input.xml.gz): a seeded corpus with controlled
frequency skew (hot strings like the reference's 'not provided',
clinvar_trait.py:15-18), casefold variants, fuzzy-only misspellings, and
xref-only strings — plus ground-truth expected triples derived from the
same phrase pool, so golden P/R tests (set_metrics.py:78-86 analog) are
hermetic.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from .config import PRED_CANONICAL, PRED_DIRECT

# surface form -> list of (pred, term_id) expected for the *normalized* mention(s)
# it produces. Nested mentions are included explicitly ("sort merge" also
# yields unigram mention "merge" at pos+1).
PHRASE_POOL: list[tuple[str, int, list[tuple[str, str, str]]]] = [
    # (surface, weight, [(mention_norm, pred, term_id), ...])
    ("spark", 40, [("spark", PRED_DIRECT, "EFO:0001")]),
    ("Spark", 10, [("spark", PRED_DIRECT, "EFO:0001")]),  # casefold variant
    (
        "hash join",
        15,
        [
            ("hash join", PRED_DIRECT, "EFO:0002"),
            ("join", PRED_DIRECT, "EFO:0002"),  # nested synonym-exact unigram
        ],
    ),
    (
        "sort merge",
        10,
        [
            ("sort merge", PRED_DIRECT, "EFO:0003"),
            ("merge", PRED_DIRECT, "EFO:0006"),  # nested unigram, ambiguous-exact
            ("merge", PRED_DIRECT, "EFO:0007"),  # -> fuzzy accepts both
            ("sort", PRED_DIRECT, "EFO:0003"),  # nested synonym, ambiguous ->
            ("sort", PRED_DIRECT, "EFO:0004"),  # fuzzy accepts both
        ],
    ),
    ("table scan", 8, [("table scan", PRED_DIRECT, "EFO:0004")]),
    ("window", 8, [("window", PRED_DIRECT, "EFO:0005")]),
    ("merge", 12, [("merge", PRED_DIRECT, "EFO:0006"), ("merge", PRED_DIRECT, "EFO:0007")]),
    ("slow", 6, [("slow", PRED_CANONICAL, "EFO:0009")]),  # obsolete -> replacement
    ("vector", 6, [("vector", PRED_CANONICAL, "EFO:0011")]),  # xref distance 1
    ("dup", 3, []),  # xref only at distance 2 -> unmapped
    ("query", 6, [("query", PRED_DIRECT, "EFO:0015")]),  # lev-1 fuzzy ("querys")
    ("querys", 2, [("querys", PRED_DIRECT, "EFO:0015")]),  # exact
    ("batch", 4, [("batch", PRED_DIRECT, "EFO:0018")]),  # normalized tier ("batch!")
    ("the", 20, []),  # stop-listed (NONSPECIFIC_TRAITS analog)
    (
        "stream filter",
        5,
        [
            ("stream filter", PRED_DIRECT, "EFO:0014"),
            ("filter", PRED_DIRECT, "EFO:0014"),  # nested synonym-exact unigram
        ],
    ),
]

FILLERS = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing", "elit"]
ROLES = ["user", "assistant", "tool"]


def generate(
    spark: SparkSession,
    n_convs: int = 20,
    turns_per_conv: int = 10,
    seed: int = 42,
    excluded_every: int = 13,
) -> tuple[DataFrame, DataFrame]:
    """Returns (transcripts, expected_triples). Fully deterministic."""
    rng = random.Random(seed)
    phrases = [p for p, _, _ in PHRASE_POOL]
    weights = [w for _, w, _ in PHRASE_POOL]
    expect = {p: links for p, _, links in PHRASE_POOL}

    turns = []
    expected = set()
    k = 0
    for c in range(n_convs):
        conv_id = f"s{c:05d}"
        for t in range(turns_per_conv):
            k += 1
            role = ROLES[k % 3]
            tool = "redacted" if k % excluded_every == 0 else None
            n_fill = rng.randint(2, 6)
            words = [rng.choice(FILLERS) for _ in range(n_fill)]
            n_mentions = rng.randint(0, 3)
            chosen = rng.choices(phrases, weights=weights, k=n_mentions)
            for ph in chosen:
                words.insert(rng.randint(0, len(words)), ph)
            text = " ".join(words)
            ts = f"2025-01-01 00:{(t // 60):02d}:{(t % 60):02d}"
            turns.append((conv_id, t, role, text, tool, ts))
            if tool is None:
                for ph in chosen:
                    for mention_norm, pred, term_id in expect[ph]:
                        expected.add(
                            (f"{conv_id}:{t}:{mention_norm}", pred, term_id, conv_id, t, mention_norm)
                        )

    transcripts = spark.createDataFrame(
        turns, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).selectExpr("conv_id", "turn_idx", "role", "text", "tool", "cast(ts as timestamp) as ts")
    expected_df = spark.createDataFrame(
        sorted(expected),
        "subj string, pred string, obj string, conv_id string, turn_idx int, mention_text string",
    )
    return transcripts, expected_df
