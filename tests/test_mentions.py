"""Mention extraction unit tests.

Mirrors the reference's trait-name parsing tests
(tests/trait_mapping/test_main.py) plus the per-turn text-equality invariant
from BASELINE.json input_hint.
"""

import hashlib

from pyspark.sql import functions as F

from eva_opentargets_spark import fixtures
from eva_opentargets_spark.operators.mentions import (
    distinct_mentions,
    extract_mentions,
    valid_turns,
)

VOCAB = fixtures.mention_vocabulary()


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_unigram_bigram_positions(spark):
    t = _turns(spark, [("c1", 0, "user", "x hash join spark y", None, "2025-01-01 00:00:00")])
    got = {(r.pos, r.mention_norm) for r in extract_mentions(t, VOCAB).collect()}
    # "join" alone is also a synonym-surface unigram (overlaps kept)
    assert got == {(1, "hash join"), (2, "join"), (3, "spark")}


def test_case_normalization(spark):
    # P5 — lookups are case-normalized (main.py:52,57)
    t = _turns(spark, [("c1", 0, "user", "SPARK Hash Join", None, "2025-01-01 00:00:00")])
    got = {r.mention_norm for r in extract_mentions(t, VOCAB).collect()}
    assert got == {"spark", "hash join", "join"}


def test_overlapping_mentions_kept(spark):
    # "sort merge" emits the bigram plus BOTH nested unigrams ("merge" is a
    # label, "sort" is a synonym — both are in the gazetteer surface)
    t = _turns(spark, [("c1", 0, "user", "sort merge", None, "2025-01-01 00:00:00")])
    got = {(r.pos, r.mention_norm) for r in extract_mentions(t, VOCAB).collect()}
    assert got == {(0, "sort merge"), (0, "sort"), (1, "merge")}


def test_stoplist_filter(spark):
    # P2 — NONSPECIFIC_TRAITS analog (clinvar_trait.py:15-18)
    t = _turns(spark, [("c1", 0, "user", "the spark a", None, "2025-01-01 00:00:00")])
    kept = {r.mention_norm for r in extract_mentions(t, VOCAB).collect()}
    assert kept == {"spark"}
    all_m = {r.mention_norm for r in extract_mentions(t, VOCAB, drop_stoplisted=False).collect()}
    assert all_m == {"the", "spark", "a"}


def test_excluded_tool_filter(spark):
    # P3 — submission-name exclusion analog (filtering.py:4-12)
    t = _turns(
        spark,
        [
            ("c1", 0, "tool", "spark", "redacted", "2025-01-01 00:00:00"),
            ("c1", 1, "tool", "spark", "calc", "2025-01-01 00:00:01"),
            ("c1", 2, "user", "", None, "2025-01-01 00:00:02"),
            ("c1", 3, "user", None, None, "2025-01-01 00:00:03"),
        ],
    )
    assert [r.turn_idx for r in valid_turns(t).collect()] == [1]
    got = {(r.turn_idx, r.mention_norm) for r in extract_mentions(t, VOCAB).collect()}
    assert got == {(1, "spark")}


def test_text_equality_invariant(spark):
    # north_rule: extraction must never mutate source text under stable
    # (conv_id, turn_idx) ordering — compare sha256 before/after.
    rows = [("c1", i, "user", f"spark window {i} merge", None, "2025-01-01 00:00:00") for i in range(5)]
    t = _turns(spark, rows)

    def corpus_sha(df):
        rows = df.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
        h = hashlib.sha256()
        for r in rows:
            h.update(f"{r.conv_id}|{r.turn_idx}|{r.text}".encode())
        return h.hexdigest()

    before = corpus_sha(t)
    extract_mentions(t, VOCAB).count()  # run the pipeline
    assert corpus_sha(t) == before


def test_distinct_mention_preagg(spark):
    # A1 — freq counts distinct (conv, turn) pairs (trait_names_parsing.py:24-53)
    t = _turns(
        spark,
        [
            ("c1", 0, "user", "spark spark", None, "2025-01-01 00:00:00"),
            ("c1", 1, "user", "spark", None, "2025-01-01 00:00:01"),
            ("c2", 0, "user", "spark", None, "2025-01-01 00:00:02"),
        ],
    )
    dm = distinct_mentions(extract_mentions(t, VOCAB)).collect()
    row = {r.mention_norm: r for r in dm}["spark"]
    assert row.freq == 3 and row.occurrences == 4 and row.n_conversations == 2


def test_regex_extractor_equals_token_loop(spark):
    """The C-regex gazetteer must be exactly equivalent to the reference
    token-loop semantics (which the DuckDB oracles pin): same mentions,
    same positions, for tricky inputs — overlaps, double spaces, prefixes,
    punctuation tokens, boundaries."""
    import pandas as pd

    from eva_opentargets_spark.operators.mentions import make_extract_udf

    vocab = ["spark", "merge", "sort", "sort merge", "hash join", "join", "batch!", "a"]
    texts = [
        "sort merge sort merge",          # repeated overlapping bigrams
        "x hash join spark",
        "spark  merge",                   # double space (empty token)
        "sorting sort sorted",            # prefix-sharing tokens
        "batch! a spark",                 # punctuation token + single char
        "hash join join hash",
        "",                               # empty
        "spark",                          # single token
        " spark",                         # leading space
        "spark ",                         # trailing space
        "merge sort merge",               # bigram spanning mid-positions
    ]

    def loop_reference(text):
        toks = text.lower().split(" ")
        uni = {w for w in vocab if " " not in w}
        big = {w for w in vocab if " " in w}
        hits = []
        for i, tok in enumerate(toks):
            if tok in uni:
                hits.append((i, tok))
            if i + 1 < len(toks) and tok + " " + toks[i + 1] in big:
                hits.append((i, tok + " " + toks[i + 1]))
        return sorted(hits)

    # drive the pandas UDF's inner function directly via Spark
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    udf = make_extract_udf(vocab)
    from pyspark.sql import functions as F2

    got_rows = df.select("i", udf(F2.col("text")).alias("ms")).collect()
    for r in got_rows:
        got = sorted((m["pos"], m["mention_norm"]) for m in r["ms"])
        want = loop_reference(texts[r["i"]])
        assert got == want, (texts[r["i"]], got, want)


def test_mention_expr_equals_udf(spark):
    """The in-row JVM gazetteer expression (round-6 optimization: removes
    the ArrowEvalPython node from the flagship scan) must be row-for-row
    identical to the pandas UDF, including ORDER within a turn."""
    from pyspark.sql import functions as F2

    from eva_opentargets_spark.operators.mentions import make_extract_udf, mention_expr

    vocab = ["spark", "merge", "sort", "sort merge", "hash join", "join", "batch!", "a"]
    texts = [
        "sort merge sort merge",
        "x hash join spark",
        "spark  merge",
        "sorting sort sorted",
        "batch! a spark",
        "hash join join hash",
        "",
        "spark",
        " spark",
        "spark ",
        "merge sort merge",
        "A SPARK Sort Merge",            # case folding
        "a a a a",                       # repeated single-char unigram
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    udf = make_extract_udf(vocab)
    rows = df.select(
        "i",
        udf(F2.col("text")).alias("u"),
        mention_expr(vocab).alias("e"),
    ).collect()
    for r in rows:
        u = [(m["pos"], m["mention_norm"]) for m in r["u"]]
        e = [(m["pos"], m["mention_norm"]) for m in r["e"]]
        assert u == e, (texts[r["i"]], u, e)
