"""The Arrow fuzzy scorer must produce EXACTLY the JVM path's candidates."""

from pyspark.sql import functions as F

from eva_opentargets_spark.operators.fuzzy_udf import fuzzy_candidates_arrow
from eva_opentargets_spark.operators.linking import fuzzy_candidates


def test_arrow_matches_jvm(spark, terms):
    mentions = spark.createDataFrame(
        [(m,) for m in ["merge", "slow", "vector", "dup", "query", "batch", "row", "customer group"]],
        "mention_norm string",
    )
    cols = ["mention_norm", "term_id", "label_norm", "in_ontology", "is_current", "lev", "confidence"]
    jvm = {tuple(r) for r in fuzzy_candidates(mentions, terms).select(*cols).collect()}
    arrow = {tuple(r) for r in fuzzy_candidates_arrow(mentions, terms).select(*cols).collect()}
    assert jvm == arrow and len(jvm) > 0


def test_arrow_levenshtein_matches_spark(spark):
    import random

    from eva_opentargets_spark.operators.fuzzy_udf import _levenshtein

    rng = random.Random(1)
    words = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 9))) for _ in range(40)]
    pairs = [(words[i], words[(i * 7 + 3) % len(words)]) for i in range(len(words))]
    df = spark.createDataFrame(pairs, "a string, b string").withColumn(
        "lev", F.levenshtein("a", "b")
    )
    for r in df.collect():
        assert _levenshtein(r.a, r.b) == r.lev


def test_lev_batch_property():
    """Property check: the numpy band-vectorized DP equals the scalar DP on
    arbitrary lowercase strings (hypothesis)."""
    from hypothesis import given, settings, strategies as st
    import numpy as np

    from eva_opentargets_spark.operators.fuzzy_udf import _codes, _lev_batch, _levenshtein

    word = st.text(alphabet="abcde ", min_size=1, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(m=word, labels=st.lists(word, min_size=1, max_size=8))
    def check(m, labels):
        by_len = {}
        for lab in labels:
            by_len.setdefault(len(lab), []).append(lab)
        for L, labs in by_len.items():
            mat = np.stack([_codes(x) for x in labs])
            got = list(_lev_batch(_codes(m), mat))
            want = [_levenshtein(m, x) for x in labs]
            assert got == want, (m, labs, got, want)

    check()
