"""Dedup operator tests (exact, MinHash+LSH, blocked Jaccard, SimHash)."""

from eva_opentargets_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_exact_duplicates(spark):
    d = _docs(
        spark,
        [
            (1, "Hello  World", "en", "s"),
            (2, "hello world", "en", "s"),  # same after normalization
            (3, "something else", "en", "s"),
        ],
    )
    groups = {r.canonical_doc_id: r.n_docs for r in dedup.exact_duplicates(d).collect()}
    assert groups == {1: 2, 3: 1}


def test_minhash_identical_docs_collide(spark):
    d = _docs(
        spark,
        [
            (1, "a b c d e f g h", "en", "s"),
            (2, "a b c d e f g h", "en", "s"),
            (3, "q r s t u v w x", "en", "s"),
        ],
    )
    sigs = {r.doc_id: tuple(r[f"h{i}"] for i in range(8)) for r in dedup.minhash_signatures(d).collect()}
    assert sigs[1] == sigs[2] and sigs[1] != sigs[3]
    pairs = {(r.doc_a, r.doc_b) for r in dedup.minhash_candidate_pairs(d).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_blocked_jaccard(spark):
    d = _docs(
        spark,
        [
            (1, "a b c d e", "en", "s1"),
            (2, "a b c d f", "en", "s1"),  # jaccard 4/6 = 0.667
            (3, "a b c d e", "en", "s2"),  # identical to 1 but different block
        ],
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup.blocked_jaccard_pairs(d, threshold=0.5).collect()}
    assert pairs == {(1, 2): 0.6667}  # cross-block pair (1,3) never compared


def test_simhash_near_dups(spark):
    d = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s"),
            (2, "alpha beta gamma delta epsilon zeta", "en", "s"),
            (3, "totally different words here now ok", "en", "s"),
        ],
    )
    sim = dedup.simhash(d)
    vals = {r.doc_id: r.simhash for r in sim.collect()}
    assert vals[1] == vals[2]
    pairs = {(r.doc_a, r.doc_b) for r in dedup.hamming_near_dups(sim, max_hamming=0).collect()}
    assert (1, 2) in pairs


def test_hamming_pigeonhole_recall_top_bits(spark):
    """Round-3 verdict #2 regression: a pair within Hamming<=3 whose
    differing bits all fall in the TOP 16 bits was silently dropped by the
    old single-block (simhash >> 16) scheme; the pigeonhole blocking
    (4 chunks of 8 bits) must find it — the pair agrees on both low chunks."""
    a = 1 << 31
    b = (1 << 31) | (1 << 30) | (1 << 29)  # hamming 2, top bits only
    sim = spark.createDataFrame([(1, a), (2, b), (3, 0)], "doc_id int, simhash long")
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.hamming_near_dups(sim).collect()}
    assert pairs[(1, 2)] == 2
    # (1,3)/(2,3) differ by 1/3 bits -> also legitimately within max_hamming
    assert pairs[(1, 3)] == 1 and pairs[(2, 3)] == 3


def test_hamming_pigeonhole_no_false_pairs(spark):
    """Pairs beyond max_hamming share chunks (e.g. all-zero chunks) but must
    be filtered by the post-join Hamming score, exactly once per pair."""
    sim = spark.createDataFrame(
        [(1, 0), (2, 0b11110000)], "doc_id int, simhash long"
    )  # hamming 4 > 3, but chunks 1..3 all agree (zero)
    out = dedup.hamming_near_dups(sim).collect()
    assert out == []


def test_near_dup_clusters_propagation(spark):
    """Chain a-b-c collapses to min label within rounds >= diameter;
    singletons stay their own canonical cluster; until_converged matches."""
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id int")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "doc_a int, doc_b int")
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.near_dup_clusters(docs, pairs, rounds=3).collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (1, False), 4: (4, True), 5: (4, False)}
    conv = {r.doc_id: r.cluster_id
            for r in dedup.near_dup_clusters(docs, pairs, until_converged=True).collect()}
    assert conv == {k: v[0] for k, v in out.items()}


def test_near_dup_clusters_long_chain_needs_rounds(spark):
    """Fixed rounds bound the reach: a 5-doc path converges with
    until_converged but not in 1 round — documents the rounds contract."""
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id int")
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a int, doc_b int")
    one = {r.doc_id: r.cluster_id for r in dedup.near_dup_clusters(docs, path, rounds=1).collect()}
    assert one[5] == 4  # only one hop travelled
    full = {r.doc_id: r.cluster_id
            for r in dedup.near_dup_clusters(docs, path, until_converged=True).collect()}
    assert set(full.values()) == {1}


def test_shingle_jaccard_is_order_sensitive(spark):
    """Bigram shingles discriminate word ORDER: two docs with identical
    vocabulary but different phrasing are unigram-identical (jaccard 1.0)
    yet share few bigrams."""
    d = _docs(
        spark,
        [
            (1, "the quick brown fox jumps high", "en", "s"),
            (2, "high jumps fox brown quick the", "en", "s"),  # same words, reversed
            (3, "the quick brown fox jumps high", "en", "s"),  # identical to 1
        ],
    )
    uni = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup.blocked_jaccard_pairs(d, threshold=0.9).collect()}
    bi = {(r.doc_a, r.doc_b): r.jaccard
          for r in dedup.blocked_jaccard_pairs(d, threshold=0.9, shingle=2).collect()}
    assert uni[(1, 2)] == 1.0 and uni[(1, 3)] == 1.0  # unigrams can't tell
    assert (1, 2) not in bi and bi[(1, 3)] == 1.0     # bigrams can


def test_simhash_inrow_equals_explode_form(spark):
    """The round-5 zero-shuffle in-row SimHash must be bit-identical to the
    explode form it supersedes, at the default width and a wide (60-bit)
    one — the two forms share only the hash formula, so equality pins the
    vote/assembly logic."""
    rows = [
        (1, "alpha beta gamma delta", "en", "s"),
        (2, "alpha beta gamma delta epsilon", "en", "s"),
        (3, "entirely different words here now", "en", "s"),
        (4, "alpha alpha alpha beta", "en", "s"),  # multiset == set semantics
        (5, "tiny", "en", "s"),
        (6, "", "en", "s"),
    ]
    d = _docs(spark, rows)
    for bits in (32, 60):
        inrow = {r.doc_id: r.simhash for r in dedup.simhash(d, bits=bits).collect()}
        expl = {
            r.doc_id: r.simhash
            for r in dedup.simhash(d, bits=bits, form="explode").collect()
        }
        assert inrow == expl, f"bits={bits}"
        assert all(0 <= v < (1 << bits) for v in inrow.values())


def test_incremental_pairs_equal_filtered_full_pairs(spark):
    """incremental_minhash_pairs(new, corpus) must equal the full pair set
    of (corpus + new) restricted to pairs touching a new doc — the
    incremental path may skip corpus self-pairing but never a pair a full
    recompute would find."""
    rows = [
        (i, f"alpha beta gamma delta w{i % 4} x{i % 3}", "en", "s")
        for i in range(1, 25)
    ]
    d = _docs(spark, rows)
    new = d.filter("doc_id % 5 = 0")
    corpus = d.filter("doc_id % 5 != 0")
    inc = {
        (r.doc_a, r.doc_b)
        for r in dedup.incremental_minhash_pairs(new, corpus).collect()
    }
    new_ids = {r.doc_id for r in new.collect()}
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_candidate_pairs(d).collect()
        if r.doc_a in new_ids or r.doc_b in new_ids
    }
    assert inc == full
    assert all(a < b for a, b in inc)


def _py_winnow(text, k=8, w=8):
    """Pure-Python reference of functions/text.winnow_fingerprints."""
    B, M = 257, 1_000_000_007
    t = text.lower()
    if not t:
        return None
    if len(t) < k:
        acc = 0
        for ch in t:
            acc = (acc * B + ord(ch)) % M
        return {acc}
    hs = []
    for i in range(len(t) - k + 1):
        hs.append(sum(ord(t[i + j]) * pow(B, k - 1 - j, M) for j in range(k)) % M)
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[s : s + w]) for s in range(len(hs) - w + 1)}


def test_winnow_fingerprints_match_python_reference(spark):
    from pyspark.sql import functions as F

    from eva_opentargets_spark.functions.text import winnow_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",
        "exactly8",
        "a bit longer than eight characters",
        "",
        "repeated repeated repeated repeated",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = {
        r.doc_id: (set(r.fps) if r.fps is not None else None)
        for r in df.select("doc_id", winnow_fingerprints(F.lower(F.col("text"))).alias("fps")).collect()
    }
    for i, t in enumerate(texts):
        assert out[i] == _py_winnow(t), f"doc {i}: {t!r}"


def test_winnow_pairs_detect_partial_overlap_minhash_misses(spark):
    """A 60-char passage pasted into an otherwise-different document:
    winnowing guarantees shared fingerprints (substring >= w+k-1 chars),
    while whole-doc MinHash similarity is low."""
    from eva_opentargets_spark.operators.dedup import winnow_substring_pairs

    passage = "this exact passage was copied verbatim between the documents"
    rows = [
        (1, passage + " and doc one continues about spark partitioning strategies"),
        (2, "doc two opens with other material entirely then quotes " + passage),
        (3, "a third document sharing absolutely nothing with its peers whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_substring_pairs(docs, min_shared=2, max_df=64).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(p == (1, 2) for p in got)  # doc 3 pairs with nobody


def test_winnow_pairs_df_cap_drops_template_fingerprints(spark):
    """Fingerprints present in > max_df docs are boilerplate and never
    generate pairs: a template shared by many docs stops pairing them
    once the cap is below the template's df."""
    from eva_opentargets_spark.operators.dedup import winnow_substring_pairs

    template = "identical boilerplate header shared by every single document here"
    docs = spark.createDataFrame(
        [(i, template) for i in range(10)], "doc_id long, text string"
    )
    uncapped = winnow_substring_pairs(docs, min_shared=1, max_df=64).count()
    capped = winnow_substring_pairs(docs, min_shared=1, max_df=5).count()
    assert uncapped == 45 and capped == 0
