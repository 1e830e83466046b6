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
