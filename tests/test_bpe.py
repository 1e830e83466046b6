"""BPE merge-loop tests: property equality vs an independent pure-Python
BPE on seeded text, greedy-application semantics, and word-boundary
isolation for the inference half."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from eva_opentargets_spark.operators import bpe


def py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Independent reference: classic BPE training over a word-frequency
    table. Top pair by (weighted count desc, lhs asc, rhs asc); greedy
    left-to-right non-overlapping application."""
    vocab = {w: ([c for c in w], f) for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((lhs, rhs, cnt))
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, f)
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _word_freqs(texts):
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_bpe_matches_python_reference_on_seeded_text(spark):
    for seed in (11, 12, 13):
        rng = random.Random(seed)
        words = ["".join(rng.choices("abcde", k=rng.randint(1, 6))) for _ in range(40)]
        texts = [
            " ".join(rng.choices(words, k=rng.randint(3, 12))) for _ in range(30)
        ]
        got = [
            (r.merge_rank, r.lhs, r.rhs, r.pair_count)
            for r in bpe.bpe_merges(_docs(spark, texts), n_merges=6)
            .orderBy("merge_rank")
            .collect()
        ]
        exp = [
            (i + 1, lhs, rhs, cnt)
            for i, (lhs, rhs, cnt) in enumerate(py_bpe(_word_freqs(texts), 6))
        ]
        assert got == exp, f"seed {seed}"


def test_bpe_greedy_application_is_left_to_right(spark):
    """'aaa' under merge (a,a) must tokenize [aa, a] (greedy non-overlap),
    and the trained second merge must see the POST-merge symbols."""
    texts = ["aaa aaa aaa b"]
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe.bpe_merges(_docs(spark, texts), n_merges=2)
        .orderBy("merge_rank")
        .collect()
    ]
    # round 1: (a,a) appears 2x per 'aaa' (overlap not double-counted at
    # the PAIR-COUNT level it is — adjacent pairs are counted per position:
    # a-a and a-a -> 2 per word x 3 words = 6)
    assert got[0] == (1, "a", "a", 6)
    # round 2: words are now [aa, a]; the only remaining pair is (aa, a) x3
    assert got[1] == (2, "aa", "a", 3)


def test_apply_merges_respects_word_boundaries(spark):
    """Inference: merges never span words — 'ab ab' with merge (a,b)
    yields [ab, ab], and 'a b' (the pair split across words) stays
    [a, b]."""
    d = _docs(spark, ["ab ab", "a b"])
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe.apply_merges(d, [("a", "b")]).select("doc_id", "bpe_tokens").collect()
    }
    assert out[0] == ["ab", "ab"]
    assert out[1] == ["a", "b"]


def test_apply_merges_rank_order_cascades(spark):
    """Later merges may consume earlier merge outputs: (a,b) then (ab,c)
    turns 'abc' into one token."""
    d = _docs(spark, ["abc"])
    out = bpe.apply_merges(d, [("a", "b"), ("ab", "c")]).select("bpe_tokens").first()[0]
    assert out == ["abc"]


def test_apply_merges_token_count_matches_reference_tokenization(spark):
    """Training + tokenizing with the engine equals tokenizing with the
    Python reference's learned merges."""
    texts = ["the cat sat", "the bat sat sat", "a cathat"]
    merges = [(l, r) for l, r, _ in py_bpe(_word_freqs(texts), 4)]
    got = {
        r.doc_id: [t for t in r.bpe_tokens if t != ""]
        for r in bpe.apply_merges(_docs(spark, texts), merges).collect()
    }

    def py_tokenize(text):
        out = []
        for w in text.lower().split(" "):
            if not w:
                continue
            syms = list(w)
            for l, rr in merges:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                        res.append(l + rr)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.extend(syms)
        return out

    assert got == {i: py_tokenize(t) for i, t in enumerate(texts)}
