"""ANN similarity tests: brute-force top-k correctness; LSH recall of an
identical vector."""

from eva_opentargets_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark):
    d = _emb(
        spark,
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),  # closest to 0
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),  # farthest
        ],
    )
    got = similarity.cosine_topk(d, lambda vid: vid == 0, k=3).orderBy("rank").collect()
    assert [r.neighbor_id for r in got] == [1, 2, 3]
    assert got[0].cos_r > 0.99


def test_lsh_finds_identical(spark):
    d = _emb(
        spark,
        [
            (0, [1.0, 2.0, 3.0, 4.0]),
            (1, [1.0, 2.0, 3.0, 4.0]),  # identical -> same bucket always
            (2, [-1.0, -2.0, -3.0, -4.0]),
        ],
    )
    got = similarity.lsh_topk(d, lambda vid: vid == 0, k=2, dim=4).collect()
    neighbors = {r.neighbor_id for r in got}
    assert 1 in neighbors
    sigs = {r.vid: r.bucket for r in similarity.lsh_signatures(d, dim=4).collect()}
    assert sigs[0] == sigs[1]


def test_lsh_planes_sizing_rule():
    """Round-3 verdict #3: bits grow with log2(N/target_bucket), clamped."""
    from eva_opentargets_spark.operators.similarity import lsh_planes_for

    assert lsh_planes_for(50) == 6          # <= target -> floor
    assert lsh_planes_for(2_000) == 6       # fixture scale stays at 6
    assert lsh_planes_for(20_000) == 9
    assert lsh_planes_for(10**12) == 34     # design point
    assert lsh_planes_for(10**30) == 62     # clamped to signature width


def test_near_dups_derived_width_requires_estimate(spark):
    import pytest as _pytest

    from eva_opentargets_spark.operators.similarity import embedding_near_dups

    emb = spark.createDataFrame([(0, [1.0] * 4)], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError):
        embedding_near_dups(emb, n_planes=None, dim=4)


def test_lsh_config_for_joint_sizing():
    """Recall-targeted config: tables grow when recall demands more OR
    draws, shrink when the threshold cosine collides more per table."""
    from math import acos, pi

    from eva_opentargets_spark.operators.similarity import lsh_config_for

    planes, tables = lsh_config_for(2_000, 0.8, target_recall=0.9)
    assert planes == 6
    p1 = 1 - acos(0.8) / pi
    assert 1 - (1 - p1**planes) ** tables >= 0.9  # meets the target exactly
    assert 1 - (1 - p1**planes) ** (tables - 1) < 0.9  # and is minimal
    _, more = lsh_config_for(2_000, 0.8, target_recall=0.99)
    assert more > tables  # higher recall -> more tables
    _, fewer = lsh_config_for(2_000, 0.95, target_recall=0.9)
    assert fewer < tables  # easier threshold -> fewer tables
    _, capped = lsh_config_for(10**12, 0.4, target_recall=0.99)
    assert capped == 256  # far below the family sweet spot -> capped


def test_near_dups_auto_config_meets_recall(spark):
    """Fully-derived (n_planes=None, n_tables=None) wiring: on a seeded
    cluster corpus, candidate recall vs brute force at the threshold
    cosine meets the configured target (with slack for the fixed
    deterministic hyperplanes standing in for the theory's random draws)."""
    import math

    from eva_opentargets_spark.operators.similarity import embedding_near_dups

    def vec(seed, dim=16):
        import hashlib

        return [
            (int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8], 16) % 2000 - 1000)
            / 1000.0
            for d in range(dim)
        ]

    rows = []
    vid = 0
    for c in range(30):  # 30 clusters of 3 near-identical vectors
        base = vec(f"c{c}")
        for j in range(3):
            jit = vec(f"c{c}j{j}")
            rows.append((vid, [b + 0.08 * t for b, t in zip(base, jit)]))
            vid += 1
    d = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_dups(
        d, threshold=0.9, n_planes=None, n_tables=None, dim=16,
        n_vectors=len(rows), target_recall=0.95,
    )
    found = {(r.vec_a, r.vec_b) for r in got.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

    truth = {
        (i, j)
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if cos(rows[i][1], rows[j][1]) >= 0.9
    }
    assert truth and found <= truth  # no false positives (exact rescoring)
    assert len(found) / len(truth) >= 0.85  # recall near the 0.95 target


def test_project_embeddings_matches_numpy_and_preserves_distance(spark):
    """Components equal the numpy dot products exactly (at the rounding
    boundary); pairwise distances are preserved within JL tolerance on
    average."""
    import math

    import numpy as np

    from eva_opentargets_spark.operators.similarity import (
        project_embeddings,
        projection_signs,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 64).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]], 0) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = project_embeddings(df, out_dim=16, in_dim=64).collect()
    got = {}
    for r in out:
        got.setdefault(r.vec_id, {})[r.comp] = r.value
    S = np.array(projection_signs(16, 64))
    scale = 1.0 / math.sqrt(16)
    proj = vecs.astype("float64") @ S.T * scale
    for i in range(20):
        for c in range(16):
            assert got[i][c] == round(float(proj[i, c]), 6)
    # JL: mean pairwise squared-distance ratio close to 1
    ratios = []
    P = np.array([[got[i][c] for c in range(16)] for i in range(20)])
    for i in range(20):
        for j in range(i + 1, 20):
            d0 = float(np.sum((vecs[i].astype("float64") - vecs[j].astype("float64")) ** 2))
            d1 = float(np.sum((P[i] - P[j]) ** 2))
            ratios.append(d1 / d0)
    assert 0.8 < sum(ratios) / len(ratios) < 1.2
