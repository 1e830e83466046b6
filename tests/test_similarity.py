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
