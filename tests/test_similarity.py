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
    got = similarity.lsh_topk(d, lambda vid: vid == 0, k=2).collect()
    neighbors = {r.neighbor_id for r in got}
    assert 1 in neighbors
    sigs = {r.vid: r.bucket for r in similarity.lsh_signatures(d).collect()}
    assert sigs[0] == sigs[1]
