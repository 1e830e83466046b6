"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — the exactness baseline. The query set is
    small and broadcast; the corpus side streams. Dot products are pure
    column math (zip_with + aggregate, JVM-side, codegen) — no UDF.
  * random-hyperplane LSH — the scale path: each vector gets a b-bit
    signature; only same-bucket pairs are scored. Hyperplane weights are
    derived deterministically from md5 so executors need no shared state
    and results are reproducible.

At 100 TB the brute-force path is a broadcast-nested-loop over a pruned
(two-column) scan; the LSH path turns it into an equi-join on bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k cosine neighbors for rows matching query_filter.

    Returns (query_id, neighbor_id, rank, cos_r). Scale shape: broadcast the
    (small) query side; the corpus side is scanned once with only
    (id, vector) columns read.
    """
    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e")
    )
    q = v.filter(query_filter(F.col("vid"))).select(
        F.col("vid").alias("query_id"), F.col("e").alias("qe")
    )
    pairs = (
        F.broadcast(q)
        .join(v.select(F.col("vid").alias("neighbor_id"), F.col("e").alias("ce")),
              F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_r"))
    )


def hyperplane_weight(plane: int, dim: int):
    """Deterministic pseudo-random weight in [-1, 1): derived from
    md5('<plane>:<dim>') — reproducible on any engine/executor."""
    h = F.conv(F.substring(F.md5(F.format_string("%d:%d", F.lit(plane), F.lit(dim))), 1, 8), 16, 10)
    return (h.cast("double") % 2000.0 - 1000.0) / 1000.0


def lsh_signatures(embeddings: DataFrame, n_planes: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int | None = None) -> DataFrame:
    """b-bit random-hyperplane signature per vector (sign of w_p . v).

    Pass `dim` explicitly in production plans — it is part of the table
    contract. The .first() fallback is a convenience for ad-hoc use only
    (it is a driver-side action inside an operator).
    """
    v = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e"))
    if dim is None:
        dim = len(v.select("e").first()["e"])
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("e"),
                F.array(*[hyperplane_weight(p, d) for d in range(dim)]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
    return v.select("vid", sig.alias("bucket"))


def lsh_topk(embeddings: DataFrame, query_filter, k: int = 5, n_planes: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs (equi-join on bucket).

    This is the ANN default at scale; cosine_topk is the small-N exactness
    verifier (round-1 verdict #6)."""
    v = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e"))
    sigs = lsh_signatures(embeddings, n_planes, id_col, vec_col, dim=dim)
    vs = v.join(sigs, "vid")
    q = vs.filter(query_filter(F.col("vid"))).select(
        F.col("vid").alias("query_id"), F.col("e").alias("qe"), F.col("bucket")
    )
    pairs = (
        F.broadcast(q)
        .join(
            vs.select(F.col("vid").alias("neighbor_id"), F.col("e").alias("ce"), "bucket"),
            on="bucket",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qe"), F.col("ce")) / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_r"))
    )
