"""Driver-orchestrated Lloyd k-means over an embedding column — the
iterative-algorithm pattern (same shape as the xref BFS loop: a bounded
driver loop over dictionary-scale state, corpus-scale work per round as one
shuffle-light job).

Used as the production-quality IVF coarse quantizer (similarity.ivf_cells
uses first-K seeding for oracle determinism; this module refines those same
seeds). Each iteration:
  assignment: broadcast the K centroids, per-vector argmin squared-L2
              (one narrow pass, W5 tie-break on centroid id)
  update:     groupBy(cell) with one SUM per dimension (dim scalar
              aggregates) — partial (map-side) aggregation makes the
              shuffle carry k x n_partitions x dim doubles, never vectors;
              a posexplode would shuffle dim x N rows and a collect_list
              would buffer whole cells in memory.

Centroid state lives on the driver (K x dim floats — tiny); convergence is
measured by max centroid shift.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _cents_sql(centroids) -> str | None:
    """The centroid list as ONE SQL array<array<double>> literal. Python
    repr round-trips doubles exactly and the D suffix keeps the parser in
    DoubleType, so the literal carries the same values the lambda-built
    form would. Returns None when any value is non-finite (SQL literals
    can't spell NaN/Infinity) — callers fall back to the per-centroid
    expression build."""
    if not all(math.isfinite(x) for c in centroids for x in c):
        return None
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids
        )
        + ")"
    )


def _sq_dist(a, centroid: list[float]):
    # one expression parse per centroid, not dim F.lit py4j calls
    # (similarity.lit_double_array: plan construction is driver latency)
    from .similarity import lit_double_array

    c = lit_double_array(float(x) for x in centroid)
    return F.aggregate(
        F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_cells(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, cell): argmin squared-L2 over the broadcast centroid list,
    lowest centroid id on ties — one narrow pass, no shuffle."""
    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e")
    )
    cs = _cents_sql(centroids)
    if cs is not None:
        # ONE parsed expression for the whole distance array (round 6): the
        # per-centroid _sq_dist build costs 2 Python-lambda conversions per
        # centroid PER CALL — pure py4j driver latency inside the Lloyd
        # loop, where this runs every iteration with fresh centroid
        # literals. Same ZipWith/Aggregate ops in the same order, so the
        # floating-point result is bit-identical (pinned by
        # tests/test_kmeans equality case).
        dists = F.expr(
            f"transform({cs}, c -> aggregate(zip_with(e, c, (x, y) -> (x-y)*(x-y)),"
            " 0.0D, (acc, v) -> acc + v))"
        )
    else:
        dists = F.array(*[_sq_dist(F.col("e"), c) for c in centroids])
    # argmin with lowest-index tie-break: array_position finds the FIRST
    # occurrence of the minimum
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return v.select("vid", "e", cell.alias("cell"))


def kmeans(
    embeddings: DataFrame,
    k: int = 16,
    max_iters: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], int]:
    """Lloyd iterations until max centroid shift < tol or max_iters.
    Seeds = the first k vectors by id (deterministic, same seeding as
    similarity.ivf_cells). Returns (centroids, iterations_run).

    Per iteration: ONE job — assignment is in-row column math against
    broadcast centroids; the update is a single groupBy(cell) with `dim`
    scalar SUMs (map-side partial aggregation, shuffle of
    k x n_partitions x dim doubles)."""
    # Persist the (vid, e) projection for the loop: seeds + every Lloyd
    # iteration re-scans it (round 6; cast-from-parquet paid per job
    # otherwise). CacheManager dedupes identical plans across invocations,
    # so repeated kmeans() calls share one entry; K x dim doubles per row,
    # MEMORY_AND_DISK.
    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e")
    ).persist()
    seed_rows = v.orderBy("vid").limit(k).collect()
    centroids = [list(r["e"]) for r in seed_rows]
    dim = len(centroids[0])
    iters = 0
    # ONE parsed expression for all dim per-dimension sums (array of
    # aggregates): the former dim separate F.sum(F.element_at(...)) columns
    # cost ~5 py4j round trips each PER ITERATION — pure driver latency in
    # the Lloyd loop (guide §7.3). e[d] is 0-based GetArrayItem == the old
    # element_at(e, d+1); the shuffle still carries dim scalar partial sums.
    sums = F.expr("array(" + ",".join(f"sum(e[{d}])" for d in range(dim)) + ")")
    for _ in range(max_iters):
        iters += 1
        assigned = assign_cells(embeddings, centroids, id_col, vec_col)
        rows = (
            assigned.groupBy("cell")
            .agg(sums.alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_centroids = list(centroids)  # empty cells keep their centroid
        for r in rows:
            new_centroids[r["cell"]] = [r["s"][d] / r["n"] for d in range(dim)]
        shift = max(
            abs(a - b) for nc, oc in zip(new_centroids, centroids) for a, b in zip(nc, oc)
        )
        centroids = new_centroids
        if shift < tol:
            break
    return centroids, iters


def inertia(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the assigned centroid (the quantity
    Lloyd iterations are guaranteed to not increase)."""
    assigned = assign_cells(embeddings, centroids, id_col, vec_col)
    dists = F.array(*[_sq_dist(F.col("e"), c) for c in centroids])
    return (
        assigned.select(F.element_at(dists, F.col("cell") + 1).alias("d"))
        .agg(F.sum("d"))
        .first()[0]
    )


def ivf_kmeans_topk(
    embeddings: DataFrame,
    query_filter,
    k: int = 5,
    n_cells: int = 4,
    n_probe: int = 2,
    max_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with the Lloyd-REFINED coarse quantizer — the production
    composition of kmeans() and the inverted-file search (similarity.
    ivf_topk uses raw first-K seeds; this refines them first, giving
    tighter cells and better probe recall at the same n_probe).

    Plan shape: centroids are K x dim driver state (the kmeans loop's
    output); assignment AND probe selection are in-row column math against
    the broadcast centroid literals — the per-query probe list is an
    array_sort over the (distance, cell) struct array, sliced to n_probe
    and exploded, so probe ranking costs no shuffle and ties break on the
    lowest cell id exactly like assignment. Candidate fetch is the one
    shuffle: an equi-join on cell. Oracle: the ann_ivf_kmeans_topk DuckDB
    twin unrolls the same iterations (oracle.py)."""
    from pyspark.sql import Window

    centroids, _ = kmeans(embeddings, k=n_cells, max_iters=max_iters,
                          id_col=id_col, vec_col=vec_col)
    v = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("e")
    )
    cs = _cents_sql(centroids)
    if cs is not None:
        # same single-parse discipline as assign_cells: transform's index
        # lambda gives the 0-based cell id the enumerate() literal carried
        ranked_cells = F.expr(
            f"array_sort(transform({cs}, (c, i) -> struct("
            "aggregate(zip_with(e, c, (x, y) -> (x-y)*(x-y)), 0.0D,"
            " (acc, v) -> acc + v) AS d, i AS cell)))"
        )
    else:
        ranked_cells = F.array_sort(
            F.array(
                *[
                    F.struct(_sq_dist(F.col("e"), c).alias("d"), F.lit(i).alias("cell"))
                    for i, c in enumerate(centroids)
                ]
            )
        )
    def norm(col):
        return F.sqrt(
            F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )

    # norms are computed ONCE per vector/query BEFORE the join — inside the
    # join they would re-run a dim-length fold per candidate PAIR
    assigned = v.select(
        "vid", "e", norm(F.col("e")).alias("nrm"), ranked_cells[0]["cell"].alias("cell")
    )
    probes = (
        v.filter(query_filter(F.col("vid")))
        .select(
            F.col("vid").alias("query_id"),
            F.col("e").alias("qe"),
            norm(F.col("e")).alias("qnrm"),
            F.explode(F.slice(ranked_cells, 1, n_probe)).alias("pc"),
        )
        .select("query_id", "qe", "qnrm", F.col("pc.cell").alias("cell"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    pairs = (
        F.broadcast(probes)
        .join(
            assigned.select(
                F.col("vid").alias("neighbor_id"), F.col("e").alias("ce"),
                F.col("nrm").alias("cnrm"), "cell",
            ),
            "cell",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", (dot / (F.col("qnrm") * F.col("cnrm"))).alias("cos"))
    )  # no pair dedup needed: each neighbor lives in exactly ONE cell
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos_r"))
    )
