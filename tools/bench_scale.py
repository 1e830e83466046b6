"""10x-corpus scale-proof harness (round-4 judge, next-round #1).

Everything is green and plan-audited at sf0.1; the engine's stated target is
100 TB. This harness measures the HEADLINE suite at a 10x-replicated corpus
and reports per-query sf0.1 -> x10 time ratios: linear work + a shuffle
constant should land at <= ~12x, and anything super-linear names its cause.

Replica construction (the point is to scale INPUT volume by 10 while keeping
per-query OUTPUT ~linear — verbatim replication would give every doc 9 exact
twins and multiply pair-query outputs ~x100, measuring output explosion
rather than engine scaling):

  * <out>/kg/documents.parquet — 10 VERBATIM replicas with salted doc_ids.
    Duplicate text across replicas is the realistic kg shape: the A1
    distinct-mention pre-aggregation is precisely what absorbs it, so the
    kg_* queries scale over it honestly.
  * <out>/data/documents.parquet — distribution-preserving replicas: every
    token is suffixed "_r<rep>", so within-replica similarity structure is
    IDENTICAL to the original corpus (md5-rerandomized) while cross-replica
    token sets are disjoint -> near-dup pair counts grow ~x10, not ~x100.
  * <out>/data/embeddings.parquet — per-replica dimension ROTATION: rotation
    preserves all within-replica pairwise cosines exactly; cross-replica
    cosines are ~random (below the 0.4 near-dup band).
  * <out>/data/events.parquet — user_ids offset per replica (10x users,
    same per-user session shape).
  * <out>/data/lineitem.parquet — plain 10x union (group-by/sum is
    output-stable: still 4 groups).

Usage:
  python tools/bench_scale.py            # build (if absent) + run both scales
  python tools/bench_scale.py --rebuild  # force replica rebuild
  SPARK_BENCH_REPEATS=2 (default)        # min-of-repeats per scale
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FACTOR = 10
OUT = os.environ.get("SPARK_SCALE_OUT", "/tmp/sf_scale_x10")
DIM = 64  # embeddings dimensionality (table contract, see queries.py)


def build_replicas(spark, sf_dir: str, out: str) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(out, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    # offset a multiple of 100 so derive_transcripts' doc_id % 100
    # conversation assignment keeps its distribution in every replica
    off = ((n_docs + 99) // 100) * 100
    rep = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("rep")

    base = docs.select("*", rep).withColumn(
        "doc_id", F.col("doc_id") + F.col("rep") * off
    )
    base.drop("rep").repartition(32, "doc_id").write.mode("overwrite").parquet(
        f"{out}/kg/documents.parquet"
    )
    perturbed = base.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("_r"), F.col("rep").cast("string")),
            ),
        ),
    )
    perturbed.drop("rep").repartition(32, "doc_id").write.mode("overwrite").parquet(
        f"{out}/data/documents.parquet"
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    # rep-0 keeps vec_ids 0..N-1 verbatim so the `vid < 10` query set and
    # the `vid < n_cells` quantizer seeds are unchanged vectors
    rot = F.when(
        F.col("rep") == 0, F.col("embedding")
    ).otherwise(
        F.concat(
            F.slice(F.col("embedding"), F.col("rep") + 1, F.lit(DIM) - F.col("rep")),
            F.slice(F.col("embedding"), F.lit(1), F.col("rep")),
        )
    )
    (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n_vec)
        .withColumn("embedding", rot)
        .drop("rep")
        .repartition(32, "vec_id")
        .write.mode("overwrite")
        .parquet(f"{out}/data/embeddings.parquet")
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uoff = ev.agg(F.max("user_id")).first()[0] + 1
    eoff = ev.agg(F.max("event_id")).first()[0] + 1
    (
        ev.select("*", rep)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * uoff)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * eoff)
        .drop("rep")
        .repartition(32, "user_id")
        .write.mode("overwrite")
        .parquet(f"{out}/data/events.parquet")
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        li.select("*", rep)
        .drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/data/lineitem.parquet")
    )


def run(rebuild: bool = False) -> dict:
    from bench import HEADLINE, _timed
    from eva_opentargets_spark.queries import QUERIES
    from eva_opentargets_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("SPARK_BENCH_REPEATS", "2"))
    spark = get_spark(
        app_name="bench_scale", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    if rebuild or not os.path.isdir(f"{OUT}/data"):
        t0 = time.time()
        build_replicas(spark, sf_dir, OUT)
        print(f"built {FACTOR}x replicas at {OUT} in {time.time() - t0:.1f}s",
              file=sys.stderr)

    def scaled_dir(name: str) -> str:
        return f"{OUT}/kg" if name.startswith("kg_") else f"{OUT}/data"

    # INTERLEAVED measurement: each repeat times a query at 1x and then
    # immediately at 10x, so shared-host contention lands on both sides of
    # the ratio in the same minute window — min-of-repeats absolute times
    # can still be inflated by a fully-contended session, but the RATIO
    # (the quantity this harness exists to report) stays meaningful. (The
    # first two round-5 runs measured back-to-back SUITES and each had one
    # phase polluted by load 11-18 neighbors, producing 14x 'ratios' that
    # re-measured at 1.3x quiet.)
    base: dict[str, float] = {}
    scaled: dict[str, float] = {}
    for _ in range(repeats):
        for name in HEADLINE:
            b = round(_timed(lambda: QUERIES[name](spark, sf_dir)), 3)
            s = round(_timed(lambda: QUERIES[name](spark, scaled_dir(name))), 3)
            base[name] = min(b, base.get(name, b))
            scaled[name] = min(s, scaled.get(name, s))
    spark.stop()
    ratios = {
        q: round(scaled[q] / base[q], 2) if base[q] > 0 else None for q in base
    }
    result = {
        "metric": "scale_curve_x10",
        "factor": FACTOR,
        "repeats": repeats,
        "base_sec": base,
        "scaled_sec": scaled,
        "ratios": ratios,
        "suite_ratio": round(sum(scaled.values()) / sum(base.values()), 2),
    }
    _append_bench_md(result)
    return result


def _append_bench_md(r: dict) -> None:
    lines = [
        "",
        f"## Scale curve: sf0.1 -> x{r['factor']} replicate "
        f"(min of {r['repeats']}, local[32])",
        "",
        "| query | 1x sec | 10x sec | ratio |",
        "|---|---|---|---|",
    ]
    for q, ratio in sorted(r["ratios"].items(), key=lambda kv: -(kv[1] or 0)):
        lines.append(
            f"| {q} | {r['base_sec'][q]} | {r['scaled_sec'][q]} | {ratio}x |"
        )
    lines += [
        "",
        f"suite total ratio: **{r['suite_ratio']}x** "
        "(linear + shuffle constant target: <= ~12x per query)",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    print(json.dumps(run(rebuild="--rebuild" in sys.argv)))
