"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": "headline_suite_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

--scaling mode: run the SAME flagship job (KG pipeline over a replicated
transcript corpus) at two parallelism levels (local[2] vs local[8] — the
sandbox stand-in for N vs 4N executors per the driver instruction; see
BENCH.md for why not local[32] on this shared host) and report throughput at both plus scaling efficiency
(BASELINE.json north_rule target >= 0.8). Results are appended to BENCH.md.

Timing uses a noop-format write so every output column is materialized
(a bare count() would let Catalyst prune the plan).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "kg_mentions",  # first: absorbs session warmup (codegen, python workers)
    "kg_triples",
    "kg_links",
    "kg_evidence",  # round 2: the full 3-way evidence product
    "kg_gauntlet",  # round 2: one-pass failure gauntlet
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",  # round 2
    "ann_cosine_topk",
    "ann_lsh_topk",  # round 2: the ANN scale path
    "ann_ivf_topk",  # round 3: inverted-file ANN
    "dedup_embedding_pairs",  # round 3: embedding-cosine near-dup LSH
    "corpus_curate",  # round 4: full dedup+quality funnel (pairs->clusters->gate)
    "ann_ivf_kmeans_topk",  # round 4: IVF over the Lloyd-refined quantizer
    "corpus_bpe_merges",  # round 5: BPE merge training (driver loop, vocab-grain rounds)
    "dedup_winnow_pairs",  # round 5: winnowing substring-overlap pairs
    "corpus_lm_score",  # round 5: unigram-LM scoring (two token-grain shuffles)
    "events_sessionize",
    "tpch_q1_pricing",
]

REPLICATE = 20  # scaling-corpus multiplier over sf0.1 transcripts


def _materialize(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _timed(make_df) -> float:
    """Time CONSTRUCTION + materialization. Queries with driver-loop stages
    (corpus_bpe_merges' per-round collects, kmeans' iterations) do real
    work while BUILDING the frame; timing only the final write (the
    round-5 scale harness's first mistake) misses it entirely."""
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def replicated_transcripts(spark, sf_dir: str, factor: int = REPLICATE):
    """Scale-up corpus: replicate the derived transcripts `factor` times with
    salted conv_ids (same text distribution, factor x rows)."""
    from pyspark.sql import functions as F

    from eva_opentargets_spark.sources.transcripts import derive_transcripts

    t = derive_transcripts(spark, sf_dir)
    # repartition on conv_id: the testdata is a single parquet file (1-2 input
    # splits), which would serialize the extraction UDF onto 2 cores. In
    # production the transcript table is conv_id-bucketed at write time
    # (sources.transcripts.write_transcripts) so this shuffle doesn't exist.
    # Partition count is CORPUS-sized (~500k turns each), not core-sized: a
    # real cluster job sees the same input splits at every cluster size, and
    # core-derived counts gave the low-parallelism run pathological multi-GB
    # partitions (GC/cache-block blowup that poisoned the N-vs-4N comparison).
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    parts = max(spark.sparkContext.defaultParallelism * 2, (n_docs * factor) // 500_000)
    return (
        t.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        .withColumn("conv_id", F.concat_ws("_", "conv_id", F.col("rep").cast("string")))
        .drop("rep")
        .repartition(parts, "conv_id")
    )


def flagship_turns_per_sec(
    spark, sf_dir: str, factor: int = REPLICATE, runs: int = 1,
    persist_extracted: bool = True,
) -> dict:
    """The scaling-mode workload: full KG pipeline on the replicated corpus.

    With runs > 1, reports the BEST run — this sandbox shares its host with
    noisy neighbors (load average ~5-18 from outside the container), and min
    over repeats is the standard way to measure the engine, not the noise.
    Each run's pipeline caches are released before the next (a leaked
    extracted-cache copy per run distorts memory-sensitive comparisons).

    """
    from eva_opentargets_spark.pipeline import run_pipeline

    transcripts = replicated_transcripts(spark, sf_dir, factor).persist()
    n_turns = transcripts.count()  # also warms the cache out of the timing
    secs = None
    for _ in range(runs):
        res = run_pipeline(spark, transcripts, persist_extracted=persist_extracted)
        sec = _materialize(res.triples)
        res.unpersist()
        secs = sec if secs is None else min(secs, sec)
    transcripts.unpersist()
    return {"n_turns": n_turns, "sec": round(secs, 3), "turns_per_sec": round(n_turns / secs, 1)}


BEST_PATH = os.path.join(REPO, "BENCH_BEST.json")
REGRESSION_FACTOR = 1.3  # flag any query >1.3x its recorded best (same sf+cpus)

# Algorithm-version tags (round-4 ADVICE #2): bump a query's version when its
# ALGORITHM or config deliberately changes, so the regression guard starts a
# fresh best-entry under "<query>#v<N>" instead of permanently flagging the
# rework against minima recorded for the superseded algorithm (the round-4
# pigeonhole-SimHash rework had to hand-edit BENCH_BEST.json for exactly this).
QUERY_VERSIONS: dict[str, int] = {
    # v2 = the construction-inclusive timing protocol (round 5): _timed now
    # counts DataFrame construction — real driver latency (py4j plan
    # building, driver-loop jobs) the old write-only protocol missed. Every
    # best recorded BEFORE that change is systematically low by its
    # construction time, so those queries restart under v2; queries whose
    # v1 best was already recorded under the new protocol
    # (corpus_bpe_merges, corpus_lm_score, dedup_winnow_pairs) keep v1.
    "kg_mentions": 2,
    "kg_triples": 2,
    "kg_links": 2,
    "kg_evidence": 2,
    "kg_gauntlet": 2,
    "dedup_minhash_pairs": 2,
    "dedup_ngram_jaccard": 2,
    "dedup_simhash_pairs": 2,
    "ann_cosine_topk": 2,
    "ann_lsh_topk": 2,
    "ann_ivf_topk": 2,
    "dedup_embedding_pairs": 2,
    "corpus_curate": 2,
    "ann_ivf_kmeans_topk": 2,
    "events_sessionize": 2,
    "tpch_q1_pricing": 2,
}


def _vkey(q: str) -> str:
    v = QUERY_VERSIONS.get(q, 1)
    return q if v == 1 else f"{q}#v{v}"


def _load_best() -> dict:
    try:
        with open(BEST_PATH) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _regression_guard(sf: str, cpus: str, timings: dict) -> list[str]:
    """Min-of-repeats regression guard (round-2 verdict: a single contended
    run is not adjudicable). Compares each query to its best recorded time
    at the same (sf, cpus), flags >1.3x slowdowns, and folds new minima back
    into BENCH_BEST.json so the baseline is the min over ALL runs ever."""
    best = _load_best()
    key = f"{sf}:{cpus}"
    prior = best.get(key, {})
    flagged = [
        q
        for q, sec in timings.items()
        if _vkey(q) in prior and sec > REGRESSION_FACTOR * prior[_vkey(q)]
    ]
    # merge, don't replace: a partial run (or a renamed HEADLINE entry) must
    # not erase recorded minima for queries it didn't time
    best[key] = {
        **prior,
        **{_vkey(q): min(sec, prior.get(_vkey(q), sec)) for q, sec in timings.items()},
    }
    try:
        with open(BEST_PATH, "w") as fh:
            json.dump(best, fh, indent=1, sort_keys=True)
    except OSError:
        pass
    return flagged


def run_headline(sf_dir: str, cpus: str) -> dict:
    from eva_opentargets_spark.queries import QUERIES
    from eva_opentargets_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    # min-of-repeats: this host is shared (outside load average 5-18), so a
    # single sample conflates engine time with neighbor noise; the min over
    # repeats is the engine's time (see BENCH.md measurement protocol).
    repeats = int(os.environ.get("SPARK_BENCH_REPEATS", "2"))
    timings = {}
    for r in range(repeats):
        for name in HEADLINE:
            sec = round(_timed(lambda: QUERIES[name](spark, sf_dir)), 3)
            timings[name] = min(sec, timings.get(name, sec))
    # the flagship gets the same min-of-N treatment as every suite query
    # (round-3 verdict #9: a single contended sample needed manual
    # adjudication between sessions)
    flag = flagship_turns_per_sec(spark, sf_dir, runs=repeats)
    spark.stop()
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns_per_sec": flag["turns_per_sec"],
        "flagship": flag,
        "cpus": int(cpus),
        "repeats": repeats,
        "regressions": _regression_guard(sf, cpus, timings),
    }


SCALING_REPLICATE = 400  # 2M-turn corpus. Every timed run is COLD: the
# pipeline's extraction cache is dropped between runs (res.unpersist), so
# the measurement includes the extraction pass — round-1/early-round-2
# "min of repeats" silently reused Spark's logical-plan cache across runs
# and timed a WARM pipeline (extraction excluded), inflating throughput at
# both levels. With cold runs the per-run serial floor (driver round trips
# for the ~12 dictionary-scale broadcast-build jobs, python worker
# startup) stays small relative to the UDF-bound parallel work. The
# round-1 spill artifact (local[2] at 8M spilling, deflating the baseline
# and pushing "efficiency" over 1.0) is fixed at the source: scaling
# children get a 48g heap (SPARK_DRIVER_MEMORY below) and the corpus is
# laid out in ~500k-turn partitions at BOTH levels (replicated_transcripts).
# The linking cascade is O(dictionary), not O(corpus) — at the target
# 10^12-turn scale its constant cost vanishes entirely.


def run_scaling_child(sf_dir: str, cpus: str) -> None:
    from eva_opentargets_spark.session import get_spark

    spark = get_spark(app_name=f"scale{cpus}", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    runs = int(os.environ.get("SPARK_SCALING_RUNS", "2"))
    out = flagship_turns_per_sec(
        spark, sf_dir, factor=SCALING_REPLICATE, runs=runs, persist_extracted=False
    )
    spark.stop()
    print("SCALING_RESULT " + json.dumps({"cpus": int(cpus), **out}))


def run_scaling(sf_dir: str, low: int = 2, high: int = 8) -> dict:
    """N vs 4N. Defaults to local[2]/local[8]: this sandbox's host is shared
    (load average ~18 from outside the container), so local[32] never gets
    32 real cores; 2 vs 8 measures the engine, not the neighbors."""
    results = {}
    for cpus in (low, high):
        # SPARK_SCALING_PIN=1: pin the child's WHOLE process tree (JVM and
        # its Arrow python workers inherit the affinity mask) to exactly
        # `cpus` cores via taskset — the sandbox stand-in for cgroup-pinned
        # executors. Without it, local[N] caps only JVM task threads and
        # python UDF workers overlap on free cores (measured ~318% CPU at
        # local[2]), inflating the low-parallelism baseline on idle hosts
        # (see BENCH.md "adjudication of the N-vs-4N denominator").
        cmd = [sys.executable, os.path.abspath(__file__), "--scaling-child", str(cpus)]
        if os.environ.get("SPARK_SCALING_PIN") == "1":
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
                 # ample heap so neither parallelism level spills its caches
                 # (the round-1 >1.0 "efficiency" was a local[2] spill artifact)
                 "SPARK_DRIVER_MEMORY": os.environ.get("SPARK_SCALING_MEMORY", "48g")},
            capture_output=True,
            text=True,
            timeout=2700,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("SCALING_RESULT "):
                results[cpus] = json.loads(line[len("SCALING_RESULT "):])
        if cpus not in results:
            raise RuntimeError(f"scaling child {cpus} failed: {proc.stderr[-2000:]}")
    tl, th = results[low]["turns_per_sec"], results[high]["turns_per_sec"]
    efficiency = th / (tl * (high / low))
    summary = {
        "low": results[low],
        "high": results[high],
        "speedup": round(th / tl, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    _append_bench_md(sf_dir, summary)
    return summary


def _append_bench_md(sf_dir: str, s: dict) -> None:
    lines = [
        "",
        f"## Scaling run (sf_dir={sf_dir}, corpus={s['low']['n_turns']} turns)",
        "",
        "| parallelism | wall sec | turns/sec |",
        "|---|---|---|",
        f"| local[{s['low']['cpus']}] (N) | {s['low']['sec']} | {s['low']['turns_per_sec']} |",
        f"| local[{s['high']['cpus']}] (4N) | {s['high']['sec']} | {s['high']['turns_per_sec']} |",
        "",
        f"speedup N->4N: **{s['speedup']}x**; scaling efficiency "
        f"(throughput_4N / (4 x throughput_N)): **{s['scaling_efficiency']}** "
        "(target >= 0.8, BASELINE.json north_rule)",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write("\n".join(lines))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--scaling-child" in sys.argv:
        run_scaling_child(sf_dir, sys.argv[sys.argv.index("--scaling-child") + 1])
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
        return
    print(json.dumps(run_headline(sf_dir, cpus)))


if __name__ == "__main__":
    main()
