"""SparkSession factory with scale-oriented defaults.

Defaults target the sandbox (local[N], 128 GiB) but every knob is the one
you would set on a 1000-executor cluster: AQE on (runtime re-plan +
skew-join splitting), modest advisory partition sizes, Arrow enabled for
the pandas-UDF mention/linking path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def estimated_input_splits(df) -> int:
    """Cheap estimate of how many scan tasks a DataFrame's input will
    produce: optimizer plan-size statistics / maxPartitionBytes. Used by
    the input-splits-vs-cores repartition guards (narrow in-row chains
    inherit input partitioning, which serializes them on the single-file
    bench corpus). Round-6: the old probe — `df.rdd.getNumPartitions()` —
    forced a full plan->RDD conversion costing ~160 ms of driver latency
    PER QUERY CONSTRUCTION; plan statistics answer the same coarse
    question (are there far fewer splits than cores?) in ~1 ms. For a
    parquet scan sizeInBytes is the exact file-size sum, so the estimate
    matches Spark's own split math to within openCost rounding; both
    over- and under-estimates only move a heuristic whose two outcomes
    are 'repartition to cores' vs 'inherit input layout'."""
    jqe = df._jdf.queryExecution()
    size = int(str(jqe.optimizedPlan().stats().sizeInBytes()))
    conf = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    unit = {"k": 1024, "m": 1024**2, "g": 1024**3, "b": 1}
    low = conf.strip().lower()
    mult, digits = 1, low
    for suffix in ("kb", "mb", "gb", "k", "m", "g", "b"):
        if low.endswith(suffix):
            mult, digits = unit[suffix[0]], low[: -len(suffix)]
            break
    max_bytes = max(1, int(digits) * mult)
    return max(1, (size + max_bytes - 1) // max_bytes)


def get_spark(
    app_name: str = "eva_opentargets_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size shuffles to DATA, not cores: start every shuffle fine-grained
        # and let AQE coalesce down. With initialPartitionNum = cores, the
        # round-5 10x scale run showed the minhash candidate distinct
        # spilling 7M-row partial-agg maps per partition (first run 139 s vs
        # 21 s at 256 partitions); small dictionary-scale shuffles coalesce
        # back to a handful of tasks, so the 1x suite measured neutral-to-
        # faster under the same setting (BENCH.md scale-curve section).
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_INITIAL_PARTITIONS", str(max(256, 8 * shuffle))),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-partition CACHED plans too (off by default): the round-6
        # lineage-held persists (bpe vocab, band/fingerprint tables, cascade
        # aggregates, propagation rounds) otherwise materialize at
        # initialPartitionNum granularity no matter how small the data is —
        # the 31-row BPE vocab cached as 256 partitions, so every merge-round
        # job scheduled 256 tasks to scan 31 rows. With the flag, AQE sizes
        # the cached plan by DATA (same advisory target as any shuffle), so
        # dictionary-scale caches collapse to 1 task and corpus-scale caches
        # keep their parallelism at any SF.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("SPARK_CACHED_PLAN_AQE", "true"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
