"""spark-submit entry point (north_rule: launched by spark-submit --py-files).

Usage:
  spark-submit --py-files eva_opentargets_spark.zip \
      eva_opentargets_spark/job.py \
      --transcripts /path/to/transcripts_parquet_or_iceberg \
      --output /path/to/output \
      [--buckets 32] [--wave-size 8] [--sf-dir /root/testdata/sf0.001]

Runs the full KG-construction pipeline with per-partition checkpoint/resume
and writes triples + metrics + curation tables. If --transcripts is omitted,
transcripts are derived from the --sf-dir documents table (sandbox mode).
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import SparkSession

# absolute imports: spark-submit runs this file as a top-level script, with
# the package itself shipped via --py-files
from eva_opentargets_spark.pipeline import compute_metrics, run_pipeline
from eva_opentargets_spark.plans.checkpoint import run_with_checkpoint
from eva_opentargets_spark.sources.transcripts import derive_transcripts, read_transcripts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--wave-size", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("eva_opentargets_spark.job").getOrCreate()
    transcripts = (
        read_transcripts(spark, args.transcripts)
        if args.transcripts
        else derive_transcripts(spark, args.sf_dir)
    )

    run_id = args.run_id or f"run-{int(time.time())}"
    manifest = run_with_checkpoint(
        spark,
        transcripts,
        args.output,
        lambda t: run_pipeline(spark, t).triples,
        n_buckets=args.buckets,
        wave_size=args.wave_size,
    )

    res = run_pipeline(spark, transcripts)
    compute_metrics(spark, res, run_id).write.mode("overwrite").parquet(f"{args.output}/metrics")
    res.curation.write.mode("overwrite").parquet(f"{args.output}/curation")
    print(f"completed buckets: {sorted(manifest.completed())}")
    spark.stop()


if __name__ == "__main__":
    main()
