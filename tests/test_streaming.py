"""Structured Streaming ingest test: availableNow drain over a parquet
directory, windowed mention counts."""

from eva_opentargets_spark import fixtures, synth
from eva_opentargets_spark.streaming.ingest import run_available_now, stream_mention_counts


def test_stream_mention_counts(spark, tmp_path):
    transcripts, _ = synth.generate(spark, n_convs=5, turns_per_conv=4, seed=9)
    src = str(tmp_path / "stream_src")
    transcripts.write.parquet(src)

    sdf = stream_mention_counts(spark, src, fixtures.mention_vocabulary())
    q = run_available_now(sdf, "mention_counts", str(tmp_path / "ckpt"))
    out = spark.table("mention_counts")
    rows = {r.mention_norm: r.n for r in out.collect()}
    q.stop()

    # batch twin as oracle
    from eva_opentargets_spark.operators.mentions import extract_mentions

    batch = extract_mentions(transcripts, fixtures.mention_vocabulary(), drop_stoplisted=False)
    expected = {r.mention_norm: r.n for r in batch.groupBy("mention_norm").count().withColumnRenamed("count", "n").collect()}
    assert rows == expected
