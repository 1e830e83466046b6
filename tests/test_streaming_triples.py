"""Streaming triple emission: output must equal the batch pipeline's triples,
and restarting the stream must not duplicate (exactly-once checkpointing)."""

from eva_opentargets_spark import synth
from eva_opentargets_spark.operators.triples import assert_no_duplicate_triples
from eva_opentargets_spark.pipeline import run_pipeline
from eva_opentargets_spark.streaming.ingest import stream_triples
from eva_opentargets_spark import fixtures


def test_stream_triples_matches_batch(spark, tmp_path):
    transcripts, _ = synth.generate(spark, n_convs=6, turns_per_conv=4, seed=21)
    src = str(tmp_path / "src")
    transcripts.write.parquet(src)

    batch = run_pipeline(spark, transcripts)
    links = batch.links

    out = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_triples(spark, src, links, fixtures.mention_vocabulary(), out, ckpt)
    q.awaitTermination()

    got = spark.read.parquet(out)
    expected = batch.triples
    assert got.count() == expected.count()
    keys = ["subj", "pred", "obj"]
    assert got.select(*keys).exceptAll(expected.select(*keys)).count() == 0
    assert_no_duplicate_triples(got)

    # restart with no new input: exactly-once -> nothing appended
    q2 = stream_triples(spark, src, links, fixtures.mention_vocabulary(), out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == expected.count()
