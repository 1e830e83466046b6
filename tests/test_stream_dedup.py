"""Streaming exact-dedup tests: first-wins emission within a micro-batch,
suppression across query restarts via checkpointed state, and the
watermark-horizon variant's documented eviction trade-off."""

import datetime as dt

from eva_opentargets_spark.streaming.ingest import stream_dedup_docs

SCHEMA = "doc_id long, text string"
TS_SCHEMA = "doc_id long, text string, ts timestamp"


def _write(spark, path, rows, schema=SCHEMA):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, sdf, ckpt, out_path):
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_path)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def test_stream_dedup_within_batch_and_across_restart(spark, tmp_path):
    data = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    # file 1: 'alpha text' appears twice IN the same micro-batch
    _write(spark, data, [(1, "alpha text"), (2, "beta text"), (3, "alpha text")])
    out1 = _drain(spark, stream_dedup_docs(spark, data, schema=SCHEMA), ckpt, sink)
    texts1 = sorted(r.text for r in out1.collect())
    assert texts1 == ["alpha text", "beta text"]

    # file 2, drained by a RESTARTED query on the same checkpoint:
    # - exact dup of file-1 content        -> dropped (state survived restart)
    # - whitespace/case variant of 'beta'  -> dropped (fingerprint-normalized)
    # - genuinely new content              -> emitted
    _write(spark, data, [(4, "alpha text"), (5, "  Beta   TEXT "), (6, "gamma text")])
    out2 = _drain(spark, stream_dedup_docs(spark, data, schema=SCHEMA), ckpt, sink)
    texts2 = sorted(r.text for r in out2.collect())
    assert texts2 == ["alpha text", "beta text", "gamma text"]

    # fingerprints in the output are unique (the operator's contract)
    assert out2.select("fingerprint").distinct().count() == 3


def test_stream_dedup_matches_batch_twin(spark, tmp_path):
    """One-shot drain emits exactly one doc per fingerprint group of the
    batch exact_duplicates operator."""
    from eva_opentargets_spark.operators.dedup import exact_duplicates

    data = str(tmp_path / "docs2")
    rows = [(i, f"doc {i % 7} body") for i in range(40)]
    _write(spark, data, rows)
    out = _drain(
        spark,
        stream_dedup_docs(spark, data, schema=SCHEMA),
        str(tmp_path / "ck2"),
        str(tmp_path / "out2"),
    )
    batch = exact_duplicates(spark.read.parquet(data))
    assert out.count() == batch.count() == 7
    got = {r.fingerprint for r in out.select("fingerprint").collect()}
    want = {r.fingerprint for r in batch.select("fingerprint").collect()}
    assert got == want


def _t(minute):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


def test_stream_dedup_within_watermark_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark: dups inside the horizon are dropped;
    once the watermark passes a key's expiry its state is evicted, so a
    much-later twin of the same content is re-emitted — the bounded-state
    trade-off the docstring promises (batch dedup_exact catches those)."""
    data = str(tmp_path / "docs3")
    ckpt = str(tmp_path / "ck3")
    sink = str(tmp_path / "out3")

    def sdf():
        return stream_dedup_docs(
            spark, data, schema=TS_SCHEMA, event_time_col="ts", watermark="1 hour"
        )

    # drain 1: two docs; max event time 10:00 -> watermark becomes 09:00
    _write(spark, data, [(1, "alpha text", _t(0)), (2, "beta text", _t(600))], TS_SCHEMA)
    out1 = _drain(spark, sdf(), ckpt, sink)
    assert sorted(r.text for r in out1.collect()) == ["alpha text", "beta text"]

    # drain 2: beta dup at 09:30 is INSIDE beta's live horizon
    # (beta state expires when watermark passes 11:00) -> dropped;
    # new gamma at 20:00 emitted and advances the watermark to 19:00.
    _write(spark, data, [(3, "beta text", _t(570)), (4, "gamma text", _t(1200))], TS_SCHEMA)
    out2 = _drain(spark, sdf(), ckpt, sink)
    assert sorted(r.text for r in out2.collect()) == [
        "alpha text", "beta text", "gamma text",
    ]

    # drain 3: beta's state was evicted (watermark 19:00 > 11:00 expiry),
    # so a fresh beta twin at 20:30 is re-emitted.
    _write(spark, data, [(5, "beta text", _t(1230))], TS_SCHEMA)
    out3 = _drain(spark, sdf(), ckpt, sink)
    assert sorted(r.text for r in out3.collect()) == [
        "alpha text", "beta text", "beta text", "gamma text",
    ]


def test_stream_near_dup_candidates_matches_batch(spark, tmp_path):
    """Stream-static band probe finds exactly the new-vs-corpus pairs the
    batch incremental operator finds (new-vs-new is out of scope for the
    stream by design), across two micro-batch drains."""
    from eva_opentargets_spark.operators.dedup import (
        band_table,
        incremental_minhash_pairs,
    )
    from eva_opentargets_spark.streaming.ingest import stream_near_dup_candidates

    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus_rows = [
        (i, base if i % 3 == 0 else f"corpus doc {i} with its own words {i}")
        for i in range(30)
    ]
    corpus = spark.createDataFrame(corpus_rows, SCHEMA)
    bands = band_table(corpus)

    data = str(tmp_path / "newdocs")
    ckpt = str(tmp_path / "ckpt_nd")
    sink = str(tmp_path / "out_nd")

    # batch 1: one near-dup of the corpus template, one novel doc
    new1 = [(100, base + " iota"), (101, "novel content nothing shared one")]
    _write(spark, data, new1)
    sdf = stream_near_dup_candidates(spark, data, bands, schema=SCHEMA)
    out1 = _drain(spark, sdf, ckpt, sink)
    got1 = {(r.doc_id, r.corpus_doc_id) for r in out1.collect()}
    assert got1 and all(d == 100 for d, _ in got1)

    # batch 2 (restarted query, same checkpoint): another template twin
    new2 = [(102, base), (103, "still novel unrelated text two")]
    _write(spark, data, new2)
    out2 = _drain(spark, stream_near_dup_candidates(spark, data, bands, schema=SCHEMA), ckpt, sink)
    got = {(r.doc_id, r.corpus_doc_id) for r in out2.collect()}

    # batch twin: incremental pairs over the SAME new docs, restricted to
    # new-vs-corpus (stream scope), normalized to (new, corpus) orientation
    new_ids = {100, 101, 102, 103}
    batch_pairs = incremental_minhash_pairs(
        spark.createDataFrame(new1 + new2, SCHEMA), corpus
    ).collect()
    want = {
        (b.doc_a, b.doc_b) if b.doc_a in new_ids else (b.doc_b, b.doc_a)
        for b in batch_pairs
        if (b.doc_a in new_ids) != (b.doc_b in new_ids)  # new-vs-corpus only
    }
    assert got == {(n, c) for n, c in want}


def test_stream_near_dup_with_update_catches_cross_batch_twins(spark, tmp_path):
    """The foreachBatch variant grows the band table per micro-batch, so a
    doc in batch 2 pairs with its twin from batch 1 — the case the plain
    stream-static probe misses by design."""
    from eva_opentargets_spark.streaming.ingest import stream_near_dup_with_update

    data = str(tmp_path / "docs_fb")
    bands = str(tmp_path / "bands_fb")
    pairs = str(tmp_path / "pairs_fb")
    ckpt = str(tmp_path / "ck_fb")
    base = "alpha beta gamma delta epsilon zeta eta theta"

    def drain():
        q = stream_near_dup_with_update(spark, data, bands, pairs, ckpt, schema=SCHEMA)
        q.awaitTermination()

    # batch 1: two unrelated docs seed the band table; no pairs emitted
    _write(spark, data, [(1, base), (2, "wholly different content one two")])
    drain()
    assert spark.read.parquet(bands).select("doc_id").distinct().count() == 2
    import os
    assert not os.path.exists(pairs)  # no corpus existed at batch-1 probe time

    # batch 2: a twin of doc 1 and a fresh doc -> exactly the cross-batch pair
    _write(spark, data, [(3, base + " iota"), (4, "more novel text here now")])
    drain()
    got = {(r.doc_id, r.corpus_doc_id) for r in spark.read.parquet(pairs).collect()}
    assert (3, 1) in got
    assert all(d == 3 and c in (1, 2) for d, c in got)
    # band table grew to all four docs (with batch lineage for compaction)
    bt = spark.read.parquet(bands)
    assert bt.select("doc_id").distinct().count() == 4
    assert set(bt.columns) == {"doc_id", "band", "band_key", "batch_id"}
