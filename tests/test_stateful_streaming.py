"""Custom stateful streaming operator tests: applyInPandasWithState
sessionization — closed sessions emitted, open tail kept in state, state
surviving micro-batches AND a query restart via the checkpoint."""

import datetime as dt

from eva_opentargets_spark.streaming.stateful import sessionize_stream

GAP = 1800


def _t(minute):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, input_path, ckpt, out_path):
    """Drain available input into a parquet sink (the durable sink restart
    recovery requires) and return the CUMULATIVE closed-session set."""
    out = sessionize_stream(spark, input_path, gap_seconds=GAP)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"])
        for r in spark.read.parquet(out_path).collect()
    }


def test_stateful_sessionize_with_restart(spark, tmp_path):
    data = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    # user 1: session A (min 0-10), gap > 30min, open tail from min 60
    # user 2: session B (min 0-5) left OPEN at end of file 1
    _write(spark, data, [
        (1, _t(0), 1, "click", 1.0, None),
        (2, _t(10), 1, "click", 1.0, None),
        (3, _t(60), 1, "click", 1.0, None),
        (4, _t(0), 2, "view", 1.0, None),
        (5, _t(5), 2, "view", 1.0, None),
    ])
    sink = str(tmp_path / "out")
    s1 = (1, int(_t(0).timestamp()), int(_t(10).timestamp()), 2)
    got1 = _drain(spark, data, ckpt, sink)
    # only user 1's FIRST session closed; open tails (u1 @60, u2 @0-5) in state
    assert got1 == {s1}

    # file 2: u1 continues its open session (min 75, within gap of 60);
    # u2 jumps far beyond the gap -> closes the session held in STATE
    # (proves the open tail survived the restart via the checkpoint)
    _write(spark, data, [
        (6, _t(75), 1, "click", 1.0, None),
        (7, _t(500), 2, "view", 1.0, None),
    ])
    s2 = (2, int(_t(0).timestamp()), int(_t(5).timestamp()), 2)
    got2 = _drain(spark, data, ckpt, sink)
    assert got2 == {s1, s2}

    # file 3: both users far in the future -> closes both open tails,
    # u1's spanning files 1+2 (events at min 60 and 75 merged in state)
    _write(spark, data, [
        (8, _t(2000), 1, "click", 1.0, None),
        (9, _t(2000), 2, "view", 1.0, None),
    ])
    got3 = _drain(spark, data, ckpt, sink)
    assert got3 == {
        s1,
        s2,
        (1, int(_t(60).timestamp()), int(_t(75).timestamp()), 2),
        (2, int(_t(500).timestamp()), int(_t(500).timestamp()), 1),
    }


def test_stateful_matches_batch_on_closed_sessions(spark, tmp_path):
    """The stream's closed sessions equal the batch operator's sessions,
    minus each user's final (still-open) one."""
    from eva_opentargets_spark.operators.events import sessionize

    data = str(tmp_path / "ev2")
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for s in range(3):  # 3 sessions per user, 120 min apart
            for k in range(u):  # u events per session, 1 min apart
                rows.append((eid, _t(s * 120 + k), u, "e", 0.0, None))
                eid += 1
    _write(spark, data, rows)
    got = _drain(spark, data, str(tmp_path / "ck2"), str(tmp_path / "out2"))

    batch = spark.read.parquet(data)
    bs = {
        (r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"])
        for r in sessionize(batch, gap_seconds=GAP).collect()
    }
    open_tails = {max((t for t in bs if t[0] == u), key=lambda t: t[1]) for u in (1, 2, 3)}
    assert got == bs - open_tails


def _drain_et(spark, input_path, ckpt, out_path):
    from eva_opentargets_spark.streaming.stateful import sessionize_stream_event_time

    out = sessionize_stream_event_time(spark, input_path, gap_seconds=GAP,
                                       watermark="30 minutes")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"])
        for r in spark.read.parquet(out_path).collect()
    }


def test_event_time_timeout_flushes_idle_sessions(spark, tmp_path):
    """Production mode (EventTimeTimeout + watermark): a user who goes
    quiet FOREVER still gets their open session flushed once the watermark
    passes last_event + gap — the state-size guarantee NoTimeout mode
    lacks (there, user 1's tail would sit in state until new user-1 events
    arrive, which never happens here)."""
    data = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    # user 1: two events, then silence forever
    _write(spark, data, [
        (1, _t(0), 1, "click", 1.0, None),
        (2, _t(5), 1, "click", 1.0, None),
    ])
    got1 = _drain_et(spark, data, ckpt, sink)
    assert got1 == set()  # open tail held in state, timeout armed at min 35

    # user 2 far in the future advances the watermark past user 1's timeout
    _write(spark, data, [(3, _t(300), 2, "view", 1.0, None)])
    _drain_et(spark, data, ckpt, sink)
    # timeouts fire when a batch runs AFTER the watermark advance: one more
    # micro-batch (any new data) triggers the flush of user 1's session
    _write(spark, data, [(4, _t(310), 2, "view", 1.0, None)])
    got3 = _drain_et(spark, data, ckpt, sink)
    u1 = (1, int(_t(0).timestamp()), int(_t(5).timestamp()), 2)
    assert u1 in got3, f"idle session not flushed: {got3}"
    # user 2's tail is still legitimately open (watermark hasn't passed it)
    assert not any(u == 2 for (u, *_rest) in got3)
