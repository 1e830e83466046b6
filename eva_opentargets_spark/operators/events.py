"""Event-stream batch operators: tumbling-window aggregation and gap-based
sessionization. The streaming twins live in streaming/ingest.py; these batch
versions are what the DuckDB oracle can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessions: a new session starts after `gap_seconds` of
    inactivity. Window functions over (user_id; ts, event_id) — the stable
    composite ordering avoids nondeterminism on equal timestamps."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > gap_seconds),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", F.col("session_id").cast("int").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("start_epoch"),
        F.unix_timestamp(F.max("ts")).alias("end_epoch"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    ts_col: str = "ts",
    value_cols=(),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join — each left row is annotated with `value_cols`
    from the LATEST right row whose timestamp is at-or-before the left
    row's, per `on` key; left rows with no prior right row keep nulls
    (left-outer semantics). The point-in-time join Spark lacks natively
    (feature lookups, price-at-trade, last-state-before-event).

    Contract: right must be unique per (on, ts) — at an exact timestamp
    tie between two right rows the survivor would be partition-order
    dependent. An exact left/right timestamp tie matches (inclusive),
    like DuckDB's ASOF ON l.ts >= r.ts.

    Scale shape: the naive formulation is a range join — O(|L| x |R|)
    per key without an interval optimizer. This is the union-window
    form: tag sides, one hash shuffle on the key, one in-partition sort
    on (ts, side), then last(ignorenulls) carries each right value
    forward to the left rows that follow it. Cost = one shuffle + one
    sort regardless of how many right rows precede each left row."""
    keys = [on] if isinstance(on, str) else list(on)
    r = right.select(
        *keys, ts_col, *[F.col(c).alias(f"__r_{c}") for c in value_cols]
    ).withColumn("__side", F.lit(0))
    l_tag = left.withColumn("__side", F.lit(1))
    u = l_tag.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.select(
        *left.columns,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out.filter(F.col("__side") == 1).drop("__side")
