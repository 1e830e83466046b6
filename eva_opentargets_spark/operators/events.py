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
