"""Batch sessionization (SURVEY §2.7 T1): the wizard's keyed session
state machine (App.js:252, 286-310) as gap-based sessions over an event
log — the batch-SQL-expressible twin of the Structured Streaming
``session_window`` in streaming/sessions.py.

Plan shape: ONE shuffle on user_id; two window passes over the same
partitioning (lag → cumulative sum), which Spark executes in a single
sort per partition. Holds at 100 TB: sessions never cross keys, so the
partitioning is the natural one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign ``session_id`` (1-based per key): a new session starts when
    the gap to the previous event reaches ``gap_minutes``.

    Boundary convention: the split predicate is ``gap >= gap_sec`` —
    Spark's streaming ``session_window`` closes a session at
    ``last_ts + gap`` *exclusive*, so an event exactly ``gap`` after the
    previous one starts a new session. The batch twin must agree on that
    boundary or the two forms diverge on exact-gap pairs.

    NULL-``ts`` rows are quarantined (dropped): they have no timeline
    position — matching the streaming twin, where an event without an
    event-time never enters a session window."""
    df = df.filter(F.col(ts).isNotNull())
    order = [F.col(ts).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    gap_sec = gap_minutes * 60
    # .cast("timestamp") first: TIMESTAMP_NTZ columns (plain micros
    # parquet) can't cast straight to double; LTZ→LTZ is a no-op
    sec = F.col(ts).cast("timestamp").cast("double")
    prev_sec = F.lag(ts).over(w).cast("timestamp").cast("double")
    is_new = (
        F.when(F.lag(ts).over(w).isNull(), 1)
        .when(sec - prev_sec >= gap_sec, 1)
        .otherwise(0)
    )
    cum = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(cum)
    ).drop("_new")


def session_summary(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: event count + bounds (the `q_sessionize`
    registration shape)."""
    s = sessionize(df, key, ts, id_col, gap_minutes)
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )
