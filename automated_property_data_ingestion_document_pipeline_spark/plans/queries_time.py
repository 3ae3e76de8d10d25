"""Event-time registrations (SURVEY §2.7): batch-expressible
sessionization, tumbling windows, range join, as-of join, plus a
genuinely-streaming key (rows-only) that runs Structured Streaming with
an availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators.joins import (
    asof_join,
    range_join_buckets,
)
from automated_property_data_ingestion_document_pipeline_spark.operators.sessionize import (
    session_summary,
    session_summary_two_phase,
)
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query
from automated_property_data_ingestion_document_pipeline_spark.streaming import sessions as streaming_sessions

# -- T1: gap-based sessionization (batch twin) ---------------------------------


@query(
    "q_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000 THEN 1
                  ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wizard keyed-session state (App.js:252, 286-310) as 30-min
    gap-based sessions: lag → cumulative-sum, one shuffle on user_id
    (operators/sessionize.py). Gap compared in integer microseconds on
    both engines; split at ``gap >= 30min`` to match streaming
    ``session_window``'s exclusive close (see operators/sessionize.py)."""
    ev = catalog.load(spark, sf_dir, "events")
    return session_summary(ev, gap_minutes=30)


@query(
    "q_sessionize_twophase",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000 THEN 1
                  ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-robust segment-then-merge sessionization (r02 verdict
    #6): phase 1 sessionizes within (user, 24 h time chunk) — a hot
    user's timeline spreads over #chunks tasks instead of one — and
    phase 2 re-applies the identical gap logic over local-session
    summaries to merge boundary splits (operators/sessionize.py).
    Deliberately shares `q_sessionize`'s single-pass oracle: the
    DuckDB closure proves the two plans compute the same sessions."""
    ev = catalog.load(spark, sf_dir, "events")
    return session_summary_two_phase(ev, gap_minutes=30, chunk_hours=24)


# -- T3: tumbling-window aggregate (batch twin) --------------------------------


@query(
    "q_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(TRY_CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100 AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling buckets (timestamp-clustered artifacts, reports/
    dir): date_trunc groupBy; value summed in exact integer cents."""
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")  # non-finite -> NULL, both engines
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        (F.sum(cents).cast("double") / 100).alias("total_value"),
    )


# -- range join ----------------------------------------------------------------


@query(
    "q_range_join",
    oracle="""
    WITH buckets AS (SELECT DISTINCT date_trunc('day', ts) AS day_start FROM events)
    SELECT b.day_start, COUNT(*) AS n_events
    FROM events e JOIN buckets b
      ON e.ts >= b.day_start AND e.ts < b.day_start + INTERVAL 1 DAY
    GROUP BY b.day_start
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join of events to day buckets: the bucket dim
    is broadcast so the inequality join is a map-side nested-loop over a
    tiny build side — the only sane physical plan for theta joins at
    scale (never shuffle a fact for a range predicate)."""
    ev = catalog.load(spark, sf_dir, "events")
    buckets = ev.select(F.date_trunc("day", "ts").alias("day_start")).distinct()
    buckets = buckets.withColumn("day_end", F.col("day_start") + F.expr("INTERVAL 1 DAY"))
    joined = range_join_buckets(ev, buckets, "ts", "day_start", "day_end")
    return joined.groupBy("day_start").agg(F.count("*").alias("n_events"))


# -- as-of join (extension; reference lacks it) --------------------------------


@query(
    "q_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
      (SELECT v.event_id FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_event_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest prior 'view' of
    the same user. Implemented as union-merge (operators/joins.py): ONE
    shuffle on user_id, no range self-join blowup — the plan that holds
    when both sides are 100 TB facts."""
    ev = catalog.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    # Equal-(user, ts) views resolve to max event_id via the merge-order
    # tiebreak — no pre-collapsing groupBy, keeping exactly ONE exchange.
    out = asof_join(
        purchases, views, key="user_id", ts="ts", payload_cols=["event_id"],
        tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "ts", "asof_event_id")


@query(
    "q_asof_join_forward",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
      (SELECT v.event_id FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts >= p.ts
        ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS asof_event_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each purchase matched to the EARLIEST
    subsequent 'view' of the same user (the look-ahead direction —
    next-touch attribution). Same union-merge plan as q_asof_join with
    the time axis reversed: still ONE shuffle on user_id."""
    ev = catalog.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    # Equal-(user, ts) views resolve to MIN event_id via the merge-order
    # tiebreak (reversed axis) — no pre-collapsing groupBy, ONE exchange.
    out = asof_join(
        purchases, views, key="user_id", ts="ts", payload_cols=["event_id"],
        direction="forward", tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "ts", "asof_event_id")


# -- T1: wizard step state machine (rows-only) ---------------------------------


@query("q_wizard_steps")  # rows-only: stateful fold, not SQL-expressible
def q_wizard_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 4-step wizard state machine (App.js:252, clamped
    transitions BOTH ways: 706 advance / 720 retreat) replayed over the
    event log per user via applyInPandas — emits completed/aborted/
    in-progress wizard runs. To exercise the retreat and session-restore
    transitions on the generic corpus, a deterministic slice of clicks is
    remapped JVM-side before the replay: ``props.k % 11 == 3`` → ``back``
    (App.js:720), ``props.k % 11 == 7`` → ``restore`` (sessionStorage
    thg_session_v1, App.js:286-310). Streaming twin in
    streaming/state_machine.py (applyInPandasWithState)."""
    from automated_property_data_ingestion_document_pipeline_spark.streaming.state_machine import (
        wizard_outcomes_batch,
    )

    ev = catalog.load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")  # malformed/float k -> NULL
    remapped = F.when(
        (F.col("event_type") == "click") & (k % 11 == 3), F.lit("back")
    ).when(
        (F.col("event_type") == "click") & (k % 11 == 7), F.lit("restore")
    ).otherwise(F.col("event_type"))
    return wizard_outcomes_batch(ev.withColumn("event_type", remapped))


# -- skewed-key variants (VERDICT r03 #6) --------------------------------------
# One user owns ~10% of the whole event log: the hot-key shape that
# breaks per-key operators at scale (one straggler task owns the hot
# partition). Derived deterministically from the corpus so the DuckDB
# oracle replays the identical remap — benchmark rows for these live in
# bench.py's HEADLINE and PERFORMANCE.md's skew section.

_SKEW_SQL = "CASE WHEN event_id % 10 = 0 THEN 0 ELSE user_id END"


def _skewed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load(spark, sf_dir, "events")
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(0)).otherwise(F.col("user_id")),
    )


@query(
    "q_sessionize_skew",
    oracle=f"""
    WITH skewed AS (
      SELECT event_id, ts, {_SKEW_SQL} AS user_id FROM events),
    ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000 THEN 1
                  ELSE 0 END AS is_new
      FROM skewed WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_sessionize_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sessionize over the hot-key corpus: same window-form plan, one
    shuffle on user_id — the hot user's whole timeline lands on ONE
    task, the measured cost of which is the reason
    q_sessionize_twophase (segment-then-merge) exists as the
    recommended path for skewed keys."""
    return session_summary(_skewed_events(spark, sf_dir), gap_minutes=30)


@query(
    "q_sessionize_capped_skew",
    oracle=f"""
    WITH RECURSIVE skewed AS (
      SELECT event_id, ts, {_SKEW_SQL} AS user_id FROM events),
    e AS (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM skewed WHERE ts IS NOT NULL),
    r AS (
      SELECT user_id, event_id, ts, rn,
             1 AS session_n, ts AS anchor
      FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.ts, e.rn,
             CASE WHEN date_diff('microsecond', r.ts, e.ts) >= 1800000000
                    OR date_diff('microsecond', r.anchor, e.ts) >= 7200000000
                  THEN r.session_n + 1 ELSE r.session_n END,
             CASE WHEN date_diff('microsecond', r.ts, e.ts) >= 1800000000
                    OR date_diff('microsecond', r.anchor, e.ts) >= 7200000000
                  THEN e.ts ELSE r.anchor END
      FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
    SELECT user_id, event_id, ts, CAST(session_n AS INTEGER) AS session_n
    FROM r
    """,
)
def q_sessionize_capped_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sessionize_capped over the hot-key corpus: the sequential
    recurrence is per-key, so the hot user serializes on one core —
    this key puts a measured number on that worst case (the operator's
    events/sec/core ceiling is the contract, PERFORMANCE.md)."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.sessionize import (
        sessionize_capped,
    )

    return sessionize_capped(
        _skewed_events(spark, sf_dir), gap_minutes=30, max_span_minutes=120
    )


# -- T1/T2 streaming-backed key (rows-only) ------------------------------------


@query("q_stream_sessionize")  # rows-only: Structured Streaming state op
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run: file source → session_window(30 min)
    with watermark → memory sink, availableNow trigger (batch-bounded).
    The streaming twin of q_sessionize; driver records rows-only."""
    stream = streaming_sessions.read_events_stream(spark, sf_dir)
    result = streaming_sessions.session_agg(stream, gap="30 minutes")
    return streaming_sessions.run_available_now(result, "stream_sessions")


@query(
    "q_sessionize_capped",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE ts IS NOT NULL),
    r AS (
      SELECT user_id, event_id, ts, rn,
             1 AS session_n, ts AS anchor
      FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.ts, e.rn,
             CASE WHEN date_diff('microsecond', r.ts, e.ts) >= 1800000000
                    OR date_diff('microsecond', r.anchor, e.ts) >= 7200000000
                  THEN r.session_n + 1 ELSE r.session_n END,
             CASE WHEN date_diff('microsecond', r.ts, e.ts) >= 1800000000
                    OR date_diff('microsecond', r.anchor, e.ts) >= 7200000000
                  THEN e.ts ELSE r.anchor END
      FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
    SELECT user_id, event_id, ts, CAST(session_n AS INTEGER) AS session_n
    FROM r
    """,
)
def q_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap + max-span sessionization (operators/sessionize.py
    sessionize_capped): the split depends on the running session anchor
    — a sequential recurrence no window frame can express — so the
    Spark path is one sorted mapInPandas stream per partition (one
    shuffle on the key; O(1) recurrence state carried across Arrow
    batches — PERFORMANCE.md §19 on why not per-group applyInPandas)
    and the oracle replays the identical recurrence as a recursive CTE.
    30-min gap, 2-h span cap, exact integer-micro comparisons on both
    engines."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.sessionize import (
        sessionize_capped,
    )

    ev = catalog.load(spark, sf_dir, "events")
    return sessionize_capped(ev, gap_minutes=30, max_span_minutes=120)


@query(
    "q_asof_nearest",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
      (SELECT v.event_id FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id
          AND v.ts IS NOT NULL AND p.ts IS NOT NULL
        ORDER BY abs(date_diff('microsecond', p.ts, v.ts)) ASC,
                 CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END ASC,
                 CASE WHEN v.ts <= p.ts THEN -v.event_id ELSE v.event_id END ASC
        LIMIT 1) AS nearest_event_id,
      (SELECT abs(date_diff('microsecond', p.ts, v.ts)) FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id
          AND v.ts IS NOT NULL AND p.ts IS NOT NULL
        ORDER BY abs(date_diff('microsecond', p.ts, v.ts)) ASC,
                 CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END ASC,
                 CASE WHEN v.ts <= p.ts THEN -v.event_id ELSE v.event_id END ASC
        LIMIT 1) AS nearest_gap_us
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-view attribution: each purchase matched to the view with
    the smallest |Δts| (backward wins ties, then the direction's own
    id tiebreak). Composed from the two directional union-merges
    (operators/joins.py asof_join_nearest) — two key-shuffles total,
    never an inequality self-join; gaps compared in exact integer
    micros. The oracle replays the full preference order as a
    correlated LIMIT 1."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.joins import (
        asof_join_nearest,
    )

    ev = catalog.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    out = asof_join_nearest(
        purchases, views, key="user_id", ts="ts", payload_cols=["event_id"],
        tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "ts", "nearest_event_id", "nearest_gap_us")


@query(
    "q_temporal_join",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events WHERE ts IS NOT NULL),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
    scd AS (
      SELECT user_id, event_type AS state, ts AS effective_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS effective_to
      FROM changes),
    sess AS (
      SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM (
        SELECT user_id, ts, event_id,
               SUM(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM (
          SELECT user_id, ts, event_id,
                 date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_us
          FROM events WHERE ts IS NOT NULL))
      GROUP BY user_id, session_id)
    SELECT s.user_id, CAST(s.session_id AS BIGINT) AS session_id,
           sc.state, sc.effective_from,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM sess s JOIN scd sc
      ON s.user_id = sc.user_id
     AND sc.effective_from <= s.s_end
     AND (sc.effective_to IS NULL OR sc.effective_to > s.s_start)
    GROUP BY s.user_id, CAST(s.session_id AS BIGINT), sc.state, sc.effective_from
    """,
)
def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (interval-overlap) join: each user session aligned with
    every SCD2 state interval in effect during any part of it —
    the OVERLAPS predicate two versioned tables join on (half-open
    [from, to), open intervals extend to +∞). Equi-key on user_id
    carries the join (hash join; candidate pairs bounded per user),
    the overlap condition filters above it — never a time-only theta
    join. Both interval sets derive from the same event scan
    (gaps-and-islands sessions, lag-based SCD2), so the whole dataflow
    is windows over ONE user partitioning plus the final join."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.sessionize import sessionize

    ev = catalog.load(spark, sf_dir, "events")
    sess = (
        sessionize(ev, gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    from pyspark.sql import Window

    base = ev.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = base.withColumn("prev", F.lag("event_type").over(w)).withColumn(
        "rn", F.row_number().over(w)
    )
    changes = ordered.filter(
        (F.col("rn") == 1) | ~F.col("prev").eqNullSafe(F.col("event_type"))
    )
    scd = changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w.orderBy("ts", "event_id")).alias("effective_to"),
    )
    j = sess.join(
        scd,
        (sess.user_id == scd.user_id)
        & (F.col("effective_from") <= F.col("s_end"))
        & (F.col("effective_to").isNull() | (F.col("effective_to") > F.col("s_start"))),
    )
    return j.groupBy(
        sess.user_id, F.col("session_id").cast("bigint").alias("session_id"),
        "state", "effective_from"
    ).agg(F.count("*").cast("bigint").alias("n_overlaps"))


@query("q_stream_join")  # rows-only: stream-stream join (watermark eviction)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join run end-to-end: the events file
    stream branches into purchases and views, both watermarked, joined
    on user within a 1-hour attribution window, append-mode memory sink,
    availableNow trigger. State per side is bounded by watermark +
    interval — the only join shape Structured Streaming admits
    unboundedly (streaming/sessions.py purchase_view_join). Rows-only:
    watermark eviction under multi-file triggers is
    processing-order-dependent by design."""
    stream = streaming_sessions.read_events_stream(spark, sf_dir)
    joined = streaming_sessions.purchase_view_join(stream)
    return streaming_sessions.run_available_now(
        joined, "stream_purchase_views", output_mode="append"
    )


@query("q_stream_dedup")  # rows-only: watermarked streaming dedup state
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming dropDuplicatesWithinWatermark run on
    the event id (the A3 abort-stale/duplicate-discard surface, until
    now exercised only by local tests): file source → watermark →
    dedup-within-watermark → per-type counts → memory sink. State per
    key is evicted once the watermark passes — the bounded-state dedup
    you run in front of an at-least-once bus at 100 TB."""
    stream = streaming_sessions.read_events_stream(spark, sf_dir)
    deduped = streaming_sessions.dedup_within_watermark(stream.filter(F.col("ts").isNotNull()))
    counts = deduped.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return streaming_sessions.run_available_now(counts, "stream_dedup", output_mode="complete")


@query("q_stream_tumbling")  # rows-only: streaming windowed agg state
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming tumbling-window aggregation run
    end-to-end (the T3 surface as a STREAM, completing the streaming
    driver set beside sessionize/dedup/join/ewma): file source →
    2 h watermark → 1 h window × event_type counts → complete-mode
    memory sink, availableNow trigger. Window state is evicted once
    the watermark passes the window end — the bounded-state rollup
    that runs unbounded at 100 TB. Batch twin: q_tumbling_window
    (oracle-backed); rows-only here because late-data eviction under
    multi-file triggers is processing-order-dependent by design."""
    stream = streaming_sessions.read_events_stream(spark, sf_dir)
    counts = streaming_sessions.tumbling_counts(
        stream.filter(F.col("ts").isNotNull())
    )
    return streaming_sessions.run_available_now(
        counts, "stream_tumbling", output_mode="complete"
    )


@query(
    "q_stream_multi",
    oracle="""
    WITH e AS (SELECT ts, event_type FROM events WHERE ts IS NOT NULL),
         wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM e)
    SELECT date_trunc('hour', e.ts) AS bucket_start, e.event_type,
           COUNT(*) AS n_events
    FROM e, wm
    WHERE date_trunc('hour', e.ts) + INTERVAL 1 HOUR <= wm.w
    GROUP BY 1, 2
    """,
)
def q_stream_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO chained stateful operators in ONE streaming query —
    dropDuplicatesWithinWatermark feeding a tumbling-window aggregation,
    append mode (the multi-stateful pipeline Structured Streaming
    supports natively since the watermark-propagation rework; before
    that this required two queries bridged by a sink). Dedup state
    evicts per the 2 h watermark, window state closes as the PROPAGATED
    watermark (input watermark minus nothing here — no event-time
    delay operator between them) passes each window end, and only
    CLOSED windows reach the append-mode sink — the exactly-once
    at-least-once-bus rollup, end to end in one checkpoint at 100 TB.

    ORACLE-BACKED as of r13 (it was rows-only r08-r12): the run is
    single-batch (``max_files_per_trigger=None``), so the watermark is
    epoch-zero while data flows — no row can be dropped as late, and
    dedup-within-watermark over the batch is exact (event_id is unique
    in this corpus, so dedup is the identity on counts) — then the
    availableNow final flush advances the watermark ONCE to
    max(ts) - 2h and emits exactly the windows whose END <= that
    watermark. Every emitted row is therefore a closed-form function
    of the dataset: the SQL above. Multi-batch order-dependence is
    still exercised by q_stream_dedup / q_stream_tumbling (rows-only
    by design)."""
    stream = streaming_sessions.read_events_stream(
        spark, sf_dir, max_files_per_trigger=None
    ).filter(F.col("ts").isNotNull())
    dd = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = (
        dd.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events")
    )
    return streaming_sessions.run_available_now(
        agg, "stream_multi", output_mode="append"
    )


@query("q_stream_static")  # rows-only: stream-static broadcast enrichment
def q_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join — the enrichment shape the reference's
    /fetch_parcel_ui dataflow has in streaming form: the event stream
    left-joins the static customer dimension (broadcast per
    micro-batch, re-read each trigger so dimension updates are picked
    up) and rolls counts per market segment. No join state is kept at
    all — unlike the stream-stream q_stream_join, a static side needs
    no watermark — so this is the cheapest streaming enrichment and
    the default choice at 100 TB when one side is a dimension.
    Complete-mode availableNow run; rows-only (the batch twin
    q_broadcast_join is oracle-backed)."""
    stream = streaming_sessions.read_events_stream(spark, sf_dir).filter(
        F.col("ts").isNotNull()
    )
    dim = catalog.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    counts = enriched.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("<unknown>")).alias("segment")
    ).agg(F.count("*").alias("n_events"))
    return streaming_sessions.run_available_now(
        counts, "stream_static", output_mode="complete"
    )
