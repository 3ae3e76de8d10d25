"""Interval algebra and time-axis densification registrations:
merge-overlaps coverage, run-length encoding, calendar gap fill.

Gaps-and-islands is the workhorse behind uptime/SLA reporting,
ad-break stitching, and possession-interval analysis on property
records. All three keys are single-window or window+join plans — one
shuffle on the entity key — with every boundary compared in integer
microseconds on BOTH engines (catalog.load truncates the events table's
nano timestamps to micros exactly like DuckDB does, see catalog.py:48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import intervals
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# per-event interval: [ts, ts + 60..659 s), length from the event id —
# pure integer arithmetic both engines
_IVL_SQL = """
    SELECT user_id, event_id,
           epoch_us(ts) AS start_us,
           epoch_us(ts) + ((event_id % 600) + 60) * 1000000 AS end_us
    FROM events WHERE ts IS NOT NULL
"""


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # ts may arrive TIMESTAMP_NTZ; session tz is pinned UTC by tune(),
    # so the LTZ cast is value-preserving and unix_micros applies
    start = F.unix_micros(F.col("ts").cast("timestamp"))
    dur = ((F.col("event_id") % 600) + 60) * F.lit(1_000_000)
    return ev.select(
        "user_id",
        "event_id",
        start.alias("start_us"),
        (start + dur).alias("end_us"),
    )


@query(
    "q_interval_coverage",
    oracle=f"""
    WITH ivl AS ({_IVL_SQL}),
    flagged AS (
      SELECT user_id, event_id, start_us, end_us,
             CASE WHEN start_us > MAX(end_us) OVER (
                    PARTITION BY user_id ORDER BY start_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(end_us) OVER (
                    PARTITION BY user_id ORDER BY start_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM ivl
    ), islands AS (
      SELECT user_id, start_us, end_us,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY start_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS island
      FROM flagged
    ), merged AS (
      SELECT user_id, island,
             MIN(start_us) AS s, MAX(end_us) AS e
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(SUM(e - s) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping per-user intervals (classic gaps-and-islands):
    an interval starts a new island iff it begins strictly after the
    running max end of everything before it. Two stacked windows plus
    one aggregation — a single shuffle on user_id; island spans sum to
    exact covered microseconds."""
    ivl = _intervals(spark, sf_dir)
    merged = intervals.merge_intervals(ivl, "user_id", "start_us", "end_us", "event_id")
    return intervals.coverage_summary(merged, "user_id").select(
        "user_id", "n_islands", F.col("covered").alias("covered_us")
    )


@query(
    "q_event_runs",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, event_type,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS run_id
      FROM ordered
    )
    SELECT user_id, run_id, event_type, COUNT(*) AS run_len
    FROM runs GROUP BY user_id, run_id, event_type
    """,
)
def q_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each user's event stream: consecutive
    same-type events collapse to one run (lag-flag → cumulative sum →
    aggregate — the sessionize recurrence keyed on value change instead
    of time gap). One shuffle on user_id."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return runs.groupBy("user_id", "run_id", "event_type").agg(
        F.count("*").alias("run_len")
    )


@query(
    "q_calendar_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ), cal AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    )
    SELECT cal.user_id, strftime(cal.day, '%Y-%m-%d') AS day,
           COALESCE(daily.n_events, 0) AS n_events
    FROM cal LEFT JOIN daily
      ON cal.user_id = daily.user_id AND cal.day = daily.day
    """,
)
def q_calendar_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: every user's daily event count with
    missing days filled as 0 across their [first, last] activity span —
    the gap-fill every retention/forecast pipeline needs before
    modeling. ``sequence()`` + explode generates the calendar
    distributed (fan-out bounded by span days, no driver loop); the
    fill is a left equi-join back to the daily counts."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n_events"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = spans.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    return cal.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        # driver-canonical form: dates serialize differently across the
        # engines' pandas bridges, strings don't
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


@query(
    "q_debounce",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 300 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), bursts AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS burst
      FROM ordered
    )
    SELECT user_id, event_id, ts, event_type
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, burst ORDER BY ts, event_id) AS rk
      FROM bursts
    ) WHERE rk = 1
    """,
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst debounce: keep only the FIRST event of each rapid-fire
    burst (gap < 5 min chains collapse to their opener) — duplicate-
    click / retry-storm suppression. Burst = a 5-min-gap session, so the
    keep-first rule stays window-expressible (lag-flag → cumsum →
    rank 1), avoiding the sequential "distance from last KEPT"
    recurrence that would force a stateful pass. One shuffle on
    user_id; all three windows share it."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(us).over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(prev_us.isNull() | (us - prev_us >= 300 * 1_000_000), 1).otherwise(0),
    )
    bursts = flagged.withColumn(
        "burst",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    w2 = Window.partitionBy("user_id", "burst").orderBy("ts", "event_id")
    return (
        bursts.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@query(
    "q_hour_bitmap",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           CAST(bit_or(1::BIGINT << hr) AS BIGINT) AS hour_mask,
           CAST(bit_count(bit_or(1::BIGINT << hr)) AS BIGINT) AS active_hours,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ev GROUP BY user_id, day
    """,
)
def q_hour_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index aggregation: each (user, day)'s active hours packed
    into ONE int64 bitmask via bit_or(1 << hour) — the roaring-bitmap
    primitive that turns presence sets into constant-size, mergeable
    integers (shard masks OR together; intersection/containment become
    bitwise ops instead of joins). popcount gives active-hour counts
    with no distinct aggregation. One partial-agg shuffle carrying 8
    bytes per group — the cheapest possible presence encoding at
    100 TB."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    mask = F.expr("bit_or(shiftleft(1L, hr))")
    return (
        e.select(
            "user_id",
            F.col("ts").cast("date").cast("string").alias("day"),
            F.hour("ts").cast("bigint").alias("hr"),
        )
        .groupBy("user_id", "day")
        .agg(
            mask.cast("bigint").alias("hour_mask"),
            F.expr("bit_count(bit_or(shiftleft(1L, hr)))").cast("bigint").alias(
                "active_hours"
            ),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


@query(
    "q_peak_concurrency",
    oracle="""
    WITH iv AS (
        SELECT user_id, MIN(ts) AS s, MAX(ts) AS e
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
    ),
    pts AS (
        SELECT s AS t, 1 AS delta, user_id FROM iv
        UNION ALL
        SELECT e + INTERVAL 1 MICROSECOND AS t, -1 AS delta, user_id FROM iv
    ),
    c AS (
        SELECT t,
               CAST(SUM(delta) OVER (ORDER BY t, delta ASC, user_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS concurrent
        FROM pts
    )
    SELECT CAST(MAX(concurrent) AS BIGINT) AS peak,
           MIN(CASE WHEN concurrent = (SELECT MAX(concurrent) FROM c)
                    THEN t END) AS peak_at
    FROM c
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity (max interval-stabbing depth): each
    user's [first, last] activity interval becomes a +1/−1 boundary
    event, the running sum over the boundary order is the live
    concurrency curve, and its max + earliest argmax time answer
    'how many users were active AT ONCE, and when' — the capacity-
    planning number union-length coverage (q_interval_coverage) can't
    give. With −1 placed at end+1µs (closed-interval exclusivity),
    equal-time ties MUST process −1 before +1: an interval ending 1 µs
    before another starts is NOT overlap — the +1-first order
    silently overcounts exactly that adjacency, a bug the DuckDB
    oracle could never catch because both engines shared the tie
    order; the hypothesis sweep-vs-brute-stabbing model did
    (tests/test_property_r4c.py). At
    100 TB the running sum swaps onto ranking.global_prefix_sum (the
    boundary table is 2·|keys| rows — here it rides one ordered window
    over that reduced table)."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    iv = e.groupBy("user_id").agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    pts = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionByName(
        iv.select(
            (F.col("e") + F.expr("INTERVAL 1 MICROSECOND")).alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
        )
    )
    w = Window.orderBy(
        F.col("t").asc(), F.col("delta").asc(), F.col("user_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    c = pts.select("t", F.sum("delta").over(w).cast("bigint").alias("concurrent"))
    mx = c.agg(F.max("concurrent").alias("_peak"))
    c2 = c.join(F.broadcast(mx))  # single-row broadcast
    return c2.agg(
        F.max("concurrent").cast("bigint").alias("peak"),
        F.min(
            F.when(F.col("concurrent") == F.col("_peak"), F.col("t"))
        ).alias("peak_at"),
    )
