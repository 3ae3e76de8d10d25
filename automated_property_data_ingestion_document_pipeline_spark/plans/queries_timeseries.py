"""Time-series smoothing + robust outlier detection.

Two operators a telemetry/training-data pipeline runs constantly and
that naive SQL gets wrong at scale:

- **EWMA** is a sequential linear recurrence (y_i = αx_i + (1-α)y_{i-1})
  — not window-expressible without per-row pow(). With the dyadic
  α = 1/2 every step is `(acc + x) / 2.0`, an IEEE-exact-rounded op, so
  a left-to-right fold produces IDENTICAL doubles on any engine that
  evaluates the same chain — which is exactly what the oracle's
  recursive CTE does. Spark side: per-key sorted `collect_list` +
  `aggregate()` fold (JVM HOF, no Python). Per-entity series are
  bounded (the sessionize contract); unbounded keys belong to the
  streaming EWMA in streaming/.

- **MAD outliers** (median absolute deviation, the robust z-score):
  median and MAD computed positionally over integer cents, carrying
  2×median and 4×MAD so every quantity stays an exact integer and the
  flag `|x - med| > 3·MAD` becomes the integer predicate
  `2·dev2 > 3·mad4` — no interpolation floats to disagree on.

Scale: both are one shuffle on the entity key; the MAD windows (rank →
margin sums → rank) all share the `user_id` partitioning so Catalyst
plans a single Exchange feeding three Window operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import folds
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# Integer cents projection shared by both keys (ties broken by event_id).
_EV_CENTS = """
    SELECT user_id, event_id, ts,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
      AND value > -1e12 AND value < 1e12
"""
# The ±1e12 domain bound keeps cents exact in int64 AND excludes
# NaN/±Inf — both engines order NaN above every finite double, so
# ``value < 1e12`` rejects it identically.


def _ev_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog.load(spark, sf_dir, "events")
    return (
        ev.filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("value") > -1e12)
            & (F.col("value") < 1e12)
        ).select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )


@query(
    "q_ewma",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM ({_EV_CENTS})
    ),
    last AS (SELECT user_id, MAX(rn) AS n_events FROM ev GROUP BY user_id),
    r AS (
        SELECT user_id, rn, CAST(cents AS DOUBLE) AS y
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT ev.user_id, ev.rn, (r.y + ev.cents) / 2.0
        FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
    )
    SELECT r.user_id, last.n_events, r.y AS ewma_cents
    FROM r JOIN last ON r.user_id = last.user_id AND r.rn = last.n_events
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA (α = 1/2) of event value per user, time-ordered.

    One shuffle on user_id; the fold is a JVM `aggregate()` HOF over the
    sorted array — left-to-right `(acc + x) / 2.0`, the same chain the
    oracle's recursive CTE evaluates, so the doubles agree BITWISE (no
    defensive rounding needed). Ties broken by event_id inside the
    sorted struct, matching the ORDER BY. Per-key series are bounded by
    the ENFORCED folds.MAX_SERIES_EVENTS contract (VERDICT r04 #3) —
    oversized keys raise with a route-to-streaming-fold remediation
    instead of silently materializing a giant buffer.
    """
    ev = _ev_cents(spark, sf_dir)
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "cents")))
    g = folds.enforce_series_cap(ev.groupBy("user_id").agg(arr.alias("evs")), "evs")
    return g.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.expr(
            "aggregate("
            "  slice(evs, 2, greatest(size(evs) - 1, 0)),"
            "  cast(element_at(evs, 1).cents AS double),"
            "  (acc, e) -> (acc + e.cents) / 2.0D"
            ")"
        ).alias("ewma_cents"),
    )


def _mad_flagged(ev: DataFrame) -> DataFrame:
    """The MAD window chain (rank → median margin-sum → deviation rank
    → MAD margin-sum), carrying (user_id, event_id, ts, cents, med2,
    dev2, mad4) — med2 = 2·median, dev2 = 2·|x−median|, mad4 = 4·MAD,
    all exact integers. Shared by q_mad_outliers and the telemetry
    scrub pipeline; all four windows partition by user_id so the chain
    rides ONE Exchange."""
    by_user = Window.partitionBy("user_id")
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("n div 2 + 1")
    ranked = ev.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        F.row_number().over(by_user.orderBy("cents", "event_id")).alias("rn"),
        F.count("*").over(by_user).alias("n"),
    )
    med = ranked.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        (
            F.sum(F.when(F.col("rn") == lo, F.col("cents")).otherwise(0)).over(by_user)
            + F.sum(F.when(F.col("rn") == hi, F.col("cents")).otherwise(0)).over(by_user)
        ).alias("med2"),
    )
    dev = med.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        "med2",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2"),
        F.row_number()
        .over(by_user.orderBy(F.abs(2 * F.col("cents") - F.col("med2")), "event_id"))
        .alias("dn"),
        F.count("*").over(by_user).alias("n"),
    )
    return dev.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        "med2",
        "dev2",
        (
            F.sum(F.when(F.col("dn") == lo, F.col("dev2")).otherwise(0)).over(by_user)
            + F.sum(F.when(F.col("dn") == hi, F.col("dev2")).otherwise(0)).over(by_user)
        ).alias("mad4"),
    )


# The MAD CTE chain (DuckDB twin of _mad_flagged); expects an `ev` CTE
# with (user_id, event_id, ts, cents) in scope.
_MAD_SQL = """
    ranked AS (
        SELECT user_id, event_id, ts, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM ev
    ),
    med AS (
        SELECT user_id, event_id, ts, cents,
               SUM(CASE WHEN rn = (n + 1) // 2 THEN cents ELSE 0 END)
                   OVER (PARTITION BY user_id)
             + SUM(CASE WHEN rn = n // 2 + 1 THEN cents ELSE 0 END)
                   OVER (PARTITION BY user_id) AS med2
        FROM ranked
    ),
    dev AS (
        SELECT user_id, event_id, ts, cents, med2,
               ABS(2 * cents - med2) AS dev2,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ABS(2 * cents - med2), event_id) AS dn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM med
    ),
    mad AS (
        SELECT user_id, event_id, ts, cents, med2, dev2,
               SUM(CASE WHEN dn = (n + 1) // 2 THEN dev2 ELSE 0 END)
                   OVER (PARTITION BY user_id)
             + SUM(CASE WHEN dn = n // 2 + 1 THEN dev2 ELSE 0 END)
                   OVER (PARTITION BY user_id) AS mad4
        FROM dev
    )
"""


@query(
    "q_mad_outliers",
    oracle=f"""
    WITH ev AS ({_EV_CENTS}),
    {_MAD_SQL}
    SELECT user_id, event_id, cents,
           med2 / 2.0 AS median_cents,
           mad4 / 4.0 AS mad_cents
    FROM mad
    WHERE 2 * dev2 > 3 * mad4
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates from their user's median by more
    than 3× the median absolute deviation — the robust outlier flag
    (immune to the outliers polluting a mean/stddev z-score).

    Positional medians over integer cents: rank → two-middle-rows
    margin sum → rank of deviations → margin sum again. All four
    windows partition by user_id, so the plan is ONE Exchange feeding a
    Window chain; the 3·MAD test is the integer predicate
    ``2·dev2 > 3·mad4`` (med2 = 2·median, mad4 = 4·MAD — halves and
    quarters never materialize until the exact-binary output division).
    """
    mad = _mad_flagged(_ev_cents(spark, sf_dir))
    return mad.filter(2 * F.col("dev2") > 3 * F.col("mad4")).select(
        "user_id",
        "event_id",
        "cents",
        (F.col("med2") / 2.0).alias("median_cents"),
        (F.col("mad4") / 4.0).alias("mad_cents"),
    )


# -- streaming twin (rows-only) -----------------------------------------------


@query("q_stream_ewma")  # rows-only: Structured Streaming keyed state
def q_stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming run of the EWMA recurrence: file
    source → applyInPandasWithState keyed on user_id (two scalars of
    state per key) → memory sink via availableNow. Single-batch runs
    are bit-identical to q_ewma (differential-pinned); multi-batch runs
    continue the fold from state across micro-batches."""
    from automated_property_data_ingestion_document_pipeline_spark.streaming import (
        sessions as streaming_sessions,
    )

    stream = streaming_sessions.read_events_stream(spark, sf_dir)
    prepared = (
        stream.filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("value") > -1e12)
            & (F.col("value") < 1e12)
        )
        .withColumn("cents", F.round(F.col("value") * 100).cast("bigint"))
        .select("user_id", "event_id", "ts", "cents")
    )
    result = streaming_sessions.ewma_stream(prepared)
    return streaming_sessions.run_available_now(
        result, "stream_ewma", output_mode="update"
    )


# -- CUSUM drift detection ----------------------------------------------------

_DRIFT_CENTS = 5000  # alarm when cumulative positive drift exceeds $50


@query(
    "q_cusum",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM ({_EV_CENTS})
    ),
    base AS (SELECT user_id, cents AS x1 FROM ev WHERE rn = 1),
    last AS (SELECT user_id, MAX(rn) AS n_events FROM ev GROUP BY user_id),
    r AS (
        SELECT user_id, 1 AS rn, CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS m
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT ev.user_id, ev.rn,
               GREATEST(CAST(0 AS BIGINT), r.s + ev.cents - b.x1),
               GREATEST(r.m, GREATEST(CAST(0 AS BIGINT), r.s + ev.cents - b.x1))
        FROM r
        JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
        JOIN base b ON b.user_id = ev.user_id
    )
    SELECT r.user_id, last.n_events, r.s AS cusum_final, r.m AS cusum_max,
           r.m > {_DRIFT_CENTS} AS drifted
    FROM r JOIN last ON r.user_id = last.user_id AND r.rn = last.n_events
    """,
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector per user: against the user's
    first value as baseline, accumulate s_i = max(0, s_{i-1} + (x_i −
    x_1)) and track its running max — the standard changepoint alarm
    for 'this entity's metric has drifted up'. Pure-integer recurrence
    (cents), so the JVM fold and the oracle's recursive CTE agree
    exactly; same one-shuffle sorted-array shape as q_ewma. The struct
    accumulator carries (s, max) through a single pass.
    """
    ev = _ev_cents(spark, sf_dir)
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "cents")))
    g = folds.enforce_series_cap(ev.groupBy("user_id").agg(arr.alias("evs")), "evs")
    folded = g.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.expr(
            "aggregate("
            "  slice(evs, 2, greatest(size(evs) - 1, 0)),"
            "  named_struct('s', cast(0 as bigint), 'm', cast(0 as bigint)),"
            "  (acc, e) -> named_struct("
            "    's', greatest(cast(0 as bigint),"
            "                  acc.s + e.cents - element_at(evs, 1).cents),"
            "    'm', greatest(acc.m,"
            "                  greatest(cast(0 as bigint),"
            "                           acc.s + e.cents - element_at(evs, 1).cents)))"
            ")"
        ).alias("acc"),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.col("acc.s").alias("cusum_final"),
        F.col("acc.m").alias("cusum_max"),
        (F.col("acc.m") > _DRIFT_CENTS).alias("drifted"),
    )


# -- time-weighted average (TWAP) ---------------------------------------------

# Each observation holds until the next one, capped at 1 hour (stale
# quotes don't extend forever — and the cap bounds cents×micros products
# far inside int64).
_HOLD_CAP_US = 3_600 * 1_000_000
_TWAP_SRC = """
    SELECT user_id, event_id, ts,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
      AND value > -1e6 AND value < 1e6
"""


@query(
    "q_twap",
    oracle=f"""
    WITH ev AS ({_TWAP_SRC}),
    held AS (
        SELECT user_id, cents,
               LEAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts),
                     {_HOLD_CAP_US}) AS dur_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(dur_us) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS held_us,
           CAST(SUM(cents * dur_us) AS DOUBLE) / SUM(dur_us)
               AS twap_cents
    FROM held
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dur_us) > 0
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per user: each value holds from its
    timestamp to the next observation (capped at 1 h), TWAP =
    Σ(value·held)/Σ(held). The integral is EXACT integer arithmetic
    (cents × capped micros stays far inside int64 under the ±1e6 value
    domain), so partial-agg order can't drift the sum; the single
    division is deterministic. One window + one aggregate, both
    partitioned by user_id → one Exchange. Zero-duration runs (all
    events simultaneous) drop out via the HAVING guard identically on
    both engines."""
    ev = catalog.load(spark, sf_dir, "events")
    ev = (
        ev.filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("value") > -1e6)
            & (F.col("value") < 1e6)
        ).select(
            "user_id",
            "event_id",
            "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    nxt_us = F.unix_micros(F.lead(F.col("ts")).over(w).cast("timestamp"))
    held = ev.select(
        "user_id",
        "cents",
        F.least(nxt_us - us, F.lit(_HOLD_CAP_US)).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        held.groupBy("user_id")
        .agg(
            F.count("dur_us").alias("n_intervals"),
            F.sum("dur_us").alias("held_us"),
            (
                F.sum(F.col("cents") * F.col("dur_us")).cast("double")
                / F.sum("dur_us")
            ).alias("twap_cents"),
        )
        .filter(F.col("held_us") > 0)
    )


# -- OHLC bars ----------------------------------------------------------------


@query(
    "q_ohlc_bars",
    oracle=f"""
    WITH ev AS ({_EV_CENTS}),
    ranked AS (
        SELECT user_id, date_trunc('hour', ts) AS bar_hour, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM ev
    )
    SELECT user_id, bar_hour,
           CAST(SUM(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(SUM(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM ranked
    GROUP BY user_id, bar_hour
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlesticks per user: open/close elected by rank
    position (first/last by (ts, event_id) — deterministic under
    simultaneous ticks, where naive first_value windows are not),
    high/low as plain MIN/MAX. Both ranking windows and the final
    aggregate share the (user, hour) partitioning → one Exchange. The
    standard market-data / telemetry downsample, exact in integer
    cents."""
    ev = _ev_cents(spark, sf_dir)
    ev = ev.withColumn("bar_hour", F.date_trunc("hour", "ts"))
    by_bar = Window.partitionBy("user_id", "bar_hour")
    ranked = ev.select(
        "user_id",
        "bar_hour",
        "cents",
        F.row_number().over(by_bar.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(by_bar.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_d"),
    )
    return ranked.groupBy("user_id", "bar_hour").agg(
        F.sum(F.when(F.col("rn_a") == 1, F.col("cents"))).cast("bigint").alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.sum(F.when(F.col("rn_d") == 1, F.col("cents"))).cast("bigint").alias("close_cents"),
        F.count("*").alias("n_ticks"),
    )

# -- winsorization ------------------------------------------------------------


@query(
    "q_winsorize",
    oracle=f"""
    WITH ev AS ({_EV_CENTS}),
    ranked AS (
        SELECT user_id, event_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cents, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM ev
    ),
    bounds AS (
        SELECT user_id, event_id, cents,
               CAST(SUM(CASE WHEN rn = (5 * n + 99) // 100 THEN cents END)
                    OVER (PARTITION BY user_id) AS BIGINT) AS lo_cents,
               CAST(SUM(CASE WHEN rn = (95 * n + 99) // 100 THEN cents END)
                    OVER (PARTITION BY user_id) AS BIGINT) AS hi_cents
        FROM ranked
    )
    SELECT user_id, event_id, cents,
           LEAST(GREATEST(cents, lo_cents), hi_cents) AS cents_wins,
           lo_cents, hi_cents
    FROM bounds
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5/95 winsorization — the ML-preprocessing clip that
    tames heavy tails without dropping rows. Percentiles are
    nearest-rank POSITIONAL (rank ⌈p·n⌉ elected by a margin-sum over
    the rank window — integer-exact, no interpolation to disagree on),
    then a pure LEAST/GREATEST clip. Rank window + margin window share
    the user_id partitioning: one Exchange."""
    ev = _ev_cents(spark, sf_dir)
    by_user = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "event_id",
        "cents",
        F.row_number().over(by_user.orderBy("cents", "event_id")).alias("rn"),
        F.count("*").over(by_user).alias("n"),
    )
    lo_k = F.expr("(5 * n + 99) div 100")
    hi_k = F.expr("(95 * n + 99) div 100")
    bounds = ranked.select(
        "user_id",
        "event_id",
        "cents",
        F.sum(F.when(F.col("rn") == lo_k, F.col("cents"))).over(by_user).alias("lo_cents"),
        F.sum(F.when(F.col("rn") == hi_k, F.col("cents"))).over(by_user).alias("hi_cents"),
    )
    return bounds.select(
        "user_id",
        "event_id",
        "cents",
        F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents")).alias(
            "cents_wins"
        ),
        "lo_cents",
        "hi_cents",
    )


# -- composite: scrub → time-weighted aggregate -------------------------------


@query(
    "q_telemetry_pipeline",
    oracle=f"""
    WITH ev AS ({_EV_CENTS}),
    {_MAD_SQL},
    scrubbed AS (
        SELECT user_id, event_id, ts, cents,
               CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END AS is_outlier
        FROM mad
    ),
    held AS (
        SELECT user_id, cents,
               LEAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts),
                     {_HOLD_CAP_US}) AS dur_us
        FROM scrubbed WHERE is_outlier = 0
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    twap AS (
        SELECT user_id,
               CAST(SUM(dur_us) AS BIGINT) AS held_us,
               CAST(SUM(cents * dur_us) AS DOUBLE) / SUM(dur_us)
                   AS twap_cents
        FROM held WHERE dur_us IS NOT NULL
        GROUP BY user_id HAVING SUM(dur_us) > 0
    ),
    counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_raw,
               CAST(SUM(is_outlier) AS BIGINT) AS n_outliers
        FROM scrubbed GROUP BY user_id
    )
    SELECT c.user_id, c.n_raw, c.n_outliers, t.held_us, t.twap_cents
    FROM counts c JOIN twap t ON c.user_id = t.user_id
    """,
)
def q_telemetry_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite telemetry dataflow: MAD-scrub each user's series, then
    compute the time-weighted average over the SURVIVING observations
    (hold-until-next re-derived after the scrub — removing a spike also
    removes its hold interval, which a naive pre-computed-duration join
    would corrupt). Demonstrates cross-family composition: the
    _mad_flagged window chain feeds the TWAP integral, counts ride the
    same scan. Every stage is user_id-partitioned, so the whole
    pipeline is Exchange-light and the 100 TB shape is the sum of its
    pinned parts."""
    mad = _mad_flagged(_ev_cents(spark, sf_dir)).withColumn(
        "is_outlier",
        F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1).otherwise(0),
    )
    counts = mad.groupBy("user_id").agg(
        F.count("*").alias("n_raw"),
        F.sum("is_outlier").alias("n_outliers"),
    )
    clean = mad.filter(F.col("is_outlier") == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    nxt_us = F.unix_micros(F.lead(F.col("ts")).over(w).cast("timestamp"))
    held = clean.select(
        "user_id",
        "cents",
        F.least(nxt_us - us, F.lit(_HOLD_CAP_US)).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    twap = (
        held.groupBy("user_id")
        .agg(
            F.sum("dur_us").alias("held_us"),
            (
                F.sum(F.col("cents") * F.col("dur_us")).cast("double")
                / F.sum("dur_us")
            ).alias("twap_cents"),
        )
        .filter(F.col("held_us") > 0)
    )
    return counts.join(twap, "user_id").select(
        "user_id", "n_raw", "n_outliers", "held_us", "twap_cents"
    )

# -- rolling regression slope -------------------------------------------------


@query(
    "q_rolling_slope",
    oracle=f"""
    WITH ev AS ({_EV_CENTS}),
    seq AS (
        SELECT user_id, event_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
        FROM ev
    ),
    roll AS (
        SELECT user_id, event_id, cents, x,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx,
               SUM(cents) OVER w AS sy,
               SUM(x * cents) OVER w AS sxy,
               SUM(x * x) OVER w AS sxx
        FROM seq
        WINDOW w AS (PARTITION BY user_id ORDER BY x
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS slope
    FROM roll WHERE n >= 3
    """,
)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend per user: the regression slope of value
    against event index over the trailing 20 observations — the
    windowed sibling of q_regr_ols and the standard drift/trend
    feature. The four sufficient statistics ride ONE rows-frame window
    each (O(1) per row via Spark's running frame), all exact integers;
    the closed form divides identical doubles. Windows share the
    user_id partitioning → one Exchange."""
    ev = _ev_cents(spark, sf_dir)
    seq = ev.select(
        "user_id",
        "event_id",
        "cents",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("x"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-19, Window.currentRow)
    )
    roll = seq.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("cents").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("cents")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    slope = (n_d * F.col("sxy") - sx_d * F.col("sy")) / (
        n_d * F.col("sxx") - sx_d * F.col("sx")
    )
    return roll.filter(F.col("n") >= 3).select(
        "user_id",
        "event_id",
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope"),
    )


# -- seasonal residual --------------------------------------------------------


@query(
    "q_seasonal_residual",
    oracle=f"""
    WITH ev AS ({_EV_CENTS}),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(SUM(cents) AS BIGINT) AS csum,
               CAST(COUNT(*) AS BIGINT) AS cn
        FROM ev GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT cur.user_id, cur.h,
           CAST(cur.csum AS DOUBLE) / cur.cn AS cur_avg,
           CAST(prev.csum AS DOUBLE) / prev.cn AS prev_avg,
           CAST(cur.csum AS DOUBLE) / cur.cn
             - CAST(prev.csum AS DOUBLE) / prev.cn AS residual
    FROM hourly cur
    JOIN hourly prev
      ON prev.user_id = cur.user_id
     AND prev.h = cur.h - INTERVAL 24 HOURS
    """,
)
def q_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly signal: each user-hour's mean value minus
    the SAME hour yesterday — the day-period baseline that flags
    'unusual for 3 pm' instead of 'unusual overall'. Hourly means are
    exact rationals (int sum / int count → identical doubles, emitted
    unrounded per the §41 ROUND finding); the lag-by-time is a
    self-join on the shifted hour key (co-partitioned on user_id —
    never a windows-over-gaps hack that breaks on missing hours)."""
    ev = _ev_cents(spark, sf_dir)
    hourly = (
        ev.withColumn("h", F.date_trunc("hour", "ts"))
        .groupBy("user_id", "h")
        .agg(F.sum("cents").alias("csum"), F.count("*").alias("cn"))
    )
    cur = hourly.select(
        "user_id",
        "h",
        (F.col("csum").cast("double") / F.col("cn")).alias("cur_avg"),
    )
    prev = hourly.select(
        "user_id",
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h"),
        (F.col("csum").cast("double") / F.col("cn")).alias("prev_avg"),
    )
    return cur.join(prev, ["user_id", "h"]).select(
        "user_id",
        "h",
        "cur_avg",
        "prev_avg",
        (F.col("cur_avg") - F.col("prev_avg")).alias("residual"),
    )

# -- feature-store materialization --------------------------------------------


@query(
    "q_user_features",
    oracle=f"""
    WITH ev AS ({_EV_CENTS}),
    {_MAD_SQL},
    base AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM ev GROUP BY user_id
    ),
    gaps AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                        THEN 1 ELSE 0 END AS is_new
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions
        FROM gaps GROUP BY user_id
    ),
    outl AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM mad GROUP BY user_id
    ),
    held AS (
        SELECT user_id, cents,
               LEAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts),
                     {_HOLD_CAP_US}) AS dur_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    twap AS (
        SELECT user_id,
               CAST(SUM(cents * dur_us) AS DOUBLE) / SUM(dur_us)
                   AS twap_cents
        FROM held WHERE dur_us IS NOT NULL
        GROUP BY user_id HAVING SUM(dur_us) > 0
    )
    SELECT b.user_id, b.n_events, b.active_days,
           CAST(b.sum_cents AS DOUBLE) / b.n_events AS mean_cents,
           s.n_sessions, o.n_outliers, t.twap_cents
    FROM base b
    JOIN sess s ON s.user_id = b.user_id
    JOIN outl o ON o.user_id = b.user_id
    LEFT JOIN twap t ON t.user_id = b.user_id
    """,
)
def q_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store materialization: the per-entity feature matrix a
    training pipeline snapshots daily — event volume, active days,
    exact-rational mean, 30-min session count, robust outlier count,
    and time-weighted average, assembled from this package's verified
    fragments (sessionize gap rule, _mad_flagged, the TWAP integral).
    Every branch aggregates on user_id, so the joins are co-partitioned
    — AQE reuses one Exchange partitioning across the whole assembly;
    TWAP left-joins (single-event users have no hold interval, feature
    stays NULL rather than fabricated)."""
    ev = _ev_cents(spark, sf_dir)
    base = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.to_date("ts")).alias("active_days"),
        F.sum("cents").alias("sum_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts")).over(w).cast("timestamp")
    )
    is_new = F.when(
        F.lag("ts").over(w).isNull() | (gap_us >= 1800 * 1_000_000), 1
    ).otherwise(0)
    sess = (
        ev.select("user_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"))
    )
    outl = (
        _mad_flagged(ev)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_outliers")
        )
    )
    nxt_us = F.unix_micros(F.lead(F.col("ts")).over(w).cast("timestamp"))
    cur_us = F.unix_micros(F.col("ts").cast("timestamp"))
    held = ev.select(
        "user_id",
        "cents",
        F.least(nxt_us - cur_us, F.lit(_HOLD_CAP_US)).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    twap = (
        held.groupBy("user_id")
        .agg(
            F.sum("dur_us").alias("_held"),
            (
                F.sum(F.col("cents") * F.col("dur_us")).cast("double")
                / F.sum("dur_us")
            ).alias("twap_cents"),
        )
        .filter(F.col("_held") > 0)
        .select("user_id", "twap_cents")
    )
    return (
        base.join(sess, "user_id")
        .join(outl, "user_id")
        .join(twap, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "active_days",
            (F.col("sum_cents").cast("double") / F.col("n_events")).alias("mean_cents"),
            "n_sessions",
            "n_outliers",
            "twap_cents",
        )
    )

# -- multi-touch attribution --------------------------------------------------


@query(
    "q_attribution",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS purchase_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    v AS (
        SELECT user_id, event_id AS view_id, ts AS v_ts
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL
    ),
    touches AS (
        SELECT p.purchase_id, p.user_id, v.view_id, v.v_ts
        FROM p JOIN v
          ON v.user_id = p.user_id
         AND v.v_ts <= p.p_ts
         AND v.v_ts >= p.p_ts - INTERVAL 1 HOUR
    )
    SELECT purchase_id, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(MAX(view_id) FILTER (WHERE v_ts = mx) AS BIGINT) AS last_touch_view,
           1.0 / COUNT(*) AS linear_credit_each
    FROM (SELECT *, MAX(v_ts) OVER (PARTITION BY purchase_id) AS mx FROM touches)
    GROUP BY purchase_id, user_id
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: for every purchase, the views by the
    same user in the preceding hour are its touches; emit the touch
    count, the last-touch view (deterministic: max view_id among the
    latest-timestamp touches), and the linear-model credit each touch
    receives (1/n — exact dyadic-or-not, identical division both
    engines). The time-bound join is the batch twin of the
    stream-stream attribution join (q_stream_join): an equi-join on
    user_id with the interval predicate riding it — never a cross
    join; the per-purchase window runs on the already-joined touch
    table."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    touches = p.join(
        v,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    mx = F.max("v_ts").over(Window.partitionBy("purchase_id"))
    flagged = touches.withColumn("mx", mx)
    return flagged.groupBy("purchase_id", "user_id").agg(
        F.count("*").alias("n_touches"),
        F.max(F.when(F.col("v_ts") == F.col("mx"), F.col("view_id")))
        .cast("bigint")
        .alias("last_touch_view"),
        (F.lit(1.0) / F.count("*")).alias("linear_credit_each"),
    )


@query(
    "q_holt_linear",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM ({_EV_CENTS})
    ),
    last AS (SELECT user_id, MAX(rn) AS n_events FROM ev GROUP BY user_id),
    r AS (
        SELECT user_id, rn, CAST(cents AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT ev.user_id, ev.rn,
               (ev.cents + r.l + r.b) / 2.0,
               (((ev.cents + r.l + r.b) / 2.0 - r.l) + r.b) / 2.0
        FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
    )
    SELECT r.user_id, last.n_events, r.l AS level_cents, r.b AS trend_cents,
           r.l + r.b AS forecast_next
    FROM r JOIN last ON r.user_id = last.user_id AND r.rn = last.n_events
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double) exponential smoothing, α = β = 1/2: the
    trend-aware sibling of q_ewma, ending in a one-step forecast
    l + b. The recurrence folds a TWO-field struct accumulator
    (level, trend) left-to-right over the time-sorted array — same JVM
    ``aggregate()`` shape as the EWMA/CUSUM folds, one shuffle on
    user_id. Dyadic coefficients keep every step an add + exact
    halving, so Spark's fold and the oracle's recursive CTE agree
    BITWISE with no defensive rounding. The inherently sequential
    operator class (PERFORMANCE.md §25): parallel across keys,
    sequential within — exactly how a forecaster runs at 100 TB."""
    ev = _ev_cents(spark, sf_dir)
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "cents")))
    g = folds.enforce_series_cap(ev.groupBy("user_id").agg(arr.alias("evs")), "evs")
    return g.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.expr(
            "aggregate("
            "  slice(evs, 2, greatest(size(evs) - 1, 0)),"
            "  named_struct('l', cast(element_at(evs, 1).cents AS double),"
            "               'b', cast(0 AS double)),"
            "  (acc, e) -> named_struct("
            "    'l', (e.cents + acc.l + acc.b) / 2.0D,"
            "    'b', (((e.cents + acc.l + acc.b) / 2.0D - acc.l) + acc.b) / 2.0D)"
            ").l"
        ).alias("level_cents"),
        F.expr(
            "aggregate("
            "  slice(evs, 2, greatest(size(evs) - 1, 0)),"
            "  named_struct('l', cast(element_at(evs, 1).cents AS double),"
            "               'b', cast(0 AS double)),"
            "  (acc, e) -> named_struct("
            "    'l', (e.cents + acc.l + acc.b) / 2.0D,"
            "    'b', (((e.cents + acc.l + acc.b) / 2.0D - acc.l) + acc.b) / 2.0D)"
            ").b"
        ).alias("trend_cents"),
    ).withColumn("forecast_next", F.col("level_cents") + F.col("trend_cents"))


@query(
    "q_autocorr",
    oracle="""
    WITH ac AS (
        SELECT ts, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND value > -1e7 AND value < 1e7
    ),
    hourly AS (
        SELECT date_trunc('hour', ts) AS hr,
               CAST(SUM(cents) AS BIGINT) AS x
        FROM ac GROUP BY 1
    ),
    pairs AS (
        SELECT x, LEAD(x) OVER (ORDER BY hr) AS y FROM hourly
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs WHERE y IS NOT NULL
    )
    SELECT n, sx, sy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS r_lag1
    FROM s
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly revenue series — the
    seasonality screen run before choosing a forecast model. The corpus
    reduces to the HOUR table (one partial-agg shuffle; time-span
    bounded regardless of event count), the lead-pairing window runs
    over that bounded table, and Pearson r comes from exact BIGINT
    sufficient statistics with one fixed IEEE tree (×,−,/,sqrt are
    exactly rounded). Same no-Welford-drift argument as q_corr_matrix.
    Domain contract: event values bounded to ±$100k (tighter than the
    ±1e12 house bound — Σx² must fit int64 with headroom; the edge
    corpus's ±$21M row overflowed the square under the loose bound).
    Beyond that domain, lift the accumulators to DECIMAL(38,0) — the
    plan shape is unchanged."""
    e = catalog.load(spark, sf_dir, "events")
    ev = e.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > -1e7)
        & (F.col("value") < 1e7)
    ).select("ts", F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum("cents").cast("bigint").alias("x")
    )
    w = Window.orderBy("hr")
    pairs = hourly.select("x", F.lead("x").over(w).alias("y")).filter(
        F.col("y").isNotNull()
    )
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * F.col("sxy") - d("sx") * F.col("sy")
    den = F.sqrt(d("n") * F.col("sxx") - d("sx") * F.col("sx")) * F.sqrt(
        d("n") * F.col("syy") - d("sy") * F.col("sy")
    )
    return s.select("n", "sx", "sy", (num / den).alias("r_lag1"))


@query(
    "q_iqr_outliers",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cents, event_id) AS rn,
               COUNT(*)    OVER (PARTITION BY user_id) AS n
        FROM ({_EV_CENTS})
    ),
    q AS (
        SELECT user_id, event_id, cents,
               MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END)
                   OVER (PARTITION BY user_id) AS q1,
               MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END)
                   OVER (PARTITION BY user_id) AS q3
        FROM ev
    )
    SELECT user_id, event_id, cents,
           CAST(q1 AS BIGINT) AS q1, CAST(q3 AS BIGINT) AS q3,
           2 * cents < 2 * q1 - 3 * (q3 - q1)
             OR 2 * cents > 2 * q3 + 3 * (q3 - q1) AS is_outlier
    FROM q
    """,
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outliers (1.5×IQR beyond the quartiles) — the
    third robust-outlier detector beside q_anomaly_zscore (moment-based)
    and q_mad_outliers (median-based). Quartiles are NEAREST-RANK
    positional picks (rank ⌈n/4⌉ / ⌈3n/4⌉) elected by windowed MAX over
    the rank match — all integer, no interpolation — and the 1.5×
    fences are tested in doubled integers (2·x vs 2·q ± 3·IQR), so the
    flag predicate is exact on both engines. One Exchange on user_id
    carries the rank window, the two quartile elections, and the flag."""
    ev = _ev_cents(spark, sf_dir)
    by_user = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "event_id",
        "cents",
        F.row_number().over(by_user.orderBy("cents", "event_id")).alias("rn"),
        F.count("*").over(by_user).alias("n"),
    )
    q1_pos = F.expr("(n + 3) div 4")
    q3_pos = F.expr("(3 * n + 3) div 4")
    q = ranked.select(
        "user_id",
        "event_id",
        "cents",
        F.max(F.when(F.col("rn") == q1_pos, F.col("cents"))).over(by_user).alias("q1"),
        F.max(F.when(F.col("rn") == q3_pos, F.col("cents"))).over(by_user).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return q.select(
        "user_id",
        "event_id",
        "cents",
        F.col("q1").cast("bigint").alias("q1"),
        F.col("q3").cast("bigint").alias("q3"),
        (
            (2 * F.col("cents") < 2 * F.col("q1") - 3 * iqr)
            | (2 * F.col("cents") > 2 * F.col("q3") + 3 * iqr)
        ).alias("is_outlier"),
    )


@query(
    "q_clamped_balance",
    oracle="""
    WITH RECURSIVE ev AS (
        SELECT user_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100) AS BIGINT)
                    ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS delta,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
          AND value > -1e12 AND value < 1e12
          AND event_type IN ('purchase', 'error')
    ),
    last AS (SELECT user_id, MAX(rn) AS n_moves FROM ev GROUP BY user_id),
    r AS (
        SELECT user_id, rn,
               CAST(GREATEST(0, delta) AS BIGINT) AS bal
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT ev.user_id, ev.rn,
               CAST(GREATEST(0, r.bal + ev.delta) AS BIGINT)
        FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1
    )
    SELECT r.user_id, last.n_moves, r.bal AS final_balance_cents
    FROM r JOIN last ON r.user_id = last.user_id AND r.rn = last.n_moves
    """,
)
def q_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance (inventory/prepaid-credit
    semantics): bal_t = max(0, bal_{t-1} + Δ_t), credits from purchases,
    debits from errors. The clamp makes the recurrence NON-associative
    — no window or prefix-sum can express it — so it folds
    left-to-right over the time-sorted array exactly like the
    EWMA/CUSUM/Holt family, except the accumulator here is a pure
    INT64: zero floating point anywhere, so Spark's fold and the
    recursive-CTE oracle agree by integer identity, not IEEE argument.
    One shuffle on user_id; parallel across keys, sequential within —
    the inherent shape of stateful balance tracking at 100 TB."""
    e = catalog.load(spark, sf_dir, "events")
    moves = (
        e.filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & (F.col("value") > -1e12)
            & (F.col("value") < 1e12)
            & F.col("event_type").isin("purchase", "error")
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            )
            .otherwise(-F.round(F.col("value") * 100).cast("bigint"))
            .alias("delta"),
        )
    )
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "delta")))
    g = folds.enforce_series_cap(moves.groupBy("user_id").agg(arr.alias("mv")), "mv")
    return g.select(
        "user_id",
        F.size("mv").cast("bigint").alias("n_moves"),
        F.expr(
            "aggregate("
            "  slice(mv, 2, greatest(size(mv) - 1, 0)),"
            "  greatest(0L, element_at(mv, 1).delta),"
            "  (acc, e) -> greatest(0L, acc + e.delta)"
            ")"
        ).cast("bigint").alias("final_balance_cents"),
    )


@query(
    "q_control_chart",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND value > -1e7 AND value < 1e7
        GROUP BY 1
    ),
    mr AS (
        SELECT hr, x,
               ABS(x - LAG(x) OVER (ORDER BY hr)) AS moving_range
        FROM hourly
    ),
    s AS (
        SELECT CAST(COUNT(x) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sum_x,
               CAST(COUNT(moving_range) AS BIGINT) AS n_mr,
               CAST(SUM(moving_range) AS BIGINT) AS sum_mr
        FROM mr
    ),
    lim AS (
        SELECT n, n_mr,
               CAST(sum_x AS DOUBLE) / n AS center,
               CAST('2.66' AS DOUBLE) * CAST(sum_mr AS DOUBLE) / n_mr AS spread
        FROM s
    )
    SELECT m.hr AS hour_label, m.x,
           l.center AS center_line,
           l.center - l.spread AS lcl,
           l.center + l.spread AS ucl,
           m.x < l.center - l.spread OR m.x > l.center + l.spread
               AS out_of_control
    FROM mr m CROSS JOIN lim l
    """,
)
def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals + moving-range) control chart over the hourly
    revenue series — the SPC screen SRE/manufacturing dashboards run
    before alerting: center line = mean, limits = x̄ ± 2.66·m̄R (the
    2.66 anti-biasing constant rides as a string-cast literal). Each
    statistic is an exact-integer sum with ONE division; the limits
    join back as a single-row broadcast, so the flag is evaluated
    row-locally against identical doubles on both engines. Completes
    the anomaly family: z-score (distribution), MAD/IQR (robust),
    CUSUM (drift), XmR (process control)."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > -1e7)
        & (F.col("value") < 1e7)
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("x")
    )
    # hour-domain window (bounded by calendar span)
    mr = hourly.withColumn(
        "moving_range", F.abs(F.col("x") - F.lag("x").over(Window.orderBy("hr")))
    )
    s = mr.agg(
        F.count("x").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.count("moving_range").cast("bigint").alias("n_mr"),
        F.sum("moving_range").cast("bigint").alias("sum_mr"),
    )
    lim = s.select(
        (F.col("sum_x").cast("double") / F.col("n")).alias("center"),
        (
            F.lit("2.66").cast("double")
            * F.col("sum_mr").cast("double")
            / F.col("n_mr")
        ).alias("spread"),
    )
    out = mr.join(F.broadcast(lim))  # single-row broadcast
    return out.select(
        F.col("hr").alias("hour_label"),
        "x",
        F.col("center").alias("center_line"),
        (F.col("center") - F.col("spread")).alias("lcl"),
        (F.col("center") + F.col("spread")).alias("ucl"),
        (
            (F.col("x") < F.col("center") - F.col("spread"))
            | (F.col("x") > F.col("center") + F.col("spread"))
        ).alias("out_of_control"),
    )


@query(
    "q_ma_crossover",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND value > -1e12 AND value < 1e12
        GROUP BY 1
    ),
    ma AS (
        SELECT day, cents,
               CAST(SUM(cents) OVER (ORDER BY day
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum5,
               COUNT(*) OVER (ORDER BY day
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n5,
               CAST(SUM(cents) OVER (ORDER BY day
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum20,
               COUNT(*) OVER (ORDER BY day
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n20
        FROM daily
    ),
    sig AS (
        SELECT day, cents, sum5, sum20,
               CASE WHEN n5 = 5 AND n20 = 20
                    THEN sum5 * 20 > sum20 * 5 END AS short_above,
               LAG(CASE WHEN n5 = 5 AND n20 = 20
                        THEN sum5 * 20 > sum20 * 5 END) OVER (ORDER BY day)
                   AS prev_above
        FROM ma
    )
    SELECT day, cents, sum5, sum20, short_above,
           COALESCE(short_above AND NOT prev_above, FALSE) AS golden_cross
    FROM sig
    """,
)
def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover signal (the technical-analysis golden
    cross) on the daily revenue series — with the division-free trick:
    MA5 > MA20 ⇔ 20·sum5 > 5·sum20, so the comparison is pure BIGINT
    and cannot flip on a rounding epsilon the way two divided averages
    can. Warm-up rows (fewer than the full window) emit NULL rather
    than a partial-window lie; the cross flag is the lag'd sign change.
    Day-domain windows over the daily table (calendar-bounded)."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > -1e12)
        & (F.col("value") < 1e12)
    )
    daily = e.groupBy(F.col("ts").cast("date").cast("string").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents")
    )
    w5 = Window.orderBy("day").rowsBetween(-4, 0)
    w20 = Window.orderBy("day").rowsBetween(-19, 0)
    ma = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w5).cast("bigint").alias("sum5"),
        F.count("*").over(w5).alias("n5"),
        F.sum("cents").over(w20).cast("bigint").alias("sum20"),
        F.count("*").over(w20).alias("n20"),
    )
    above = F.when(
        (F.col("n5") == 5) & (F.col("n20") == 20),
        F.col("sum5") * 20 > F.col("sum20") * 5,
    )
    sig = ma.select(
        "day",
        "cents",
        "sum5",
        "sum20",
        above.alias("short_above"),
        F.lag(above).over(Window.orderBy("day")).alias("prev_above"),
    )
    return sig.select(
        "day",
        "cents",
        "sum5",
        "sum20",
        "short_above",
        F.coalesce(
            F.col("short_above") & ~F.col("prev_above"), F.lit(False)
        ).alias("golden_cross"),
    )


@query(
    "q_duplicate_payments",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
          AND user_id IS NOT NULL AND value IS NOT NULL
          AND value > -1e12 AND value < 1e12
    )
    SELECT user_id, event_id, prev_event_id, cents,
           CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_s
    FROM (
        SELECT user_id, event_id, ts, cents,
               LAG(ts) OVER (PARTITION BY user_id, cents
                             ORDER BY ts, event_id) AS prev_ts,
               LAG(event_id) OVER (PARTITION BY user_id, cents
                                   ORDER BY ts, event_id) AS prev_event_id
        FROM p
    )
    WHERE prev_ts IS NOT NULL
      AND date_diff('second', prev_ts, ts) <= 600
    """,
)
def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen (the double-charge / double-click fraud
    pattern): same user, same exact amount, within 10 minutes of the
    previous identical charge. One window over (user, cents) — the
    partition key encodes the matching rule so no self-join is ever
    needed — and the flag is an integer seconds-gap comparison. Ties
    on identical timestamps break by event_id, so simultaneous
    identical charges always pair deterministically."""
    e = catalog.load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > -1e12)
        & (F.col("value") < 1e12)
    )
    p = e.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id", "cents").orderBy("ts", "event_id")
    lagged = p.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lag("event_id").over(w).alias("prev_event_id"),
    )
    # floor-to-seconds BEFORE subtracting: DuckDB date_diff('second')
    # counts boundary crossings, not the truncated microsecond delta
    gap = F.expr(
        "unix_micros(cast(ts as timestamp)) div 1000000"
    ) - F.expr("unix_micros(cast(prev_ts as timestamp)) div 1000000")
    return lagged.filter(
        F.col("prev_ts").isNotNull() & (gap <= 600)
    ).select(
        "user_id",
        "event_id",
        "prev_event_id",
        "cents",
        gap.cast("bigint").alias("gap_s"),
    )


@query(
    "q_purchase_cycle",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, event_id
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    gaps AS (
        SELECT CAST(date_diff('second',
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) AS BIGINT) AS gap_s
        FROM p
    ),
    g AS (SELECT gap_s FROM gaps WHERE gap_s IS NOT NULL),
    r AS (
        SELECT gap_s,
               ROW_NUMBER() OVER (ORDER BY gap_s) AS rn,
               COUNT(*) OVER () AS n
        FROM g
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN gap_s END) AS BIGINT)
               AS p25_s,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_s END) AS BIGINT)
               AS p50_s,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN gap_s END) AS BIGINT)
               AS p75_s,
           CAST(MIN(gap_s) AS BIGINT) AS min_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_s
    FROM r
    """,
)
def q_purchase_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repurchase-cycle distribution: exact quartiles of the
    seconds-gap between each user's consecutive purchases — the number
    behind replenishment reminders and churn-risk windows ('customer
    is 2× their median cycle overdue'). Per-user lag rides one
    user_id exchange; the pooled gap table then takes the nearest-rank
    election on the scalable rank (the oracle's global window is
    semantics only — here the rank uses operators/ranking.global_rank
    because the GAP table is corpus-sized, unlike the day-domain
    tables elsewhere)."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    e = catalog.load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    # DuckDB date_diff('second') counts SECOND-BOUNDARY crossings
    # (floor(b) − floor(a)), not the truncated microsecond difference —
    # floor each endpoint to epoch seconds BEFORE subtracting.
    sec = lambda c: F.expr(f"unix_micros(cast({c} as timestamp)) div 1000000")  # noqa: E731
    gaps = (
        e.select(
            (sec("ts") - F.expr(
                "unix_micros(cast(lag(ts) over "
                "(partition by user_id order by ts, event_id) as timestamp))"
                " div 1000000"
            )).alias("gap_s")
        )
        .filter(F.col("gap_s").isNotNull())
    )
    # unique total order for the rank: (gap_s, arbitrary-but-deterministic
    # tiebreak) — monotonically_increasing_id is NOT deterministic, so
    # rank on the value alone with row_number inside global_rank's sort;
    # ties in gap_s are interchangeable for positional election.
    n_row = gaps.agg(F.count("*").cast("bigint").alias("_n"))
    r = ranking.global_rank(
        gaps.join(F.broadcast(n_row)), [F.col("gap_s").asc()]
    )
    pick = lambda pos: F.max(F.when(F.col("rn") == F.expr(pos), F.col("gap_s")))  # noqa: E731
    return r.select(F.col("gap_s"), F.col("rn"), F.col("_n").alias("n")).agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        pick("(n + 3) div 4").cast("bigint").alias("p25_s"),
        pick("(n + 1) div 2").cast("bigint").alias("p50_s"),
        pick("(3 * n + 3) div 4").cast("bigint").alias("p75_s"),
        F.min("gap_s").cast("bigint").alias("min_s"),
        F.max("gap_s").cast("bigint").alias("max_s"),
    )
