"""Sort / limit / top-k / window registrations (SURVEY §2.6).

Determinism: every rank/limit breaks ties on a unique id; running sums
accumulate integer cents (exact) instead of raw doubles so the window
evaluation strategy (incremental vs segment-tree) can't change a bit.
Scale: all windows partition on a natural key (customer/user), so state
per partition is bounded and the single sort-shuffle holds at 100 TB;
top-k uses TakeOrderedAndProject (per-partition heap + driver merge of k
rows, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators.dedup import (
    last_write_wins,
)
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# -- W1: bounded-scan top-k ----------------------------------------------------


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded scan with early exit (crs_ui_bot.py:165-177) generalized
    to top-k: orderBy+limit → TakeOrderedAndProject, ties broken by
    key."""
    o = catalog.load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# -- W2: ordered dimension -----------------------------------------------------


@query("q_sort", oracle="SELECT n_nationkey, n_name FROM nation ORDER BY n_name")
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alphabetically-stored county lists (App.js:17-113) as a sort."""
    return catalog.load(spark, sf_dir, "nation").select("n_nationkey", "n_name").orderBy("n_name")


# -- W3: latest-per-key ranking window ----------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest report per client (reports/ dir evidence;
    report_generator.py:64-65): ranking window, one shuffle on the
    partition key."""
    o = catalog.load(spark, sf_dir, "orders")
    return last_write_wins(o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")]).select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
    )


@query(
    "q_window_rank_skew",
    oracle="""
    WITH skewed AS (
      SELECT o_orderkey, o_orderdate,
             CASE WHEN o_orderkey % 10 = 0 THEN 0 ELSE o_custkey END AS o_custkey
      FROM orders)
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
    FROM skewed
    QUALIFY row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def q_window_rank_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_window_rank over a hot-key corpus (one synthetic customer owns
    ~10% of all orders — VERDICT r03 #6): the ranking window shuffles
    on the key, so the hot customer's rows serialize into one task.
    rank=1 per key only needs the per-key MAX, so a skew-robust
    rewrite exists (max_by aggregation pre-combines map-side); this
    key measures the plain window form's skew cost next to
    q_window_rank's uniform cost in the bench."""
    o = catalog.load(spark, sf_dir, "orders").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(0)).otherwise(F.col("o_custkey")),
    )
    return last_write_wins(o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")]).select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
    )


# -- W4: running aggregate -----------------------------------------------------


@query(
    "q_window_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(TRY_CAST(round(value * 100, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
           CAST(SUM(TRY_CAST(round(value * 100, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS running_value
    FROM events WHERE ts IS NOT NULL
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progress metric (App.js:521) as a running per-user sum —
    accumulated in integer cents so the result is exact (window-sum
    evaluation order differs between engines on doubles). NULL-ts rows
    are quarantined: they cannot take a place on a timeline (and the
    engines default their sort position differently)."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")  # non-finite -> NULL, both engines
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(cents).over(w)
    return ev.select(
        "event_id",
        "user_id",
        running.alias("running_cents"),
        (running.cast("double") / 100).alias("running_value"),
    )


# -- sliding event-time window (RANGE frame) -----------------------------------


@query(
    "q_sliding_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(TRY_CAST(round(value * 100, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_cents,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS hour_events
    FROM events
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour event-time window (RANGE frame): per-user trailing
    totals in integer cents. Spark's rangeBetween needs a numeric order
    key → epoch microseconds; RANGE peers are defined by ts alone so
    equal-ts rows share a frame on both engines (no tiebreak wanted
    here)."""
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")  # non-finite -> NULL, both engines
    # .cast("timestamp") first: unix_micros rejects TIMESTAMP_NTZ inputs
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("hour_cents"),
        F.count(F.lit(1)).over(w).alias("hour_events"),
    )


# -- null-handling battery -----------------------------------------------------


@query(
    "q_null_fns",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS status_or_null,
           ifnull(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           coalesce(NULL, NULL, o_orderpriority) AS pri,
           (o_orderstatus IS DISTINCT FROM 'O') AS not_open
    FROM orders
    """,
)
def q_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling battery (nullif / ifnull / coalesce / null-safe
    comparison) — the vocabulary of the reference's pervasive
    null-on-failure contract (SURVEY §1.2)."""
    o = catalog.load(spark, sf_dir, "orders")
    son = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        son.alias("status_or_null"),
        F.ifnull(son, F.lit("OPEN")).alias("status_filled"),
        F.coalesce(F.lit(None), F.lit(None), F.col("o_orderpriority")).alias("pri"),
        (~F.col("o_orderstatus").eqNullSafe("O")).alias("not_open"),
    )


# -- W5: lag comparison --------------------------------------------------------


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events WHERE ts IS NOT NULL
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abort-then-retry comparison (App.js:354-357): lag over the per-user
    timeline; row-local copy + IEEE subtraction, bit-exact. NULL-ts rows
    quarantined (no timeline position)."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
    )


# -- SCD2 interval build -------------------------------------------------------


@query(
    "q_scd2_intervals",
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
      WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
    SELECT user_id, event_type, ts AS effective_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS effective_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM changes
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build from an event
    log: consecutive duplicate states collapse (a no-op change opens no
    new version), each surviving change opens an interval closed by the
    next change's timestamp (half-open [from, to)), open intervals
    flagged current. Gaps-and-islands via lag/lead over ONE partitioning
    (user_id) — both windows and the change filter share the same
    shuffle; NULL-ts rows excluded on both engines (their placement in
    window order is engine-specific)."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_prev", F.lag("event_type").over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) | ~F.col("_prev").eqNullSafe(F.col("event_type")))
        .drop("_prev", "_rn")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w2).alias("effective_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@query(
    "q_window_count_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(DISTINCT event_type) OVER (PARTITION BY user_id)
                AS BIGINT) AS n_types
    FROM events
    """,
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a window — Spark rejects DISTINCT window
    aggregates outright, so this is the standard reformulation:
    dense_rank over (key ORDER BY value) peaks at the number of
    distinct values, minus one if a NULL ranked first (DISTINCT ignores
    NULLs, dense_rank does not). Both windows share the partition key →
    ONE shuffle, two sorts. The oracle runs the literal DISTINCT window
    (DuckDB supports it), pinning the reformulation's semantics."""
    ev = catalog.load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy(
        F.col("event_type").asc_nulls_first()
    )
    w_part = Window.partitionBy("user_id")
    dr = F.dense_rank().over(w_order)
    has_null = F.max(F.col("event_type").isNull().cast("int")).over(w_part)
    return ev.select(
        "event_id",
        "user_id",
        (F.max(dr).over(w_part) - has_null).cast("bigint").alias("n_types"),
    )


@query(
    "q_rank_fns",
    oracle="""
    SELECT event_id, user_id,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value NULLS FIRST, event_id)
    """,
)
def q_rank_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family over one window (one shuffle,
    one sort): rank / dense_rank / percent_rank / cume_dist.
    percent_rank = (rank-1)/(n-1) and cume_dist = peers/n divide
    identical integers on both engines, so the doubles are bit-portable
    (ties broken by event_id to pin rank itself). NaN sorts above +inf
    on both engines; NULL ordering is pinned explicitly — Spark
    defaults to NULLS FIRST ascending, DuckDB to NULLS LAST (caught by
    the edge corpus)."""
    ev = catalog.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q_next_greater",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE ts IS NOT NULL)
    SELECT a.event_id, a.user_id,
      (SELECT b.event_id FROM o b
        WHERE b.user_id = a.user_id AND b.rn > a.rn AND b.rn <= a.rn + 20
          AND b.value > a.value
        ORDER BY b.rn LIMIT 1) AS next_greater_id
    FROM o a
    """,
)
def q_next_greater(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-greater-event search, bounded horizon: for each event, the
    first LATER event of the same user (ts, event_id order) with a
    strictly greater value, looking at most 20 events ahead.

    Why the horizon: the unbounded form as a correlated LATERAL plans
    as a BroadcastNestedLoopJoin — measured 29 s at sf0.01 (vs 0.3 s
    here), i.e. quadratic per key and dead at scale. The bounded
    reformulation is 20 ``lead`` expressions over ONE window sort,
    searched with a row-local array filter — linear, one shuffle, and
    the bound is explicit in the semantics instead of hidden in the
    planner. NaN ranks above every number on both engines, so the
    strict > agrees; NULL values match nothing."""
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    H = 20
    nxt = F.array(
        *[
            F.lead(
                F.struct(F.col("value").alias("v"), F.col("event_id").alias("id")), h
            ).over(w)
            for h in range(1, H + 1)
        ]
    )
    hit = F.filter(nxt, lambda x: x.isNotNull() & (x["v"] > F.col("value")))
    return ev.select(
        "event_id",
        "user_id",
        F.get(hit, 0)["id"].alias("next_greater_id"),
    )


@query(
    "q_rolling_median",
    oracle="""
    SELECT user_id, event_id,
           MEDIAN(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 0.0 AS med7
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(value) AND NOT isinf(value)
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-row median per user — the robust smoother where
    rolling means get wrecked by outliers. Spark's ``percentile`` as a
    window aggregate; interpolation of the two middle values is
    order-independent (sorted operands), so the double output hashes
    identically to DuckDB's MEDIAN with no rounding. One shuffle on
    user_id; the frame is rows-bounded so state per key is O(7).

    Domain contract: finite readings only — NULL/NaN/±Inf rows are
    excluded up front. The engines disagree on NaN ordering inside a
    median (and DuckDB's windowed MEDIAN aborts outright on NaN input),
    so a robust-smoothing operator over sensor-style data filters
    non-finite junk before smoothing, which is what a real pipeline
    does anyway (the edge-corpus drive enforces this)."""
    ev = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    # + 0.0 canonicalizes negative zero (an exact identity otherwise):
    # Spark normalizes -0.0 in aggregate buffers, DuckDB preserves it
    return ev.select(
        "user_id",
        "event_id",
        (F.expr("percentile(value, 0.5)").over(w) + F.lit(0.0)).alias("med7"),
    )
