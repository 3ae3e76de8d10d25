"""ML feature-engineering operators: lag/rolling feature matrices,
leave-one-out target encoding, per-group min-max scaling.

These are the transforms a training-data pipeline runs right before
model fitting (reference analogy: the per-parcel derived fields the
dataflow computes before rendering — App.js:360-420 — generalized to
the feature-matrix shape a 100 TB feature store materializes daily).

Exactness strategy (the house rule from queries_stats.py): aggregate
integer cents with associative BIGINT sums so any partitioning yields
identical values, and perform AT MOST ONE double division per output
value with both engines evaluating the identical expression tree —
IEEE division is exactly rounded, so the driver's hash-compare cannot
flip a bit.

Scale notes:
- ``q_lag_features`` is one exchange (hash on custkey for the
  month-rollup; the window re-uses the same partitioning because the
  window key is a prefix of the agg key).
- ``q_target_encode`` is the window formulation (one exchange on the
  category key) rather than agg + join-back (two exchanges + a
  broadcast): the per-category statistics ride the same shuffle that
  the row-level encode needs anyway.
- ``q_minmax_scale`` shares that shape; min/max are order-insensitive
  so skewed categories cost memory O(1) per window buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# Shared integer projection: order revenue in exact cents.
_ORD_CENTS = """
    SELECT o_orderkey, o_custkey, o_orderpriority,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
           CAST(ROUND(o_totalprice * 100) AS BIGINT)      AS cents
    FROM orders
    WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
"""


def _ord_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = catalog.load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull())
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderpriority",
            F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )


@query(
    "q_lag_features",
    oracle=f"""
    WITH oc AS ({_ORD_CENTS}),
    m AS (
        SELECT o_custkey, month,
               CAST(SUM(cents) AS BIGINT) AS rev_cents,
               COUNT(*)                   AS n_orders
        FROM oc GROUP BY o_custkey, month
    )
    SELECT o_custkey, month, rev_cents, n_orders,
           LAG(rev_cents, 1)  OVER w AS rev_lag1,
           CAST(SUM(rev_cents) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT)             AS rev_roll3,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS period_idx
    FROM m
    WINDOW w AS (PARTITION BY o_custkey ORDER BY month)
    """,
)
def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer monthly lag/rolling feature matrix — the classic
    time-series feature block (lag-1, trailing-3 sum, period index)
    every demand-forecast training set starts from. One exchange: the
    month rollup hashes on (custkey, month) and the windows re-sort
    within the custkey partitions; all features are exact BIGINT."""
    m = (
        _ord_cents(spark, sf_dir)
        .groupBy("o_custkey", "month")
        .agg(
            F.sum("cents").cast("bigint").alias("rev_cents"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("month")
    return m.select(
        "o_custkey",
        "month",
        "rev_cents",
        "n_orders",
        F.lag("rev_cents", 1).over(w).alias("rev_lag1"),
        F.sum("rev_cents").over(w.rowsBetween(-2, 0)).cast("bigint").alias("rev_roll3"),
        F.row_number().over(w).cast("bigint").alias("period_idx"),
    )


@query(
    "q_target_encode",
    oracle=f"""
    WITH oc AS ({_ORD_CENTS}),
    s AS (
        SELECT o_orderkey, o_orderpriority, cents,
               CAST(SUM(cents) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS cat_sum,
               COUNT(*)        OVER (PARTITION BY o_orderpriority)            AS cat_n
        FROM oc
    )
    SELECT o_orderkey, o_orderpriority, cat_n,
           CASE WHEN cat_n > 1
                THEN ROUND(CAST(cat_sum - cents AS DOUBLE) / CAST(cat_n - 1 AS DOUBLE), 4)
           END AS loo_mean_cents
    FROM s
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of o_orderpriority against order
    value — the encoding that avoids self-leakage (each row's own
    target is excluded from its category mean). Window formulation:
    the category sums ride the one hash exchange the row-level encode
    needs anyway (vs agg + join-back = two exchanges). Exact BIGINT
    sufficient statistics; exactly one IEEE division per row."""
    w = Window.partitionBy("o_orderpriority")
    s = _ord_cents(spark, sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.sum("cents").over(w).cast("bigint").alias("cat_sum"),
        F.count("*").over(w).alias("cat_n"),
    )
    loo = (F.col("cat_sum") - F.col("cents")).cast("double") / (
        F.col("cat_n") - 1
    ).cast("double")
    return s.select(
        "o_orderkey",
        "o_orderpriority",
        "cat_n",
        F.when(F.col("cat_n") > 1, F.round(loo, 4)).alias("loo_mean_cents"),
    )


@query(
    "q_minmax_scale",
    oracle=f"""
    WITH oc AS ({_ORD_CENTS}),
    s AS (
        SELECT o_orderkey, o_orderpriority, cents,
               MIN(cents) OVER (PARTITION BY o_orderpriority) AS lo,
               MAX(cents) OVER (PARTITION BY o_orderpriority) AS hi
        FROM oc
    )
    SELECT o_orderkey, o_orderpriority, cents,
           CASE WHEN hi > lo
                THEN ROUND(CAST(cents - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE), 6)
           END AS scaled
    FROM s
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category min-max feature scaling to [0, 1] — NULL (not a
    fabricated 0.5) for degenerate single-value categories. Same
    one-exchange window shape as the target encoder; integer
    subtraction then a single exactly-rounded IEEE division."""
    w = Window.partitionBy("o_orderpriority")
    s = _ord_cents(spark, sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.min("cents").over(w).alias("lo"),
        F.max("cents").over(w).alias("hi"),
    )
    scaled = (F.col("cents") - F.col("lo")).cast("double") / (
        F.col("hi") - F.col("lo")
    ).cast("double")
    return s.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.when(F.col("hi") > F.col("lo"), F.round(scaled, 6)).alias("scaled"),
    )
