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
                THEN CAST(cat_sum - cents AS DOUBLE) / CAST(cat_n - 1 AS DOUBLE)
           END AS loo_mean_cents
    FROM s
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of o_orderpriority against order
    value — the encoding that avoids self-leakage (each row's own
    target is excluded from its category mean). Plan: groupBy the
    5-value category for exact BIGINT sufficient statistics (partial
    aggregation — each task emits at most 5 rows), then BROADCAST the
    tiny stats table back onto the row stream. The row side never
    shuffles, so parallelism is scan-bound at any scale; the previous
    whole-partition-window form concentrated the entire corpus into
    ≤5 window tasks (ADVICE r04 — the single-task-window failure the
    rest of the package engineers around). One IEEE division per row."""
    oc = _ord_cents(spark, sf_dir)
    stats = oc.groupBy("o_orderpriority").agg(
        F.sum("cents").cast("bigint").alias("cat_sum"),
        F.count("*").alias("cat_n"),
    ).withColumnRenamed("o_orderpriority", "_prio")
    loo = (F.col("cat_sum") - F.col("cents")).cast("double") / (
        F.col("cat_n") - 1
    ).cast("double")
    # eqNullSafe: PARTITION BY keeps NULL categories as a real group, so
    # the join-back must too — a bare inner equi-join silently drops the
    # NULL-key rows (edge-corpus catch on the r05 rewrite).
    joined = oc.join(
        F.broadcast(stats), F.col("o_orderpriority").eqNullSafe(F.col("_prio"))
    ).drop("_prio")
    return joined.select(
        "o_orderkey",
        "o_orderpriority",
        "cat_n",
        F.when(F.col("cat_n") > 1, loo).alias("loo_mean_cents"),
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
                THEN CAST(cents - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
           END AS scaled
    FROM s
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category min-max feature scaling to [0, 1] — NULL (not a
    fabricated 0.5) for degenerate single-value categories. Same
    agg + broadcast-join-back shape as the target encoder (ADVICE r04:
    the whole-partition window over a 5-value key serialized the
    corpus into ≤5 tasks); integer subtraction then a single
    exactly-rounded IEEE division."""
    oc = _ord_cents(spark, sf_dir)
    stats = oc.groupBy("o_orderpriority").agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
    ).withColumnRenamed("o_orderpriority", "_prio")
    scaled = (F.col("cents") - F.col("lo")).cast("double") / (
        F.col("hi") - F.col("lo")
    ).cast("double")
    # eqNullSafe for the NULL category group — same reason as the
    # target encoder above.
    joined = oc.join(
        F.broadcast(stats), F.col("o_orderpriority").eqNullSafe(F.col("_prio"))
    ).drop("_prio")
    return joined.select(
        "o_orderkey",
        "o_orderpriority",
        "cents",
        F.when(F.col("hi") > F.col("lo"), scaled).alias("scaled"),
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH li AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(FLOOR(l_quantity) AS BIGINT) AS w
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          AND l_quantity > 0
    ),
    g AS (
        SELECT l_returnflag, price_cents, CAST(SUM(w) AS BIGINT) AS w
        FROM li GROUP BY l_returnflag, price_cents
    ),
    c AS (
        SELECT l_returnflag, price_cents, w,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_w,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot_w
        FROM g
    )
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN 2 * cum_w >= tot_w THEN price_cents END) AS BIGINT)
               AS weighted_median_cents,
           CAST(MAX(tot_w) AS BIGINT) AS total_weight
    FROM c GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median price per return flag — the weighted
    quantile every revenue-weighted latency / price analysis needs,
    exact: the corpus reduces to the (flag, price) weight table (one
    partial-agg shuffle; domain-bounded like the AUC score table), the
    cumulative weight runs over that grouped table within each flag
    partition, and the median is the first price where
    2·cum_w ≥ tot_w — all BIGINT, no interpolation. A plain median
    treats a 50-unit line item like a 1-unit one; the weighted form is
    what 'median unit price' actually means."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        & (F.col("l_quantity") > 0)
    )
    g = (
        li.select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
            F.floor("l_quantity").cast("bigint").alias("w"),
        )
        .groupBy("l_returnflag", "price_cents")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    wflag = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "price_cents",
        "w",
        F.sum("w")
        .over(wflag.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_w"),
        F.sum("w").over(wflag).cast("bigint").alias("tot_w"),
    )
    return c.groupBy("l_returnflag").agg(
        F.min(
            F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("price_cents"))
        )
        .cast("bigint")
        .alias("weighted_median_cents"),
        F.max("tot_w").cast("bigint").alias("total_weight"),
    )


@query(
    "q_revenue_bridge",
    oracle="""
    WITH m AS (
        SELECT o_custkey,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                              AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
                             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS rev_a,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
                             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS rev_b
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
        GROUP BY o_custkey
        HAVING rev_a <> 0 OR rev_b <> 0
    )
    SELECT
        CAST(SUM(rev_a) AS BIGINT) AS starting_cents,
        CAST(SUM(CASE WHEN rev_a = 0 THEN rev_b ELSE 0 END) AS BIGINT) AS new_cents,
        CAST(SUM(CASE WHEN rev_a > 0 AND rev_b > rev_a THEN rev_b - rev_a
                      ELSE 0 END) AS BIGINT) AS expansion_cents,
        CAST(SUM(CASE WHEN rev_a > 0 AND rev_b > 0 AND rev_b < rev_a
                      THEN rev_a - rev_b ELSE 0 END) AS BIGINT) AS contraction_cents,
        CAST(SUM(CASE WHEN rev_b = 0 THEN rev_a ELSE 0 END) AS BIGINT) AS churned_cents,
        CAST(SUM(rev_b) AS BIGINT) AS ending_cents,
        CAST(SUM(CASE WHEN rev_a = 0 AND rev_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new,
        CAST(SUM(CASE WHEN rev_a > 0 AND rev_b = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_churned
    FROM m
    """,
)
def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period revenue bridge (the SaaS waterfall): per
    customer, 1995 vs 1996 revenue in exact cents, decomposed into
    new / expansion / contraction / churned buckets whose integer
    identity start + new + expansion − contraction − churned = end
    holds EXACTLY (floating point would leak cents across buckets —
    the classic finance-dashboard reconciliation failure). One
    conditional-aggregate shuffle to the per-customer table, one 1-row
    reduction; the bridge identity is additionally pinned by a test."""
    o = catalog.load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    in_a = (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    in_b = (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    m = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.when(in_a, cents).otherwise(0)).cast("bigint").alias("rev_a"),
            F.sum(F.when(in_b, cents).otherwise(0)).cast("bigint").alias("rev_b"),
        )
        .filter((F.col("rev_a") != 0) | (F.col("rev_b") != 0))
    )
    ra, rb = F.col("rev_a"), F.col("rev_b")
    return m.agg(
        F.sum(ra).cast("bigint").alias("starting_cents"),
        F.sum(F.when(ra == 0, rb).otherwise(0)).cast("bigint").alias("new_cents"),
        F.sum(F.when((ra > 0) & (rb > ra), rb - ra).otherwise(0))
        .cast("bigint")
        .alias("expansion_cents"),
        F.sum(F.when((ra > 0) & (rb > 0) & (rb < ra), ra - rb).otherwise(0))
        .cast("bigint")
        .alias("contraction_cents"),
        F.sum(F.when(rb == 0, ra).otherwise(0)).cast("bigint").alias("churned_cents"),
        F.sum(rb).cast("bigint").alias("ending_cents"),
        F.sum(F.when((ra == 0) & (rb > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when((ra > 0) & (rb == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_churned"),
    )


@query(
    "q_rank_normalize",
    oracle="""
    WITH oc AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    r AS (
        SELECT o_orderkey, cents,
               ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rn,
               COUNT(*) OVER () AS n
        FROM oc
    )
    SELECT o_orderkey, cents,
           CAST(rn AS BIGINT) AS rn,
           CASE WHEN n > 1
                THEN CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
           END AS rank_scaled
    FROM r
    """,
)
def q_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank normalization to [0, 1] — the outlier-IMMUNE feature
    scaler (min-max moves with a single extreme value; the rank
    transform cannot): scaled = (rank−1)/(n−1) with deterministic
    orderkey tiebreaks, NULL for the degenerate single-row case. Rank
    comes from the scalable range-partition machinery
    (operators/ranking.global_rank — the oracle's single-task window
    is semantics only); n joins as a single-row broadcast; one IEEE
    division per row. Together with q_minmax_scale and q_quantize_*
    this completes the feature-scaling toolbox."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    o = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    n_row = o.agg(F.count("*").cast("bigint").alias("_n"))
    r = ranking.global_rank(
        o.join(F.broadcast(n_row)),  # single-row broadcast
        [F.col("cents").asc(), F.col("o_orderkey").asc()],
    )
    return r.select(
        "o_orderkey",
        "cents",
        F.col("rn").cast("bigint").alias("rn"),
        F.when(
            F.col("_n") > 1,
            (F.col("rn") - 1).cast("double") / (F.col("_n") - 1).cast("double"),
        ).alias("rank_scaled"),
    )


@query(
    "q_ecdf",
    oracle="""
    WITH oc AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    g AS (SELECT cents, COUNT(*) AS cnt FROM oc GROUP BY cents),
    c AS (
        SELECT cents, cnt,
               CAST(SUM(cnt) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum,
               CAST(SUM(cnt) OVER () AS BIGINT) AS n
        FROM g
    )
    SELECT cents, CAST(cnt AS BIGINT) AS cnt, cum, n,
           CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) AS cdf
    FROM c
    """,
)
def q_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The empirical CDF as a materialized table — the artifact every
    percentile question, QQ comparison, and threshold choice reads
    from: per distinct cent value, its count, inclusive cumulative
    count, and F(x) = cum/n with ONE division. The corpus reduces to
    the value-domain table (one partial-agg shuffle) and the running
    count uses the scalable range-partition prefix sum — at 100 TB
    nothing serializes and the ECDF costs the same as a groupBy. The
    KS test (q_ks_test) is literally the sup-distance between two of
    these tables."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    o = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    )
    g = o.groupBy("cents").agg(F.count("*").alias("cnt"))
    n_row = g.agg(F.sum("cnt").cast("bigint").alias("n"))
    c = ranking.global_prefix_sum(
        g.join(F.broadcast(n_row)),  # single-row broadcast
        [F.col("cents").asc()],
        "cnt",
        out_col="cum",
    )
    return c.select(
        "cents",
        F.col("cnt").cast("bigint").alias("cnt"),
        "cum",
        "n",
        (F.col("cum").cast("double") / F.col("n").cast("double")).alias(
            "cdf"
        ),
    )


@query(
    "q_fulfillment_latency",
    oracle="""
    WITH gaps AS (
        SELECT o.o_orderpriority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE), l.l_shipdate)
                    AS BIGINT) AS lat_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
    ),
    r AS (
        SELECT o_orderpriority, lat_days,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY lat_days) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM gaps
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN lat_days END) AS BIGINT)
               AS p25_days,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_days END) AS BIGINT)
               AS p50_days,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN lat_days END) AS BIGINT)
               AS p75_days,
           CAST(MAX(lat_days) AS BIGINT) AS max_days
    FROM r GROUP BY o_orderpriority
    """,
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority class — the
    supply-chain SLA report: exact nearest-rank quartiles of the
    order-date → ship-date gap in whole days, elected positionally
    (the MAD/IQR rank-election idiom — no interpolation floats). The
    orders↔lineitem join shuffles once on orderkey, the rank windows
    ride the priority partitioning, and a 5-row report comes out. The
    business question the reference's enrichment pipeline ultimately
    feeds (how fast do we fulfill, by priority) — answered exactly."""
    o = catalog.load(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    li = catalog.load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").isNotNull())
    gaps = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("lat_days"),
    )
    byp = Window.partitionBy("o_orderpriority")
    r = gaps.select(
        "o_orderpriority",
        "lat_days",
        F.row_number().over(byp.orderBy("lat_days")).alias("rn"),
        F.count("*").over(byp).alias("n"),
    )
    pick = lambda pos: F.max(F.when(F.col("rn") == F.expr(pos), F.col("lat_days")))  # noqa: E731
    return r.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        pick("(n + 3) div 4").cast("bigint").alias("p25_days"),
        pick("(n + 1) div 2").cast("bigint").alias("p50_days"),
        pick("(3 * n + 3) div 4").cast("bigint").alias("p75_days"),
        F.max("lat_days").cast("bigint").alias("max_days"),
    )
