"""SQL front-end registrations: the same ANSI SQL string runs on BOTH
engines (Spark via ``spark.sql`` over temp views, DuckDB as the oracle)
— demonstrating that the engine's declarative surface is genuinely
portable: correlated scalar subqueries, IN-subqueries, LATERAL top-k,
recursive CTEs, and a TPC-H Q3-shaped pruned star query.

Scale notes: Catalyst decorrelates the scalar/IN subqueries into joins
(no per-row re-execution); the LATERAL per-group top-k compiles to a
ranked window; the recursive CTE (Spark 4) iterates driver-coordinated
with each step a distributed job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query


def _sql_query(key: str, sql: str, doc: str):
    """Register a same-SQL-both-engines key."""

    @query(key, oracle=sql)
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.register_views(spark, sf_dir)
        return spark.sql(sql)

    fn.__name__ = key
    fn.__doc__ = doc
    return fn


_sql_query(
    "q_correlated_scalar",
    """
    SELECT c.c_custkey, c.c_name,
           (SELECT MAX(o.o_totalprice) FROM orders o
             WHERE o.o_custkey = c.c_custkey) AS max_order_price
    FROM customer c
    """,
    "Correlated scalar subquery (decorrelated by Catalyst into a left "
    "outer aggregate join); null for customers without orders.",
)

_sql_query(
    "q_in_subquery",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
    "IN-subquery (semi-join after decorrelation): orders of customers "
    "with negative account balance.",
)

_sql_query(
    "q_lateral_topk",
    """
    SELECT p.o_orderpriority, l.o_orderkey, l.o_totalprice
    FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
         LATERAL (SELECT o.o_orderkey, o.o_totalprice FROM orders o
                   WHERE o.o_orderpriority = p.o_orderpriority
                   ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) l
    """,
    "LATERAL correlated top-k per group (the reference's bounded "
    "scan-with-early-exit per county, crs_ui_bot.py:165-177, as SQL).",
)

_sql_query(
    "q_recursive_cte",
    """
    WITH RECURSIVE t(n) AS (
      SELECT 1
      UNION ALL
      SELECT n + 1 FROM t WHERE n < 100
    )
    SELECT COUNT(*) AS n_rows, CAST(SUM(n) AS BIGINT) AS total,
           CAST(MAX(n) AS INT) AS max_n
    FROM t
    """,
    "Recursive CTE (Spark 4 WITH RECURSIVE): 100-step series generation "
    "+ aggregate — iterative dataflow on the SQL surface.",
)

_sql_query(
    "q_sql_tpch_q3",
    """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o.o_orderpriority
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape (shipping-priority): segment filter pushed into the "
    "customer scan, date filters into orders/lineitem scans, exact "
    "decimal revenue, deterministic top-10.",
)

_sql_query(
    "q_sql_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 shape (pricing summary): map-side partial aggregation over "
    "the fact scan, shipdate filter pushed down, exact-decimal money sums "
    "(the double-sum parity rule, plans/_sql.py), averages derived as "
    "decimal-sum / count so both engines divide identical operands.",
)

_sql_query(
    "q_sql_tpch_q6",
    """
    SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount, 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
    "TPC-H Q6 shape (forecasting revenue change): pure scan-filter-agg, "
    "every predicate pushed to the parquet reader, no shuffle beyond the "
    "single-row final combine.",
)

_sql_query(
    "q_cohort_retention",
    """
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events)
    SELECT f.cohort_week, a.active_week, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM f JOIN a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, a.active_week
    """,
    "Weekly cohort retention (classic event-analytics rollup): users "
    "bucketed by first-seen week, distinct-active counts per (cohort, "
    "activity) week. Weeks emitted as date_trunc timestamps rather than "
    "week offsets — both engines truncate to Monday 00:00, where the "
    "datediff('week') functions differ in name and argument order.",
)

_sql_query(
    "q_anomaly_zscore",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, date_trunc('hour', ts)),
    win AS (
      SELECT event_type, hour, c,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(c) OVER w AS BIGINT) AS s,
             CAST(SUM(c * c) OVER w AS BIGINT) AS ss
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, hour, c,
           CASE WHEN n >= 2
                 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) > 0
                THEN (c - CAST(s AS DOUBLE) / n)
                     / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                            / (n - 1))
           END AS z
    FROM win
    """,
    "Trailing-24h event-rate anomaly score: hourly counts per type, "
    "z-score against the preceding day's window. Every aggregate is an "
    "exact BIGINT sum; mean/variance are DERIVED from those integer sums "
    "in identical double arithmetic, so the score is engine-portable — "
    "stddev_samp() directly would not be (Welford vs naive summation "
    "order differs between engines). Same shuffle key (event_type) for "
    "the groupBy and the window; the frame excludes the current row so "
    "an anomaly never masks itself.",
)

_sql_query(
    "q_sql_tpch_q5",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                     AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    "TPC-H Q5 shape (local-supplier volume): six-table join with the "
    "customer-nation = supplier-nation co-location predicate; dims "
    "broadcast, facts shuffle on their join keys, exact-decimal revenue.",
)

_sql_query(
    "q_sql_tpch_q10",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 shape (returned-item reporting): quarter window + "
    "returnflag filter pushed to the scans, top-20 lossy customers with "
    "a deterministic (revenue, custkey) tiebreak so LIMIT picks the same "
    "rows on both engines.",
)

_sql_query(
    "q_sql_tpch_q14",
    """
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                              AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100
           / CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                           AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    "TPC-H Q14 shape (promotion effect): conditional decimal aggregate "
    "over a month of lineitem joined to part; the percentage divides two "
    "exact-decimal sums cast to double in the same order on both engines.",
)

_sql_query(
    "q_sql_tpch_q18",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    "TPC-H Q18 shape (large-volume customers): aggregate IN-subquery "
    "(planned as a semi-join against the grouped lineitem), exact-decimal "
    "quantity threshold, deterministic (totalprice, orderkey) top-20.",
)
