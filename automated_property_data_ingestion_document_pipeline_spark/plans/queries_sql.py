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
    WITH a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events),
    f AS (
      SELECT user_id, active_week,
             MIN(active_week) OVER (PARTITION BY user_id) AS cohort_week
      FROM a)
    SELECT cohort_week, active_week, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM f GROUP BY cohort_week, active_week
    """,
    "Weekly cohort retention (classic event-analytics rollup): users "
    "bucketed by first-seen week, distinct-active counts per (cohort, "
    "activity) week. ONE events scan (r03): cohort week = "
    "min(active_week) over the user — valid because date_trunc is "
    "monotone, so min of trunc = trunc of min — instead of a second "
    "full-scan aggregate joined back. Weeks emitted as date_trunc "
    "timestamps rather than "
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

_sql_query(
    "q_sql_tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT)
    """,
    "TPC-H Q7 shape (volume shipping): nation self-join pair with a "
    "symmetric OR predicate — Catalyst keeps both nation broadcasts and "
    "pushes the pair filter above the join rather than exploding it; "
    "yearly exact-decimal revenue between two trading nations.",
)

_sql_query(
    "q_sql_tpch_q8",
    """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                  AS DECIMAL(18,4)) AS volume,
             n2.n_name AS nation
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    "TPC-H Q8 shape (national market share): eight-table star with the "
    "customer side restricted to one region and the supplier nation "
    "carried through as the share dimension; the share divides two "
    "exact-decimal sums cast to double in the same order on both "
    "engines, so the ratio is bit-portable.",
)

_sql_query(
    "q_sql_tpch_q13",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    "TPC-H Q13 shape (customer order-count distribution): left outer "
    "join with the filter in the JOIN condition (not WHERE — zero-order "
    "customers must survive), then a two-level aggregation whose second "
    "groupBy key is the first's aggregate output.",
)

_sql_query(
    "q_sql_tpch_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                           AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "TPC-H Q15 shape (top supplier): CTE reused twice — once as the "
    "join input, once under a scalar MAX subquery; the equality filter "
    "on a double is safe ONLY because both engines derive it from the "
    "same exact-decimal sum (the revenue view is deterministic, so "
    "max == value is exact, not approximate).",
)

_sql_query(
    "q_sql_tpch_q17",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 10
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                           AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    "TPC-H Q17 shape (small-quantity-order revenue): correlated scalar "
    "aggregate per part, decorrelated by Catalyst into an aggregate + "
    "join on partkey (never re-executed per row); the per-part average "
    "is derived from an exact decimal sum / count so the 0.2x threshold "
    "compares identical doubles on both engines.",
)

_sql_query(
    "q_sql_tpch_q19",
    """
    SELECT CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19 shape (discounted revenue, OR-of-ANDs): the disjunction "
    "mixes columns from both join sides; Catalyst still extracts the "
    "common per-side implications (brand IN (...), quantity <= 30) as "
    "pushable conjuncts below the join while evaluating the full "
    "disjunction above it.",
)

_sql_query(
    "q_sql_tpch_q22",
    """
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
    "TPC-H Q22 shape (global sales opportunity, adapted: the trimmed "
    "schema has no c_phone, so the country-code grouping becomes "
    "mktsegment and 'never ordered' becomes 'no orders in the last "
    "period'): uncorrelated scalar AVG subquery (computed once, "
    "broadcast) + NOT EXISTS anti-join; the average is derived from an "
    "exact decimal sum / count so the > filter is bit-portable.",
)

_sql_query(
    "q_sql_tpch_q2",
    """
    SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_acctbal, n.n_name
    FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_size = 15
      AND s.s_acctbal = (
        SELECT MAX(s2.s_acctbal)
        FROM supplier s2
          JOIN lineitem l2 ON l2.l_suppkey = s2.s_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')
    GROUP BY p.p_partkey, p.p_brand, s.s_suppkey, s.s_acctbal, n.n_name
    """,
    "TPC-H Q2 shape (best supplier per part; the trimmed schema has no "
    "partsupp/ps_supplycost, so 'min cost' becomes 'max account balance "
    "among suppliers that shipped the part', preserving the defining "
    "structure: a correlated scalar aggregate over a multi-join inner "
    "block, decorrelated by Catalyst into an aggregate joined back on "
    "partkey — never a per-row re-execution; region/size filters push "
    "into both occurrences of the dimension scans.",
)

_sql_query(
    "q_sql_tpch_q4",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    "TPC-H Q4 shape (order priority checking; no l_commitdate/"
    "l_receiptdate in the trimmed schema, so 'late delivery' becomes "
    "'shipped after the order date'): correlated EXISTS planned as a "
    "LEFT SEMI join on orderkey — the fact side never duplicates "
    "orders with multiple qualifying lines; date range pushed into the "
    "orders scan.",
)

_sql_query(
    "q_sql_tpch_q9",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               - 0.5 * p.p_retailprice * l.l_quantity, 4)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%a%' AND o.o_orderdate IS NOT NULL
    GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT)
    """,
    "TPC-H Q9 shape (product-type profit; ps_supplycost is absent, so "
    "cost is modeled from p_retailprice): the 5-way fact-centred join "
    "with an expression aggregate grouped by (nation, year) — all dims "
    "broadcast, the LIKE filter prunes part before the join, profit "
    "accumulated in exact decimal at a fixed scale.",
)

_sql_query(
    "q_sql_tpch_q11",
    """
    WITH val AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                           AS DECIMAL(18,4))) AS DOUBLE) AS part_value
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, part_value FROM val
    WHERE part_value > (
      SELECT 0.0006 * SUM(part_value) FROM val)
    """,
    "TPC-H Q11 shape (important stock identification; lineitem revenue "
    "stands in for partsupp value): per-key aggregate filtered against "
    "an uncorrelated scalar fraction of the SAME aggregate — the "
    "HAVING-vs-global-total pattern; Spark inlines the CTE so the plan "
    "is two aggregations over one scan shape with the scalar broadcast.",
)

_sql_query(
    "q_sql_tpch_q12",
    """
    SELECT l.l_returnflag AS shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          AND o.o_orderpriority IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'N')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    "TPC-H Q12 shape (shipping modes / priority; l_shipmode is absent, "
    "l_returnflag stands in): fact-fact equijoin with conditional "
    "aggregates (CASE inside SUM) — both counts computed in ONE pass "
    "with map-side partials; IN-list and date range pushed to the "
    "lineitem scan.",
)

_sql_query(
    "q_sql_tpch_q16",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "TPC-H Q16 shape (parts/supplier relationship via lineitem): NOT IN "
    "subquery planned as a null-aware anti join (the subtle one — a "
    "NULL in the subquery output empties the result, which is why the "
    "filter guarantees non-null keys), NOT LIKE / <> / IN-list pushed "
    "into the part scan, COUNT(DISTINCT) expanded to a two-phase exact "
    "distinct aggregate.",
)

_sql_query(
    "q_sql_tpch_q20",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 2
      AND s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%o%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50.0)
    """,
    "TPC-H Q20 shape (suppliers with excess shipments of selected "
    "parts): nested IN subqueries — part filter feeds a grouped HAVING "
    "aggregate over lineitem, whose keys semi-join suppliers; Catalyst "
    "plans both INs as semi joins (no per-row subquery execution), the "
    "LIKE prunes part before anything joins.",
)

_sql_query(
    "q_sql_tpch_q21",
    """
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
      JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate)
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT 20
    """,
    "TPC-H Q21 shape (suppliers who kept orders waiting; late = shipped "
    "after the order date, standing in for the absent receipt/commit "
    "dates): the hardest subquery pattern in the suite — a correlated "
    "EXISTS (some OTHER supplier on the order) and a correlated NOT "
    "EXISTS (no OTHER supplier was also late) against the same fact, "
    "planned as a semi + anti join pair on orderkey with the "
    "inequality correlation carried as join-side filters; deterministic "
    "top-20.",
)

_sql_query(
    "q_nullsafe_join",
    """
    WITH c AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS clicks
      FROM events WHERE event_type = 'click' GROUP BY user_id, date_trunc('day', ts)),
    v AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS views
      FROM events WHERE event_type = 'view' GROUP BY user_id, date_trunc('day', ts))
    SELECT c.user_id, c.day, c.clicks, v.views
    FROM c JOIN v ON c.user_id = v.user_id
                 AND c.day IS NOT DISTINCT FROM v.day
    """,
    "NULL-safe equijoin (IS NOT DISTINCT FROM): per-(user, day) click × "
    "view counts where the NULL-timestamp day-bucket must join with "
    "itself — plain = would silently drop it (NULL = NULL is NULL). "
    "Spark still plans this as a hash join (null-safe equality is an "
    "equi-key), not a nested loop.",
)

_sql_query(
    "q_except_all",
    """
    SELECT event_type, user_id FROM events WHERE value > 0
    EXCEPT ALL
    SELECT event_type, user_id FROM events WHERE event_type = 'click'
    """,
    "Bag-semantics difference (EXCEPT ALL): multiplicity-aware — each "
    "click row cancels ONE positive-value row of the same (type, user), "
    "surviving duplicates are kept with their counts (the DISTINCT "
    "variant q_except collapses them). Planned as a count-annotated "
    "aggregate join, one shuffle per side.",
)

_TOP_SUPPLIER_SQL = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                           AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q_top_supplier_onepass", oracle=_TOP_SUPPLIER_SQL)
def q_top_supplier_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 with the CTE double-scan optimized away: Spark inlines
    (never materializes) SQL CTEs, so the same-SQL q_sql_tpch_q15 scans
    and aggregates lineitem TWICE — once under the scalar MAX subquery,
    once as the join input (plan audit, PERFORMANCE.md §21). This
    DataFrame twin aggregates revenue ONCE and takes the max with an
    unpartitioned window over the post-aggregate rows: the window's
    single-partition exchange carries |suppliers| aggregated rows, not
    lineitems — at 100 TB that trades a second full fact scan+shuffle
    for one tiny exchange. The oracle is the SAME SQL as the CTE form:
    both must produce identical rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark import catalog as cat

    li = cat.load(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    top = rev.withColumn(
        "_mx", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("_mx"))
    s = cat.load(spark, sf_dir, "supplier")
    return top.join(s, top.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )
