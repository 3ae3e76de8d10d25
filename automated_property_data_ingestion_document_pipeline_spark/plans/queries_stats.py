"""Distributed statistics: OLS regression, chi-square independence,
correlation matrix — via EXACT integer sufficient statistics.

Why not Spark's native ``regr_slope``/``corr``/``stddev``: those stream
doubles through Welford-style update/merge, so the result depends on
partition boundaries and merge order — re-running the same query on a
repartitioned table flips low bits, which breaks both the driver's
hash-compare and any bit-reproducibility contract a 100 TB pipeline
wants. Instead we aggregate the sufficient statistics (n, Σx, Σy, Σxy,
Σx², Σy²) as BIGINTs over integer-scaled columns — integer addition is
associative, so ANY partitioning yields identical sums — and derive
slope/r/χ² with a fixed double-arithmetic expression tree evaluated
identically on both engines (IEEE +,-,*,/,sqrt are exactly rounded ⇒
deterministic; only libm transcendentals are not).

Scale: one partial-aggregate shuffle per query carrying a handful of
longs per group — map-side combine reduces each partition to one row
before the exchange. This is the textbook "algebraic aggregate" shape
that survives 100 TB unchanged.

Integer scaling: quantities are already integral; prices use whole
dollars (FLOOR), discount/tax use integer percent (ROUND(x*100)) — all
exact in int64 with Σx² < 2^53 headroom at sf ≥ 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# Shared integer-scaled projection of lineitem (identical on both engines).
_LI_INTS = """
    SELECT l_returnflag,
           CAST(FLOOR(l_quantity) AS BIGINT)           AS qty,
           CAST(FLOOR(l_extendedprice) AS BIGINT)      AS price_usd,
           CAST(ROUND(l_discount * 100) AS BIGINT)     AS disc_pct,
           CAST(ROUND(l_tax * 100) AS BIGINT)          AS tax_pct
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_discount IS NOT NULL AND l_tax IS NOT NULL
"""


def _li_ints(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog.load(spark, sf_dir, "lineitem")
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        li = li.filter(F.col(c).isNotNull())
    return li.select(
        "l_returnflag",
        F.floor("l_quantity").cast("bigint").alias("qty"),
        F.floor("l_extendedprice").cast("bigint").alias("price_usd"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
    )


@query(
    "q_regr_ols",
    oracle=f"""
    WITH li AS ({_LI_INTS}),
    s AS (
        SELECT l_returnflag,
               COUNT(*)                             AS n,
               CAST(SUM(qty) AS BIGINT)             AS sx,
               CAST(SUM(price_usd) AS BIGINT)       AS sy,
               CAST(SUM(qty * price_usd) AS BIGINT) AS sxy,
               CAST(SUM(qty * qty) AS BIGINT)       AS sxx,
               CAST(SUM(price_usd * price_usd) AS BIGINT) AS syy
        FROM li GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
           (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
                 / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r2
    FROM s
    """,
)
def q_regr_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of price on quantity from exact sufficient
    statistics: one shuffle, six longs per group over the wire, then a
    deterministic closed-form slope/intercept/r² (no Welford drift —
    the bit-reproducible form you want feeding a 100 TB model report).
    """
    li = _li_ints(spark, sf_dir)
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("qty").alias("sx"),
        F.sum("price_usd").alias("sy"),
        F.sum(F.col("qty") * F.col("price_usd")).alias("sxy"),
        F.sum(F.col("qty") * F.col("qty")).alias("sxx"),
        F.sum(F.col("price_usd") * F.col("price_usd")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    cov_n = n_d * F.col("sxy") - sx_d * F.col("sy")
    varx_n = n_d * F.col("sxx") - sx_d * F.col("sx")
    vary_n = n_d * F.col("syy") - sy_d * F.col("sy")
    slope = cov_n / varx_n
    return s.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        slope.alias("slope"),
        ((sy_d - slope * F.col("sx")) / n_d).alias("intercept"),
        ((cov_n * cov_n) / (varx_n * vary_n)).alias("r2"),
    )


@query(
    "q_chi_square",
    oracle="""
    WITH obs AS (
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               COUNT(*) AS n_obs
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ),
    tot AS (
        SELECT status, priority, n_obs,
               SUM(n_obs) OVER (PARTITION BY status)   AS row_tot,
               SUM(n_obs) OVER (PARTITION BY priority) AS col_tot,
               SUM(n_obs) OVER ()                      AS n_all
        FROM obs
    )
    SELECT status, priority, n_obs,
           CAST(row_tot AS DOUBLE) * col_tot / n_all AS expected,
           (n_obs - CAST(row_tot AS DOUBLE) * col_tot / n_all)
                 * (n_obs - CAST(row_tot AS DOUBLE) * col_tot / n_all)
                 / (CAST(row_tot AS DOUBLE) * col_tot / n_all) AS contribution
    FROM tot
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for orderstatus × orderpriority:
    observed/expected/χ²-contribution per cell. The contingency table is
    tiny after the first aggregate (|status|×|priority| rows), so the
    window sums for the margins run on an already-reduced table — the
    raw scan is one partial-agg shuffle regardless of input size.
    """
    from pyspark.sql import Window

    o = catalog.load(spark, sf_dir, "orders")
    obs = (
        o.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ).agg(F.count("*").alias("n_obs"))
    )
    row_tot = F.sum("n_obs").over(Window.partitionBy("status"))
    col_tot = F.sum("n_obs").over(Window.partitionBy("priority"))
    n_all = F.sum("n_obs").over(Window.partitionBy())
    exp = row_tot.cast("double") * col_tot / n_all
    return obs.select(
        "status",
        "priority",
        "n_obs",
        exp.alias("expected"),
        ((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp).alias(
            "contribution"
        ),
    )


# The six unordered column pairs of the correlation matrix.
_PAIRS = [
    ("qty", "price_usd"),
    ("qty", "disc_pct"),
    ("qty", "tax_pct"),
    ("price_usd", "disc_pct"),
    ("price_usd", "tax_pct"),
    ("disc_pct", "tax_pct"),
]

_CORR_SUMS = ",\n".join(
    [f"SUM({c}) AS s_{c}, SUM({c} * {c}) AS ss_{c}" for c in ("qty", "price_usd", "disc_pct", "tax_pct")]
    + [f"SUM({a} * {b}) AS sp_{a}_{b}" for a, b in _PAIRS]
)

_CORR_ROWS = "\nUNION ALL\n".join(
    f"""SELECT '{a}' AS col_x, '{b}' AS col_y,
        (CAST(n AS DOUBLE) * sp_{a}_{b} - CAST(s_{a} AS DOUBLE) * s_{b})
              / (SQRT(CAST(n AS DOUBLE) * ss_{a} - CAST(s_{a} AS DOUBLE) * s_{a})
                 * SQRT(CAST(n AS DOUBLE) * ss_{b} - CAST(s_{b} AS DOUBLE) * s_{b})) AS r
    FROM s"""
    for a, b in _PAIRS
)


@query(
    "q_corr_matrix",
    oracle=f"""
    WITH li AS ({_LI_INTS}),
    s AS (SELECT COUNT(*) AS n, {_CORR_SUMS} FROM li)
    {_CORR_ROWS}
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for all 6 pairs of 4 integer-scaled lineitem
    measures in ONE scan: a single global aggregate collects every
    sufficient statistic (4 sums + 4 sum-of-squares + 6 cross products
    = 15 longs total), then the 6 matrix entries unfold from that one
    row — no per-pair passes, no shuffle of raw data beyond the single
    partial agg. sqrt is IEEE-exact, so r matches the
    oracle bitwise and is emitted raw (§41).
    """
    li = _li_ints(spark, sf_dir)
    cols = ("qty", "price_usd", "disc_pct", "tax_pct")
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs.append(F.sum(c).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for a, b in _PAIRS:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    s = li.agg(*aggs)

    # One aggregate row → 6 matrix entries via explode(array(struct…)):
    # the scan+agg run ONCE (a unionAll of per-pair selects would
    # re-aggregate lineitem six times).
    def corr_struct(a: str, b: str):
        n_d = F.col("n").cast("double")
        sa_d = F.col(f"s_{a}").cast("double")
        sb_d = F.col(f"s_{b}").cast("double")
        num = n_d * F.col(f"sp_{a}_{b}") - sa_d * F.col(f"s_{b}")
        dena = F.sqrt(n_d * F.col(f"ss_{a}") - sa_d * F.col(f"s_{a}"))
        denb = F.sqrt(n_d * F.col(f"ss_{b}") - sb_d * F.col(f"s_{b}"))
        return F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            (num / (dena * denb)).alias("r"),
        )

    cell = F.explode(F.array(*[corr_struct(a, b) for a, b in _PAIRS])).alias("cell")
    return s.select(cell).select("cell.col_x", "cell.col_y", "cell.r")


@query(
    "q_kaplan_meier",
    oracle="""
    WITH RECURSIVE u AS (
        SELECT user_id,
               CAST(date_diff('day', CAST(MIN(ts) AS DATE),
                    COALESCE(CAST(MIN(CASE WHEN event_type = 'error' THEN ts END)
                                  AS DATE),
                             CAST(MAX(ts) AS DATE))) AS BIGINT) AS t,
               CASE WHEN MIN(CASE WHEN event_type = 'error' THEN ts END)
                         IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY user_id
    ),
    times AS (
        SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c
        FROM u GROUP BY t
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM u),
    ord AS (
        SELECT t, d, c,
               ROW_NUMBER() OVER (ORDER BY t) AS rn,
               (SELECT n_total FROM tot)
                 - CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS n_at_risk
        FROM times
    ),
    rec AS (
        SELECT rn, t, d, c, n_at_risk,
               1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)) AS surv
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.rn, o.t, o.d, o.c, o.n_at_risk,
               rec.surv * (1.0 - CAST(o.d AS DOUBLE) / CAST(o.n_at_risk AS DOUBLE))
        FROM rec JOIN ord o ON o.rn = rec.rn + 1
    )
    SELECT t, d AS n_events, c AS n_censored, n_at_risk,
           surv AS survival
    FROM rec
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator with right-censoring — time to
    first 'error' per user, censored at last activity if none ever
    occurs (the churn/time-to-failure analysis). The corpus reduces to
    the per-user (duration, event) table in one shuffle, then to the
    DAY-DOMAIN-bounded distinct-time table; at-risk counts are the
    exclusive prefix complement, and S(t) = Π(1 − dᵢ/nᵢ) folds
    left-to-right over the sorted time array (JVM ``aggregate`` with a
    running-product array accumulator — the EWMA fold generalized to
    emit EVERY prefix), evaluating the identical multiplication chain
    as the oracle's recursive CTE, so the doubles agree bitwise and the
    RAW double is emitted (§41: decimal ROUND is the only non-portable
    step). The single-group collect holds |distinct
    durations| rows (≤ the day domain), never the corpus."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    err_ts = F.min(F.when(F.col("event_type") == "error", F.col("ts")))
    u = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("_first"),
        err_ts.cast("date").alias("_err"),
        F.max("ts").cast("date").alias("_last"),
    )
    u = u.select(
        F.datediff(F.coalesce("_err", "_last"), "_first").cast("bigint").alias("t"),
        F.when(F.col("_err").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    times = u.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = times.agg(F.sum(F.col("d") + F.col("c")).cast("bigint").alias("n_total"))
    # the time table is day-domain bounded — the ordered window here runs
    # over ≤ a few thousand rows no matter the corpus size
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    ord_ = (
        times.join(F.broadcast(tot))  # single-row broadcast
        .withColumn(
            "n_at_risk",
            (
                F.col("n_total")
                - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wt), F.lit(0))
            ).cast("bigint"),
        )
    )
    one = ord_.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c", "n_at_risk"))).alias("arr")
    )
    folded = one.select(
        F.expr(
            """
            aggregate(
              arr,
              cast(array() as array<struct<t:bigint,d:bigint,c:bigint,
                                           n_at_risk:bigint,surv:double>>),
              (acc, x) -> array_append(acc, named_struct(
                 't', x.t, 'd', x.d, 'c', x.c, 'n_at_risk', x.n_at_risk,
                 'surv', (case when size(acc) = 0 then 1.0D
                               else acc[size(acc) - 1].surv end)
                         * (1.0D - cast(x.d as double)
                                   / cast(x.n_at_risk as double))))
            )
            """
        ).alias("km")
    )
    return folded.select(F.explode("km").alias("r")).select(
        F.col("r.t").alias("t"),
        F.col("r.d").alias("n_events"),
        F.col("r.c").alias("n_censored"),
        F.col("r.n_at_risk").alias("n_at_risk"),
        F.col("r.surv").alias("survival"),
    )


@query(
    "q_ks_test",
    oracle="""
    WITH s AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a
        FROM events
        WHERE value IS NOT NULL AND value > -1e12 AND value < 1e12
          AND event_type IN ('purchase', 'click')
    ),
    g AS (
        SELECT v, CAST(SUM(is_a) AS BIGINT) AS ca,
               CAST(SUM(1 - is_a) AS BIGINT) AS cb
        FROM s GROUP BY v
    ),
    c AS (
        SELECT v,
               CAST(SUM(ca) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_a,
               CAST(SUM(cb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_b,
               CAST(SUM(ca) OVER () AS BIGINT) AS n_a,
               CAST(SUM(cb) OVER () AS BIGINT) AS n_b
        FROM g
    ),
    d AS (
        SELECT v, ABS(cum_a * n_b - cum_b * n_a) AS dnum, n_a, n_b FROM c
    )
    SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
           CAST(MAX(dnum) AS BIGINT) AS d_numerator,
           CAST(MIN(CASE WHEN dnum = (SELECT MAX(dnum) FROM d) THEN v END)
                AS BIGINT) AS d_at_cents,
           CAST(MAX(dnum) AS DOUBLE)
                 / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE))
               AS ks_stat
    FROM d
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    purchase and click value distributions: D = max|F_A(v) − F_B(v)|
    computed as the integer cross-product max|cum_a·n_b − cum_b·n_a|
    over the merged distinct-value table, divided ONCE at the end —
    no per-point float CDFs to accumulate error, and the argmax value
    (deterministic min tiebreak) is reported so the analyst sees WHERE
    the distributions diverge. Same domain-bounded shape as the AUC
    plan: one partial-agg shuffle to the value table, prefix sums over
    that table, a 1-row reduction. The drift-detection test run
    between training snapshots at 100 TB."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & (F.col("value") > -1e12)
        & (F.col("value") < 1e12)
        & F.col("event_type").isin("purchase", "click")
    )
    s = e.select(
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
    )
    g = s.groupBy("v").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).cast("bigint").alias("cb"),
    )
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    # totals as a single-row broadcast; cumulative counts via the
    # scalable range-partition prefix sum (operators/ranking.py) — the
    # distinct-cents table can reach ~1e8 rows at 100 TB, too large for
    # a single-task ordered window (same refactor as q_auc_exact)
    tot = g.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    c = ranking.global_prefix_sum(
        g.join(F.broadcast(tot)), [F.col("v").asc()], "ca", out_col="cum_a"
    )
    c = ranking.global_prefix_sum(c, [F.col("v").asc()], "cb", out_col="cum_b")
    d = c.select(
        "v",
        F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")).alias(
            "dnum"
        ),
        "n_a",
        "n_b",
    )
    dmax_row = d.agg(F.max("dnum").alias("dmax"))
    d = d.join(F.broadcast(dmax_row))  # single-row broadcast
    return d.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max("dnum").cast("bigint").alias("d_numerator"),
        F.min(F.when(F.col("dnum") == F.col("dmax"), F.col("v")))
        .cast("bigint")
        .alias("d_at_cents"),
        (
            F.max("dnum").cast("double")
            / (F.max("n_a").cast("double") * F.max("n_b").cast("double"))
        ).alias("ks_stat"),
    )
