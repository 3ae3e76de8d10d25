"""Model-evaluation operators: exact AUC by rank statistics, decile
lift / gains tables, threshold confusion metrics, equi-depth histograms.

The family a training pipeline runs right AFTER a model scores a
holdout — and the one most often gotten subtly wrong at scale (AUC via
sampled pairs, lift via approximate quantiles). Everything here is
EXACT and engine-portable:

- AUC is the Mann-Whitney U statistic normalized by n⁺n⁻. With ties it
  needs midranks; carrying U doubled (``u2``) keeps the whole
  computation in BIGINT — Σ n_pos(s)·(2·cum_neg_below(s) + n_neg(s)) —
  and the only float op is the final division.
- Lift avoids the double-division trap: cum_rate/overall_rate =
  (cum_pos·tot_n)/(cum_n·tot_pos) — integer products, ONE division.
- Deciles come from the scalable rank + exact integer NTILE
  (operators/ranking.py), not a single-task window; the oracle's NTILE
  window is the semantics, not the plan.

Scale notes: the AUC window runs over the DISTINCT-SCORE table (the
score domain, not the corpus — integer cents bound it at ~10⁸ rows no
matter how many events), after a partial-agg shuffle reduces each
score to two longs. The lift cumsum runs over exactly 10 rows. The
confusion matrix is one scan of conditional aggregates fanned out from
a single aggregate row, same shape as q_profile_summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import ranking
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# Scored-event projection shared by the AUC and confusion keys: integer
# cents score, purchase label, house ±1e12 finite-domain bound.
_SCORED = """
    SELECT event_id,
           CAST(ROUND(value * 100) AS BIGINT)                    AS score,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END   AS label
    FROM events
    WHERE value IS NOT NULL AND value > -1e12 AND value < 1e12
      AND event_type IS NOT NULL
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = catalog.load(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("value").isNotNull()
            & (F.col("value") > -1e12)
            & (F.col("value") < 1e12)
            & F.col("event_type").isNotNull()
        )
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("score"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        )
    )


@query(
    "q_auc_exact",
    oracle=f"""
    WITH sc AS ({_SCORED}),
    d AS (
        SELECT score,
               CAST(SUM(label) AS BIGINT)     AS n_pos,
               CAST(SUM(1 - label) AS BIGINT) AS n_neg
        FROM sc GROUP BY score
    ),
    c AS (
        SELECT score, n_pos, n_neg,
               CAST(COALESCE(SUM(n_neg) OVER (ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS cum_neg_below
        FROM d
    )
    SELECT CAST(SUM(n_pos) AS BIGINT) AS tot_pos,
           CAST(SUM(n_neg) AS BIGINT) AS tot_neg,
           CAST(SUM(n_pos * (2 * cum_neg_below + n_neg)) AS BIGINT) AS u2,
           CAST(SUM(n_pos * (2 * cum_neg_below + n_neg)) AS DOUBLE)
                 / (2.0 * CAST(SUM(n_pos) AS DOUBLE) * CAST(SUM(n_neg) AS DOUBLE))
               AS auc
    FROM c
    """,
)
def q_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC with tie handling (midrank / Mann-Whitney U):
    AUC = Σ n_pos(s)·(cum_neg_below(s) + n_neg(s)/2) / (n⁺·n⁻),
    carried doubled so every term stays BIGINT. One partial-agg shuffle
    reduces the corpus to the distinct-score table (integer cents ⇒
    domain-bounded regardless of corpus size); the prefix sum over THAT
    table uses the scalable range-partition + broadcast-offset form
    (operators/ranking.global_prefix_sum — NOT a single-task ordered
    window, which would serialize a 10⁸-row score domain); the only
    float op is the final division. This is the formulation that
    replaces 'sample pairs and hope' at 100 TB."""
    sc = _scored(spark, sf_dir)
    d = sc.groupBy("score").agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        F.sum(F.lit(1) - F.col("label")).cast("bigint").alias("n_neg"),
    )
    c = ranking.global_prefix_sum(
        d, [F.col("score").asc()], "n_neg", out_col="_cum_incl"
    ).withColumn("cum_neg_below", (F.col("_cum_incl") - F.col("n_neg")).cast("bigint"))
    u2 = F.sum(
        F.col("n_pos") * (2 * F.col("cum_neg_below") + F.col("n_neg"))
    ).cast("bigint")
    return c.agg(
        F.sum("n_pos").cast("bigint").alias("tot_pos"),
        F.sum("n_neg").cast("bigint").alias("tot_neg"),
        u2.alias("u2"),
        (
            u2.cast("double")
            / (
                F.lit(2.0)
                * F.sum("n_pos").cast("double")
                * F.sum("n_neg").cast("double")
            )
        ).alias("auc"),
    )


@query(
    "q_decile_lift",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS score,
               MAX(CASE WHEN value >= 150.0 THEN 1 ELSE 0 END)         AS pos
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
          AND value > -1e12 AND value < 1e12
        GROUP BY user_id
    ),
    t AS (
        SELECT user_id, pos,
               NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
        FROM u
    ),
    d AS (
        SELECT decile, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos
        FROM t GROUP BY decile
    ),
    c AS (
        SELECT decile, n, n_pos,
               CAST(SUM(n) OVER (ORDER BY decile) AS BIGINT)      AS cum_n,
               CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT)  AS cum_pos,
               CAST(SUM(n) OVER () AS BIGINT)                     AS tot_n,
               CAST(SUM(n_pos) OVER () AS BIGINT)                 AS tot_pos
        FROM d
    )
    SELECT decile, n, n_pos, cum_n, cum_pos,
           CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
           CASE WHEN tot_pos > 0 THEN
             CAST(cum_pos * tot_n AS DOUBLE)
                   / CAST(cum_n * tot_pos AS DOUBLE) END AS cum_lift
    FROM c
    """,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table: users ranked by purchase-cents score,
    cut into exact deciles, each reporting conversion rate and
    cumulative lift vs the population. Ranking is the scalable
    range-partition rank + integer NTILE (NO single-task window over
    users — the oracle's NTILE is semantics only); the cumulative
    window then runs over exactly 10 aggregate rows. Lift is
    (cum_pos·tot_n)/(cum_n·tot_pos): integer cross-products, one IEEE
    division — never a ratio of two rounded doubles."""
    e = catalog.load(spark, sf_dir, "events")
    u = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & (F.col("value") > -1e12)
            & (F.col("value") < 1e12)
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("score"),
            F.max(F.when(F.col("value") >= 150.0, 1).otherwise(0)).alias("pos"),
        )
    )
    n_row = u.agg(F.count("*").cast("bigint").alias("_n"))
    t = ranking.global_rank(
        u.join(F.broadcast(n_row)),  # single-row broadcast, not a cartesian
        [F.col("score").desc(), F.col("user_id").asc()],
    )
    t = t.withColumn("decile", ranking.ntile_expr(F.col("rn"), F.col("_n"), 10))
    d = t.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("pos").cast("bigint").alias("n_pos")
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = d.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wc).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(wc).cast("bigint").alias("cum_pos"),
        F.sum("n").over(wall).cast("bigint").alias("tot_n"),
        F.sum("n_pos").over(wall).cast("bigint").alias("tot_pos"),
    )
    return c.select(
        "decile",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
            "rate"
        ),
        F.when(
            F.col("tot_pos") > 0,
            (F.col("cum_pos") * F.col("tot_n")).cast("double")
            / (F.col("cum_n") * F.col("tot_pos")).cast("double"),
        ).alias("cum_lift"),
    )


_THRESHOLDS = (5000, 15000, 25000)  # cents


@query(
    "q_threshold_metrics",
    oracle=f"""
    WITH sc AS ({_SCORED}),
    a AS (
        SELECT
          {", ".join(
              f'''CAST(SUM(CASE WHEN label = 1 AND score >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS tp_{t},
              CAST(SUM(CASE WHEN label = 0 AND score >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS fp_{t},
              CAST(SUM(CASE WHEN label = 1 AND score < {t} THEN 1 ELSE 0 END) AS BIGINT) AS fn_{t},
              CAST(SUM(CASE WHEN label = 0 AND score < {t} THEN 1 ELSE 0 END) AS BIGINT) AS tn_{t}'''
              for t in _THRESHOLDS
          )}
        FROM sc
    )
    {" UNION ALL ".join(
        f'''SELECT CAST({t} AS BIGINT) AS threshold_cents,
               tp_{t} AS tp, fp_{t} AS fp, fn_{t} AS fn, tn_{t} AS tn,
               CASE WHEN tp_{t} + fp_{t} > 0 THEN
                 CAST(tp_{t} AS DOUBLE) / CAST(tp_{t} + fp_{t} AS DOUBLE)
               END AS precision_,
               CASE WHEN tp_{t} + fn_{t} > 0 THEN
                 CAST(tp_{t} AS DOUBLE) / CAST(tp_{t} + fn_{t} AS DOUBLE)
               END AS recall_
        FROM a'''
        for t in _THRESHOLDS
    )}
    """,
)
def q_threshold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall at a sweep of decision
    thresholds, from ONE scan: 12 conditional integer aggregates reduce
    the corpus to a single row, which fans out to one report row per
    threshold via a literal-struct explode (q_profile_summary shape).
    Zero-denominator cells emit NULL, not a fabricated 0."""
    sc = _scored(spark, sf_dir)
    aggs = []
    for t in _THRESHOLDS:
        pred = F.col("score") >= t
        lab = F.col("label") == 1
        aggs += [
            F.sum(F.when(lab & pred, 1).otherwise(0)).cast("bigint").alias(f"tp_{t}"),
            F.sum(F.when(~lab & pred, 1).otherwise(0)).cast("bigint").alias(f"fp_{t}"),
            F.sum(F.when(lab & ~pred, 1).otherwise(0)).cast("bigint").alias(f"fn_{t}"),
            F.sum(F.when(~lab & ~pred, 1).otherwise(0)).cast("bigint").alias(f"tn_{t}"),
        ]
    a = sc.agg(*aggs)

    def row(t: int):
        tp, fp, fn, tn = (F.col(f"{c}_{t}") for c in ("tp", "fp", "fn", "tn"))
        return F.struct(
            F.lit(t).cast("bigint").alias("threshold_cents"),
            tp.alias("tp"),
            fp.alias("fp"),
            fn.alias("fn"),
            tn.alias("tn"),
            F.when(tp + fp > 0, tp.cast("double") / (tp + fp).cast("double"))
            .alias("precision_"),
            F.when(tp + fn > 0, tp.cast("double") / (tp + fn).cast("double"))
            .alias("recall_"),
        )

    return a.select(
        F.explode(F.array(*[row(t) for t in _THRESHOLDS])).alias("m")
    ).select("m.*")


@query(
    "q_equidepth_histogram",
    oracle="""
    WITH oc AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice IS NOT NULL
    ),
    t AS (
        SELECT cents, NTILE(10) OVER (ORDER BY cents, o_orderkey) AS bucket
        FROM oc
    )
    SELECT bucket, COUNT(*) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM t GROUP BY bucket
    """,
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH (equal-frequency) histogram — the quantile sketch's
    exact sibling, and what engines store as column statistics. Exact
    decile boundaries from the scalable rank + integer NTILE; the
    equi-WIDTH twin is q_histogram. Per-bucket count plus inclusive
    [lo, hi] cent bounds."""
    o = (
        catalog.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    n_row = o.agg(F.count("*").cast("bigint").alias("_n"))
    t = ranking.global_rank(
        o.join(F.broadcast(n_row)),  # single-row broadcast
        [F.col("cents").asc(), F.col("o_orderkey").asc()],
    )
    t = t.withColumn("bucket", ranking.ntile_expr(F.col("rn"), F.col("_n"), 10))
    return t.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("cents").cast("bigint").alias("lo_cents"),
        F.max("cents").cast("bigint").alias("hi_cents"),
    )
