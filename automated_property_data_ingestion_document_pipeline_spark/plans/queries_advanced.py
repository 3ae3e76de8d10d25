"""Advanced pipeline registrations: pivot, first/last/nth windows,
max_by/min_by, deterministic hash sampling, time-series resample with
forward-fill (the hypertable-rollup shape), and the unbounded LSH/IVF
similarity paths (rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query
from automated_property_data_ingestion_document_pipeline_spark.lineage import cut_lineage

# -- pivot ---------------------------------------------------------------------


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (status columns per priority) with an explicit value list so
    the output schema is static — the only pivot form that scales (a
    value-discovering pivot needs an extra distinct pass over the
    fact)."""
    o = catalog.load(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


# -- first/last/nth value windows ---------------------------------------------


@query(
    "q_first_last_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
)
def q_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over the per-customer order history (full
    frame for last/nth so every row sees the true extremes). Oracle pins
    NULLS FIRST to Spark's ASC default (DuckDB defaults NULLS LAST)."""
    o = catalog.load(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w_run = Window.partitionBy("o_custkey").orderBy(*order_cols)
    w_full = w_run.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w_run).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


# -- max_by / min_by -----------------------------------------------------------


@query(
    "q_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation (max_by/arg_max): the order id carrying each
    group's extreme price. Prices are continuous doubles → extremes are
    unique in this corpus, so the pick is deterministic (argmax over a
    TIED measure is nondeterministic in standard SQL — not a contract).
    NULL prices are FILTERed on the Spark side: DuckDB's arg_max skips
    NULL measures while Spark's max_by can return them (edge-corpus
    audit, round 2)."""
    o = catalog.load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "max_by(o_orderkey, o_totalprice) FILTER (WHERE o_totalprice IS NOT NULL)"
        ).alias("biggest_order"),
        F.expr(
            "min_by(o_orderkey, o_totalprice) FILTER (WHERE o_totalprice IS NOT NULL)"
        ).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


# -- deterministic hash sampling ----------------------------------------------


@query(
    "q_hash_sample",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE (c_custkey * 2654435761) % 100 < 10
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via multiplicative hashing (Knuth) —
    the reproducible alternative to ``sample()`` for pipeline dev loops:
    same rows every run, every engine, any partitioning."""
    c = catalog.load(spark, sf_dir, "customer")
    return c.filter((F.col("c_custkey") * 2654435761) % 100 < 10).select(
        "c_custkey", "c_name"
    )


# -- time-series resample + forward fill --------------------------------------


def _grid_from_hourly(hourly):
    """Per-user hourly grid derived from the hourly rollup itself — ONE
    events scan for the whole resample (r03): date_trunc is monotone
    (min of trunc = trunc of min), so the span bounds come from the
    rollup's own buckets instead of a second full-table aggregate, and
    the rollup is lazily localCheckpoint-ed (the connected-components
    precedent) so its two consumers (bounds, grid join) don't each
    rescan the fact table. At 100 TB the rollup is |users × active
    hours| — the small side; NULL buckets (NULL-ts rows) are skipped by
    min/max and never join the grid, matching the old two-scan form."""
    hourly = cut_lineage(hourly, eager=False, durable=False)
    bounds = hourly.groupBy("user_id").agg(
        F.min("bucket").alias("t0"), F.max("bucket").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    return hourly, grid


@query(
    "q_resample_ffill",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             arg_max(TRY_CAST(round(value * 100, 0) AS BIGINT), event_id) AS last_cents
      FROM events GROUP BY 1, 2)
    SELECT g.user_id, g.bucket,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           CAST(last_value(h.last_cents IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS ffill_value
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample: per-user hourly grid (sequence +
    explode) left-joined to hourly rollups, gaps forward-filled with the
    latest observed value (last ignore-nulls window).

    Scale: the grid is user-bounded (hours in the user's own span), the
    join shuffles on (user, bucket), and the fill is one window pass on
    the same partitioning — grid generation never materializes
    driver-side."""
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")  # non-finite -> NULL, both engines
    # FILTER pins both engines to 'last VALID observation': DuckDB's
    # arg_max skips NULL values while Spark's max_by returns them, so an
    # unfiltered max_by diverges when the newest row has a NULL measure
    # (edge-corpus audit, round 2).
    hourly = ev.withColumn("_cents", cents).groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.expr("max_by(_cents, event_id) FILTER (WHERE _cents IS NOT NULL)").alias(
            "last_cents"
        ),
    )
    hourly, grid = _grid_from_hourly(hourly)
    joined = grid.join(hourly, ["user_id", "bucket"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        (F.last("last_cents", ignorenulls=True).over(w).cast("double") / 100).alias(
            "ffill_value"
        ),
    )


# -- unbounded near-dup via LSH buckets (rows-only) ---------------------------


@query("q_embedding_neardup")  # rows-only: LSH bucketing is engine-specific
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at corpus scale: hyperplane-signature bucket
    self-join (sub-quadratic candidates) + cosine threshold — the
    unbounded twin of the oracle-checked q_cosine_pairs."""
    from automated_property_data_ingestion_document_pipeline_spark.functions.vectors import cosine
    from automated_property_data_ingestion_document_pipeline_spark.operators.similarity import (
        hyperplane_signature,
    )

    e = catalog.load(spark, sf_dir, "embeddings").withColumn(
        "_sig", hyperplane_signature(F.col("embedding"), num_planes=6)
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"), "_sig")
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"), "_sig")
    return (
        a.join(b, ["_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.25)
    )


# -- IVF approximate top-k (rows-only) ----------------------------------------


@query("q_knn_ivf")  # rows-only: approximate by design (coarse-quantizer ANN)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest coarse-quantizer
    cell, probe only the query's cell. Centroids here are the first K
    corpus vectors (deterministic stand-in for a k-means codebook — the
    Spark-side mechanics, cell assignment + cell-local search, are the
    real thing)."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.similarity import (
        ivf_topk,
    )

    e = catalog.load(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 5), k=5, num_cells=8)


@query(
    "q_resample_bfill",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             arg_min(TRY_CAST(round(value * 100, 0) AS BIGINT), event_id) AS first_cents
      FROM events GROUP BY 1, 2)
    SELECT g.user_id, g.bucket,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           CAST(first_value(h.first_cents IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) / 100
             AS bfill_value
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def q_resample_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward-fill twin of q_resample_ffill: gaps take the EARLIEST
    observation at-or-after the bucket (the fill direction used when a
    reading is valid until superseded-from-the-future, e.g. scheduled
    price lists). Same grid + join + one window pass, frame reversed
    (current row → unbounded following); min_by FILTER mirrors DuckDB's
    NULL-skipping arg_min exactly as the ffill twin does for arg_max."""
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")
    hourly = ev.withColumn("_cents", cents).groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.expr("min_by(_cents, event_id) FILTER (WHERE _cents IS NOT NULL)").alias(
            "first_cents"
        ),
    )
    hourly, grid = _grid_from_hourly(hourly)
    joined = grid.join(hourly, ["user_id", "bucket"], "left")
    # DESC running frame, NOT (currentRow -> unboundedFollowing): Spark's
    # UnboundedFollowing frame re-scans to the partition end for EVERY
    # row — O(n^2) per key (measured 10x+ on dense grids, PERFORMANCE.md
    # §26). Reversing the sort turns "first non-null at-or-after" into
    # "last non-null seen so far", an O(n) running frame.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        (F.last("first_cents", ignorenulls=True).over(w).cast("double") / 100).alias(
            "bfill_value"
        ),
    )


@query(
    "q_resample_interp",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             arg_max(TRY_CAST(round(value * 100, 0) AS BIGINT), event_id)
               FILTER (TRY_CAST(round(value * 100, 0) AS BIGINT) IS NOT NULL)
               AS cents
      FROM events GROUP BY 1, 2),
    j AS (
      SELECT g.user_id, g.bucket, epoch_us(g.bucket) AS t_us, h.cents
      FROM grid g LEFT JOIN hourly h
        ON g.user_id = h.user_id AND g.bucket = h.bucket),
    w AS (
      SELECT user_id, bucket, t_us, cents,
             last_value(cents IGNORE NULLS) OVER wp AS pc,
             last_value(CASE WHEN cents IS NOT NULL THEN t_us END IGNORE NULLS)
               OVER wp AS pt,
             first_value(cents IGNORE NULLS) OVER wf AS nc,
             first_value(CASE WHEN cents IS NOT NULL THEN t_us END IGNORE NULLS)
               OVER wf AS nt
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, bucket,
           CASE WHEN pt = nt THEN CAST(pc AS DOUBLE) / 100
                WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
                  (CAST(pc AS DOUBLE)
                   + CAST(nc - pc AS DOUBLE)
                     * (CAST(t_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)))
                  / 100
           END AS interp_value
    FROM w
    """,
)
def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample with LINEAR interpolation (the ffill twin for continuous
    measures): per-user hourly grid; gaps take
    v = prev + (next-prev) * (t-pt)/(nt-pt) between the surrounding
    anchors, NULL outside them. Anchors pair (time, value) through two
    ignore-nulls windows driven by the SAME non-null condition — both
    directions share one (user) shuffle and one ordered sort (frames
    differ, order doesn't). Bit-portable floats: every operand entering
    the double arithmetic is an exact integer (cents, epoch micros) and
    the expression tree is identical on both engines, so IEEE gives
    identical doubles — no rounding slop needed."""
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")
    hourly = (
        ev.withColumn("_c", cents)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.expr("max_by(_c, event_id) FILTER (WHERE _c IS NOT NULL)").alias("cents")
        )
    )
    hourly, grid = _grid_from_hourly(hourly)
    j = grid.join(hourly, ["user_id", "bucket"], "left").withColumn(
        "t_us", F.unix_micros(F.col("bucket").cast("timestamp"))
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # DESC running frame instead of the quadratic UnboundedFollowing
    # frame (see q_resample_bfill / PERFORMANCE.md §26)
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_if_anchor = F.when(F.col("cents").isNotNull(), F.col("t_us"))
    w = (
        j.withColumn("pc", F.last("cents", ignorenulls=True).over(wp))
        .withColumn("pt", F.last(t_if_anchor, ignorenulls=True).over(wp))
        .withColumn("nc", F.last("cents", ignorenulls=True).over(wf))
        .withColumn("nt", F.last(t_if_anchor, ignorenulls=True).over(wf))
    )
    interp = (
        F.col("pc").cast("double")
        + (F.col("nc") - F.col("pc")).cast("double")
        * (
            (F.col("t_us") - F.col("pt")).cast("double")
            / (F.col("nt") - F.col("pt")).cast("double")
        )
    ) / 100
    return w.select(
        "user_id",
        "bucket",
        F.when(F.col("pt") == F.col("nt"), F.col("pc").cast("double") / 100)
        .when(F.col("pt").isNotNull() & F.col("nt").isNotNull(), interp)
        .alias("interp_value"),
    )
