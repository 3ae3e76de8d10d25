"""Extended analytic registrations: cube / grouping sets / intersect,
richer windows (ntile, dense_rank, cume_dist), string & date function
batteries, conditional and statistical aggregates, exact percentiles,
positional explode, regex extraction, histogram binning.

These widen the engine surface beyond the reference's literal operators
(SURVEY §2.5 A6/A8 call out cube/intersect; the rest are the standard
analytic vocabulary any replacement engine must carry). Cross-engine
parity notes are inline where conventions differ (day-of-week origin,
HUGEINT sums, accumulation-order-sensitive moments → rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans._sql import (
    money_sum,
    money_sum_sql,
)
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# -- cube ----------------------------------------------------------------------


@query(
    "q_cube",
    oracle=f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_cust,
           {money_sum_sql('c_acctbal')} AS total_acctbal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE(r_name, n_name)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over the region→nation hierarchy (q_rollup's sibling;
    adds the nation-only marginals)."""
    t = catalog.load_all(spark, sf_dir)
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.cube("r_name", "n_name").agg(
        F.count("*").alias("n_cust"),
        money_sum(F.col("c_acctbal")).alias("total_acctbal"),
    )


# -- grouping sets -------------------------------------------------------------


@query(
    "q_grouping_sets",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (lang marginal + source marginal + grand
    total) via Spark SQL over a temp view."""
    catalog.load(spark, sf_dir, "documents").createOrReplaceTempView("gs_documents")
    return spark.sql(
        """
        SELECT lang, source, COUNT(*) AS n_docs
        FROM gs_documents
        GROUP BY GROUPING SETS ((lang), (source), ())
        """
    )


# -- intersect -----------------------------------------------------------------


@query(
    "q_intersect",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection with distinct semantics (A8: counties present in
    both the UI list and the CRS code map)."""
    c = catalog.load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = catalog.load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


# -- richer ranking windows ----------------------------------------------------


@query(
    "q_window_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           dense_rank() OVER w AS drank,
           cume_dist() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice NULLS FIRST, o_orderkey)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / dense_rank / cume_dist over a totally-ordered window
    (tiebreak on key → no peer groups → deterministic everywhere).
    Oracle pins NULLS FIRST: Spark ASC defaults nulls-first, DuckDB
    defaults NULLS LAST — a NULL measure would silently reorder."""
    o = catalog.load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drank"),
        F.cume_dist().over(w).alias("cdist"),
    )


# -- string battery ------------------------------------------------------------


@query(
    "q_string_fns",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up,
           lower(c_mktsegment) AS lo,
           substring(c_name, 1, 8) AS sub8,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           concat_ws('-', c_mktsegment, c_name) AS joined,
           reverse(c_name) AS rev,
           levenshtein(regexp_replace(c_name, '[^\\x00-\\x7F]', '?', 'g'),
                       reverse(regexp_replace(c_name, '[^\\x00-\\x7F]', '?', 'g'))) AS lev,
           length(c_name) AS name_len
    FROM customer
    """,
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery: case mapping, substring, padding,
    concat_ws, reverse, Levenshtein distance. Levenshtein is computed on
    an ASCII projection ('?' for non-ASCII) because DuckDB's
    levenshtein counts BYTES while Spark counts codepoints — multibyte
    chars would diverge by their encoded length."""
    c = catalog.load(spark, sf_dir, "customer")
    ascii_name = F.regexp_replace("c_name", r"[^\x00-\x7F]", "?")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("joined"),
        F.reverse("c_name").alias("rev"),
        F.levenshtein(ascii_name, F.reverse(ascii_name)).alias("lev"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


# -- date battery --------------------------------------------------------------


@query(
    "q_date_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(dayofweek(o_orderdate) AS INT) AS dow0,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3mo,
           CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR) AS qtr_start
    FROM orders
    """,
)
def q_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function battery. Convention alignment: Spark dayofweek is
    1=Sunday, DuckDB 0=Sunday → emit the 0-based form; add_months clamps
    end-of-month identically in both engines; DATE outputs emitted as
    ISO strings (pandas renders DuckDB DATE as midnight timestamps,
    Spark DATE as date objects — strings sidestep the normalization)."""
    o = catalog.load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).alias("dow0"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.add_months(d, 3).cast("string").alias("plus3mo"),
        F.date_trunc("quarter", "o_orderdate").cast("date").cast("string").alias("qtr_start"),
    )


# -- conditional aggregates ----------------------------------------------------


@query(
    "q_conditional_agg",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT) AS n_big,
           COUNT(*) AS n_all,
           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN TRY_CAST(round(value * 100, 0) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) / 100 AS even_user_value
    FROM events GROUP BY event_type
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (count_if + CASE-gated sums in
    exact cents)."""
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")  # non-finite -> NULL, both engines
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.count("*").alias("n_all"),
        (
            F.sum(F.when(F.col("user_id") % 2 == 0, cents).otherwise(F.lit(0))).cast("double")
            / 100
        ).alias("even_user_value"),
    )


# -- exact percentiles ---------------------------------------------------------


@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: both linear-interpolate at p·(n−1)); rounded to
    4 dp — interpolation arithmetic is the one row-local op the engines
    may do in different order."""
    o = catalog.load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


# -- statistical aggregates ----------------------------------------------------


@query(
    "q_stats_agg",
    oracle="""
    SELECT lang,
           round(stddev_samp(n_chars), 6) AS sd_chars,
           round(var_samp(n_chars), 6) AS var_chars,
           round(corr(CAST(n_chars AS DOUBLE), CAST(doc_id AS DOUBLE)), 6) AS corr_chars_id
    FROM documents GROUP BY lang
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (stddev/variance/correlation), rounded:
    Welford-style merge order differs across engines in the last ulp."""
    d = catalog.load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.stddev_samp("n_chars"), 6).alias("sd_chars"),
        F.round(F.var_samp("n_chars"), 6).alias("var_chars"),
        F.round(
            F.corr(F.col("n_chars").cast("double"), F.col("doc_id").cast("double")), 6
        ).alias("corr_chars_id"),
    )


# -- positional explode --------------------------------------------------------


@query(
    "q_posexplode",
    oracle="""
    SELECT doc_id,
           unnest(range(0, len(string_split(text, ' ')))) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 20
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (UDTF surface, SURVEY §2.8): token + position.
    DuckDB zips parallel unnests of equal length; Spark posexplode emits
    (pos, val) directly."""
    d = catalog.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


# -- regex extraction ----------------------------------------------------------


@query(
    "q_regexp_extract",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '#([0-9]+)', 1) AS digit_run,
           CAST(TRY_CAST(regexp_extract(c_name, '#([0-9]+)', 1) AS BIGINT) AS BIGINT) AS id_num
    FROM customer
    """,
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction + numeric parse of the Customer#NNN id
    (the parcel-id-extraction shape, crs_bot.pyc ~75-95)."""
    c = catalog.load(spark, sf_dir, "customer")
    grp = F.regexp_extract("c_name", "#([0-9]+)", 1)
    return c.select(
        "c_custkey",
        grp.alias("digit_run"),
        grp.try_cast("bigint").alias("id_num"),
    )


# -- histogram binning ---------------------------------------------------------


@query(
    "q_histogram",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN isfinite(value)
                  THEN TRY_CAST(floor(value / 25) AS BIGINT) END AS bucket
      FROM events)
    SELECT bucket, COUNT(*) AS n, round(bucket * 25.0, 1) AS bucket_lo
    FROM b GROUP BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor binning (portable width_bucket:
    DuckDB 1.0 lacks the builtin). Non-finite and bigint-overflowing
    values bin to the NULL bucket on both engines: Spark's
    floor(double→long) SATURATES to Long.MaxValue for value/25 ≥ 2^63
    where DuckDB's TRY_CAST yields NULL, so the guard cuts off exactly
    where the QUOTIENT leaves long range (guarding the quotient, not
    |value| < 25·2^63, sidesteps the division's last-ulp rounding at
    the boundary), not at an arbitrary 1e300 (r02 advice)."""
    ev = catalog.load(spark, sf_dir, "events")
    q = F.col("value") / 25
    finite = (
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & (q >= -float(2**63))
        & (q < float(2**63))
    )
    bucket = F.when(finite, F.floor(q)).cast("bigint")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(bucket * 25.0, 1).alias("bucket_lo"),
    )


# -- funnel analysis -----------------------------------------------------------


@query(
    "q_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    v AS (
      SELECT e.user_id, MIN(e.ts) AS v_ts
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s.s_ts GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > v.v_ts GROUP BY 1)
    SELECT s.user_id,
           CAST(1 + CAST(v.user_id IS NOT NULL AS INT)
                  + CAST(p.user_id IS NOT NULL AS INT) AS INT) AS stage,
           s.s_ts, v.v_ts, p.p_ts
    FROM s LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → view → purchase): each stage's timestamp
    is the first qualifying event STRICTLY AFTER the previous stage (a
    view before signup does not count — the ordering that naive
    min-per-type funnels get wrong). Every shuffle in the plan is keyed
    on user_id: at local SF, AQE broadcasts the aggregated stage sides;
    at fact scale those joins become sort-merge over the SAME
    partitioning, so Catalyst's exchange reuse keeps it to one
    partitioning of each filtered event subset — never an unkeyed or
    cross join."""
    ev = catalog.load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.join(v, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("v_ts").isNotNull().cast("int")
                + F.col("p_ts").isNotNull().cast("int")
            ).alias("stage"),
            "s_ts",
            "v_ts",
            "p_ts",
        )
    )


# -- approximation quality: approx_percentile error vs exact -------------------


@query("q_quantile_error")  # rows-only: measures our own approximation
def q_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-measurement for the documented sketch-based scale path
    (percentile_approx / KLL-style): relative error of
    approx_percentile(accuracy=100) against the exact interpolated
    percentile, per priority group — the same instrumentation pattern as
    q_lsh_recall/q_ivf_recall (never ship an approximation without its
    measured error). At 100 TB the exact percentile's full sort-per-group
    is the cost the sketch removes; accuracy trades memory for error
    bound (~1/accuracy)."""
    o = catalog.load(spark, sf_dir, "orders")
    both = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(100)).alias("approx_p50"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("exact_p99"),
        F.percentile_approx("o_totalprice", F.lit(0.99), F.lit(100)).alias("approx_p99"),
    )
    rel = lambda a, e: F.round(F.abs(F.col(a) - F.col(e)) / F.abs(F.col(e)), 6)  # noqa: E731
    out = both.select(
        "o_orderpriority",
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("approx_p50", 2).alias("approx_p50"),
        rel("approx_p50", "exact_p50").alias("rel_err_p50"),
        rel("approx_p99", "exact_p99").alias("rel_err_p99"),
    )
    # driver-visible evidence (the q_*_recall gate-row pattern, r08):
    # one extra row appears ONLY when every group's value error is
    # under 10% — present on the real corpora (measured ≤2.2% at
    # sf0.01), honestly absent on the adversarial edge corpus whose
    # heavy-tailed values void any VALUE-error bound (the sketch
    # guarantee is rank error)
    gate = out.agg(
        F.lit("GATE rel_err<0.10").alias("o_orderpriority"),
        F.lit(None).cast("double").alias("exact_p50"),
        F.lit(None).cast("double").alias("approx_p50"),
        F.max("rel_err_p50").alias("rel_err_p50"),
        F.max("rel_err_p99").alias("rel_err_p99"),
    ).filter((F.col("rel_err_p50") < 0.10) & (F.col("rel_err_p99") < 0.10))
    return out.unionByName(gate)


# -- pivot (long -> wide) ------------------------------------------------------


@query(
    "q_pivot_multi",
    oracle="""
    SELECT user_id,
           CAST(SUM(TRY_CAST(round(value * 100, 0) AS BIGINT))
                FILTER (event_type = 'view') AS DOUBLE) / 100 AS view_value,
           CAST(SUM(TRY_CAST(round(value * 100, 0) AS BIGINT))
                FILTER (event_type = 'click') AS DOUBLE) / 100 AS click_value,
           CAST(SUM(TRY_CAST(round(value * 100, 0) AS BIGINT))
                FILTER (event_type = 'purchase') AS DOUBLE) / 100
             AS purchase_value,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view_n,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click_n,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
             AS purchase_n
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (the inverse of q_unpivot): per-user columns for
    each event type's exact-cents value sum and count, via the native
    ``pivot`` with an EXPLICIT category list — never the
    two-pass distinct-discovery variant, which at 100 TB adds a full
    extra scan and makes the output schema data-dependent (a schema
    that changes when a new event type appears is an operational
    hazard, not a feature). Spark plans it as exact aggregation on
    (key, category) then pivotfirst on key — two exchanges, both
    map-side combined, so shuffle volume is |users x categories|
    (pinned by tests/test_plan_properties.py). The oracle is FILTER-ed
    conditional aggregation:
    pivot is definitionally conditional aggregation, so the two forms
    must agree bit-for-bit (cents trick keeps the sums exact)."""
    ev = catalog.load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).try_cast("bigint")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(
            (F.sum(cents).cast("double") / 100).alias("value"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    # pivot names columns '<cat>_<agg-alias>'; count is 0 (not NULL) for
    # absent (user, type) pairs in DuckDB's FILTER form — align with
    # coalesce, since Spark's pivot leaves the whole cell NULL.
    return wide.select(
        "user_id",
        F.col("view_value"),
        F.col("click_value"),
        F.col("purchase_value"),
        F.coalesce(F.col("view_n"), F.lit(0)).alias("view_n"),
        F.coalesce(F.col("click_n"), F.lit(0)).alias("click_n"),
        F.coalesce(F.col("purchase_n"), F.lit(0)).alias("purchase_n"),
    )


# -- mergeable HLL sketches (shard -> global) ---------------------------------


@query("q_hll_shard_merge")  # rows-only: sketch estimate is engine-specific
def q_hll_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch architecture (Datasketches HLL, Spark 4
    hll_sketch_agg/hll_union_agg): per-shard sketches of the
    distinct-user set — here sharded by event_type — union-merged into
    the global estimate WITHOUT re-reading the data. This is the 100 TB
    distinct-count pattern: each partition/day/source keeps an O(KB)
    sketch, rollups at any grain are sketch unions (associative,
    commutative, order-independent — HLL registers are max-merged), and
    the raw data is touched once. Each row carries the estimate, the
    exact count and the relative error (self-measured, the
    q_quantile_error pattern); the OVERALL row ('*') is the union-merge.
    Invariant |rel_err| < 0.05 enforced by tests/test_operators.py."""
    ev = catalog.load(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("_sk"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    shard = per.select(
        "event_type",
        F.hll_sketch_estimate("_sk").alias("est_distinct"),
        "exact_distinct",
        (
            (F.hll_sketch_estimate("_sk") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_err"),
    )
    exact_all = ev.agg(F.count_distinct("user_id").alias("e")).select("e")
    merged = (
        per.agg(F.hll_union_agg("_sk").alias("_u"))
        .crossJoin(F.broadcast(exact_all))
        .select(
            F.lit("*").alias("event_type"),
            F.hll_sketch_estimate("_u").alias("est_distinct"),
            F.col("e").alias("exact_distinct"),
            ((F.hll_sketch_estimate("_u") - F.col("e")) / F.col("e")).alias("rel_err"),
        )
    )
    out = shard.unionByName(merged)
    # driver-visible evidence (r08): the gate row appears ONLY when
    # every shard AND the merge land within 5% of exact — the bound
    # tests/test_operators.py enforces locally
    gate = out.agg(
        F.lit("GATE |rel_err|<0.05").alias("event_type"),
        F.lit(None).cast("double").alias("est_distinct"),
        F.lit(None).cast("long").alias("exact_distinct"),
        F.max(F.abs("rel_err")).alias("rel_err"),
    ).filter(F.col("rel_err") < 0.05)
    return out.unionByName(gate)


# -- approximate heavy hitters (exact regime) ---------------------------------


@query(
    "q_heavy_hitters",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k sketch (Spark 4), exploded to
    (item, count) rows. Run in its EXACT regime: the sketch tracks up
    to 10 000 items, the domain has 5 — when capacity ≥ cardinality the
    'approximate' counts are exact and fully oracle-checkable (k = 50 ≥
    any corpus's type domain — the edge corpus carries extra
    adversarial types — so tie-order among equal counts can't change
    the SET).
    At 100 TB with a real heavy-tail domain the same one-pass sketch
    degrades gracefully to approximate top-k with bounded-error counts
    — the exact-regime oracle pins the plumbing; the mergeable-sketch
    rollup story is q_hll_shard_merge's."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.item AS event_type, CAST(t.count AS BIGINT) AS n
        FROM (SELECT explode(approx_top_k(event_type, 50)) AS t
              FROM events WHERE event_type IS NOT NULL)
        """
    )


# -- sequence-pattern matching (MATCH_RECOGNIZE stand-in) ---------------------


@query(
    "q_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             array_to_string(list(event_type ORDER BY ts, event_id), ' ')
               AS s
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id)
    SELECT user_id,
           regexp_matches(s, 'view( \\S+)* click( \\S+)* purchase')
             AS has_funnel_path,
           CAST(len(regexp_extract_all(s, 'view( \\S+)* purchase'))
                AS BIGINT) AS n_view_purchase_spans
    FROM seq
    """,
)
def q_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over event streams (the
    MATCH_RECOGNIZE stand-in neither engine ships): collapse each
    user's ordered event types into one string, then run ordinary
    regexes — 'view … click … purchase' with arbitrary gaps. The
    collapse is collect_list over a deterministic (ts, event_id) sort;
    pattern evaluation is row-local. Greedy non-overlapping span counts
    match between Java regex and RE2 because the pattern is
    backtracking-free on this alphabet. At 100 TB the per-user string
    is bounded by per-user history (the same bounded-state argument as
    sessionization); unbounded keys would chunk by time first."""
    ev = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            " ",
        ).alias("s")
    )
    return seq.select(
        "user_id",
        F.col("s").rlike(r"view( \S+)* click( \S+)* purchase").alias("has_funnel_path"),
        F.size(
            F.regexp_extract_all("s", F.lit(r"view( \S+)* purchase"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_view_purchase_spans"),
    )


# -- conversion latency -------------------------------------------------------


@query(
    "q_conversion_latency",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id)
    SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
           CAST(date_diff('microsecond', s.signup_ts, p.first_purchase_ts)
                AS BIGINT) AS latency_us
    FROM s LEFT JOIN p USING (user_id)
    """,
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency per user (the funnel's
    time dimension): first signup, first purchase AT OR AFTER it, exact
    integer-micro delta; unconverted users keep a NULL latency. ONE
    events scan: the per-user signup floor is a window minimum over
    conditional values, the qualifying-purchase minimum a conditional
    aggregate over the same partitioning — the oracle spells it as two
    aggregates + join, same result.

    The membership gate is "user HAS a signup event" (boolean window
    max), NOT "the min signup ts is non-null": a user whose signup
    events all carry NULL ts must still be emitted with a NULL
    signup_ts, exactly as the oracle's GROUP BY keeps the group while
    MIN over all-NULL yields NULL (ADVICE r03)."""
    ev = catalog.load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    signup_ts = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    has_signup = F.max(F.coalesce(F.col("event_type") == "signup", F.lit(False))).over(w)
    t = (
        ev.withColumn("_signup_ts", signup_ts)
        .withColumn("_has_signup", has_signup)
        .filter(F.col("_has_signup"))
    )
    out = t.groupBy("user_id").agg(
        F.min("_signup_ts").alias("signup_ts"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("_signup_ts")),
                F.col("ts"),
            )
        ).alias("first_purchase_ts"),
    )
    lat = (
        F.unix_micros(F.col("first_purchase_ts").cast("timestamp"))
        - F.unix_micros(F.col("signup_ts").cast("timestamp"))
    ).cast("bigint")
    return out.select("user_id", "signup_ts", "first_purchase_ts", lat.alias("latency_us"))


@query(
    "q_window_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    v AS (
      SELECT e.user_id, MIN(e.ts) AS v_ts
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s.s_ts
        AND e.ts <= s.s_ts + INTERVAL 24 HOUR GROUP BY 1),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN v USING (user_id)
      JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.v_ts
        AND e.ts <= s.s_ts + INTERVAL 24 HOUR GROUP BY 1)
    SELECT s.user_id,
           CAST(1 + CAST(v.user_id IS NOT NULL AS INT)
                  + CAST(p.user_id IS NOT NULL AS INT) AS INT) AS stage,
           s.s_ts, v.v_ts, p.p_ts
    FROM s LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-CONSTRAINED ordered funnel (the windowFunnel flavor): every
    later stage must land within 24 h of the user's FIRST signup, not
    merely after the previous stage — the conversion-deadline semantics
    growth teams actually report. Same one-partitioning-per-stage plan
    as q_funnel (every join keyed on user_id, exchange reuse collapses
    the stage subsets); the deadline is one extra pushed predicate, so
    the window costs nothing at 100 TB."""
    ev = catalog.load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    deadline = F.col("s_ts") + F.expr("INTERVAL 24 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter((F.col("ts") > F.col("s_ts")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .join(s, "user_id")
        .filter((F.col("ts") > F.col("v_ts")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.join(v, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("v_ts").isNotNull().cast("int")
                + F.col("p_ts").isNotNull().cast("int")
            ).cast("int").alias("stage"),
            "s_ts",
            "v_ts",
            "p_ts",
        )
    )


@query(
    "q_time_rollup",
    oracle="""
    WITH ev AS (
        SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)   AS day,
               CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR)  AS week,
               CAST(CAST(date_trunc('month', ts) AS DATE) AS VARCHAR) AS month,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
          AND value > -1e12 AND value < 1e12
    )
    SELECT day, week, month,
           CASE WHEN day IS NOT NULL THEN 'day'
                WHEN week IS NOT NULL THEN 'week'
                ELSE 'month' END AS grain,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM ev
    GROUP BY GROUPING SETS ((day), (week), (month))
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup in ONE scan: daily, weekly, and monthly
    event counts + cents totals via GROUPING SETS — the dashboard
    backfill that would otherwise cost three scans. Spark plans this as
    a single Expand (each row fans into 3 grain-tagged copies) feeding
    one partial-agg shuffle, so input is read once no matter how many
    grains; both engines truncate weeks to ISO Monday. Grain is
    labelled from which bucket survived the grouping NULL pattern."""
    ev = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > -1e12)
        & (F.col("value") < 1e12)
    )
    ev.select(
        F.date_trunc("day", "ts").cast("date").cast("string").alias("day"),
        F.date_trunc("week", "ts").cast("date").cast("string").alias("week"),
        F.date_trunc("month", "ts").cast("date").cast("string").alias("month"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).createOrReplaceTempView("tr_events")
    return spark.sql(
        """
        SELECT day, week, month,
               CASE WHEN day IS NOT NULL THEN 'day'
                    WHEN week IS NOT NULL THEN 'week'
                    ELSE 'month' END AS grain,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM tr_events
        GROUP BY GROUPING SETS ((day), (week), (month))
        """
    )


@query(
    "q_user_growth",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    first_seen AS (
        SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY user_id
    ),
    daily AS (
        SELECT e.day,
               COUNT(DISTINCT e.user_id) AS dau,
               COUNT(DISTINCT CASE WHEN f.first_day = e.day
                                   THEN e.user_id END) AS new_users
        FROM ev e JOIN first_seen f ON f.user_id = e.user_id
        GROUP BY e.day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(dau AS BIGINT) AS dau,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(dau - new_users AS BIGINT) AS returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM daily
    """,
)
def q_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth dashboard's first chart: per day — DAU, new vs
    returning split (new = first-ever activity that day), and
    cumulative registered users. 'Cumulative distinct' is computed
    WITHOUT any running-distinct state: each user contributes to
    exactly their first-seen day, so the cumulative-uniques curve is
    just a prefix sum of new-user counts — the identity that makes
    this cheap at 100 TB (two keyed shuffles + a day-domain window)
    where a naive per-day distinct-to-date rescan would be quadratic."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    ev = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        ev.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.countDistinct(
                F.when(F.col("first_day") == F.col("day"), F.col("user_id"))
            ).alias("new_users"),
        )
    )
    # day-domain window (≤ calendar span regardless of corpus size)
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("new_users").cast("bigint").alias("new_users"),
        (F.col("dau") - F.col("new_users")).cast("bigint").alias("returning_users"),
        F.sum("new_users").over(wd).cast("bigint").alias("cumulative_users"),
    )


@query(
    "q_diversity_index",
    oracle="""
    WITH c AS (
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
               COUNT(*) AS n
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(n * n) AS BIGINT) AS sum_sq,
           ROUND(1.0 - CAST(SUM(n * n) AS DOUBLE)
                 / (CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)), 6)
               AS gini_impurity
    FROM c GROUP BY day
    """,
)
def q_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily behavioral-diversity index: Gini impurity / Simpson's
    1 − Σpᵢ² of the event-type mix — 0 when a day is all one action,
    →1 as behavior diversifies (the engagement-health metric, and the
    split criterion decision trees optimize). No per-class
    probabilities ever materialize: Σnᵢ² and (Σnᵢ)² are exact BIGINTs
    from the two-level aggregate and the index is ONE division — the
    same algebraic-aggregate shape as the χ²/OLS family, two
    partial-agg shuffles at any scale."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    c = e.groupBy(
        F.col("ts").cast("date").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    return c.groupBy("day").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
        F.round(
            F.lit(1.0)
            - F.sum(F.col("n") * F.col("n")).cast("double")
            / (F.sum("n").cast("double") * F.sum("n").cast("double")),
            6,
        ).alias("gini_impurity"),
    )
