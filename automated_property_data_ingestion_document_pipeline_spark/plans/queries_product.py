"""Product-analytics composites: RFM segmentation, A/B significance,
bigram language-model probabilities, and corrupt-JSON quarantine.

These are the dataflows a product/growth team runs daily on the event
stream (reference analogy: the engagement-fee dataflow of App.js §3,
generalized to the population level). House exactness rules apply:
integer sufficient statistics over associative sums, at most one fixed
IEEE expression tree of double ops per output value, deterministic
tiebreakers on every ranked surface.

Scale shapes:
- ``q_rfm_segments`` quantile-buckets the per-user aggregate table with
  the range-repartition + broadcast-offset rank (operators/ranking.py)
  — NO single-task NTILE window anywhere in the plan, unlike the
  oracle's textbook formulation (the oracle is the semantics, not the
  plan).
- ``q_ab_test`` reduces 100 TB of events to ONE row of integer counts
  before any floating point happens: two partial-agg shuffles, then a
  fixed z-statistic tree on the driver-sized aggregate.
- ``q_bigram_probs`` is the conditional-LM normalization: adjacent-pair
  counts (one explode + one agg) with the per-prefix total as an
  unordered window over the PAIR table (|vocab²| rows, not |corpus|).
- ``q_json_rescue`` is the bronze-boundary quarantine pattern: parse
  failures become rows in a dead-letter column instead of dropped
  records or failed jobs — ``from_json`` returns a NULL struct exactly
  when DuckDB's ``json_valid`` is false, and that equivalence is what
  the oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import ranking
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query


@query(
    "q_rfm_segments",
    oracle="""
    WITH p AS (
        SELECT user_id,
               CAST(date_diff('day', CAST(MAX(ts) AS DATE),
                              (SELECT CAST(MAX(ts) AS DATE) FROM events
                               WHERE event_type = 'purchase' AND ts IS NOT NULL))
                    AS BIGINT)                                AS recency_days,
               COUNT(*)                                       AS freq,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL AND value IS NOT NULL
          AND value > -1e12 AND value < 1e12
        GROUP BY user_id
    )
    SELECT user_id, recency_days, freq, cents,
           NTILE(5) OVER (ORDER BY recency_days, user_id)     AS r_bucket,
           NTILE(5) OVER (ORDER BY freq DESC, user_id)        AS f_bucket,
           NTILE(5) OVER (ORDER BY cents DESC, user_id)       AS m_bucket
    FROM p
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per purchasing user, recency (days since last
    purchase vs corpus end), frequency, and monetary cents, each
    quantile-bucketed into quintiles with deterministic user_id
    tiebreaks. Spark plan: one agg shuffle to the per-user table, then
    THREE scalable rank passes (range-repartition + broadcast offsets
    + exact integer NTILE arithmetic) — the oracle's three single-task
    NTILE windows express the same semantics, but this plan keeps every
    stage parallel at 100 TB because the ranked table is |users| and
    each pass is a range exchange, not a 1-task sort."""
    e = catalog.load(spark, sf_dir, "events")
    p = (
        e.filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            # ±1e12 domain bound: keeps cents exact in int64 and rejects
            # NaN/±Inf identically on both engines (queries_timeseries.py).
            & (F.col("value") > -1e12)
            & (F.col("value") < 1e12)
        )
        .groupBy("user_id")
        .agg(
            F.max("ts").cast("date").alias("_last_day"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents"),
        )
    )
    end_day = (
        e.filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull())
        .agg(F.max("ts").cast("date").alias("_end_day"))
    )
    p = p.join(F.broadcast(end_day)).select(
        "user_id",
        F.datediff("_end_day", "_last_day").cast("bigint").alias("recency_days"),
        "freq",
        "cents",
    )
    n_row = p.agg(F.count("*").cast("bigint").alias("_n"))
    base = p.join(F.broadcast(n_row))  # single-row broadcast, not a cartesian
    # r14 (verdict ask #4): the three quintile passes used to CHAIN —
    # each global_rank range-repartitioned the full widening output of
    # the previous one, so the lane executed ~35 strictly sequential
    # tiny stages (profiled 2.8 s at sf0.1, exec only 0.3 s of it).
    # Each bucket depends ONLY on its own (dimension, user_id) order,
    # so the base is cut once and the three rank passes run as
    # INDEPENDENT 3-column subtrees (guide §2.3 project-before-
    # exchange; §2 shuffle reuse — the base is range-shuffled narrow
    # instead of full-width three times), then the (user_id, bucket)
    # results join back. AQE picks broadcast for the tiny bucket
    # tables here and falls back to a user_id-keyed shuffle join at
    # real scale, where the joined columns are 2 narrow ints — fewer
    # bytes moved than the old full-width chain either way. Bucket
    # math (global_rank + ntile_expr) is unchanged, so the NTILE
    # semantics and oracle output are identical.
    from automated_property_data_ingestion_document_pipeline_spark.lineage import cut_lineage

    base = cut_lineage(base, durable=False)
    orders = {
        "r_bucket": ("recency_days", [F.col("recency_days").asc(), F.col("user_id").asc()]),
        "f_bucket": ("freq", [F.col("freq").desc(), F.col("user_id").asc()]),
        "m_bucket": ("cents", [F.col("cents").desc(), F.col("user_id").asc()]),
    }
    out = base
    for bucket, (dim, cols) in orders.items():
        ranked = ranking.global_rank(
            base.select("user_id", dim, "_n"), cols, rank_col="_rn"
        )
        out = out.join(
            ranked.select(
                "user_id",
                ranking.ntile_expr(F.col("_rn"), F.col("_n"), 5).alias(bucket),
            ),
            "user_id",
        )
    return out.drop("_n")


@query(
    "q_ab_test",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                        THEN 1 ELSE 0 END) AS converted
        FROM events
        GROUP BY user_id
    ),
    v AS (
        SELECT variant, COUNT(*) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_conv
        FROM u GROUP BY variant
    ),
    w AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
               MAX(CASE WHEN variant = 0 THEN n_conv END)  AS x0,
               MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
               MAX(CASE WHEN variant = 1 THEN n_conv END)  AS x1
        FROM v
    )
    SELECT n0, x0, n1, x1,
           CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
           CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
           CASE WHEN x0 + x1 > 0 AND x0 + x1 < n0 + n1 THEN
             (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                          * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                          * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
           END AS z_stat
    FROM w
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between deterministic experiment arms
    (user_id parity): per-arm user and converter counts reduce to ONE
    integer row before any floating point, then the pooled-variance z
    statistic is a fixed IEEE tree (+,-,*,/,sqrt are exactly rounded ⇒
    bit-identical on both engines, so the RAW double is emitted — §41:
    decimal ROUND is the one non-portable step and is omitted exactly
    because the operands are engine-identical). Plan: agg on
    user → agg on variant → 1-row pivot; no window, no join — the
    entire statistical test costs two partial-agg exchanges at 100 TB."""
    e = catalog.load(spark, sf_dir, "events")
    u = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 150.0), 1
                ).otherwise(0)
            ).alias("converted")
        )
        .select(
            (F.col("user_id") % 2).cast("bigint").alias("variant"), "converted"
        )
    )
    v = u.groupBy("variant").agg(
        F.count("*").alias("n_users"), F.sum("converted").cast("bigint").alias("n_conv")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("x1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p0 = d("x0") / d("n0")
    p1 = d("x1") / d("n1")
    pp = (d("x0") + d("x1")) / (d("n0") + d("n1"))
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / d("n0") + F.lit(1.0) / d("n1")))
    return w.select(
        "n0",
        "x0",
        "n1",
        "x1",
        p0.alias("p0"),
        p1.alias("p1"),
        F.when(
            (F.col("x0") + F.col("x1") > 0)
            & (F.col("x0") + F.col("x1") < F.col("n0") + F.col("n1")),
            (p1 - p0) / se,
        ).alias("z_stat"),
    )


_BG_MIN_COUNT = 5


@query(
    "q_bigram_probs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS arr
        FROM documents WHERE text IS NOT NULL
    ),
    pairs AS (
        SELECT u.x[1] AS w1, u.x[2] AS w2
        FROM toks,
        LATERAL (
            SELECT unnest(list_zip(arr[1:len(arr)-1], arr[2:len(arr)])) AS x
        ) u
    ),
    bg AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2
    ),
    tot AS (
        SELECT w1, w2, c12, CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1
        FROM bg
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, c1,
           CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS cond_p
    FROM tot WHERE c12 >= {_BG_MIN_COUNT}
    """,
)
def q_bigram_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional probabilities P(w2|w1) = c(w1,w2)/c(w1,·) —
    the counting core of n-gram language models and next-word scorers.
    Tokens materialize ONCE before any lambda (the §32 HOF-blowup rule);
    adjacent pairs come from zipping the token array with its tail
    row-locally (no positional self-join — the oracle's LATERAL join is
    the semantics, not the plan), then one agg to pair counts and one
    unordered window over the PAIR table (vocab-sized, not corpus-sized)
    for the prefix totals. Exactly one IEEE division per row."""
    docs = catalog.load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
        ).alias("arr"),
    )
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("arr"), 1, F.greatest(F.size("arr") - 1, F.lit(0))),
                F.slice(F.col("arr"), 2, F.greatest(F.size("arr") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bg = pairs.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c12"))
    c1 = F.sum("c12").over(Window.partitionBy("w1")).cast("bigint")
    return (
        bg.withColumn("c1", c1)
        .filter(F.col("c12") >= _BG_MIN_COUNT)
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            (F.col("c12").cast("double") / F.col("c1").cast("double")).alias(
                "cond_p"
            ),
        )
    )


@query(
    "q_json_rescue",
    oracle="""
    WITH raw AS (
        SELECT event_id,
               CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 4) ELSE props END AS s
        FROM events WHERE props IS NOT NULL
    ),
    j AS (
        SELECT event_id, s,
               COALESCE(CASE WHEN json_valid(s)
                             THEN json_type(json(s)) = 'OBJECT' END, FALSE)
                   AS is_obj,
               CASE WHEN json_valid(s) THEN json_type(json(s), '$.k') END AS ktype,
               CASE WHEN json_valid(s)
                    THEN TRY_CAST(json_extract_string(s, '$.k') AS BIGINT) END AS kraw
        FROM raw
    ),
    v AS (
        SELECT event_id, s,
               is_obj AND COALESCE(
                   ktype IS NULL OR ktype = 'NULL'
                   OR (ktype IN ('BIGINT', 'UBIGINT')
                       AND kraw BETWEEN -2147483648 AND 2147483647),
                   FALSE) AS parse_ok,
               CASE WHEN ktype IN ('BIGINT', 'UBIGINT')
                         AND kraw BETWEEN -2147483648 AND 2147483647
                    THEN CAST(kraw AS INT) END AS k
        FROM j
    )
    SELECT event_id,
           CASE WHEN parse_ok THEN k END AS k,
           NOT parse_ok AS quarantined,
           CASE WHEN NOT parse_ok THEN s END AS dead_letter
    FROM v
    """,
)
def q_json_rescue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze-boundary JSON quarantine: malformed payloads (every 13th
    event's props deterministically truncated to simulate upstream
    corruption) land in a dead-letter column instead of killing the job
    or silently vanishing. PERMISSIVE ``from_json`` with a
    ``columnNameOfCorruptRecord`` field captures the raw text of
    exactly the rows DuckDB's ``json_valid`` rejects (a VALID object
    merely missing the key parses to a NULL field and is NOT
    quarantined — the two cases stay distinguishable), and that
    equivalence is what the oracle pins. Row-local, zero shuffles; the
    dead-letter rows stay in-band so a downstream filter can route
    them to the quarantine sink."""
    e = catalog.load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    s = F.when(F.col("event_id") % 13 == 0, F.substring("props", 1, 4)).otherwise(
        F.col("props")
    )
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    parsed = F.from_json(
        s, schema, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
    )
    # Spark returns a NULL struct (not a corrupt record) for empty OR
    # whitespace-only input; DuckDB's json_valid rejects both. The
    # operator contract treats any blank payload as a dead letter
    # (ADVICE r04: the exact-empty special case left '  ' silently
    # un-quarantined on the Spark side). rlike over \s, not trim():
    # Spark's trim strips ONLY spaces, so a tab/newline payload would
    # still slip through — the edge corpus caught that immediately.
    quarantined = F.col("_p._corrupt").isNotNull() | F.col("_s").rlike("^\\s*$")
    return e.select("event_id", s.alias("_s"), parsed.alias("_p")).select(
        "event_id",
        F.col("_p.k").alias("k"),
        quarantined.alias("quarantined"),
        F.when(quarantined, F.coalesce(F.col("_p._corrupt"), F.col("_s"))).alias(
            "dead_letter"
        ),
    )


_VOCAB_K = 500


@query(
    "q_oov_rate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, u.tok
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS arr
            FROM documents WHERE text IS NOT NULL
        ),
        LATERAL (SELECT unnest(arr) AS tok) u
    ),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS rk
            FROM toks GROUP BY tok
        ) WHERE rk <= {_VOCAB_K}
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: per-document out-of-vocabulary rate
    against the corpus's own top-500 tokens — the tokenizer-fit
    measurement run before committing to a vocab (high OOV ⇒ retrain
    the tokenizer or re-mix the data). The vocab election ranks the
    DISTINCT-TOKEN table (vocab-bounded, not corpus-bounded) with the
    scalable global rank, the vocab itself broadcasts (500 rows), and
    the per-doc rate is one division after an integer conditional sum.
    Tokens materialize once before any lambda (§32/§39 HOF rule)."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    docs = catalog.load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
        ).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    vocab = (
        ranking.global_rank(
            counts, [F.col("n").desc(), F.col("tok").asc()], rank_col="rk"
        )
        .filter(F.col("rk") <= _VOCAB_K)
        .select(F.col("tok").alias("vtok"))
    )
    j = toks.join(F.broadcast(vocab), toks["tok"] == F.col("vtok"), "left")
    oov = F.sum(F.when(F.col("vtok").isNull(), 1).otherwise(0))
    return j.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        oov.cast("bigint").alias("n_oov"),
        (oov.cast("double") / F.count("*").cast("double")).alias("oov_rate"),
    )


@query(
    "q_json_flatten",
    oracle="""
    WITH raw AS (
        SELECT event_id, props AS s FROM events
        WHERE props IS NOT NULL AND json_valid(props)
          AND json_type(json(props)) = 'OBJECT'
    )
    SELECT r.event_id, u.key,
           json_extract_string(r.s, '$.' || u.key) AS val
    FROM raw r, LATERAL (SELECT unnest(json_keys(r.s)) AS key) u
    """,
)
def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON flattening: every (key, value) pair of every
    valid props object becomes a long-format row — the exploration
    query run BEFORE a schema is declared (which keys exist? how often?
    what do values look like?). ``from_json`` to ``map<string,string>``
    coerces scalars to their literal text exactly as DuckDB's
    ``json_extract_string`` does ('69', '3.7', 'true'; JSON null →
    NULL value, kept as a row), and non-object/malformed payloads
    yield a NULL map which ``explode`` drops — matching the oracle's
    object-only filter. Row-local fan-out, zero shuffles."""
    e = catalog.load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    m = F.from_json("props", "map<string,string>")
    return e.select("event_id", F.explode(m).alias("key", "val"))


@query(
    "q_odds_ratio",
    oracle="""
    WITH u AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    t AS (
        SELECT CAST(SUM(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM u
    )
    SELECT a, b, c, d,
           CASE WHEN b * c > 0
                THEN CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE)
           END AS odds_ratio,
           CASE WHEN c * (a + b) > 0
                THEN CAST(a * (c + d) AS DOUBLE)
                           / CAST(c * (a + b) AS DOUBLE)
           END AS relative_risk
    FROM t
    """,
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect sizes for the 2×2 experiment table: odds ratio a·d/b·c
    and relative risk a(c+d)/c(a+b) — the numbers reported NEXT TO
    q_ab_test's z statistic. Integer cross-products with ONE division
    each and NULL (not ±inf) for degenerate margins; the whole table is
    one conditional aggregate over the per-user reduction — two
    partial-agg exchanges end to end, like every test in this family."""
    e = catalog.load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150.0), 1
            ).otherwise(0)
        ).alias("conv")
    ).select((F.col("user_id") % 2).cast("bigint").alias("variant"), "conv")
    t = u.agg(
        F.sum(F.when((F.col("variant") == 1) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    return t.select(
        "a",
        "b",
        "c",
        "d",
        F.when(b * c > 0, (a * d).cast("double") / (b * c).cast("double"))
        .alias("odds_ratio"),
        F.when(
            c * (a + b) > 0,
            (a * (c + d)).cast("double") / (c * (a + b)).cast("double"),
        ).alias("relative_risk"),
    )


@query(
    "q_wilson_interval",
    oracle="""
    WITH u AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                        THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS x
        FROM u GROUP BY variant
    )
    SELECT variant, CAST(n AS BIGINT) AS n, x,
           CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
           (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                  + CAST('3.8416' AS DOUBLE) / (2.0 * n)
                  - CAST('1.96' AS DOUBLE) * sqrt(
                      (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                      * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) / n
                      + CAST('3.8416' AS DOUBLE) / (4.0 * n * n)))
                 / (1.0 + CAST('3.8416' AS DOUBLE) / n) AS wilson_lo,
           (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                  + CAST('3.8416' AS DOUBLE) / (2.0 * n)
                  + CAST('1.96' AS DOUBLE) * sqrt(
                      (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                      * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) / n
                      + CAST('3.8416' AS DOUBLE) / (4.0 * n * n)))
                 / (1.0 + CAST('3.8416' AS DOUBLE) / n) AS wilson_hi
    FROM v
    """,
)
def q_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval per experiment arm — the
    error bars that stay inside [0,1] and behave at small n, unlike the
    naive normal interval a dashboard usually draws. The z constants
    ride as STRING-cast literals (1.96 / z² = 3.8416) so both engines
    parse the identical doubles (the §41 DECIMAL-literal lesson), and
    the whole bound is one fixed IEEE tree (+,−,×,/,sqrt) over the
    single integer (n, x) row per arm — bit-identical before the
    defensive round. Completes the experiment-analysis family: z-test
    (significance), OR/RR (effect size), Wilson (uncertainty)."""
    e = catalog.load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150.0), 1
            ).otherwise(0)
        ).alias("conv")
    ).select((F.col("user_id") % 2).cast("bigint").alias("variant"), "conv")
    v = u.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n"), F.sum("conv").cast("bigint").alias("x")
    )
    n_d = F.col("n").cast("double")
    p = F.col("x").cast("double") / n_d
    z = F.lit("1.96").cast("double")
    z2 = F.lit("3.8416").cast("double")
    center = p + z2 / (F.lit(2.0) * n_d)
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n_d + z2 / (F.lit(4.0) * n_d * n_d))
    denom = F.lit(1.0) + z2 / n_d
    return v.select(
        "variant",
        "n",
        "x",
        p.alias("p_hat"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


@query(
    "q_nps",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                         AND value > -1e12 AND value < 1e12
                        THEN CAST(ROUND(value * 100) AS BIGINT) END) AS best_cents
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ),
    seg AS (
        SELECT user_id,
               CASE WHEN best_cents >= 20000 THEN 'promoter'
                    WHEN best_cents >= 5000  THEN 'passive'
                    ELSE 'detractor' END AS segment
        FROM u
    ),
    c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN segment = 'promoter' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_promoters,
               CAST(SUM(CASE WHEN segment = 'passive' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_passives,
               CAST(SUM(CASE WHEN segment = 'detractor' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_detractors
        FROM seg
    )
    SELECT n_users, n_promoters, n_passives, n_detractors,
           CAST(100 * (n_promoters - n_detractors) AS DOUBLE)
                 / CAST(n_users AS DOUBLE) AS nps
    FROM c
    """,
)
def q_nps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NPS-style segmentation on behavioral value: each user's best
    purchase elects promoter (≥$200) / passive (≥$50) / detractor
    (below, incl. never-purchased via NULL < any threshold falling to
    ELSE), and the score is the classic 100·(P−D)/N — integer counts,
    one division. The three-bucket CASE chain is evaluated identically
    on both engines because NULL fails both ≥ comparisons the same
    way. Two partial-agg exchanges end to end."""
    e = catalog.load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    best = F.max(
        F.when(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & (F.col("value") > -1e12)
            & (F.col("value") < 1e12),
            F.round(F.col("value") * 100).cast("bigint"),
        )
    )
    u = e.groupBy("user_id").agg(best.alias("best_cents"))
    seg = u.select(
        F.when(F.col("best_cents") >= 20000, "promoter")
        .when(F.col("best_cents") >= 5000, "passive")
        .otherwise("detractor")
        .alias("segment")
    )
    c = seg.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("segment") == "promoter", 1).otherwise(0))
        .cast("bigint")
        .alias("n_promoters"),
        F.sum(F.when(F.col("segment") == "passive", 1).otherwise(0))
        .cast("bigint")
        .alias("n_passives"),
        F.sum(F.when(F.col("segment") == "detractor", 1).otherwise(0))
        .cast("bigint")
        .alias("n_detractors"),
    )
    return c.select(
        "n_users",
        "n_promoters",
        "n_passives",
        "n_detractors",
        (
            (100 * (F.col("n_promoters") - F.col("n_detractors"))).cast("double")
            / F.col("n_users").cast("double")
        ).alias("nps"),
    )


@query(
    "q_activity_profile",
    oracle="""
    SELECT CAST(EXTRACT(ISODOW FROM ts) AS INT) AS dow,
           CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekday × hour activity heatmap (ISO day-of-week 1=Monday,
    matching DuckDB's ISODOW to Spark's dayofweek remapped) — the
    when-are-users-here matrix behind every staffing and batch-window
    decision. One grouped aggregate to a ≤168-cell table; the distinct
    user count per cell is the only expand."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    # Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Monday..7=Sunday
    iso_dow = ((F.dayofweek("ts") + 5) % 7) + 1
    return e.groupBy(
        iso_dow.cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "q_audience_overlap",
    oracle="""
    WITH m AS (
        SELECT DISTINCT user_id, event_type FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    sizes AS (SELECT event_type, COUNT(*) AS n FROM m GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS seg_a, b.event_type AS seg_b, COUNT(*) AS n_both
        FROM m a JOIN m b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.seg_a, p.seg_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(p.n_both AS DOUBLE)
                 / CAST(sa.n + sb.n - p.n_both AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.seg_a
    JOIN sizes sb ON sb.event_type = p.seg_b
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of behavioral segments
    (event types), the shared-user count and Jaccard overlap — the
    report behind 'should these two campaigns share a budget'. The
    self-join runs on the DISTINCT (user, segment) membership table
    (|users|·|segments| max) keyed on user, with the alphabet-bounded
    ordering predicate inside the join — never a cartesian; sizes
    broadcast back. Integer counts, one division per pair."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    m = e.select("user_id", "event_type").distinct()
    sizes = m.groupBy("event_type").agg(F.count("*").alias("n"))
    a = m.select(F.col("user_id").alias("u"), F.col("event_type").alias("seg_a"))
    b = m.select(F.col("user_id").alias("u2"), F.col("event_type").alias("seg_b"))
    pairs = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("seg_a") < F.col("seg_b")))
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("seg_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("seg_b"), F.col("n").alias("n_b"))
    out = pairs.join(F.broadcast(sa), "seg_a").join(F.broadcast(sb), "seg_b")
    return out.select(
        "seg_a",
        "seg_b",
        "n_both",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (
            F.col("n_both").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
        ).alias("jaccard"),
    )
