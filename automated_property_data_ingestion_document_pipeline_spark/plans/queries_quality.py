"""Entity-resolution blocking, exact allocation, and forensic
data-quality audits.

- **Sorted-neighborhood blocking** is the third ER candidate generator
  (after FastSS deletion-neighborhoods and MinHash bands): sort the
  corpus by the blocking key, compare each record only to its w nearest
  neighbors in sort order. The global sort rank comes from the
  range-repartition + broadcast-offset technique (q_global_rownum) —
  NOT a single-task global window — and the neighbor pairing is plain
  integer equi-joins on the rank, so the whole plan parallelizes at
  100 TB.

- **Largest-remainder allocation** (Hamilton method) distributes an
  integer sample budget across strata exactly proportionally — the
  missing exact step behind every "sample k docs per domain" spec.
  Pure integer arithmetic end to end: base = ⌊T·nᵢ/N⌋, remainders
  ranked integerly, +1 to the top (T − Σbase).

- **Benford first-digit audit**: the classic forensic screen on money
  columns. Digit extraction is integer/string-exact; the nine expected
  frequencies are shared literals, so deviation doubles match bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query


@query(
    "q_sorted_neighborhood",
    oracle="""
    WITH r AS (
      SELECT c_custkey, c_name,
             ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
      FROM customer WHERE c_name IS NOT NULL
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(b.rn - a.rn AS BIGINT) AS rank_dist,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
    FROM r a JOIN r b ON b.rn = a.rn + 1 OR b.rn = a.rn + 2
    WHERE levenshtein(a.c_name, b.c_name) <= 3
    """,
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER blocking (window w=3): candidate pairs =
    records within 2 positions of each other in (name, id) sort order,
    kept when edit distance ≤ 3. The rank is computed scalably
    (range-repartition → local row_number → broadcast offsets); the
    neighbor expansion is two integer equi-joins on the rank — the
    oracle's single-task global window is the semantics, not the plan.
    Complements FastSS (bounded distance, any order) with the classic
    sort-order blocker that also catches prefix typos."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    c = (
        catalog.load(spark, sf_dir, "customer")
        .filter(F.col("c_name").isNotNull())
        .select("c_custkey", "c_name")
    )
    # ranking.global_rank pins one sampled range-partitioning (lazy
    # localCheckpoint) — the inline version this replaced could
    # re-sample boundaries per consumer subtree and corrupt ranks.
    ranked = ranking.global_rank(
        c, [F.col("c_name").asc(), F.col("c_custkey").asc()], rank_col="rn"
    ).select("c_custkey", "c_name", "rn")
    a = ranked.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("rn").alias("rn_a"),
    )
    b = ranked.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("rn").alias("rn_b"),
    )
    pairs = None
    for d in (1, 2):
        p = a.join(b, F.col("rn_b") == F.col("rn_a") + d)
        pairs = p if pairs is None else pairs.unionByName(p)
    lev = F.levenshtein("name_a", "name_b")
    return (
        pairs.filter(lev <= 3)
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            (F.col("rn_b") - F.col("rn_a")).cast("bigint").alias("rank_dist"),
            lev.cast("bigint").alias("lev"),
        )
    )


_ALLOC_TOTAL = 1000


@query(
    "q_largest_remainder",
    oracle=f"""
    WITH counts AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang, source
    ),
    scaled AS (
      SELECT lang, source, n_docs,
             SUM(n_docs) OVER () AS n_total,
             ({_ALLOC_TOTAL} * n_docs) // SUM(n_docs) OVER () AS base,
             ({_ALLOC_TOTAL} * n_docs) % SUM(n_docs) OVER () AS rem
      FROM counts
    ),
    ranked AS (
      SELECT lang, source, n_docs, base, rem,
             {_ALLOC_TOTAL} - SUM(base) OVER () AS leftover,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang NULLS FIRST, source NULLS FIRST) AS rk
      FROM scaled
    )
    SELECT lang, source, n_docs,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM ranked
    """,
)
def q_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional allocation of a {_ALLOC_TOTAL}-doc sample
    budget across (lang, source) strata — Hamilton's largest-remainder
    method, all-integer: floor quotas, then +1 to the strata with the
    largest integer remainders until the budget is spent (ties broken
    lexicographically). Σalloc == budget EXACTLY, which the float
    'n_i/N × T then round' recipe cannot guarantee. The windows all run
    over the already-aggregated strata table (|strata| rows), so the
    raw scan is one partial-agg shuffle."""
    d = catalog.load(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count("*").alias("n_docs"))
    everything = Window.partitionBy()
    n_total = F.sum("n_docs").over(everything)
    scaled = counts.select(
        "lang",
        "source",
        "n_docs",
        F.expr(f"({_ALLOC_TOTAL} * n_docs)").alias("_scaled"),
        n_total.alias("n_total"),
    ).select(
        "lang",
        "source",
        "n_docs",
        F.expr("_scaled div n_total").alias("base"),
        (F.col("_scaled") % F.col("n_total")).alias("rem"),
    )
    ranked = scaled.select(
        "lang",
        "source",
        "n_docs",
        "base",
        "rem",
        (F.lit(_ALLOC_TOTAL) - F.sum("base").over(everything)).alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc_nulls_first("lang"), F.asc_nulls_first("source")))
        .alias("rk"),
    )
    return ranked.select(
        "lang",
        "source",
        "n_docs",
        (
            F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).cast("bigint").alias("alloc"),
    )


# log10(1 + 1/d) for d = 1..9, shared literals (libm-free on both sides).
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

# CAST('…' AS DOUBLE) forces correctly-rounded string→double parsing —
# DuckDB reads a bare 17-digit literal as DECIMAL and loses the last ulp.
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN CAST('{v!r}' AS DOUBLE)" for d, v in _BENFORD.items()
) + " END"


@query(
    "q_benford",
    oracle=f"""
    WITH d AS (
      SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
               AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs,
             SUM(COUNT(*)) OVER () AS n_total
      FROM d GROUP BY digit
    )
    SELECT digit, n_obs,
           CAST(n_obs AS DOUBLE) / n_total AS obs_frac,
           {_BENFORD_CASE} AS exp_frac,
           CAST(n_obs AS DOUBLE) / n_total - {_BENFORD_CASE} AS deviation
    FROM c
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order totals — the
    forensic screen for fabricated money columns. Digit extraction is
    floor→bigint→string (integer-exact on both engines); the nine
    expected log10(1+1/d) frequencies are shared LITERALS, so no libm
    call ever runs and the deviation doubles agree bitwise before the
    defensive round. One partial-agg shuffle; the margin window runs on
    ≤9 rows."""
    o = catalog.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n_obs"))
    n_total = F.sum("n_obs").over(Window.partitionBy())
    exp = F.col("digit").cast("int")
    exp_frac = None
    for dig, v in _BENFORD.items():
        exp_frac = (
            F.when(exp == dig, F.lit(v))
            if exp_frac is None
            else exp_frac.when(exp == dig, F.lit(v))
        )
    obs_frac = F.col("n_obs").cast("double") / n_total
    return c.select(
        "digit",
        "n_obs",
        obs_frac.alias("obs_frac"),
        exp_frac.alias("exp_frac"),
        (obs_frac - exp_frac).alias("deviation"),
    )


@query(
    "q_quota_sample",
    oracle=f"""
    WITH counts AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang, source
    ),
    scaled AS (
      SELECT lang, source, n_docs,
             SUM(n_docs) OVER () AS n_total,
             ({_ALLOC_TOTAL} * n_docs) // SUM(n_docs) OVER () AS base,
             ({_ALLOC_TOTAL} * n_docs) % SUM(n_docs) OVER () AS rem
      FROM counts
    ),
    alloc AS (
      SELECT lang, source,
             base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang NULLS FIRST,
                                                 source NULLS FIRST)
                              <= {_ALLOC_TOTAL} - SUM(base) OVER () THEN 1 ELSE 0 END
                 AS quota
      FROM scaled
    ),
    ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rk
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.source, CAST(r.rk AS BIGINT) AS rk
    FROM ranked r JOIN alloc a
      ON r.lang IS NOT DISTINCT FROM a.lang
     AND r.source IS NOT DISTINCT FROM a.source
    WHERE r.rk <= a.quota
    """,
)
def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end proportional corpus sampling: Hamilton quotas per
    (lang, source) stratum (q_largest_remainder's algebra) drive a
    deterministic hash-ordered take of exactly that many docs from each
    stratum — Σ|sample| == budget EXACTLY whenever the population covers
    the budget (a stratum smaller than its quota yields all its docs),
    reproducible on any cluster (md5 order is data-derived, not
    partition-derived). The quota table
    is strata-sized and broadcast; the per-stratum rank is one window
    on the (lang, source) key. Null-safe stratum join (strata keys can
    be NULL — the edge-corpus lesson from q_largest_remainder)."""
    d = catalog.load(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count("*").alias("n_docs"))
    everything = Window.partitionBy()
    n_total = F.sum("n_docs").over(everything)
    scaled = counts.select(
        "lang",
        "source",
        "n_docs",
        (F.lit(_ALLOC_TOTAL) * F.col("n_docs")).alias("_scaled"),
        n_total.alias("n_total"),
    ).select(
        "lang",
        "source",
        "n_docs",
        F.expr("_scaled div n_total").alias("base"),
        (F.col("_scaled") % F.col("n_total")).alias("rem"),
    )
    alloc = scaled.select(
        "lang",
        "source",
        (
            F.col("base")
            + F.when(
                F.row_number().over(
                    Window.orderBy(
                        F.desc("rem"),
                        F.asc_nulls_first("lang"),
                        F.asc_nulls_first("source"),
                    )
                )
                <= F.lit(_ALLOC_TOTAL) - F.sum("base").over(everything),
                1,
            ).otherwise(0)
        ).alias("quota"),
    )
    ranked = d.select(
        "doc_id",
        "lang",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("lang", "source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rk"),
    )
    return (
        ranked.join(
            F.broadcast(alloc),
            [
                ranked["lang"].eqNullSafe(alloc["lang"]),
                ranked["source"].eqNullSafe(alloc["source"]),
            ],
        )
        .filter(F.col("rk") <= F.col("quota"))
        .select(
            "doc_id",
            ranked["lang"].alias("lang"),
            ranked["source"].alias("source"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


_K_ANON = 5


@query(
    "q_k_anonymity",
    oracle=f"""
    WITH quasi AS (
      SELECT lang, source,
             CAST(n_chars // 1000 AS BIGINT) AS size_band,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents
      WHERE n_chars IS NOT NULL
      GROUP BY lang, source, n_chars // 1000
    )
    SELECT lang, source, size_band, group_size,
           group_size < {_K_ANON} AS violates_k
    FROM quasi
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple
    (lang, source, size band): any equivalence class smaller than k=5
    is a re-identification risk — the privacy screen a training-data
    release pipeline runs before publishing metadata. One partial-agg
    shuffle on the quasi-id key; the flag is an integer comparison.
    Emits every class with its size so downstream can suppress or
    generalize the violating ones (the two standard remediations)."""
    d = catalog.load(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    quasi = d.groupBy(
        "lang",
        "source",
        F.expr("n_chars div 1000").alias("size_band"),
    ).agg(F.count("*").alias("group_size"))
    return quasi.select(
        "lang",
        "source",
        F.col("size_band").cast("bigint").alias("size_band"),
        "group_size",
        (F.col("group_size") < _K_ANON).alias("violates_k"),
    )


@query(
    "q_profile_summary",
    oracle="""
    WITH s AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(o_orderkey)  AS nn_key,  COUNT(DISTINCT o_orderkey)  AS nd_key,
               COUNT(o_custkey)   AS nn_cust, COUNT(DISTINCT o_custkey)   AS nd_cust,
               COUNT(o_totalprice) AS nn_price,
               COUNT(DISTINCT o_totalprice)   AS nd_price,
               COUNT(o_orderdate) AS nn_date, COUNT(DISTINCT o_orderdate) AS nd_date,
               COUNT(o_orderstatus) AS nn_st, COUNT(DISTINCT o_orderstatus) AS nd_st,
               COUNT(o_orderpriority) AS nn_pri,
               COUNT(DISTINCT o_orderpriority) AS nd_pri,
               CAST(MIN(o_orderkey) AS VARCHAR) AS lo_key,
               CAST(MAX(o_orderkey) AS VARCHAR) AS hi_key,
               CAST(MIN(o_custkey) AS VARCHAR)  AS lo_cust,
               CAST(MAX(o_custkey) AS VARCHAR)  AS hi_cust,
               CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR) AS lo_price,
               CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR) AS hi_price,
               CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS lo_date,
               CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS hi_date,
               MIN(o_orderstatus) AS lo_st,  MAX(o_orderstatus) AS hi_st,
               MIN(o_orderpriority) AS lo_pri, MAX(o_orderpriority) AS hi_pri
        FROM orders
    )
    SELECT 'o_orderkey' AS column_name, n_rows,
           CAST(n_rows - nn_key AS BIGINT) AS n_null,
           CAST(nd_key AS BIGINT) AS n_distinct, lo_key AS min_repr, hi_key AS max_repr
    FROM s
    UNION ALL SELECT 'o_custkey', n_rows, CAST(n_rows - nn_cust AS BIGINT),
           CAST(nd_cust AS BIGINT), lo_cust, hi_cust FROM s
    UNION ALL SELECT 'o_totalprice_cents', n_rows, CAST(n_rows - nn_price AS BIGINT),
           CAST(nd_price AS BIGINT), lo_price, hi_price FROM s
    UNION ALL SELECT 'o_orderdate', n_rows, CAST(n_rows - nn_date AS BIGINT),
           CAST(nd_date AS BIGINT), lo_date, hi_date FROM s
    UNION ALL SELECT 'o_orderstatus', n_rows, CAST(n_rows - nn_st AS BIGINT),
           CAST(nd_st AS BIGINT), lo_st, hi_st FROM s
    UNION ALL SELECT 'o_orderpriority', n_rows, CAST(n_rows - nn_pri AS BIGINT),
           CAST(nd_pri AS BIGINT), lo_pri, hi_pri FROM s
    """,
)
def q_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile (the ``SUMMARIZE`` / expectations-
    bootstrap operator): per column — row count, null count, EXACT
    distinct count, and exact-safe min/max reprs, all in ONE scan.
    Min/max reprs are canonicalized per type so the hash can't trip on
    engine formatting: ints/strings as-is, money as integer cents,
    timestamps truncated to their date. The multi-COUNT(DISTINCT) is
    Spark's Expand (one scan fans each row into 6 tagged copies, then
    one partial-agg shuffle); at 100 TB swap in approx_count_distinct
    per the documented profiling contract — the shape is otherwise
    identical. The 1-row aggregate pivots to the 6-row report via a
    driver-free explode of literal structs."""
    o = catalog.load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    s = o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.count("o_orderdate").alias("nn_date"),
        F.countDistinct("o_orderdate").alias("nd_date"),
        F.count("o_orderstatus").alias("nn_st"),
        F.countDistinct("o_orderstatus").alias("nd_st"),
        F.count("o_orderpriority").alias("nn_pri"),
        F.countDistinct("o_orderpriority").alias("nd_pri"),
        F.min("o_orderkey").cast("string").alias("lo_key"),
        F.max("o_orderkey").cast("string").alias("hi_key"),
        F.min("o_custkey").cast("string").alias("lo_cust"),
        F.max("o_custkey").cast("string").alias("hi_cust"),
        F.min(cents).cast("string").alias("lo_price"),
        F.max(cents).cast("string").alias("hi_price"),
        F.min("o_orderdate").cast("date").cast("string").alias("lo_date"),
        F.max("o_orderdate").cast("date").cast("string").alias("hi_date"),
        F.min("o_orderstatus").alias("lo_st"),
        F.max("o_orderstatus").alias("hi_st"),
        F.min("o_orderpriority").alias("lo_pri"),
        F.max("o_orderpriority").alias("hi_pri"),
    )

    def row(name: str, nn: str, nd: str, lo: str, hi: str):
        return F.struct(
            F.lit(name).alias("column_name"),
            (F.col("n_rows") - F.col(nn)).cast("bigint").alias("n_null"),
            F.col(nd).cast("bigint").alias("n_distinct"),
            F.col(lo).alias("min_repr"),
            F.col(hi).alias("max_repr"),
        )

    rows = F.array(
        row("o_orderkey", "nn_key", "nd_key", "lo_key", "hi_key"),
        row("o_custkey", "nn_cust", "nd_cust", "lo_cust", "hi_cust"),
        row("o_totalprice_cents", "nn_price", "nd_price", "lo_price", "hi_price"),
        row("o_orderdate", "nn_date", "nd_date", "lo_date", "hi_date"),
        row("o_orderstatus", "nn_st", "nd_st", "lo_st", "hi_st"),
        row("o_orderpriority", "nn_pri", "nd_pri", "lo_pri", "hi_pri"),
    )
    return s.select("n_rows", F.explode(rows).alias("p")).select(
        F.col("p.column_name").alias("column_name"),
        "n_rows",
        F.col("p.n_null").alias("n_null"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_repr").alias("min_repr"),
        F.col("p.max_repr").alias("max_repr"),
    )


@query(
    "q_gini_skew",
    oracle="""
    WITH u AS (
        SELECT user_id, COUNT(*) AS x
        FROM events WHERE user_id IS NOT NULL
        GROUP BY user_id
    ),
    r AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) AS i FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(x) AS BIGINT) AS total_events,
           CAST(MAX(x) AS BIGINT) AS max_events,
           CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(x) AS DOUBLE) AS gini
    FROM r
    """,
)
def q_gini_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew audit as ONE number: the Gini coefficient of the
    per-user event-count distribution — 0 = perfectly uniform keys,
    →1 = one celebrity key owns the table. This is the measurement a
    100 TB operator runs BEFORE choosing salting / AQE skew-join
    mitigations (the q_salted_* keys); the rank-sum identity
    G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) makes it exact: ranks come from
    the scalable global rank (operators/ranking.py — no single-task
    window), every accumulation is BIGINT, one final IEEE division."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    e = catalog.load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = e.groupBy("user_id").agg(F.count("*").alias("x"))
    r = ranking.global_rank(u, [F.col("x").asc(), F.col("user_id").asc()], rank_col="i")
    return r.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("total_events"),
        F.max("x").cast("bigint").alias("max_events"),
        (
            (2 * F.sum(F.col("i") * F.col("x")) - (F.count("*") + 1) * F.sum("x"))
            .cast("double")
            / (F.count("*") * F.sum("x")).cast("double")
        ).alias("gini"),
    )


@query(
    "q_table_checksum",
    oracle="""
    WITH canon AS (
        SELECT CAST(('0x' || substr(md5(
                 COALESCE(CAST(o_orderkey AS VARCHAR), '<null>') || '|' ||
                 COALESCE(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                          '<null>') || '|' ||
                 COALESCE(o_orderstatus, '<null>') || '|' ||
                 COALESCE(o_orderpriority, '<null>') || '|' ||
                 COALESCE(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '<null>')
               ), 1, 8)) AS BIGINT) AS h
        FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h) AS BIGINT) AS checksum_sum,
           CAST(bit_xor(h) AS BIGINT) AS checksum_xor
    FROM canon
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive whole-table checksum — the migration/replica
    validation primitive (what you run on BOTH sides after a 100 TB
    copy): each row canonicalizes to an explicit string form (integer
    cents for money, fixed strftime for timestamps, '<null>' sentinel —
    never engine-default formatting), hashes to the first 8 md5 hex
    chars as a 32-bit int, and aggregates by SUM and XOR. Both folds
    are commutative ⇒ identical on any partitioning; XOR can't
    overflow, and the SUM stays in int64 up to ~2×10⁹ rows per
    partition-free total (shard checksums merge by adding). One scan,
    one 1-row partial aggregate — nothing moves but 16 bytes."""
    o = catalog.load(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.coalesce(F.col("o_orderkey").cast("string"), F.lit("<null>")),
        F.coalesce(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            F.lit("<null>"),
        ),
        F.coalesce(F.col("o_orderstatus"), F.lit("<null>")),
        F.coalesce(F.col("o_orderpriority"), F.lit("<null>")),
        F.coalesce(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"), F.lit("<null>")
        ),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")
    return o.select(h.alias("h")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("h").cast("bigint").alias("checksum_sum"),
        F.expr("bit_xor(h)").cast("bigint").alias("checksum_xor"),
    )


@query(
    "q_price_consistency",
    oracle="""
    WITH u AS (
        SELECT l_partkey,
               (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 1000000)
                 // CAST(FLOOR(l_quantity) AS BIGINT) AS unit_microcents
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
          AND l_extendedprice >= 0 AND l_quantity >= 1
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT unit_microcents) AS BIGINT) AS n_prices,
           CAST(MIN(unit_microcents) AS BIGINT) AS min_unit,
           CAST(MAX(unit_microcents) AS BIGINT) AS max_unit,
           CAST(MAX(unit_microcents) - MIN(unit_microcents) AS BIGINT) AS spread
    FROM u GROUP BY l_partkey
    HAVING COUNT(DISTINCT unit_microcents) > 1
    """,
)
def q_price_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-consistency audit: parts sold at more than one unit
    price, with the spread — the master-data / margin-leak screen.
    Unit price is the RATIONAL cents/qty, made aggregatable by floor-
    scaling to integer micro-cents ((cents·10⁶) div qty — integer
    division floors identically on both engines for positive
    operands), so min/max/distinct are exact and no per-row double
    division exists to drift. One partial-agg shuffle on partkey."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
        & F.col("l_quantity").isNotNull()
        # >= 0: DuckDB's // floors while Spark's div truncates toward
        # zero; restricting to non-negative operands is what makes the
        # documented 'floors identically on both engines' claim true
        # (ADVICE r04 — a refund-style negative price would diverge).
        & (F.col("l_extendedprice") >= 0)
        & (F.col("l_quantity") >= 1)
    )
    unit = F.expr(
        "(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 1000000L)"
        " div CAST(FLOOR(l_quantity) AS BIGINT)"
    )
    u = li.select("l_partkey", unit.alias("unit_microcents"))
    return (
        u.groupBy("l_partkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.countDistinct("unit_microcents").cast("bigint").alias("n_prices"),
            F.min("unit_microcents").cast("bigint").alias("min_unit"),
            F.max("unit_microcents").cast("bigint").alias("max_unit"),
            (F.max("unit_microcents") - F.min("unit_microcents"))
            .cast("bigint")
            .alias("spread"),
        )
        .filter(F.col("n_prices") > 1)
    )


@query(
    "q_basket_size_dist",
    oracle="""
    WITH b AS (
        SELECT l_orderkey, COUNT(*) AS n_lines,
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS n_units
        FROM lineitem WHERE l_quantity IS NOT NULL
        GROUP BY l_orderkey
    )
    SELECT CAST(n_lines AS BIGINT) AS basket_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_units) AS BIGINT) AS total_units,
           CAST(MIN(n_units) AS BIGINT) AS min_units,
           CAST(MAX(n_units) AS BIGINT) AS max_units
    FROM b GROUP BY n_lines
    """,
)
def q_basket_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: how many orders carry 1, 2, … line
    items, with unit totals per size class — the first chart of every
    merchandising review and the denominator behind attach-rate
    metrics. Two-level integer aggregate (order rollup → size-class
    rollup); nothing but counts crosses either shuffle."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(F.col("l_quantity").isNotNull())
    b = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.floor("l_quantity").cast("bigint")).cast("bigint").alias("n_units"),
    )
    return b.groupBy(F.col("n_lines").cast("bigint").alias("basket_lines")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("n_units").cast("bigint").alias("total_units"),
        F.min("n_units").cast("bigint").alias("min_units"),
        F.max("n_units").cast("bigint").alias("max_units"),
    )


@query(
    "q_returns_analysis",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returned,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                         THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS returned_cents,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS return_rate
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_returnflag IS NOT NULL AND l.l_extendedprice IS NOT NULL
    GROUP BY p.p_brand
    """,
)
def q_returns_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate report per brand — the merchandising quality screen:
    line counts, returned lines ('R' flag), returned revenue in exact
    cents, and the rate as one division per brand. The part dimension
    broadcasts; one partial-agg shuffle on brand carries four longs."""
    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    p = catalog.load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return j.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(ret).cast("bigint").alias("n_returned"),
        F.sum(
            F.when(
                F.col("l_returnflag") == "R",
                F.round(F.col("l_extendedprice") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("returned_cents"),
        (F.sum(ret).cast("double") / F.count("*").cast("double")).alias(
            "return_rate"
        ),
    )


@query(
    "q_revenue_hhi",
    oracle="""
    WITH c AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // 100
                   AS rev
        FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0
          AND o_custkey IS NOT NULL
        GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev) AS BIGINT) AS total_usd,
           CAST(SUM(rev * rev) AS DOUBLE)
                 / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
               AS hhi,
           1.0 / (CAST(SUM(rev * rev) AS DOUBLE)
                 / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)))
               AS effective_customers
    FROM c
    """,
)
def q_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration: the Herfindahl-Hirschman index
    Σshare² computed as Σrev²/(Σrev)² — integer cross-products, one
    division — plus its reciprocal, the 'effective number of
    customers' (1/HHI): the single number that says whether the book
    is diversified or three whales. The revenue twin of
    q_diversity_index's count-based impurity; same algebraic-aggregate
    shape, two partial-agg exchanges. Shares are scale-invariant, so
    revenue is floored to whole DOLLARS before squaring (cents² per
    customer already overflowed int64 at sf0.01 — the ANSI overflow
    error caught it immediately); beyond ~10⁹ dollars per customer,
    lift the squares to DECIMAL(38,0), plan unchanged."""
    o = catalog.load(spark, sf_dir, "orders").filter(
        # >= 0 guard: the div-vs-// floor/truncate divergence on
        # negative aggregates (ADVICE r04); HHI shares are defined on
        # non-negative revenue anyway.
        F.col("o_totalprice").isNotNull()
        & (F.col("o_totalprice") >= 0)
        & F.col("o_custkey").isNotNull()
    )
    c = o.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) div 100"
        ).alias("rev")
    )
    hhi = F.sum(F.col("rev") * F.col("rev")).cast("double") / (
        F.sum("rev").cast("double") * F.sum("rev").cast("double")
    )
    return c.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("rev").cast("bigint").alias("total_usd"),
        hhi.alias("hhi"),
        (F.lit(1.0) / hhi).alias("effective_customers"),
    )
