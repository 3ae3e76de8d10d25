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
    c = (
        catalog.load(spark, sf_dir, "customer")
        .filter(F.col("c_name").isNotNull())
        .select("c_custkey", "c_name")
    )
    parts = (
        c.repartitionByRange(8, "c_name", "c_custkey")
        .sortWithinPartitions("c_name", "c_custkey")
        .withColumn("_pid", F.spark_partition_id())
    )
    local = parts.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("_pid").orderBy("c_name", "c_custkey")),
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    ranked = local.join(F.broadcast(offsets), "_pid").select(
        "c_custkey", "c_name", (F.col("_rn") + F.col("_offset")).alias("rn")
    )
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
           ROUND(CAST(n_obs AS DOUBLE) / n_total, 6) AS obs_frac,
           {_BENFORD_CASE} AS exp_frac,
           ROUND(CAST(n_obs AS DOUBLE) / n_total - {_BENFORD_CASE}, 6) AS deviation
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
        F.round(obs_frac, 6).alias("obs_frac"),
        exp_frac.alias("exp_frac"),
        F.round(obs_frac - exp_frac, 6).alias("deviation"),
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
