"""Scalar/projection query registrations (SURVEY §2.2 P1-P16, §2.1 S1).

Each key exercises one reference formatter/projection contract over the
corpus, with a value-identical DuckDB oracle. All Spark sides are pure
built-in expressions — a single codegen'd projection over the scan, the
cheapest possible shape at 100 TB (no shuffle, full pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.functions import formatters as fmt
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# -- S12: baseline parquet scan ------------------------------------------------


@query("q_scan_count", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + count — the S12 baseline; count comes from parquet
    row-group metadata, no data materialization."""
    return catalog.load(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


# -- S1/P11: JSON ingest -------------------------------------------------------


@query(
    "q_json_ingest",
    oracle="""
    SELECT event_id, event_type, TRY_CAST(CASE WHEN json_valid(props) AND json_type(json(props), '$.k') IN ('BIGINT', 'UBIGINT') THEN props->>'k' END AS INTEGER) AS k
    FROM events
    """,
)
def q_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON body ingest (app.py:26-28: ``request.json or
    {}`` + ``.get()``): ``from_json`` with explicit schema, permissive —
    missing/bad fields become null, never errors."""
    ev = catalog.load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select("event_id", "event_type", parsed["k"].alias("k"))


# -- P1: currency formatter ----------------------------------------------------

_CURRENCY_FEE = "CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice, 0) ELSE o_totalprice END"


@query(
    "q_currency_format",
    oracle=f"""
    WITH src AS (SELECT o_orderkey, {_CURRENCY_FEE} AS fee FROM orders)
    SELECT o_orderkey,
           CASE
             WHEN fee IS NULL THEN ''
             WHEN NOT isfinite(fee) OR abs(fee) >= 9223372036854775808.0 THEN ''
             WHEN fee = floor(fee) THEN '$' || printf('%,d', CAST(fee AS BIGINT))
             ELSE '$' || CASE WHEN fee < 0 THEN '-' ELSE '' END
                  || printf('%,d', CAST(trunc(abs(round(fee, 2))) AS BIGINT))
                  || '.' || lpad(CAST(CAST(round(abs(fee), 2) * 100 AS BIGINT) % 100 AS VARCHAR), 2, '0')
           END AS fee_fmt
    FROM src
    """,
)
def q_currency_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_format_currency`` (report_generator.py:23-31) over order totals;
    every 10th order rounded to a whole amount to exercise the integral
    ``$N,NNN`` branch. Negative fees format sign-then-abs on both engines
    (DuckDB's %-modulo and trunc lose the sign for -1 < fee < 0)."""
    o = catalog.load(spark, sf_dir, "orders")
    fee = F.when(F.col("o_orderkey") % 10 == 0, F.round("o_totalprice", 0)).otherwise(
        F.col("o_totalprice")
    )
    return o.select("o_orderkey", fmt.format_currency(fee).alias("fee_fmt"))


# -- P2: percent formatter (truncation!) ---------------------------------------


@query(
    "q_percent_format",
    oracle="""
    SELECT event_id,
           COALESCE(CAST(TRY_CAST(trunc(value) AS INTEGER) AS VARCHAR) || '%', '') AS pct_fmt
    FROM events
    """,
)
def q_percent_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_format_percent`` (report_generator.py:12-20): int(float(v)) —
    truncates toward zero (49.9 → "49%"), which is exactly Spark's
    double→int cast; DuckDB's rounding cast needs explicit trunc().
    The oracle mirrors the full Spark contract: NULL/unparseable/out-of-
    int32-range values coalesce to '' (try_cast → NULL → COALESCE), so a
    corpus change introducing NULLs or huge values can't flip the hash."""
    ev = catalog.load(spark, sf_dir, "events")
    return ev.select("event_id", fmt.format_percent(F.col("value")).alias("pct_fmt"))


# -- P3/P13: long-date formatter ----------------------------------------------


@query(
    "q_date_format",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%B %d, %Y') AS letter_date
    FROM orders
    """,
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_format_date`` happy path (report_generator.py:34-38): date →
    'Month DD, YYYY'. The wall-clock fallback branch is pinned by unit
    golden tests instead (nondeterministic here; SURVEY §7b)."""
    o = catalog.load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "MMMM dd, yyyy").alias("letter_date"),
    )


# -- P4: safe-name sanitizer ---------------------------------------------------


@query(
    "q_safe_name",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_mktsegment || ' ' || c_name, '[ /]', '_', 'g') AS safe_name
    FROM customer
    """,
)
def q_safe_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename sanitizer (report_generator.py:63): spaces and slashes →
    underscores; input synthesized with a guaranteed space."""
    c = catalog.load(spark, sf_dir, "customer")
    raw = F.concat(F.col("c_mktsegment"), F.lit(" "), F.col("c_name"))
    return c.select("c_custkey", fmt.safe_name(raw).alias("safe_name"))


# -- P5/P6: trim + NBSP normalize ---------------------------------------------


@query(
    "q_trim",
    oracle="""
    SELECT c_custkey,
           trim(replace(' ' || c_name || chr(160), chr(160), ' ')) AS cleaned
    FROM customer
    """,
)
def q_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scraped-text cleanup (crs_ui_bot.py:223): NBSP→space then strip;
    input decorated with leading space + trailing NBSP to prove both."""
    c = catalog.load(spark, sf_dir, "customer")
    dirty = F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))
    return c.select("c_custkey", fmt.clean_scraped_text(dirty).alias("cleaned"))


# -- P7/P14: filename construction --------------------------------------------


@query(
    "q_format_string",
    oracle="""
    SELECT c_custkey,
           'Engagement_Letter_' || regexp_replace(c_name, '[ /]', '_', 'g') || '.pdf' AS filename
    FROM customer
    """,
)
def q_format_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic artifact naming (report_generator.py:64-65)."""
    c = catalog.load(spark, sf_dir, "customer")
    return c.select("c_custkey", fmt.letter_filename(F.col("c_name")).alias("filename"))


# -- P8: digits-only clamp -----------------------------------------------------


@query(
    "q_digits_only",
    oracle="""
    SELECT o_orderkey, regexp_replace(o_orderpriority, '[^0-9.]', '', 'g') AS digits
    FROM orders
    """,
)
def q_digits_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``clampPercentString`` (App.js:226-229) over priority strings like
    '1-URGENT' → '1'."""
    o = catalog.load(spark, sf_dir, "orders")
    return o.select("o_orderkey", fmt.digits_only(F.col("o_orderpriority")).alias("digits"))


# -- P9: safe numeric cast -----------------------------------------------------


@query(
    "q_try_cast",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(regexp_replace(o_orderpriority, '[^0-9.]', '', 'g') AS DOUBLE) AS pr_num,
           TRY_CAST(o_orderstatus AS DOUBLE) AS bad_num
    FROM orders
    """,
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``toNumberSafe`` (App.js:231-234): parse-or-null, both a parsing
    success column and a guaranteed-failure column."""
    o = catalog.load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        fmt.to_number_safe(fmt.digits_only(F.col("o_orderpriority"))).alias("pr_num"),
        fmt.to_number_safe(F.col("o_orderstatus")).alias("bad_num"),
    )


# -- P10: split-and-extract-last ----------------------------------------------


@query(
    "q_split_extract",
    oracle="""
    SELECT c_custkey,
           trim((string_split(c_name || ': ' || c_mktsegment, ':'))[-1]) AS extracted
    FROM customer
    """,
)
def q_split_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy parcel extract (crs_bot.pyc ~75-95): split on ':', take
    last, strip."""
    c = catalog.load(spark, sf_dir, "customer")
    packed = F.concat(F.col("c_name"), F.lit(": "), F.col("c_mktsegment"))
    return c.select("c_custkey", fmt.split_extract_last(packed).alias("extracted"))


# -- P15: arithmetic projection -----------------------------------------------


@query(
    "q_arith",
    oracle="SELECT event_id, value / 4 * 100 AS progress FROM events",
)
def q_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progress ratio (App.js:521): row-local IEEE arithmetic — emitted
    raw (bit-identical across engines, no rounding needed)."""
    ev = catalog.load(spark, sf_dir, "events")
    return ev.select("event_id", (F.col("value") / 4 * 100).alias("progress"))


@query(
    "q_variant_json",
    oracle="""
    SELECT event_id,
           COALESCE(json_valid(props), FALSE) AS is_json,
           CASE WHEN json_valid(props) THEN
             CASE json_type(json(props))
               WHEN 'VARCHAR' THEN 'STRING'
               WHEN 'DOUBLE' THEN 'DOUBLE'
               WHEN 'UBIGINT' THEN 'BIGINT'
               ELSE json_type(json(props)) END
           END AS top_type,
           CASE WHEN json_valid(props)
                 AND json_type(json(props), '$.k') IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(props->>'k' AS BIGINT) END AS k
    FROM events
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type
    (try_parse_json → variant_get): the open-schema lane beside the
    pinned-schema from_json path (q_json_ingest). VARIANT keeps the
    parsed tree in a binary form queryable without re-parsing —
    at 100 TB that is the difference between parsing once at ingest
    and parsing per expression. Type lanes are mapped to the oracle's
    json_type vocabulary (STRING↔VARCHAR, DECIMAL→DOUBLE: Spark parses
    JSON decimals as exact DECIMAL, DuckDB types them DOUBLE), and the
    integer extraction is gated on the variant's ACTUAL type so a
    payload of 1.5 or \"12\" stays NULL on both engines instead of
    engine-specific coercion."""
    ev = catalog.load(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    sch = F.schema_of_variant(v)
    top = (
        F.when(F.startswith(sch, F.lit("OBJECT")), F.lit("OBJECT"))
        .when(F.startswith(sch, F.lit("ARRAY")), F.lit("ARRAY"))
        .when(F.startswith(sch, F.lit("DECIMAL")), F.lit("DOUBLE"))
        .when(sch == "STRING", F.lit("STRING"))
        # JSON null: DuckDB json_type returns SQL NULL, not 'NULL'
        .when(sch == "VOID", F.lit(None).cast("string"))
        .otherwise(sch)
    )
    k_var = F.try_variant_get(v, "$.k", "variant")
    k = F.when(
        F.schema_of_variant(k_var) == "BIGINT",
        F.try_variant_get(v, "$.k", "bigint"),
    )
    return ev.select(
        "event_id",
        v.isNotNull().alias("is_json"),
        F.when(v.isNotNull(), top).alias("top_type"),
        k.alias("k"),
    )
