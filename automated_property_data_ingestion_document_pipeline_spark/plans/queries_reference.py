"""Reference-data parity registrations (round-1 verdict item 5): the
dim-lookup (J1) and set-difference (A8) operators re-pointed at the
reference's REAL dimension tables (sources/reference_dims.py — 3
states, 107 UI counties incl. the App.js:123 'Bristill City, VA' typo,
the 7-county CRS code map from crs_bot.pyc).

The same Python literals feed the Spark DataFrames and the inline
``VALUES`` lists in the oracle SQL, so the driver hash checks actual
reference values. Scale shape: these dims are tiny forever → broadcast
joins, zero shuffle of any fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query
from automated_property_data_ingestion_document_pipeline_spark.sources import reference_dims as rd

# -- J1/J2 on real reference data ---------------------------------------------


@query(
    "q_ref_dim_join",
    oracle=f"""
    SELECT county_name, state_code, s.state_label, k.crs_code,
           (k.crs_code IS NOT NULL) AS backend_supported
    FROM {rd.counties_values_sql()}
    LEFT JOIN {rd.states_values_sql()} USING (state_code)
    LEFT JOIN {rd.crs_codes_values_sql()} USING (county_name)
    """,
)
def q_ref_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """County → state-label + CRS-code lookup on the real reference dims
    (App.js selector feeding the crs_bot map): two broadcast left joins;
    unsupported counties surface crs_code NULL — the reference's silent
    enrichment failure made explicit as a column."""
    c = rd.counties_df(spark)
    s = rd.states_df(spark)
    k = rd.crs_codes_df(spark)
    return (
        c.join(F.broadcast(s), "state_code", "left")
        .join(F.broadcast(k), "county_name", "left")
        .select(
            "county_name",
            "state_code",
            "state_label",
            "crs_code",
            F.col("crs_code").isNotNull().alias("backend_supported"),
        )
    )


# -- A8: UI-vs-backend data-quality diff --------------------------------------


@query(
    "q_ref_crs_diff",
    oracle=f"""
    SELECT county_name, state_code
    FROM {rd.counties_values_sql()}
    WHERE county_name NOT IN (SELECT county_name FROM {rd.crs_codes_values_sql()})
    """,
)
def q_ref_crs_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's A8 diff as data: counties the UI offers
    (App.js:16-130) that the legacy backend cannot enrich (absent from
    the crs_bot.pyc map) — 100 of 107 rows, including the
    'Bristill City, VA' typo row. Anti join against a broadcast dim."""
    c = rd.counties_df(spark)
    k = rd.crs_codes_df(spark)
    return c.join(F.broadcast(k), "county_name", "left_anti")


# -- aggregate on real reference data -----------------------------------------


@query(
    "q_ref_state_coverage",
    oracle=f"""
    SELECT state_code,
           CAST(COUNT(*) AS BIGINT) AS n_counties,
           CAST(COUNT(k.crs_code) AS BIGINT) AS n_supported
    FROM {rd.counties_values_sql()}
    LEFT JOIN {rd.crs_codes_values_sql()} USING (county_name)
    GROUP BY state_code
    """,
)
def q_ref_state_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state picker size vs backend coverage: TN 95/3, GA 6/2,
    VA 6/2 — the numbers a reference operator would quote for the
    enrichment gap."""
    c = rd.counties_df(spark)
    k = rd.crs_codes_df(spark)
    joined = c.join(F.broadcast(k), "county_name", "left")
    return joined.groupBy("state_code").agg(
        F.count("*").cast("bigint").alias("n_counties"),
        F.count("crs_code").cast("bigint").alias("n_supported"),
    )
