"""Spatial query registrations: grid-bucketed radius join, nearest
match, tile rollup (operators/geo.py).

The corpus carries no coordinate columns, so planar integer coordinates
are DERIVED deterministically from keys with pure integer arithmetic
(multiplicative scatter mod a 100 km grid) — identical expressions on
both engines, so the driver's DuckDB oracle reproduces the geometry
exactly and the radius predicate can be hash-compared with zero float
ambiguity (integer squared distances only).

The Spark side runs the bucketed decomposition (cell equi-join + exact
verify — the 100 TB plan); the oracle runs the brute-force cross join +
the same exact predicate (fine at sf0.01). Agreement proves the
decomposition has no false negatives/positives on real data, the same
methodology as the MinHash/FastSS families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import geo
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# 100 km x 100 km plane, meters; multiplicative scatter constants are
# classic Lehmer multipliers (public-domain PRNG lore) — any co-prime
# multipliers would do, determinism is all that matters.
_GRID = 100_000
_RADIUS = 8_000

_CUST_XY = """
    SELECT c_custkey, c_acctbal,
           (c_custkey * 48271) % 100000 AS cx,
           (c_custkey * 16807) % 100000 AS cy
    FROM customer
"""
_SUPP_XY = """
    SELECT s_suppkey,
           (s_suppkey * 69621) % 100000 AS sx,
           (s_suppkey * 40692) % 100000 AS sy
    FROM supplier
"""


def _customers_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog.load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_acctbal",
        ((F.col("c_custkey") * 48271) % _GRID).alias("cx"),
        ((F.col("c_custkey") * 16807) % _GRID).alias("cy"),
    )


def _suppliers_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = catalog.load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 69621) % _GRID).alias("sx"),
        ((F.col("s_suppkey") * 40692) % _GRID).alias("sy"),
    )


@query(
    "q_geo_radius_join",
    oracle=f"""
    WITH c AS ({_CUST_XY}), s AS ({_SUPP_XY})
    SELECT c.c_custkey, s.s_suppkey,
           (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
    FROM c, s
    WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {_RADIUS * _RADIUS}
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (customer, supplier) pair within 8 km on the derived plane
    — "parcels near a recorder office". Grid-bucketed: suppliers (small
    side) explode to their 3x3 cell neighborhood and broadcast; the
    customer side probes by single cell id; exact integer dist2 filters
    candidates. No cartesian anywhere in the plan (pinned by
    tests/test_plan_properties.py)."""
    cust = _customers_xy(spark, sf_dir)
    supp = _suppliers_xy(spark, sf_dir)
    return geo.grid_radius_join(
        cust, supp, ("cx", "cy"), ("sx", "sy"), _RADIUS
    ).select("c_custkey", "s_suppkey", "dist2")


@query(
    "q_geo_nearest",
    oracle=f"""
    WITH c AS ({_CUST_XY}), s AS ({_SUPP_XY}),
    cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
        FROM c, s
        WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {_RADIUS * _RADIUS}
    )
    SELECT c_custkey, s_suppkey, dist2
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_custkey ORDER BY dist2, s_suppkey
        ) AS rk
        FROM cand
    )
    WHERE rk = 1
    """,
)
def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer within 8 km (deterministic
    tie-break on s_suppkey); out-of-range customers drop. Window over
    the bucketed candidates — per-customer candidate count is bounded
    by supplier density, not supplier count."""
    cust = _customers_xy(spark, sf_dir)
    supp = _suppliers_xy(spark, sf_dir)
    return geo.nearest_within(
        cust, supp, "c_custkey", "s_suppkey", ("cx", "cy"), ("sx", "sy"), _RADIUS
    ).select("c_custkey", "s_suppkey", "dist2")


@query(
    "q_geo_tile_agg",
    oracle=f"""
    WITH c AS ({_CUST_XY})
    SELECT CAST(FLOOR(cx / 10000.0) AS BIGINT) AS tile_x,
           CAST(FLOOR(cy / 10000.0) AS BIGINT) AS tile_y,
           COUNT(*) AS n_points,
           ROUND(SUM(c_acctbal), 2) AS tile_balance
    FROM c
    GROUP BY 1, 2
    """,
)
def q_geo_tile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density heatmap: customers per 10 km tile with total balance —
    the spatial GROUP BY that backs every map visualization. One
    shuffle on (tile_x, tile_y); map-side partial aggregation carries
    the load at 100 TB."""
    cust = _customers_xy(spark, sf_dir)
    return geo.tile_aggregate(
        cust,
        "cx",
        "cy",
        10_000,
        [
            F.count("*").alias("n_points"),
            F.round(F.sum("c_acctbal"), 2).alias("tile_balance"),
        ],
    )


@query(
    "q_geo_pipeline",
    oracle=f"""
    WITH c AS ({_CUST_XY}), s AS ({_SUPP_XY}),
    cand AS (
        SELECT c.c_custkey, c.c_acctbal, c.cx, c.cy, s.s_suppkey,
               (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) AS dist2
        FROM c, s
        WHERE (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= {_RADIUS * _RADIUS}
    ), nearest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_custkey ORDER BY dist2, s_suppkey) AS rk
            FROM cand)
        WHERE rk = 1
    )
    SELECT CAST(FLOOR(cx / 10000.0) AS BIGINT) AS tile_x,
           CAST(FLOOR(cy / 10000.0) AS BIGINT) AS tile_y,
           COUNT(*) AS n_matched,
           COUNT(DISTINCT s_suppkey) AS n_offices,
           CAST(SUM(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS tile_balance,
           MIN(dist2) AS best_dist2
    FROM nearest
    WHERE c_acctbal > 0
    GROUP BY 1, 2
    """,
)
def q_geo_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite spatial dataflow — the round-4 families composed the
    way a property-analytics dashboard would: derive planar coordinates
    → match every positive-balance customer to its nearest recorder
    office within 8 km (grid-bucketed join + ranking window) → roll the
    matches up into 10 km heatmap tiles (match count, distinct offices,
    exact-decimal balance, best distance). Plan: one broadcast cell
    join + one window shuffle on c_custkey + one tile aggregation —
    three exchanges end to end; money summed through the decimal lane
    (plans/_sql.py policy)."""
    cust = _customers_xy(spark, sf_dir)
    supp = _suppliers_xy(spark, sf_dir)
    nearest = geo.nearest_within(
        cust, supp, "c_custkey", "s_suppkey", ("cx", "cy"), ("sx", "sy"), _RADIUS
    ).filter(F.col("c_acctbal") > 0)
    return (
        nearest.groupBy(
            F.floor(F.col("cx") / 10_000).alias("tile_x"),
            F.floor(F.col("cy") / 10_000).alias("tile_y"),
        )
        .agg(
            F.count("*").alias("n_matched"),
            F.countDistinct("s_suppkey").alias("n_offices"),
            F.sum(F.round("c_acctbal", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("tile_balance"),
            F.min("dist2").alias("best_dist2"),
        )
    )
