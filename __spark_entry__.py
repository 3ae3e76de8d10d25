"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline at sf0.001; ``queries()`` /
``oracle_sql()`` expose every registered operator key from SURVEY.md §2
(registry populated by importing the plans package).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automated_property_data_ingestion_document_pipeline_spark import catalog, tune
from automated_property_data_ingestion_document_pipeline_spark.functions import formatters as fmt
from automated_property_data_ingestion_document_pipeline_spark.plans import ORACLES, QUERIES

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 stage 0): validated engagement-fee
    rollup — orders ⋈ customer ⋈ nation ⋈ region star join with the
    reference's validation gate and formatters applied to the output.
    Dims broadcast; one shuffle on the rollup keys; money summed in
    exact decimal.
    """
    from pyspark.sql import functions as F

    tune(spark)
    t = catalog.load_all(spark, FLAGSHIP_SF_DIR)
    enriched = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("o_totalprice") > 0)  # step-3 fee gate (App.js:389)
    )
    rollup = enriched.groupBy("r_name", "n_name").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).cast("double").alias("total_fees"),
        F.max("o_orderdate").alias("latest_order"),
    )
    return rollup.select(
        "r_name",
        "n_name",
        "n_orders",
        "total_fees",
        fmt.format_currency(F.col("total_fees")).alias("total_fees_fmt"),
        F.date_format("latest_order", "MMMM dd, yyyy").alias("latest_order_fmt"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator key (SURVEY.md §2)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key; keys absent here are rows-only by
    design (streaming state, LSH approximations, executor-side sinks)."""
    return dict(ORACLES)
