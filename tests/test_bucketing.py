"""Bucketed-table co-located join (SURVEY §2.4 scale posture): the
write-once shuffle that makes every later join on the key exchange-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import bucketing


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = catalog.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    bucketing.write_bucketed(orders, "t_orders_b", "o_orderkey", num_buckets=8)
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        num_buckets=8,
    )

    joined = bucketing.bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
    # co-located: no shuffle Exchange anywhere in the join plan
    assert bucketing.shuffle_exchanges_in_plan(joined) == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan

    # same join on raw (unbucketed) parquet shuffles both sides
    raw = (
        catalog.load(spark, sf_dir, "orders")
        .hint("merge")
        .join(
            catalog.load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    assert bucketing.shuffle_exchanges_in_plan(raw) >= 2

    # and the answers agree
    assert joined.count() == raw.count()


def test_bucketed_aggregation_reuses_bucketing(spark, sf_dir):
    """groupBy on the bucket key also skips the exchange — bucketing
    amortizes across every key-aligned operator, not just joins."""
    lineitem = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        num_buckets=8,
    )
    agg = (
        spark.table("t_lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert bucketing.shuffle_exchanges_in_plan(agg) == 0
    assert agg.count() > 0
