"""Hypothesis property tests for the round-4 operators whose semantics
hinge on ties and boundaries: the skyline sweep vs brute-force
dominance, the geo grid decomposition vs brute-force distance, and
global row numbering's invariance to partition-boundary placement."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.operators import geo


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


def _skyline_spark(spark, rows):
    """The q_skyline sweep applied to (id, size, price) rows."""
    p = spark.createDataFrame(rows, "pid long, size long, price long")
    lvl = p.groupBy("price").agg(F.max("size").alias("lvl_max"))
    w = Window.orderBy("price")
    lvl2 = lvl.select(
        "price",
        F.max("lvl_max").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("m1"),
        F.max("lvl_max").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("m2"),
    )
    joined = p.join(lvl2, "price")
    survives = (
        (F.col("m1").isNull() | (F.col("m1") < F.col("size")))
        & (F.col("m2") <= F.col("size"))
    )
    return {r.pid for r in joined.filter(survives).collect()}


def _skyline_brute(rows):
    out = set()
    for pid, size, price in rows:
        dominated = any(
            (qp <= price and qs >= size and (qp < price or qs > size))
            for _, qs, qp in rows
        )
        if not dominated:
            out.add(pid)
    return out


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=20
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_skyline_sweep_equals_brute_dominance(spark_global, pts):
    # tiny integer domain -> dense duplicate/tie coverage
    rows = [(i, s, p) for i, (s, p) in enumerate(pts)]
    assert _skyline_spark(spark_global, rows) == _skyline_brute(rows)


@given(
    big=st.lists(
        st.tuples(st.integers(-30, 30), st.integers(-30, 30)), min_size=1, max_size=15
    ),
    small=st.lists(
        st.tuples(st.integers(-30, 30), st.integers(-30, 30)), min_size=1, max_size=8
    ),
    radius=st.integers(1, 25),
)
@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
def test_grid_radius_join_exact_on_random_points(spark_global, big, small, radius):
    brows = [(i, x, y) for i, (x, y) in enumerate(big)]
    srows = [(j, x, y) for j, (x, y) in enumerate(small)]
    b = spark_global.createDataFrame(brows, "b_id long, b_x long, b_y long")
    s = spark_global.createDataFrame(srows, "s_id long, s_x long, s_y long")
    got = {
        (r.b_id, r.s_id)
        for r in geo.grid_radius_join(
            b, s, ("b_x", "b_y"), ("s_x", "s_y"), radius
        ).collect()
    }
    want = {
        (bi, sj)
        for bi, bx, by in brows
        for sj, sx, sy in srows
        if (bx - sx) ** 2 + (by - sy) ** 2 <= radius * radius
    }
    assert got == want


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_global_rownum_invariant_to_partition_count(spark, n_parts):
    df = spark.createDataFrame([(k,) for k in range(97, 0, -1)], "k long")
    parts = (
        df.repartitionByRange(n_parts, "k")
        .sortWithinPartitions("k")
        .withColumn("_pid", F.spark_partition_id())
    )
    local = parts.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy("k"))
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
    out = {
        r.k: r.rn
        for r in local.join(F.broadcast(offsets), "_pid")
        .select("k", (F.col("_rn") + F.col("_offset")).alias("rn"))
        .collect()
    }
    assert out == {k: k for k in range(1, 98)}
