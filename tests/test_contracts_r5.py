"""Round-5 contract tests: the ENFORCED bounded-series cap on the
sorted-collect_list fold family (VERDICT r04 'What's wrong' #3 — the
contract was documented but nothing guarded a hot key from
materializing one giant aggregation buffer), and the integral-`div`
NTILE refactor (ADVICE r04: no float op in the integer operator
family)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.operators import folds


def _series_df(spark, n_hot: int, n_cold: int):
    rows = [("hot", i) for i in range(n_hot)] + [("cold", i) for i in range(n_cold)]
    df = spark.createDataFrame(rows, "user_id string, event_id long")
    return df.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("event_id"))).alias("evs")
    )


def test_series_cap_raises_with_actionable_message(spark):
    g = folds.enforce_series_cap(_series_df(spark, 12, 3), "evs", cap=5)
    with pytest.raises(Exception) as e:
        g.select(F.size("evs")).collect()
    msg = str(e.value)
    assert "MAX_SERIES_EVENTS" in msg or "bounded-series" in msg
    assert "streaming" in msg  # remediation is named, not just refused


def test_series_cap_passes_under_cap_and_preserves_values(spark):
    g = folds.enforce_series_cap(_series_df(spark, 4, 2), "evs", cap=5)
    got = {r.user_id: [e.event_id for e in r.evs] for r in g.collect()}
    assert got == {"hot": [0, 1, 2, 3], "cold": [0, 1]}


def test_default_cap_is_documented_scale(spark):
    # the production queries use the default; it must be large enough
    # that no test corpus trips it and finite so the contract is real
    assert folds.MAX_SERIES_EVENTS == 1_000_000
    g = folds.enforce_series_cap(_series_df(spark, 10, 1), "evs")
    assert g.count() == 2


def test_idiv_is_integral_beyond_double_precision(spark):
    # 2^53 + 1 is where double true-division starts rounding; the div
    # operator path must stay exact (ADVICE r04 ntile refactor).
    from automated_property_data_ingestion_document_pipeline_spark.operators.ranking import _idiv

    big = (1 << 53) + 1
    df = spark.createDataFrame([(big,)], "a long")
    (got,) = df.select(_idiv(F.col("a"), F.lit(1)).alias("d")).collect()
    assert got.d == big  # float path would yield 2^53
    (got2,) = df.select(_idiv(F.col("a"), F.lit(2)).alias("d")).collect()
    assert got2.d == big // 2


def test_agg_joinback_equals_window_including_null_keys(spark):
    """§52: the groupBy + eqNullSafe broadcast join-back that replaced
    the 5-key whole-partition window in q_target_encode/q_minmax_scale
    must reproduce the window semantics EXACTLY — including the NULL
    category, which PARTITION BY keeps as a real group and a bare inner
    equi-join silently drops (the edge-corpus catch this encodes)."""
    import random

    from pyspark.sql import Window

    rnd = random.Random(5)
    cats = ["a", "b", None]
    rows = [(i, cats[rnd.randrange(3)], rnd.randrange(-50, 500)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, cat string, x long")

    w = Window.partitionBy("cat")
    via_window = {
        (r.id): (r.s, r.n)
        for r in df.select(
            "id",
            F.sum("x").over(w).alias("s"),
            F.count("*").over(w).alias("n"),
        ).collect()
    }
    stats = (
        df.groupBy("cat")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .withColumnRenamed("cat", "_cat")
    )
    via_join = {
        (r.id): (r.s, r.n)
        for r in df.join(
            F.broadcast(stats), F.col("cat").eqNullSafe(F.col("_cat"))
        ).select("id", "s", "n").collect()
    }
    assert via_join == via_window
    # and the bare equi-join WOULD lose the NULL rows — the failure mode
    bare = df.join(F.broadcast(stats), F.col("cat") == F.col("_cat"))
    assert bare.count() == sum(1 for _, c, _x in rows if c is not None)
