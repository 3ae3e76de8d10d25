"""Hypothesis property tests for the wave-2 exact-arithmetic operators:
largest-remainder allocation (budget conservation + quota bounds) and
winsorization (bound election + clip invariants) — pure-Python models of
the registered SQL/window logic, checked on adversarial random inputs,
plus one Spark run per property on a worst-case example."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

TOTAL = 1000


def _hamilton(counts: list[int]) -> list[int]:
    """Model of q_largest_remainder: floor quotas, +1 to the largest
    integer remainders (ties by index — the lexicographic stand-in)."""
    n = sum(counts)
    base = [(TOTAL * c) // n for c in counts]
    rem = [(TOTAL * c) % n for c in counts]
    leftover = TOTAL - sum(base)
    order = sorted(range(len(counts)), key=lambda i: (-rem[i], i))
    for i in order[:leftover]:
        base[i] += 1
    return base


@given(st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
def test_hamilton_conserves_budget_and_bounds_quotas(counts):
    alloc = _hamilton(counts)
    n = sum(counts)
    assert sum(alloc) == TOTAL  # exact conservation, always
    for c, a in zip(counts, alloc):
        exact = TOTAL * c / n
        # Hamilton never strays more than 1 from the exact quota
        assert exact - 1 < a < exact + 1 or abs(a - exact) < 1 + 1e-9


def test_hamilton_spark_matches_model_on_tie_heavy_strata(spark):
    """All-equal strata force maximal remainder ties — the case the
    NULLS FIRST ordering bug hid in. 7 equal strata of 3 docs: every
    remainder identical, leftover spread lexicographically."""
    counts = [3] * 7
    rows = [(f"l{i}", "s", c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "lang string, source string, n_docs long")
    everything = Window.partitionBy()
    n_total = F.sum("n_docs").over(everything)
    scaled = df.select(
        "lang",
        "source",
        "n_docs",
        (F.lit(TOTAL) * F.col("n_docs")).alias("_scaled"),
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
        "base",
        (F.lit(TOTAL) - F.sum("base").over(everything)).alias("leftover"),
        F.row_number()
        .over(
            Window.orderBy(
                F.desc("rem"), F.asc_nulls_first("lang"), F.asc_nulls_first("source")
            )
        )
        .alias("rk"),
    )
    got = {
        r.lang: r.base + (1 if r.rk <= r.leftover else 0) for r in ranked.collect()
    }
    want = dict(zip([f"l{i}" for i in range(7)], _hamilton(counts)))
    assert got == want
    assert sum(got.values()) == TOTAL


def _winsorize_model(xs: list[int]) -> list[int]:
    """Model of q_winsorize: nearest-rank ⌈p·n⌉ bounds, then clip."""
    s = sorted(xs)
    n = len(s)
    lo = s[(5 * n + 99) // 100 - 1]
    hi = s[(95 * n + 99) // 100 - 1]
    return [min(max(x, lo), hi) for x in xs]


@given(st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=120))
@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
def test_winsorize_model_invariants(xs):
    w = _winsorize_model(xs)
    s = sorted(xs)
    n = len(s)
    lo = s[(5 * n + 99) // 100 - 1]
    hi = s[(95 * n + 99) // 100 - 1]
    assert lo <= hi  # rank positions are ordered for every n ≥ 1
    assert all(lo <= v <= hi for v in w)  # clip honors its own bounds
    # order statistics preserved inside the bounds
    assert sorted(w)[n // 2] == min(max(s[n // 2], lo), hi)
    # small n: p5 == p95 == the only element class
    if n == 1:
        assert w == xs


@pytest.mark.parametrize("n", [1, 2, 19, 20, 21, 100])
def test_winsorize_spark_matches_model_at_rank_boundaries(spark, n):
    """n where ⌈0.05n⌉/⌈0.95n⌉ change value — the off-by-one hot spots
    of nearest-rank percentiles."""
    xs = [((i * 7919) % 997) - 498 for i in range(n)]  # deterministic spread
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)], "user_id long, event_id long, cents long"
    )
    by_user = Window.partitionBy("user_id")
    ranked = df.select(
        "user_id",
        "event_id",
        "cents",
        F.row_number().over(by_user.orderBy("cents", "event_id")).alias("rn"),
        F.count("*").over(by_user).alias("n"),
    )
    lo_k = F.expr("(5 * n + 99) div 100")
    hi_k = F.expr("(95 * n + 99) div 100")
    bounds = ranked.select(
        "event_id",
        "cents",
        F.sum(F.when(F.col("rn") == lo_k, F.col("cents"))).over(by_user).alias("lo"),
        F.sum(F.when(F.col("rn") == hi_k, F.col("cents"))).over(by_user).alias("hi"),
    )
    got = {
        r.event_id: min(max(r.cents, r.lo), r.hi) for r in bounds.collect()
    }
    want = dict(enumerate(_winsorize_model(xs)))
    assert got == want
