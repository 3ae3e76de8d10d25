"""Property-based test of the wizard step-3 gate (SURVEY §5.2 #3,
App.js:388-394): accepted ⇔ fee>0 ∧ s,c≥0 ∧ s+c=100 — checked by
generating batches with hypothesis and evaluating the Spark expression
over them."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.operators import validate

num_str = st.one_of(
    st.integers(-200, 300).map(str),
    st.floats(-100, 200, allow_nan=False).map(lambda x: f"{x:.2f}"),
    st.just("abc"),
    st.none(),
)


def ref_gate(fee, s, c):
    """Reference semantics, straight from App.js:388-394."""

    def num(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return None

    f, sn, cn = num(fee), num(s), num(c)
    return (
        f is not None and f > 0
        and sn is not None and sn >= 0
        and cn is not None and cn >= 0
        and sn + cn == 100
    )


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(num_str, num_str, num_str), min_size=1, max_size=30))
def test_step_gates_matches_reference(spark_global, triples):
    df = spark_global.createDataFrame(triples, "fee string, s string, c string")
    got = [
        r["ok"]
        for r in df.select(
            validate.step_gates(F.col("fee"), F.col("s"), F.col("c")).alias("ok")
        ).collect()
    ]
    want = [ref_gate(*t) for t in triples]
    assert got == want


def test_reject_reason_first_failure_wins(spark):
    df = spark.createDataFrame(
        [("", "x"), ("a", None), ("a", "b")], "p string, q string"
    )
    out = validate.with_reject_reason(
        df,
        {"missing_p": validate.non_blank(F.col("p")), "missing_q": validate.non_blank(F.col("q"))},
    )
    got = {(r["p"], r["q"]): r["_reject_reason"] for r in out.collect()}
    assert got[("", "x")] == "missing_p"
    assert got[("a", None)] == "missing_q"
    assert got[("a", "b")] is None


# session-scoped alias usable inside hypothesis (function-scoped fixtures
# clash with @given)
import pytest


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
