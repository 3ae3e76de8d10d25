"""Hot-key stress for window/session operators (r02 verdict #6).

The adversarial corpus (scripts/make_skew_corpus.py) gives one user
~10 % of all events — the reference's singleton Chrome session
(crs_ui_bot.py:34-70) is exactly this one-hot-key workload. Windows
can't be salted (they need the full ordered per-key sequence), so the
engine ships skew-robust REFORMULATIONS and these tests pin their
bit-identity to the single-pass forms on both the uniform and the
hot-key corpus:

- ``last_write_wins_agg``: ranking window → ``max_by`` aggregate
  (map-side combine collapses the hot key to one candidate per map
  task before the shuffle).
- ``session_summary_two_phase``: segment-then-merge (phase 1 on
  (key, time-chunk) spreads the hot key across tasks; phase 2 merges
  boundary-split sessions over local-session summaries).

Wall-clock at local sf0.1 is jitter (the hot partition is only 10 k
rows); the 100 TB argument is the plan shape, documented in
PERFORMANCE.md §15 with the measured numbers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import dedup
from automated_property_data_ingestion_document_pipeline_spark.operators.sessionize import (
    session_summary,
    session_summary_two_phase,
)


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory, sf_dir):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_skew_corpus import make

    out = tmp_path_factory.mktemp("sf_skew")
    make(str(out), sf_dir)
    return str(out)


def _hot_share(spark, d):
    ev = catalog.load(spark, d, "events")
    total = ev.count()
    hot = ev.filter(F.col("user_id") == 0).count()
    return hot / total


def test_skew_corpus_is_hot(spark, skew_dir, sf_dir):
    base = _hot_share(spark, sf_dir)
    hot = _hot_share(spark, skew_dir)
    assert hot >= 0.09
    assert hot >= 2 * base


@pytest.mark.parametrize("which", ["uniform", "hot"])
def test_lastwin_agg_bit_identical_to_window(spark, sf_dir, skew_dir, which):
    d = sf_dir if which == "uniform" else skew_dir
    ev = catalog.load(spark, d, "events")
    keys = ["user_id"]
    order = [F.col("ts"), F.col("event_id")]
    win = {tuple(r) for r in dedup.last_write_wins(ev, keys, order).collect()}
    agg = {tuple(r) for r in dedup.last_write_wins_agg(ev, keys, order).collect()}
    assert agg == win
    assert len(agg) == ev.select("user_id").distinct().count()


@pytest.mark.parametrize("which", ["uniform", "hot"])
def test_two_phase_sessions_bit_identical(spark, sf_dir, skew_dir, which):
    d = sf_dir if which == "uniform" else skew_dir
    ev = catalog.load(spark, d, "events")
    one = {tuple(r) for r in session_summary(ev, gap_minutes=30).collect()}
    two = {
        tuple(r)
        for r in session_summary_two_phase(ev, gap_minutes=30, chunk_hours=24).collect()
    }
    assert two == one


def test_two_phase_merges_boundary_split_sessions(spark):
    """A session straddling a chunk boundary with gap < threshold must
    be ONE session in both forms; events exactly gap apart across the
    boundary must split in both. chunk_hours=1 forces the boundaries."""
    rows = [
        # user 1: events at 00:50 and 01:05 (15-min gap across the
        # 01:00 chunk edge) → one session
        (1, 1, "2024-01-01 00:50:00"),
        (2, 1, "2024-01-01 01:05:00"),
        # user 2: events exactly 30 min apart across the edge → split
        (3, 2, "2024-01-01 00:45:00"),
        (4, 2, "2024-01-01 01:15:00"),
    ]
    ev = spark.createDataFrame(
        [(i, u, t) for i, u, t in rows], "event_id bigint, user_id bigint, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    one = {tuple(r) for r in session_summary(ev, gap_minutes=30).collect()}
    two = {
        tuple(r)
        for r in session_summary_two_phase(ev, gap_minutes=30, chunk_hours=1).collect()
    }
    assert two == one
    n_sessions = {u: 0 for u in (1, 2)}
    for (user_id, _sid, _n, _s, _e) in one:
        n_sessions[user_id] += 1
    assert n_sessions == {1: 1, 2: 2}


@pytest.mark.parametrize("which", ["uniform", "hot"])
def test_salted_join_bit_identical_to_plain(spark, sf_dir, skew_dir, which):
    """q_salted_join (fact salt + replicated profile side) must equal
    the plain join row-for-row on the uniform AND the hot-key corpus —
    each fact row matches its partner at exactly one salt."""
    from automated_property_data_ingestion_document_pipeline_spark.plans.registry import QUERIES

    d = sf_dir if which == "uniform" else skew_dir
    salted = {tuple(r) for r in QUERIES["q_salted_join"](spark, d).collect()}
    ev = catalog.load(spark, d, "events")
    prof = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.count("*").alias("n")
    )
    plain = {
        tuple(r)
        for r in ev.join(prof, "user_id")
        .select(
            "event_id",
            "user_id",
            F.col("n").cast("bigint"),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("first_ts").cast("timestamp"))
            ).cast("bigint"),
        )
        .collect()
    }
    assert salted == plain
