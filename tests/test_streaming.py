"""Structured Streaming surface tests (SURVEY §2.7): the streaming
session aggregation agrees with the batch twin; duplicate discard and
tumbling windows behave under availableNow."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators.sessionize import (
    session_summary,
)
from automated_property_data_ingestion_document_pipeline_spark.streaming import sessions as ss

from conftest import SF_DIR


def test_stream_sessions_match_batch(spark, sf_dir):
    stream = ss.read_events_stream(spark, sf_dir)
    result = ss.session_agg(stream, gap="30 minutes")
    got = ss.run_available_now(result, "t_sessions")
    batch = session_summary(catalog.load(spark, sf_dir, "events"), gap_minutes=30)

    # session_window(gap) closes at last_ts + gap exclusive; compare the
    # per-user session count + total events, which both formulations
    # must agree on.
    g = {
        (r["user_id"],): (r["n"], r["tot"])
        for r in got.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("tot"))
        .collect()
    }
    b = {
        (r["user_id"],): (r["n"], r["tot"])
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("tot"))
        .collect()
    }
    assert g == b


def test_stream_dedup_within_watermark(spark, sf_dir):
    stream = ss.read_events_stream(spark, sf_dir)
    doubled = stream.unionByName(stream)  # every event twice
    deduped = ss.dedup_within_watermark(doubled)
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.table("t_dedup").count()
    expected = catalog.load(spark, sf_dir, "events").count()
    assert n == expected


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream purchase←view attribution join agrees with the
    batch formulation of the same interval predicate."""
    stream = ss.read_events_stream(spark, sf_dir)
    joined = ss.purchase_view_join(stream, within="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["purchase_event_id"], r["view_event_id"])
        for r in spark.table("t_ssjoin").collect()
    }

    ev = catalog.load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_event_id")
    )
    batch = purchases.join(
        views,
        F.expr(
            "user_id = v_user_id AND view_ts <= purchase_ts "
            "AND view_ts >= purchase_ts - INTERVAL 1 hour"
        ),
    )
    want = {
        (r["purchase_event_id"], r["view_event_id"]) for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_tumbling_counts_match_batch(spark, sf_dir):
    stream = ss.read_events_stream(spark, sf_dir)
    got = ss.run_available_now(ss.tumbling_counts(stream, width="1 hour"), "t_tumble")
    batch = (
        catalog.load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_start"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    g = {(r["bucket_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["bucket_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert g == b


def test_stream_static_broadcast_enrichment(spark, sf_dir):
    """Stream-static join: the streaming event feed enriched against the
    static per-user profile (batch DataFrame) — Spark re-plans the
    static side per microbatch and broadcasts it; results must equal
    the all-batch join."""
    stream = ss.read_events_stream(spark, sf_dir)
    ev = catalog.load(spark, sf_dir, "events")
    prof = ev.groupBy("user_id").agg(F.count("*").alias("user_events"))
    enriched = stream.join(F.broadcast(prof), "user_id").select(
        "event_id", "user_id", "user_events"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_stream_static")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["user_id"], r["user_events"])
        for r in spark.table("t_stream_static").collect()
    }
    want = {
        (r["event_id"], r["user_id"], r["user_events"])
        for r in ev.join(prof, "user_id").select("event_id", "user_id", "user_events").collect()
    }
    assert got == want and len(got) > 0


def test_observe_metrics_count_rejects_without_extra_pass(spark, sf_dir):
    """df.observe(): pipeline data-quality counters (the reference's
    validation counts) accumulated DURING the main action — no second
    scan, unlike a separate .count() per metric."""
    from pyspark.sql import Observation

    ev = catalog.load(spark, sf_dir, "events")
    obs = Observation("quality")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("ts").isNull().cast("long")).alias("n_null_ts"),
        F.sum((~F.col("value").between(-1e6, 1e6)).cast("long")).alias("n_out_of_range"),
    )
    n = observed.filter(F.col("event_type") != "error").count()  # one action
    m = obs.get
    assert m["n_rows"] == ev.count()
    assert m["n_null_ts"] == ev.filter(F.col("ts").isNull()).count()
    assert n > 0 and m["n_rows"] >= n


def test_watermark_drop_metrics_are_observable(spark, sf_dir, tmp_path):
    """Operational pin: the streaming session aggregation exposes
    per-operator watermark state metrics through query progress
    (numRowsDroppedByWatermark et al.) — the signal an operator's
    late-data policy is monitored by in production."""
    import json

    stream = ss.read_events_stream(spark, sf_dir)
    result = ss.session_agg(stream, gap="30 minutes")
    q = (
        result.writeStream.format("memory")
        .queryName("t_wm_metrics")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [
        p if isinstance(p, dict) else json.loads(p.json if hasattr(p, "json") else str(p))
        for p in q.recentProgress
    ]
    ops = [op for p in progress for op in p.get("stateOperators", [])]
    assert ops, "expected stateOperators in streaming progress"
    assert any("numRowsDroppedByWatermark" in op for op in ops)
    assert any(op.get("numRowsTotal", 0) > 0 for op in ops)


def test_stage_stream_dir_distinguishes_same_basename(tmp_path):
    """r12 ADVICE: two corpora whose directories share a BASENAME (every
    pytest tmp_path fixture looks like this) must stage to DIFFERENT
    stream dirs, each resolving to its own corpus — a basename-keyed
    scratch dir would silently stream one corpus while the caller
    probes the other's base tables."""
    import os
    import shutil

    a = tmp_path / "parent_a" / "corpus"
    b = tmp_path / "parent_b" / "corpus"
    for d in (a, b):
        d.mkdir(parents=True)
        shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "events.parquet")

    da = ss._stage_stream_dir(str(a))
    db = ss._stage_stream_dir(str(b))
    assert da != db, "same-basename corpora must not share a staging dir"
    for staged, src in ((da, a), (db, b)):
        link = os.path.join(staged, "events.parquet")
        assert os.path.realpath(link) == os.path.realpath(
            str(src / "events.parquet")
        )


def test_stage_stream_dir_repoints_stale_link(tmp_path):
    """A corpus dir deleted and recreated at the SAME path (so the tag
    matches) but whose parquet is now a different file must have its
    staged symlink re-validated, not blindly reused."""
    import os
    import shutil

    c = tmp_path / "corpus"
    c.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), c / "events.parquet")
    d1 = ss._stage_stream_dir(str(c))
    link = os.path.join(d1, "events.parquet")
    first_target = os.path.realpath(link)

    # recreate the corpus: same path, new inode/content location
    shutil.rmtree(c)
    c.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), c / "events.parquet")
    d2 = ss._stage_stream_dir(str(c))
    assert d2 == d1
    assert os.path.realpath(os.path.join(d2, "events.parquet")) == os.path.realpath(
        str(c / "events.parquet")
    )
    # and the link actually resolves (the old target was rmtree'd)
    assert os.path.exists(os.path.join(d2, "events.parquet"))
