"""operators/fanout.py — the r13 decode-lane parallelism fix.

The corpus ships one parquet file / one row group per table, so a bare
scan plans ONE task; fan_out's round-robin repartition spreads the
CPU-bound row-local decode stages across the cluster. Pinned here:
the width is cluster-derived (defaultParallelism, never a constant),
results are row-identical, and the adopting lanes' plans carry the
RoundRobin exchange ahead of the Python stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators.fanout import fan_out


def test_fan_out_width_is_cluster_derived(spark, sf_dir):
    d = catalog.load(spark, sf_dir, "documents").select("doc_id")
    assert d.rdd.getNumPartitions() == 1  # the single-file premise
    wide = fan_out(d)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert (
        fan_out(d, width_factor=2).rdd.getNumPartitions()
        == 2 * spark.sparkContext.defaultParallelism
    )


def test_fan_out_preserves_rows_exactly(spark, sf_dir):
    d = catalog.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    before = sorted(r["doc_id"] for r in d.select("doc_id").collect())
    after = sorted(r["doc_id"] for r in fan_out(d).select("doc_id").collect())
    assert before == after and len(before) == 64


def test_fan_out_lanes_plan_roundrobin_before_python(spark, sf_dir):
    """The five lanes that KEPT fan_out after the r13 A/B (per-row CPU
    heavy enough to amortize the extra stage — OPTIMIZATION_r13.md):
    the RoundRobin exchange must sit below the Python eval node, and no
    hashpartitioning exchange may appear on the decode path."""
    from automated_property_data_ingestion_document_pipeline_spark.plans.registry import QUERIES

    for key in (
        "q_letter_roundtrip",
        "q_flac_energy",
        "q_pdf_extract",
        "q_ref_template_extract",
        "q_report_archive_extract",
    ):
        plan = QUERIES[key](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" in plan, (key, plan[:1500])
        assert "Exchange hashpartitioning" not in plan, (key, plan[:1500])


def test_fan_out_rejects_nonpositive_width_factor(spark, sf_dir):
    import pytest

    from automated_property_data_ingestion_document_pipeline_spark.operators.fanout import (
        fan_out_if_narrow,
    )

    d = catalog.load(spark, sf_dir, "documents").select("doc_id")
    with pytest.raises(ValueError):
        fan_out(d, width_factor=0)
    with pytest.raises(ValueError):
        fan_out_if_narrow(d, width_factor=-1)


def test_fan_out_if_narrow_widens_single_task_scan(spark, sf_dir):
    from automated_property_data_ingestion_document_pipeline_spark.operators.fanout import (
        fan_out_if_narrow,
    )

    d = catalog.load(spark, sf_dir, "documents").select("doc_id")
    assert d.rdd.getNumPartitions() == 1  # single-file premise
    wide = fan_out_if_narrow(d)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_fan_out_if_narrow_noop_on_wide_input(spark, sf_dir):
    """The conditional guard (r14): an input that already plans at
    least a wave of tasks must pass through UNTOUCHED — this is the
    property that makes the helper safe on 100 TB multi-file scans
    (no blanket reshuffle)."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.fanout import (
        fan_out_if_narrow,
    )

    w = spark.sparkContext.defaultParallelism
    d = catalog.load(spark, sf_dir, "documents").select("doc_id").repartition(w)
    out = fan_out_if_narrow(d)
    assert out is d  # exact no-op, not merely same width


def test_fan_out_if_narrow_preserves_rows(spark, sf_dir):
    from automated_property_data_ingestion_document_pipeline_spark.operators.fanout import (
        fan_out_if_narrow,
    )

    d = catalog.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    before = sorted(r["doc_id"] for r in d.select("doc_id").collect())
    after = sorted(
        r["doc_id"] for r in fan_out_if_narrow(d).select("doc_id").collect()
    )
    assert before == after and len(before) == 64
