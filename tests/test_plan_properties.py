"""Physical-plan property tests: the scale-critical plan shapes
(pruning, pushdown, broadcast, TakeOrdered, shuffle counts) asserted
against the executed plan string so a regression in plan quality fails
CI, not just the bench. Complements PERFORMANCE.md's audits."""

from __future__ import annotations

import pytest

from automated_property_data_ingestion_document_pipeline_spark.plans.registry import QUERIES


def plan_of(spark, sf_dir, key: str) -> str:
    return QUERIES[key](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_star_join_prunes_broadcasts_and_pushes(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_star_join")
    # all dims broadcast, fact never sort-merge-joined
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # join-key null filters pushed into the scans
    assert "PushedFilters: [IsNotNull" in plan
    # column pruning: lineitem's widest columns never read
    assert "l_comment" not in plan and "l_shipinstruct" not in plan


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_engagement_pipeline_is_shuffle_free(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_engagement_pipeline")
    assert "Exchange hashpartitioning" not in plan  # broadcast joins only
    assert plan.count("from_json") == 1  # parsed exactly once (round 2)


def test_knn_broadcasts_queries_never_shuffles_corpus_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_knn")
    assert "Broadcast" in plan
    # the only exchange allowed is the window's partition on query_id
    assert plan.count("Exchange hashpartitioning") <= 1


def test_sort_uses_range_partitioning_not_single_partition(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_sort")
    assert "rangepartitioning" in plan  # parallel global sort


def test_exact_dedup_single_exchange(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q_doc_dedup")
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle on the hash


@pytest.mark.parametrize("key", ["q_currency_format", "q_langid", "q_quality_score"])
def test_scalar_queries_are_map_only(spark, sf_dir, key):
    plan = plan_of(spark, sf_dir, key)
    assert "Exchange" not in plan  # pure scan + project
