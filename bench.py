#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced through the noop sink (full materialization of every
output column — ``count()`` would let Catalyst prune the projections we
mean to measure). Timings include plan+execute, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from automated_property_data_ingestion_document_pipeline_spark.session import get_spark
from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family — scan, scalar-heavy projection,
# JSON ingest, star join, Q1 agg, top-k, ranking window, sessionization,
# tumbling window, as-of join, wordcount, exact dedup, fingerprint, knn,
# letter render, last-win dedup.
HEADLINE = [
    "q_scan_count",
    "q_json_ingest",
    "q_currency_format",
    "q_letter_text",
    "q_engagement_pipeline",
    "q_star_join",
    "q_groupby_agg",
    "q_topk",
    "q_window_rank",
    "q_dedup_lastwin",
    "q_sessionize",
    "q_tumbling_window",
    "q_asof_join",
    "q_wordcount",
    "q_doc_dedup",
    "q_fingerprint",
    "q_knn",
    "q_simhash",
    "q_minhash_neardup",
    "q_neardup_clusters",
    "q_resample_ffill",
    # round-3 additions: heaviest new shapes
    "q_sql_tpch_q8",
    "q_unigram_logfreq",
    "q_chunk_overlap",
    "q_knn_pq",
    "q_salted_join",
    "q_fuzzy_match",
    "q_sessionize_capped",
    "q_curation_pipeline2",
    "q_asof_nearest",
    "q_wizard_steps",
    "q_resample_bfill",
    "q_resample_interp",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def exchange_count(df) -> int:
    """Number of Exchange (shuffle/broadcast-exchange excluded) nodes in
    the physical plan. The r02 q_asof_join regression was an extra
    shuffle invisible in wall-time jitter — counting exchanges makes a
    plan-shape regression show up in the bench line itself. Counts the
    initial physical plan (pre-AQE), which is deterministic across runs;
    AQE can only coalesce/convert these at runtime, not add more."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def load_round_baseline() -> tuple[str, dict] | None:
    """Latest BENCH_r{N}.json beside this file → (name, per-query secs).
    Used to report per-query deltas so a regression is visible in the
    bench line itself, not only by diffing round artifacts."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    if not rounds:
        return None
    path = rounds[-1]
    try:
        with open(path) as f:
            parsed = json.load(f).get("parsed") or {}
        return os.path.basename(path), parsed.get("queries") or {}
    except (OSError, ValueError):
        return None


def main() -> None:
    sf = float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "") or "0.1")
    spark = get_spark(app_name="apdidp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/scan path once so per-query numbers measure the plan,
    # not first-touch class loading.
    materialize(QUERIES["q_scan_count"](spark, SF_DIR))

    from automated_property_data_ingestion_document_pipeline_spark.operators import dedup

    timings: dict[str, dict] = {}
    total = 0.0
    for key in HEADLINE:
        t_build = time.perf_counter()
        df = QUERIES[key](spark, SF_DIR)
        build_s = time.perf_counter() - t_build
        nx = exchange_count(df)
        t0 = time.perf_counter()
        materialize(df)
        dt = round(time.perf_counter() - t0, 3)
        timings[key] = {"sec": dt, "exchanges": nx}
        if key == "q_neardup_clusters":
            # iterative CC runs its per-round jobs (and convergence
            # probes) during CONSTRUCTION, so its real cost is build
            # time; fold it in, and report rounds-to-convergence
            # (= component diameter) — the plan-shape number for an
            # iterative operator, one shuffle per round.
            timings[key] = {
                "sec": round(dt + build_s, 3),
                "exchanges": nx,
                "cc_rounds": dedup.LAST_CC_ROUNDS,
            }
        total += timings[key]["sec"]
    line = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    baseline = load_round_baseline()
    if baseline:
        # pre-r03 rounds recorded bare seconds; r03+ records
        # {sec, exchanges} — normalize for the delta computation.
        name, base_q = baseline
        base_sec = {
            k: (v["sec"] if isinstance(v, dict) else v) for k, v in base_q.items()
        }
        line["baseline"] = name
        line["baseline_total"] = round(sum(base_sec.values()), 3)
        line["delta_x"] = {
            k: round(timings[k]["sec"] / base_sec[k], 2)
            for k in timings
            if base_sec.get(k)
        }
        exchange_regressions = {
            k: {"was": base_q[k]["exchanges"], "now": timings[k]["exchanges"]}
            for k in timings
            if isinstance(base_q.get(k), dict)
            and timings[k]["exchanges"] > base_q[k]["exchanges"]
        }
        if exchange_regressions:
            line["exchange_regressions"] = exchange_regressions
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
