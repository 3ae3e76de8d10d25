"""Registry-wide physical-plan audit (r13 optimization checklist).

Builds every registered key's DataFrame at $SPARK_GRAFT_SF_DIR and scans
the executed plan string for the hazard classes the optimization guide
names (§3 joins, §4 Python boundary, §6 pushdown):

- ``BatchEvalPython``            row-at-a-time Python UDF (guide §4.1)
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``  accidental all-pairs
- ``SortMergeJoin``              counted (fine per se — flagged only to eyeball)
- ``Exchange`` count             shuffle budget per key
- ``scans_pushed_empty``         raw count of ``PushedFilters: []`` scan
  occurrences — NOT cross-checked against Filter nodes, so a scan that
  legitimately has no filter counts the same as a missed pushdown; treat
  it as a lead to eyeball, not a violation (r13 ADVICE wording fix)

Streaming keys (``q_stream_*``) execute on build and are skipped here —
their batch twins cover the plan shapes. Output: one JSON line per key to
``plans/r13/AUDIT.json`` plus a violations summary on stdout.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_property_data_ingestion_document_pipeline_spark.session import get_spark
from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="audit-plans")
    spark.sparkContext.setLogLevel("ERROR")
    rows: dict[str, dict] = {}
    for key in QUERIES:
        if key.startswith("q_stream_"):
            rows[key] = {"skipped": "streaming (executes on build; batch twin audited)"}
            continue
        try:
            df = QUERIES[key](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            rows[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
            continue
        scans = plan.count("Scan parquet")
        pushed_empty = len(re.findall(r"PushedFilters: \[\]", plan))
        rows[key] = {
            "exchanges": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"),
            "roundrobin": plan.count("RoundRobinPartitioning"),
            "batch_eval_python": plan.count("BatchEvalPython"),
            "arrow_eval_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow"),
            "cartesian": plan.count("CartesianProduct"),
            "bnl_join": plan.count("BroadcastNestedLoopJoin"),
            "smj": plan.count("SortMergeJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "scans": scans,
            "scans_pushed_empty": pushed_empty,
        }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "plans", "r14", "AUDIT.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": SF_DIR, "keys": rows}, f, indent=1, sort_keys=True)
    bad = {
        k: v
        for k, v in rows.items()
        if v.get("batch_eval_python") or v.get("cartesian") or v.get("error")
    }
    print(f"audited {len(rows)} keys -> {out}")
    print("violations (BatchEvalPython / CartesianProduct / errors):")
    print(json.dumps(bad, indent=1) if bad else "  none")
    bnl = {k: v["bnl_join"] for k, v in rows.items() if v.get("bnl_join")}
    print("BroadcastNestedLoopJoin keys (audit by eye):", bnl or "none")
    spark.stop()


if __name__ == "__main__":
    main()
