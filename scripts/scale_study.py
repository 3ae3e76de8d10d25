"""Single-pass scale study (VERDICT r05 ask #9): run the headline keys
once each at an arbitrary SF dir (default the 10x /tmp/sf1.0 built by
make_sf1.py) and record, per key: wall seconds, shuffle-write bytes,
memory/disk SPILL bytes (the memory-pressure signal the sf0.1 bench
cannot produce), and JVM used-heap after the key.  Output: one JSON
line per key on stdout + a summary with the per-key wall ratio against
the recorded sf0.1 BENCH_DETAIL medians, flagging super-linear keys
(ratio > replicas, here 10x).

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python scripts/scale_study.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, materialize  # noqa: E402
from automated_property_data_ingestion_document_pipeline_spark.session import get_spark  # noqa: E402
from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")


def stage_totals(spark) -> tuple[int, int, int]:
    """(shuffle write, memory spill, disk spill) bytes across the app."""
    sc = spark.sparkContext
    sc._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    gw = sc._gateway
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        gw.jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(gw.jvm.double, 0),
        gw.jvm.java.util.ArrayList(),
    )
    sw = ms = ds = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        sw += s.shuffleWriteBytes()
        ms += s.memoryBytesSpilled()
        ds += s.diskBytesSpilled()
    return sw, ms, ds


def jvm_used_mb(spark) -> float:
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return round((rt.totalMemory() - rt.freeMemory()) / 1e6, 1)


def main() -> None:
    spark = get_spark(app_name="apdidp-scale-study")
    spark.sparkContext.setLogLevel("ERROR")
    materialize(QUERIES["q_scan_count"](spark, SF_DIR))  # warm

    base = {}
    try:
        with open(os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")) as f:
            base = {k: v["sec"] for k, v in json.load(f)["queries"].items()}
    except (OSError, ValueError, KeyError):
        pass

    keys = HEADLINE
    subset = [k for k in os.environ.get("SPARK_GRAFT_KEYS", "").split(",") if k]
    if subset:
        keys = subset  # family-scoped follow-through runs (r07 ask #5)

    results = {}
    for key in keys:
        pre = stage_totals(spark)
        t0 = time.perf_counter()
        df = QUERIES[key](spark, SF_DIR)
        materialize(df)
        sec = round(time.perf_counter() - t0, 3)
        post = stage_totals(spark)
        row = {
            "sec": sec,
            "shuffle_mb": round((post[0] - pre[0]) / 1e6, 1),
            "mem_spill_mb": round((post[1] - pre[1]) / 1e6, 1),
            "disk_spill_mb": round((post[2] - pre[2]) / 1e6, 1),
            "jvm_used_mb": jvm_used_mb(spark),
        }
        if base.get(key):
            row["x_vs_sf01"] = round(sec / base[key], 2)
        results[key] = row
        print(json.dumps({key: row}), flush=True)
    total = round(sum(r["sec"] for r in results.values()), 2)
    spills = {k: r for k, r in results.items() if r["mem_spill_mb"] or r["disk_spill_mb"]}
    superlinear = {
        k: r["x_vs_sf01"] for k, r in results.items() if r.get("x_vs_sf01", 0) > 10
    }
    print(
        json.dumps(
            {
                "summary": {
                    "sf_dir": SF_DIR,
                    "total_sec": total,
                    "keys": len(results),
                    "spilling_keys": list(spills),
                    "superlinear_keys": superlinear,
                }
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
