"""Per-key build/exec split + per-stage breakdown (r14 measurement rig).

Usage:
    SPARK_GRAFT_KEYS=q_a,q_b python scripts/profile_keys.py [reps]

For each key: time DataFrame CONSTRUCTION (plan build, incl. any jobs an
iterative/ensure_* build runs) separately from EXECUTION (noop sink,
guide §1.4), over ``reps`` repetitions; after the first execution, dump
the stages the query ran (name, wall, task count, shuffle read/write)
from the AppStatusStore so the dominant stage is identifiable without
the UI (guide §1.1 empirical loop). Jobs are labeled per key (§1.5).

Diagnostic only — never part of the driver contract or bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_property_data_ingestion_document_pipeline_spark.session import get_spark
from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def stage_rows(spark) -> dict[int, dict]:
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
    out: dict[int, dict] = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        sid = s.stageId()
        dur = None
        try:
            if s.submissionTime().isDefined() and s.completionTime().isDefined():
                dur = (
                    s.completionTime().get().getTime()
                    - s.submissionTime().get().getTime()
                ) / 1000.0
        except Exception:
            pass
        out[sid] = {
            "name": s.name(),
            "tasks": s.numCompleteTasks(),
            "dur_s": dur,
            "shuf_r_mb": round(s.shuffleReadBytes() / 1e6, 2),
            "shuf_w_mb": round(s.shuffleWriteBytes() / 1e6, 2),
        }
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    keys = [k for k in os.environ.get("SPARK_GRAFT_KEYS", "").split(",") if k]
    if not keys:
        print("set SPARK_GRAFT_KEYS", file=sys.stderr)
        sys.exit(2)
    spark = get_spark(
        app_name="profile-keys",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    materialize(QUERIES["q_scan_count"](spark, SF_DIR))  # warm
    for key in keys:
        spark.sparkContext.setJobDescription(key)
        builds, execs = [], []
        new_stages: dict[int, dict] = {}
        for rep in range(reps):
            pre = stage_rows(spark) if rep == 0 else None
            t0 = time.perf_counter()
            df = QUERIES[key](spark, SF_DIR)
            t1 = time.perf_counter()
            materialize(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            if rep == 0:
                post = stage_rows(spark)
                new_stages = {k: v for k, v in post.items() if k not in pre}
        bm = sorted(builds)[len(builds) // 2]
        em = sorted(execs)[len(execs) // 2]
        print(
            f"\n=== {key}: build={bm:.3f}s exec={em:.3f}s total={bm+em:.3f}s "
            f"(build spread {min(builds):.2f}-{max(builds):.2f}, "
            f"exec {min(execs):.2f}-{max(execs):.2f}, n={reps})"
        )
        for sid in sorted(new_stages):
            s = new_stages[sid]
            d = f"{s['dur_s']:.2f}" if s["dur_s"] is not None else "?"
            print(
                f"  stage {sid:4d} {d:>7}s tasks={s['tasks']:3d} "
                f"r={s['shuf_r_mb']:8.2f}MB w={s['shuf_w_mb']:8.2f}MB  {s['name'][:90]}"
            )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
