"""Capture ``.explain("formatted")`` for registered keys into plan files.

Usage:
    python scripts/capture_plans.py <outdir> <suffix> key [key ...]

Writes ``<outdir>/<key>_<suffix>.txt`` for each key — the optimization
rounds' evidence artifact (the judge checks plan claims against these
files). Planning only: no query is executed, so this is safe to run
alongside other work. Keys whose build itself RUNS jobs (iterative
operators, streaming lanes) still emit the FINAL plan; their per-round
shuffle evidence lives in BENCH_DETAIL.json's executed-exchange counts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_property_data_ingestion_document_pipeline_spark.session import get_spark
from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        try:
            df = QUERIES[key](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure in place
            plan = f"<capture failed: {type(e).__name__}: {e}>"
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
