"""One-step ledger recomputation for the round verdict (r12, VERDICT
r11 ask #8): emits a single JSON artifact with the registry totals,
the latest-witness histogram over every committed CORRECTNESS_r*.json,
the stalest keys the next driver window will drain, and (when supplied
by verify_all.sh) the pytest suite summary — everything the judge
recomputes by hand each round, in one command:

    python scripts/verdict_summary.py [--pytest "961 passed ..."]
                                      [--out VERIFY_SUMMARY.json]

Witness semantics match the driver-window policy in __spark_entry__
exactly (it IS the same function): a key's latest round counts only if
that round's row recorded a successful run (oracle green, or the
rows-only "no_oracle" marker).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from automated_property_data_ingestion_document_pipeline_spark.plans import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def _bench_section(here: str) -> dict:
    """The quantitative spine of the verdict's performance section
    (r12 verdict ask #8): the committed BENCH_DETAIL's gate fields and
    headline totals, so the judge reads one artifact instead of
    cross-referencing three."""
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json")) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return {"available": False}
    queries = d.get("queries") or {}
    return {
        "available": True,
        "n_keys": len(queries),
        "total_sec": round(sum(v["sec"] for v in queries.values()), 3),
        "degraded": d.get("degraded"),
        "preflight": d.get("preflight"),
        "baseline": d.get("baseline"),
        "baseline_round": d.get("baseline_round"),
        "baseline_gate_passing": d.get("baseline_gate_passing"),
        "baseline_total": d.get("baseline_total"),
        "worst_delta_x": dict(
            sorted(
                (d.get("delta_x") or {}).items(), key=lambda kv: kv[1], reverse=True
            )[:5]
        ),
    }


def _scale_section(here: str) -> dict:
    """Index of SCALE_STUDY_sf1.json lanes: which lane groups exist and
    which keys each carries — the map the verdict's grade-for-scale
    audit walks."""
    try:
        with open(os.path.join(here, "SCALE_STUDY_sf1.json")) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return {"available": False}
    return {
        "available": True,
        "lane_groups": {
            k: sorted(x for x in v if x != "note")
            if isinstance(v, dict)
            else type(v).__name__
            for k, v in d.items()
        },
    }


def summarize(pytest_line: "str | None" = None) -> dict:
    witness = entry._witness_rounds()
    reg = sorted(QUERIES)
    per_key = {k: witness.get(k) for k in reg}
    hist = Counter(f"r{per_key[k]:02d}" if per_key[k] else "never" for k in reg)
    order = entry._driver_order()
    stalest = [
        {"key": k, "last_witness": per_key.get(k)} for k in order[:50]
    ]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return {
        "registry_keys": len(reg),
        "oracle_keys": len([k for k in reg if k in ORACLES]),
        "rows_only_keys": len([k for k in reg if k not in ORACLES]),
        "never_witnessed": sorted(k for k in reg if per_key[k] is None),
        "latest_witness_histogram": dict(sorted(hist.items())),
        "manual_priority": list(entry._MANUAL_PRIORITY),
        "next_window_head": stalest,
        "pytest": pytest_line,
        "bench": _bench_section(here),
        "scale_study": _scale_section(here),
    }


def main(argv: "list[str] | None" = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pytest", default=None,
                    help="pytest tail line to embed (verify_all.sh passes it)")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args(argv)
    doc = summarize(args.pytest)
    out = json.dumps(doc, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return doc


if __name__ == "__main__":
    main()
