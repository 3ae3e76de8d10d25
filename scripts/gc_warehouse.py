"""Warehouse GC for persisted per-corpus base tables (r12, VERDICT r11
ask #4).

The near-dup lanes persist corpus-derived warehouse tables named
``b_nd_*_{basename}_{hash8}`` (operators/bucketing.corpus_table_tag):
one table set per corpus ever probed. ensure_bucketed rebuilds a STALE
corpus in place, but a corpus that simply stops being used (a deleted
tmp dir, a rotated ingest snapshot) leaves its tables behind forever.
This script reclaims them: any hash-tagged ``b_nd_*`` or
``b_tok_arrays_*`` table (including ``_v<knob>`` banding-study
variants) whose tag matches NO live corpus directory is deleted, as
are the superseded r11-generation ``b_nd_base_*`` tables (replaced by
the shared full-corpus v2 set).

Tables outside those prefixes (demo lanes like ``b_orders_*``, test
scratch tables) are never touched — they are overwritten by their
creators per run and carry no per-corpus accumulation.

Purely filesystem-level: the engine's catalog is in-memory per session
(tables re-register from disk via ensure_bucketed's adoption tier), so
removing the directories IS the drop for every future session. Do not
run it concurrently with a session actively probing a corpus you are
about to reclaim — the same single-writer cadence ensure_bucketed
documents for rebuilds (two concurrent same-fingerprint builders are
last-writer-wins; a reader of a reclaimed corpus fails its scan).

Usage:
    python scripts/gc_warehouse.py [--live DIR ...] [--warehouse PATH]
                                   [--dry-run]

Default live set: /root/testdata/sf* plus $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from automated_property_data_ingestion_document_pipeline_spark.operators.bucketing import (  # noqa: E402
    corpus_table_tag,
)

# Per-corpus accumulating prefixes: near-dup bases (b_nd_*) and the
# r13 token-stream table (b_tok_arrays_*, queries_text.ensure_token_base).
# The optional _v<knob> suffix covers banding-study variant tables
# (scripts/banding_ab.py b_nd_*_{tag}_v4x8 etc.), which the r12
# $-anchored pattern silently classified "keep" forever.
_HASHED = re.compile(r"^b_(?:nd_|tok_arrays_).*_[0-9a-f]{8}(?:_v\w+)?$")
_LEGACY = re.compile(r"^b_nd_base_")


def default_warehouse() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, ".scratch", "warehouse")


def collect(warehouse: str, live_dirs: list[str]) -> tuple[list[str], list[str]]:
    """(reclaim, keep) table-directory names under ``warehouse``."""
    live_tags = {corpus_table_tag(d) for d in live_dirs if os.path.isdir(d)}
    reclaim, keep = [], []
    if not os.path.isdir(warehouse):
        return reclaim, keep
    for name in sorted(os.listdir(warehouse)):
        if not os.path.isdir(os.path.join(warehouse, name)):
            continue
        if _LEGACY.match(name):
            reclaim.append(name)  # superseded r11 v1 generation
        elif _HASHED.match(name):
            # substring on "_{tag}" (tag embeds hash8 — collision-proof
            # in practice) so variant-suffixed tables match their
            # corpus' liveness too
            alive = any(f"_{t}" in name for t in live_tags)
            (keep if alive else reclaim).append(name)
        else:
            keep.append(name)
    return reclaim, keep


def main(argv: "list[str] | None" = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--live", action="append", default=None,
                    help="live corpus dir (repeatable)")
    ap.add_argument("--warehouse", default=default_warehouse())
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)
    live = args.live or sorted(glob.glob("/root/testdata/sf*"))
    env_sf = os.environ.get("SPARK_GRAFT_SF_DIR")
    if env_sf and env_sf not in live:
        live.append(env_sf)
    reclaim, keep = collect(args.warehouse, live)
    for name in reclaim:
        if not args.dry_run:
            shutil.rmtree(os.path.join(args.warehouse, name), ignore_errors=True)
    report = {
        "warehouse": args.warehouse,
        "live_corpora": live,
        "reclaimed": reclaim,
        "kept": keep,
        "dry_run": bool(args.dry_run),
    }
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
