#!/usr/bin/env python
"""Adversarial hot-key corpus (r02 verdict #6): one user owns ~10 % of
all events — the analog of the reference's singleton Chrome session
(crs_ui_bot.py:34-70), where one logical key serializes the whole
workload. Windows and sessions can't be salted (they need the full
ordered per-key sequence), so this corpus measures what actually
happens to window/session operators when a key goes hot.

Usage: python scripts/make_skew_corpus.py OUT_DIR [SRC_SF_DIR]

Derives events.parquet from the driver corpus (default sf0.1) by
remapping every event with ``event_id % 10 == 3`` to user 0 —
deterministic, ~10 % of rows, preserving all other columns and the
timestamp distribution. Other tables are not copied; point only
events-keyed queries here.
"""

from __future__ import annotations

import os
import sys

import duckdb


def make(out_dir: str, src_sf_dir: str = "/root/testdata/sf0.1") -> str:
    os.makedirs(out_dir, exist_ok=True)
    src = os.path.join(src_sf_dir, "events.parquet")
    dst = os.path.join(out_dir, "events.parquet")
    duckdb.sql(
        f"""
        COPY (
          SELECT event_id, ts,
                 CASE WHEN event_id % 10 = 3 THEN 0 ELSE user_id END AS user_id,
                 event_type, value, props
          FROM '{src}'
        ) TO '{dst}' (FORMAT PARQUET)
        """
    )
    return dst


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_skew"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    print(make(out, src))
