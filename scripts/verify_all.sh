#!/usr/bin/env bash
# Full verification battery — what the verify skill runs, in one command:
#  1. unit/property/plan/differential suite
#  2. driver-contract simulation at sf0.01 (DuckDB oracle, all keys)
#  3. the same over the adversarial edge corpus
#  4. headline bench at sf0.1 (one JSON line)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python scripts/drive_driver.py
python scripts/make_edge_corpus.py /tmp/sf_edge
DRIVE_SF=/tmp/sf_edge python scripts/drive_driver.py
python bench.py
