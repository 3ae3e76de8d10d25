"""Driver-window accounting check (ADVICE r05 low __spark_entry__.py:117
follow-through): the head comment's counts must match the actual
composition of the first 50 keys the driver will sample, so each
round's backlog accounting starts from accurate numbers."""

from __future__ import annotations

import __spark_entry__ as entry


def test_unseen_keys_fill_the_window_before_seen_keys():
    """r08 shape: the backlog is down to the final never-witnessed keys
    (6 oracle + 24 rows-only lanes + any new this round), so the
    invariant is ordering, not composition — every never-seen key must
    precede every seen key, and the whole backlog must fit the 50-slot
    head."""
    q = list(entry.queries())
    seen_flags = [k in entry._DRIVER_SEEN for k in q]
    first_seen = seen_flags.index(True)
    late_unseen = [k for k, s in zip(q[first_seen:], seen_flags[first_seen:]) if not s]
    assert not late_unseen, f"unseen keys scheduled after seen ones: {late_unseen}"
    unseen = [k for k in q if k not in entry._DRIVER_SEEN]
    assert len(unseen) <= 50, f"backlog no longer fits one window: {len(unseen)}"
    assert set(unseen) <= set(q[:50])


def test_coverage_doc_counts_match_registry():
    """r07 verdict ask #5: COVERAGE.md and README registry totals are
    machine-checked against the live registry so they cannot drift."""
    import re
    from pathlib import Path

    from automated_property_data_ingestion_document_pipeline_spark.plans import ORACLES, QUERIES

    root = Path(__file__).resolve().parent.parent
    n_keys, n_oracle = len(QUERIES), len(ORACLES)
    n_rows = n_keys - n_oracle

    cov = (root / "COVERAGE.md").read_text()
    m = re.search(r"\*\*(\d+) keys, (\d+) oracle-checked, (\d+)\s+rows-only\*\*", cov)
    assert m, "COVERAGE.md totals line not found"
    assert tuple(map(int, m.groups())) == (n_keys, n_oracle, n_rows)

    readme = (root / "README.md").read_text()
    m2 = re.search(r"\((\d+) keys,\s+(\d+) with DuckDB oracles", readme)
    assert m2, "README registry counts line not found"
    assert tuple(map(int, m2.groups())) == (n_keys, n_oracle)
    m3 = re.search(r"rows-only — (\d+) of (\d+)", readme)
    assert m3, "README rows-only count line not found"
    assert tuple(map(int, m3.groups())) == (n_rows, n_keys)


def test_priority_list_has_no_unknown_or_duplicate_keys():
    q = entry.queries()
    missing = [k for k in entry._PRIORITY if k not in q]
    assert not missing, missing
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
