"""Driver-window policy checks. The external driver samples only the
FIRST ~50 keys of ``queries()`` per round, so ordering IS the
verification policy. Since r09 the order derives from the committed
CORRECTNESS_r{N}.json ledgers (r08 verdict asks #1/#2): never-witnessed
keys first, then stalest-witnessed first — so the window automatically
drains freshness debt every round with no hand-edited seen-set."""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry


def _latest_ledger_round() -> int:
    here = os.path.dirname(os.path.abspath(entry.__file__))
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    ]
    assert rounds, "no committed CORRECTNESS ledgers"
    return max(rounds)


def test_rotation_orders_unseen_then_stalest_first():
    """The policy pin (r08 verdict ask #2): parse the committed ledgers
    independently and assert queries() puts every never-witnessed key
    before every witnessed one, and witnessed keys in ascending
    last-witnessed-round order (ties in registration order)."""
    q = list(entry.queries())
    seen = entry._witness_rounds()

    manual = [k for k in entry._MANUAL_PRIORITY if k in q]
    body = q[len(manual) :]
    flags = [k in seen for k in body]
    if True in flags:
        first_seen = flags.index(True)
        late_unseen = [k for k, s in zip(body[first_seen:], flags[first_seen:]) if not s]
        assert not late_unseen, f"unseen keys scheduled after seen ones: {late_unseen}"
    witnessed_rounds = [seen[k] for k in body if k in seen]
    assert witnessed_rounds == sorted(witnessed_rounds), (
        "witnessed keys must be ordered stalest-first"
    )


def test_window_drains_the_oldest_vintage():
    """The 50-key window must be filled by the globally oldest
    witness-rounds: no key outside the window may be staler than the
    newest key inside it (new never-witnessed keys count as round 0)."""
    q = list(entry.queries())
    seen = entry._witness_rounds()
    # _MANUAL_PRIORITY keys deliberately jump the staleness queue (their
    # implementation changed since last witness), so the drain property
    # applies to the rest of the window only.
    manual = {k for k in entry._MANUAL_PRIORITY if k in q}
    window = [k for k in q[:50] if k not in manual]
    rest = q[50:]
    newest_in_window = max(seen.get(k, 0) for k in window)
    staler_outside = [k for k in rest if seen.get(k, 0) < newest_in_window]
    assert not staler_outside, (
        f"keys staler than the window's newest were left outside: "
        f"{staler_outside[:5]} (< r{newest_in_window})"
    )


def test_witness_rounds_covers_full_registry():
    """r08 closed the ledger: every registered key has at least one
    successful driver witness. New growth keys are the only allowed
    unseen ones, and they must sit at the very front of the order."""
    q = list(entry.queries())
    seen = entry._witness_rounds()
    unseen = [k for k in q if k not in seen]
    # growth budget per round is <=10; anything larger means the ledger
    # parse broke, not that 10+ keys appeared at once
    assert len(unseen) <= 10, f"ledger parse regression? unseen={len(unseen)}"
    # order is manual block, then new growth, then staleness body — so
    # the unseen keys (minus any manually forced ones) start right
    # after the manual prefix
    manual = [k for k in entry._MANUAL_PRIORITY if k in q]
    body_unseen = [k for k in unseen if k not in manual]
    assert body_unseen == q[len(manual) : len(manual) + len(body_unseen)]
    assert len(manual) + len(unseen) <= 50, "growth + manual must fit the window"


def test_failed_rows_do_not_count_as_witnessed():
    """A ledger row recording a failure (hash/schema/rows mismatch or a
    real error) must NOT advance the key's witness round — it re-queues
    at the front instead of sinking for 6 rounds."""
    rows = {
        "ok_oracle": {"rows_match": True, "schema_match": True, "hash_match": True,
                      "spark_rows": 1, "oracle_rows": 1, "err": None},
        "ok_rows_only": {"rows_match": None, "schema_match": None, "hash_match": None,
                         "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"},
        "bad_hash": {"rows_match": True, "schema_match": True, "hash_match": False,
                     "spark_rows": 1, "oracle_rows": 1, "err": None},
        "bad_err": {"rows_match": None, "schema_match": None, "hash_match": None,
                    "spark_rows": 0, "oracle_rows": None, "err": "AnalysisException"},
    }

    def ok(row):
        err = row.get("err")
        return (err is None or err == "no_oracle") and all(
            row.get(f) is not False
            for f in ("rows_match", "schema_match", "hash_match")
        )

    assert ok(rows["ok_oracle"]) and ok(rows["ok_rows_only"])
    assert not ok(rows["bad_hash"]) and not ok(rows["bad_err"])
    # and the live parser agrees EXACTLY with an independent recompute
    # over every committed ledger (r09 self-review: the previous
    # disjunction `>= latest or > 0` was vacuously true)
    here = os.path.dirname(os.path.abspath(entry.__file__))
    expected: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for k, row in json.load(open(path)).items():
            if isinstance(row, dict) and ok(row):
                expected[k] = max(expected.get(k, 0), n)
    assert entry._witness_rounds() == expected


def test_coverage_doc_counts_match_registry():
    """r07 verdict ask #5: COVERAGE.md and README registry totals are
    machine-checked against the live registry so they cannot drift."""
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


def test_manual_priority_has_no_unknown_or_duplicate_keys():
    q = entry.queries()
    missing = [k for k in entry._MANUAL_PRIORITY if k not in q]
    assert not missing, missing
    assert len(entry._MANUAL_PRIORITY) == len(set(entry._MANUAL_PRIORITY))


def test_manual_priority_lands_in_the_driver_window():
    """The whole point of the escape hatch is a fresh driver witness:
    every manual key must sit inside the first-50 window the driver
    samples, ahead of the staleness-ordered body, and each must already
    have at least one historical witness (new growth keys don't need
    the hatch — they sort first anyway)."""
    q = list(entry.queries())
    seen = entry._witness_rounds()
    manual = [k for k in entry._MANUAL_PRIORITY if k in q]
    assert q[: len(manual)] == manual
    assert len(manual) <= 50
    never_witnessed = [k for k in manual if k not in seen]
    assert not never_witnessed, (
        f"manual priority is for re-witnessing changed keys, but these were "
        f"never witnessed (they'd sort first anyway): {never_witnessed}"
    )
