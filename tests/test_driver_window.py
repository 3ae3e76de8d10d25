"""Driver-window accounting check (ADVICE r05 low __spark_entry__.py:117
follow-through): the head comment's counts must match the actual
composition of the first 50 keys the driver will sample, so each
round's backlog accounting starts from accurate numbers."""

from __future__ import annotations

import __spark_entry__ as entry


def test_head_is_50_unseen_oracle_keys():
    q = list(entry.queries())
    oracles = entry.oracle_sql()
    head = q[:50]
    assert len(head) == 50
    unseen = [k for k in head if k not in entry._DRIVER_SEEN]
    assert len(unseen) == 50, f"driver-seen keys wasting head slots: {set(head) - set(unseen)}"
    rows_only = [k for k in head if k not in oracles]
    assert rows_only == [], rows_only


def test_priority_list_has_no_unknown_or_duplicate_keys():
    q = entry.queries()
    missing = [k for k in entry._PRIORITY if k not in q]
    assert not missing, missing
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))
