"""Differential tests: Spark column expressions vs straight-line Python
implementations of the reference's LOCKED semantics
(report_generator.py:12-41, App.js:706/720), over seeded random domains
— one Spark job per test, hundreds of cases.

Known, documented divergences excluded from the domain:
- |v| ≥ 2^31: Python int() is unbounded, Spark int is 32-bit (the
  engine contract coalesces to '' — q_percent_format's oracle encodes
  this);
- NaN/Infinity strings: Python f-strings print 'nan'/'inf', the engine
  contract treats them as unparseable;
- exact round-half ties at 2 decimals: Python banker's vs JVM HALF_UP
  (unreachable for random 52-bit doubles — their exact decimal
  expansions never terminate at the 3rd decimal).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.functions import formatters as fmt
from automated_property_data_ingestion_document_pipeline_spark.streaming import state_machine as sm


def ref_format_percent(v) -> str:
    # report_generator.py:12-20 verbatim semantics
    try:
        return f"{int(float(v))}%"
    except (TypeError, ValueError):
        return ""


def ref_format_currency(v) -> str:
    # report_generator.py:23-31 verbatim semantics
    try:
        f = float(v)
        return f"${f:,.2f}" if not f.is_integer() else f"${int(f):,}"
    except (TypeError, ValueError):
        return ""


def _domain(n: int, seed: int = 42) -> list:
    rnd = random.Random(seed)
    vals = []
    for _ in range(n):
        kind = rnd.randrange(5)
        if kind == 0:
            vals.append(str(rnd.randint(-(10**9), 10**9)))
        elif kind == 1:
            vals.append(f"{rnd.randint(-(10**7), 10**7)}.{rnd.randrange(100):02d}")
        elif kind == 2:
            vals.append(repr(rnd.uniform(-1e6, 1e6)))
        elif kind == 3:
            vals.append(rnd.choice(["0", "-0", "1e3", " 12 ", "0.5", "-0.5"]))
        else:
            vals.append(rnd.choice(["", "abc", "12a", "$5", None]))
    return vals


def test_formatters_differential_400_cases(spark):
    vals = _domain(400)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v string")
    got = {
        r["i"]: (r["p"], r["c"])
        for r in df.select(
            "i",
            fmt.format_percent(F.col("v")).alias("p"),
            fmt.format_currency(F.col("v")).alias("c"),
        ).collect()
    }
    for i, v in enumerate(vals):
        assert got[i][0] == ref_format_percent(v), f"percent({v!r})"
        assert got[i][1] == ref_format_currency(v), f"currency({v!r})"


# ---- wizard machine vs straight-line simulator ------------------------------


def ref_wizard_replay(events):
    """Reference semantics replayed sequentially: advance clamped at 4
    (App.js:706), retreat clamped at 1 (App.js:720), error aborts,
    restore jumps to clamped props step, only advances complete."""
    import json as _json

    out = []
    step, n, start, last = 0, 0, None, None
    for et, ts, props in events:
        last = ts
        if start is None:
            start = ts
        n += 1
        if et == "error":
            out.append(("aborted", step, n, start, ts))
            step, n, start = 0, 0, None
            continue
        if et in ("back", "prev"):
            step = max(step - 1, 1)
            continue
        if et == "restore":
            try:
                step = min(max(int(_json.loads(props).get("step", 1)), 1), 4)
            except (TypeError, ValueError, AttributeError):
                step = 1
            continue
        if et in ("signup", "view", "click", "purchase"):
            step = min(step + 1, 4)
            if step >= 4:
                out.append(("completed", step, n, start, ts))
                step, n, start = 0, 0, None
    if n > 0:
        out.append(("in_progress", step, n, start, last))
    return out


def test_wizard_replay_differential_random_logs(spark):
    import datetime as dt

    rnd = random.Random(7)
    etypes = ["signup", "view", "click", "purchase", "error", "back", "restore", "scroll"]
    rows, expected = [], {}
    eid = 0
    for uid in range(25):
        events = []
        for j in range(rnd.randrange(1, 30)):
            et = rnd.choice(etypes)
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=j)
            props = f'{{"step": {rnd.randrange(-1, 7)}}}' if rnd.random() < 0.5 else "{}"
            eid += 1
            rows.append((eid, ts, uid, et, 0.0, props))
            events.append((et, ts, props))
        expected[uid] = sorted(
            (o, s, n) for (o, s, n, _st, _en) in ref_wizard_replay(events)
        )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    got = {}
    for r in sm.wizard_outcomes_batch(df).collect():
        got.setdefault(r["user_id"], []).append(
            (r["outcome"], r["final_step"], r["n_events"])
        )
    got = {u: sorted(v) for u, v in got.items()}
    assert got == {u: v for u, v in expected.items() if v}


def ref_sessionize_capped(events, gap_us, span_us):
    """Straight-line Python replay of the capped-session recurrence:
    events = [(event_id, user_id, ts_us)], returns {(user, event): n}."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, uid, ts in events:
        by_user[uid].append((ts, eid))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        cur, anchor, prev = 0, None, None
        for ts, eid in evs:
            if anchor is None or ts - prev >= gap_us or ts - anchor >= span_us:
                cur += 1
                anchor = ts
            prev = ts
            out[(uid, eid)] = cur
    return out


def test_sessionize_capped_differential_random_logs(spark):
    """300 random event logs' worth of cases in one Spark job: dense
    timestamps (many boundary-exact gaps — ts drawn on a coarse grid so
    exact-gap and exact-span collisions actually occur) across 30
    users, vs the Python recurrence."""
    import random

    from automated_property_data_ingestion_document_pipeline_spark.operators.sessionize import (
        sessionize_capped,
    )

    rng = random.Random(17)
    gap_min, span_min = 30, 120
    gap_us, span_us = gap_min * 60 * 10**6, span_min * 60 * 10**6
    base = 1_700_000_000 * 10**6
    events = []
    eid = 0
    for uid in range(30):
        t = base
        for _ in range(rng.randint(1, 60)):
            # grid of 10-minute steps: exact 30-min gaps and exact 2-h
            # spans are common, stressing the >= boundaries
            t += rng.choice([0, 1, 2, 3, 4, 6, 12, 18]) * 600 * 10**6
            events.append((eid, uid, t))
            eid += 1
    df = spark.createDataFrame(
        [(e, u, t) for e, u, t in events],
        "event_id bigint, user_id bigint, ts_us bigint",
    ).select(
        "event_id", "user_id", F.timestamp_micros("ts_us").alias("ts")
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_n"]
        for r in sessionize_capped(df, gap_minutes=gap_min, max_span_minutes=span_min).collect()
    }
    want = ref_sessionize_capped(events, gap_us, span_us)
    assert got == want
