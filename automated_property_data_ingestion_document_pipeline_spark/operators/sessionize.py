"""Batch sessionization (SURVEY §2.7 T1): the wizard's keyed session
state machine (App.js:252, 286-310) as gap-based sessions over an event
log — the batch-SQL-expressible twin of the Structured Streaming
``session_window`` in streaming/sessions.py.

Plan shape: ONE shuffle on user_id; two window passes over the same
partitioning (lag → cumulative sum), which Spark executes in a single
sort per partition. Holds at 100 TB: sessions never cross keys, so the
partitioning is the natural one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_to_micros(series):
    """Exact integer micros from a pandas datetime series, whatever the
    Arrow→pandas resolution (ns today, us under pandas 2.x non-nano
    paths).  Hardcoding ``// 1000`` assumes ns — at us resolution every
    gap would shrink 1000× and sessionization silently collapses (the
    same 1000× hazard streaming/sessions.py documents; ADVICE r03)."""
    import numpy as np

    arr = series.to_numpy()
    if arr.dtype.kind != "M":  # tz-aware or object fallback → force ns
        arr = series.astype("datetime64[ns]").to_numpy()
    unit, _ = np.datetime_data(arr.dtype)
    per_unit_us = {"s": 1_000_000, "ms": 1_000, "us": 1}
    if unit in per_unit_us:
        return arr.astype("int64") * per_unit_us[unit]
    if unit == "ns":
        return arr.astype("int64") // 1_000
    raise ValueError(f"unsupported datetime64 resolution: {unit!r}")


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign ``session_id`` (1-based per key): a new session starts when
    the gap to the previous event reaches ``gap_minutes``.

    Boundary convention: the split predicate is ``gap >= gap_sec`` —
    Spark's streaming ``session_window`` closes a session at
    ``last_ts + gap`` *exclusive*, so an event exactly ``gap`` after the
    previous one starts a new session. The batch twin must agree on that
    boundary or the two forms diverge on exact-gap pairs.

    NULL-``ts`` rows are quarantined (dropped): they have no timeline
    position — matching the streaming twin, where an event without an
    event-time never enters a session window."""
    df = df.filter(F.col(ts).isNotNull())
    order = [F.col(ts).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(key).orderBy(*order)
    gap_sec = gap_minutes * 60
    # .cast("timestamp") first: TIMESTAMP_NTZ columns (plain micros
    # parquet) can't cast straight to double; LTZ→LTZ is a no-op
    sec = F.col(ts).cast("timestamp").cast("double")
    prev_sec = F.lag(ts).over(w).cast("timestamp").cast("double")
    is_new = (
        F.when(F.lag(ts).over(w).isNull(), 1)
        .when(sec - prev_sec >= gap_sec, 1)
        .otherwise(0)
    )
    cum = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(cum)
    ).drop("_new")


def session_summary(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: event count + bounds (the `q_sessionize`
    registration shape)."""
    s = sessionize(df, key, ts, id_col, gap_minutes)
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )


def session_summary_two_phase(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    chunk_hours: int = 24,
) -> DataFrame:
    """Hot-key-robust sessionization: segment-then-merge (r02 verdict
    #6). The single-pass form partitions the window on ``key`` alone, so
    a user owning 10 % of a 100 TB corpus puts 10 TB through ONE task —
    windows can't be salted (they need the full ordered per-key
    sequence) and AQE's skew split only handles joins/aggregates, not
    window sort partitions.

    Phase 1 partitions on ``(key, time-chunk)`` — the hot user's
    timeline spreads over #chunks tasks — and runs the same
    lag→cumsum sessionization WITHIN each chunk, rolling up local
    sessions to (start, end, n_events). Phase 2 re-applies the
    identical gap logic per ``key`` over the LOCAL SESSION rows
    (ordered by start; the gap to the previous local session's END is
    the exact inter-event gap the single pass saw across that
    boundary), merging sessions a chunk boundary split. Bit-identical
    to :func:`session_summary` — consecutive local sessions inside one
    chunk keep gap ≥ threshold by construction, so phase 2 merges
    exactly the boundary-split pairs; pinned by the shared
    `q_sessionize` oracle and tests/test_skew.py.

    Scale shape: phase 1 shuffles events on (key, chunk) — skew-free
    as long as one key's single chunk stays bounded (pick
    ``chunk_hours`` so rate × chunk fits a task). Phase 2 shuffles
    LOCAL SESSIONS on key: volume ≤ sessions + chunks-touched per key
    — orders of magnitude below event count for a hot key. Cost vs the
    single pass: one extra (cheap) shuffle — the 100 TB insurance
    premium."""
    df = df.filter(F.col(ts).isNotNull())
    gap_sec = gap_minutes * 60
    sec = F.col(ts).cast("timestamp").cast("double")
    chunk = F.floor(sec / (chunk_hours * 3600))

    # phase 1: sessionize within (key, chunk); same order + same gap
    # predicate as the single-pass form
    order = [F.col(ts).asc(), F.col(id_col).asc()]
    w1 = Window.partitionBy(key, "_chunk").orderBy(*order)
    prev_sec = F.lag(ts).over(w1).cast("timestamp").cast("double")
    is_new = (
        F.when(F.lag(ts).over(w1).isNull(), 1)
        .when(sec - prev_sec >= gap_sec, 1)
        .otherwise(0)
    )
    cum1 = Window.partitionBy(key, "_chunk").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = (
        df.withColumn("_chunk", chunk)
        .withColumn("_ls", F.sum(is_new).over(cum1))
        .groupBy(key, "_chunk", "_ls")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("_start"),
            F.max(ts).alias("_end"),
        )
    )

    # phase 2: same gap logic over local sessions (per key, ordered by
    # start — starts are distinct per key: same-ts events share a chunk
    # and thus a local session). Gap = this start − previous END.
    w2 = Window.partitionBy(key).orderBy(F.col("_start").asc())
    prev_end = F.lag("_end").over(w2).cast("timestamp").cast("double")
    start_sec = F.col("_start").cast("timestamp").cast("double")
    is_new2 = (
        F.when(F.lag("_end").over(w2).isNull(), 1)
        .when(start_sec - prev_end >= gap_sec, 1)
        .otherwise(0)
    )
    cum2 = Window.partitionBy(key).orderBy(F.col("_start").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        local.withColumn("session_id", F.sum(is_new2).over(cum2))
        .groupBy(key, "session_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("_start").alias("session_start"),
            F.max("_end").alias("session_end"),
        )
    )


def sessionize_capped(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    max_span_minutes: int = 120,
) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a maximum session
    span: a new session starts when the gap to the previous event
    reaches ``gap_minutes`` OR when the event is ``max_span_minutes``
    or more after the session's FIRST event (ad-attribution /
    security-audit session rules).

    This is the operator class that genuinely cannot be expressed with
    window functions: the split depends on the running session ANCHOR,
    which depends on every earlier split decision — a sequential
    recurrence, not a frame aggregate (lag/cumsum handles the gap rule
    alone, see :func:`sessionize`; the span cap makes it recursive).
    The Spark-first escape hatch is ``applyInPandas`` per key: state
    stays key-local (one shuffle on the key, the same partitioning the
    window form uses), the per-group loop is a linear scan, and
    executors never hold more than a group's events — exactly the
    bounded-state argument of the streaming state machine. The DuckDB
    oracle replays the identical recurrence as a recursive CTE, so the
    driver checks the sequential semantics value-for-value.

    Returns one row per event: (key, event_id, ts, session_n) with
    sessions numbered 1..k per key in time order; NULL-ts rows are
    quarantined as in :func:`sessionize`."""
    import numpy as np
    import pandas as pd

    # exact INTEGER micros, never float seconds: a boundary event exactly
    # gap/span away must split identically here and in the oracle's
    # date_diff('microsecond') arithmetic
    gap_us = gap_minutes * 60 * 1_000_000
    span_us = max_span_minutes * 60 * 1_000_000

    out_schema = f"{key} bigint, {id_col} bigint, {ts} timestamp, session_n int"

    # One Arrow stream per PARTITION, not one pandas frame per KEY:
    # applyInPandas was measured 5× slower here purely on per-group
    # overhead (1 500 users → 1 500 tiny frames at sf0.1). Instead:
    # shuffle once on the key, sort (key, ts, id) within partitions, and
    # run the recurrence with O(1) state carried across Arrow batch
    # boundaries (a key's events are contiguous within exactly one
    # partition, so closure state is safe).
    #
    # r04 rewrite of the recurrence (VERDICT r03 #8 — the per-row Python
    # loop was the suite's one super-linear-constant scaling outlier):
    # gap splits and session numbering are fully vectorized; the
    # sequential part of the recurrence is ONLY the span-cap anchor
    # chain, and Python touches it per-SPLIT (searchsorted jumps), and
    # only inside segments whose duration reaches the cap at all — for
    # real corpora (most sessions shorter than the cap) the scan is
    # pure numpy. Semantics are bit-identical to the naive per-row loop
    # (pinned by the recursive-CTE oracle + differential tests):
    #   new session at  u != prev_u  |  ts-prev >= gap  |  ts-anchor >= span
    def assign(batches):
        cur_user, cur, anchor, prev = None, 0, 0, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            uids = pdf[key].to_numpy()
            t = _ts_to_micros(pdf[ts])  # resolution-aware exact micros
            n = len(uids)
            new_user = np.empty(n, dtype=bool)
            new_user[0] = cur_user is None or uids[0] != cur_user
            new_user[1:] = uids[1:] != uids[:-1]
            prev_t = np.empty(n, dtype=np.int64)
            prev_t[0] = prev
            prev_t[1:] = t[:-1]
            is_start = new_user | (t - prev_t >= gap_us)
            starts = np.flatnonzero(is_start)
            inc = is_start.astype(np.int64)
            # segments = gap-delimited runs; the head (rows before the
            # first start) continues the carried session and anchor
            if len(starts) and starts[0] == 0:
                seg_s, anchors0 = starts, t[starts]
            else:
                seg_s = np.concatenate(([0], starts))
                anchors0 = np.concatenate(([anchor], t[starts]))
            seg_e = np.append(seg_s[1:], n)
            # span-cap anchor chains, only where the cap can fire
            needy = np.flatnonzero(t[seg_e - 1] - anchors0 >= span_us)
            track_anchor = anchors0[-1]
            for si in needy:
                s, e, a = int(seg_s[si]), int(seg_e[si]), int(anchors0[si])
                pos = s
                while True:
                    j = pos + int(
                        np.searchsorted(t[pos:e], a + span_us, side="left")
                    )
                    if j >= e:
                        break
                    inc[j] += 1
                    a = int(t[j])
                    pos = j + 1
                if si == len(seg_s) - 1:
                    track_anchor = a
            # per-user session numbers: running increment count, rebased
            # to 1 at each user's first row (head rebases to carried cur)
            c = np.cumsum(inc)
            base = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
            ufirst = np.flatnonzero(new_user)
            base[ufirst] = c[ufirst] - 1
            if not new_user[0]:
                base[0] = -cur
            base = np.maximum.accumulate(base)
            sess = c - base
            cur_user = uids[-1]
            prev = int(t[-1])
            cur = int(sess[-1])
            anchor = int(track_anchor)
            out = pdf[[key, id_col, ts]].copy()
            out["session_n"] = sess
            yield out

    return (
        df.filter(F.col(ts).isNotNull())
        .repartition(key)
        .sortWithinPartitions(key, ts, id_col)
        .mapInPandas(assign, out_schema)
    )
