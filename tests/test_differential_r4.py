"""Differential tests for the round-4 operator families: each Spark
operator is replayed against an obviously-correct pure-Python model on
seeded pseudo-random inputs (including tie/boundary shapes the corpus
may never produce). Complements the DuckDB oracles, which share SQL
semantics with Spark and could in principle share a blind spot."""

from __future__ import annotations

import random

from automated_property_data_ingestion_document_pipeline_spark.operators import cdc, intervals


def _merge_model(ivls):
    """Reference union-merge: sort by (start, tie), sweep with running
    max end; strictly-greater start opens a new island."""
    out = []
    for s, e in sorted(ivls):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def test_merge_intervals_matches_sweep_model(spark):
    rng = random.Random(42)
    rows = []
    for key in range(8):
        for i in range(60):
            s = rng.randrange(0, 500)
            rows.append((key, i, s, s + rng.randrange(0, 40)))
    # adversarial shapes: zero-length, touching, contained, duplicate
    rows += [
        (9, 0, 10, 10),  # zero-length
        (9, 1, 10, 20),
        (9, 2, 20, 30),  # touches previous end -> merges (closed ends)
        (9, 3, 21, 22),  # contained
        (9, 4, 40, 50),
        (9, 5, 40, 50),  # exact duplicate
        (9, 6, 51, 60),  # strictly after -> new island
    ]
    df = spark.createDataFrame(rows, "k long, tie long, s long, e long")
    merged = intervals.merge_intervals(df, "k", "s", "e", "tie")
    got = {}
    for r in merged.collect():
        got.setdefault(r.k, []).append([r.island_start, r.island_end])
    by_key = {}
    for k, _, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivls in by_key.items():
        assert sorted(got[k]) == _merge_model(ivls), f"key {k}"


def test_cdc_apply_matches_dict_replay(spark):
    rng = random.Random(7)
    base_rows = [(k, f"b{k}") for k in range(0, 30, 2)]
    changes = []
    for seq in range(200):
        k = rng.randrange(0, 40)
        op = rng.choice(["I", "U", "D"])
        changes.append((k, seq, op, f"v{seq}" if op != "D" else None))
    # dict model: replay in seq order; D removes, I/U set
    state = dict(base_rows)
    for k, seq, op, v in sorted(changes, key=lambda c: c[1]):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    # the operator collapses to the LATEST op per key then merges — for
    # keys never touched by the log the base survives; that's exactly
    # what sequential replay yields too (ops are last-write-wins)
    base = spark.createDataFrame(base_rows, "k long, v string")
    log = spark.createDataFrame(changes, "k long, seq long, op string, v string")
    out = {r.k: r.v for r in cdc.apply_changes(base, log, "k", ["seq"], "op", ["v"]).collect()}
    assert out == state


def test_merge_upsert_matches_dict_update(spark):
    rng = random.Random(3)
    t = {k: f"t{k}" for k in range(0, 50, 3)}
    s = {k: f"s{k}" for k in rng.sample(range(60), 20)}
    want = {**t, **s}
    target = spark.createDataFrame(list(t.items()), "k long, v string")
    source = spark.createDataFrame(list(s.items()), "k long, v string")
    got = {r.k: r.v for r in cdc.merge_upsert(target, source, "k", ["v"]).collect()}
    assert got == want
