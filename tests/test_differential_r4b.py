"""Differential tests for the second wave of round-4 families (stats,
time-series, retrieval, k-hop): pure-Python reference models on seeded
random inputs, plus the batch↔stream EWMA equality pin."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# -- EWMA ---------------------------------------------------------------------


def _ewma_model(xs):
    y = None
    for x in xs:
        y = float(x) if y is None else (y + float(x)) / 2.0
    return y


def test_ewma_fold_matches_python_model(spark):
    rng = random.Random(7)
    rows = []
    expect = {}
    for uid in range(6):
        xs = [rng.randrange(-10_000, 10_000) for _ in range(rng.randrange(1, 40))]
        expect[uid] = (_ewma_model(xs), len(xs))
        for i, x in enumerate(xs):
            rows.append((uid, i, i, x))  # ts == rn keeps the order explicit
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long, cents long")
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "cents")))
    got = (
        df.groupBy("user_id")
        .agg(arr.alias("evs"))
        .select(
            "user_id",
            F.size("evs").alias("n"),
            F.expr(
                "aggregate(slice(evs, 2, greatest(size(evs) - 1, 0)),"
                " cast(element_at(evs, 1).cents AS double),"
                " (acc, e) -> (acc + e.cents) / 2.0D)"
            ).alias("y"),
        )
        .collect()
    )
    assert len(got) == len(expect)
    for r in got:
        y, n = expect[r.user_id]
        assert r.n == n
        assert r.y == y, f"user {r.user_id}: {r.y} != {y}"  # exact, not approx


def test_stream_ewma_single_batch_equals_batch_key(spark):
    """availableNow on the one-file corpus = one micro-batch: the
    stateful stream fold must be BIT-identical to the batch fold."""
    batch = {
        (r.user_id): (r.n_events, r.ewma_cents)
        for r in QUERIES["q_ewma"](spark, SF_DIR).collect()
    }
    stream = {
        (r.user_id): (r.n_events, r.ewma_cents)
        for r in QUERIES["q_stream_ewma"](spark, SF_DIR).collect()
    }
    assert batch == stream


def test_stream_ewma_state_carries_across_batches():
    """Two micro-batches through the SHARED fold (the same function the
    streaming operator calls): the fold continues from carried state,
    matching one concatenated fold — and an out-of-order batch is
    re-sorted before folding."""
    import pandas as pd

    from automated_property_data_ingestion_document_pipeline_spark.streaming.sessions import (
        ewma_fold,
    )

    xs1, xs2 = [5, 9, 13], [21, 2]
    pdf1 = pd.DataFrame(
        {"user_id": [1] * 3, "event_id": [2, 0, 1], "ts": [2, 0, 1], "cents": [13, 5, 9]}
    )  # shuffled arrival order
    pdf2 = pd.DataFrame(
        {"user_id": [1] * 2, "event_id": [3, 4], "ts": [3, 4], "cents": xs2}
    )
    y, n = ewma_fold(pdf1, None, 0)
    assert (y, n) == (_ewma_model(xs1), 3)
    y, n = ewma_fold(pdf2, y, n)
    assert (y, n) == (_ewma_model(xs1 + xs2), 5)


# -- MAD outliers -------------------------------------------------------------


def _median2(xs):
    """2× the positional median (avg of the two middle order stats)."""
    s = sorted(xs)
    n = len(s)
    return s[(n + 1) // 2 - 1] + s[n // 2]


def test_mad_outliers_match_python_model(spark):
    rng = random.Random(13)
    rows = []
    for uid in range(5):
        base = rng.randrange(-500, 500)
        for i in range(rng.randrange(3, 50)):
            x = base + rng.randrange(-20, 20)
            if rng.random() < 0.08:
                x += rng.choice([-1, 1]) * rng.randrange(500, 2000)  # planted outliers
            rows.append((uid, len(rows), x))
    rows.append((7, len(rows), 42))  # singleton user: MAD undefined -> no flag
    df = spark.createDataFrame(rows, "user_id long, event_id long, cents long")

    # model
    by_user = {}
    for uid, eid, x in rows:
        by_user.setdefault(uid, []).append((eid, x))
    expect = set()
    for uid, evs in by_user.items():
        med2 = _median2([x for _, x in evs])
        dev2 = {eid: abs(2 * x - med2) for eid, x in evs}
        mad4 = _median2(list(dev2.values()))
        for eid, d in dev2.items():
            if 2 * d > 3 * mad4:
                expect.add((uid, eid))

    from automated_property_data_ingestion_document_pipeline_spark.plans import (
        queries_timeseries as qts,
    )

    # run the same window chain as q_mad_outliers over the synthetic df
    src = df.withColumn("ts", F.col("event_id"))
    import automated_property_data_ingestion_document_pipeline_spark.catalog as cat

    orig = cat.load
    try:
        cat.load = lambda _s, _d, _t: src.select(
            "user_id",
            "event_id",
            "ts",
            (F.col("cents") / F.lit(100.0)).alias("value"),
            F.lit("x").alias("event_type"),
            F.lit(None).cast("string").alias("props"),
        ).withColumn("ts", F.timestamp_micros(F.col("ts")))
        got = {
            (r.user_id, r.event_id)
            for r in qts.q_mad_outliers(spark, SF_DIR).collect()
        }
    finally:
        cat.load = orig
    assert got == expect


# -- BM25 ---------------------------------------------------------------------


def test_bm25_scores_match_python_model(spark):
    """Replays the full BM25 formula (floor-log2 idf, k1=1.2, b=0.75)
    on the sf0.001 corpus against a dict-based model."""
    docs = {
        r.doc_id: [t for t in r.text.split() if t]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if r.text is not None
    }
    tf = {}
    df_ = {}
    for d, toks in docs.items():
        seen = {}
        for t in toks:
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            tf[(d, t)] = c
            df_[t] = df_.get(t, 0) + 1
    n_docs = len([d for d, toks in docs.items() if toks])
    total = sum(len(t) for t in docs.values())
    avgdl = total / n_docs
    flog2 = lambda v: v.bit_length() - 1  # noqa: E731

    expect = {}
    for (d, t), c in tf.items():
        if c < 2:
            continue
        idf = float(flog2(n_docs) - flog2(df_[t]))
        doc_len = len(docs[d])
        score = idf * (c * 2.2) / (c + 1.2 * (0.25 + (0.75 * doc_len) / avgdl))
        expect[(d, t)] = round(score, 6)

    got = {
        (r.doc_id, r.tok): r.bm25
        for r in QUERIES["q_bm25"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for k in expect:
        assert math.isclose(got[k], expect[k], rel_tol=0, abs_tol=5e-7), (
            k,
            got[k],
            expect[k],
        )


# -- k-hop BFS ----------------------------------------------------------------

def test_khop_matches_bfs_model(spark):
    rng = random.Random(99)
    edges = set()
    for _ in range(300):
        a, b = rng.randrange(0, 120), rng.randrange(0, 120)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    seeds = [u for u, _ in edges if u % 10 == 0]
    # BFS to depth 3
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, 4):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.add(v)
        frontier = nxt

    df = spark.createDataFrame(sorted(edges), "u long, v long")
    und = df.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        df.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    sdf = df.filter(F.col("u") % 10 == 0).select(F.col("u").alias("node")).distinct()
    reached = sdf.select("node", F.lit(0).alias("dist"))
    frontier_df = reached
    for hop in range(1, 4):
        nxt_df = (
            frontier_df.join(und, frontier_df["node"] == und["src"])
            .select(F.col("dst").alias("node"), F.lit(hop).alias("dist"))
            .distinct()
        )
        reached = reached.unionAll(nxt_df)
        frontier_df = nxt_df
    got = {
        r.node: r.dist
        for r in reached.groupBy("node").agg(F.min("dist").alias("dist")).collect()
    }
    assert got == dist


# -- dup spans ----------------------------------------------------------------


def _tmp_docs_corpus(spark, tmp_path, rows):
    """Write (doc_id, text) rows as a real documents.parquet corpus —
    r12: q_dup_spans reads the persisted per-corpus anchor table, so
    these tests must feed it a REAL corpus directory (a monkeypatched
    catalog.load would band the injected frame under the true corpus'
    fingerprint and poison the shared table)."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [0] * len(rows),
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{sf}/documents.parquet"
    )
    return sf


def test_dup_spans_flags_shared_boilerplate(spark, tmp_path):
    """Two docs sharing an 8+-token boilerplate prefix must both carry
    dup mass; a unique doc must have dup_frac 0; short docs drop out."""
    boiler = "all your base are belong to us now"  # 8 tokens
    rows = [
        (1, boiler + " alpha beta gamma"),
        (2, boiler + " delta epsilon"),
        (3, "completely unrelated text with eight distinct tokens here ok"),
        (4, "too short"),
    ]
    from automated_property_data_ingestion_document_pipeline_spark.operators import bucketing
    from automated_property_data_ingestion_document_pipeline_spark.plans import (
        queries_text as qt,
    )

    sf = _tmp_docs_corpus(spark, tmp_path, rows)
    try:
        got = {r.doc_id: r for r in qt.q_dup_spans(spark, sf).collect()}
    finally:
        bucketing.drop_corpus_tables(spark, sf)
    assert 4 not in got  # < 8 tokens -> no shingles
    assert got[1].n_dup == 1 and got[2].n_dup == 1  # exactly the shared prefix
    assert got[3].n_dup == 0 and got[3].dup_frac == 0.0
    assert got[1].n_shingles == 4 and got[2].n_shingles == 3


@pytest.mark.parametrize("n_toks", [0, 1, 7, 8, 9])
def test_dup_spans_shingle_count_boundary(spark, n_toks, tmp_path):
    """sequence(1, n-7) descends for n<8 — the explicit gate must yield
    max(n-7, 0) shingles, never the phantom [1,0] positions."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import bucketing
    from automated_property_data_ingestion_document_pipeline_spark.plans import (
        queries_text as qt,
    )

    text = " ".join(f"t{i}" for i in range(n_toks))
    sf = _tmp_docs_corpus(spark, tmp_path, [(1, text)])
    try:
        rows = qt.q_dup_spans(spark, sf).collect()
    finally:
        bucketing.drop_corpus_tables(spark, sf)
    if n_toks < 8:
        assert rows == []
    else:
        assert rows[0].n_shingles == n_toks - 7


# -- delta join IVM -----------------------------------------------------------


def test_delta_join_equals_full_recompute_on_random_splits(spark):
    """Δ(A⋈B) algebra: for random insert-only splits of both sides, the
    maintained view must equal the from-scratch join exactly
    (multiset semantics — duplicates included)."""
    from collections import Counter

    from automated_property_data_ingestion_document_pipeline_spark.operators.cdc import (
        delta_join,
    )

    rng = random.Random(21)
    a_rows = [(rng.randrange(0, 20), i) for i in range(200)]
    b_rows = [(rng.randrange(0, 20), 1000 + i) for i in range(60)]
    # duplicate join keys on both sides → fan-out; some keys one-sided
    a = spark.createDataFrame(a_rows, "k long, av long")
    b = spark.createDataFrame(b_rows, "k long, bv long")
    a_old = a.filter(F.col("av") % 3 != 0)
    a_delta = a.filter(F.col("av") % 3 == 0)
    b_old = b.filter(F.col("bv") % 2 != 0)
    b_delta = b.filter(F.col("bv") % 2 == 0)
    view = a_old.join(b_old, "k").unionByName(
        delta_join(a_old, a_delta, b_old, b_delta, "k")
    )
    got = Counter((r.k, r.av, r.bv) for r in view.collect())
    want = Counter((r.k, r.av, r.bv) for r in a.join(b, "k").collect())
    assert got == want


# -- rolling slope ------------------------------------------------------------


def test_rolling_slope_matches_python_model(spark):
    rng = random.Random(31)
    rows = []
    for uid in range(4):
        for i in range(rng.randrange(3, 60)):
            rows.append((uid, i, i, rng.randrange(-500, 500)))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long, cents long")

    by_user = {}
    for uid, eid, _, c in rows:
        by_user.setdefault(uid, []).append(c)
    expect = {}
    for uid, ys in by_user.items():
        for i in range(len(ys)):
            w = ys[max(0, i - 19) : i + 1]
            xs = list(range(max(0, i - 19) + 1, i + 2))  # 1-based index
            n = len(w)
            if n < 3:
                continue
            sx, sy = sum(xs), sum(w)
            sxy = sum(a * b for a, b in zip(xs, w))
            sxx = sum(a * a for a in xs)
            expect[(uid, i)] = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)

    from pyspark.sql import Window

    seq = df.select(
        "user_id",
        "event_id",
        "cents",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("x").rowsBetween(-19, Window.currentRow)
    roll = seq.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("cents").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("cents")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    ).filter(F.col("n") >= 3)
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    got = {
        (r.user_id, r.event_id): r.slope
        for r in roll.select(
            "user_id",
            "event_id",
            F.round(
                (n_d * F.col("sxy") - sx_d * F.col("sy"))
                / (n_d * F.col("sxx") - sx_d * F.col("sx")),
                6,
            ).alias("slope"),
        ).collect()
    }
    assert got == expect


# -- link prediction ----------------------------------------------------------


def test_link_prediction_matches_brute_force(spark):
    rng = random.Random(55)
    edges = set()
    for _ in range(250):
        a, b = rng.randrange(0, 60), rng.randrange(0, 60)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in edges:
                continue
            cn = len(adj[u] & adj[v])
            if cn >= 3:
                expect[(u, v)] = cn

    ce = spark.createDataFrame(sorted(edges), "u long, v long")
    und = ce.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        ce.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    e1 = und.select(F.col("a").alias("w_a"), F.col("b").alias("mid"))
    e2 = und.select(F.col("a").alias("mid2"), F.col("b").alias("w_b"))
    wedges = (
        e1.join(e2, e1["mid"] == e2["mid2"])
        .filter(F.col("w_a") < F.col("w_b"))
        .select(F.col("w_a").alias("u"), F.col("w_b").alias("v"))
    )
    cn_df = wedges.groupBy("u", "v").agg(F.count("*").alias("cn"))
    got = {
        (r.u, r.v): r.cn
        for r in cn_df.join(ce, ["u", "v"], "left_anti")
        .filter(F.col("cn") >= 3)
        .collect()
    }
    assert got == expect


# -- k-means convergence invariants -------------------------------------------


def test_kmeans_converged_invariants(spark):
    """Lloyd invariants on the real corpus: sizes partition the vector
    set, inertia of the converged run ≤ inertia of the single step
    (monotone improvement), and the iteration count is honest."""
    step = {r.cluster_id: r for r in QUERIES["q_kmeans_step"](spark, SF_DIR).collect()}
    conv = QUERIES["q_kmeans_converged"](spark, SF_DIR).collect()
    n_vecs = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    )
    assert sum(r.n_assigned for r in conv) == n_vecs
    assert sum(r.n_assigned for r in step.values()) == n_vecs
    assert sum(r.inertia for r in conv) <= sum(r.inertia for r in step.values())
    iters = {r.n_iterations for r in conv}
    assert len(iters) == 1 and 1 <= iters.pop() <= 6
