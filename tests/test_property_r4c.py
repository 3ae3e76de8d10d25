"""Property tests for the session-2 wave: exact NTILE arithmetic on the
scalable global rank (operators/ranking.py) and the hop-bounded
Bellman-Ford MIN-fold (q_shortest_path's per-round pruning).

The NTILE model is checked two ways: hypothesis drives the pure integer
formula against the SQL NTILE definition for adversarial (n, k), and
one Spark run pins ranking.global_rank + ntile_expr bit-identical to
``F.ntile`` over a single-task window on shuffled input — proving the
parallel formulation IS the single-task semantics. The Bellman-Ford
model proves per-round per-node MIN pruning equals full walk
enumeration on random weighted graphs (the claim the DuckDB
recursive-CTE oracle checks on one fixed graph, here on many)."""

from __future__ import annotations

import itertools
import random

from hypothesis import HealthCheck, example, given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.operators import ranking


def _ntile_model(n: int, k: int) -> list[int]:
    """SQL NTILE(k) over n rows: first n%k buckets get n//k + 1 rows."""
    q, r = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (q + 1 if b <= r else q))
    return out


@given(st.integers(min_value=1, max_value=500), st.integers(min_value=1, max_value=20))
@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
def test_ntile_formula_matches_sql_definition(n, k):
    q, r = divmod(n, k)
    cut = r * (q + 1)
    model = _ntile_model(n, k)
    for rn in range(1, n + 1):
        if rn <= cut:
            b = (rn - 1) // (q + 1) + 1
        else:
            b = r + (rn - cut - 1) // max(q, 1) + 1
        assert b == model[rn - 1], (n, k, rn)


def test_global_rank_ntile_matches_window_ntile(spark):
    rnd = random.Random(7)
    rows = [(i, rnd.randrange(50)) for i in range(257)]  # heavy value ties
    df = spark.createDataFrame(rows, "id long, v long")
    ranked = ranking.global_rank(df, [F.col("v").asc(), F.col("id").asc()])
    n = F.lit(len(rows)).cast("bigint")
    got = {
        r.id: r.b
        for r in ranked.select(
            "id", ranking.ntile_expr(F.col("rn"), n, 7).alias("b")
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {r.id: r.b for r in df.select("id", F.ntile(7).over(w).alias("b")).collect()}
    assert got == want


def test_global_rank_invariant_to_partition_count(spark):
    rnd = random.Random(11)
    rows = [(i, rnd.randrange(9)) for i in range(101)]
    df = spark.createDataFrame(rows, "id long, v long")
    base = None
    for parts in (1, 3, 8):
        ranked = ranking.global_rank(
            df, [F.col("v").asc(), F.col("id").asc()], num_partitions=parts
        )
        got = sorted((r.id, r.rn) for r in ranked.collect())
        assert sorted(rn for _, rn in got) == list(range(1, 102))
        if base is None:
            base = got
        else:
            assert got == base, f"ranks changed at num_partitions={parts}"


def _sp_model(edges, seeds, max_hops):
    """Walk-enumeration model: min cost over ALL paths of ≤ max_hops
    edges (what the recursive-CTE oracle computes)."""
    best = {s: 0 for s in seeds}
    frontier = dict(best)
    for _ in range(max_hops):
        nxt = {}
        for node, cost in frontier.items():
            for (a, b), w in edges.items():
                if a == node:
                    c = cost + w
                    if c < nxt.get(b, 1 << 60):
                        nxt[b] = c
        for node, cost in nxt.items():
            if cost < best.get(node, 1 << 60):
                best[node] = cost
        frontier = nxt
    return best


@given(st.data())
@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
def test_bellman_ford_minfold_equals_walk_enumeration(data):
    rnd = random.Random(data.draw(st.integers(0, 10_000)))
    nodes = list(range(data.draw(st.integers(min_value=2, max_value=9))))
    edges = {}
    for a, b in itertools.permutations(nodes, 2):
        if rnd.random() < 0.4:
            edges[(a, b)] = rnd.randrange(1, 10)
    seeds = [n for n in nodes if n % 2 == 0][:2] or [nodes[0]]
    max_hops = 3

    # brute enumeration of every distinct walk ≤ max_hops
    brute = {s: 0 for s in seeds}
    walks = [(s, 0) for s in seeds]
    for _ in range(max_hops):
        nxt = []
        for node, cost in walks:
            for (a, b), w in edges.items():
                if a == node:
                    nxt.append((b, cost + w))
        for node, cost in nxt:
            if cost < brute.get(node, 1 << 60):
                brute[node] = cost
        walks = nxt

    assert _sp_model(edges, seeds, max_hops) == brute


def test_global_rank_unique_with_join_upstream(spark):
    """Regression: a broadcast join upstream of global_rank defeats
    exchange reuse, so the offsets aggregate and the final join used to
    re-sample repartitionByRange boundaries INDEPENDENTLY — _pid
    disagreement corrupted ranks (duplicates + gaps, found by
    q_equidepth_histogram at sf0.01). The lazy localCheckpoint inside
    global_rank pins one partitioning; this test fails without it."""
    rnd = random.Random(3)
    rows = [(i, rnd.randrange(40)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, v long")
    n_row = df.groupBy().agg(F.count("*").alias("_n"))
    ranked = ranking.global_rank(
        df.join(F.broadcast(n_row)), [F.col("v").asc(), F.col("id").asc()]
    )
    rns = [r.rn for r in ranked.select("rn").collect()]
    assert sorted(rns) == list(range(1, 5001))


def test_global_prefix_sum_matches_ordered_window(spark):
    rnd = random.Random(5)
    rows = [(i, rnd.randrange(100), rnd.randrange(-50, 50)) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, k long, x long")
    n_row = df.groupBy().agg(F.count("*").alias("_n"))
    got = {
        r.id: r.ps
        for r in ranking.global_prefix_sum(
            df.join(F.broadcast(n_row)),
            [F.col("k").asc(), F.col("id").asc()],
            "x",
            out_col="ps",
        ).collect()
    }
    w = (
        Window.orderBy(F.col("k").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {r.id: r.ps for r in df.select("id", F.sum("x").over(w).alias("ps")).collect()}
    assert got == want


def test_stream_multi_matches_batch_on_closed_windows(spark, sf_dir):
    """The chained dedup→window streaming query (q_stream_multi) must
    emit exactly the batch dedup→window counts for every window it
    closes, and must close every window whose end precedes the final
    watermark (max event time − 2 h). Append mode may legitimately
    withhold trailing still-open windows — nothing else."""
    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark import catalog
    from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

    got = {
        (r.bucket_start, r.event_type): r.n_events
        for r in QUERIES["q_stream_multi"](spark, sf_dir).collect()
    }
    ev = catalog.load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    batch = (
        ev.dropDuplicates(["event_id"])
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "event_type",
            "n_events",
        )
    )
    want = {
        (r.bucket_start, r.event_type): (r.n_events, r.bucket_end)
        for r in batch.collect()
    }
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    import datetime

    final_wm = max_ts - datetime.timedelta(hours=2)
    for key, n in got.items():
        assert key in want and want[key][0] == n, f"stream diverges at {key}"
    for key, (n, end) in want.items():
        if end <= final_wm:
            assert key in got, f"closed window {key} never emitted"


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
def test_clamped_balance_fold_model(deltas):
    """The clamp makes the balance recurrence non-associative: folding
    any prefix first then continuing must equal the full left fold
    (sequential consistency), and the result is always >= 0 and >= the
    unclamped suffix sum from the last zero-touch."""
    def fold(ds, init=0):
        acc = init
        for d in ds:
            acc = max(0, acc + d)
        return acc

    full = fold(deltas)
    assert full >= 0
    for cut in range(1, len(deltas)):
        assert fold(deltas[cut:], fold(deltas[:cut])) == full
    plain = 0
    for d in deltas:
        plain += d
    assert full >= max(0, plain)


def test_revenue_bridge_identity(spark, sf_dir):
    """start + new + expansion − contraction − churned == end, to the
    exact cent — the reconciliation identity the integer formulation
    guarantees and a floating-point bridge leaks on."""
    from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

    r = QUERIES["q_revenue_bridge"](spark, sf_dir).collect()[0]
    assert (
        r.starting_cents
        + r.new_cents
        + r.expansion_cents
        - r.contraction_cents
        - r.churned_cents
        == r.ending_cents
    )


@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=60),
)
@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
def test_ks_integer_cross_product_equals_float_cdf_sup(xs, ys):
    """The integer formulation max|cum_a*n_b - cum_b*n_a| / (n_a*n_b)
    equals the textbook sup|F_A - F_B| over the merged support — and
    being integer, it cannot miss the sup by a rounding epsilon."""
    from fractions import Fraction

    na, nb = len(xs), len(ys)
    support = sorted(set(xs) | set(ys))
    best = Fraction(0)
    best_int = 0
    for v in support:
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        best = max(best, abs(Fraction(ca, na) - Fraction(cb, nb)))
        best_int = max(best_int, abs(ca * nb - cb * na))
    assert Fraction(best_int, na * nb) == best


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-500, max_value=500),  # value
            st.integers(min_value=1, max_value=20),      # weight
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
def test_weighted_median_election_matches_expanded_median(pairs):
    """The grouped 2·cum_w ≥ tot_w election equals the lower median of
    the weight-EXPANDED multiset — the definition it compresses."""
    tot = sum(w for _, w in pairs)
    # election on the grouped representation
    agg = {}
    for v, w in pairs:
        agg[v] = agg.get(v, 0) + w
    cum = 0
    elected = None
    for v in sorted(agg):
        cum += agg[v]
        if 2 * cum >= tot:
            elected = v
            break
    # definition: lower median of the expanded multiset
    expanded = sorted(v for v, w in pairs for _ in range(w))
    lower_median = expanded[(len(expanded) - 1) // 2]
    assert elected == lower_median


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=0, max_value=100),
        ).map(lambda p: (min(p), max(p))),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@example(intervals=[(0, 0), (1, 1)])  # the discovered adjacency failure
def test_peak_concurrency_sweep_matches_brute_stabbing(intervals):
    """The +1/−1 sweep max (with end+1 exclusive bounds, −1-before-+1
    ties — an interval ending 1 unit before another starts is NOT
    overlap) equals brute-force max stabbing depth over CLOSED
    intervals. The +1-first variant overcounts exactly the adjacency
    case — the bug this test caught in q_peak_concurrency that the
    DuckDB oracle could not (both engines shared the tie order)."""
    # brute: for every candidate point (all endpoints), count covering
    points = sorted({p for s, e in intervals for p in (s, e)})
    brute = max(sum(1 for s, e in intervals if s <= p <= e) for p in points)
    # sweep: +1 at s, -1 at e + 1 (closed-interval exclusivity); the
    # sort keys order -1 BEFORE +1 at equal times
    events = []
    for s, e in intervals:
        events.append((s, 1, +1))
        events.append((e + 1, 0, -1))
    cur = peak = 0
    for _, _, d in sorted(events):
        cur += d
        peak = max(peak, cur)
    assert peak == brute


def test_minhash_portable_identical_docs_always_candidates(spark, sf_dir):
    """Semantic (not just cross-engine) check for the portable LSH
    pipeline: byte-identical documents have identical shingle sets ⇒
    identical signatures ⇒ every band matches ⇒ they MUST surface as a
    candidate pair with jaccard exactly 1.0 — zero false negatives for
    exact duplicates is the one guarantee banding makes."""
    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark import catalog
    from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["q_minhash_portable"](spark, sf_dir).collect()
    }
    docs = (
        catalog.load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()
    )
    import re

    def shingles(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    by_sh = {}
    for r in docs:
        sh = frozenset(shingles(r.text))
        if sh:
            by_sh.setdefault(sh, []).append(r.doc_id)
    exact_dup_pairs = [
        (min(a, b), max(a, b))
        for ids in by_sh.values()
        if len(ids) > 1
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    ]
    for pair in exact_dup_pairs:
        assert pair in out and out[pair] == 1.0, f"exact dup pair {pair} missed"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),  # duration
            st.booleans(),                           # event observed?
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
def test_kaplan_meier_at_risk_identity_and_bounds(subjects):
    """Semantic model for the KM plan: the prefix-complement at-risk
    count equals the direct definition #(T ≥ t), and the survival curve
    is in [0,1] and non-increasing."""
    from collections import Counter
    from fractions import Fraction

    d = Counter(t for t, ev in subjects if ev)
    c = Counter(t for t, ev in subjects if not ev)
    times = sorted(set(d) | set(c))
    n_total = len(subjects)
    removed = 0
    surv = Fraction(1)
    prev = Fraction(1)
    for t in times:
        n_at_risk = n_total - removed
        assert n_at_risk == sum(1 for tt, _ in subjects if tt >= t)
        surv *= 1 - Fraction(d.get(t, 0), n_at_risk)
        assert 0 <= surv <= 1 and surv <= prev
        prev = surv
        removed += d.get(t, 0) + c.get(t, 0)


def test_session2_metric_invariants(spark, sf_dir):
    """One pass of definitional invariants over the session's derived
    metrics — the properties that must hold regardless of data:
    Markov rows normalize to their prefix totals, Gini/diversity live
    in [0,1), Wilson bounds bracket p̂ inside [0,1], decile-lift
    cumulative counts are monotone, and ABC classes are monotone
    non-decreasing in rank order (A before B before C)."""
    from collections import defaultdict

    from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

    mk = QUERIES["q_markov_transitions"](spark, sf_dir).collect()
    by_prev = defaultdict(int)
    for r in mk:
        by_prev[r.prev_type] += r.n
    for r in mk:
        assert by_prev[r.prev_type] == r.n_from
        assert 0 < r.p <= 1

    g = QUERIES["q_gini_skew"](spark, sf_dir).collect()[0]
    assert 0 <= g.gini < 1

    for r in QUERIES["q_diversity_index"](spark, sf_dir).collect():
        assert 0 <= r.gini_impurity < 1
        assert r.sum_sq <= r.n_events * r.n_events

    for r in QUERIES["q_wilson_interval"](spark, sf_dir).collect():
        assert 0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1

    dl = sorted(QUERIES["q_decile_lift"](spark, sf_dir).collect(), key=lambda r: r.decile)
    for a, b in zip(dl, dl[1:]):
        assert b.cum_n > a.cum_n and b.cum_pos >= a.cum_pos

    abc = sorted(
        QUERIES["q_abc_classes"](spark, sf_dir).collect(),
        key=lambda r: (-r.rev_cents, r.l_partkey),
    )
    order = {"A": 0, "B": 1, "C": 2}
    classes = [order[r.abc_class] for r in abc]
    assert classes == sorted(classes), "ABC classes out of rank order"
