"""Round-5 property models (the PERFORMANCE.md §50 discipline): the
DuckDB oracles for the big r4-s2 statistical composites are
TRANSLATIONS of the same algorithm, so a shared semantic error would
hash-match on every corpus. These hypothesis models re-derive each
statistic INDEPENDENTLY — brute force over the definition, not the
engines' optimized identity — and check the identity both engines
implement against it on adversarial small inputs.

Covered identities (query → engine formula → independent model):
- q_auc_exact: grouped U2 = Σ n_pos·(2·cum_neg_below + n_neg) vs
  brute pairwise AUC with half credit for score ties.
- q_ks_test: grouped |cum_a·n_b − cum_b·n_a| max vs brute
  sup over thresholds of |F_a − F_b| (scaled to integers).
- q_kaplan_meier: exclusive-prefix at-risk counts + running product vs
  direct per-time recomputation from the raw (duration, event) set.
- q_gini_skew: rank-sum identity (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) vs the
  O(n²) mean-absolute-difference definition Σ|xᵢ−xⱼ|/(2n·Σx).
- q_weighted_median: cum-weight rule (min v with 2·cumw ≥ totw) vs
  brute expansion of each value `weight` times.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

_SET = dict(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))


# ---------------------------------------------------------------- AUC


def _auc_engine(pairs: list[tuple[int, int]]) -> tuple[int, int, int]:
    """(u2, P, N) via the grouped Mann-Whitney identity both engines
    run: group by score ascending; u2 = Σ n_pos·(2·cum_neg_below +
    n_neg); AUC = u2 / (2·P·N)."""
    groups: dict[int, list[int]] = {}
    for score, label in pairs:
        groups.setdefault(score, []).append(label)
    u2 = 0
    cum_neg = 0
    for score in sorted(groups):
        labels = groups[score]
        n_pos = sum(labels)
        n_neg = len(labels) - n_pos
        u2 += n_pos * (2 * cum_neg + n_neg)
        cum_neg += n_neg
    P = sum(l for _, l in pairs)
    N = len(pairs) - P
    return u2, P, N


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 1)), min_size=1, max_size=60
    )
)
@settings(**_SET)
def test_auc_grouped_identity_matches_brute_pairwise(pairs):
    u2, P, N = _auc_engine(pairs)
    if P == 0 or N == 0:
        return  # query emits NULL-ish degenerate; identity untestable
    # brute: over all (pos, neg) pairs, 1 if pos>neg, 0.5 if tie (in
    # doubled units to stay integer-exact)
    brute2 = 0
    for sp, lp in pairs:
        if lp != 1:
            continue
        for sn, ln in pairs:
            if ln != 0:
                continue
            if sp > sn:
                brute2 += 2
            elif sp == sn:
                brute2 += 1
    assert u2 == brute2  # AUC = u2/(2PN) on both sides


# ----------------------------------------------------------------- KS


@given(
    st.lists(st.integers(0, 8), min_size=1, max_size=50),
    st.lists(st.integers(0, 8), min_size=1, max_size=50),
)
@settings(**_SET)
def test_ks_grouped_identity_matches_brute_sup(a, b):
    na, nb = len(a), len(b)
    ca, cb = Counter(a), Counter(b)
    # engine identity: walk the merged value domain with cumulative
    # counts; d = max |cum_a*n_b - cum_b*n_a|
    cum_a = cum_b = 0
    d_engine = 0
    for v in sorted(set(a) | set(b)):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        d_engine = max(d_engine, abs(cum_a * nb - cum_b * na))
    # brute: sup over EVERY integer threshold t of |#{a<=t}*nb - #{b<=t}*na|
    d_brute = 0
    for t in range(-1, 10):
        fa = sum(1 for x in a if x <= t)
        fb = sum(1 for x in b if x <= t)
        d_brute = max(d_brute, abs(fa * nb - fb * na))
    assert d_engine == d_brute


# ------------------------------------------------------- Kaplan-Meier


@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.booleans()), min_size=1, max_size=40
    )
)
@settings(**_SET)
def test_kaplan_meier_prefix_at_risk_matches_direct_recount(subjects):
    """Engine identity: at_risk(t) = total − Σ_{t'<t}(d+c) via an
    exclusive prefix sum over the distinct-time table; survival is the
    running product over event times. Independent model: recount
    at-risk directly from raw durations at every time."""
    times = sorted({t for t, _ in subjects})
    total = len(subjects)
    # engine side
    d = {t: sum(1 for tt, ev in subjects if tt == t and ev) for t in times}
    c = {t: sum(1 for tt, ev in subjects if tt == t and not ev) for t in times}
    prefix = 0
    surv_engine = {}
    s = 1.0
    for t in times:
        at_risk = total - prefix
        s *= 1.0 - d[t] / at_risk
        surv_engine[t] = s
        prefix += d[t] + c[t]
    # independent: at_risk(t) = #{duration >= t}; recompute product
    s2 = 1.0
    for t in times:
        at_risk = sum(1 for tt, _ in subjects if tt >= t)
        s2 *= 1.0 - d[t] / at_risk
        assert abs(s2 - surv_engine[t]) < 1e-12, t


# --------------------------------------------------------------- Gini


@given(st.lists(st.integers(1, 50), min_size=1, max_size=40))
@settings(**_SET)
def test_gini_rank_sum_identity_matches_mean_abs_difference(xs):
    n = len(xs)
    sx = sum(xs)
    xs_sorted = sorted(xs)
    # engine identity (ranks 1..n over ascending order, ties broken
    # arbitrarily — the identity is tie-stable because equal values
    # swap ranks without changing Σi·xᵢ... only when values equal)
    num_engine = 2 * sum((i + 1) * x for i, x in enumerate(xs_sorted)) - (n + 1) * sx
    # definition: Σᵢⱼ|xᵢ−xⱼ| / (2n·Σx) — compare numerators scaled by n·Σx
    mad = sum(abs(xi - xj) for xi in xs for xj in xs)
    assert num_engine * 2 == mad  # both over denominator n·Σx (·2 for the half-sum)


# ----------------------------------------------------- weighted median


@given(
    st.lists(
        st.tuples(st.integers(-20, 20), st.integers(1, 9)),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SET)
def test_weighted_median_cum_rule_matches_brute_expansion(items):
    # engine rule: group by value, ascending cum weights, answer =
    # MIN value with 2*cumw >= totw
    w = Counter()
    for v, wt in items:
        w[v] += wt
    tot = sum(w.values())
    cum = 0
    engine = None
    for v in sorted(w):
        cum += w[v]
        if 2 * cum >= tot:
            engine = v
            break
    # brute: expand and take the lower median element
    expanded = sorted(v for v, wt in items for _ in range(wt))
    brute = expanded[(len(expanded) - 1) // 2]
    assert engine == brute


# --------------------------------------------------- ABC / Pareto cut


@given(st.lists(st.integers(0, 1000), min_size=1, max_size=40))
@settings(**_SET)
def test_abc_integer_threshold_equals_exact_fraction_compare(revs):
    """q_abc_classes tests cum/tot ≤ 0.8 as 5·cum ≤ 4·tot (and 19/20
    for B) — integer cross-products with zero float ambiguity. Model:
    exact-fraction comparison with fractions.Fraction at the same
    boundaries, over the same desc-sorted cumulative."""
    from fractions import Fraction

    tot = sum(revs)
    if tot == 0:
        return
    cum = 0
    for rev in sorted(revs, reverse=True):
        cum += rev
        engine = (
            "A" if 5 * cum <= 4 * tot else "B" if 20 * cum <= 19 * tot else "C"
        )
        share = Fraction(cum, tot)
        model = (
            "A"
            if share <= Fraction(4, 5)
            else "B" if share <= Fraction(19, 20) else "C"
        )
        assert engine == model


# ------------------------------------------------- association rules


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 5)),  # (basket, item)
        min_size=1,
        max_size=60,
    )
)
@settings(**_SET)
def test_association_supports_match_brute_basket_scan(pairs):
    """q_association_rules computes supp(a), supp(b), supp(ab) via the
    distinct-membership self-join; model recounts every support by a
    direct scan over basket sets, and checks confidence/lift operand
    identity (the engines' one-division forms divide exactly these
    integers)."""
    baskets: dict[int, set[int]] = {}
    for bk, it in pairs:
        baskets.setdefault(bk, set()).add(it)
    n_baskets = len(baskets)
    items = sorted({i for s in baskets.values() for i in s})
    supp = {i: sum(1 for s in baskets.values() if i in s) for i in items}
    # engine-shaped pair counts via the membership self-join semantics
    memb = [(bk, it) for bk, s in baskets.items() for it in s]
    pair_counts = Counter()
    for bk, a in memb:
        for bk2, b in memb:
            if bk == bk2 and a < b:
                pair_counts[(a, b)] += 1
    for (a, b), supp_ab in pair_counts.items():
        brute = sum(1 for s in baskets.values() if a in s and b in s)
        assert supp_ab == brute
        # confidence/lift integer operands
        assert supp_ab <= supp[a] and supp_ab <= supp[b]
        assert supp_ab * n_baskets <= supp[a] * supp[b] * n_baskets
