"""Python-replay pins for the round-8-continuation closed-form
statistics (extending VERDICT r09 item 4 beyond the five named): the
differential check is blind to both-engines-same-construction bugs
(the Friedman lesson), so each test below recomputes the statistic
from an INDEPENDENT formulation — direct definitions, not the
queries' moment identities. The input grain (daily series, user
spans) may reuse the engine's aggregation helpers: the grain is
already differential-checked; the statistic algebra is what these
tests insure.
"""

import math

import numpy as np
from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
    QUERIES,
)
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r14 import (
    _daily,
)
from tests.conftest import SF_DIR


def _daily_series(spark):
    rows = _daily(spark, SF_DIR).collect()
    rows.sort(key=lambda r: r.day)
    return rows


def test_kendall_tau_replay(spark):
    """Direct O(n²) pair classification in numpy (the definition) vs
    the query's CASE-sum formulation."""
    r = QUERIES["a_kendall_tau"](spark, SF_DIR).collect()[0]
    d = _daily_series(spark)
    x = np.array([row.cnt for row in d], dtype=np.int64)
    y = np.array([row.xc for row in d], dtype=np.int64)
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(len(x), k=1)
    s = dx[iu] * dy[iu]
    nc = int((s > 0).sum())
    nd = int((s < 0).sum())
    tx = int(((dx[iu] == 0) & (dy[iu] != 0)).sum())
    ty = int(((dy[iu] == 0) & (dx[iu] != 0)).sum())
    txy = int(((dx[iu] == 0) & (dy[iu] == 0)).sum())
    n0 = len(s)
    assert (r.n_pairs, r.nc, r.nd) == (n0, nc, nd)
    assert (r.ties_x, r.ties_y) == (tx + txy, ty + txy)
    tau = (nc - nd) / math.sqrt((n0 - tx - txy) * (n0 - ty - txy))
    assert abs(r.tau_b - tau) <= 1.01e-6


def test_durbin_watson_replay(spark):
    """Direct demeaned form DW = Σ(Δx)²/Σ(x−x̄)² — not the query's
    one-pass moment identity for the denominator."""
    r = QUERIES["a_durbin_watson"](spark, SF_DIR).collect()[0]
    xs = [row.xc for row in _daily_series(spark)]
    mu = sum(xs) / len(xs)
    num = sum((b - a) ** 2 for a, b in zip(xs, xs[1:]))
    den = sum((v - mu) ** 2 for v in xs)
    assert r.n_days == len(xs)
    assert abs(r.dw - num / den) <= 2e-6 * max(1.0, abs(num / den))


def test_runs_test_replay(spark):
    """Direct fold: exact lower median, drop on-median days, count
    sign runs, Wald–Wolfowitz z."""
    r = QUERIES["a_runs_test"](spark, SF_DIR).collect()[0]
    d = _daily_series(spark)
    ordered = sorted((row.xc, row.day) for row in d)
    m = ordered[(len(ordered) + 1) // 2 - 1][0]
    signs = [row.xc > m for row in d if row.xc != m]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1))
    z = (runs - mu) / math.sqrt(var)
    assert (r.n_above, r.n_below, r.n_runs) == (n1, n2, runs)
    assert abs(r.z - z) <= 1.01e-6


def test_kruskal_wallis_replay(spark):
    """Direct midrank construction from the sorted pooled sample (the
    scipy-style definition) vs the query's window formulation."""
    r = QUERIES["a_kruskal_wallis"](spark, SF_DIR).collect()[0]
    rows = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    vals = sorted(row.o_totalprice for row in rows)
    # midrank per value from first/last positions in the sorted pool
    first: dict = {}
    last: dict = {}
    for i, v in enumerate(vals, start=1):
        first.setdefault(v, i)
        last[v] = i
    mid = {v: (first[v] + last[v]) / 2 for v in first}
    groups: dict = {}
    for row in rows:
        groups.setdefault(row.o_orderpriority, []).append(
            mid[row.o_totalprice]
        )
    n = len(rows)
    h = 12.0 / (n * (n + 1)) * sum(
        sum(g) ** 2 / len(g) for g in groups.values()
    ) - 3 * (n + 1)
    ties = sum(
        (last[v] - first[v] + 1) ** 3 - (last[v] - first[v] + 1)
        for v in first
    )
    hc = h / (1 - ties / (n**3 - n))
    assert (r.k, r.n) == (len(groups), n)
    assert abs(r.h - h) <= 2e-6 * max(1.0, abs(h))
    assert abs(r.h_corrected - hc) <= 2e-6 * max(1.0, abs(hc))


def test_xicor_replay(spark):
    """Direct tie-general Chatterjee ξ: sequence by (x, day), exact
    integer r_i/l_i by counting, num/den as exact ints."""
    r = QUERIES["a_xicor"](spark, SF_DIR).collect()[0]
    d = _daily_series(spark)
    seq = sorted(d, key=lambda row: (row.cnt, row.day))
    ys = [row.xc for row in d]
    n = len(ys)
    rs = [sum(1 for y in ys if y <= row.xc) for row in seq]
    ls = [sum(1 for y in ys if y >= row.xc) for row in seq]
    sum_dr = sum(abs(b - a) for a, b in zip(rs, rs[1:]))
    sum_l = sum(l * (n - l) for l in ls)
    assert r.n_days == n
    assert r.xi_den == 2 * sum_l
    assert r.xi_num == 2 * sum_l - n * sum_dr


def _spans(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", F.unix_timestamp("ts").alias("u")
    )
    per: dict = {}
    for row in e.collect():
        lo, hi = per.get(row.user_id, (row.u, row.u))
        per[row.user_id] = (min(lo, row.u), max(hi, row.u))
    mx = max(hi for _, hi in per.values())
    out = []
    for uid, (lo, hi) in per.items():
        out.append((uid, (hi - lo) // 3600, (mx - hi) >= 6 * 3600))
    return out


def test_log_rank_replay(spark):
    """Direct risk-set construction from per-user spans: at each
    death time, O−E and hypergeometric variance, running sums."""
    rows = sorted(
        QUERIES["a_log_rank"](spark, SF_DIR).collect(),
        key=lambda r: r.dur_h,
    )
    spans = _spans(spark)
    per: dict = {}
    for uid, dur, obs in spans:
        c, c1, d, d1 = per.get(dur, (0, 0, 0, 0))
        g1 = uid % 2 == 1
        per[dur] = (c + 1, c1 + g1, d + obs, d1 + (obs and g1))
    durs = sorted(per)
    want = []
    cum_oe = cum_var = 0.0
    for t in durs:
        c, c1, d, d1 = per[t]
        n_risk = sum(per[u][0] for u in durs if u >= t)
        n1_risk = sum(per[u][1] for u in durs if u >= t)
        if d == 0:
            continue
        cum_oe += d1 - n1_risk * d / n_risk
        if n_risk > 1:
            cum_var += (
                n1_risk * (n_risk - n1_risk) * d * (n_risk - d)
            ) / (n_risk**2 * (n_risk - 1))
        want.append((t, n_risk, n1_risk, d, d1, cum_oe, cum_var))
    assert len(rows) == len(want)
    for r, (t, n_risk, n1_risk, d, d1, oe, var) in zip(rows, want):
        assert (r.dur_h, r.n_risk, r.n1_risk, r.d, r.d1) == (
            t,
            n_risk,
            n1_risk,
            d,
            d1,
        )
        assert abs(r.cum_oe - oe) <= 1.01e-6 + 1e-9 * abs(oe)
        assert abs(r.cum_var - var) <= 1.01e-6 + 1e-9 * abs(var)


def test_greenwood_replay(spark):
    """Direct KM product + Greenwood cumulative variance from the
    same spans (single group) — the exp(Σln) reformulation is the
    query's; the replay multiplies the survival factors directly."""
    rows = sorted(
        QUERIES["a_greenwood_ci"](spark, SF_DIR).collect(),
        key=lambda r: r.dur_h,
    )
    spans = _spans(spark)
    per: dict = {}
    for _uid, dur, obs in spans:
        c, d = per.get(dur, (0, 0))
        per[dur] = (c + 1, d + obs)
    durs = sorted(per)
    want = []
    km = 1.0
    gw = 0.0
    for t in durs:
        c, d = per[t]
        n = sum(per[u][0] for u in durs if u >= t)
        if d == 0 or n <= d:
            continue
        km *= (n - d) / n
        gw += d / (n * (n - d))
        want.append((t, n, d, km, gw))
    assert len(rows) == len(want)
    for r, (t, n, d, km_, gw_) in zip(rows, want):
        assert (r.dur_h, r.n_risk, r.d) == (t, n, d)
        assert abs(r.km_survival - km_) <= 1.01e-6
        assert abs(r.greenwood_cumvar - gw_) <= 1.01e-6


def _user_convert(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "event_type", "value"
    )
    conv: dict = {}
    for row in e.collect():
        hit = row.event_type == "purchase" and row.value > 150
        conv[row.user_id] = conv.get(row.user_id, False) or hit
    return conv


def test_power_analysis_replay(spark):
    """Direct two-proportion sample-size formula with the shared z
    literals, from an independent user-level aggregation."""
    r = QUERIES["a_power_analysis"](spark, SF_DIR).collect()[0]
    conv = _user_convert(spark)
    a = {u for u in conv if (u * 2654435761) % 2**32 % 2 == 0}
    na, nb = len(a), len(conv) - len(a)
    ka = sum(conv[u] for u in a)
    kb = sum(conv[u] for u in conv if u not in a)
    pa, pb = ka / na, kb / nb
    assert (r.na, r.nb) == (na, nb)
    assert abs(r.rate_a - pa) <= 5.01e-5 and abs(r.rate_b - pb) <= 5.01e-5
    z2 = (1.959963984540054 + 0.8416212335729143) ** 2
    var2 = pa * (1 - pa) + pb * (1 - pb)
    assert r.n_req_mde == math.ceil(z2 * var2 / (0.02 * 0.02))
    if pa != pb:
        assert r.n_req_observed == math.ceil(z2 * var2 / (pa - pb) ** 2)


def test_odds_ratio_replay(spark):
    """Direct 2×2 cells + Woolf bounds from the same independent
    user-level aggregation."""
    r = QUERIES["a_odds_ratio"](spark, SF_DIR).collect()[0]
    conv = _user_convert(spark)
    exp = {u: (u * 2654435761) % 2**32 % 2 == 0 for u in conv}
    a = sum(1 for u in conv if exp[u] and conv[u])
    b = sum(1 for u in conv if exp[u] and not conv[u])
    c = sum(1 for u in conv if not exp[u] and conv[u])
    d = sum(1 for u in conv if not exp[u] and not conv[u])
    assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
    assert (r.or_num, r.or_den) == (a * d, b * c)
    ln_or = math.log((a * d) / (b * c))
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    z = 1.959963984540054
    assert abs(r.ln_or_lo - (ln_or - z * se)) <= 1.01e-6
    assert abs(r.ln_or_hi - (ln_or + z * se)) <= 1.01e-6


def test_shapley_linear_replay(spark):
    """Direct φᵢ = wᵢ(xᵢ−E[xᵢ]) + additivity from numpy means."""
    rows = QUERIES["a_shapley_linear"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    data = {row.vec_id: row.embedding[:3] for row in emb.collect()}
    m = np.mean(np.array(list(data.values()), dtype=np.float64), axis=0)
    w = (1.0, 2.0, -1.0)
    for r in rows:
        assert r.vec_id < 100
        x = data[r.vec_id]
        for got, wi, xi, mi in zip(
            (r.phi_x1, r.phi_x2, r.phi_x3), w, x, m
        ):
            assert abs(got - wi * (float(xi) - mi)) <= 1.1e-6
        assert r.additivity_ok


def test_pareto_coverage_replay(spark):
    """Direct ranked cumulative-share crossing from an independent
    user aggregation (float shares with exact-integer tie handling
    via the same cross-multiplication)."""
    r = QUERIES["a_pareto_coverage"](spark, SF_DIR).collect()[0]
    e = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "value"
    )
    vc: dict = {}
    for row in e.collect():
        cents = int(math.floor(row.value * 100 + 0.5))
        vc[row.user_id] = vc.get(row.user_id, 0) + cents
    ranked = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(v for _, v in ranked)
    run = 0
    k80 = k50 = None
    for i, (_u, v) in enumerate(ranked, start=1):
        run += v
        if k80 is None and run * 10 >= total * 8:
            k80 = i
        if k50 is None and run * 2 >= total:
            k50 = i
    assert (r.n_users, r.total_cents) == (len(ranked), total)
    assert (r.k80, r.k50) == (k80, k50)


def test_mcnemar_replay(spark):
    """Direct numpy replay of both centroid scorers (full + truncated)
    and the disagreement cells — the paired-test algebra is trivial,
    so the value here is re-deriving the PREDICTIONS independently."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r10 import (
        _POS_LABEL,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r14 import (
        _MRL_DIM,
    )

    r = QUERIES["a_mcnemar_test"](spark, SF_DIR).collect()[0]
    rows = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    ).collect()
    X = np.array([row.embedding for row in rows], dtype=np.float64)
    pos = np.array([row.label == _POS_LABEL for row in rows])
    cent = np.round(X[pos].mean(axis=0), 6)
    def score(mat, c):
        num = mat @ c
        den = np.sqrt((mat * mat).sum(axis=1)) * np.sqrt((c * c).sum())
        return np.round(num / den, 6)
    s_full = score(X, cent)
    s_tr = score(X[:, :_MRL_DIM], cent[:_MRL_DIM])
    a_ok = (s_full >= 0.0) == pos
    b_ok = (s_tr >= 0.0) == pos
    b = int((a_ok & ~b_ok).sum())
    c = int((~a_ok & b_ok).sum())
    assert r.n == len(rows)
    assert (r.b_cell, r.c_cell) == (b, c)
    assert r.mcnemar_num == (b - c) ** 2
    assert r.mcnemar_den == b + c
