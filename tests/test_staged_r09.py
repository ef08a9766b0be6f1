"""Round-8-queue continuation batch: sessionization, basket
co-occurrence, PSI drift, Mann-Kendall. Python replays pin the math
against the same parquet fixtures; oracle equivalence is
tools/check.py's job; plan shapes are pinned in test_plans.py."""

from __future__ import annotations

import itertools
import math
from collections import Counter, defaultdict

import pytest

from tests.conftest import SF_DIR

GAP_S = 21_600


def _events_pdf(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_id", "event_type", "value", "ts")
        .toPandas()
    )


def _replay_sessions(pdf):
    """Reference gaps-and-islands replay in plain python."""
    out = {}
    for uid, g in pdf.groupby("user_id"):
        g = g.assign(es=(g.ts.astype("int64") // 1_000_000_000))
        g = g.sort_values(["es", "event_id"])
        seq, prev = 0, None
        for r in g.itertuples():
            if prev is None or r.es - prev > GAP_S:
                seq += 1
            prev = r.es
            key = (uid, seq)
            s = out.setdefault(key, {"n": 0, "lo": r.es, "hi": r.es, "v": 0.0, "types": set()})
            s["n"] += 1
            s["lo"] = min(s["lo"], r.es)
            s["hi"] = max(s["hi"], r.es)
            s["v"] += r.value
            s["types"].add(r.event_type)
    return out


def test_sessionize_matches_python_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r09 import (
        w_sessionize,
    )

    rows = w_sessionize(spark, SF_DIR).collect()
    ref = _replay_sessions(_events_pdf(spark))
    assert len(rows) == len(ref)
    assert sum(r.n_events for r in rows) == sum(s["n"] for s in ref.values())
    for r in rows:
        s = ref[(r.user_id, r.session_seq)]
        assert r.n_events == s["n"]
        assert r.duration_s == s["hi"] - s["lo"]
        assert r.n_types == len(s["types"])
        assert abs(r.total_value - s["v"]) < 1e-4


def test_sessionize_gap_invariant(spark):
    """No session may contain an internal gap above the threshold, and
    consecutive sessions of one user must be separated by more."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r09 import (
        w_sessionize,
    )

    pdf = _events_pdf(spark)
    ref = _replay_sessions(pdf)
    # replay already enforces construction; assert the OUTPUT agrees on
    # session count per user with the independent gap census
    per_user = Counter(uid for uid, _ in ref)
    rows = w_sessionize(spark, SF_DIR).collect()
    got = Counter(r.user_id for r in rows)
    assert got == per_user


def test_rec_affinity_matches_python_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r09 import (
        _MINSUP,
        _TOPK,
        rec_item_affinity,
    )

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
    )
    baskets = defaultdict(set)
    for r in li.itertuples():
        baskets[r.l_orderkey].add(r.l_partkey)
    cooc = Counter()
    cnt = Counter()
    for items in baskets.values():
        for p in items:
            cnt[p] += 1
        for a, b in itertools.combinations(sorted(items), 2):
            cooc[(a, b)] += 1
    n_orders = float(len(baskets))
    recs = defaultdict(list)
    for (a, b), c in cooc.items():
        if c < _MINSUP:
            continue
        lift = round(c * n_orders / (cnt[a] * cnt[b]), 6)
        recs[a].append((c, lift, b))
        recs[b].append((c, lift, a))
    expected = {}
    for item, lst in recs.items():
        lst.sort(key=lambda t: (-t[0], -t[1], t[2]))
        for rnk, (c, lift, rec) in enumerate(lst[:_TOPK], 1):
            expected[(item, rec)] = (c, lift, rnk)

    rows = rec_item_affinity(spark, SF_DIR).collect()
    assert len(rows) == len(expected)
    for r in rows:
        c, lift, rnk = expected[(r.item, r.rec)]
        assert (r.cooc, r.rnk) == (c, rnk)
        assert abs(r.lift - lift) < 1e-9


def test_psi_drift_matches_python_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r09 import (
        _PSI_BINS,
        _PSI_SPLIT,
        _PSI_W,
        a_psi_drift,
    )

    pdf = _events_pdf(spark)
    split = __import__("pandas").Timestamp(_PSI_SPLIT)
    ref_counts = defaultdict(Counter)
    cur_counts = defaultdict(Counter)
    for r in pdf.itertuples():
        b = min(max(int(math.floor(r.value / _PSI_W)), 0), _PSI_BINS - 1)
        (ref_counts if r.ts < split else cur_counts)[r.event_type][b] += 1
    rows = {r.event_type: r for r in a_psi_drift(spark, SF_DIR).collect()}
    for et in set(ref_counts) | set(cur_counts):
        n_ref = sum(ref_counts[et].values())
        n_cur = sum(cur_counts[et].values())
        psi = 0.0
        for b in range(_PSI_BINS):
            p = (ref_counts[et][b] + 0.5) / (n_ref + _PSI_BINS / 2.0)
            q = (cur_counts[et][b] + 0.5) / (n_cur + _PSI_BINS / 2.0)
            psi += (p - q) * math.log(p / q)
        r = rows[et]
        assert (r.n_ref, r.n_cur) == (n_ref, n_cur)
        assert abs(r.psi - psi) < 1e-5
        assert r.psi >= 0.0  # every PSI term is (p-q)ln(p/q) >= 0


def test_mann_kendall_matches_python_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r09 import (
        a_mann_kendall,
    )

    pdf = _events_pdf(spark)
    pdf = pdf.assign(h=pdf.ts.astype("int64") // (3600 * 1_000_000_000))
    series = {
        et: sorted(
            (h, round(float(v), 6))
            for (h, v) in g.groupby("h").value.sum().items()
        )
        for et, g in pdf.groupby("event_type")
    }
    rows = {r.event_type: r for r in a_mann_kendall(spark, SF_DIR).collect()}
    assert set(rows) == set(series)
    for et, ser in series.items():
        ys = [y for _, y in ser]
        n = len(ys)
        s = sum(
            (0 if ys[j] == ys[i] else (1 if ys[j] > ys[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(ys)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        v = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(v)
        elif s < 0:
            z = (s + 1) / math.sqrt(v)
        else:
            z = 0.0
        r = rows[et]
        assert (r.n, r.s, r.n_pairs) == (n, s, n * (n - 1) // 2)
        assert abs(r.z - z) < 1e-5
        want = (
            "increasing" if z > 1.959964 else "decreasing" if z < -1.959964 else "no_trend"
        )
        assert r.trend == want


def test_mann_kendall_trend_labels_consistent(spark):
    """|z| and the verdict must agree row-by-row (guards the CASE
    duplication in both engines' expressions)."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r09 import (
        a_mann_kendall,
    )

    for r in a_mann_kendall(spark, SF_DIR).collect():
        if r.trend == "increasing":
            assert r.z > 1.959964
        elif r.trend == "decreasing":
            assert r.z < -1.959964
        else:
            assert -1.959964 <= r.z <= 1.959964
