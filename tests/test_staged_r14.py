"""Round-8 continuation batch: portable_arm's mixing contract (the
permutation-degeneracy fix), PAVA/BH invariants, and the sequential
statistics' exact-integer properties."""

import itertools

from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.functions.columns import (
    portable_arm,
    portable_bucket,
)
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
    QUERIES,
)
from tests.conftest import SF_DIR


def test_bucket2_is_parity_and_arm_is_not(spark):
    """Pin the found bug AND the fix: portable_bucket(k, 2) is the
    key's parity (odd multiplier x power-of-two modulus), so it must
    never be used for stride-shifted re-assignments; portable_arm
    breaks the linearity via the middle-square round."""
    df = spark.range(0, 512).select(
        F.col("id"),
        portable_bucket(F.col("id"), 2).alias("b2"),
        portable_arm(F.col("id")).alias("arm"),
    )
    rows = df.collect()
    # the bug: bucket-of-2 IS parity, for every key
    assert all(r.b2 == r.id % 2 for r in rows)
    # the fix: the arm is NOT parity (differs on a large fraction)
    diff = sum(1 for r in rows if r.arm != r.id % 2)
    assert 128 < diff < 384, diff
    # and is roughly balanced
    ones = sum(r.arm for r in rows)
    assert 192 < ones < 320, ones


def test_arm_decorrelates_stride_shifts(spark):
    """The permutation-test requirement: assignments drawn at
    (key + stride*b) for b = 0..B must not be sign flips of each
    other. For every pair of draws, the overlap with draw 0 must be
    strictly between 0% and 100% (parity gave exactly 0% or 100%)."""
    # B=32: at B=16 two user pairs legitimately collide on the full
    # 17-bit pattern (birthday bound ~0.15 expected over 19900 pairs
    # — a fair coin would collide too); 33 bits pushes the expected
    # count to ~0 so dup == 0 is a meaningful mixing assertion.
    B, users, stride = 32, 200, 7919
    df = (
        spark.range(0, users)
        .select(
            F.col("id"),
            F.explode(F.sequence(F.lit(0), F.lit(B))).alias("b"),
        )
        .select(
            "id",
            "b",
            portable_arm(
                F.col("id") + F.lit(99) + F.lit(stride) * F.col("b")
            ).alias("t"),
        )
    )
    pat = {}
    for r in df.collect():
        pat.setdefault(r.b, {})[r.id] = r.t
    for b in range(1, B + 1):
        overlap = sum(
            1 for u in range(users) if pat[0][u] == pat[b][u]
        )
        assert 0 < overlap < users, (b, overlap)
        # and no draw is near-degenerate: overlap well inside (0, n)
        assert 40 < overlap < 160, (b, overlap)
    # no two users share their full assignment pattern
    upat = {
        u: tuple(pat[b][u] for b in range(B + 1)) for u in range(users)
    }
    dup = sum(
        1 for a, c in itertools.combinations(range(users), 2)
        if upat[a] == upat[c]
    )
    assert dup == 0, dup


def test_permutation_null_is_not_degenerate(spark):
    """a_permutation_test's null must be a real distribution: the
    B permuted |d| values cannot all equal |d_obs| (the parity bug
    made n_extreme identically B)."""
    row = QUERIES["a_permutation_test"](spark, SF_DIR).collect()[0]
    assert 0 <= row.n_extreme < row.b_total, row


def test_bh_step_up_contract(spark):
    """BH: ranks are a permutation of 1..m; rejected is DOWNWARD
    closed in rank (if rank k is rejected, every rank < k is)."""
    rows = sorted(
        QUERIES["a_benjamini_hochberg"](spark, SF_DIR).collect(),
        key=lambda r: r.bh_rank,
    )
    m = len(rows)
    assert [r.bh_rank for r in rows] == list(range(1, m + 1))
    assert all(r.p_den == 101 for r in rows)
    assert all(1 <= r.p_num <= 101 for r in rows)
    seen_accept = False
    for r in rows:
        if not r.rejected:
            seen_accept = True
        assert not (seen_accept and r.rejected), rows


def test_isotonic_fit_is_monotone_and_bounded(spark):
    """PAVA output: fitted rates non-decreasing in bin order, each
    within [0, 1], every den > 0, and the fit preserves the total
    (sum of fit_num/fit_den weighted by n equals total positives —
    the PAVA mass-conservation property)."""
    rows = sorted(
        QUERIES["a_isotonic_calibration"](spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    assert rows, "no bins"
    prev = None
    total_fit = 0.0
    total_pos = 0
    for r in rows:
        assert r.fit_den > 0
        assert 0 <= r.fit_num <= r.fit_den, r
        v = r.fit_num / r.fit_den
        if prev is not None:
            assert v >= prev - 1e-12, rows
        prev = v
        assert r.mono_ok
        total_fit += v * r.n
        total_pos += r.n_pos
    assert abs(total_fit - total_pos) < 1e-6, (total_fit, total_pos)


def test_hodges_lehmann_between_min_and_max(spark):
    """HL estimate (hl_x4 / 4) must lie inside the daily-revenue
    range; n_pairs = n(n+1)/2 of the daily series."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r14 import (
        _daily,
    )

    d = _daily(spark, SF_DIR).agg(
        F.count("*").alias("n"),
        F.min("xc").alias("lo"),
        F.max("xc").alias("hi"),
    ).collect()[0]
    row = QUERIES["a_hodges_lehmann"](spark, SF_DIR).collect()[0]
    assert row.n_pairs == d.n * (d.n + 1) // 2
    hl = row.hl_x4 / 4.0
    assert d.lo <= hl <= d.hi


def test_gbt_rounds_reduce_training_sse(spark):
    """Boosting must help: replay the 3 fitted stumps over the data
    and check the training SSE is strictly non-increasing round over
    round (and strictly better than the constant-mean model by the
    end)."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r14 import (
        _GBT_MICRO,
        train_gbt_stumps,
    )

    model = {
        r.round: r for r in QUERIES["train_gbt_stumps"](spark, SF_DIR).collect()
    }
    assert set(model) == {1, 2, 3}
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .selectExpr(
            "cast(embedding[0] as double) x1",
            "cast(embedding[1] as double) x2",
            "cast(embedding[2] as double) x3",
        )
        .collect()
    )
    ys = [
        round((r.x1 + 2.0 * r.x2 - r.x3) * _GBT_MICRO) for r in rows
    ]
    mu = int(sum(ys) // len(ys))
    preds = [float(mu)] * len(rows)
    sses = [sum((y - p) ** 2 for y, p in zip(ys, preds))]
    for m in (1, 2, 3):
        b = model[m]
        x = {1: "x1", 2: "x2", 3: "x3"}[b.feature]
        for i, r in enumerate(rows):
            v = getattr(r, x)
            preds[i] += (
                b.leaf_l_micro if v <= b.threshold else b.leaf_r_micro
            )
        sses.append(sum((y - p) ** 2 for y, p in zip(ys, preds)))
    assert sses[3] < sses[0], sses
    for a, c in zip(sses, sses[1:]):
        assert c <= a * 1.0000001, sses  # non-increasing (float slack)


def test_mips_differs_from_cosine_and_is_exact(spark):
    """Verify the MIPS top-1 per query against a numpy replay. On
    THIS fixture the corpus is exactly unit-normalized (asserted
    below), so inner product and cosine coincide observationally —
    the query's distinct objective only shows on un-normalized
    factor tables; the replay pins that the reported score is the
    raw dot product."""
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=float)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.ip)
        for r in QUERIES["sim_mips_topk"](spark, SF_DIR).collect()
    }
    diffs = 0
    for q in range(10):
        ips = {
            c: round(float(emb[q] @ v), 6)
            for c, v in emb.items()
            if c != q
        }
        best_ip = min(sorted(ips.items(), key=lambda kv: (-kv[1], kv[0]))[:1])
        assert got[(q, 1)][0] == best_ip[0], (q, got[(q, 1)], best_ip)
        n1, ip1 = got[(q, 1)]
        assert abs(ip1 - round(float(emb[q] @ emb[n1]), 6)) < 1e-9
        diffs += 1
    # fixture property that makes IP == cosine here: unit norms
    norms = [np.linalg.norm(v) for v in emb.values()]
    assert max(abs(n - 1.0) for n in norms) < 1e-6


def test_cvar_bounds_and_sprt_consistency(spark):
    """CVaR tail mean must not exceed VaR (worst-tail average ≤ the
    tail boundary); SPRT decision fields must be mutually
    consistent."""
    r = QUERIES["a_cvar_daily"](spark, SF_DIR).collect()[0]
    assert r.m_tail >= 1
    assert r.tail_sum_cents <= r.var_cents * r.m_tail
    s = QUERIES["a_sprt"](spark, SF_DIR).collect()[0]
    if s.decision == "continue":
        assert s.decision_day == 0
    else:
        assert 1 <= s.decision_day <= s.n_days
        assert s.decision in ("accept_h0", "accept_h1")


def test_holt_winters_seasonal_state_sane(spark):
    """HW forecasts must vary ACROSS horizons by more than the linear
    trend alone (the seasonal state is live), and stay within a sane
    multiple of the series range."""
    rows = {
        r.horizon: r.forecast
        for r in QUERIES["a_holt_winters"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(range(1, 7))
    # consecutive-horizon differences under pure level+trend would be
    # CONSTANT (= b); with a live seasonal state they differ
    diffs = [rows[k + 1] - rows[k] for k in range(1, 6)]
    assert max(diffs) - min(diffs) > 1e-9, diffs


def test_binary_segmentation_split_ordering(spark):
    """The three changepoints must be distinct indices with cp2 left
    of cp1 and cp3 right of cp1 (the hierarchy is real)."""
    rows = {
        r.cp_id: r.split_idx
        for r in QUERIES["a_binary_segmentation"](spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[2] < rows[1] < rows[3], rows


def test_schema_evolution_nulls_are_counted(spark):
    """The merged read must surface the late-added column as NULL in
    old-writer files — n_null_disc equals the old batch's row count
    per flag and merged_ok holds everywhere."""
    rows = QUERIES["io_schema_evolution_checked"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.merged_ok, r
        assert 0 < r.n_null_disc < r.n, r


def test_srm_gate_consistency(spark):
    """SRM integers must be self-consistent and the alarm must match
    the integer cross-multiplication."""
    r = QUERIES["a_ab_srm"](spark, SF_DIR).collect()[0]
    assert r.srm_num == (r.na - r.nb) ** 2
    assert r.srm_den == r.na + r.nb
    assert r.srm_alarm == (r.srm_num * 1000 > 10828 * r.srm_den)


def test_url_dedup_collapses_sessions(spark):
    """Canonicalization must actually merge: every canonical URL key
    (orderkey mod 500 per shop) collects all its session-noised
    variants; total dupes equals the order count."""
    rows = QUERIES["dedup_url_canonical"](spark, SF_DIR).collect()
    total = sum(r.n_dupes for r in rows)
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert total == n_orders
    assert any(r.n_dupes > 1 for r in rows), "nothing collapsed"
    for r in rows:
        # the HOST is lowercased; the path keeps its case (URL paths
        # are case-sensitive — canonicalizing them would over-merge)
        host = r.curl.split("/", 1)[0]
        assert host == host.lower(), r.curl
        assert "?" not in r.curl and "utm" not in r.curl


def _friedman_q(table):
    """Pure-Python Friedman replay (ADVICE r08 high): midranks within
    each block, Q = (k-1)*sum_j(R_j - n(k+1)/2)^2 /
    sum_ij(r_ij - (k+1)/2)^2 (the tie-general form). Returns
    (q_num, q_den) on the doubled-midrank integer grid — 2*midrank is
    an exact integer, and doubling scales num and den by the same 4."""
    # table: {blk: {trt: v}}; every block must have the same treatments
    trts = sorted(next(iter(table.values())).keys())
    k = len(trts)
    n = len(table)
    two_rj = {t: 0 for t in trts}
    b2 = 0
    for blk, row in table.items():
        vals = sorted(row[t] for t in trts)
        for t in trts:
            v = row[t]
            r_min = 1 + sum(1 for x in vals if x < v)
            ties = sum(1 for x in vals if x == v)
            two_r = 2 * r_min + ties - 1
            two_rj[t] += two_r
            b2 += (two_r - (k + 1)) ** 2
    a2 = sum((two_rj[t] - n * (k + 1)) ** 2 for t in trts)
    return (k - 1) * a2, b2


def test_friedman_null_case_is_zero():
    """When every treatment's rank sum is equal, q_num must be 0 (the
    bug returned ~16.4 here: two_r lacked the doubling, so the
    'deviation' term measured tie structure, not treatment effect)."""
    # a latin-square-ish table: each treatment takes each rank once
    table = {
        1: {"a": 1.0, "b": 2.0, "c": 3.0},
        2: {"a": 2.0, "b": 3.0, "c": 1.0},
        3: {"a": 3.0, "b": 1.0, "c": 2.0},
    }
    q_num, q_den = _friedman_q(table)
    assert q_num == 0
    assert q_den > 0


def test_friedman_matches_textbook_no_ties():
    """No-tie case: Q must equal the classic
    12/(n*k*(k+1)) * sum R_j^2 - 3*n*(k+1) formula."""
    table = {
        1: {"a": 10.0, "b": 12.0, "c": 9.0},
        2: {"a": 11.0, "b": 15.0, "c": 8.0},
        3: {"a": 9.0, "b": 14.0, "c": 10.0},
        4: {"a": 13.0, "b": 16.0, "c": 12.0},
    }
    k, n = 3, 4
    # single midranks (no ties) for the textbook formula
    rj = {t: 0 for t in "abc"}
    for row in table.values():
        order = sorted(row, key=row.get)
        for i, t in enumerate(order):
            rj[t] += i + 1
    q_classic = 12.0 / (n * k * (k + 1)) * sum(
        v * v for v in rj.values()
    ) - 3.0 * n * (k + 1)
    q_num, q_den = _friedman_q(table)
    assert abs(q_num / q_den - q_classic) < 1e-12


def test_friedman_query_matches_python_replay(spark):
    """The registered query's integer pair must equal the pure-Python
    replay on the same cell table (mean value per weekday x
    event_type, rounded to the 1e-6 grid)."""
    r = QUERIES["a_friedman_test"](spark, SF_DIR).collect()[0]
    cells = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            F.dayofweek("ts").cast("long").alias("blk"),
            F.col("event_type").alias("trt"),
        )
        .agg(F.round(F.avg("value"), 6).alias("v"))
        .collect()
    )
    table = {}
    for c in cells:
        table.setdefault(c.blk, {})[c.trt] = c.v
    q_num, q_den = _friedman_q(table)
    assert (r.q_num, r.q_den) == (q_num, q_den)
    assert (r.n_blocks, r.k_treatments) == (
        len(table),
        len(next(iter(table.values()))),
    )
