"""In-engine logistic-regression training (operators/train.py,
queries/staged_r08.py): learning behavior, band-margin safety for the
cross-engine oracle, serving-path plan shape, and linear plan growth."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.train import (
    _sq_dist,
    kmeans_fit,
    kmeans_report,
    logreg_fit,
    logreg_logloss,
    logreg_predict,
)
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.plans import (
    explain,
)
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r08 import (
    _BAND,
    _KM_D,
    _KM_INIT,
    _KM_K,
    _KM_ROUNDS,
    _LR,
    _ROUNDS,
    FEATURES,
    KM_FEATURES,
    training_frame,
)

SF_DIR = "/root/testdata/sf0.001"


def _fit_report(spark):
    data = training_frame(spark, SF_DIR)
    w = logreg_fit(data, FEATURES, "y", lr=_LR, rounds=_ROUNDS)
    return data, w, logreg_logloss(data, w, FEATURES, "y").collect()[0].asDict()


def test_logreg_learns_the_planted_rule(spark):
    """The label is x1 + 2*x2 - x3 > 0: after 5 GD rounds the loss
    must have fallen from ln(2) (the w=0 starting loss) and the first
    three weights must point along (1, 2, -1)."""
    _, _, rep = _fit_report(spark)
    assert rep["logloss"] < math.log(2.0) - 0.02
    assert rep["w1"] > 0 and rep["w2"] > 0 and rep["w3"] < 0
    assert rep["w2"] > rep["w1"]  # the planted 2x coefficient dominates
    # the 5 distractor dims stay an order of magnitude smaller
    planted = abs(rep["w2"])
    assert all(abs(rep[f"w{i}"]) < planted / 2 for i in range(4, 9))


def test_logreg_band_margins_are_safe(spark):
    """g_pagerank_banded discipline: the 1e-6 quantization must not
    sit near a FLOOR boundary — measured margin >= 1e-2 band-widths
    (cross-engine summation noise is ~1e-9 band-widths)."""
    _, _, rep = _fit_report(spark)
    for k, v in rep.items():
        if k == "n":
            continue
        frac = (v * _BAND) % 1.0
        assert min(frac, 1.0 - frac) > 1e-2, (k, v, frac)


def test_logreg_fit_plan_is_jvm_partial_agg(spark):
    """Training stays JVM-side: no Python eval nodes, map-side partial
    aggregation per GD round, and the data side never shuffles (the
    only exchanges are the 1-row broadcasts and the 1-row reduces)."""
    data, w, _ = _fit_report(spark)
    plan = explain.physical_plan(w)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert explain.has_partial_aggregation(w)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_logreg_predict_is_map_only(spark):
    """Serving path: broadcast the 1-row weights, score in a map —
    no shuffle of the scored data, no Python."""
    data = training_frame(spark, SF_DIR)
    w = logreg_fit(data, FEATURES, "y", lr=_LR, rounds=2)
    scored = logreg_predict(data, w, FEATURES)
    plan = explain.physical_plan(scored)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # probabilities are probabilities
    row = scored.agg(F.min("p"), F.max("p")).collect()[0]
    assert 0.0 < row[0] and row[1] < 1.0


def test_logreg_plan_growth_is_linear(spark):
    """The single-row scalar-column iterate references each previous
    round once: plan STRING length must grow ~linearly in rounds, not
    double (CLAUDE.md lazy-fixpoint discipline)."""
    data = training_frame(spark, SF_DIR)
    sizes = []
    for r in (2, 4, 8):
        w = logreg_fit(data, FEATURES, "y", lr=_LR, rounds=r)
        sizes.append(len(explain.physical_plan(w)))
    g1 = sizes[1] / sizes[0]
    g2 = sizes[2] / sizes[1]
    assert g2 < g1 * 1.5 + 0.5, sizes  # doubling plans explode here
    assert sizes[2] < sizes[0] * 8, sizes


# ---------------------------------------------------------------------------
# k-means (train_kmeans_banded)
# ---------------------------------------------------------------------------


def _km_data(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )

    e = catalog.load(spark, SF_DIR, "embeddings")
    return e.select(
        *[
            F.element_at("embedding", j).cast("double").alias(f"x{j}")
            for j in range(1, _KM_D + 1)
        ]
    )


def test_kmeans_improves_and_is_nondegenerate(spark):
    """4 Lloyd rounds must strictly reduce within-cluster SSE vs the
    literal inits, and every cluster must stay populated."""
    data = _km_data(spark)
    c0 = kmeans_fit(data, KM_FEATURES, k=_KM_K, rounds=0, init=_KM_INIT)
    cf = kmeans_fit(
        data, KM_FEATURES, k=_KM_K, rounds=_KM_ROUNDS, init=_KM_INIT
    )
    r0 = kmeans_report(data, c0, KM_FEATURES, _KM_K).collect()[0].asDict()
    rf = kmeans_report(data, cf, KM_FEATURES, _KM_K).collect()[0].asDict()
    assert rf["sse"] < r0["sse"] * 0.95
    assert all(rf[f"n{i}"] > 0 for i in range(1, _KM_K + 1))


def test_kmeans_assignment_boundary_gap_is_safe(spark):
    """Cluster SIZES are compared integer-exact cross-engine, so the
    argmin must be decided by margins far above float noise: at every
    round (including the final report assignment) the closest point to
    a decision boundary keeps a best-vs-second-best squared-distance
    gap >= 1e-6, while cross-engine centroid noise is ~1e-13."""
    data = _km_data(spark)
    min_gap = None
    for r in range(0, _KM_ROUNDS + 1):
        cents = kmeans_fit(data, KM_FEATURES, k=_KM_K, rounds=r, init=_KM_INIT)
        j = data.crossJoin(F.broadcast(cents))
        arr = F.array_sort(
            F.array(*[_sq_dist(KM_FEATURES, i) for i in range(1, _KM_K + 1)])
        )
        gap = j.select((arr[1] - arr[0]).alias("g")).agg(F.min("g")).collect()[
            0
        ][0]
        min_gap = gap if min_gap is None else min(min_gap, gap)
    assert min_gap > 1e-6, min_gap


def test_kmeans_band_margins_are_safe(spark):
    """Centroid coordinates and SSE are 1e-6-banded: measured margin
    from every FLOOR boundary >= 1e-3 band-widths."""
    data = _km_data(spark)
    cf = kmeans_fit(
        data, KM_FEATURES, k=_KM_K, rounds=_KM_ROUNDS, init=_KM_INIT
    )
    rep = kmeans_report(data, cf, KM_FEATURES, _KM_K).collect()[0].asDict()
    for k, v in rep.items():
        if k.startswith("n"):
            continue
        frac = (v * _BAND) % 1.0
        assert min(frac, 1.0 - frac) > 1e-3, (k, v, frac)


def test_kmeans_plan_is_jvm_with_bounded_shuffle(spark):
    """Training is expression-only (no Python nodes); the per-round
    means shuffle carries at most k groups (partial aggregation on);
    plan growth over rounds stays linear (single-row iterate)."""
    data = _km_data(spark)
    cf = kmeans_fit(
        data, KM_FEATURES, k=_KM_K, rounds=_KM_ROUNDS, init=_KM_INIT
    )
    plan = explain.physical_plan(cf)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert explain.has_partial_aggregation(cf)
    sizes = []
    for r in (1, 2, 4):
        w = kmeans_fit(data, KM_FEATURES, k=_KM_K, rounds=r, init=_KM_INIT)
        sizes.append(len(explain.physical_plan(w)))
    assert sizes[2] < sizes[0] * 5, sizes


def test_logreg_artifact_serving_is_fit_free_and_margin_safe(spark):
    """train_logreg_artifact: after the 1-row weight artifact is
    written, the serving plan must be FIT-FREE (no aggregates — the 5
    training scans are gone) and map-only over the corpus; the 1e-4
    prediction bands keep a measured >=1e-4 band-width margin."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r08 import (
        _PBAND,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.train import (
        logreg_predict,
    )

    df = QUERIES["train_logreg_artifact"](spark, SF_DIR)
    plan = explain.physical_plan(df)
    # the artifact read replaced in-plan training: nothing to aggregate
    assert "HashAggregate" not in plan, plan[:2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    # margin of the served probabilities against the 1e-4 grid
    data = training_frame(spark, SF_DIR)
    w = logreg_fit(data, FEATURES, "y", lr=_LR, rounds=_ROUNDS)
    ps = [r.p for r in logreg_predict(data, w, FEATURES).select("p").collect()]
    m = min(min((p * _PBAND) % 1.0, 1.0 - (p * _PBAND) % 1.0) for p in ps)
    assert m > 1e-4, m


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """The COALESCE-to-previous rule: an init centroid placed far from
    every point must attract nothing and survive every round exactly
    where it started, while the others still update."""
    rows = [(0.0, 0.0), (0.1, 0.0), (0.0, 0.1), (1.0, 1.0), (1.1, 1.0)]
    df = spark.createDataFrame(rows, "x1 double, x2 double")
    far = [99.0, 99.0]
    init = [[0.0, 0.0], [1.0, 1.0], far]
    cents = kmeans_fit(df, ["x1", "x2"], k=3, rounds=3, init=init)
    row = cents.collect()[0].asDict()
    assert row["c3_1"] == far[0] and row["c3_2"] == far[1]
    # the live clusters moved to their group means
    assert abs(row["c1_1"] - 0.1 / 3) < 1e-12
    assert abs(row["c2_1"] - 1.05) < 1e-12
    rep = (
        kmeans_report(df, cents, ["x1", "x2"], 3).collect()[0].asDict()
    )
    assert rep["n3"] == 0 and rep["n1"] == 3 and rep["n2"] == 2


def test_logreg_degenerate_single_class_stays_finite(spark):
    """All-one-class labels: the gradient saturates toward +inf bias
    only in the limit — after finitely many rounds every weight must
    be finite and the predictions must approach 1."""
    rows = [(float(i % 3) / 3.0, 1.0) for i in range(12)]
    df = spark.createDataFrame(rows, "x1 double, y double")
    w = logreg_fit(df, ["x1"], "y", lr=4.0, rounds=6)
    row = w.collect()[0].asDict()
    assert all(math.isfinite(v) for v in row.values()), row
    ps = [
        r.p
        for r in logreg_predict(df, w, ["x1"]).select("p").collect()
    ]
    assert min(ps) > 0.9


def test_kmeans_single_point_converges_in_one_round(spark):
    """n=1: the point's cluster lands exactly on it; the other
    centroids never move (empty every round)."""
    df = spark.createDataFrame([(0.25, -0.5)], "x1 double, x2 double")
    init = [[0.0, 0.0], [5.0, 5.0]]
    cents = kmeans_fit(df, ["x1", "x2"], k=2, rounds=2, init=init)
    row = cents.collect()[0].asDict()
    assert row["c1_1"] == 0.25 and row["c1_2"] == -0.5
    assert row["c2_1"] == 5.0 and row["c2_2"] == 5.0


def _als_replay(ratings, rounds=2, lam=0.1):
    """numpy replay of operators/train.als_fit: per-key closed-form
    2x2 ridge solves from the same deterministic item-id init."""
    import numpy as np

    def solve(groups):
        out = {}
        for k, rows in groups.items():
            a11 = sum(f1 * f1 for f1, _, _ in rows) + lam
            a12 = sum(f1 * f2 for f1, f2, _ in rows)
            a22 = sum(f2 * f2 for _, f2, _ in rows) + lam
            b1 = sum(r * f1 for f1, _, r in rows)
            b2 = sum(r * f2 for _, f2, r in rows)
            det = a11 * a22 - a12 * a12
            out[k] = ((a22 * b1 - a12 * b2) / det, (a11 * b2 - a12 * b1) / det)
        return out

    def group(fixed_side, key_idx):
        g = {}
        for u, it, r in ratings:
            key = (u, it)[key_idx]
            fk = (u, it)[1 - key_idx]
            f1, f2 = fixed_side[fk]
            g.setdefault(key, []).append((f1, f2, r))
        return g

    itf = {
        it: (1.0 + (it % 7) * 0.1, 1.0 - (it % 5) * 0.1)
        for _, it, _ in ratings
    }
    uf = solve(group(itf, 0))
    for i in range(rounds):
        itf = solve(group(uf, 1))
        if i < rounds - 1:
            uf = solve(group(itf, 0))
    import math

    se = n = 0.0
    for u, it, r in ratings:
        p = uf[u][0] * itf[it][0] + uf[u][1] * itf[it][1]
        se += (r - p) ** 2
        n += 1
    return uf, itf, math.sqrt(se / n)


def _als_ratings(spark):
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return [
        (int(r.o_custkey), int(r.l_partkey), float(r.l_quantity))
        for r in li.join(
            o, li.l_orderkey == o.o_orderkey
        ).collect()
    ]


def test_als_matches_numpy_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.train import (
        als_fit,
    )

    ratings = _als_ratings(spark)
    want_uf, want_itf, want_rmse = _als_replay(ratings)
    df = spark.createDataFrame(ratings, ["u", "it", "r"])
    uf, itf = als_fit(df, iterations=2, lam=0.1)
    got_uf = {r.u: (r.u1, r.u2) for r in uf.collect()}
    got_itf = {r.it: (r.y1, r.y2) for r in itf.collect()}
    assert set(got_uf) == set(want_uf) and set(got_itf) == set(want_itf)
    for k, (w1, w2) in want_uf.items():
        assert abs(got_uf[k][0] - w1) < 1e-8 and abs(got_uf[k][1] - w2) < 1e-8
    for k, (w1, w2) in want_itf.items():
        assert (
            abs(got_itf[k][0] - w1) < 1e-8 and abs(got_itf[k][1] - w2) < 1e-8
        )
    # the factorization beats the trivial mean predictor (whose RMSE
    # is the rating sd) — the honest bar on TPC-H's near-random
    # quantities, where there is little structure to factor
    import statistics

    sd = statistics.pstdev([r for _, _, r in ratings])
    assert want_rmse < sd


def test_als_band_margins_are_safe(spark):
    """The three banded ALS diagnostics must sit far from their FLOOR
    boundaries (cross-engine summation noise is ~1e-9 band-widths)."""
    import math

    ratings = _als_ratings(spark)
    uf, itf, rmse = _als_replay(ratings)
    u_norm = sum(a * a + b * b for a, b in uf.values()) / len(uf)
    i_norm = sum(a * a + b * b for a, b in itf.values()) / len(itf)
    for val, scale, name in (
        (rmse, 1_000_000, "rmse"),
        (u_norm, 1_000, "u_norm_avg"),
        (i_norm, 1_000, "i_norm_avg"),
    ):
        frac = (val * scale) % 1.0
        assert min(frac, 1.0 - frac) > 1e-2, (name, val, frac)


def test_als_plan_growth_is_linear(spark):
    """Each half-round references the opposite iterate once: the plan
    string must not show the per-round doubling signature."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.train import (
        als_fit,
    )

    df = spark.createDataFrame([(1, 1, 2.0), (1, 2, 3.0)], ["u", "it", "r"])

    def plan_len(k):
        _, itf = als_fit(df, iterations=k)
        return len(itf._jdf.queryExecution().logical().toString())

    p2, p4, p6 = plan_len(2), plan_len(4), plan_len(6)
    assert p4 / p2 < 3.0, (p2, p4)
    assert p6 / p4 < 2.6, (p4, p6)


def test_als_recommend_matches_replay_and_gaps(spark):
    """Serving replay: numpy factors -> cohort x items banded scores,
    drop rated, top-5 per user (band desc, item asc). Also pins the
    band-edge safety of every OUTPUT row's prediction."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r08 import (
        als_recommend_topk,
    )

    rows = als_recommend_topk(spark, "/root/testdata/sf0.001").collect()
    ratings = _als_ratings(spark)
    uf, itf, _ = _als_replay(ratings)
    rated = {(u, it) for u, it, _ in ratings}
    want = {}
    for u in uf:
        if u % 100 != 0:
            continue
        cand = []
        for it, (y1, y2) in itf.items():
            if (u, it) in rated:
                continue
            pred = uf[u][0] * y1 + uf[u][1] * y2
            band = math.floor(pred * 10_000)
            # band-edge gap: the pre-floor value must sit clear of the
            # integer boundary (cross-engine noise ~1e-11 absolute)
            frac = (pred * 10_000) % 1.0
            assert min(frac, 1.0 - frac) > 1e-6, (u, it, pred)
            cand.append((band, it))
        cand.sort(key=lambda t: (-t[0], t[1]))
        want[u] = cand[:5]
    got = {}
    for r in rows:
        got.setdefault(r.u, []).append((r.rnk, r.pred_band, r.it))
    assert set(got) == set(want)
    for u, lst in got.items():
        lst.sort()
        assert [(b, it) for _, b, it in lst] == want[u], u
