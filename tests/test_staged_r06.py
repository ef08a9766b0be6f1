"""Round-6 queries (queries/staged_r06.py): property pins beyond the
differential check — the CMS guarantee, the OLS closed form vs numpy,
and the funnel's strict event ordering."""

from __future__ import annotations

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def test_cms_never_undercounts_and_bounds_error(spark):
    """The Count-Min guarantee: est ≥ exact for every key, and with
    w=64 the expected overcount is n/w per row — pin a generous
    deterministic ceiling so a hashing regression (correlated rows,
    broken seed mixing) fails here before it fails registration."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        a_cms_heavy_hitters,
    )

    rows = a_cms_heavy_hitters(spark, SF_DIR).collect()
    assert rows, "top-25 must be non-empty"
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    for r in rows:
        assert r.overcount >= 0, "CMS must never undercount"
        assert r.est_count == r.exact_count + r.overcount
        # 3 rows of width 64: overshooting 3 * n/w means the min over
        # rows is not working at all
        assert r.overcount <= 3 * n_events / 64


def test_ols_multivariate_matches_numpy_lstsq(spark):
    """The Cramer-solved centered normal equations must agree with
    numpy's QR-based lstsq on the same rows to ~1e-6 relative — the
    distributed closed form is exact, not an approximation."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        a_ols_multivariate,
    )

    got = {r.l_returnflag: r for r in a_ols_multivariate(spark, SF_DIR).collect()}
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    for flag, g in li.groupby("l_returnflag"):
        X = np.column_stack(
            [np.ones(len(g)), g.l_quantity.to_numpy(), g.l_discount.to_numpy()]
        )
        y = g.l_extendedprice.to_numpy()
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        r = got[flag]
        assert r.n == len(g)
        assert abs(r.beta_qty - beta[1]) <= 1e-3 + 1e-6 * abs(beta[1])
        assert abs(r.beta_disc - beta[2]) <= 1e-1 + 1e-6 * abs(beta[2])
        assert abs(r.intercept - beta[0]) <= 1e-1 + 1e-6 * abs(beta[0])
        pred = X @ beta
        r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert abs(r.r2 - r2) <= 1e-5


def test_funnel_stages_strictly_ordered(spark):
    """Stage timestamps must be strictly increasing where present, and
    the stage column must agree with which timestamps are populated —
    an unordered min (counting purchases before the first view) breaks
    the strictness assertion."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        w_funnel_conversion,
    )

    rows = w_funnel_conversion(spark, SF_DIR).collect()
    assert rows
    stages = {1: 0, 2: 0, 3: 0}
    for r in rows:
        assert r.view_epoch is not None
        assert r.stage == 1 + (r.click_epoch is not None) + (
            r.purchase_epoch is not None
        )
        if r.click_epoch is not None:
            assert r.click_epoch >= r.view_epoch
        if r.purchase_epoch is not None:
            assert r.purchase_epoch >= r.click_epoch
        stages[r.stage] += 1
    # the fixture stream is dense enough that every stage appears
    assert stages[3] > 0


def test_pca_power_matches_numpy_and_band_margin(spark):
    """The lazily-iterated top principal component must match numpy
    running the identical 6 rounds to ~1e-12, and every component must
    sit far from its 1e-4 band boundary (the g_pagerank_banded margin
    discipline: band edges are measured, not hoped for)."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        _PCA_GRID,
        _PCA_ROUNDS,
        emb_pca_power_banded,
    )

    got = {
        r.dim: r.comp_band
        for r in emb_pca_power_banded(spark, SF_DIR).collect()
    }
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()
    )
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    Xc = X - X.mean(0)
    G = Xc.T @ Xc
    v = np.full(X.shape[1], 0.125)
    for _ in range(_PCA_ROUNDS):
        w = G @ v
        v = w / np.linalg.norm(w)
    assert len(got) == X.shape[1]
    for i, vi in enumerate(v):
        assert got[i] == int(np.floor(vi * _PCA_GRID))
    # margin: nearest component-to-boundary distance must dwarf
    # cross-engine float noise (~1e-13 band-widths)
    frac = (v * _PCA_GRID) % 1.0
    margin = np.minimum(frac, 1.0 - frac).min()
    assert margin > 1e-4


def test_attribution_and_runs_invariants(spark):
    """Semantic pins for the analytics trio: every purchase row in the
    attribution output, channels are never 'purchase'; SCD2 run
    lengths partition each user's stream exactly; ACF is a valid
    correlation (|r| ≤ 1) with lag-monotone pair counts."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        a_autocorrelation,
        j_scd2_intervals,
        w_last_touch_attribution,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_purchases = ev.filter("event_type = 'purchase'").count()
    att = w_last_touch_attribution(spark, SF_DIR).collect()
    assert len(att) == n_purchases
    assert all(r.channel != "purchase" for r in att)

    runs = j_scd2_intervals(spark, SF_DIR).collect()
    assert sum(r.run_len for r in runs) == ev.count()
    assert all(r.run_end_epoch >= r.run_start_epoch for r in runs)

    acf = a_autocorrelation(spark, SF_DIR).collect()
    assert len(acf) == 6
    by_lag = {r.lag: r for r in acf}
    for k in range(1, 7):
        assert abs(by_lag[k].acf) <= 1.0
        # the hourly series has gaps, so pair counts are not monotone
        # in lag — but every lag must find a healthy pair population
        assert by_lag[k].n_pairs > 100


def test_classifier_score_is_exact_and_deterministic(spark):
    """The hash-derived linear model must reproduce a local numpy
    replay exactly (dyadic weights ⇒ order-independent sums), and
    prob must be the sigmoid of the unrounded score to 1e-6."""
    import hashlib
    import math

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.functions.columns import (
        KNUTH,
        M32,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        _CLF_DIM,
        _CLF_SEED,
        text_classifier_score,
    )

    got = {r.doc_id: r for r in text_classifier_score(spark, SF_DIR).collect()}
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )

    def bucket(key, n):
        km = key % M32
        lo = km % 65536
        hi = (km - lo) // 65536
        return ((hi * KNUTH) % M32 * 65536 + lo * KNUTH) % M32 % n

    checked = 0
    for d in docs:
        words = [w for w in d.text.lower().split() if w]
        if not words:
            assert d.doc_id not in got
            continue
        score = 0.0
        for w in words:
            idx = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % _CLF_DIM
            score += (bucket(idx + _CLF_SEED, 2001) - 1000) / 1024.0 / 16
        r = got[d.doc_id]
        assert r.n_terms == len(words)
        # Spark and DuckDB both round HALF AWAY FROM ZERO; python's
        # round() is banker's — replay with Decimal to match (dyadic
        # sums land exactly on 5e-7 halfway points, so this matters)
        from decimal import ROUND_HALF_UP, Decimal

        want = float(
            Decimal(repr(score)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        assert r.score == want
        assert abs(r.prob - 1.0 / (1.0 + math.exp(-score))) <= 2e-6
        checked += 1
    assert checked > 10


def test_sequence_pattern_counts_match_python_regex(spark):
    """Per-user symbol sequences and regex counts must match a python
    replay with the same (ts, event_id) total order."""
    import re

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        w_sequence_pattern,
    )

    got = {r.user_id: r for r in w_sequence_pattern(spark, SF_DIR).collect()}
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.event_type[0])
    assert set(got) == set(seqs)
    for u, syms in seqs.items():
        s = "".join(syms)
        assert got[u].seq_len == len(s)
        assert got[u].n_conversions == len(re.findall("vc*p", s))
        assert got[u].n_error_bursts == len(re.findall("ee+", s))


def test_round10_window_names_stay_driver_green():
    """Supersedes the round-10 rotation tripwire (which pinned these
    names INTO the first-50 window; the r11 rotation has since
    displaced them, as designed): the round-10 window names must stay
    registered + oracle-backed, and their driver-green rows must
    exist in the CORRECTNESS_r10 artifact — rotation never deletes
    evidence. The live-window composition itself is pinned in
    tests/test_registry_order.py."""
    import json
    import pathlib

    import end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries as qpkg

    art = json.loads(
        (pathlib.Path(__file__).resolve().parents[1] / "CORRECTNESS_r10.json")
        .read_text()
    )
    for n in (
        "a_spearman_corr",
        "a_kendall_tau",
        "a_friedman_test",
        "train_gbt_stumps",
        "emb_matryoshka_truncate",
        "dedup_url_canonical",
        "io_formats_roundtrip_checked",
        "a_mcnemar_test",
        "a_odds_ratio",
        "a13b_partsupp_expectations",
    ):
        assert n in qpkg.ORACLES
        row = art[n]
        assert row["rows_match"] and row["schema_match"] and row["hash_match"]


def test_classifier_table_weights_equal_expression_weights(spark):
    """The docstring claim made checkable: swapping the hash-derived
    weight EXPRESSION for a broadcast-joined 1024-row weights TABLE
    changes nothing — same scores, same plan family (broadcast hash
    join instead of inline arithmetic, still zero Python)."""
    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.functions.columns import (
        portable_bucket,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        _CLF_DIM,
        _CLF_SEED,
        text_classifier_score,
    )

    want = {r.doc_id: r.score for r in text_classifier_score(spark, SF_DIR).collect()}

    weights = spark.range(_CLF_DIM).select(
        SF.col("id").alias("idx"),
        (
            (portable_bucket(SF.col("id") + SF.lit(_CLF_SEED), 2001) - SF.lit(1000))
            / SF.lit(1024.0)
            / SF.lit(16)
        ).alias("w"),
    )
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = d.select(
        "doc_id", SF.explode(SF.split(SF.lower(SF.col("text")), r"\s+")).alias("word")
    ).filter(SF.length("word") > 0)
    idx = (
        SF.conv(SF.substring(SF.md5("word"), 1, 15), 16, 10).cast("long") % _CLF_DIM
    )
    tf = (
        words.select("doc_id", idx.alias("idx"))
        .groupBy("doc_id", "idx")
        .agg(SF.count("*").alias("cnt"))
    )
    got = {
        r.doc_id: r.score
        for r in tf.join(SF.broadcast(weights), "idx")
        .groupBy("doc_id")
        .agg(SF.round(SF.sum(SF.col("cnt") * SF.col("w")), 6).alias("score"))
        .collect()
    }
    assert got == want


def test_grouped_pca_matches_numpy_per_label_with_margin(spark):
    """Every label's banded component must equal a per-label numpy
    replay of the same 6 rounds, and the minimum distance-to-boundary
    across all 640 components must dwarf cross-engine noise."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        _PCA_GRID,
        _PCA_ROUNDS,
        emb_pca_by_label_banded,
    )

    got = {
        (r.label, r.dim): r.comp_band
        for r in emb_pca_by_label_banded(spark, SF_DIR).collect()
    }
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .select("label", "embedding")
        .toPandas()
    )
    margins = []
    n_labels = 0
    for label, g in emb.groupby("label"):
        X = np.stack(g["embedding"].to_numpy()).astype("float64")
        Xc = X - X.mean(0)
        G = Xc.T @ Xc
        v = np.full(X.shape[1], 0.125)
        for _ in range(_PCA_ROUNDS):
            w = G @ v
            v = w / np.linalg.norm(w)
        for i, vi in enumerate(v):
            assert got[(label, i)] == int(np.floor(vi * _PCA_GRID))
        frac = (v * _PCA_GRID) % 1.0
        margins.append(np.minimum(frac, 1.0 - frac).min())
        n_labels += 1
    assert n_labels == 10
    assert min(margins) > 1e-5


def test_weighted_sample_favors_weight_and_is_exact(spark):
    """Efraimidis–Spirakis sanity: the top-50 weighted sample must be
    reproducible against a python replay of the identical arithmetic,
    and its mean weight must exceed the corpus mean (that's what
    ∝-weight sampling is FOR)."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.functions.columns import (
        KNUTH,
        M32,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        p_weighted_sample,
    )

    got = p_weighted_sample(spark, SF_DIR).collect()
    assert len(got) == 50
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )

    def bucket(key):
        km = key % M32
        lo = km % 65536
        hi = (km - lo) // 65536
        return ((hi * KNUTH) % M32 * 65536 + lo * KNUTH) % M32

    keyed = []
    for d in docs:
        if d.n_chars <= 0:
            continue
        u = (bucket(d.doc_id + 9100017) + 1.0) / 4294967297.0
        keyed.append((round(u ** (1.0 / d.n_chars), 9), -d.doc_id, d))
    keyed.sort(reverse=True)
    want_ids = [k[2].doc_id for k in keyed[:50]]
    assert sorted(r.doc_id for r in got) == sorted(want_ids)

    mean_w = sum(r.weight for r in got) / len(got)
    corpus_mean = sum(d.n_chars for d in docs) / len(docs)
    assert mean_w > corpus_mean


def test_portable_simhash_agrees_with_production_on_strong_pairs(spark):
    """The md5-48-bit portable simhash and the xxhash64-64-bit
    production simhash are different hash families over the same
    algorithm — their CLOSE pairs must substantially agree: every
    production pair at Hamming ≤ 1/64 bits should sit at small
    distance in the portable signature too (algorithm parity, not
    hash parity)."""
    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        dedup,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        dedup_simhash_portable,
    )

    portable = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup_simhash_portable(spark, SF_DIR).collect()
    }
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(SF.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    prod = dedup.simhash_neardup_pairs(d, max_hamming=1).collect()
    assert prod, "fixture must contain strong near-dup pairs"
    hits = sum((r.id_a, r.id_b) in portable for r in prod)
    assert hits / len(prod) >= 0.9


def test_holt_forecasts_match_python_fold(spark):
    """Global and per-type Holt forecasts must equal a python replay
    of the identical dyadic recursion (bit-exact before the 6-dp
    HALF-UP grid), and horizon-k forecasts must be affine in k."""
    from decimal import ROUND_HALF_UP, Decimal

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        a_holt_forecast,
        a_holt_forecast_by_type,
    )

    def rnd(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def fold(xs):
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (level + trend)
            trend = 0.25 * (nl - level) + 0.75 * trend
            level = nl
        return level, trend

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    series = {}
    for r in ev:
        h = int(r.ts.timestamp() // 3600)
        series.setdefault(r.event_type, {}).setdefault(h, 0)
        series[r.event_type][h] += 1

    got_g = {r.horizon: r.forecast for r in a_holt_forecast(spark, SF_DIR).collect()}
    all_hours = {}
    for per_type in series.values():
        for h, n in per_type.items():
            all_hours[h] = all_hours.get(h, 0) + n
    lvl, tr = fold([float(all_hours[h]) for h in sorted(all_hours)])
    for k in range(1, 7):
        assert got_g[k] == rnd(lvl + k * tr)

    got_t = {
        (r.event_type, r.horizon): r.forecast
        for r in a_holt_forecast_by_type(spark, SF_DIR).collect()
    }
    for et, hs in series.items():
        lvl, tr = fold([float(hs[h]) for h in sorted(hs)])
        for k in range(1, 7):
            assert got_t[(et, k)] == rnd(lvl + k * tr)


def test_pca_projection_matches_numpy(spark):
    """The corpus-wide projection must band-match numpy's Xc·v with
    the component from the same 6-round fold."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        _PCA_GRID,
        _PCA_ROUNDS,
        emb_pca_project,
    )

    got = {r.vec_id: r.coord_band for r in emb_pca_project(spark, SF_DIR).collect()}
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .toPandas()
    )
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    Xc = X - X.mean(0)
    G = Xc.T @ Xc
    v = np.full(X.shape[1], 0.125)
    for _ in range(_PCA_ROUNDS):
        w = G @ v
        v = w / np.linalg.norm(w)
    coords = Xc @ v
    for vid, c in zip(emb["vec_id"], coords):
        assert got[vid] == int(np.floor(c * _PCA_GRID))


def test_ks_statistic_matches_scipy_style_replay(spark):
    """KS D from the dual-rank identity must equal the classic sorted
    two-pointer ECDF computation replayed in python."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        a_ks_test,
    )

    row = a_ks_test(spark, SF_DIR).collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    a = sorted(r.value for r in ev if r.event_type == "purchase")
    b = sorted(r.value for r in ev if r.event_type == "click")
    assert (row.n_a, row.n_b) == (len(a), len(b))
    pooled = sorted(set(a) | set(b))
    import bisect

    d = 0.0
    for v in pooled:
        fa = bisect.bisect_right(a, v) / len(a)
        fb = bisect.bisect_right(b, v) / len(b)
        d = max(d, abs(fa - fb))
    assert row.ks_d == round(d, 6)
    import math

    p = 2 * math.exp(-2 * d * d * len(a) * len(b) / (len(a) + len(b)))
    assert abs(row.p_approx - p) <= 2e-6


def test_mannwhitney_and_chi2_match_python_replay(spark):
    """U must equal the classic rank-sum computation and chi2 the
    direct contingency formula, both replayed in python."""
    import math

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        a_chi2_independence,
        a_mannwhitney_u,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()

    mw = a_mannwhitney_u(spark, SF_DIR).collect()[0]
    pooled = sorted(
        (r.value, r.event_type)
        for r in ev
        if r.event_type in ("purchase", "click")
    )
    # textbook MIDRANKS for ties (matches the ADVICE-r05 fix): each
    # tied-value block of size t gets rank (first+last)/2 and
    # contributes t^3 - t to the tie correction
    ra, tie3, i = 0.0, 0.0, 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        mid, t = (i + 1 + j) / 2.0, float(j - i)
        tie3 += t * t * t - t
        ra += mid * sum(1 for p in pooled[i:j] if p[1] == "purchase")
        i = j
    na = sum(1 for p in pooled if p[1] == "purchase")
    nb = len(pooled) - na
    u = ra - na * (na + 1) / 2.0
    assert (mw.n_a, mw.n_b, mw.u_stat) == (na, nb, round(u, 6))
    n = na + nb
    z = (u - na * nb / 2.0) / math.sqrt(
        na * nb / 12.0 * ((n + 1.0) - tie3 / (n * (n - 1.0)))
    )
    assert abs(mw.z - z) <= 2e-6

    c2 = a_chi2_independence(spark, SF_DIR).collect()[0]
    obs = {}
    for r in ev:
        k = (r.event_type, int(r.ts.timestamp() // 3600) % 24)
        obs[k] = obs.get(k, 0) + 1
    rows = {}
    cols = {}
    for (t, h), o in obs.items():
        rows[t] = rows.get(t, 0) + o
        cols[h] = cols.get(h, 0) + o
    n = sum(obs.values())
    chi2 = sum(
        (o - rows[t] * cols[h] / n) ** 2 / (rows[t] * cols[h] / n)
        for (t, h), o in obs.items()
    )
    assert c2.n == n
    assert c2.df == (len(rows) - 1) * (len(cols) - 1)
    assert abs(c2.chi2 - chi2) <= 2e-4


def test_triplet_mining_semantics(spark):
    """Positives share the anchor's label, negatives never do, the
    positive is the true same-label argmax, and a numpy replay agrees
    on every chosen id."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        sim_triplet_mining,
    )

    got = {r.anchor_id: r for r in sim_triplet_mining(spark, SF_DIR).collect()}
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    X = {r.vec_id: np.array(r.embedding, dtype="float64") for r in emb}
    lab = {r.vec_id: r.label for r in emb}

    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    for aid, r in got.items():
        assert lab[r.pos_id] == lab[aid]
        assert lab[r.neg_id] != lab[aid]
        sims_pos = sorted(
            (
                (-cos(X[aid], X[c]), c)
                for c in X
                if c != aid and lab[c] == lab[aid]
            )
        )
        sims_neg = sorted(
            (
                (-cos(X[aid], X[c]), c)
                for c in X
                if c != aid and lab[c] != lab[aid]
            )
        )
        assert r.pos_id == sims_pos[0][1]
        assert r.neg_id == sims_neg[0][1]
        assert r.margin == round(r.pos_sim - r.neg_sim, 6)


def test_token_budget_sample_semantics(spark):
    """Every source's kept set is a PREFIX of its hash permutation
    whose inclusive token sum never exceeds the budget, the budget
    genuinely binds (some docs dropped per source), and adding the
    next doc in the permutation would overshoot."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.functions.columns import (
        KNUTH,
        M32,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        p_token_budget_sample,
    )

    got = p_token_budget_sample(spark, SF_DIR).collect()
    assert got
    import re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    tok = {
        d.doc_id: len(re.findall(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]", d.text))
        for d in docs
    }

    def mixed(doc_id):
        km = (doc_id + 5500003) % M32
        lo = km % 65536
        hi = (km - lo) // 65536
        return ((hi * KNUTH) % M32 * 65536 + lo * KNUTH) % M32

    by_source = {}
    for d in docs:
        by_source.setdefault(d.source, []).append(d.doc_id)
    kept = {}
    for r in got:
        kept.setdefault(r.source, set()).add(r.doc_id)
        assert r.cum_tokens <= 800
        assert r.n_tokens == tok[r.doc_id]
    for src, ids in by_source.items():
        order = sorted(ids, key=lambda i: (mixed(i), i))
        cum, expect = 0, []
        for i in order:
            cum += tok[i]
            if cum > 800:
                break
            expect.append(i)
        assert kept.get(src, set()) == set(expect)
        assert len(expect) < len(ids), "budget must bind"


def test_crosscorrelation_symmetric_lags_and_bounds(spark):
    """CCF sanity: 7 lags, |r| ≤ 1 everywhere, and lag 0 equals the
    plain Pearson correlation of the two aligned series (python
    replay)."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        a_crosscorrelation,
    )

    got = {r.lag: r for r in a_crosscorrelation(spark, SF_DIR).collect()}
    assert set(got) == set(range(-3, 4))
    for r in got.values():
        assert abs(r.ccf) <= 1.0

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    series = {}
    for r in ev:
        if r.event_type not in ("click", "purchase"):
            continue
        h = int(r.ts.timestamp() // 3600)
        xy = series.setdefault(h, [0, 0])
        xy[0 if r.event_type == "click" else 1] += 1
    xs = [v[0] for v in series.values()]
    ys = [v[1] for v in series.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    import math

    r0 = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert got[0].n_pairs == n
    assert got[0].ccf == round(r0, 6)


def test_quantile_normalize_matches_python_and_preserves_order(spark):
    """Quantile matching invariants: within each source the transform
    is monotone in the original value, the normalized multiset is a
    rank-faithful resample of the global values, and a python replay
    of the integer midpoint mapping agrees row-for-row."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        p_quantile_normalize,
    )

    got = {r.doc_id: r for r in p_quantile_normalize(spark, SF_DIR).collect()}
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    g = sorted(docs, key=lambda d: (d.n_chars, d.doc_id))
    N = len(g)
    gval = {i + 1: d.n_chars for i, d in enumerate(g)}
    by_source = {}
    for d in docs:
        by_source.setdefault(d.source, []).append(d)
    for src, ds in by_source.items():
        ds.sort(key=lambda d: (d.n_chars, d.doc_id))
        ns = len(ds)
        prev = None
        for r, d in enumerate(ds, start=1):
            pos = ((2 * r - 1) * N + ns) // (2 * ns)
            assert got[d.doc_id].normalized == gval[pos]
            if prev is not None:
                assert got[d.doc_id].normalized >= prev
            prev = got[d.doc_id].normalized


def test_ks_and_mwu_match_textbook_definitions_under_ties(spark):
    """ADVICE r05: with cross-group value ties the dual-rank ECDF and
    raw rank-sum deviated from the textbook sup-gap / midrank
    definitions (both engines agreed, so the oracle couldn't catch
    it). Pin the fixed statistics against an independent numpy
    replay of the definitions — midranks, tie-corrected variance,
    ECDFs evaluated at distinct values — on the real events data,
    which DOES contain cross-group ties (asserted)."""
    import numpy as np
    from pyspark.sql import functions as F

    import end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries as qpkg

    sf_dir = "/root/testdata/sf0.001"
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("value", "event_type")
        .collect()
    )
    a = np.sort(np.array([r.value for r in ev if r.event_type == "purchase"]))
    b = np.sort(np.array([r.value for r in ev if r.event_type == "click"]))
    assert len(np.intersect1d(a, b)) > 0, "fixture lost its cross-group ties"

    # KS: sup over distinct pooled values of |F_a - F_b|
    vals = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, vals, side="right") / len(a)
    fb = np.searchsorted(b, vals, side="right") / len(b)
    d_want = np.abs(fa - fb).max()
    row = qpkg.QUERIES["a_ks_test"](spark, sf_dir).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.ks_d - round(d_want, 6)) < 1e-9

    # MWU: midranks + tie-corrected normal approximation
    pooled = np.concatenate([a, b])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sorted_vals = pooled[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    ra = ranks[: len(a)].sum()
    na, nb = len(a), len(b)
    n = na + nb
    u_want = ra - na * (na + 1) / 2.0
    _, t = np.unique(pooled, return_counts=True)
    tie3 = (t**3 - t).sum()
    var = na * nb / 12.0 * ((n + 1.0) - tie3 / (n * (n - 1.0)))
    z_want = (u_want - na * nb / 2.0) / np.sqrt(var)
    row = qpkg.QUERIES["a_mannwhitney_u"](spark, sf_dir).collect()[0]
    assert abs(row.u_stat - round(u_want, 6)) < 1e-6
    assert abs(row.z - round(z_want, 6)) < 1e-6
