"""Distributed in-engine model TRAINING (full-batch gradient descent).

The engine already *serves* models — text_classifier_score's sparse
matmul inference, emb_centroid_classify's nearest-centroid scoring,
the PCA projection apply — but until this module every set of learned
weights arrived from outside the engine (or from the sanctioned eager
quantizer seam). ``logreg_fit`` trains a binary logistic-regression
classifier INSIDE the lazy DataFrame algebra:

- the weight vector is carried as a SINGLE-ROW DataFrame of ``d+1``
  scalar columns (the :mod:`.linalg` ``power_iteration`` discipline:
  each GD round references the previous round's weights exactly once,
  via a 1-row broadcast cross join, so total plan depth grows
  LINEARLY in ``rounds`` — never the 2^rounds double-reference shape
  that OOM'd explainString, see CLAUDE.md "lazy fixpoints");
- each round is ONE whole-stage-codegen aggregate over the data:
  ``w_j += lr * AVG((y - sigmoid(w.x + b)) * x_j)`` — the gradient of
  the mean log-loss — computed with map-side partial aggregation and
  a 1-row reduce. No Python UDFs, no collect, no shuffle of the data
  itself; ``rounds`` scans of the input are the whole cost.

100 TB contract: per-round state is ``d+1`` doubles and per-round
cost is one scan + one partial-agg reduce — the same shape as a
``SELECT AVG(...)``; skew is irrelevant (no key), and the scans
pipeline through whatever pruned projection the caller passes in.
This is full-batch GD, the deterministic choice for a replayable
cross-engine oracle (an unrolled-CTE DuckDB twin runs the SAME
``rounds`` updates — the g_pagerank_banded convention); minibatch SGD
would need an ordering contract no distributed scan honors.

Features are passed as explicit numeric COLUMNS (cast to double by
the caller): with small ``d`` the z-expression stays a flat codegen'd
sum; an array-typed variant would force per-element aggregates Spark
lacks natively. The trained 1-row weights DataFrame feeds
``logreg_predict`` (map-only broadcast apply — the serving path) and
``logreg_logloss`` (fit diagnostic).
"""

from __future__ import annotations

import math
import operator
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _z(feature_cols: list[str]):
    """w.x + b as a flat left-associated sum — the SAME association
    order the unrolled SQL twin spells, so both engines run
    bit-identical double arithmetic per row."""
    terms = [
        F.col(f"w{i}") * F.col(c) for i, c in enumerate(feature_cols, start=1)
    ]
    return reduce(operator.add, terms) + F.col("b")


def _sigmoid(z):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 4.0,
    rounds: int = 5,
) -> DataFrame:
    """Train binary logistic regression by ``rounds`` full-batch GD
    steps from w=0; returns the 1-row weights DataFrame with columns
    ``w1..wd, b`` — entirely lazy (no job runs until the result is
    consumed).

    ``label_col`` must be 0.0/1.0 doubles. Fixed ``rounds`` (not a
    convergence test) keeps the computation replayable by an
    unrolled-CTE oracle and the plan size known in advance.
    """
    spark = df.sparkSession
    wrow = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{i}") for i in range(1, len(feature_cols) + 1)],
        F.lit(0.0).alias("b"),
    )
    for _ in range(rounds):
        joined = df.crossJoin(F.broadcast(wrow))
        resid = F.col(label_col) - _sigmoid(_z(feature_cols))
        wrow = joined.agg(
            *[
                (F.first(f"w{i}") + F.lit(lr) * F.avg(resid * F.col(c))).alias(
                    f"w{i}"
                )
                for i, c in enumerate(feature_cols, start=1)
            ],
            (F.first("b") + F.lit(lr) * F.avg(resid)).alias("b"),
        )
    return wrow


def _sq_dist(feature_cols: list[str], ci: int):
    """Squared distance of the row's features to centroid ``ci`` —
    left-associated sum of squared differences, spelled identically by
    the SQL twin."""
    terms = [
        (F.col(c) - F.col(f"c{ci}_{j}")) * (F.col(c) - F.col(f"c{ci}_{j}"))
        for j, c in enumerate(feature_cols, start=1)
    ]
    return reduce(operator.add, terms)


def _assign(feature_cols: list[str], k: int):
    """argmin-by-distance cluster id with a deterministic lowest-index
    tie-break: cluster i wins when its distance is <= every later
    centroid's distance — the exact CASE chain the SQL twin spells, so
    assignments are bit-identical cross-engine (distances are the same
    left-associated double expressions)."""
    dists = [_sq_dist(feature_cols, i) for i in range(1, k + 1)]
    expr = F.lit(k)
    # build WHEN chain back to front so earlier centroids take priority
    for i in range(k - 1, 0, -1):
        cond = reduce(
            operator.and_,
            [dists[i - 1] <= dists[j] for j in range(i, k)],
        )
        expr = F.when(cond, F.lit(i)).otherwise(expr)
    return expr


def kmeans_fit(
    df: DataFrame,
    feature_cols: list[str],
    k: int,
    rounds: int,
    init: list[list[float]],
) -> DataFrame:
    """Lloyd's k-means by ``rounds`` fixed iterations, fully lazy.

    Centroids are carried as a SINGLE-ROW DataFrame of ``k*d`` scalar
    columns ``c{i}_{j}`` (the logreg_fit / power_iteration linear-
    plan-growth discipline). Each round: one broadcast cross join to
    assign every row to its nearest centroid (codegen'd CASE chain —
    no UDFs), one ``groupBy(cluster)`` partial-agg shuffle of at most
    ``k`` groups for the means, and one ``k``-row collapse back to the
    single centroid row; empty clusters keep their previous centroid
    (COALESCE with the carried-through values, which references the
    previous round zero extra times).

    ``init`` must be explicit (k rows of d floats): deterministic
    literal starts are what make the computation replayable by the
    unrolled-CTE oracle — data-dependent seeding (kmeans++) belongs to
    the caller if wanted, at the cost of oracle replayability.
    100 TB shape: per-round state is k*d doubles; the assign scan
    pipelines; the means shuffle carries k groups regardless of data
    size (map-side partials collapse each partition to <= k rows).
    """
    d = len(feature_cols)
    assert len(init) == k and all(len(r) == d for r in init)
    spark = df.sparkSession
    wrow = spark.range(1).select(
        *[
            F.lit(float(init[i - 1][j - 1])).alias(f"c{i}_{j}")
            for i in range(1, k + 1)
            for j in range(1, d + 1)
        ]
    )
    ccols = [f"c{i}_{j}" for i in range(1, k + 1) for j in range(1, d + 1)]
    for _ in range(rounds):
        assigned = df.crossJoin(F.broadcast(wrow)).withColumn(
            "cl", _assign(feature_cols, k)
        )
        per_cluster = assigned.groupBy("cl").agg(
            *[
                F.avg(c).alias(f"m{j}")
                for j, c in enumerate(feature_cols, start=1)
            ],
            *[F.first(c).alias(c) for c in ccols],
        )
        wrow = per_cluster.agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("cl") == i, F.col(f"m{j}"))),
                    F.min(f"c{i}_{j}"),
                ).alias(f"c{i}_{j}")
                for i in range(1, k + 1)
                for j in range(1, d + 1)
            ]
        )
    return wrow


def kmeans_report(
    df: DataFrame, centroids: DataFrame, feature_cols: list[str], k: int
) -> DataFrame:
    """1-row fit report: final cluster sizes (integer-exact) + total
    within-cluster squared error, carrying the centroids through."""
    assigned = df.crossJoin(F.broadcast(centroids)).withColumn(
        "cl", _assign(feature_cols, k)
    )
    dists = [_sq_dist(feature_cols, i) for i in range(1, k + 1)]
    sse_term = F.lit(None)
    for i in range(k, 0, -1):
        sse_term = F.when(F.col("cl") == i, dists[i - 1]).otherwise(sse_term)
    d = len(feature_cols)
    ccols = [f"c{i}_{j}" for i in range(1, k + 1) for j in range(1, d + 1)]
    return assigned.agg(
        *[F.first(c).alias(c) for c in ccols],
        *[
            F.sum(F.when(F.col("cl") == i, 1).otherwise(0)).alias(f"n{i}")
            for i in range(1, k + 1)
        ],
        F.sum(sse_term).alias("sse"),
    )


def logreg_predict(
    df: DataFrame, weights: DataFrame, feature_cols: list[str]
) -> DataFrame:
    """Serving path: score every row with the trained weights — one
    1-row broadcast cross join + a map-only sigmoid; zero shuffle."""
    return df.crossJoin(F.broadcast(weights)).withColumn(
        "p", _sigmoid(_z(feature_cols))
    )


def logreg_logloss(
    df: DataFrame, weights: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    """1-row mean log-loss of ``weights`` on ``df`` (lazy diagnostic).

    Also carries the weights through (``first``) so one aggregate
    yields the full fit report."""
    p = _sigmoid(_z(feature_cols))
    y = F.col(label_col)
    return df.crossJoin(F.broadcast(weights)).agg(
        *[
            F.first(f"w{i}").alias(f"w{i}")
            for i in range(1, len(feature_cols) + 1)
        ],
        F.first("b").alias("b"),
        F.avg(-(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p))).alias(
            "logloss"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def _als_solve(
    frame: DataFrame,
    key: str,
    f1: str,
    f2: str,
    rating_col: str,
    lam: float,
    out1: str,
    out2: str,
) -> DataFrame:
    """One ALS half-round: per-``key`` ridge solve against the fixed
    side's rank-2 factors — the normal equations (Σff^T + λI)x = Σr·f
    collapsed to the closed-form 2×2 inverse. ONE aggregation with
    map-side partials (5 sums per key), then scalar arithmetic; no
    window, no collect. The expression association below is mirrored
    verbatim by the DuckDB oracle."""
    a11 = F.sum(F.col(f1) * F.col(f1)) + F.lit(lam)
    a12 = F.sum(F.col(f1) * F.col(f2))
    a22 = F.sum(F.col(f2) * F.col(f2)) + F.lit(lam)
    b1 = F.sum(F.col(rating_col) * F.col(f1))
    b2 = F.sum(F.col(rating_col) * F.col(f2))
    agg = frame.groupBy(key).agg(
        a11.alias("a11"),
        a12.alias("a12"),
        a22.alias("a22"),
        b1.alias("b1"),
        b2.alias("b2"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    return agg.select(
        key,
        (
            (F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2")) / det
        ).alias(out1),
        (
            (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1")) / det
        ).alias(out2),
    )


def als_fit(
    ratings: DataFrame,
    iterations: int = 2,
    lam: float = 0.1,
    user_col: str = "u",
    item_col: str = "it",
    rating_col: str = "r",
) -> tuple[DataFrame, DataFrame]:
    """Rank-2 alternating least squares over a (user, item, rating)
    table — collaborative-filtering factorization as lazy DataFrame
    algebra, the trainer whose MODEL is distributed: unlike
    ``logreg_fit``/``kmeans_fit`` (1-row weight state), the user and
    item factor tables are key-partitioned DataFrames that never
    visit the driver.

    Deterministic init: item factors are a pure function of the item
    id (1 + (it%7)/10, 1 − (it%5)/10) computed INLINE in the first
    user solve — no RNG, no broadcast, replayable in any engine.
    Each half-round references the opposite side's iterate exactly
    ONCE (the ratings⋈factors join) so the plan grows linearly in
    ``iterations``; each half-round costs one fact join (shuffle on
    the factor key — AQE's skew handling covers power-law users) plus
    one partial-agged groupBy. λ > 0 keeps every 2×2 system
    invertible regardless of a key's rating count.

    Returns lazy ``(user_factors(u,u1,u2), item_factors(it,y1,y2))``
    after ``iterations`` alternations."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    base = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("it"),
        F.col(rating_col).cast("double").alias("r"),
    )
    init = base.withColumn(
        "y1", F.lit(1.0) + (F.col("it") % 7) * F.lit(0.1)
    ).withColumn("y2", F.lit(1.0) - (F.col("it") % 5) * F.lit(0.1))
    uf = _als_solve(init, "u", "y1", "y2", "r", lam, "u1", "u2")
    # Factor joins are PINNED shuffle_hash, never broadcast: at real
    # scale the factor tables are |users|/|items|-sized — themselves
    # huge for a 100 TB recommender — and even where they would fit,
    # a 4 GB/executor 100x stress run showed ~10 concurrent broadcast
    # materializations (one per plan reference) exhausting the driver
    # (the dedup_span shuffle-pin lesson: broadcast must never ride a
    # corpus-scaled training loop). Shuffle-hash keys the exchange on
    # the factor key with the per-partition hash built from the
    # factor side — the plan that survives any model size.
    itf = None
    for i in range(iterations):
        itf = _als_solve(
            base.join(uf.hint("shuffle_hash"), "u"),
            "it", "u1", "u2", "r", lam, "y1", "y2",
        )
        if i < iterations - 1:
            uf = _als_solve(
                base.join(itf.hint("shuffle_hash"), "it"),
                "u", "y1", "y2", "r", lam, "u1", "u2",
            )
    return uf, itf


def naive_bayes_fit(
    tokens: DataFrame,
    label_col: str = "label",
    token_col: str = "w",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial Naive Bayes text classifier from a
    (doc_id, label, token) table — the third in-engine trainer
    family (after logreg_fit's GD and kmeans_fit's Lloyd rounds), and
    the one that needs NO iteration at all: the MLE/MAP model IS two
    aggregations, which is why NB remains the canonical distributed
    baseline classifier at corpus scale.

    Returns ``(class_stats, likelihoods)``:

    - ``class_stats``: one row per class — ``log_prior`` =
      ln(n_docs_c / n_docs), ``denom`` = ln(token_count_c + alpha·V)
      (V = training vocabulary size), joined against a 1-row corpus
      aggregate by broadcast cross join (never a collect);
    - ``likelihoods``: one row per (class, token) seen in training —
      ``log_num`` = ln(count_{c,w} + alpha). Absent (class, token)
      pairs contribute ln(alpha); with the default alpha=1 that is 0,
      so scoring can LEFT-join this sparse table and coalesce misses
      to 0 instead of densifying the |V|×|C| matrix — the sparsity
      trick that keeps the model table linear in observed pairs.

    Scale shape: both outputs are partial-agg-friendly groupBys over
    one token-table scan each; the model is |C| + |observed pairs|
    rows (≪ corpus), broadcastable to the scoring pass. Everything is
    lazy and engine-portable (plain counts and ln), so a SQL twin
    replays the fit exactly."""
    lbl, tok = F.col(label_col), F.col(token_col)
    n_docs_c = tokens.groupBy(lbl.alias("nb_label")).agg(
        F.count_distinct("doc_id").alias("n_docs_c"),
        F.count("*").alias("n_tok_c"),
    )
    totals = tokens.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count_distinct(tok).alias("v"),
    )
    class_stats = n_docs_c.crossJoin(F.broadcast(totals)).select(
        "nb_label",
        F.log(F.col("n_docs_c").cast("double") / F.col("n_docs")).alias(
            "log_prior"
        ),
        F.log(
            F.col("n_tok_c").cast("double") + F.lit(alpha) * F.col("v")
        ).alias("denom"),
    )
    likelihoods = tokens.groupBy(
        lbl.alias("nb_label"), tok.alias("nb_token")
    ).agg(F.log(F.count("*") + F.lit(alpha)).alias("log_num"))
    return class_stats, likelihoods


def naive_bayes_score(
    tokens: DataFrame,
    class_stats: DataFrame,
    likelihoods: DataFrame,
    grid: int = 1_000_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Score a (doc_id, token) table against a :func:`naive_bayes_fit`
    model: per (doc, class),

        score = log_prior + Σ_tokens (log_num(c, w) − denom(c))
              = log_prior − n_tokens·denom + Σ log_num,

    with unseen-token log_num coalesced to ln(alpha) — ``alpha`` MUST
    match the value passed to the fit (the sparse model omits rows
    whose count is 0, whose log_num is exactly ln(alpha); ADVICE r07
    moved this coupling from the fit docstring into code so fit/score
    can't silently drift). Returns one row per doc:
    ``pred`` = argmax class (FLOOR-gridded score, LARGEST label on a
    tie — struct-max ordering, which works for string and numeric
    labels alike; scores are sums of logs, genuinely irrational, so
    the FLOOR grid is the right band per the band-grid lesson) plus
    the gridded winning score.

    Scale shape: docs × |C| rows via a broadcast cross join with the
    class table (|C| is bounded — a classifier's label space), the
    sparse likelihood join is broadcast when it fits / shuffles on
    (class, token) otherwise, and the final argmax is a max_by — one
    partial-aggregated reduction per doc, no window."""
    cls = class_stats.select(
        F.col("nb_label").alias("cand"), "log_prior", "denom"
    )
    expanded = tokens.crossJoin(F.broadcast(cls)).join(
        F.broadcast(
            likelihoods.select(
                F.col("nb_label").alias("cand"),
                F.col("nb_token").alias("w"),
                "log_num",
            )
        ),
        ["cand", "w"],
        "left",
    )
    per_class = expanded.groupBy("doc_id", "cand").agg(
        F.floor(
            (
                F.first("log_prior")
                - F.count("*") * F.first("denom")
                + F.sum(
                    F.coalesce(F.col("log_num"), F.lit(math.log(alpha)))
                )
            )
            * F.lit(float(grid))
        ).alias("gscore")
    )
    return per_class.groupBy("doc_id").agg(
        F.max(F.struct(F.col("gscore"), F.col("cand"))).alias("m")
    ).select(
        "doc_id",
        F.col("m.cand").alias("pred"),
        F.col("m.gscore").alias("gscore"),
    )


def quantile_reg_fit(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    tau: float = 0.5,
    lr: float = 1.0,
    rounds: int = 5,
) -> DataFrame:
    """Train linear QUANTILE regression (pinball / check loss) by
    ``rounds`` full-batch subgradient steps from w=0 — the fourth
    trainer family, and the ROBUST one: τ=0.5 is median regression
    (outlier-resistant where OLS is not), other τ fit conditional
    quantiles (the data-quality cutoff curves an intake pipeline
    thresholds against). Returns the 1-row weights DataFrame
    ``w1..wd, b`` — entirely lazy.

    Update: w_j += lr · AVG(ψ(y − z)·x_j), ψ(r) = τ − 1{r < 0} —
    the pinball-loss subgradient. ψ is DISCONTINUOUS at r = 0, so
    cross-engine replay has one extra obligation the smooth sigmoid
    never had: if any residual sits within float-reorder noise of 0
    the indicator can flip and the trajectories diverge beyond the
    bands. The caller's tests must pin the minimum |residual| per
    round ≫ noise (see tests/test_staged_r12.py) — same idea as the
    kmeans boundary-gap pins.

    Scale shape: identical to :func:`logreg_fit` — a 1-row broadcast
    iterate (linear plan growth), one whole-stage-codegen aggregate
    per round, no Python, no collect, ``rounds`` scans total."""
    spark = df.sparkSession
    wrow = spark.range(1).select(
        *[F.lit(0.0).alias(f"w{i}") for i in range(1, len(feature_cols) + 1)],
        F.lit(0.0).alias("b"),
    )
    for _ in range(rounds):
        joined = df.crossJoin(F.broadcast(wrow))
        resid = F.col(target_col) - _z(feature_cols)
        psi = F.lit(tau) - F.when(resid < 0.0, F.lit(1.0)).otherwise(
            F.lit(0.0)
        )
        wrow = joined.agg(
            *[
                (F.first(f"w{i}") + F.lit(lr) * F.avg(psi * F.col(c))).alias(
                    f"w{i}"
                )
                for i, c in enumerate(feature_cols, start=1)
            ],
            (F.first("b") + F.lit(lr) * F.avg(psi)).alias("b"),
        )
    return wrow
