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
