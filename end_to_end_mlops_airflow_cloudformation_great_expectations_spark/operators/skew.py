"""Skew mitigation (SURVEY.md §4.3 "100 TB hygiene": skewed keys →
salting or AQE skew-join).

AQE's skew-join split (enabled in SCALE_PROFILE) handles moderate
sort-merge-join skew at runtime. Salting is the explicit fallback for
the cases AQE can't fix: skewed *aggregations* (one hot group key) and
skewed joins where the hot key's build side must be replicated.

``salted_agg`` is the two-phase aggregation: group on (key, salt) —
spreading the hot key over N reducers — then re-aggregate partials by
key. Works for any algebraic aggregate (sum/count/min/max); averages
are derived from sum+count at the outer level.

``salted_join`` replicates each right-side row N times (one per salt)
and salts the left side randomly-but-deterministically, so a hot left
key spreads over N tasks while the join stays an equi hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.columns import portable_bucket


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_src: Column,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (input_col, fn) with fn ∈
    {sum, count, min, max}. The partial phase groups by
    (key, salt=hash(salt_src) % n_salts); the final phase merges
    partials (count partials merge by SUM)."""
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("__salt", portable_bucket(salt_src, n_salts))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(f"__p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_src: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: left rows get salt = hash(salt_src) %
    n_salts; right rows are replicated once per salt value. The hot
    key's probe rows spread across ``n_salts`` tasks."""
    l = left.withColumn("__salt", portable_bucket(salt_src, n_salts))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = l.join(
        r, (F.col(left_key) == F.col(right_key)) & (l["__salt"] == r["__salt"]), how
    )
    return out.drop("__salt")
