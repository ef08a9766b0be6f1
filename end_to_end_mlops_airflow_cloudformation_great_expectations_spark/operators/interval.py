"""Interval / point-in-range join (SURVEY.md J6).

Joining points to containing intervals with a bare range predicate
plans as a nested-loop join — O(|points|·|intervals|), hopeless at
scale unless one side broadcasts. The scalable form is the standard
bucketing decomposition:

1. overlay a fixed grid of width >= max interval length;
2. explode each interval to every grid cell it touches;
3. equi-join points to interval-cells on the cell id (hash join,
   shuffles once on the cell);
4. re-check the exact range predicate as a residual filter.

Cost: |intervals| × (avg_len/grid + 1) replicated rows instead of the
cross product. Grid width is a knob: coarser → fewer replicas, more
residual misses; finer → the reverse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    grid: float,
    how: str = "inner",
) -> DataFrame:
    """Rows = (point row, interval row) where lo <= point < hi.

    ``grid`` must be >= the maximum interval width divided by a small
    constant (wider intervals just span more cells — correctness is
    unaffected, only the replication factor grows).

    ``how`` may be ``inner`` or ``left`` (keep points matching no
    interval, with null interval columns). The range residual lives IN
    the join condition — a post-join filter would silently drop the
    null-matched rows of a left join, degrading it to inner (the r01
    ADVICE finding). Right/full outer are rejected: an interval is
    replicated once per grid cell it spans, so an unmatched interval
    would surface one null row PER CELL, not one."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"interval_join supports how='inner'|'left', got {how!r}: "
            "outer-on-the-intervals side is ill-defined under grid "
            "replication"
        )
    # NOTE: no defensive repartition here — the per-row work (one
    # floor+join probe) is too cheap to amortize a shuffle; measured
    # 3× slower with one at sf0.1. Repartition only pays off for
    # CPU-heavy per-row operators (see dedup.minhash_signatures).
    p = points.withColumn(
        "__cell", F.floor(F.col(point_col) / grid).cast("long")
    ).alias("__pts")
    iv = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / grid).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / grid).cast("long"),
            )
        ),
    ).alias("__ivs")
    # each point carries exactly ONE cell, so a (point, interval) pair
    # can satisfy the condition in at most one cell replica — no dedup
    # needed, and left-unmatched points surface exactly once.
    cond = (
        (F.col("__pts.__cell") == F.col("__ivs.__cell"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    return p.join(iv, cond, how).drop("__cell")
