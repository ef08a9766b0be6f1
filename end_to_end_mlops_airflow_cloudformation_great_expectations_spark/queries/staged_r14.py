"""Round-8 continuation additions (registered AFTER the pinned r8
window and the staged _ROUND9_WINDOW; rotation slot round 10+ —
CLAUDE.md new-query discipline: each proven local-green at sf0.001 +
sf0.01 incl. --plain before landing).

Theme: the remaining classical NONPARAMETRIC / SEQUENTIAL statistics
over bounded post-aggregation series, plus calibration, multiple
testing, privacy and graph-quality gaps. Shared spine: the DAILY
revenue series from lineitem — integerized ONCE to the cent grid via
``CAST(ROUND(l_extendedprice * 100) AS BIGINT)`` (the same parquet
double × the same literal is bit-identical IEEE arithmetic in both
engines, so the integerization is deterministic even for the ~11% of
fixture prices that are off the cent grid), after which every derived
count/sum/rank is EXACT integer arithmetic (the band-grid endgame:
ship the integers).

- ``a_kendall_tau`` — Kendall's τ-b between daily order-line count
  and daily revenue: concordant/discordant/tie pair counts as EXACT
  integers from the bounded day×day pair join (the a_theil_sen
  quadratic-in-series-length precedent), τ-b itself ROUND 6 (the
  sqrt makes it irrational — never grid-resident).
- ``a_durbin_watson`` — first-order serial-correlation diagnostic of
  the daily revenue series: DW = Σ(Δx)²/Σ(x−x̄)², a ratio of big
  moment sums (relative float error ~1e-12 ≪ the 1e-6 grid — the
  a_anova_oneway convention).
- ``a_runs_test`` — Wald–Wolfowitz runs above/below the exact lower
  median: integer n1/n2/runs + the normal z (sqrt ⇒ irrational ⇒
  ROUND 6 safe).
- ``a_hodges_lehmann`` — the HL location estimate = median of all
  Walsh averages (x_i+x_j)/2, i ≤ j, shipped as the EXACT integer
  ``hl_x4`` (4× the estimate is integral on the cent grid even after
  the even-count median interpolation).

Scale posture shared by all four: ONE fact scan reduces lineitem to
the ≤ ~2.6k-row daily table; everything after (pair joins, windows,
rank attaches) runs on that bounded aggregate — the pair join is
quadratic in SERIES LENGTH (calendar-bounded), not corpus size, and
the bounded side is broadcast so Spark plans BroadcastNestedLoopJoin,
never CartesianProduct. At 100 TB the fact scan dominates and stays
a single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..operators.ranks import attach_global_ranks, constant_partition_key
from .registry import query


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return catalog.load(spark, sf_dir, table)


#: Shared DuckDB CTE: the daily lineitem series on the cent grid.
_DAILY_CTE = """
    daily AS (
      SELECT l_shipdate AS day,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS xc,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One fact scan → the bounded daily series: day, xc (revenue in
    EXACT integer cents), cnt (order-line count)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "xc"
        ),
        F.count("*").alias("cnt"),
    )


# ---------------------------------------------------------------------------
# a_kendall_tau — Kendall's τ-b (count vs revenue, daily)
# ---------------------------------------------------------------------------


@query(
    "a_kendall_tau",
    oracle=f"""
    WITH {_DAILY_CTE},
    pairs AS (
      SELECT (a.cnt - b.cnt) AS dx, (a.xc - b.xc) AS dy
      FROM daily a JOIN daily b ON a.day < b.day
    ), c AS (
      SELECT
        SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS nc,
        SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS nd,
        SUM(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0 END) AS tx,
        SUM(CASE WHEN dy = 0 AND dx <> 0 THEN 1 ELSE 0 END) AS ty,
        SUM(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0 END) AS txy,
        COUNT(*) AS n0
      FROM pairs
    )
    SELECT CAST(n0 AS BIGINT) AS n_pairs,
           CAST(nc AS BIGINT) AS nc, CAST(nd AS BIGINT) AS nd,
           CAST(tx + txy AS BIGINT) AS ties_x,
           CAST(ty + txy AS BIGINT) AS ties_y,
           ROUND((nc - nd) / SQRT(CAST((n0 - tx - txy) AS DOUBLE)
                                  * (n0 - ty - txy)), 6) AS tau_b
    FROM c
    """,
)
def a_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation between daily activity (order-
    line count) and daily revenue — the pair-concordance companion to
    a_spearman_corr (midranks) and a_xicor (directional): τ survives
    any monotone transform and its tie-corrected τ-b form is the one
    real dashboards quote.

    Determinism: dx/dy are EXACT integer differences on the cent/count
    grids, so every pair classifies identically cross-engine; the five
    pair counts are integers; only τ-b itself is float (a sqrt ⇒
    irrational ⇒ never on the 1e-6 half-grid).

    Scale: quadratic in SERIES LENGTH (≤ ~2.6k days ⇒ ≤ ~3.4M pairs),
    not corpus size; the daily table is broadcast (BNLJ, never
    CartesianProduct). A longer calendar coarsens to weekly grain; the
    fact scan stays one pass."""
    d = _daily(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.day") < F.col("b.day")
    ).select(
        (F.col("a.cnt") - F.col("b.cnt")).alias("dx"),
        (F.col("a.xc") - F.col("b.xc")).alias("dy"),
    )
    c = pairs.agg(
        F.sum(F.when(F.col("dx") * F.col("dy") > 0, 1).otherwise(0)).alias(
            "nc"
        ),
        F.sum(F.when(F.col("dx") * F.col("dy") < 0, 1).otherwise(0)).alias(
            "nd"
        ),
        F.sum(
            F.when((F.col("dx") == 0) & (F.col("dy") != 0), 1).otherwise(0)
        ).alias("tx"),
        F.sum(
            F.when((F.col("dy") == 0) & (F.col("dx") != 0), 1).otherwise(0)
        ).alias("ty"),
        F.sum(
            F.when((F.col("dx") == 0) & (F.col("dy") == 0), 1).otherwise(0)
        ).alias("txy"),
        F.count("*").alias("n0"),
    )
    return c.select(
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("nc").cast("long").alias("nc"),
        F.col("nd").cast("long").alias("nd"),
        (F.col("tx") + F.col("txy")).cast("long").alias("ties_x"),
        (F.col("ty") + F.col("txy")).cast("long").alias("ties_y"),
        F.round(
            (F.col("nc") - F.col("nd"))
            / F.sqrt(
                (F.col("n0") - F.col("tx") - F.col("txy")).cast("double")
                * (F.col("n0") - F.col("ty") - F.col("txy"))
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# a_durbin_watson — serial-correlation diagnostic of the daily series
# ---------------------------------------------------------------------------


@query(
    "a_durbin_watson",
    oracle=f"""
    WITH {_DAILY_CTE},
    lagged AS (
      SELECT xc,
             xc - LAG(xc) OVER (ORDER BY day) AS dx
      FROM daily
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(
             SUM(CAST(dx AS DOUBLE) * dx)
             / (SUM(CAST(xc AS DOUBLE) * xc)
                - SUM(CAST(xc AS DOUBLE)) * SUM(CAST(xc AS DOUBLE))
                  / COUNT(*)),
             6) AS dw
    FROM lagged
    """,
)
def a_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic of the mean-centered daily revenue
    series: DW = Σ(x_t − x_{t−1})² / Σ(x_t − x̄)² — the classic
    first-order serial-correlation diagnostic (DW ≈ 2(1−ρ₁)); the
    residual-independence check every forecasting/OLS consumer of the
    a_grouped_ols / a_holt_forecast family should run.

    Determinism: Δx is an EXACT integer (the mean cancels in first
    differences — no centering float); both Σ(Δx)² and the centered
    denominator are sums of products of exact integers evaluated in
    double, so DW is a ratio of big moment sums with relative error
    ~1e-12 ≪ the 1e-6 output grid (the a_anova_oneway convention;
    (Δx)² can exceed BIGINT at stress scale, hence double, never an
    integer ship here).

    Scale: one fact scan → bounded daily table; the lag is a window
    over ≤ ~2.6k rows with the constant partition key (single task by
    design on a dimension-sized aggregate, not a fact)."""
    d = _daily(spark, sf_dir)
    k = constant_partition_key(F.col("day"))
    w = Window.partitionBy(k).orderBy("day")
    lagged = d.select(
        "xc", (F.col("xc") - F.lag("xc").over(w)).alias("dx")
    )
    return lagged.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.sum(F.col("dx").cast("double") * F.col("dx"))
            / (
                F.sum(F.col("xc").cast("double") * F.col("xc"))
                - F.sum(F.col("xc").cast("double"))
                * F.sum(F.col("xc").cast("double"))
                / F.count("*")
            ),
            6,
        ).alias("dw"),
    )


# ---------------------------------------------------------------------------
# a_runs_test — Wald–Wolfowitz runs above/below the median
# ---------------------------------------------------------------------------


@query(
    "a_runs_test",
    oracle=f"""
    WITH {_DAILY_CTE},
    med AS (
      SELECT xc AS m FROM daily
      QUALIFY ROW_NUMBER() OVER (ORDER BY xc, day)
              = CAST(FLOOR((COUNT(*) OVER () + 1) / 2) AS BIGINT)
    ), signs AS (
      SELECT day, xc > med.m AS up
      FROM daily CROSS JOIN med
      WHERE xc <> med.m
    ), runs AS (
      SELECT up,
             CASE WHEN LAG(up) OVER (ORDER BY day) IS DISTINCT FROM up
                  THEN 1 ELSE 0 END AS start
      FROM signs
    )
    SELECT CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           CAST(SUM(CASE WHEN NOT up THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(start) AS BIGINT) AS n_runs,
           ROUND(
             (SUM(start)
              - (2.0 * SUM(CASE WHEN up THEN 1 ELSE 0 END)
                     * SUM(CASE WHEN NOT up THEN 1 ELSE 0 END)
                     / COUNT(*) + 1))
             / SQRT(
                 (2.0 * SUM(CASE WHEN up THEN 1 ELSE 0 END)
                      * SUM(CASE WHEN NOT up THEN 1 ELSE 0 END)
                  * (2.0 * SUM(CASE WHEN up THEN 1 ELSE 0 END)
                         * SUM(CASE WHEN NOT up THEN 1 ELSE 0 END)
                     - COUNT(*)))
                 / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)
                    * (COUNT(*) - 1))),
             6) AS z
    FROM runs
    """,
)
def a_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of the daily revenue
    series around its median — the distribution-free "is this series
    actually random or does it trend/oscillate?" gate that belongs in
    front of every i.i.d.-assuming monitor (bootstrap, control
    charts). Too FEW runs ⇒ positive drift/clustering; too MANY ⇒
    oscillation.

    The reference median is the EXACT lower median (the cent-grid
    value at row (n+1)//2 of the sorted bounded series — never an
    interpolated float); days exactly ON the median are dropped per
    the classic construction, so the up/down signs are integer-exact
    cross-engine. n_above/n_below/n_runs are integers; only z carries
    float (sqrt ⇒ irrational ⇒ ROUND 6 safe).

    Scale: everything after the one fact scan runs on the bounded
    daily table (windows with the constant partition key)."""
    d = _daily(spark, sf_dir)
    k = constant_partition_key(F.col("day"))
    w_cnt = Window.partitionBy(k).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = d.select(
        "day",
        "xc",
        F.row_number()
        .over(Window.partitionBy(k).orderBy("xc", "day"))
        .alias("rn"),
        F.count("*").over(w_cnt).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("n") + 1) / 2).cast("long")
    ).select(F.col("xc").alias("m"))
    signs = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("xc") != F.col("m"))
        .select("day", (F.col("xc") > F.col("m")).alias("up"))
    )
    w_day = Window.partitionBy(constant_partition_key(F.col("day"))).orderBy(
        "day"
    )
    runs = signs.select(
        "up",
        F.when(
            ~F.lag("up").over(w_day).eqNullSafe(F.col("up")), 1
        ).otherwise(0).alias("start"),
    )
    n1 = F.sum(F.when(F.col("up"), 1).otherwise(0))
    n2 = F.sum(F.when(~F.col("up"), 1).otherwise(0))
    n = F.count("*")
    mu = 2.0 * n1 * n2 / n + 1
    var = (
        (2.0 * n1 * n2 * (2.0 * n1 * n2 - n))
        / (n.cast("double") * n * (n - 1))
    )
    return runs.agg(
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        F.sum("start").cast("long").alias("n_runs"),
        F.round((F.sum("start") - mu) / F.sqrt(var), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# a_hodges_lehmann — median of Walsh averages (exact integer ship)
# ---------------------------------------------------------------------------


@query(
    "a_hodges_lehmann",
    oracle=f"""
    WITH {_DAILY_CTE},
    walsh AS (
      SELECT a.xc + b.xc AS w2, a.day AS d1, b.day AS d2
      FROM daily a JOIN daily b ON a.day <= b.day
    ), ranked AS (
      SELECT w2,
             ROW_NUMBER() OVER (ORDER BY w2, d1, d2) AS rn,
             COUNT(*) OVER () AS np
      FROM walsh
    )
    SELECT CAST(MAX(np) AS BIGINT) AS n_pairs,
           CAST(SUM(w2 * CASE WHEN np % 2 = 1 THEN 2 ELSE 1 END)
                AS BIGINT) AS hl_x4
    FROM ranked
    WHERE rn = CAST(FLOOR((np + 1) / 2) AS BIGINT)
       OR rn = CAST(FLOOR(np / 2) + 1 AS BIGINT)
    """,
)
def a_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann location estimate of daily revenue: the median
    of all Walsh averages (x_i + x_j)/2 over day pairs i ≤ j — the
    estimator the Wilcoxon signed-rank test inverts; robust (29%
    breakdown) yet ~95% Gaussian-efficient, where the plain median is
    64%. The robust "typical daily revenue" a finance dashboard should
    quote next to a_trimmed_mean / a_winsorized_mean.

    Integer ship (band-grid endgame): Walsh SUMS x_i + x_j are exact
    integer cents; the median of an even-count set interpolates two
    middle values, so the output is ``hl_x4`` = 4 × the HL estimate =
    (lower middle + upper middle) Walsh sum — integral ALWAYS. The
    odd-count case doubles the single middle row (CASE ... THEN 2).

    Scale: quadratic in series length only (≤ ~3.4M pair rows from
    ≤ ~2.6k days); the global order statistic uses the distributed
    rank-attach (range partition + offsets), never a single-task
    sort of the pair table."""
    d = _daily(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    walsh = a.join(
        F.broadcast(b), F.col("a.day") <= F.col("b.day")
    ).select(
        (F.col("a.xc") + F.col("b.xc")).alias("w2"),
        F.col("a.day").alias("d1"),
        F.col("b.day").alias("d2"),
    )
    ranked = attach_global_ranks(
        walsh,
        sort_cols=[F.col("w2"), F.col("d1"), F.col("d2")],
        key_cols=[F.col("w2"), F.col("d1"), F.col("d2")],
        rn_col="rn",
    )
    np_ = ranked.agg(F.count("*").alias("np"))
    mid = (
        ranked.crossJoin(F.broadcast(np_))
        .filter(
            (F.col("rn") == F.floor((F.col("np") + 1) / 2).cast("long"))
            | (F.col("rn") == (F.floor(F.col("np") / 2) + 1).cast("long"))
        )
    )
    return mid.groupBy().agg(
        F.max("np").cast("long").alias("n_pairs"),
        F.sum(
            F.col("w2") * F.when(F.col("np") % 2 == 1, 2).otherwise(1)
        )
        .cast("long")
        .alias("hl_x4"),
    )
