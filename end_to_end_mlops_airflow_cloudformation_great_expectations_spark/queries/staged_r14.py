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


# ---------------------------------------------------------------------------
# a_kruskal_wallis — rank-based k-group test (ANOVA's nonparametric twin)
# ---------------------------------------------------------------------------


@query(
    "a_kruskal_wallis",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority AS grp, o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderpriority,
                                o_orderkey) AS i
      FROM orders
    ), mids AS (
      SELECT grp,
             (CAST(MIN(i) OVER (PARTITION BY v) AS DOUBLE)
              + MAX(i) OVER (PARTITION BY v)) / 2 AS mid,
             CAST(COUNT(*) OVER (PARTITION BY v) AS DOUBLE) AS t
      FROM ranked
    ), g AS (
      SELECT grp, COUNT(*) AS nj, SUM(mid) AS rj,
             SUM(t * t - 1) AS tie3
      FROM mids GROUP BY grp
    ), tot AS (
      SELECT COUNT(*) AS k, SUM(nj) AS n,
             SUM(rj * rj / nj) AS s, SUM(tie3) AS tie3
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           ROUND(12.0 / (n * (n + 1)) * s - 3 * (n + 1), 6) AS h,
           ROUND((12.0 / (n * (n + 1)) * s - 3 * (n + 1))
                 / (1 - tie3 / (CAST(n AS DOUBLE) * n * n - n)), 6)
             AS h_corrected
    FROM tot
    """,
)
def a_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across the 5 order priorities — the k-group
    rank test completing the nonparametric battery (a_mannwhitney_u
    is its k=2 special case; a_anova_oneway its parametric twin):
    the "do ANY of the k segments differ?" gate that doesn't care
    about the heavy right tail order values actually have.

    Machinery is a_mannwhitney_u's verbatim: pooled global ranks via
    the distributed rank-attach (range partition + offsets — never a
    corpus-wide single-task window), textbook MIDRANKS via the
    per-value tie window, tie-corrected H' = H/(1 − Σ(t³−t)/(n³−n)).
    Midrank sums are exact-dyadic (halves), so the group sums are
    order-independent; H is a ratio of big moment sums (ROUND 6, the
    a_anova_oneway convention — its rational denominator is huge, so
    the half-grid flip the Brier lesson guards against cannot arise).

    Scale: one fact scan → rank attach (2 shuffles) → 5-row reduce."""
    from ..operators.ranks import attach_global_ranks as _agr

    o = _t(spark, sf_dir, "orders")
    pooled = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("v"),
        "o_orderkey",
    )
    ranked = _agr(
        pooled,
        sort_cols=[F.asc("v"), F.asc("grp"), F.asc("o_orderkey")],
        key_cols=[F.col("v"), F.col("grp"), F.col("o_orderkey")],
        rn_col="i",
    )
    wv = Window.partitionBy("v")
    mids = ranked.select(
        "grp",
        (
            (F.min("i").over(wv).cast("double") + F.max("i").over(wv)) / 2
        ).alias("mid"),
        F.count("*").over(wv).cast("double").alias("t"),
    )
    g = mids.groupBy("grp").agg(
        F.count("*").alias("nj"),
        F.sum("mid").alias("rj"),
        F.sum(F.col("t") * F.col("t") - 1).alias("tie3"),
    )
    tot = g.agg(
        F.count("*").alias("k"),
        F.sum("nj").alias("n"),
        F.sum(F.col("rj") * F.col("rj") / F.col("nj")).alias("s"),
        F.sum("tie3").alias("tie3"),
    )
    h = 12.0 / (F.col("n") * (F.col("n") + 1)) * F.col("s") - 3 * (
        F.col("n") + 1
    )
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(h, 6).alias("h"),
        F.round(
            h
            / (
                1
                - F.col("tie3")
                / (
                    F.col("n").cast("double") * F.col("n") * F.col("n")
                    - F.col("n")
                )
            ),
            6,
        ).alias("h_corrected"),
    )


# ---------------------------------------------------------------------------
# a_xicor — Chatterjee's ξ (directional dependence, integers-only ship)
# ---------------------------------------------------------------------------


@query(
    "a_xicor",
    oracle=f"""
    WITH {_DAILY_CTE},
    rk AS (
      SELECT day, cnt,
             COUNT(*) OVER (ORDER BY xc RANGE BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS r,
             COUNT(*) OVER (ORDER BY xc DESC RANGE BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS l,
             COUNT(*) OVER () AS n
      FROM daily
    ), seq AS (
      SELECT r - LAG(r) OVER (ORDER BY cnt, day) AS dr, l, n
      FROM rk
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(2 * SUM(l * (n - l)) - MAX(n) * SUM(ABS(dr)) AS BIGINT)
             AS xi_num,
           CAST(2 * SUM(l * (n - l)) AS BIGINT) AS xi_den
    FROM seq
    """,
)
def a_xicor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chatterjee's ξ (2020) of daily revenue AS A FUNCTION OF daily
    activity — the modern DIRECTIONAL dependence coefficient that
    completes the correlation family: Pearson (linear), Spearman/
    Kendall (monotone), ξ (arbitrary measurable dependence — ξ→1 iff
    y is a function of x, and ξ(x,y) ≠ ξ(y,x) by design). The
    tie-general form ξ = 1 − n·Σ|r_{i+1}−r_i| / (2·Σ l_i(n−l_i)),
    rows sequenced by x (deterministic day tie-break; the classic
    construction randomizes — an engine must not), r_i = #{y_j ≤
    y_i}, l_i = #{y_j ≥ y_i} via RANGE-frame count windows.

    Integers-only ship (band-grid endgame): ξ is a small-denominator
    rational, exactly the shape that produced live half-grid flips —
    so the output is the exact BIGINT pair (xi_num, xi_den) with
    ξ = xi_num/xi_den, never the float.

    Scale: one fact scan → bounded daily table; every window runs on
    ≤ ~2.6k rows under the constant partition key."""
    d = _daily(spark, sf_dir)
    k = constant_partition_key(F.col("day"))
    w_r = Window.partitionBy(k).orderBy("xc").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_l = Window.partitionBy(k).orderBy(F.col("xc").desc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_n = Window.partitionBy(k).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = d.select(
        "day",
        "cnt",
        F.count("*").over(w_r).alias("r"),
        F.count("*").over(w_l).alias("l"),
        F.count("*").over(w_n).alias("n"),
    )
    w_seq = Window.partitionBy(constant_partition_key(F.col("cnt"))).orderBy(
        "cnt", "day"
    )
    seq = rk.select(
        (F.col("r") - F.lag("r").over(w_seq)).alias("dr"),
        "l",
        "n",
    )
    return seq.agg(
        F.max("n").cast("long").alias("n_days"),
        (
            2 * F.sum(F.col("l") * (F.col("n") - F.col("l")))
            - F.max("n") * F.sum(F.abs("dr"))
        )
        .cast("long")
        .alias("xi_num"),
        (2 * F.sum(F.col("l") * (F.col("n") - F.col("l"))))
        .cast("long")
        .alias("xi_den"),
    )


# ---------------------------------------------------------------------------
# a_log_rank — two-group survival comparison (Mantel-Cox)
# ---------------------------------------------------------------------------


@query(
    "a_log_rank",
    oracle="""
    WITH span AS (
      SELECT user_id,
             CAST(FLOOR((EPOCH(MAX(ts)) - EPOCH(MIN(ts))) / 3600) AS BIGINT)
               AS dur,
             MAX(ts) AS last_ts
      FROM events GROUP BY user_id
    ), cut AS (
      SELECT MAX(ts) AS mx FROM events
    ), lab AS (
      SELECT s.dur, s.user_id % 2 = 1 AS g1,
             (EPOCH(cut.mx) - EPOCH(s.last_ts)) >= 6 * 3600 AS observed
      FROM span s CROSS JOIN cut
    ), per AS (
      SELECT dur,
             COUNT(*) AS c,
             SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS d,
             SUM(CASE WHEN observed AND g1 THEN 1 ELSE 0 END) AS d1
      FROM lab GROUP BY dur
    ), risk AS (
      SELECT dur, d, d1,
             SUM(c) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk,
             SUM(c1) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1_risk
      FROM per
    )
    SELECT dur AS dur_h,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n1_risk AS BIGINT) AS n1_risk,
           CAST(d AS BIGINT) AS d, CAST(d1 AS BIGINT) AS d1,
           ROUND(SUM(d1 - CAST(n1_risk AS DOUBLE) * d / n_risk)
                   OVER w, 6) AS cum_oe,
           ROUND(SUM(CASE WHEN n_risk > 1 THEN
                   CAST(n1_risk AS DOUBLE) * (n_risk - n1_risk) * d
                   * (n_risk - d)
                   / (CAST(n_risk AS DOUBLE) * n_risk * (n_risk - 1))
                 ELSE 0 END) OVER w, 6) AS cum_var
    FROM risk WHERE d > 0
    WINDOW w AS (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def a_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) two-group survival comparison over the
    SAME censored-lifetime construction as a_survival_km /
    a_nelson_aalen, groups = user-id parity (the deterministic stand-
    in for an A/B assignment): at each distinct lifetime with deaths,
    the hypergeometric observed-minus-expected increment
    d1 − n1·d/n and its variance n1(n−n1)d(n−d)/(n²(n−1)), emitted as
    ORDER-sequenced running sums (deterministic float — never an
    unordered reduce; the nelson_aalen convention). The final row's
    cum_oe²/cum_var is the χ²₁ statistic; emitting the whole step
    table keeps every increment auditable.

    Integer core: d/d1/n_risk/n1_risk are EXACT BIGINTs from one
    events scan + a descending cumulative window over the bounded
    distinct-lifetime table.

    Scale: one fact scan to per-user spans (groupBy user_id), then
    constant-key windows over ≤ ~720 distinct lifetimes."""
    k_ = constant_partition_key

    e = _t(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        F.floor(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            / 3600
        )
        .cast("long")
        .alias("dur"),
        F.max("ts").alias("last_ts"),
    )
    cut = e.agg(F.max("ts").alias("mx"))
    lab = span.crossJoin(F.broadcast(cut)).select(
        "dur",
        (F.col("user_id") % 2 == 1).alias("g1"),
        (
            (F.unix_timestamp("mx") - F.unix_timestamp("last_ts"))
            >= 6 * 3600
        ).alias("observed"),
    )
    per = lab.groupBy("dur").agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("g1"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("observed") & F.col("g1"), 1).otherwise(0)).alias(
            "d1"
        ),
    )
    w_desc = (
        Window.partitionBy(k_(F.col("dur")))
        .orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per.select(
        "dur",
        "d",
        "d1",
        F.sum("c").over(w_desc).alias("n_risk"),
        F.sum("c1").over(w_desc).alias("n1_risk"),
    ).filter(F.col("d") > 0)
    w_asc = (
        Window.partitionBy(k_(F.col("dur")))
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    oe = F.col("d1") - F.col("n1_risk").cast("double") * F.col("d") / F.col(
        "n_risk"
    )
    var = F.when(
        F.col("n_risk") > 1,
        F.col("n1_risk").cast("double")
        * (F.col("n_risk") - F.col("n1_risk"))
        * F.col("d")
        * (F.col("n_risk") - F.col("d"))
        / (
            F.col("n_risk").cast("double")
            * F.col("n_risk")
            * (F.col("n_risk") - 1)
        ),
    ).otherwise(0.0)
    return risk.select(
        F.col("dur").alias("dur_h"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n1_risk").cast("long").alias("n1_risk"),
        F.col("d").cast("long").alias("d"),
        F.col("d1").cast("long").alias("d1"),
        F.round(F.sum(oe).over(w_asc), 6).alias("cum_oe"),
        F.round(F.sum(var).over(w_asc), 6).alias("cum_var"),
    )


# ---------------------------------------------------------------------------
# g_clustering_coefficient — global transitivity as exact integers
# ---------------------------------------------------------------------------


@query(
    "g_clustering_coefficient",
    oracle="""
    WITH e AS (
      SELECT DISTINCT LEAST(o_custkey % 50, l_suppkey % 50) AS lo,
                      GREATEST(o_custkey % 50, l_suppkey % 50) AS hi
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey % 50 <> l_suppkey % 50
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM e ab
      JOIN e bc ON ab.hi = bc.lo
      JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi
    ), deg AS (
      SELECT v, COUNT(*) AS dg FROM (
        SELECT lo AS v FROM e UNION ALL SELECT hi AS v FROM e
      ) GROUP BY v
    ), wdg AS (
      SELECT SUM(dg * (dg - 1) / 2) AS w,
             COUNT(*) AS n_vertices
      FROM deg
    )
    SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
           CAST(3 * t AS BIGINT) AS closed_wedges,
           CAST(w AS BIGINT) AS wedges
    FROM tri CROSS JOIN wdg
    """,
)
def g_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity) of the
    g_triangle_count co-occurrence graph: C = 3·triangles / wedges,
    shipped as the EXACT integer pair (closed_wedges, wedges) — C is
    a small-denominator rational, the exact shape the Brier half-grid
    lesson bans from ROUND, so the division is left to the consumer
    (band-grid endgame: ship the integers). Completes the graph-
    quality family: g_modularity scores a partition, this scores the
    topology's triangle density (small-world-ness).

    Triangles reuse operators/graph.triangle_count (low→high oriented
    edges ⇒ each triangle counted once, fan-out bounded by oriented
    degree); wedges = Σ C(deg,2) from one degree aggregate over the
    distinct edge set.

    Scale: one fact-fact join builds the edge list (shuffle on
    orderkey); everything after runs on the DISTINCT bucket-graph
    (vertex-bounded). Real id-level graphs swap the bucket mod for
    the raw key — the plan shape is unchanged."""
    from ..operators.graph import triangle_count

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Fact-fact edge build: PIN merge-side (banked broadcast-OOM
    # lesson — a 2-column projection of a corpus-scaled fact sits
    # under Spark's static broadcast estimate; at the 100x/4 GB
    # stress point the unpinned join OOM'd building the hash side).
    pairs = o.hint("merge").join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") % 50).alias("src"),
        (F.col("l_suppkey") % 50).alias("dst"),
    )
    edges = (
        pairs.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .distinct()
    )
    tri = triangle_count(pairs).select(
        F.col("n_triangles").cast("long").alias("t")
    )
    deg = (
        edges.select(F.col("lo").alias("v"))
        .unionAll(edges.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("dg"))
    )
    wdg = deg.agg(
        F.sum(F.col("dg") * (F.col("dg") - 1) / 2).alias("w"),
        F.count("*").alias("n_vertices"),
    )
    return tri.crossJoin(F.broadcast(wdg)).select(
        F.col("n_vertices").cast("long").alias("n_vertices"),
        (3 * F.col("t")).cast("long").alias("closed_wedges"),
        F.col("w").cast("long").alias("wedges"),
    )
