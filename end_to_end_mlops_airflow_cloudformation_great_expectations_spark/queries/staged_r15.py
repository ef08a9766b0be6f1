"""Round-9 additions (registered AFTER the live r9 window and the
pinned _ROUND10_WINDOW; rotation slot round 11+ — CLAUDE.md
new-query discipline: each proven local-green at sf0.001 + sf0.01
incl. --plain before landing).

- ``dedup_image_phash`` — perceptual image near-dedup (VERDICT r08
  item 7): the IMAGE rung of the dedup ladder, next to text
  MinHash/SimHash and embedding cosine. Real BMP synth → real
  container decode (bottom-up rows + stride padding) → integer
  luminance → 9×8 grid → 64-bit dHash as four 16-bit bands →
  Hamming-band candidate join → Hamming ≤ 3 cut. EXACT cross-engine
  twin (the dedup_simhash_portable convention): every stage is
  integer arithmetic, and at max_hamming = 3 < 4 bands the banded
  pair set EQUALS the all-pairs thresholded set by pigeonhole, so
  the oracle replays the simple all-pairs form over the bounded
  slice while the engine runs the banded production shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators import multimodal as mm
from .registry import query
from .staged_r06 import _cms_oracle_bucket_sql


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return catalog.load(spark, sf_dir, table)


_PH_SLICE = 400  # doc_id < 400: bounds the oracle's all-pairs replay
_PH_MAXHAM = 3  # < 4 bands => pigeonhole makes banding lossless


def _dhash_oracle_sql() -> str:
    """DuckDB replay of the full dHash pipeline: the same portable
    byte fill (base on the GROUP key + sparse per-doc +128 flips, all
    on the prime 251 grid), the same bottom-up/stride byte addressing
    of the sampled 9×8 luminance grid, the same integer luminance and
    gradient-sign bits, the same four 16-bit band integers, and the
    all-pairs Hamming ≤ 3 cut (== the banded engine result by
    pigeonhole: ≤ 3 differing bits across 4 bands always leave one
    band identical, and both sides emit only pairs ≤ 3)."""
    base = _cms_oracle_bucket_sql(
        f"(doc_id % {mm.DHASH_GROUPS}) * 1024 + jj",
        mm.DHASH_SEED_BASE,
        mm.DHASH_BYTE_MOD,
    )
    flip = _cms_oracle_bucket_sql(
        "doc_id * 1024 + jj", mm.DHASH_SEED_FLIP, mm.DHASH_FLIPMOD
    )
    return f"""
    WITH d AS (
      SELECT doc_id FROM documents WHERE doc_id < {_PH_SLICE}
    ), grid AS (
      SELECT d.doc_id, yy.i AS yy, xx.i AS xx, ch.i AS ch,
             ({mm.DHASH_H - 1} - 2 * yy.i) * {mm.DHASH_STRIDE}
               + 6 * xx.i + ch.i AS jj
      FROM d,
           LATERAL unnest(range(8)) AS yy(i),
           LATERAL unnest(range(9)) AS xx(i),
           LATERAL unnest(range(3)) AS ch(i)
    ), byte AS (
      SELECT doc_id, yy, xx, ch,
             (({base})
              + CASE WHEN ({flip}) = 0 THEN 128 ELSE 0 END)
             % {mm.DHASH_BYTE_MOD} AS v
      FROM grid
    ), lum AS (
      -- BMP byte order is B,G,R: luminance (r + 2g + b) >> 2
      SELECT doc_id, yy, xx,
             CAST(SUM(CASE ch WHEN 0 THEN v WHEN 1 THEN 2 * v
                      ELSE v END) // 4 AS BIGINT) AS gv
      FROM byte GROUP BY doc_id, yy, xx
    ), bits AS (
      SELECT doc_id, yy, xx,
             CASE WHEN LEAD(gv) OVER (
               PARTITION BY doc_id, yy ORDER BY xx) > gv
             THEN 1 ELSE 0 END AS bit
      FROM lum
    ), sigs AS (
      SELECT doc_id,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 0
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b0,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 1
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b1,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 2
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b2,
             SUM(CASE WHEN (yy * 8 + xx) // 16 = 3
                 THEN bit << ((yy * 8 + xx) % 16) ELSE 0 END) AS b3
      FROM bits WHERE xx < 8 GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
              AS INT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
        <= {_PH_MAXHAM}
    """


@query("dedup_image_phash", oracle=_dhash_oracle_sql())
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dedup via dHash + Hamming-band bucketing
    (VERDICT r08 item 7): each doc's 24-bit BMP is synthesized with a
    GROUP-keyed fill + sparse per-doc perturbation (planted
    near-duplicates), decoded back through the real container parse
    (bottom-up row order + 4-byte stride, operators/multimodal.py),
    reduced to the 9×8 integer-luminance grid, and hashed to 64
    gradient-sign bits held as four 16-bit band integers. Candidates
    come from the SimHash-style band join (pairs agreeing on ≥1 band
    — Hamming ≤ 3 is GUARANTEED caught by pigeonhole over 4 bands),
    then the exact Hamming cut verifies. dHash over DCT-pHash is
    deliberate: integer end-to-end, so the oracle replays every stage
    exactly (a DCT's float cosines would put sign bits on libm ULPs);
    fixture geometry: within-group Hamming ≤ 5 (1729/1800 pairs ≤ 3),
    cross-group minimum 6 — an integer gap above the cut, test-pinned.

    Scale: signatures are one Arrow mapInPandas scan (production
    would decode real bytes the same way); the band join shards by
    16-bit band value exactly like MinHash LSH band buckets — never
    all-pairs. The all-pairs form exists only as the oracle spec over
    the bounded slice."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < _PH_SLICE)
    sigs = mm.image_dhash_signatures(d)
    chunks = sigs.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("chunk", "cval"),
    )
    a = chunks.select(
        "chunk",
        "cval",
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{c}").alias(f"a{c}") for c in range(4)],
    )
    b = chunks.select(
        "chunk",
        "cval",
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{c}").alias(f"bb{c}") for c in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{c}").bitwiseXOR(F.col(f"bb{c}")))
        for c in range(4)
    )
    return (
        a.join(b, ["chunk", "cval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= _PH_MAXHAM)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Round-9 analytics batch: the remaining classical paired/repeated-
# measures tests + ranking metric + sequential drift detector. Shared
# discipline: integerize ONCE at the cent grid, ship exact integers,
# ROUND 6 only for genuinely irrational outputs (sqrt).
# ---------------------------------------------------------------------------

_WSR_DAILY_CTE = """
    daily AS (
      SELECT l_shipdate AS day,
             SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 ELSE 0 END) AS xn,
             SUM(CASE WHEN l_returnflag <> 'N'
                 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 ELSE 0 END) AS xr
      FROM lineitem GROUP BY 1
    )
"""


@query(
    "a_wilcoxon_signed_rank",
    oracle=f"""
    WITH {_WSR_DAILY_CTE},
    d AS (
      SELECT day, xn - xr AS dd, ABS(xn - xr) AS ad
      FROM daily WHERE xn - xr <> 0
    ), rk AS (
      SELECT dd,
             2 * CAST(RANK() OVER (ORDER BY ad) AS BIGINT)
               + CAST(COUNT(*) OVER (PARTITION BY ad) AS BIGINT) - 1
               AS two_r,
             ad
      FROM d
    ), ties AS (
      SELECT SUM(t * t * t - t) AS tcorr FROM (
        SELECT COUNT(*) AS t FROM rk GROUP BY ad
      )
    ), agg AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN dd > 0 THEN two_r ELSE 0 END) AS w2p
      FROM rk
    )
    SELECT CAST(n AS BIGINT) AS n_nonzero,
           CAST(w2p AS BIGINT) AS w2_plus,
           CAST(2 * w2p - n * (n + 1) AS BIGINT) AS z_num,
           CAST(2 * n * (n + 1) * (2 * n + 1) - tcorr AS BIGINT) AS var3,
           ROUND((2 * w2p - n * (n + 1))
                 / SQRT((2.0 * n * (n + 1) * (2 * n + 1) - tcorr) / 3.0),
                 6) AS z
    FROM agg CROSS JOIN ties
    """,
)
def a_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon SIGNED-RANK test — the paired companion to
    a_mannwhitney_u (independent) and a_friedman_test (k treatments):
    per day, the paired difference d = cents(returnflag N) − cents
    (other flags); zero differences drop; |d| gets doubled midranks
    (2·RANK + ties − 1 — the Friedman convention, exact integers);
    W2+ sums doubled ranks over positive d. Shipped integers: n,
    W2+, the z numerator 2·W2+ − n(n+1), and the tie-corrected
    variance numerator var3 = 2n(n+1)(2n+1) − Σ(t³−t); z itself is
    num / sqrt(var3/3) — sqrt of a non-square ⇒ irrational ⇒ ROUND 6
    is never grid-resident (the a_runs_test convention).

    Scale: one fact scan → the bounded daily table; ranks are windows
    over the calendar-bounded series."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    daily = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum(F.when(F.col("l_returnflag") == "N", cents).otherwise(0)).alias(
            "xn"
        ),
        F.sum(F.when(F.col("l_returnflag") != "N", cents).otherwise(0)).alias(
            "xr"
        ),
    )
    from pyspark.sql import Window

    from ..operators.ranks import constant_partition_key

    d = daily.select(
        (F.col("xn") - F.col("xr")).alias("dd"),
        F.abs(F.col("xn") - F.col("xr")).alias("ad"),
    ).filter(F.col("dd") != 0)
    # bounded post-aggregation table (calendar days): the constant
    # partition key is the repo's blessed single-task-window form
    w_rank = Window.partitionBy(
        constant_partition_key(F.col("ad"))
    ).orderBy("ad")
    w_tie = Window.partitionBy("ad")
    rk = d.select(
        "dd",
        "ad",
        (
            2 * F.rank().over(w_rank).cast("long")
            + F.count("*").over(w_tie).cast("long")
            - 1
        ).alias("two_r"),
    )
    ties = (
        rk.groupBy("ad")
        .agg(F.count("*").alias("t"))
        .agg(F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tcorr"))
    )
    agg = rk.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("dd") > 0, F.col("two_r")).otherwise(0)).alias(
            "w2p"
        ),
    )
    j = agg.crossJoin(F.broadcast(ties))
    n, w2p, tc = F.col("n"), F.col("w2p"), F.col("tcorr")
    var3 = 2 * n * (n + 1) * (2 * n + 1) - tc
    return j.select(
        n.cast("long").alias("n_nonzero"),
        w2p.cast("long").alias("w2_plus"),
        (2 * w2p - n * (n + 1)).cast("long").alias("z_num"),
        var3.cast("long").alias("var3"),
        F.round(
            (2 * w2p - n * (n + 1)) / F.sqrt(var3.cast("double") / 3.0), 6
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# a_mrr_at_k — Mean Reciprocal Rank @ 10 as EXACT integers
# ---------------------------------------------------------------------------

_MRR_K = 10
_MRR_LCM = 2520  # lcm(1..10): 2520/r is an exact integer for r <= 10


@query(
    "a_mrr_at_k",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id
             ) AS rn
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(rn) AS fr
      FROM ranked
      WHERE event_type = 'purchase' AND rn <= {_MRR_K}
      GROUP BY user_id
    ), users AS (
      SELECT COUNT(DISTINCT user_id) AS n_users FROM events
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(COUNT(fr) AS BIGINT) AS n_hits,
           CAST(COALESCE(SUM({_MRR_LCM} // fr), 0) AS BIGINT) AS mrr_num,
           CAST(n_users * {_MRR_LCM} AS BIGINT) AS mrr_den
    FROM users LEFT JOIN firsts ON TRUE
    GROUP BY n_users
    """,
)
def a_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank @ {k} — the retrieval-eval metric the
    ranking family lacked (nDCG measures graded position quality,
    PR-AUC threshold quality; MRR measures "how fast do I hit the
    first relevant item"): per user, events ranked by (value DESC,
    event_id) — a cross-engine TOTAL order — and the first 'purchase'
    within the top {k} contributes 1/rank. Band-grid endgame: 1/rank
    sums are shipped as EXACT integers on the lcm(1..{k}) = {lcm}
    grid (mrr_num / mrr_den IS the MRR, no float column to disagree
    on).

    Scale: one scan + one per-user window (user-partitioned, never
    global) + one bounded aggregate."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.col("event_id")
    )
    ranked = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    firsts = (
        ranked.filter(
            (F.col("event_type") == "purchase") & (F.col("rn") <= _MRR_K)
        )
        .groupBy("user_id")
        .agg(F.min("rn").alias("fr"))
    )
    users = e.agg(F.countDistinct("user_id").alias("n_users"))
    hits = firsts.agg(
        F.count("*").alias("n_hits"),
        F.sum(F.floor(F.lit(_MRR_LCM) / F.col("fr"))).alias("mrr_num"),
    )
    return users.crossJoin(F.broadcast(hits)).select(
        F.col("n_users").cast("long").alias("n_users"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce(F.col("mrr_num"), F.lit(0)).cast("long").alias("mrr_num"),
        (F.col("n_users") * _MRR_LCM).cast("long").alias("mrr_den"),
    )


a_mrr_at_k.__doc__ = a_mrr_at_k.__doc__.replace("{k}", str(_MRR_K)).replace(
    "{lcm}", str(_MRR_LCM)
)


# ---------------------------------------------------------------------------
# a_cochran_q — Cochran's Q (binary repeated measures), exact integers
# ---------------------------------------------------------------------------


@query(
    "a_cochran_q",
    oracle="""
    WITH m AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), k_ AS (
      SELECT COUNT(DISTINCT event_type) AS k FROM events
    ), rows_ AS (
      SELECT user_id, COUNT(*) AS r FROM m GROUP BY user_id
    ), cols_ AS (
      SELECT event_type, COUNT(*) AS c FROM m GROUP BY event_type
    ), rs AS (
      SELECT SUM(r) AS sr, SUM(r * r) AS sr2 FROM rows_
    ), cs AS (
      SELECT SUM(c) AS sc, SUM(c * c) AS sc2 FROM cols_
    )
    SELECT CAST(k AS BIGINT) AS k_treatments,
           CAST((SELECT COUNT(*) FROM rows_) AS BIGINT) AS n_blocks,
           CAST((k - 1) * (k * sc2 - sc * sc) AS BIGINT) AS q_num,
           CAST(k * sr - sr2 AS BIGINT) AS q_den
    FROM k_ CROSS JOIN rs CROSS JOIN cs
    """,
)
def a_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q — the BINARY repeated-measures test completing the
    blocked-design ladder (Friedman ranks ordinal outcomes across
    blocks; Q tests binary ones): blocks = users, treatments = the k
    event types, x_ub = 1 iff user u ever fired type b. Q =
    (k−1)·[k·ΣC_j² − (ΣC_j)²] / [k·ΣR_u − ΣR_u²] over the row/column
    totals of the binary matrix — every term an exact integer, so
    the statistic ships as the BIGINT pair (q_num, q_den).

    Scale: one DISTINCT scan (map-side partial) + two bounded
    aggregates; nothing corpus-wide after the first shuffle."""
    e = _t(spark, sf_dir, "events")
    m = e.select("user_id", "event_type").distinct()
    k_ = e.agg(F.countDistinct("event_type").alias("k"))
    rows_ = m.groupBy("user_id").agg(F.count("*").alias("r"))
    rs = rows_.agg(
        F.count("*").alias("n_blocks"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("sr2"),
    )
    cs = m.groupBy("event_type").agg(F.count("*").alias("c")).agg(
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    j = k_.crossJoin(F.broadcast(rs)).crossJoin(F.broadcast(cs))
    k = F.col("k")
    return j.select(
        k.cast("long").alias("k_treatments"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        ((k - 1) * (k * F.col("sc2") - F.col("sc") * F.col("sc")))
        .cast("long")
        .alias("q_num"),
        (k * F.col("sr") - F.col("sr2")).cast("long").alias("q_den"),
    )


# ---------------------------------------------------------------------------
# a_page_hinkley — sequential drift detector over the daily series
# ---------------------------------------------------------------------------

_PH_CALIB_DAYS = 30
_PH_DELTA_CENTS = 50_000  # drift allowance per day, cents
_PH_LAMBDA_X30 = 2_000_000_000  # alarm threshold on the x30 grid


@query(
    "a_page_hinkley",
    oracle=f"""
    WITH daily AS (
      SELECT l_shipdate AS day,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS xc
      FROM lineitem GROUP BY 1
    ), ord AS (
      SELECT day, xc, ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily
    ), ref AS (
      SELECT SUM(xc) AS refsum FROM ord WHERE t <= {_PH_CALIB_DAYS}
    ), m AS (
      SELECT day, t,
             SUM({_PH_CALIB_DAYS} * xc - refsum
                 - {_PH_CALIB_DAYS} * {_PH_DELTA_CENTS})
               OVER (ORDER BY t) AS m30
      FROM ord CROSS JOIN ref
      WHERE t > {_PH_CALIB_DAYS}
    ), ph AS (
      SELECT day, t,
             m30 - MIN(m30) OVER (
               ORDER BY t ROWS UNBOUNDED PRECEDING) AS ph30
      FROM m
    )
    SELECT CAST((SELECT COUNT(*) FROM ord) AS BIGINT) AS n_days,
           CAST(MAX(ph30) AS BIGINT) AS ph_max_x30,
           STRFTIME(CAST(MIN(CASE WHEN ph30 = (SELECT MAX(ph30) FROM ph)
                    THEN day END) AS DATE), '%Y-%m-%d') AS peak_day,
           MAX(ph30) > {_PH_LAMBDA_X30} AS alarm
    FROM ph
    """,
)
def a_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley sequential drift detector — the online
    changepoint monitor completing the drift family (PSI compares
    two snapshots, CUSUM/binary-segmentation are offline; PH is the
    streaming-shaped cumulative test): calibrate the reference mean
    on the first {c} days, then track m_t = Σ(x_i − x̄_ref − δ) and
    PH_t = m_t − min_{{i≤t}} m_i; alarm when PH exceeds λ. Everything
    rides the ×{c} integer grid (x̄_ref enters only as the
    calibration SUM), so the statistic, the peak day, and the alarm
    are exact integers — no float recursion.

    Scale: one fact scan → the bounded daily series; the sequential
    scan is two cumulative windows over the calendar-bounded table
    (at true streaming scale the same recurrence runs in the
    moment-sink pattern of stream_*_checked)."""
    from pyspark.sql import Window

    from ..operators.ranks import constant_partition_key

    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "xc"
        )
    )
    k = constant_partition_key(F.col("day"))
    w_t = Window.partitionBy(k).orderBy("day")
    ord_ = daily.select("day", "xc", F.row_number().over(w_t).alias("t"))
    ref = ord_.filter(F.col("t") <= _PH_CALIB_DAYS).agg(
        F.sum("xc").alias("refsum")
    )
    n_days = ord_.agg(F.count("*").alias("n_days"))
    w_cum = (
        Window.partitionBy(constant_partition_key(F.col("t")))
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = (
        ord_.filter(F.col("t") > _PH_CALIB_DAYS)
        .crossJoin(F.broadcast(ref))
        .select(
            "day",
            "t",
            F.sum(
                _PH_CALIB_DAYS * F.col("xc")
                - F.col("refsum")
                - F.lit(_PH_CALIB_DAYS * _PH_DELTA_CENTS)
            )
            .over(w_cum)
            .alias("m30"),
        )
    )
    ph = m.select(
        "day",
        "t",
        (F.col("m30") - F.min("m30").over(w_cum)).alias("ph30"),
    )
    # max PH with the EARLIEST peak day: min over (-ph30, day) structs
    agg = ph.agg(
        F.min(
            F.struct(
                (-F.col("ph30")).alias("nph"), F.col("day").alias("d")
            )
        ).alias("b")
    )
    return agg.crossJoin(F.broadcast(n_days)).select(
        F.col("n_days").cast("long").alias("n_days"),
        (-F.col("b.nph")).cast("long").alias("ph_max_x30"),
        F.date_format("b.d", "yyyy-MM-dd").alias("peak_day"),
        (-F.col("b.nph") > F.lit(_PH_LAMBDA_X30)).alias("alarm"),
    )


a_page_hinkley.__doc__ = a_page_hinkley.__doc__.replace(
    "{c}", str(_PH_CALIB_DAYS)
)
