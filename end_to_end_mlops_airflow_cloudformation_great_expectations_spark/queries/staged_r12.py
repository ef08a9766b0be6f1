"""Round-8-queue queries, fifth batch: graph traversal, membership
sketching, the no-iteration trainer, and behavioral segmentation.

- ``g_bfs_hops`` — multi-source BFS hop distance
  (operators/graph.bfs_distances), the traversal primitive the graph
  family still lacked (pagerank = centrality, LPA = labels, CC =
  components, triangles = local structure; BFS = distance). Lazy
  bounded-round fixpoint, exact unrolled-CTE DuckDB twin over the SAME
  derived order graph as g_pagerank_banded / g_label_propagation.
- ``a_bloom_filter_checked`` — engine-portable Bloom filter
  (operators/sketches.bloom_build/bloom_probe): build over one
  customer segment, probe EVERY customer, report the membership
  confusion counts. The hash is portable_bucket arithmetic, so the
  ENTIRE structure replays exactly in SQL (stream_cms discipline for
  membership) — full exact oracle, and the no-false-negatives
  guarantee is one of the checked outputs.
- ``train_nb_banded`` — multinomial Naive Bayes language classifier
  (operators/train.naive_bayes_fit/score) trained on the 80% hash
  split of documents, scored on the held-out 20%, reported as the
  (true lang × predicted lang) confusion counts. The third in-engine
  trainer family, and the only one whose fit is CLOSED-FORM (two
  aggregations — no fixpoint, no bands on the fit itself); argmax on
  the FLOOR 1e-6 score grid with a total tie-break, margin pinned in
  tests so reorder noise can't flip a prediction.
- ``a_rfm_segments`` — recency/frequency/monetary quintile
  segmentation of the customer base (the classic CRM cut), NTILE(5)
  per axis over a total order via the DISTRIBUTED rank-attach
  (operators/ranks.attach_global_ranks — no single-task sort), then
  segment-level counts and revenue.

Second batch (same gate):

- ``g_kcore`` — bounded-round k-core peeling
  (operators/graph.kcore_bounded) on the user×active-day behavior
  graph with a data-derived threshold; the dense-cohort extraction
  primitive that completes the graph family.
- ``j_spatial_radius`` — grid-bucketed spatial radius join: 1°-cell
  candidate generation + haversine verify, brute-force cross-join
  twin, boundary gap test-pinned.
- ``a_hhi`` — Herfindahl-Hirschman + CR4 market concentration per
  region (the source-dominance monitor in pipeline terms).
- ``p_crossval_folds`` — k-fold cross-validation assignment via the
  portable hash (a7_hash_split generalized to k folds).

Third batch (same gate):

- ``a_diff_in_diff`` — two-period difference-in-differences, the
  causal estimator the a/b family lacked; rounding once at the
  money-grid cell sums makes everything downstream bit-stable.
- ``w_activity_streaks`` — longest consecutive-active-day streak per
  user (day-grain gaps-and-islands, the retention classic).
- ``p_dp_noised_counts`` — Laplace-mechanism count release with a
  deterministic inverse-CDF draw (the DP companion to
  a_k_anonymity; a_bootstrap_ci's replayable-randomness discipline).
- ``a_propensity_match`` — propensity-score 1-NN matching (ATT): the
  in-engine logreg fits the propensity, each treated unit matches
  its nearest control by score via two scan-carry passes
  (operators/ranks.attach_running_last — distributed LAST_VALUE
  IGNORE NULLS, no single-task window). The trainer-composition
  flagship and the third causal estimator.
- ``a_cuped`` — CUPED variance-reduced experiment readout (θ from
  one moment scan, adjusted lift vs raw lift) — the fourth
  experimentation arm.
- ``g_link_prediction`` — common-neighbor / Jaccard link scores as
  EXACT integers (numerator + union size), the triangle-shape wedge
  join at a min-support cut.
- ``a_anova_oneway`` — one-way ANOVA F across order priorities from
  one moment scan; completes the hypothesis-test battery.
- ``train_qr_banded`` — quantile (median) regression
  (operators/train.quantile_reg_fit): 5 lazy subgradient rounds, the
  ROBUST fifth trainer; the discontinuous pinball ψ gets a
  min-|residual| pin so indicators can't flip cross-engine.
- ``a_effect_sizes`` — Cohen's d + two-proportion z from one 2-group
  moment scan (magnitude-in-noise-units companion to the lifts).
- ``g_assortativity`` — Newman degree assortativity as EXACT integer
  moments + one final division (deterministic ROUND, not a band).
- ``a_vocab_drift`` — vocabulary churn (Jaccard + new-token rate)
  between corpus batches, the token-level drift monitor.
- ``text_zipf_fit`` — Zipf-law slope/intercept/R² of the frequency
  curve via the distributed rank-attach + one OLS moment reduce.
- ``train_stump_banded`` — decision-stump Gini split search as ONE
  wide conditional-sum aggregate scan (the histogram-GBDT building
  block) — the TREE trainer family; integer counts make the gain
  band deterministic.
- ``train_tree2_banded`` — the depth-2 tree: level-0 winner as a
  1-row broadcast routes rows to L/R, level 1 re-runs the search
  PER NODE in one grouped scan — one scan per LEVEL, the
  distributed-GBDT property made concrete.
- ``stream_topk_sink_checked`` — EXACT incremental per-key counts
  (streaming/jobs.key_counts_sink, the bounded-key-domain companion
  to the CMS sink) serving top-k from the streamed snapshot; full
  exact oracle incl. the exactly-once witness.
- ``a_forecast_backtest`` — Holt holdout backtest (last 24 h):
  MAE / sMAPE / MASE of the dyadic-exact smoother — the evaluation
  half of the forecasting family.
- ``g_ppr_banded`` — personalized PageRank (random walk with
  restart) from the BFS seed set: the graph-recommendation /
  seed-expansion primitive, g_pagerank_banded's banding convention.
- ``a_interrupted_ts`` — interrupted time-series (segmented
  regression at the midpoint cut): the fifth causal design, for when
  there is no control group at all.
- ``w_cohort_ltv`` — cumulative lifetime-value curves by signup
  cohort (the revenue companion to a_cohort_retention).
- ``sim_knn_classify`` — kNN classification over embeddings: the
  LAZY (fit-free) classifier completing the family spectrum;
  top-k by the sim_topk_bruteforce convention, majority vote with a
  total tie-break.
- ``a_ece`` — Expected (and Max) Calibration Error: the scalar
  summary of a_calibration_bins' reliability table.
- ``a_auc_pr`` — PR-AUC as Average Precision via the
  pos_rank/global_rank identity — two distributed rank-attaches,
  zero corpus-wide windows.
- ``a_brier_score`` — the proper scoring rule as an EXACT integer
  numerator (two live half-grid flips taught the endgame of the
  band-grid lesson: ship the integers).
- ``a_ndcg`` — nDCG@100 of the scorer ranking (log-discounted, the
  retrieval-leaderboard metric) via one rank-attach.
- ``a_mutual_info`` — discrete mutual information over the bounded
  contingency table; the dependence scalar of the info family.
- ``a_cohens_kappa`` — chance-corrected agreement of the centroid
  classifier, shipped as exact integer sufficient statistics.
- ``g_modularity`` — Newman modularity statistics of the LPA
  partition (exact integers) — community detection's quality loop.

All proven green at sf0.001 + sf0.01 (incl. --plain) before
registration, per the window discipline in queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.encode import hash_split_col
from ..operators.ranks import attach_global_ranks, attach_running_last
from ..operators.sketches import bloom_build, bloom_probe
from ..operators.train import naive_bayes_fit, naive_bayes_score
from .registry import query
from .staged_r06 import _CMS_SEEDS, _cms_oracle_bucket_sql
from .staged_r10 import _SCORES_CTE
from .staged_r11 import _LPA_ORACLE_GRAPH


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return catalog.load(spark, sf_dir, table)


# ---------------------------------------------------------------------------
# g_bfs_hops — multi-source BFS distance, bounded rounds
# ---------------------------------------------------------------------------

_BFS_SOURCES = 5
_BFS_ROUNDS = 4


def _bfs_round_sql(r: int) -> str:
    """One unrolled synchronous relaxation round: min in-neighbor
    distance + 1, sources clamped to 0 (operators/graph.bfs_distances
    recurrence — settled distances re-derive from the shortest-path
    predecessor every round, so no self-reference is needed and the
    iterate is referenced once per round on both engines)."""
    return f"""
    , c{r} AS (
      SELECT e.dst AS vid, MIN(d.dist) + 1 AS nd
      FROM edges e JOIN d{r - 1} d ON d.vid = e.src
      WHERE d.dist IS NOT NULL
      GROUP BY e.dst
    ), d{r} AS (
      SELECT v.vid,
             CASE WHEN v.vid < {_BFS_SOURCES} THEN 0 ELSE c.nd END AS dist
      FROM verts v LEFT JOIN c{r} c ON c.vid = v.vid
    )
    """


@query(
    "g_bfs_hops",
    oracle=(
        "WITH "
        + _LPA_ORACLE_GRAPH
        + f""", d0 AS (
      SELECT vid, CASE WHEN vid < {_BFS_SOURCES} THEN 0 END AS dist
      FROM verts
    )"""
        + "".join(_bfs_round_sql(r) for r in range(1, _BFS_ROUNDS + 1))
        + f"""
    SELECT CAST(vid AS BIGINT) AS id,
           CAST(CASE WHEN dist <= {_BFS_ROUNDS} THEN dist END AS BIGINT)
             AS dist
    FROM d{_BFS_ROUNDS}
    """
    ),
)
def g_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance on the derived order graph (same
    synthetic topology as g_pagerank_banded / g_label_propagation):
    vertices 0..4 are the source set; 4 synchronous relaxation rounds
    settle every vertex within 4 hops; beyond-horizon vertices report
    NULL. The traversal/reachability primitive ("how far is every
    entity from the trusted core") the graph family lacked.

    Cross-engine EXACT oracle: the DuckDB twin unrolls the SAME 4
    rounds as CTEs over the SAME derived graph; distances are
    integers and MIN is order-insensitive, so the comparison is exact
    — no bands.

    Scale: operators/graph.bfs_distances keeps the iterate referenced
    once per round (linear plan growth); each round is one
    edges⋈frontier shuffle plus a map-side-partial MIN by
    destination — the Pregel message pattern relationally."""
    from ..operators.graph import bfs_distances

    o = _t(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_orderkey") % 200).alias("src"),
        (F.lit(200) + F.col("o_orderkey") % 190).alias("dst"),
    ).distinct()
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sources = spark.range(_BFS_SOURCES).select(F.col("id").alias("vid"))
    out = bfs_distances(both, sources, iterations=_BFS_ROUNDS)
    return out.select(F.col("id").cast("long").alias("id"), "dist")


# ---------------------------------------------------------------------------
# a_bloom_filter_checked — portable Bloom membership, full exact oracle
# ---------------------------------------------------------------------------

_BLOOM_BITS = 1024
_BLOOM_SEEDS = _CMS_SEEDS  # d=3 independent portable hashes, CMS convention
_BLOOM_SEGMENT = "BUILDING"


def _bloom_pos_sql(expr: str) -> list[str]:
    return [
        _cms_oracle_bucket_sql(expr, s, _BLOOM_BITS) for s in _BLOOM_SEEDS
    ]


@query(
    "a_bloom_filter_checked",
    oracle=f"""
    WITH m AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
    ), bits AS (
      SELECT DISTINCT pos FROM (
        SELECT {_bloom_pos_sql('c_custkey')[0]} AS pos FROM m
        UNION ALL SELECT {_bloom_pos_sql('c_custkey')[1]} FROM m
        UNION ALL SELECT {_bloom_pos_sql('c_custkey')[2]} FROM m
      )
    ), p AS (
      SELECT c_custkey,
             c_mktsegment = '{_BLOOM_SEGMENT}' AS member,
             {_bloom_pos_sql('c_custkey')[0]} AS p0,
             {_bloom_pos_sql('c_custkey')[1]} AS p1,
             {_bloom_pos_sql('c_custkey')[2]} AS p2
      FROM customer
    ), f AS (
      SELECT member,
             (p0 IN (SELECT pos FROM bits))
             AND (p1 IN (SELECT pos FROM bits))
             AND (p2 IN (SELECT pos FROM bits)) AS bloom_pos
      FROM p
    )
    SELECT CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN bloom_pos THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pos,
           CAST(SUM(CASE WHEN bloom_pos AND NOT member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN member AND NOT bloom_pos THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg
    FROM f
    """,
)
def a_bloom_filter_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter membership audit: build the filter over
    the {segment} customer segment (operators/sketches.bloom_build —
    k=3 portable_bucket hashes into m=1024 bits, the filter held as a
    ≤m-row relational bit table), probe EVERY customer
    (sketches.bloom_probe — broadcast the bit table to the probe
    scan), and report the one-row membership confusion:
    ``n_false_neg`` MUST be 0 (the structural Bloom guarantee, now a
    driver-checked value) and ``n_false_pos`` measures the filter at
    its textbook (1-e^(-kn/m))^k operating point.

    FULL exact oracle: the hash is plain integer arithmetic
    (functions.columns.portable_bucket), so DuckDB replays build AND
    probe bit-for-bit — the stream_cms_sink discipline applied to
    membership instead of frequency. No bands anywhere.

    Scale: this is the semi-join-reduction shape used before an
    expensive join at 100 TB — the filter is ≤ m rows no matter how
    many members went in, ships to the probe scan as one broadcast,
    and the probe side never shuffles beyond its own map-side-partial
    final count.""".replace("{segment}", _BLOOM_SEGMENT)
    c = _t(spark, sf_dir, "customer")
    members = c.filter(F.col("c_mktsegment") == _BLOOM_SEGMENT).select(
        "c_custkey"
    )
    bits = bloom_build(members, "c_custkey", _BLOOM_SEEDS, _BLOOM_BITS)
    probes = c.select(
        "c_custkey",
        (F.col("c_mktsegment") == _BLOOM_SEGMENT).alias("member"),
    )
    probed = bloom_probe(probes, "c_custkey", bits, _BLOOM_SEEDS, _BLOOM_BITS)
    t = F.lit(1)
    z = F.lit(0)
    return probed.agg(
        F.sum(F.when(F.col("member"), t).otherwise(z))
        .cast("long")
        .alias("n_members"),
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("bloom_pos"), t).otherwise(z))
        .cast("long")
        .alias("n_bloom_pos"),
        F.sum(F.when(F.col("bloom_pos") & ~F.col("member"), t).otherwise(z))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("member") & ~F.col("bloom_pos"), t).otherwise(z))
        .cast("long")
        .alias("n_false_neg"),
    )


# ---------------------------------------------------------------------------
# train_nb_banded — multinomial Naive Bayes language classifier
# ---------------------------------------------------------------------------

_NB_GRID = 1_000_000
_NB_SPLIT_SQL = "(doc_id * 2654435761) % 4294967296 % 100"


@query(
    "train_nb_banded",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> len(x) > 0)) AS w
      FROM documents
    ), tr AS (
      SELECT * FROM tok WHERE {_NB_SPLIT_SQL} < 80
    ), te AS (
      SELECT * FROM tok WHERE {_NB_SPLIT_SQL} >= 80
    ), ndc AS (
      SELECT lang, COUNT(DISTINCT doc_id) AS n_docs_c,
             COUNT(*) AS n_tok_c
      FROM tr GROUP BY lang
    ), tot AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs, COUNT(DISTINCT w) AS v
      FROM tr
    ), cs AS (
      SELECT lang AS cand,
             ln(CAST(n_docs_c AS DOUBLE) / n_docs) AS log_prior,
             ln(CAST(n_tok_c AS DOUBLE) + 1.0 * v) AS denom
      FROM ndc CROSS JOIN tot
    ), lik AS (
      SELECT lang AS cand, w, ln(COUNT(*) + 1.0) AS log_num
      FROM tr GROUP BY lang, w
    ), ex AS (
      SELECT t.doc_id, c.cand, c.log_prior, c.denom, l.log_num
      FROM te t CROSS JOIN cs c
      LEFT JOIN lik l ON l.cand = c.cand AND l.w = t.w
    ), pc AS (
      SELECT doc_id, cand,
             FLOOR((FIRST(log_prior) - COUNT(*) * FIRST(denom)
                    + SUM(COALESCE(log_num, 0.0))) * {_NB_GRID}.0)
               AS gscore
      FROM ex GROUP BY doc_id, cand
    ), pred AS (
      SELECT doc_id, cand AS pred FROM (
        SELECT doc_id, cand,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY gscore DESC, cand DESC
               ) AS rn
        FROM pc
      ) WHERE rn = 1
    )
    SELECT d.lang AS true_lang, p.pred AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """,
)
def train_nb_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine multinomial Naive Bayes (operators/train
    .naive_bayes_fit / naive_bayes_score): train a language classifier
    on the 80% hash split of documents (A7 split discipline — same
    portable bucket as a7_hash_split), score the held-out 20%, and
    report the (true lang × predicted lang) confusion counts — the
    third trainer family after logreg's GD and kmeans' Lloyd rounds,
    and the one whose fit is CLOSED-FORM: two aggregations over one
    token-table scan each, no fixpoint. (The synthetic corpus shares
    one vocabulary across langs, so fixture accuracy ≈ base rate; the
    checked contract is the exact confusion counts, not accuracy.)

    Determinism: class scores are sums of logs (genuinely irrational
    → FLOOR 1e-6 grid per the band-grid lesson), argmax with a total
    tie-break (score DESC, label DESC — struct-max, string-safe).
    tests/test_train_ops.py pins the minimum winner margin far above
    reorder noise, so confusion counts are integer-exact cross-engine.

    Scale: fit = two partial-agg groupBys (model is |C| + observed
    (class, token) pairs — ≪ corpus, broadcastable); score = one
    token scan × |C| bounded candidate classes with the sparse
    likelihood LEFT join (unseen tokens coalesce to ln(alpha)=0, the
    sparsity trick that avoids densifying |V|×|C|), then a per-doc
    max_by. No windows, no collects, no Python."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.col("lang").alias("label"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("w"),
    ).withColumn("split", hash_split_col(F.col("doc_id")))
    train_tok = tok.filter(F.col("split") == "train").drop("split")
    test_tok = tok.filter(F.col("split") == "test").drop("split")
    class_stats, likelihoods = naive_bayes_fit(train_tok)
    scored = naive_bayes_score(
        test_tok.select("doc_id", "w"), class_stats, likelihoods,
        grid=_NB_GRID,
    )
    return (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy(
            F.col("lang").alias("true_lang"),
            F.col("pred").alias("pred_lang"),
        )
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# a_rfm_segments — recency/frequency/monetary quintile segmentation
# ---------------------------------------------------------------------------

_RFM_TILES = 5


@query(
    "a_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS r_ts,
             COUNT(*) AS f,
             ROUND(SUM(o_totalprice), 2) AS m
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, m,
             NTILE({_RFM_TILES}) OVER (ORDER BY r_ts ASC, o_custkey ASC)
               AS r_score,
             NTILE({_RFM_TILES}) OVER (ORDER BY f ASC, o_custkey ASC)
               AS f_score,
             NTILE({_RFM_TILES}) OVER (ORDER BY m ASC, o_custkey ASC)
               AS m_score
      FROM base
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(m), 2) AS sum_monetary
    FROM scored
    GROUP BY 1, 2, 3
    """,
)
def a_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation — the classic CRM/behavioral cut of
    the customer base: per customer, recency (last order date),
    frequency (order count), monetary (revenue, money grid); NTILE(5)
    each axis over a TOTAL order (metric, custkey) so tile boundaries
    are deterministic; report per-(r,f,m)-segment customer counts and
    revenue. ≤125 output rows — the marketing-facing rollup.

    Determinism: attach_global_ranks' ntile implements exactly SQL
    NTILE's base/base+1 split over the same total order, so the
    DuckDB twin matches tile-for-tile; money sums live on the 0.01
    grid where ROUND is stable (band-grid lesson: half-grid bad spots
    need 3-decimal rationals, impossible for sums of 2-decimal
    values).

    Scale: the per-customer base is one partial-agg groupBy of the
    fact table; each NTILE is the DISTRIBUTED rank-attach
    (repartitionByRange + per-partition offsets — no single-task
    global sort, the o1_global_sort discipline), run 3× on the
    dimension-sized base table. At 100 TB you'd swap exact NTILE for
    approx-quantile breakpoints; the exact tiles here are the oracle-
    checkable spec."""
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey")).agg(
        F.max("o_orderdate").alias("r_ts"),
        F.count("*").alias("f"),
        F.round(F.sum("o_totalprice"), 2).alias("m"),
    )
    t = attach_global_ranks(
        base,
        sort_cols=[F.asc("r_ts"), F.asc("o_custkey")],
        key_cols=[F.col("r_ts"), F.col("o_custkey")],
        ntile=_RFM_TILES,
        ntile_col="r_score",
    )
    t = attach_global_ranks(
        t,
        sort_cols=[F.asc("f"), F.asc("o_custkey")],
        key_cols=[F.col("f"), F.col("o_custkey")],
        ntile=_RFM_TILES,
        ntile_col="f_score",
    )
    t = attach_global_ranks(
        t,
        sort_cols=[F.asc("m"), F.asc("o_custkey")],
        key_cols=[F.col("m"), F.col("o_custkey")],
        ntile=_RFM_TILES,
        ntile_col="m_score",
    )
    return t.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("m"), 2).alias("sum_monetary"),
    )


# ---------------------------------------------------------------------------
# g_kcore — bounded-round k-core peeling with a data-derived threshold
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 3

_KCORE_GRAPH_SQL = """
    e0 AS (
      SELECT DISTINCT user_id % 200 AS s,
             200 + CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) % 100 AS d
      FROM events
    ), e AS (
      SELECT s, d FROM e0
      UNION ALL
      SELECT d AS s, s AS d FROM e0
    ), deg0 AS (
      SELECT s, COUNT(*) AS c FROM e GROUP BY s
    ), kv AS (
      SELECT CEIL(AVG(c) * 0.6) AS k FROM deg0
    )
"""


def _kcore_round_sql(r: int) -> str:
    """One unrolled peel round: survivors = degree ≥ k on the current
    edge set; edges keep only survivor-survivor pairs
    (operators/graph.kcore_bounded recurrence)."""
    prev_e = "e" if r == 1 else f"e{r - 1}"
    prev_deg = "deg0" if r == 1 else f"deg{r - 1}"
    return f"""
    , sur{r} AS (
      SELECT s FROM {prev_deg} CROSS JOIN kv WHERE c >= k
    ), e{r} AS (
      SELECT t.s, t.d FROM {prev_e} t
      WHERE t.s IN (SELECT s FROM sur{r})
        AND t.d IN (SELECT s FROM sur{r})
    ), deg{r} AS (
      SELECT s, COUNT(*) AS c FROM e{r} GROUP BY s
    )
    """


@query(
    "g_kcore",
    oracle=(
        "WITH "
        + _KCORE_GRAPH_SQL
        + "".join(_kcore_round_sql(r) for r in range(1, _KCORE_ROUNDS + 1))
        + f"""
    SELECT CAST(s AS BIGINT) AS id, CAST(c AS BIGINT) AS deg
    FROM deg{_KCORE_ROUNDS}
    """
    ),
)
def g_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peeling (operators/graph.kcore_bounded) on
    the user×active-day bipartite behavior graph (users 0..199, day
    vertices 200..299 — a topology with REAL degree spread, unlike the
    mod-200 order graph whose degrees are uniform): k is data-derived
    (⌈0.6·mean degree⌉, joined in as a 1-row broadcast — never a
    collect; the bipartite cascade is sharp, so a threshold above the
    mean peels the whole graph — 0.6 is the measured non-trivial
    operating point at the driver's sf0.01 gate: 180 → 119 vertices
    over 3 rounds), 3 peel rounds cascade the removals, output = surviving
    (id, degree). The dense-cohort / engagement-core extraction
    primitive; completes the graph family (centrality, labels,
    components, triangles, distance, coreness).

    Cross-engine EXACT oracle: the twin unrolls the SAME 3 rounds over
    the SAME derived graph; degrees and the threshold are integers
    (the threshold is one double division and one
    multiply from integer sums — bit-identical cross-engine), so the comparison is exact.

    Scale: iterative ⇒ eager at call time (the pagerank exception);
    per round one partial-agg degree count + two LEFT SEMI joins
    against the shrinking survivor set (AQE broadcasts it as it
    shrinks); lineage localCheckpoint-truncated every 2 rounds, the
    measured pagerank discipline."""
    from ..operators.graph import kcore_bounded

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 200).alias("src"),
        (
            F.lit(200)
            + F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long")
            % 100
        ).alias("dst"),
    ).distinct()
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg0 = both.groupBy(F.col("src").alias("s")).agg(
        F.count("*").alias("c")
    )
    kdf = deg0.agg(F.ceil(F.avg("c") * F.lit(0.6)).alias("k"))
    out = kcore_bounded(both, kdf, rounds=_KCORE_ROUNDS)
    return out.select(F.col("id").cast("long").alias("id"), "deg")


# ---------------------------------------------------------------------------
# j_spatial_radius — grid-bucketed spatial radius join
# ---------------------------------------------------------------------------

_GEO_R_KM = 100.0
#: 1°×1° cells: Δlat ≤ R/111.0 = 0.901° and, with lat < 10°,
#: Δlon ≤ R/(111.32·cos 10°) = 0.912° — both < 1 cell, so a 3×3
#: neighborhood is complete (proved in tests/test_staged_r12.py).
_GEO_CELL_DEG = 1.0


def _lat_sql(expr: str, seed: int) -> str:
    return f"({_cms_oracle_bucket_sql(expr, seed, 1000)}) / 100.0"


def _lon_sql(expr: str, seed: int) -> str:
    inner = _cms_oracle_bucket_sql(expr, seed, 100003)
    return f"({_cms_oracle_bucket_sql(f'({inner})', seed, 2000)}) / 100.0"


def _hav_sql(la1: str, lo1: str, la2: str, lo2: str) -> str:
    return f"""2.0 * 6371.0 * ASIN(SQRT(
               SIN(RADIANS({la2} - {la1}) / 2) *
               SIN(RADIANS({la2} - {la1}) / 2) +
               COS(RADIANS({la1})) * COS(RADIANS({la2})) *
               SIN(RADIANS({lo2} - {lo1}) / 2) *
               SIN(RADIANS({lo2} - {lo1}) / 2)
           ))"""


@query(
    "j_spatial_radius",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             {_lat_sql('c_custkey', 111)} AS lat,
             {_lon_sql('c_custkey', 7777)} AS lon
      FROM customer
    ), s AS (
      SELECT s_suppkey,
             {_lat_sql('s_suppkey', 333)} AS lat,
             {_lon_sql('s_suppkey', 8111)} AS lon
      FROM supplier
    ), p AS (
      SELECT c_custkey, s_suppkey,
             {_hav_sql('c.lat', 'c.lon', 's.lat', 's.lon')} AS dist
      FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey, ROUND(dist, 4) AS dist_km
    FROM p WHERE dist <= {_GEO_R_KM}
    """,
)
def j_spatial_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join — "every supplier within 100 km of each
    customer" — by GRID-BUCKETED candidate generation: synthetic
    (lat, lon) in [0,10)°×[0,20)° from portable hashes (lon uses a
    NESTED hash: a constant-shifted copy of the lat hash would couple
    the axes into a 1-D lattice — measured: min pair distance 150 km,
    zero matches), customers keyed by their 1°×1° cell, suppliers
    exploded to the 3×3 cell neighborhood, haversine verify on the
    candidates only. The cell size makes the neighborhood COMPLETE
    for R=100 km up to |lat| ≤ 26.06° = acos(R / (111.32 · cell_deg))
    — lon cells shrink by cos(lat), so past that latitude a 100 km
    circle spans more than one 1° lon cell and candidates would be
    missed (VERDICT r08 watch item; the fixture's envelope is
    [0, 10)°, checked programmatically in tests/test_staged_r12.py so
    a data regen that pushes latitudes past the bound fails loudly).
    At high latitudes size cells by cos(lat) or switch the lon
    neighborhood to ±ceil(R / (111.32 · cos(lat_max) · cell_deg)).

    Determinism: the boundary predicate dist ≤ R is float-trig on
    both engines; the fixture's closest boundary gap is 19 m —
    10 orders above cross-engine trig ULP noise — and the gap is
    test-pinned so a data regen that lands a pair on the boundary
    fails loudly in tests, not silently in the driver.

    Scale: the oracle's cross join is O(|C|·|S|) and exists only as
    the sf0.01 spec; the ENGINE plan is the scalable one — candidates
    are bounded by cell co-location (9·density per probe), the small
    side broadcasts, and at planetary scale the same shape shards by
    cell exactly like the LSH band buckets shard MinHash."""
    from ..functions.columns import portable_bucket

    def lat_col(key, seed: int):
        return (portable_bucket(key + F.lit(seed), 1000) / F.lit(100.0))

    def lon_col(key, seed: int):
        inner = portable_bucket(key + F.lit(seed), 100003)
        return (
            portable_bucket(inner + F.lit(seed), 2000) / F.lit(100.0)
        )

    from ..operators import geo

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        lat_col(F.col("c_custkey"), 111).alias("c_lat"),
        lon_col(F.col("c_custkey"), 7777).alias("c_lon"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        lat_col(F.col("s_suppkey"), 333).alias("s_lat"),
        lon_col(F.col("s_suppkey"), 8111).alias("s_lon"),
    )
    cell = lambda col: F.floor(col / F.lit(_GEO_CELL_DEG))  # noqa: E731
    c_cells = c.select(
        "*", cell(F.col("c_lat")).alias("cl"), cell(F.col("c_lon")).alias("cg")
    )
    offsets = spark.range(3).select((F.col("id") - 1).alias("dl")).crossJoin(
        spark.range(3).select((F.col("id") - 1).alias("dg"))
    )
    s_cells = s.crossJoin(F.broadcast(offsets)).select(
        "s_suppkey",
        "s_lat",
        "s_lon",
        (cell(F.col("s_lat")) + F.col("dl")).alias("cl"),
        (cell(F.col("s_lon")) + F.col("dg")).alias("cg"),
    )
    cand = c_cells.join(F.broadcast(s_cells), ["cl", "cg"])
    dist = geo.haversine_km(
        F.col("c_lat"), F.col("c_lon"), F.col("s_lat"), F.col("s_lon")
    )
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") <= F.lit(_GEO_R_KM))
        .select(
            "c_custkey",
            "s_suppkey",
            F.round(F.col("dist"), 4).alias("dist_km"),
        )
    )


# ---------------------------------------------------------------------------
# a_hhi — market-concentration audit (Herfindahl-Hirschman + CR4)
# ---------------------------------------------------------------------------


@query(
    "a_hhi",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, s.s_suppkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS srev
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    ), tot AS (
      SELECT region, SUM(srev) AS trev FROM rev GROUP BY region
    ), sh AS (
      SELECT rev.region, srev / trev AS share,
             ROW_NUMBER() OVER (
               PARTITION BY rev.region ORDER BY srev DESC, s_suppkey ASC
             ) AS rn
      FROM rev JOIN tot USING (region)
    )
    SELECT region,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(share * share), 6) AS hhi,
           ROUND(SUM(CASE WHEN rn <= 4 THEN share ELSE 0 END), 6) AS cr4
    FROM sh GROUP BY region
    """,
)
def a_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit per region: supplier revenue shares
    → Herfindahl-Hirschman index (Σ share²) and the 4-firm
    concentration ratio (top-4 share sum, revenue-DESC/suppkey-ASC
    total tie-break) — the antitrust/market-structure analytic, and
    in a training-data pipeline the "is one source dominating this
    slice" concentration monitor (the source-mixture cousin of
    p_domain_reweight).

    Determinism: per-supplier revenue lands on the money grid first
    (round(sum, 2) — the repo-wide money convention), so shares are
    ratios of identical doubles on both engines; HHI/CR4 round at
    1e-6 on sums whose cross-engine noise is ~1e-16.

    Scale: one fact scan with broadcast dimension joins (supplier →
    nation → region chain), partial-agg to the (region, supplier)
    grain, then windows over the bounded supplier-per-region table —
    nothing corpus-sized past the first aggregation."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    rev = (
        li.join(
            F.broadcast(su), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(re), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("r_name").alias("region"), "s_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("srev")
        )
    )
    tot = rev.groupBy("region").agg(F.sum("srev").alias("trev"))
    w = Window.partitionBy("region").orderBy(
        F.desc("srev"), F.asc("s_suppkey")
    )
    sh = rev.join(tot, "region").select(
        "region",
        (F.col("srev") / F.col("trev")).alias("share"),
        F.row_number().over(w).alias("rn"),
    )
    return sh.groupBy("region").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
        F.round(
            F.sum(F.when(F.col("rn") <= 4, F.col("share")).otherwise(0.0)),
            6,
        ).alias("cr4"),
    )


# ---------------------------------------------------------------------------
# p_crossval_folds — k-fold cross-validation assignment
# ---------------------------------------------------------------------------

_CV_FOLDS = 5
_CV_SEED = 555


@query(
    "p_crossval_folds",
    oracle=f"""
    WITH t AS (
      SELECT o_totalprice,
             {_cms_oracle_bucket_sql('o_orderkey', _CV_SEED, _CV_FOLDS)}
               AS fold
      FROM orders
    ), tot AS (
      SELECT COUNT(*) AS n FROM t
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(ANY_VALUE(n) - COUNT(*) AS BIGINT) AS n_train,
           ROUND(SUM(o_totalprice), 2) AS sum_test_price
    FROM t CROSS JOIN tot
    GROUP BY fold
    """,
)
def p_crossval_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment — the evaluation-protocol
    primitive the trainer family (logreg/kmeans/ALS/NB) consumes:
    every order lands in exactly one of 5 folds via the portable
    multiplicative hash (the a7_hash_split discipline generalized
    from 80/20 to k folds — reproducible in any engine, unlike
    randomSplit), and the per-fold report carries test size,
    complementary train size, and the money-grid test-revenue sum a
    per-fold metric aggregation would join against.

    Exact oracle: identical integer hash arithmetic both sides; the
    train count derives from one 1-row broadcast total (never a
    collect). Scale: one scan, one bounded groupBy — the fold column
    itself is free to attach to any training query's input."""
    from ..functions.columns import portable_bucket

    o = _t(spark, sf_dir, "orders")
    t = o.select(
        "o_totalprice",
        portable_bucket(
            F.col("o_orderkey") + F.lit(_CV_SEED), _CV_FOLDS
        ).alias("fold"),
    )
    tot = t.agg(F.count("*").alias("n"))
    return (
        t.crossJoin(F.broadcast(tot))
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_test"),
            (F.first("n") - F.count("*")).cast("long").alias("n_train"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_test_price"),
        )
        .select(F.col("fold").cast("long").alias("fold"), "n_test",
                "n_train", "sum_test_price")
    )


# ---------------------------------------------------------------------------
# a_diff_in_diff — two-period difference-in-differences estimator
# ---------------------------------------------------------------------------

_DID_SEED = 99


@query(
    "a_diff_in_diff",
    oracle=f"""
    WITH d AS (
      SELECT value,
             {_cms_oracle_bucket_sql('user_id', _DID_SEED, 2)} = 1
               AS treated,
             CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), cut AS (
      SELECT CAST((MIN(day) + MAX(day)) // 2 AS BIGINT) AS mid FROM d
    ), cells AS (
      SELECT treated, day >= mid AS post,
             COUNT(*) AS n, ROUND(SUM(value), 2) AS s
      FROM d CROSS JOIN cut GROUP BY 1, 2
    ), w AS (
      SELECT
        MAX(CASE WHEN treated AND post THEN n END) AS n_t_post,
        MAX(CASE WHEN treated AND NOT post THEN n END) AS n_t_pre,
        MAX(CASE WHEN NOT treated AND post THEN n END) AS n_c_post,
        MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_c_pre,
        MAX(CASE WHEN treated AND post THEN s END) AS s_t_post,
        MAX(CASE WHEN treated AND NOT post THEN s END) AS s_t_pre,
        MAX(CASE WHEN NOT treated AND post THEN s END) AS s_c_post,
        MAX(CASE WHEN NOT treated AND NOT post THEN s END) AS s_c_pre
      FROM cells
    )
    SELECT CAST(n_t_pre AS BIGINT) AS n_t_pre,
           CAST(n_t_post AS BIGINT) AS n_t_post,
           CAST(n_c_pre AS BIGINT) AS n_c_pre,
           CAST(n_c_post AS BIGINT) AS n_c_post,
           ROUND((s_t_post / n_t_post - s_t_pre / n_t_pre)
                 - (s_c_post / n_c_post - s_c_pre / n_c_pre), 6) AS did
    FROM w
    """,
)
def a_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-period difference-in-differences — the workhorse causal
    estimator the a/b family lacked (a_abtest_lift compares arms at
    one point; DiD nets out a shared time trend): treatment = the
    portable user hash-split, periods split at the corpus's midpoint
    day (1-row broadcast — never a collect), outcome = event value.
    Output: the four cell sizes and the DiD point estimate.

    Determinism: rounding happens ONCE, at the money-grid cell sums
    (the repo-wide round(sum, 2) convention) — every downstream mean
    and the estimate itself are then deterministic functions of
    identical doubles on both engines, so the final ROUND(…, 6) is
    bit-stable by construction (no half-grid exposure: identical
    inputs → identical output).

    Scale: one fact scan into 4 cells (map-side partial agg); the
    midpoint joins back as a 1-row broadcast. Nothing keyed, nothing
    skewed, nothing collected."""
    from ..functions.columns import portable_bucket

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "value",
        (portable_bucket(F.col("user_id") + F.lit(_DID_SEED), 2) == 1).alias(
            "treated"
        ),
        F.floor(F.unix_timestamp("ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
    )
    cut = d.agg(
        F.floor((F.min("day") + F.max("day")) / F.lit(2))
        .cast("long")
        .alias("mid")
    )
    cells = (
        d.crossJoin(F.broadcast(cut))
        .groupBy("treated", (F.col("day") >= F.col("mid")).alias("post"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
    )

    def cell(t: bool, p: bool, col: str):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    w = cells.agg(
        cell(True, True, "n").alias("n_t_post"),
        cell(True, False, "n").alias("n_t_pre"),
        cell(False, True, "n").alias("n_c_post"),
        cell(False, False, "n").alias("n_c_pre"),
        cell(True, True, "s").alias("s_t_post"),
        cell(True, False, "s").alias("s_t_pre"),
        cell(False, True, "s").alias("s_c_post"),
        cell(False, False, "s").alias("s_c_pre"),
    )
    return w.select(
        F.col("n_t_pre").cast("long").alias("n_t_pre"),
        F.col("n_t_post").cast("long").alias("n_t_post"),
        F.col("n_c_pre").cast("long").alias("n_c_pre"),
        F.col("n_c_post").cast("long").alias("n_c_post"),
        F.round(
            (F.col("s_t_post") / F.col("n_t_post")
             - F.col("s_t_pre") / F.col("n_t_pre"))
            - (F.col("s_c_post") / F.col("n_c_post")
               - F.col("s_c_pre") / F.col("n_c_pre")),
            6,
        ).alias("did"),
    )


# ---------------------------------------------------------------------------
# w_activity_streaks — longest consecutive-day streak per user
# ---------------------------------------------------------------------------


@query(
    "w_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day
             ) AS grp
      FROM days
    ), runs AS (
      SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
)
def w_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the retention/
    engagement classic (the DAY-grain gaps-and-islands twin of
    w_sessionize's second-grain sessions): distinct active days, the
    day − row_number island key, run lengths, then per-user longest
    streak / active-day total / streak count.

    Exact oracle: everything is integer day arithmetic and counts on
    a total per-user order — no bands.

    Scale: one distinct (user, day) projection of the fact scan, one
    per-user window (the user_id exchange), two bounded aggregations.
    Day grain means per-user state is ≤ a few thousand rows even for
    years of history — the same bounded-state argument as the hourly
    series family."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("grp")
    )
    runs = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
    )


# ---------------------------------------------------------------------------
# p_dp_noised_counts — deterministic Laplace-mechanism count release
# ---------------------------------------------------------------------------

_DP_SEED = 424_243
_DP_W = 1 << 20  # uniform grid for the inverse-CDF draw
_DP_EPS = 1.0    # epsilon; sensitivity 1 (event-level) => b = 1/eps
_DP_BAND = 1_000_000


@query(
    "p_dp_noised_counts",
    oracle=f"""
    WITH d AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day FROM events
    ), c AS (
      SELECT day, COUNT(*) AS n FROM d GROUP BY day
    ), u AS (
      SELECT day, n,
             ({_cms_oracle_bucket_sql('day', _DP_SEED, _DP_W)} + 0.5)
               / {_DP_W}.0 - 0.5 AS v
      FROM c
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           CAST(FLOOR((n + CASE WHEN v < 0.0
                              THEN LN(1.0 + 2.0 * v) / {_DP_EPS}
                              ELSE -LN(1.0 - 2.0 * v) / {_DP_EPS} END)
                      * {_DP_BAND}.0) AS BIGINT) AS released_band
    FROM u
    """,
)
def p_dp_noised_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release — the differential-privacy
    companion to a_k_anonymity's re-identification audit: per-day
    event counts plus Laplace(1/ε) noise via the DETERMINISTIC
    inverse-CDF draw (portable-hash uniform on a 2^20 grid → signed
    log transform), ε=1 at event-level sensitivity 1. Deterministic
    noise is what makes the mechanism an oracle-checkable engine
    operator (the a_bootstrap_ci discipline: replayable randomness,
    engine-portable integer hash); a production release would swap
    the hash for a sealed RNG and drop the true count — kept here as
    the non-vacuity witness, exactly like the bootstrap keeps its
    resample sums.

    Noise is genuinely irrational (a log of a dyadic rational) ⇒
    FLOOR 1e-6 banding per the band-grid lesson; the uniform draw
    can never hit v = ±0.5 (grid offset +0.5 of an integer < 2^20),
    so LN's argument is bounded away from 0.

    Scale: one scan, one bounded groupBy (days), map-only noise
    columns — the release table is calendar-sized."""
    from ..functions.columns import portable_bucket

    ev = _t(spark, sf_dir, "events")
    c = ev.select(
        F.floor(F.unix_timestamp("ts") / F.lit(86400))
        .cast("long")
        .alias("day")
    ).groupBy("day").agg(F.count("*").alias("n"))
    u = c.select(
        "day",
        "n",
        (
            (portable_bucket(F.col("day") + F.lit(_DP_SEED), _DP_W)
             + F.lit(0.5))
            / F.lit(float(_DP_W))
            - F.lit(0.5)
        ).alias("v"),
    )
    noise = F.when(
        F.col("v") < 0.0, F.log(1.0 + 2.0 * F.col("v")) / F.lit(_DP_EPS)
    ).otherwise(-F.log(1.0 - 2.0 * F.col("v")) / F.lit(_DP_EPS))
    return u.select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.floor((F.col("n") + noise) * F.lit(float(_DP_BAND)))
        .cast("long")
        .alias("released_band"),
    )


# ---------------------------------------------------------------------------
# a_propensity_match — propensity-score 1-NN matching (ATT estimator)
# ---------------------------------------------------------------------------

_PSM_SEED = 17
_PSM_LR = 0.5
_PSM_ROUNDS = 5
_PSM_D = 3
_PSM_GRID = 1_000_000


def _psm_oracle() -> str:
    """Generated DuckDB twin: the staged_r08 logreg unroll (same
    left-associated z, same GD recurrence) over the per-customer
    features, then scoring, then the two LAST_VALUE IGNORE NULLS
    matching scans with the SAME total orders as the Spark
    attach_running_last passes."""
    z = " + ".join(f"w.w{i}*d.x{i}" for i in range(1, _PSM_D + 1)) + " + w.b"
    sig = f"1.0/(1.0 + EXP(-({z})))"
    w0 = ", ".join(f"0.0 AS w{i}" for i in range(1, _PSM_D + 1)) + ", 0.0 AS b"
    rounds = []
    for k in range(1, _PSM_ROUNDS + 1):
        cols = ", ".join(
            f"MIN(w.w{i}) + {_PSM_LR}*AVG((d.y - {sig})*d.x{i}) AS w{i}"
            for i in range(1, _PSM_D + 1)
        )
        rounds.append(
            f"w{k} AS (SELECT {cols}, "
            f"MIN(w.b) + {_PSM_LR}*AVG(d.y - {sig}) AS b "
            f"FROM data d CROSS JOIN w{k - 1} w)"
        )
    treat = _cms_oracle_bucket_sql("c.c_custkey", _PSM_SEED, 2)
    return f"""
    WITH agg AS (
      SELECT o_custkey, COUNT(*) AS n,
             ROUND(SUM(o_totalprice), 2) AS s2,
             ROUND(MAX(o_totalprice), 2) AS mx
      FROM orders GROUP BY o_custkey
    ), data AS (
      SELECT c.c_custkey AS key, c.c_acctbal AS outcome,
             CAST(n AS DOUBLE) / 10.0 AS x1,
             s2 / 10000000.0 AS x2,
             mx / 1000000.0 AS x3,
             CASE WHEN {treat} = 1 THEN 1.0 ELSE 0.0 END AS y
      FROM agg JOIN customer c ON c.c_custkey = agg.o_custkey
    ), w0 AS (SELECT {w0}),
    {",".join(rounds)},
    scored AS (
      SELECT d.key, d.y, d.outcome,
             CAST(FLOOR(({sig}) * {_PSM_GRID}.0) AS BIGINT) AS g
      FROM data d CROSS JOIN w{_PSM_ROUNDS} w
    ), ob AS (
      SELECT key, y, outcome, g,
             LAST_VALUE(CASE WHEN y = 0.0 THEN g END IGNORE NULLS)
               OVER wb AS bg,
             LAST_VALUE(CASE WHEN y = 0.0 THEN outcome END IGNORE NULLS)
               OVER wb AS bo,
             LAST_VALUE(CASE WHEN y = 0.0 THEN g END IGNORE NULLS)
               OVER wa AS ag,
             LAST_VALUE(CASE WHEN y = 0.0 THEN outcome END IGNORE NULLS)
               OVER wa AS ao
      FROM scored
      WINDOW wb AS (ORDER BY g ASC, y ASC, key ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wa AS (ORDER BY g DESC, y ASC, key DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), m AS (
      SELECT key, outcome,
             CASE WHEN ag IS NULL
                       OR (bg IS NOT NULL AND (g - bg) <= (ag - g))
                  THEN bo ELSE ao END AS mo
      FROM ob WHERE y = 1.0
    ), fin AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
             CAST(COUNT(mo) AS BIGINT) AS n_matched,
             ROUND(SUM(outcome - mo), 2) AS sum_diff
      FROM m
    )
    SELECT n_treated, n_matched, sum_diff,
           ROUND(sum_diff / n_matched, 6) AS att
    FROM fin
    """


@query("a_propensity_match", oracle=_psm_oracle())
def a_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-score matching — the third causal estimator
    (a_abtest_lift = randomized lift, a_diff_in_diff = parallel
    trends; PSM = observational confound adjustment), and the
    flagship TRAINER COMPOSITION: the in-engine logistic regression
    (operators/train.logreg_fit, 5 lazy GD rounds) fits the
    propensity of the hash-split "treatment" from per-customer order
    features, every unit is scored fit-free, and each treated unit is
    matched to its nearest control BY SCORE via two scan-carry passes
    (operators/ranks.attach_running_last — LAST_VALUE IGNORE NULLS
    over a total order WITHOUT a single-task window: nearest control
    at-or-below in score order, nearest at-or-above in the reversed
    order, then an integer argmin of the two gaps). Output: treated /
    matched counts, the money-grid sum of matched outcome
    differences, and the ATT point estimate.

    Determinism: scores land on the FLOOR 1e-6 grid (min distance of
    p·1e6 from the FLOOR boundaries is test-pinned ≫ cross-engine
    noise); after that every comparison is integer (gap argmin,
    below-preferred ties) over a total order (score, treated, key)
    replicated verbatim in the twin's WINDOW clauses; the ATT rounds
    once at the money grid and once at 1e-6 on identical doubles
    (the a_diff_in_diff discipline).

    Scale: fit = 5 codegen'd aggregates over the feature table;
    scoring is map-only; matching = two range-partitioned scan-carry
    passes over the DIMENSION-sized unit table (no quadratic
    candidate set, no single-task sort) — the same shape at any
    corpus size since units aggregate the fact table first."""
    from ..functions.columns import portable_bucket
    from ..operators.train import _sigmoid, _z, logreg_fit

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    agg = o.groupBy("o_custkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("s2"),
        F.round(F.max("o_totalprice"), 2).alias("mx"),
    )
    data = agg.join(
        c, F.col("c_custkey") == F.col("o_custkey")
    ).select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("outcome"),
        (F.col("n").cast("double") / F.lit(10.0)).alias("x1"),
        (F.col("s2") / F.lit(10000000.0)).alias("x2"),
        (F.col("mx") / F.lit(1000000.0)).alias("x3"),
        F.when(
            portable_bucket(F.col("c_custkey") + F.lit(_PSM_SEED), 2) == 1,
            F.lit(1.0),
        )
        .otherwise(F.lit(0.0))
        .alias("y"),
    )
    wrow = logreg_fit(
        data, ["x1", "x2", "x3"], "y", lr=_PSM_LR, rounds=_PSM_ROUNDS
    )
    scored = data.crossJoin(F.broadcast(wrow)).select(
        "key",
        "y",
        "outcome",
        F.floor(_sigmoid(_z(["x1", "x2", "x3"])) * F.lit(float(_PSM_GRID)))
        .cast("long")
        .alias("g"),
    )
    cpack = F.when(
        F.col("y") == 0.0, F.struct(F.col("g").alias("cg"),
                                    F.col("outcome").alias("co"))
    )
    below = attach_running_last(
        scored,
        [F.asc("g"), F.asc("y"), F.asc("key")],
        cpack,
        "below",
    )
    both = attach_running_last(
        below,
        [F.desc("g"), F.asc("y"), F.desc("key")],
        cpack,
        "above",
    )
    m = both.filter(F.col("y") == 1.0).select(
        "key",
        "outcome",
        F.when(
            F.col("above").isNull()
            | (
                F.col("below").isNotNull()
                & (
                    (F.col("g") - F.col("below.cg"))
                    <= (F.col("above.cg") - F.col("g"))
                )
            ),
            F.col("below.co"),
        )
        .otherwise(F.col("above.co"))
        .alias("mo"),
    )
    fin = m.agg(
        F.count("*").alias("n_treated"),
        F.count("mo").alias("n_matched"),
        F.round(F.sum(F.col("outcome") - F.col("mo")), 2).alias("sum_diff"),
    )
    return fin.select(
        "n_treated",
        "n_matched",
        "sum_diff",
        F.round(F.col("sum_diff") / F.col("n_matched"), 6).alias("att"),
    )


# ---------------------------------------------------------------------------
# a_cuped — CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------


@query(
    "a_cuped",
    oracle=f"""
    WITH d AS (
      SELECT user_id, value,
             {_cms_oracle_bucket_sql('user_id', _DID_SEED, 2)} = 1
               AS treated,
             CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT) AS day
      FROM events
    ), cut AS (
      SELECT CAST((MIN(day) + MAX(day)) // 2 AS BIGINT) AS mid FROM d
    ), users AS (
      SELECT user_id, BOOL_OR(treated) AS treated,
             ROUND(SUM(CASE WHEN day < mid THEN value ELSE 0 END), 2) AS pre,
             ROUND(SUM(CASE WHEN day >= mid THEN value ELSE 0 END), 2)
               AS post
      FROM d CROSS JOIN cut GROUP BY user_id
    ), mom AS (
      SELECT COUNT(*) AS n, SUM(pre) AS sx, SUM(post) AS sy,
             SUM(pre * pre) AS sxx, SUM(pre * post) AS sxy
      FROM users
    ), th AS (
      SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
             sx / n AS mx
      FROM mom
    ), adj AS (
      SELECT treated, post - theta * (pre - mx) AS y
      FROM users CROSS JOIN th
    ), arms AS (
      SELECT treated, COUNT(*) AS n, SUM(y) AS s
      FROM adj GROUP BY treated
    ), raw AS (
      SELECT treated, COUNT(*) AS n, SUM(post) AS s
      FROM users GROUP BY treated
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM raw WHERE treated) AS n_t,
           (SELECT CAST(n AS BIGINT) FROM raw WHERE NOT treated) AS n_c,
           ROUND((SELECT theta FROM th), 6) AS theta,
           ROUND((SELECT s / n FROM raw WHERE treated)
                 - (SELECT s / n FROM raw WHERE NOT treated), 6)
             AS raw_lift,
           ROUND((SELECT s / n FROM arms WHERE treated)
                 - (SELECT s / n FROM arms WHERE NOT treated), 6)
             AS cuped_lift
    """,
)
def a_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) — the
    industry-standard variance-reduction readout that completes the
    experimentation family (a_abtest_lift = raw lift, a_diff_in_diff
    = trend-netting, a_propensity_match = confound matching; CUPED =
    precision): per-user pre/post outcome sums split at the corpus
    midpoint day, θ = cov(pre, post)/var(pre) from one moment
    aggregate, adjusted outcome y = post − θ·(pre − mean_pre), lift
    re-read on the adjusted values.

    Determinism: per-user pre/post land on the money grid first
    (round(sum, 2)); the moment sums over those identical doubles
    carry ~1e-12 relative cross-engine noise into θ and the lifts,
    rounded at 1e-6 (the a_diff_in_diff discipline, one extra moment
    layer).

    Scale: one fact scan to user grain, one 5-number moment reduce,
    θ and mean ride a 1-row broadcast back over the user table, two
    bounded arm aggregates. Nothing collected, nothing quadratic."""
    from ..functions.columns import portable_bucket

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        "value",
        (portable_bucket(F.col("user_id") + F.lit(_DID_SEED), 2) == 1).alias(
            "treated"
        ),
        F.floor(F.unix_timestamp("ts") / F.lit(86400))
        .cast("long")
        .alias("day"),
    )
    cut = d.agg(
        F.floor((F.min("day") + F.max("day")) / F.lit(2))
        .cast("long")
        .alias("mid")
    )
    users = (
        d.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.max("treated").alias("treated"),
            F.round(
                F.sum(F.when(F.col("day") < F.col("mid"), F.col("value"))
                      .otherwise(0.0)),
                2,
            ).alias("pre"),
            F.round(
                F.sum(F.when(F.col("day") >= F.col("mid"), F.col("value"))
                      .otherwise(0.0)),
                2,
            ).alias("post"),
        )
    )
    mom = users.agg(
        F.count("*").alias("n"),
        F.sum("pre").alias("sx"),
        F.sum("post").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
        F.sum(F.col("pre") * F.col("post")).alias("sxy"),
    )
    th = mom.select(
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("theta"),
        (F.col("sx") / F.col("n")).alias("mx"),
    )
    adj = users.crossJoin(F.broadcast(th)).select(
        "treated",
        (
            F.col("post") - F.col("theta") * (F.col("pre") - F.col("mx"))
        ).alias("y"),
    )
    arms = adj.groupBy("treated").agg(
        F.count("*").alias("n"), F.sum("y").alias("s")
    )
    raw = users.groupBy("treated").agg(
        F.count("*").alias("n"), F.sum("post").alias("s")
    )

    def pick(df, flag, col):
        return F.max(F.when(F.col("treated") == flag, F.col(col)))

    raw1 = raw.agg(
        pick(raw, True, "n").cast("long").alias("n_t"),
        pick(raw, False, "n").cast("long").alias("n_c"),
        (pick(raw, True, "s") / pick(raw, True, "n")).alias("mt"),
        (pick(raw, False, "s") / pick(raw, False, "n")).alias("mc"),
    )
    arm1 = arms.agg(
        (pick(arms, True, "s") / pick(arms, True, "n")).alias("at"),
        (pick(arms, False, "s") / pick(arms, False, "n")).alias("ac"),
    )
    return (
        raw1.crossJoin(arm1)
        .crossJoin(F.broadcast(th))
        .select(
            "n_t",
            "n_c",
            F.round(F.col("theta"), 6).alias("theta"),
            F.round(F.col("mt") - F.col("mc"), 6).alias("raw_lift"),
            F.round(F.col("at") - F.col("ac"), 6).alias("cuped_lift"),
        )
    )


# ---------------------------------------------------------------------------
# g_link_prediction — common-neighbor / Jaccard link scores
# ---------------------------------------------------------------------------

_LP_MIN_COMMON = 5


@query(
    "g_link_prediction",
    oracle=(
        "WITH "
        + _LPA_ORACLE_GRAPH
        + f""", left_e AS (
      SELECT src AS a, dst AS r FROM edges WHERE src < 200
    ), deg AS (
      SELECT a, COUNT(*) AS d FROM left_e GROUP BY a
    ), pairs AS (
      SELECT x.a AS a, y.a AS b, COUNT(*) AS common
      FROM left_e x JOIN left_e y ON x.r = y.r AND x.a < y.a
      GROUP BY 1, 2
    )
    SELECT p.a, p.b, CAST(p.common AS BIGINT) AS common,
           CAST(da.d + db.d - p.common AS BIGINT) AS union_size
    FROM pairs p
    JOIN deg da ON da.a = p.a
    JOIN deg db ON db.a = p.b
    WHERE p.common >= {_LP_MIN_COMMON}
    """
    ),
)
def g_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the derived order graph —
    the recommender/graph-completion primitive ("which same-side
    vertices share enough structure to suggest a missing edge"):
    wedge join over the bipartite edges (left vertex pairs through a
    shared right neighbor, oriented a < b so each pair counts once),
    common-neighbor count + the Jaccard NUMERATOR/DENOMINATOR as
    exact integers (common, |Γa ∪ Γb|) at a min-support cut — no
    float scores anywhere, so the oracle is EXACT.

    Scale: the wedge join is the triangle_count shape — fan-out
    bounded by the right-side degree; min-support prunes before the
    degree joins; at power-law scale the hot right-vertices are AQE
    skew-join work, and a cap on wedge fan-out (the dedup hot-bucket
    discipline) would bound the quadratic step explicitly."""
    o = _t(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_orderkey") % 200).alias("a"),
        (F.lit(200) + F.col("o_orderkey") % 190).alias("r"),
    ).distinct()
    deg = edges.groupBy("a").agg(F.count("*").alias("d"))
    x = edges.withColumnRenamed("a", "xa")
    y = edges.withColumnRenamed("a", "yb")
    pairs = (
        x.join(y, "r")
        .filter(F.col("xa") < F.col("yb"))
        .groupBy(F.col("xa").alias("a"), F.col("yb").alias("b"))
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= _LP_MIN_COMMON)
    )
    da = deg.select(F.col("a"), F.col("d").alias("da"))
    db = deg.select(F.col("a").alias("b"), F.col("d").alias("db"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("common").cast("long").alias("common"),
            (F.col("da") + F.col("db") - F.col("common"))
            .cast("long")
            .alias("union_size"),
        )
    )


# ---------------------------------------------------------------------------
# a_anova_oneway — one-way ANOVA F statistic
# ---------------------------------------------------------------------------


@query(
    "a_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp, COUNT(*) AS n,
             SUM(o_totalprice) AS s, SUM(o_totalprice * o_totalprice) AS ss
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT SUM(n) AS n, SUM(s) AS s, SUM(ss) AS ss,
             COUNT(*) AS k
      FROM g
    ), parts AS (
      SELECT (SELECT SUM(s * s / n) FROM g) - t.s * t.s / t.n AS ssb,
             t.ss - (SELECT SUM(s * s / n) FROM g) AS ssw,
             t.k AS k, t.n AS n
      FROM tot t
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat
    FROM parts
    """,
)
def a_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of order value across the 5 order
    priorities — the k-group mean-difference test that completes the
    hypothesis battery (KS/Mann-Whitney = 2-sample, χ² = categorical
    independence; ANOVA = k-sample means): between/within sum-of-
    squares from ONE moment scan (SSB = Σ sᵢ²/nᵢ − S²/N,
    SSW = ΣSS − Σ sᵢ²/nᵢ), F = (SSB/(k−1))/(SSW/(N−k)).

    Determinism: group moments are float sums of money-grid values
    (~1e-12 relative cross-engine noise); F is O(1), rounded at 1e-6.

    Scale: one partial-agg scan to k=5 group moments; everything
    after is arithmetic on a 5-row table."""
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").alias("n"),
        F.sum("o_totalprice").alias("s"),
        F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.count("*").alias("k"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sgs"),
    )
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(
            (
                (F.col("sgs") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("k") - 1)
            )
            / ((F.col("ss") - F.col("sgs")) / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# train_qr_banded — quantile (median) regression trainer
# ---------------------------------------------------------------------------

_QR_D = 4
_QR_TAU = 0.5
_QR_LR = 1.0
_QR_ROUNDS = 5
_QR_BAND = 1_000_000


def _qr_oracle() -> str:
    """Unrolled subgradient recurrence (the staged_r08 logreg oracle
    convention): same left-associated z, same ψ CASE, same
    association order per update."""
    xs = ", ".join(
        f"CAST(embedding[{i}] AS DOUBLE) AS x{i}" for i in range(1, _QR_D + 1)
    )
    z = " + ".join(f"w.w{i}*d.x{i}" for i in range(1, _QR_D + 1)) + " + w.b"
    psi = f"({_QR_TAU} - CASE WHEN (d.y - ({z})) < 0.0 THEN 1.0 ELSE 0.0 END)"
    w0 = ", ".join(f"0.0 AS w{i}" for i in range(1, _QR_D + 1)) + ", 0.0 AS b"
    rounds = []
    for k in range(1, _QR_ROUNDS + 1):
        cols = ", ".join(
            f"MIN(w.w{i}) + {_QR_LR}*AVG({psi}*d.x{i}) AS w{i}"
            for i in range(1, _QR_D + 1)
        )
        rounds.append(
            f"w{k} AS (SELECT {cols}, "
            f"MIN(w.b) + {_QR_LR}*AVG({psi}) AS b "
            f"FROM data d CROSS JOIN w{k - 1} w)"
        )
    fin_ws = ", ".join(f"MIN(w.w{i}) AS w{i}" for i in range(1, _QR_D + 1))
    bands = "\n      UNION ALL ".join(
        f"SELECT 'w{i}' AS term, CAST(FLOOR(w{i}*{_QR_BAND}) AS BIGINT)"
        f" AS band FROM fin"
        for i in range(1, _QR_D + 1)
    )
    return f"""
    WITH data AS (
      SELECT {xs},
             CAST(embedding[1] AS DOUBLE)
               + 2.0*CAST(embedding[2] AS DOUBLE)
               - CAST(embedding[3] AS DOUBLE)
               + CAST(embedding[4] AS DOUBLE) AS y
      FROM embeddings
    ), w0 AS (SELECT {w0}),
    {",".join(rounds)},
    fin AS (
      SELECT {fin_ws}, MIN(w.b) AS b,
             AVG(GREATEST({_QR_TAU}*(d.y - ({z})),
                          ({_QR_TAU} - 1.0)*(d.y - ({z})))) AS pinball,
             COUNT(*) AS n
      FROM data d CROSS JOIN w{_QR_ROUNDS} w
    )
    SELECT term, band FROM (
      {bands}
      UNION ALL SELECT 'bias', CAST(FLOOR(b*{_QR_BAND}) AS BIGINT) FROM fin
      UNION ALL SELECT 'pinball',
                       CAST(FLOOR(pinball*{_QR_BAND}) AS BIGINT) FROM fin
      UNION ALL SELECT 'n', CAST(n AS BIGINT) FROM fin
    )
    """


@query("train_qr_banded", oracle=_qr_oracle())
def train_qr_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine QUANTILE regression (operators/train.quantile_reg_fit,
    τ=0.5 — median regression, the robust fourth trainer family after
    logreg / k-means / ALS / NB): 5 lazy full-batch subgradient rounds
    recover the linear target y = x1 + 2·x2 − x3 + x4 over the
    embeddings corpus; reported as FLOOR-banded weights, bias, mean
    pinball loss, and the integer-exact row count (the
    train_logreg_banded report shape, same generated-oracle
    convention).

    Determinism: the pinball subgradient ψ(r) = τ − 1{r<0} is
    DISCONTINUOUS, so the one extra cross-engine obligation is that
    no residual sits near 0 at any round — tests replay the
    trajectory and pin the minimum |r| per round ≫ float-reorder
    noise (the kmeans boundary-gap discipline applied to a trainer).

    Scale: identical to logreg_fit — 1-row broadcast iterate, one
    codegen'd aggregate per round, 5 scans total, no Python."""
    from ..operators.train import _z, quantile_reg_fit

    e = _t(spark, sf_dir, "embeddings")
    data = e.select(
        *[
            F.element_at("embedding", i).cast("double").alias(f"x{i}")
            for i in range(1, _QR_D + 1)
        ]
    ).withColumn(
        "y",
        F.col("x1") + F.lit(2.0) * F.col("x2") - F.col("x3") + F.col("x4"),
    )
    feats = [f"x{i}" for i in range(1, _QR_D + 1)]
    wrow = quantile_reg_fit(
        data, feats, "y", tau=_QR_TAU, lr=_QR_LR, rounds=_QR_ROUNDS
    )
    joined = data.crossJoin(F.broadcast(wrow))
    resid = F.col("y") - _z(feats)
    fin = joined.agg(
        *[F.first(f"w{i}").alias(f"w{i}") for i in range(1, _QR_D + 1)],
        F.first("b").alias("b"),
        F.avg(
            F.greatest(
                F.lit(_QR_TAU) * resid, F.lit(_QR_TAU - 1.0) * resid
            )
        ).alias("pinball"),
        F.count("*").alias("n"),
    )
    band = lambda c: F.floor(F.col(c) * F.lit(float(_QR_BAND))).cast(  # noqa: E731
        "long"
    )
    # inline() over the single fin row instead of a 6-way union (r11
    # optimization, §2.4): each union row re-ran the pinball aggregate
    # scan AND the subgradient fit it referenced through the broadcast.
    structs = [
        F.struct(F.lit(f"w{i}").alias("term"), band(f"w{i}").alias("band"))
        for i in range(1, _QR_D + 1)
    ] + [
        F.struct(F.lit("bias").alias("term"), band("b").alias("band")),
        F.struct(
            F.lit("pinball").alias("term"), band("pinball").alias("band")
        ),
        F.struct(
            F.lit("n").alias("term"), F.col("n").cast("long").alias("band")
        ),
    ]
    return fin.select(F.inline(F.array(*structs)))


# ---------------------------------------------------------------------------
# a_effect_sizes — Cohen's d + two-proportion z (experiment readout)
# ---------------------------------------------------------------------------


@query(
    "a_effect_sizes",
    oracle=f"""
    WITH d AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv,
             {_cms_oracle_bucket_sql('user_id', _DID_SEED, 2)} = 1
               AS treated
      FROM events
    ), g AS (
      SELECT treated, COUNT(*) AS n, SUM(value) AS s,
             SUM(value * value) AS ss, SUM(conv) AS c
      FROM d GROUP BY treated
    ), w AS (
      SELECT
        MAX(CASE WHEN treated THEN n END) AS nt,
        MAX(CASE WHEN NOT treated THEN n END) AS nc,
        MAX(CASE WHEN treated THEN s END) AS st,
        MAX(CASE WHEN NOT treated THEN s END) AS sc,
        MAX(CASE WHEN treated THEN ss END) AS sst,
        MAX(CASE WHEN NOT treated THEN ss END) AS ssc,
        MAX(CASE WHEN treated THEN c END) AS ct,
        MAX(CASE WHEN NOT treated THEN c END) AS cc
      FROM g
    ), calc AS (
      SELECT nt, nc,
             (st / nt - sc / nc)
               / SQRT(((sst - st * st / nt) + (ssc - sc * sc / nc))
                      / (nt + nc - 2)) AS cohens_d,
             (CAST(ct AS DOUBLE) / nt - CAST(cc AS DOUBLE) / nc)
               / SQRT((CAST(ct + cc AS DOUBLE) / (nt + nc))
                      * (1.0 - CAST(ct + cc AS DOUBLE) / (nt + nc))
                      * (1.0 / nt + 1.0 / nc)) AS z_prop
      FROM w
    )
    SELECT CAST(nt AS BIGINT) AS n_t, CAST(nc AS BIGINT) AS n_c,
           ROUND(cohens_d, 6) AS cohens_d, ROUND(z_prop, 6) AS z_prop
    FROM calc
    """,
)
def a_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the hash-split experiment — what
    a readout reports NEXT TO the lifts (a_abtest_lift gives the
    difference, these give its magnitude in noise units): Cohen's d
    on event value (pooled-SD standardization) and the two-proportion
    z statistic on purchase conversion, both from ONE 2-group moment
    scan.

    Determinism: moments over the money-grid values carry ~1e-12
    relative cross-engine noise; both statistics are O(1) and round
    at 1e-6 (the a_anova_oneway discipline).

    Scale: one fact scan, two groups, pure arithmetic after."""
    from ..functions.columns import portable_bucket

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
        (portable_bucket(F.col("user_id") + F.lit(_DID_SEED), 2) == 1).alias(
            "treated"
        ),
    )
    g = d.groupBy("treated").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
        F.sum("conv").alias("c"),
    )

    def pick(flag, col):
        return F.max(F.when(F.col("treated") == flag, F.col(col)))

    w = g.agg(
        pick(True, "n").alias("nt"),
        pick(False, "n").alias("nc"),
        pick(True, "s").alias("st"),
        pick(False, "s").alias("sc"),
        pick(True, "ss").alias("sst"),
        pick(False, "ss").alias("ssc"),
        pick(True, "c").alias("ct"),
        pick(False, "c").alias("cc"),
    )
    pool = (
        (F.col("sst") - F.col("st") * F.col("st") / F.col("nt"))
        + (F.col("ssc") - F.col("sc") * F.col("sc") / F.col("nc"))
    ) / (F.col("nt") + F.col("nc") - 2)
    p = (F.col("ct") + F.col("cc")).cast("double") / (
        F.col("nt") + F.col("nc")
    )
    return w.select(
        F.col("nt").cast("long").alias("n_t"),
        F.col("nc").cast("long").alias("n_c"),
        F.round(
            (F.col("st") / F.col("nt") - F.col("sc") / F.col("nc"))
            / F.sqrt(pool),
            6,
        ).alias("cohens_d"),
        F.round(
            (
                F.col("ct").cast("double") / F.col("nt")
                - F.col("cc").cast("double") / F.col("nc")
            )
            / F.sqrt(
                p * (F.lit(1.0) - p)
                * (F.lit(1.0) / F.col("nt") + F.lit(1.0) / F.col("nc"))
            ),
            6,
        ).alias("z_prop"),
    )


# ---------------------------------------------------------------------------
# g_assortativity — degree assortativity coefficient (exact moments)
# ---------------------------------------------------------------------------


@query(
    "g_assortativity",
    oracle=(
        "WITH "
        + _LPA_ORACLE_GRAPH
        + """, deg AS (
      SELECT src AS vid, COUNT(*) AS d FROM edges GROUP BY src
    ), pe AS (
      SELECT CAST(a.d AS BIGINT) AS dx, CAST(b.d AS BIGINT) AS dy
      FROM edges e
      JOIN deg a ON a.vid = e.src
      JOIN deg b ON b.vid = e.dst
    ), mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dx) AS BIGINT) AS sx,
             CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(dx * dx) AS BIGINT) AS sxx,
             CAST(SUM(dy * dy) AS BIGINT) AS syy,
             CAST(SUM(dx * dy) AS BIGINT) AS sxy
      FROM pe
    )
    SELECT n AS n_edges,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS assortativity
    FROM mom
    """
    ),
)
def g_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the derived order graph — Newman's
    "do hubs attach to hubs" coefficient, the graph-health scalar a
    pipeline monitors next to the component/triangle counts: Pearson
    correlation of (deg(src), deg(dst)) over the SYMMETRIC directed
    edge list.

    Determinism: EXACT by construction — degrees are integers, the
    five moment sums are integer-valued and below 2^53 (summed as
    BIGINT on both engines), so the single final division/sqrt runs
    on bit-identical inputs; ROUND(…, 6) is then deterministic, not
    a band.

    Scale: one degree aggregation + two dimension-bounded joins back
    onto the edge list + one moment reduce — the triangle_count cost
    envelope without the wedge explosion."""
    o = _t(spark, sf_dir, "orders")
    e0 = o.select(
        (F.col("o_orderkey") % 200).alias("src"),
        (F.lit(200) + F.col("o_orderkey") % 190).alias("dst"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("d")
    )
    pe = (
        edges.join(deg.withColumnRenamed("vid", "src"), "src")
        .withColumnRenamed("d", "dx")
        .join(
            deg.withColumnRenamed("vid", "dst").withColumnRenamed("d", "dy"),
            "dst",
        )
        .select(F.col("dx").cast("long"), F.col("dy").cast("long"))
    )
    mom = pe.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    return mom.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
                .cast("double")
            ),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# a_vocab_drift — vocabulary churn between corpus batches
# ---------------------------------------------------------------------------


@query(
    "a_vocab_drift",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id % 2 = 0 AS batch_a,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> len(x) > 0)) AS w
      FROM documents
    ), va AS (
      SELECT DISTINCT w FROM tok WHERE batch_a
    ), vb AS (
      SELECT DISTINCT w FROM tok WHERE NOT batch_a
    ), m AS (
      SELECT (SELECT COUNT(*) FROM va) AS n_a,
             (SELECT COUNT(*) FROM vb) AS n_b,
             (SELECT COUNT(*) FROM va JOIN vb USING (w)) AS n_common
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_common AS BIGINT) AS n_common,
           ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6)
             AS jaccard,
           ROUND(1.0 - CAST(n_common AS DOUBLE) / n_b, 6) AS new_rate
    FROM m
    """,
)
def a_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary churn between two corpus batches (even vs odd
    doc_id — the stand-in for "yesterday's crawl vs today's") — the
    token-level drift monitor an intake pipeline runs next to
    a_psi_drift's value-level one: batch vocabularies, their overlap,
    the Jaccard similarity and the new-token rate. A collapsing
    Jaccard or spiking new_rate is the canonical signal of a source
    change / encoding regression upstream.

    Determinism: all counts are integers; the two ratios divide
    identical BIGINTs, so ROUND is deterministic — exact oracle.

    Scale: one tokenize scan, two DISTINCTs, one vocabulary-sized
    join — vocabulary-bounded state, the text_tfidf shape."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        (F.col("doc_id") % 2 == 0).alias("batch_a"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("w"),
    )
    va = tok.filter(F.col("batch_a")).select("w").distinct()
    vb = tok.filter(~F.col("batch_a")).select("w").distinct()
    common = va.join(vb, "w").agg(F.count("*").alias("n_common"))
    counts = (
        va.agg(F.count("*").alias("n_a"))
        .crossJoin(vb.agg(F.count("*").alias("n_b")))
        .crossJoin(common)
    )
    return counts.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_common").cast("long").alias("n_common"),
        F.round(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
            6,
        ).alias("jaccard"),
        F.round(
            F.lit(1.0) - F.col("n_common").cast("double") / F.col("n_b"), 6
        ).alias("new_rate"),
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — Zipf-law slope of the corpus frequency curve
# ---------------------------------------------------------------------------

_ZIPF_TOP = 500


@query(
    "text_zipf_fit",
    oracle=rf"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> len(x) > 0)) AS w
      FROM documents
    ), cnt AS (
      SELECT w, COUNT(*) AS c FROM tok GROUP BY w
    ), ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS r
      FROM cnt
    ), pts AS (
      SELECT LN(CAST(r AS DOUBLE)) AS x, LN(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}
    ), mom AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           ROUND(POW(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM mom
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token-frequency curve — the
    corpus-health scalar (natural text reads slope ≈ −1; templated /
    synthetic / deduplicated-to-death corpora drift off it): OLS of
    ln(freq) on ln(rank) over the top-500 tokens, rank assigned by
    the DISTRIBUTED rank-attach over the (count DESC, token ASC)
    total order.

    Determinism: ranks and counts are integers on a total order; the
    log points are then identical doubles, OLS moments carry ~1e-14
    reorder noise, statistics round at 1e-6.

    Scale: one tokenize scan into vocabulary-bounded counts, one
    rank-attach (no single-task sort), a 500-row moment reduce."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    ranked = attach_global_ranks(
        cnt,
        sort_cols=[F.desc("c"), F.asc("w")],
        key_cols=[F.col("c"), F.col("w")],
        rn_col="r",
    )
    pts = ranked.filter(F.col("r") <= _ZIPF_TOP).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    mom = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# train_stump_banded — decision-stump split search (tree family)
# ---------------------------------------------------------------------------

_STUMP_D = 3
_STUMP_THRESHOLDS = [round(-0.4 + 0.1 * i, 1) for i in range(9)]  # -0.4..0.4
_STUMP_BAND = 1_000_000


def _stump_oracle() -> str:
    """Generated twin: the same |F|×|T| conditional sums in one scan,
    the same gain formula, the same (gain DESC, feature ASC,
    threshold ASC) argmax."""
    xs = ", ".join(
        f"CAST(embedding[{i}] AS DOUBLE) AS x{i}"
        for i in range(1, _STUMP_D + 1)
    )
    cells = []
    for f in range(1, _STUMP_D + 1):
        for t in _STUMP_THRESHOLDS:
            tag = f"{f}_{str(t).replace('-', 'm').replace('.', 'p')}"
            cells.append(
                f"SUM(CASE WHEN x{f} <= {t} THEN 1 ELSE 0 END) AS nl_{tag}, "
                f"SUM(CASE WHEN x{f} <= {t} AND y = 1 THEN 1 ELSE 0 END)"
                f" AS pl_{tag}"
            )
    unions = []
    for f in range(1, _STUMP_D + 1):
        for t in _STUMP_THRESHOLDS:
            tag = f"{f}_{str(t).replace('-', 'm').replace('.', 'p')}"
            unions.append(
                f"SELECT {f} AS feature, {t} AS threshold, "
                f"nl_{tag} AS nl, pl_{tag} AS pl, n, pos FROM mom"
            )
    return f"""
    WITH data AS (
      SELECT {xs},
             CASE WHEN CAST(embedding[1] AS DOUBLE)
                       + 2.0*CAST(embedding[2] AS DOUBLE)
                       - CAST(embedding[3] AS DOUBLE) > 0.0
                  THEN 1 ELSE 0 END AS y
      FROM embeddings
    ), mom AS (
      SELECT COUNT(*) AS n, SUM(y) AS pos, {", ".join(cells)}
      FROM data
    ), cand AS (
      {" UNION ALL ".join(unions)}
    ), scored AS (
      SELECT feature, threshold, nl, n - nl AS nr,
             CAST(FLOOR((
               (1.0 - POW(CAST(pos AS DOUBLE)/n, 2)
                    - POW(1.0 - CAST(pos AS DOUBLE)/n, 2))
               - (CAST(nl AS DOUBLE)/n) *
                 (CASE WHEN nl = 0 THEN 0.0 ELSE
                   1.0 - POW(CAST(pl AS DOUBLE)/nl, 2)
                       - POW(1.0 - CAST(pl AS DOUBLE)/nl, 2) END)
               - (CAST(n - nl AS DOUBLE)/n) *
                 (CASE WHEN n - nl = 0 THEN 0.0 ELSE
                   1.0 - POW(CAST(pos - pl AS DOUBLE)/(n - nl), 2)
                       - POW(1.0 - CAST(pos - pl AS DOUBLE)/(n - nl), 2) END)
             ) * {_STUMP_BAND}.0) AS BIGINT) AS gain_band
      FROM cand
    )
    SELECT CAST(feature AS BIGINT) AS feature, threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           gain_band
    FROM scored
    ORDER BY gain_band DESC, feature ASC, threshold ASC
    LIMIT 1
    """


@query("train_stump_banded", oracle=_stump_oracle())
def train_stump_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump induction — the TREE trainer family (the
    histogram-based split search every GBDT round runs, at depth 1):
    exhaustive Gini-gain search over |features| × |thresholds|
    candidate splits computed as ONE wide conditional-sum aggregate
    scan (54 SUM(CASE…) columns — no per-candidate passes, no
    shuffle), then a 27-row argmax with a total tie-break
    (gain DESC, feature ASC, threshold ASC). Recovers the same
    embedded linear rule the logreg/QR probes train against.

    Determinism: all split counts are integers (exact cross-engine);
    the Gini gain divides identical integers, so the FLOOR band is
    computed on bit-identical doubles — deterministic, and the argmax
    total order makes the winner unique.

    Scale: the canonical distributed-tree shape — one scan producing
    a fixed-width sufficient-statistics row, candidate scoring on
    driver-sized data. A full GBDT layers this: per-node conditional
    sums keyed by node id, same one-scan property."""
    e = _t(spark, sf_dir, "embeddings")
    data = e.select(
        *[
            F.element_at("embedding", i).cast("double").alias(f"x{i}")
            for i in range(1, _STUMP_D + 1)
        ]
    ).withColumn(
        "y",
        F.when(
            F.col("x1") + F.lit(2.0) * F.col("x2") - F.col("x3") > 0.0, 1
        ).otherwise(0),
    )
    aggs = [F.count("*").alias("n"), F.sum("y").alias("pos")]
    tags = []
    for f in range(1, _STUMP_D + 1):
        for t in _STUMP_THRESHOLDS:
            tag = f"{f}_{str(t).replace('-', 'm').replace('.', 'p')}"
            tags.append((f, t, tag))
            cond = F.col(f"x{f}") <= F.lit(t)
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"nl_{tag}")
            )
            aggs.append(
                F.sum(F.when(cond & (F.col("y") == 1), 1).otherwise(0)).alias(
                    f"pl_{tag}"
                )
            )
    mom = data.agg(*aggs)
    # ONE pass: the 27 candidates explode out of the single wide
    # moment row (an extra union branch per candidate would re-derive
    # the aggregate 27x — measured 4x slower before this shape)
    cand = mom.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("feature"),
                        F.lit(t).alias("threshold"),
                        F.col(f"nl_{tag}").alias("nl"),
                        F.col(f"pl_{tag}").alias("pl"),
                    )
                    for f, t, tag in tags
                ]
            )
        ).alias("c"),
        "n",
        "pos",
    ).select("c.feature", "c.threshold", "c.nl", "c.pl", "n", "pos")

    def gini(p_num, n_tot):
        p = p_num.cast("double") / n_tot
        return F.lit(1.0) - F.pow(p, 2) - F.pow(F.lit(1.0) - p, 2)

    parent = gini(F.col("pos"), F.col("n"))
    left = F.when(F.col("nl") == 0, F.lit(0.0)).otherwise(
        gini(F.col("pl"), F.col("nl"))
    )
    right = F.when(F.col("n") - F.col("nl") == 0, F.lit(0.0)).otherwise(
        gini(F.col("pos") - F.col("pl"), F.col("n") - F.col("nl"))
    )
    gain = (
        parent
        - (F.col("nl").cast("double") / F.col("n")) * left
        - ((F.col("n") - F.col("nl")).cast("double") / F.col("n")) * right
    )
    scored = cand.select(
        F.col("feature").cast("long").alias("feature"),
        "threshold",
        F.col("nl").cast("long").alias("n_left"),
        (F.col("n") - F.col("nl")).cast("long").alias("n_right"),
        F.floor(gain * F.lit(float(_STUMP_BAND))).cast("long").alias(
            "gain_band"
        ),
    )
    return scored.orderBy(
        F.desc("gain_band"), F.asc("feature"), F.asc("threshold")
    ).limit(1)


# ---------------------------------------------------------------------------
# train_tree2_banded — depth-2 tree (per-node split search, one scan/level)
# ---------------------------------------------------------------------------


def _stump_tag(f: int, t: float) -> str:
    return f"{f}_{str(t).replace('-', 'm').replace('.', 'p')}"


def _tree2_oracle() -> str:
    """Generated twin: level-0 winner by the SAME total-order argmax
    as train_stump_banded, node routing by CASE over the winner's
    feature, level-1 per-node conditional sums in ONE grouped scan,
    per-node argmax via ROW_NUMBER."""
    xs = ", ".join(
        f"CAST(embedding[{i}] AS DOUBLE) AS x{i}"
        for i in range(1, _STUMP_D + 1)
    )
    cells = ", ".join(
        f"SUM(CASE WHEN x{f} <= {t} THEN 1 ELSE 0 END) AS nl_{_stump_tag(f, t)}, "
        f"SUM(CASE WHEN x{f} <= {t} AND y = 1 THEN 1 ELSE 0 END)"
        f" AS pl_{_stump_tag(f, t)}"
        for f in range(1, _STUMP_D + 1)
        for t in _STUMP_THRESHOLDS
    )
    unions0 = " UNION ALL ".join(
        f"SELECT {f} AS feature, {t} AS threshold,"
        f" nl_{_stump_tag(f, t)} AS nl, pl_{_stump_tag(f, t)} AS pl, n, pos"
        f" FROM mom0"
        for f in range(1, _STUMP_D + 1)
        for t in _STUMP_THRESHOLDS
    )
    unions1 = " UNION ALL ".join(
        f"SELECT node, {f} AS feature, {t} AS threshold,"
        f" nl_{_stump_tag(f, t)} AS nl, pl_{_stump_tag(f, t)} AS pl, n, pos"
        f" FROM mom1"
        for f in range(1, _STUMP_D + 1)
        for t in _STUMP_THRESHOLDS
    )
    gain = f"""CAST(FLOOR((
               (1.0 - POW(CAST(pos AS DOUBLE)/n, 2)
                    - POW(1.0 - CAST(pos AS DOUBLE)/n, 2))
               - (CAST(nl AS DOUBLE)/n) *
                 (CASE WHEN nl = 0 THEN 0.0 ELSE
                   1.0 - POW(CAST(pl AS DOUBLE)/nl, 2)
                       - POW(1.0 - CAST(pl AS DOUBLE)/nl, 2) END)
               - (CAST(n - nl AS DOUBLE)/n) *
                 (CASE WHEN n - nl = 0 THEN 0.0 ELSE
                   1.0 - POW(CAST(pos - pl AS DOUBLE)/(n - nl), 2)
                       - POW(1.0 - CAST(pos - pl AS DOUBLE)/(n - nl), 2) END)
             ) * {_STUMP_BAND}.0) AS BIGINT)"""
    route = " ".join(
        f"WHEN w.feature = {f} THEN CASE WHEN d.x{f} <= w.threshold"
        f" THEN 'L' ELSE 'R' END"
        for f in range(1, _STUMP_D + 1)
    )
    return f"""
    WITH data AS (
      SELECT {xs},
             CASE WHEN CAST(embedding[1] AS DOUBLE)
                       + 2.0*CAST(embedding[2] AS DOUBLE)
                       - CAST(embedding[3] AS DOUBLE) > 0.0
                  THEN 1 ELSE 0 END AS y
      FROM embeddings
    ), mom0 AS (
      SELECT COUNT(*) AS n, SUM(y) AS pos, {cells} FROM data
    ), cand0 AS ({unions0}),
    win0 AS (
      SELECT feature, threshold, {gain} AS gain_band
      FROM cand0
      ORDER BY gain_band DESC, feature ASC, threshold ASC
      LIMIT 1
    ), routed AS (
      SELECT d.*, CASE {route} END AS node
      FROM data d CROSS JOIN win0 w
    ), mom1 AS (
      SELECT node, COUNT(*) AS n, SUM(y) AS pos, {cells}
      FROM routed GROUP BY node
    ), cand1 AS ({unions1}),
    scored1 AS (
      SELECT node, feature, threshold, nl, n - nl AS nr,
             {gain} AS gain_band,
             ROW_NUMBER() OVER (
               PARTITION BY node
               ORDER BY {gain} DESC, feature ASC, threshold ASC
             ) AS rn
      FROM cand1
    )
    SELECT 'root' AS node, feature, threshold,
           CAST(NULL AS BIGINT) AS n_left, CAST(NULL AS BIGINT) AS n_right,
           gain_band
    FROM win0
    UNION ALL
    SELECT node, CAST(feature AS BIGINT), threshold,
           CAST(nl AS BIGINT), CAST(nr AS BIGINT), gain_band
    FROM scored1 WHERE rn = 1
    """


@query("train_tree2_banded", oracle=_tree2_oracle())
def train_tree2_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 decision tree — the composition the stump docstring
    promises ("a full GBDT layers this: per-node conditional sums
    keyed by node id, same one-scan property"), made concrete: the
    level-0 winner (train_stump_banded's argmax, carried as a 1-ROW
    BROADCAST — never collected) routes every row to its L/R node via
    a CASE over the winner's feature; level 1 then runs the SAME
    exhaustive Gini search PER NODE in one grouped conditional-sum
    scan and a per-node window argmax. Output: the root split plus
    both child splits (3 rows).

    Determinism: identical to the stump — all split counts are
    integers, gains divide bit-identical inputs, every argmax has a
    total tie-break; the winner broadcast adds no collect and no new
    float surface.

    Scale: one scan per tree LEVEL (not per candidate, not per node)
    — the distributed-GBDT property; level-1 state is 2 nodes × the
    fixed candidate width. Deeper trees repeat the same shape with
    node ids widening the groupBy key."""
    e = _t(spark, sf_dir, "embeddings")
    data = e.select(
        *[
            F.element_at("embedding", i).cast("double").alias(f"x{i}")
            for i in range(1, _STUMP_D + 1)
        ]
    ).withColumn(
        "y",
        F.when(
            F.col("x1") + F.lit(2.0) * F.col("x2") - F.col("x3") > 0.0, 1
        ).otherwise(0),
    )

    def stump_aggs():
        aggs = [F.count("*").alias("n"), F.sum("y").alias("pos")]
        for f in range(1, _STUMP_D + 1):
            for t in _STUMP_THRESHOLDS:
                tag = _stump_tag(f, t)
                cond = F.col(f"x{f}") <= F.lit(t)
                aggs.append(
                    F.sum(F.when(cond, 1).otherwise(0)).alias(f"nl_{tag}")
                )
                aggs.append(
                    F.sum(
                        F.when(cond & (F.col("y") == 1), 1).otherwise(0)
                    ).alias(f"pl_{tag}")
                )
        return aggs

    def candidates(mom, keep):
        # one explode off the wide moment row(s) — never a union that
        # re-derives the aggregate per candidate (the stump lesson)
        structs = [
            F.struct(
                F.lit(f).alias("feature"),
                F.lit(t).alias("threshold"),
                F.col(f"nl_{_stump_tag(f, t)}").alias("nl"),
                F.col(f"pl_{_stump_tag(f, t)}").alias("pl"),
            )
            for f in range(1, _STUMP_D + 1)
            for t in _STUMP_THRESHOLDS
        ]
        return mom.select(
            *keep, F.explode(F.array(*structs)).alias("c"), "n", "pos"
        ).select(
            *keep, "c.feature", "c.threshold", "c.nl", "c.pl", "n", "pos"
        )

    def gini(p_num, n_tot):
        p = p_num.cast("double") / n_tot
        return F.lit(1.0) - F.pow(p, 2) - F.pow(F.lit(1.0) - p, 2)

    def gain_col():
        parent = gini(F.col("pos"), F.col("n"))
        left = F.when(F.col("nl") == 0, F.lit(0.0)).otherwise(
            gini(F.col("pl"), F.col("nl"))
        )
        right = F.when(F.col("n") - F.col("nl") == 0, F.lit(0.0)).otherwise(
            gini(F.col("pos") - F.col("pl"), F.col("n") - F.col("nl"))
        )
        g = (
            parent
            - (F.col("nl").cast("double") / F.col("n")) * left
            - ((F.col("n") - F.col("nl")).cast("double") / F.col("n"))
            * right
        )
        return F.floor(g * F.lit(float(_STUMP_BAND))).cast("long")

    mom0 = data.agg(*stump_aggs())
    win0 = (
        candidates(mom0, [])
        .select("feature", "threshold", gain_col().alias("gain_band"))
        .orderBy(F.desc("gain_band"), F.asc("feature"), F.asc("threshold"))
        .limit(1)
    )
    route = F.lit(None).cast("string")
    routed = data.crossJoin(F.broadcast(win0.select(
        F.col("feature").alias("w_f"),
        F.col("threshold").alias("w_t"),
    )))
    node = None
    for f in range(1, _STUMP_D + 1):
        branch = F.when(
            F.col(f"x{f}") <= F.col("w_t"), F.lit("L")
        ).otherwise(F.lit("R"))
        node = (
            F.when(F.col("w_f") == f, branch)
            if node is None
            else node.when(F.col("w_f") == f, branch)
        )
    routed = routed.withColumn("node", node)
    mom1 = routed.groupBy("node").agg(*stump_aggs())
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(
        F.desc("gain_band"), F.asc("feature"), F.asc("threshold")
    )
    scored1 = (
        candidates(mom1, ["node"])
        .select(
            "node",
            "feature",
            "threshold",
            F.col("nl").alias("nl_keep"),
            (F.col("n") - F.col("nl")).alias("nr_keep"),
            gain_col().alias("gain_band"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    root_row = win0.select(
        F.lit("root").alias("node"),
        F.col("feature").cast("long").alias("feature"),
        "threshold",
        F.lit(None).cast("long").alias("n_left"),
        F.lit(None).cast("long").alias("n_right"),
        "gain_band",
    )
    child_rows = scored1.select(
        "node",
        F.col("feature").cast("long").alias("feature"),
        "threshold",
        F.col("nl_keep").cast("long").alias("n_left"),
        F.col("nr_keep").cast("long").alias("n_right"),
        "gain_band",
    )
    return root_row.unionByName(child_rows)


# ---------------------------------------------------------------------------
# stream_topk_sink_checked — exact incremental top-k (bounded key domain)
# ---------------------------------------------------------------------------


@query(
    "stream_topk_sink_checked",
    oracle="""
    WITH exact AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(c AS BIGINT) AS c, n.n
    FROM exact CROSS JOIN n
    ORDER BY c DESC, user_id ASC LIMIT 10
    """,
)
def stream_topk_sink_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT incremental top-k maintenance story
    (streaming/jobs.key_counts_sink) made driver-checkable: push
    events through the per-key count sink in THREE micro-batches,
    then serve "top-10 most active users right now" FROM THE STREAMED
    SNAPSHOT. Integer-sum merge ⇒ the 3-batch table equals the
    one-shot groupBy key for key, so the top-k AND the exactly-once
    witness n (ΣC == COUNT(*)) are exact — a dropped or replayed
    batch shifts every count; nothing hides in a band. Completes the
    incremental-sink set: moments, quantiles (KLL), frequencies
    (CMS), and now exact bounded-domain counts.

    Scale: the exact-count snapshot is one row per distinct key —
    right when the key domain is a bounded dimension (users/sources);
    the CMS sink remains the open-world path. Build-time eagerness
    (3 sink calls into a scratch dir) is the sanctioned lifecycle
    exception (stream_cms_sink_checked pattern)."""
    import os

    from .staged_r07 import _scratch
    from ..streaming import jobs

    base = _scratch("topk_counts")
    e = _t(spark, sf_dir, "events")
    sink = jobs.key_counts_sink(base, "user_id")
    for b in range(3):
        sink(e.filter(F.pmod(F.col("event_id"), F.lit(3)) == b), b)

    counts = spark.read.parquet(os.path.join(base, "v2"))
    n = counts.agg(F.sum("c").cast("long").alias("n"))
    return (
        counts.crossJoin(F.broadcast(n))
        .select(
            F.col("k").cast("long").alias("user_id"),
            F.col("c").cast("long").alias("c"),
            "n",
        )
        .orderBy(F.desc("c"), F.asc("user_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# a_forecast_backtest — Holt holdout evaluation (MAE / sMAPE / MASE)
# ---------------------------------------------------------------------------

_BT_H = 24  # held-out hours


@query(
    "a_forecast_backtest",
    oracle=f"""
    WITH RECURSIVE c AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS h,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), o AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY h) AS t FROM c
    ), n AS (
      SELECT COUNT(*) AS n FROM o
    ), tr AS (
      SELECT t, x FROM o CROSS JOIN n WHERE t <= n - {_BT_H}
    ), te AS (
      SELECT x AS actual, t - (n - {_BT_H}) AS k
      FROM o CROSS JOIN n WHERE t > n - {_BT_H}
    ), fold AS (
      SELECT t, x, x AS l, CAST(0 AS DOUBLE) AS b FROM tr WHERE t = 1
      UNION ALL
      SELECT tr.t, tr.x,
             0.5 * tr.x + 0.5 * (f.l + f.b) AS l,
             0.25 * (0.5 * tr.x + 0.5 * (f.l + f.b) - f.l) + 0.75 * f.b
               AS b
      FROM fold f JOIN tr ON tr.t = f.t + 1
    ), last AS (
      SELECT l, b FROM fold
      CROSS JOIN n WHERE t = n - {_BT_H}
    ), pred AS (
      SELECT te.k, te.actual, last.l + te.k * last.b AS forecast
      FROM te CROSS JOIN last
    ), naive AS (
      SELECT AVG(ABS(cur.x - prv.x)) AS d
      FROM tr cur JOIN tr prv ON prv.t = cur.t - 1
    ), m AS (
      SELECT COUNT(*) AS n_test,
             AVG(ABS(actual - forecast)) AS mae,
             AVG(2.0 * ABS(actual - forecast)
                 / (ABS(actual) + ABS(forecast))) AS smape
      FROM pred
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_train,
           CAST(m.n_test AS BIGINT) AS n_test,
           ROUND(m.mae, 6) AS mae,
           ROUND(m.smape, 6) AS smape,
           ROUND(m.mae / naive.d, 6) AS mase
    FROM m CROSS JOIN naive
    """,
)
def a_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTESTING — the evaluation half the forecasting
    family lacked (a_holt_forecast fits and extrapolates; this holds
    out the LAST 24 hours, fits the same dyadic Holt smoother on the
    prefix, and scores the held-out horizon with MAE, sMAPE and MASE
    — MASE normalizing by the train naive-1 error, the scale-free
    standard that makes forecasters comparable across series).

    Cross-engine determinism: the Holt fold is dyadic-exact (the
    a_holt_forecast convention — α=1/2, β=1/4, every level/trend an
    exact binary float, DuckDB's RECURSIVE CTE replays it
    bit-for-bit); actuals are integer counts; the three metrics are
    short averages of exact values, rounded at 1e-6.

    Scale: the hourly series is BOUNDED (one row per hour of corpus
    time); the fold is a one-group applyInPandas over it, never over
    raw events — identical contract to the rest of the series
    family."""
    import pandas as pd

    from ..operators.ranks import constant_partition_key
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    c = (
        e.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
        )
        .groupBy("h")
        .agg(F.count("*").cast("double").alias("x"))
    )
    one = constant_partition_key(F.col("h"))
    w = Window.partitionBy(one).orderBy("h")
    o = c.select("h", "x", F.row_number().over(w).alias("t"))
    n = o.agg(F.count("*").alias("n"))
    ob = o.crossJoin(F.broadcast(n))
    tr = ob.filter(F.col("t") <= F.col("n") - _BT_H)
    te = ob.filter(F.col("t") > F.col("n") - _BT_H).select(
        F.col("x").alias("actual"),
        (F.col("t") - (F.col("n") - _BT_H)).alias("k"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        xs = pdf["x"].to_numpy()
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            new_level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.25 * (new_level - level) + 0.75 * trend
            level = new_level
        return pd.DataFrame({"l": [level], "b": [trend]})

    last = (
        tr.select("t", "x")
        .withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(fold, "l double, b double")
    )
    pred = te.crossJoin(F.broadcast(last)).select(
        "k",
        "actual",
        (F.col("l") + F.col("k") * F.col("b")).alias("forecast"),
    )
    wlag = Window.partitionBy(constant_partition_key(F.col("t"))).orderBy(
        "t"
    )
    naive = (
        tr.select("t", "x", F.lag("x").over(wlag).alias("px"))
        .filter(F.col("px").isNotNull())
        .agg(F.avg(F.abs(F.col("x") - F.col("px"))).alias("d"))
    )
    m = pred.agg(
        F.count("*").alias("n_test"),
        F.avg(F.abs(F.col("actual") - F.col("forecast"))).alias("mae"),
        F.avg(
            2.0
            * F.abs(F.col("actual") - F.col("forecast"))
            / (F.abs(F.col("actual")) + F.abs(F.col("forecast")))
        ).alias("smape"),
    )
    n_train = tr.agg(F.count("*").cast("long").alias("n_train"))
    return (
        m.crossJoin(F.broadcast(naive))
        .crossJoin(F.broadcast(n_train))
        .select(
            "n_train",
            F.col("n_test").cast("long").alias("n_test"),
            F.round("mae", 6).alias("mae"),
            F.round("smape", 6).alias("smape"),
            F.round(F.col("mae") / F.col("d"), 6).alias("mase"),
        )
    )


# ---------------------------------------------------------------------------
# g_ppr_banded — personalized PageRank (random walk with restart)
# ---------------------------------------------------------------------------

_PPR_ROUNDS = 5
_PPR_D = 0.85
_PPR_SEEDS = 5
_PPR_BAND = 1_000_000


def _ppr_round_sql(r: int) -> str:
    tele = (
        f"CASE WHEN v.vid < {_PPR_SEEDS}"
        f" THEN (1.0 - {_PPR_D}) / {_PPR_SEEDS} ELSE 0.0 END"
    )
    return f"""
    , p{r} AS (
      SELECT v.vid AS id,
             {tele} + {_PPR_D} * COALESCE(SUM(p.rk / d.deg), 0) AS rk
      FROM verts v
      LEFT JOIN edges e ON e.dst = v.vid
      LEFT JOIN p{r - 1} p ON p.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY v.vid
    )
    """


@query(
    "g_ppr_banded",
    oracle=(
        "WITH "
        + _LPA_ORACLE_GRAPH
        + f""", deg AS (
      SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ), p0 AS (
      SELECT vid AS id,
             CASE WHEN vid < {_PPR_SEEDS}
                  THEN 1.0 / {_PPR_SEEDS} ELSE 0.0 END AS rk
      FROM verts
    )"""
        + "".join(_ppr_round_sql(r) for r in range(1, _PPR_ROUNDS + 1))
        + f"""
    SELECT CAST(id AS BIGINT) AS id,
           CAST(FLOOR(rk * {_PPR_BAND}) AS BIGINT) AS rank_band
    FROM p{_PPR_ROUNDS}
    """
    ),
)
def g_ppr_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (random walk with restart) on the derived
    order graph — proximity to the seed set {{0..4}} rather than
    global centrality: the graph-recommendation / seed-expansion
    primitive (operators/graph.personalized_pagerank — pagerank's
    recurrence with the teleport mass landing only on the seeds,
    init = the teleport vector). Same graph, same seeds as
    g_bfs_hops, so the two queries together give the hop-distance AND
    the walk-proximity views of the same neighborhood.

    Cross-engine banding: the g_pagerank_banded convention — the twin
    unrolls the SAME 5 damped iterations, both sides spell the
    teleport constant identically, ranks quantize to FLOOR 1e-6
    bands; band-edge gaps are measured and pinned in tests, not hoped
    for.

    Scale: one edges⋈ranks shuffle + one partial-agg SUM per round,
    eager-fixpoint with checkpoint-truncated lineage (the pagerank
    discipline)."""
    from ..operators.graph import personalized_pagerank

    o = _t(spark, sf_dir, "orders")
    edges = o.select(
        (F.col("o_orderkey") % 200).alias("src"),
        (F.lit(200) + F.col("o_orderkey") % 190).alias("dst"),
    ).distinct()
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = spark.range(_PPR_SEEDS).select(F.col("id").alias("vid"))
    out = personalized_pagerank(
        both, seeds, iterations=_PPR_ROUNDS, damping=_PPR_D
    )
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.floor(F.col("rank") * F.lit(float(_PPR_BAND)))
        .cast("long")
        .alias("rank_band"),
    )


# ---------------------------------------------------------------------------
# a_interrupted_ts — interrupted time-series (segmented regression)
# ---------------------------------------------------------------------------


@query(
    "a_interrupted_ts",
    oracle="""
    WITH c AS (
      SELECT CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS h,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ), cut AS (
      SELECT CAST((MIN(h) + MAX(h)) // 2 AS BIGINT) AS mid FROM c
    ), seg AS (
      SELECT h >= mid AS post, CAST(h - mid AS DOUBLE) AS t, x
      FROM c CROSS JOIN cut
    ), mom AS (
      SELECT post, COUNT(*) AS n, SUM(t) AS st, SUM(x) AS sx,
             SUM(t * t) AS stt, SUM(t * x) AS stx
      FROM seg GROUP BY post
    ), fit AS (
      SELECT post,
             (n * stx - st * sx) / (n * stt - st * st) AS slope,
             (sx - (n * stx - st * sx) / (n * stt - st * st) * st) / n
               AS intercept,
             n
      FROM mom
    ), w AS (
      SELECT
        MAX(CASE WHEN NOT post THEN slope END) AS slope_pre,
        MAX(CASE WHEN post THEN slope END) AS slope_post,
        MAX(CASE WHEN NOT post THEN intercept END) AS int_pre,
        MAX(CASE WHEN post THEN intercept END) AS int_post,
        MAX(CASE WHEN NOT post THEN n END) AS n_pre,
        MAX(CASE WHEN post THEN n END) AS n_post
      FROM fit
    )
    SELECT CAST(n_pre AS BIGINT) AS n_pre, CAST(n_post AS BIGINT) AS n_post,
           ROUND(slope_pre, 6) AS slope_pre,
           ROUND(slope_post, 6) AS slope_post,
           ROUND(int_post - int_pre, 6) AS level_change,
           ROUND(slope_post - slope_pre, 6) AS slope_change
    FROM w
    """,
)
def a_interrupted_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series (segmented regression) — the fifth
    causal design (randomized lift, DiD, matching, CUPED, and now the
    single-series intervention readout used when there is no control
    group at all): fit separate OLS lines to the hourly rate before
    and after the midpoint cut (t centered AT the cut, so each
    intercept is that segment's fitted level at the intervention) and
    report the level jump and slope change at the cut.

    Determinism: actuals are integer counts; each segment fit is two
    moment sums and one closed-form division (the a_anova_oneway
    discipline); everything rounds at 1e-6 on ~1e-12 cross-engine
    noise.

    Scale: one fact scan to the bounded hourly series, one 2-group
    moment aggregate, arithmetic after."""
    ev = _t(spark, sf_dir, "events")
    c = (
        ev.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h")
        )
        .groupBy("h")
        .agg(F.count("*").cast("double").alias("x"))
    )
    cut = c.agg(
        F.floor((F.min("h") + F.max("h")) / F.lit(2)).cast("long").alias("mid")
    )
    seg = c.crossJoin(F.broadcast(cut)).select(
        (F.col("h") >= F.col("mid")).alias("post"),
        (F.col("h") - F.col("mid")).cast("double").alias("t"),
        "x",
    )
    mom = seg.groupBy("post").agg(
        F.count("*").alias("n"),
        F.sum("t").alias("st"),
        F.sum("x").alias("sx"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("x")).alias("stx"),
    )
    slope = (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")) / (
        F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    )
    fit = mom.select(
        "post",
        slope.alias("slope"),
        ((F.col("sx") - slope * F.col("st")) / F.col("n")).alias("intercept"),
        "n",
    )

    def pick(flag, col):
        return F.max(F.when(F.col("post") == flag, F.col(col)))

    w = fit.agg(
        pick(False, "slope").alias("slope_pre"),
        pick(True, "slope").alias("slope_post"),
        pick(False, "intercept").alias("int_pre"),
        pick(True, "intercept").alias("int_post"),
        pick(False, "n").alias("n_pre"),
        pick(True, "n").alias("n_post"),
    )
    return w.select(
        F.col("n_pre").cast("long").alias("n_pre"),
        F.col("n_post").cast("long").alias("n_post"),
        F.round("slope_pre", 6).alias("slope_pre"),
        F.round("slope_post", 6).alias("slope_post"),
        F.round(F.col("int_post") - F.col("int_pre"), 6).alias(
            "level_change"
        ),
        F.round(F.col("slope_post") - F.col("slope_pre"), 6).alias(
            "slope_change"
        ),
    )


# ---------------------------------------------------------------------------
# w_cohort_ltv — cumulative lifetime-value curves by signup cohort
# ---------------------------------------------------------------------------


@query(
    "w_cohort_ltv",
    oracle="""
    WITH wk AS (
      SELECT user_id, value,
             CAST(FLOOR(EPOCH(ts) / 604800) AS BIGINT) AS w
      FROM events
    ), first AS (
      SELECT user_id, MIN(w) AS cohort FROM wk GROUP BY user_id
    ), sizes AS (
      SELECT cohort, COUNT(*) AS n_users FROM first GROUP BY cohort
    ), rev AS (
      SELECT f.cohort, wk.w - f.cohort AS age,
             ROUND(SUM(wk.value), 2) AS rev
      FROM wk JOIN first f USING (user_id)
      GROUP BY 1, 2
    ), cum AS (
      SELECT cohort, age, rev,
             SUM(rev) OVER (
               PARTITION BY cohort ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_rev
      FROM rev
    )
    SELECT c.cohort, CAST(c.age AS BIGINT) AS age,
           CAST(s.n_users AS BIGINT) AS n_users,
           c.rev,
           ROUND(c.cum_rev / s.n_users, 6) AS ltv_per_user
    FROM cum c JOIN sizes s USING (cohort)
    """,
)
def w_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — the revenue companion to
    a_cohort_retention's activity triangle (same first-seen-week
    cohorts): per (cohort, week age), period revenue and the
    CUMULATIVE revenue per cohort member — "how much is a week-w
    signup worth after k weeks", the growth-finance readout.

    Determinism: period revenue rounds on the money grid FIRST; the
    cumulative window then sums identical doubles in a total
    (cohort, age) order, and the per-user ratio divides identical
    values — the a_diff_in_diff round-once discipline applied to a
    running sum.

    Scale: first-seen agg and the activity join both key on user_id
    (one exchange serves both — the a_cohort_retention shape); the
    cumulative window runs per cohort over week-count-bounded rows."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    wk = e.select(
        "user_id",
        "value",
        F.floor(F.unix_timestamp("ts") / F.lit(604800))
        .cast("long")
        .alias("w"),
    )
    first = wk.groupBy("user_id").agg(F.min("w").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count("*").alias("n_users"))
    rev = (
        wk.join(first, "user_id")
        .groupBy("cohort", (F.col("w") - F.col("cohort")).alias("age"))
        .agg(F.round(F.sum("value"), 2).alias("rev"))
    )
    cum_w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn("cum_rev", F.sum("rev").over(cum_w))
    return cum.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        F.col("age").cast("long").alias("age"),
        F.col("n_users").cast("long").alias("n_users"),
        "rev",
        F.round(F.col("cum_rev") / F.col("n_users"), 6).alias(
            "ltv_per_user"
        ),
    )


# ---------------------------------------------------------------------------
# sim_knn_classify — k-nearest-neighbor classification
# ---------------------------------------------------------------------------

_KNN_K = 5
_KNN_SEED = 31
_KNN_SPLIT_SQL = "(vec_id * 2654435761) % 4294967296 % 100"
_KNN_COHORT = 250  # bounded query cohort (the sim_topk discipline)


@query(
    "sim_knn_classify",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
             label AS actual
      FROM embeddings
      WHERE {_KNN_SPLIT_SQL} >= 80 AND vec_id < {_KNN_COHORT}
    ), c AS (
      SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
             label
      FROM embeddings
      WHERE {_KNN_SPLIT_SQL} < 80
    ), scored AS (
      SELECT query_id, actual, neighbor_id, label,
             ROUND(list_cosine_similarity(qv, cv), 6) AS cos_sim
      FROM q CROSS JOIN c WHERE query_id <> neighbor_id
    ), nbrs AS (
      SELECT query_id, actual, label FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id
               ) AS rnk
        FROM scored) t
      WHERE rnk <= {_KNN_K}
    ), votes AS (
      SELECT query_id, actual, label, COUNT(*) AS c FROM nbrs
      GROUP BY 1, 2, 3
    ), pred AS (
      SELECT query_id, actual, label AS pred FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY c DESC, label ASC
               ) AS rn
        FROM votes) t
      WHERE rn = 1
    )
    SELECT CAST(query_id AS BIGINT) AS vec_id,
           CAST(pred AS BIGINT) AS pred,
           CAST(actual AS BIGINT) AS actual,
           pred = actual AS correct
    FROM pred
    """,
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor classification — the LAZY classifier (no fit
    at all) completing the family spectrum: closed-form (NB),
    parametric-iterative (logreg/QR), prototype (centroid), tree
    (stump), and now instance-based: each held-out vector takes the
    majority label of its 5 nearest TRAIN vectors by cosine
    (operators/similarity.brute_force_topk — broadcast queries × one
    corpus scan, the J8 baseline; at scale the IVF/LSH paths replace
    the scan, identical voting).

    Determinism: cosines on the 1e-6 ROUND grid with neighbor-id
    tie-break (the sim_topk_bruteforce convention — driver-green
    since round 1), majority with the (count DESC, label ASC) total
    order. Query cohort is BOUNDED (the sim_topk discipline) so the
    brute-force spec stays linear in the corpus.

    Scale: one broadcast × scan per cohort; the vote is a bounded
    window over k·|cohort| rows."""
    from ..functions.columns import portable_bucket
    from ..operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    # unseeded: must match _KNN_SPLIT_SQL, which hashes vec_id
    # directly (the a7 split convention)
    split = portable_bucket(F.col("vec_id"), 100)
    train = e.filter(split < 80)
    test = e.filter(
        (split >= 80) & (F.col("vec_id") < _KNN_COHORT)
    ).withColumnRenamed("vec_id", "query_id")
    nbrs = similarity.brute_force_topk(test, train, k=_KNN_K)
    votes = (
        nbrs.join(
            train.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nlabel")
        .agg(F.count("*").alias("c"))
    )
    pred = votes.groupBy("query_id").agg(
        F.max(
            F.struct(F.col("c"), (-F.col("nlabel")).cast("long").alias("nl"))
        ).alias("m")
    ).select("query_id", (-F.col("m.nl")).alias("pred"))
    return (
        pred.join(
            test.select("query_id", F.col("label").alias("actual")),
            "query_id",
        )
        .select(
            F.col("query_id").cast("long").alias("vec_id"),
            F.col("pred").cast("long").alias("pred"),
            F.col("actual").cast("long").alias("actual"),
            (F.col("pred") == F.col("actual")).alias("correct"),
        )
    )


# ---------------------------------------------------------------------------
# a_ece / a_auc_pr — calibration summary + PR-AUC on the shared scorer
# ---------------------------------------------------------------------------

_ECE_BINS = 10


@query(
    "a_ece",
    oracle="""
    WITH {_SCORES_CTE}
    , p AS (
      SELECT is_pos, ROUND((score + 1.0) / 2.0, 6) AS p FROM scores
    ), bins AS (
      SELECT CAST(LEAST(FLOOR(p * {_ECE_BINS}), {_ECE_BINS_M1}) AS BIGINT)
               AS bin,
             COUNT(*) AS n, SUM(is_pos) AS n_pos, AVG(p) AS avg_p
      FROM p GROUP BY 1
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(ABS(CAST(n_pos AS DOUBLE) / n - avg_p) * n) / SUM(n),
                 6) AS ece,
           ROUND(MAX(ABS(CAST(n_pos AS DOUBLE) / n - avg_p)), 6) AS mce
    FROM bins
    """.replace("{_SCORES_CTE}", _SCORES_CTE)
       .replace("{_ECE_BINS_M1}", str(_ECE_BINS - 1))
       .replace("{_ECE_BINS}", str(_ECE_BINS)),
)
def a_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error — THE scalar quoted for classifier
    calibration (the weighted summary of a_calibration_bins'
    reliability table): ECE = Σ_b (n_b/N)·|pos_rate_b − mean_p_b|,
    plus the max per-bin gap (MCE). Same fixed 10-bin grid, same
    gridded p = (score+1)/2 as the bins query, so the two results
    reconcile exactly.

    Determinism: bin stats are exact integers + 1e-6-grid means with
    ~1e-13 cross-engine noise; the weighted sum rounds at 1e-6.

    Scale: the scoring scans plus one |bins|-cell aggregate plus one
    |bins|-row reduce — bounded-state."""
    from .staged_r10 import _centroid0_scores

    scored = _centroid0_scores(spark, sf_dir)
    p = F.round((F.col("score") + 1.0) / 2.0, 6)
    binned = scored.select(
        "is_pos",
        p.alias("p"),
        F.least(F.floor(p * _ECE_BINS), F.lit(_ECE_BINS - 1))
        .cast("long")
        .alias("bin"),
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("is_pos").alias("n_pos"),
        F.avg("p").alias("avg_p"),
    )
    gap = F.abs(
        F.col("n_pos").cast("double") / F.col("n") - F.col("avg_p")
    )
    return bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.count("*").alias("n_bins"),
        F.round(
            F.sum(gap * F.col("n")) / F.sum("n"), 6
        ).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )




@query(
    "a_auc_pr",
    oracle="""
    WITH {_SCORES_CTE}
    , p AS (
      SELECT vec_id, is_pos, ROUND((score + 1.0) / 2.0, 6) AS p
      FROM scores
    ), ranked AS (
      SELECT vec_id, is_pos, p,
             ROW_NUMBER() OVER (ORDER BY p DESC, vec_id ASC) AS rn
      FROM p
    ), pos AS (
      SELECT rn,
             ROW_NUMBER() OVER (ORDER BY p DESC, vec_id ASC) AS prn
      FROM ranked WHERE is_pos = 1
    ), tot AS (
      SELECT COUNT(*) AS n FROM ranked
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_pos,
           ROUND(AVG(CAST(prn AS DOUBLE) / rn), 6) AS auc_pr
    FROM pos CROSS JOIN tot
    GROUP BY tot.n
    """.replace("{_SCORES_CTE}", _SCORES_CTE),
)
def a_auc_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR-AUC as Average Precision — the imbalanced-data companion to
    a_roc_auc's rank-sum AUC: over the (p DESC, vec_id ASC) total
    order, AP = mean over positives of precision@rank =
    pos_rank/global_rank, where pos_rank is the positive's rank AMONG
    positives in the SAME order — the identity that turns the
    cumulative-precision sum into TWO distributed rank-attaches and
    zero corpus-wide windows (the a_roc_auc midrank discipline).

    Determinism: scores grid at 1e-6 and both ranks break ties on
    vec_id (total orders identical cross-engine); each precision is
    an exact integer ratio; the final mean rounds at 1e-6.

    Scale: two rank-attaches (corpus, then positives-only) + one
    reduce — no single-task sort, no N-row window."""
    from .staged_r10 import _centroid0_scores

    scored = _centroid0_scores(spark, sf_dir).select(
        "vec_id", "is_pos", F.round((F.col("score") + 1.0) / 2.0, 6).alias("p")
    )
    ranked = attach_global_ranks(
        scored,
        sort_cols=[F.desc("p"), F.asc("vec_id")],
        key_cols=[F.col("p"), F.col("vec_id")],
        rn_col="rn",
    )
    pos = ranked.filter(F.col("is_pos") == 1)
    pranked = attach_global_ranks(
        pos,
        sort_cols=[F.desc("p"), F.asc("vec_id")],
        key_cols=[F.col("p"), F.col("vec_id")],
        rn_col="prn",
    )
    tot = ranked.agg(F.count("*").alias("n"))
    return (
        pranked.agg(
            F.count("*").alias("n_pos"),
            F.round(
                F.avg(F.col("prn").cast("double") / F.col("rn")), 6
            ).alias("auc_pr"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            "auc_pr",
        )
    )



# ---------------------------------------------------------------------------
# a_brier_score — mean squared calibration error + decomposition inputs
# ---------------------------------------------------------------------------


@query(
    "a_brier_score",
    oracle="""
    WITH {SC}
    , p AS (
      SELECT is_pos,
             CAST(ROUND(score * 1000000.0) AS BIGINT) + 1000000 AS pi2
      FROM scores
    ), s AS (
      SELECT COUNT(*) AS n, SUM(is_pos) AS n_pos,
             SUM((pi2 - is_pos * 2000000) * (pi2 - is_pos * 2000000)) AS se
      FROM p
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(se AS BIGINT) AS sum_sq_err_4e12,
           ROUND((CAST(n_pos AS DOUBLE) / n)
                 * (1.0 - CAST(n_pos AS DOUBLE) / n), 6) AS uncertainty
    FROM s
    """.replace("{SC}", _SCORES_CTE),
)
def a_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the shared centroid scorer — the proper scoring
    rule completing the calibration trio (reliability bins, ECE/MCE,
    and now the mean squared error of probability vs outcome), plus
    the uncertainty term p̄(1−p̄) — the decomposition's floor, so
    brier − uncertainty reads directly as resolution-minus-
    reliability.

    Determinism: the FIRST attempt rounded AVG((p−y)²) and hit a
    REAL half-grid flip at sf0.01 — twice: first as a float mean of
    grid-exact rationals, then again after exact-integer scaling
    because the true mean sits EXACTLY on .xxxxxx5 and Spark
    (decimal HALF_UP) and DuckDB (binary-double rounding) disagree
    precisely there. The checked output is therefore the exact
    integer numerator Σ(pi2 − y·2e6)² — brier = that /(n·4e12),
    derivable losslessly by any consumer — plus the exact-ratio
    uncertainty term. The band-grid lesson's endgame: when a
    statistic is an exact rational, SHIP THE INTEGERS.

    Scale: the scoring scans + one reduce."""
    from .staged_r10 import _centroid0_scores

    scored = _centroid0_scores(spark, sf_dir)
    pi2 = (
        F.round(F.col("score") * F.lit(1000000.0)).cast("long")
        + F.lit(1000000)
    )
    d = scored.select("is_pos", pi2.alias("pi2"))
    err = F.col("pi2") - F.col("is_pos") * F.lit(2000000)
    agg = d.agg(
        F.count("*").alias("n"),
        F.sum("is_pos").alias("n_pos"),
        F.sum(err * err).alias("se"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("se").cast("long").alias("sum_sq_err_4e12"),
        F.round(
            (F.col("n_pos").cast("double") / F.col("n"))
            * (F.lit(1.0) - F.col("n_pos").cast("double") / F.col("n")),
            6,
        ).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# a_ndcg — normalized discounted cumulative gain of the scorer ranking
# ---------------------------------------------------------------------------

_NDCG_K = 100


@query(
    "a_ndcg",
    oracle=f"""
    WITH {{SC}}
    , p AS (
      SELECT vec_id, is_pos, ROUND((score + 1.0) / 2.0, 6) AS p
      FROM scores
    ), ranked AS (
      SELECT is_pos,
             ROW_NUMBER() OVER (ORDER BY p DESC, vec_id ASC) AS rn
      FROM p
    ), dcg AS (
      SELECT SUM(CAST(is_pos AS DOUBLE) / LOG2(rn + 1)) AS dcg
      FROM ranked WHERE rn <= {_NDCG_K}
    ), npos AS (
      SELECT SUM(is_pos) AS n_pos FROM ranked
    ), idcg AS (
      SELECT SUM(1.0 / LOG2(k + 1)) AS idcg
      FROM npos, generate_series(1, {_NDCG_K}) AS g(k)
      WHERE k <= n_pos
    )
    SELECT {_NDCG_K} AS k,
           (SELECT CAST(n_pos AS BIGINT) FROM npos) AS n_pos,
           ROUND(dcg.dcg / idcg.idcg, 6) AS ndcg
    FROM dcg CROSS JOIN idcg
    """.replace("{SC}", _SCORES_CTE),
)
def a_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@100 of the centroid-scorer ranking — the position-weighted
    ranking metric completing the eval family (ROC-AUC = pairwise,
    AP = precision-weighted, gains = tiles; nDCG = log-discounted,
    the metric retrieval leaderboards quote): binary relevance
    (is_pos), DCG over the top-k of the (p DESC, vec_id ASC) total
    order, IDCG from the ideal prefix of min(n_pos, k) positives.

    Determinism: ranks are integers on a gridded total order (the
    a_auc_pr discipline); DCG sums ≤k log-discount terms computed
    from identical integers; 1e-6 final rounding.

    Scale: one distributed rank-attach, a k-row reduce, and a
    literal-range ideal — no corpus-wide window."""
    from .staged_r10 import _centroid0_scores

    scored = _centroid0_scores(spark, sf_dir).select(
        "vec_id",
        "is_pos",
        F.round((F.col("score") + 1.0) / 2.0, 6).alias("p"),
    )
    ranked = attach_global_ranks(
        scored,
        sort_cols=[F.desc("p"), F.asc("vec_id")],
        key_cols=[F.col("p"), F.col("vec_id")],
        rn_col="rn",
    )
    dcg = ranked.filter(F.col("rn") <= _NDCG_K).agg(
        F.sum(
            F.col("is_pos").cast("double") / F.log2(F.col("rn") + 1)
        ).alias("dcg")
    )
    npos = ranked.agg(F.sum("is_pos").alias("n_pos"))
    spark_ = spark
    ideal = (
        spark_.range(1, _NDCG_K + 1)
        .withColumnRenamed("id", "k")
        .crossJoin(F.broadcast(npos))
        .filter(F.col("k") <= F.col("n_pos"))
        .agg(
            F.sum(F.lit(1.0) / F.log2(F.col("k") + 1)).alias("idcg"),
            F.first("n_pos").alias("n_pos"),
        )
    )
    return dcg.crossJoin(F.broadcast(ideal)).select(
        F.lit(_NDCG_K).cast("long").alias("k"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# a_mutual_info — discrete mutual information (event type × treatment)
# ---------------------------------------------------------------------------


@query(
    "a_mutual_info",
    oracle=f"""
    WITH d AS (
      SELECT event_type AS a,
             {_cms_oracle_bucket_sql('user_id', _DID_SEED, 2)} = 1 AS b
      FROM events
    ), jo AS (
      SELECT a, b, COUNT(*) AS c FROM d GROUP BY 1, 2
    ), ma AS (
      SELECT a, SUM(c) AS ca FROM jo GROUP BY a
    ), mb AS (
      SELECT b, SUM(c) AS cb FROM jo GROUP BY b
    ), n AS (
      SELECT SUM(c) AS n FROM jo
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((CAST(jo.c AS DOUBLE) / n.n)
                     * LN((CAST(jo.c AS DOUBLE) * n.n)
                          / (CAST(ma.ca AS DOUBLE) * mb.cb))), 6)
             AS mi_nats
    FROM jo JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN n
    GROUP BY n.n
    """,
)
def a_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete mutual information between event type and the
    hash-split treatment — the dependence scalar completing the
    information-theory family (a_user_entropy = marginal entropy,
    a_woe_iv = supervised binning; MI = the symmetric dependence
    measure feature selection ranks by): I(A;B) =
    Σ p(a,b)·ln(p(a,b)/(p(a)p(b))) over the bounded contingency
    table (the a_chi2_independence cells, information-theoretic
    reading). Near-zero here by construction (the split is a hash) —
    which is exactly the null a selector must report faithfully.

    Determinism: all cell counts are exact integers; each log term
    divides identical integers; the ≤|A|·2-term sum rounds at 1e-6.

    Scale: one fact scan to a bounded contingency table, arithmetic
    after."""
    from ..functions.columns import portable_bucket

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        F.col("event_type").alias("a"),
        (portable_bucket(F.col("user_id") + F.lit(_DID_SEED), 2) == 1).alias(
            "b"
        ),
    )
    jo = d.groupBy("a", "b").agg(F.count("*").alias("c"))
    ma = jo.groupBy("a").agg(F.sum("c").alias("ca"))
    mb = jo.groupBy("b").agg(F.sum("c").alias("cb"))
    n = jo.agg(F.sum("c").alias("n"))
    cells = (
        jo.join(ma, "a").join(mb, "b").crossJoin(F.broadcast(n))
    )
    term = (F.col("c").cast("double") / F.col("n")) * F.log(
        (F.col("c").cast("double") * F.col("n"))
        / (F.col("ca").cast("double") * F.col("cb"))
    )
    return cells.agg(
        F.first("n").cast("long").alias("n"),
        F.count("*").alias("n_cells"),
        F.round(F.sum(term), 6).alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# a_cohens_kappa — chance-corrected agreement (integers-only form)
# ---------------------------------------------------------------------------


def _kappa_oracle() -> str:
    """Compose the centroid classifier's registered oracle
    (the a_classifier_eval composition discipline) and emit the
    EXACT integer sufficient statistics of Cohen's κ."""
    from .registry import ORACLES

    preds = ORACLES["emb_centroid_classify"]
    return f"""
    WITH preds AS ({preds}),
    lab AS (
      SELECT label, COUNT(*) AS support FROM preds GROUP BY label
    ), pr AS (
      SELECT pred_label, COUNT(*) AS pred_cnt FROM preds GROUP BY pred_label
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM preds) AS n,
           (SELECT CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT)
            FROM preds) AS n_agree,
           CAST(SUM(lab.support * COALESCE(pr.pred_cnt, 0)) AS BIGINT)
             AS pe_num
    FROM lab LEFT JOIN pr ON pr.pred_label = lab.label
    """


@query("a_cohens_kappa", oracle=_kappa_oracle())
def a_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the centroid classifier and the stored
    labels — chance-corrected agreement, the metric that separates
    "accurate" from "accurate beyond the base rates":
    κ = (p_o − p_e)/(1 − p_e) with p_o = n_agree/n and
    p_e = pe_num/n². Shipped as the EXACT integer sufficient
    statistics (n, n_agree, pe_num = Σ_c support_c·pred_cnt_c) — the
    a_brier_score integers-only discipline: κ is a messy rational and
    a rounded form could land on the half-grid where the engines'
    ROUND semantics diverge; the integers are lossless and the
    consumer derives κ in one line.

    Scale: one prediction pass (the classify scan) + two
    |labels|-row aggregates + a |labels|-row join."""
    from .staged_r07 import emb_centroid_classify

    preds = emb_centroid_classify(spark, sf_dir)
    lab = preds.groupBy("label").agg(F.count("*").alias("support"))
    pr = preds.groupBy("pred_label").agg(F.count("*").alias("pred_cnt"))
    tot = preds.agg(
        F.count("*").alias("n"),
        F.sum(F.col("correct").cast("long")).alias("n_agree"),
    )
    pe = (
        lab.join(pr, lab.label == pr.pred_label, "left")
        .agg(
            F.sum(
                F.col("support") * F.coalesce(F.col("pred_cnt"), F.lit(0))
            ).alias("pe_num")
        )
    )
    return tot.crossJoin(F.broadcast(pe)).select(
        F.col("n").cast("long").alias("n"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.col("pe_num").cast("long").alias("pe_num"),
    )


# ---------------------------------------------------------------------------
# g_modularity — partition quality of the LPA communities
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    """Compose the LPA oracle as the community assignment and emit
    per-community EXACT integer modularity statistics over the same
    derived graph."""
    from .registry import ORACLES

    lpa = ORACLES["g_label_propagation"]
    return f"""
    WITH lpa AS ({lpa}),
    e0 AS (
      SELECT DISTINCT o_orderkey % 200 AS src,
                      200 + o_orderkey % 190 AS dst
      FROM orders
    ), edges AS (
      SELECT src, dst FROM e0
      UNION ALL
      SELECT dst AS src, src AS dst FROM e0
    ), m2 AS (
      SELECT COUNT(*) AS m2 FROM edges
    ), deg AS (
      SELECT src AS vid, COUNT(*) AS d FROM edges GROUP BY src
    ), within AS (
      SELECT ls.label AS community, COUNT(*) AS e_in
      FROM edges e
      JOIN lpa ls ON ls.id = e.src
      JOIN lpa ld ON ld.id = e.dst
      WHERE ls.label IS NOT NULL AND ls.label = ld.label
      GROUP BY ls.label
    ), degs AS (
      SELECT l.label AS community, SUM(d.d) AS deg_sum
      FROM lpa l JOIN deg d ON d.vid = l.id
      WHERE l.label IS NOT NULL
      GROUP BY l.label
    )
    SELECT degs.community,
           CAST(COALESCE(within.e_in, 0) AS BIGINT) AS e_in,
           CAST(degs.deg_sum AS BIGINT) AS deg_sum,
           (SELECT CAST(m2 AS BIGINT) FROM m2) AS m2
    FROM degs LEFT JOIN within USING (community)
    """


@query("g_modularity", oracle=_modularity_oracle())
def g_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity statistics of the LPA partition — the
    quality metric of community detection, closing the loop on
    g_label_propagation ("did the labels actually find structure"):
    per community, the within-community directed edge count e_in and
    the degree mass deg_sum over the SAME derived graph, plus the
    global directed edge count m2. Q = Σ_c (e_in/m2 − (deg_sum/m2)²)
    — shipped as EXACT integers (the a_cohens_kappa / a_brier_score
    integers-only discipline); unlabeled vertices (never reached by
    a seed) are excluded and documented.

    Scale: the LPA rounds (bounded, lazy) + one edges⋈labels⋈labels
    join (the Pregel message shape twice) + bounded aggregates."""
    from ..operators.graph import label_propagation
    from .staged_r11 import _LPA_CLASSES, _LPA_ROUNDS, _LPA_SEEDS

    o = _t(spark, sf_dir, "orders")
    e0 = o.select(
        (F.col("o_orderkey") % 200).alias("src"),
        (F.lit(200) + F.col("o_orderkey") % 190).alias("dst"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = spark.range(_LPA_SEEDS).select(
        F.col("id").alias("vid"),
        F.pmod(F.col("id"), F.lit(_LPA_CLASSES)).alias("lab"),
    )
    lpa = label_propagation(edges, seeds, iterations=_LPA_ROUNDS).filter(
        F.col("label").isNotNull()
    )
    m2 = edges.agg(F.count("*").alias("m2"))
    deg = edges.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("d")
    )
    within = (
        edges.join(
            lpa.select(F.col("id").alias("src"), F.col("label").alias("ls")),
            "src",
        )
        .join(
            lpa.select(F.col("id").alias("dst"), F.col("label").alias("ld")),
            "dst",
        )
        .filter(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("community"))
        .agg(F.count("*").alias("e_in"))
    )
    degs = (
        lpa.join(deg, lpa.id == deg.vid)
        .groupBy(F.col("label").alias("community"))
        .agg(F.sum("d").alias("deg_sum"))
    )
    return (
        degs.join(within, "community", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            F.col("community").cast("long").alias("community"),
            F.coalesce(F.col("e_in"), F.lit(0))
            .cast("long")
            .alias("e_in"),
            F.col("deg_sum").cast("long").alias("deg_sum"),
            F.col("m2").cast("long").alias("m2"),
        )
    )


# ---------------------------------------------------------------------------
# a_permutation_test — deterministic permutation p-value for the lift
# ---------------------------------------------------------------------------

_PERM_B = 100
_PERM_STRIDE = 7919  # prime stride decorrelates the B hash assignments


def _arm_oracle_sql(expr: str, seed: int) -> str:
    """DuckDB replay of functions.columns.portable_arm for
    ``expr + seed`` — the middle-square binary assignment. NOT
    _cms_oracle_bucket_sql(..., 2): the multiplicative hash's low bit
    is the key's PARITY (odd multiplier, power-of-two modulus), so
    stride-shifted "re-assignments" were exact whole-cohort sign
    flips and the permutation null was the degenerate {±d_obs}
    (found live; see portable_arm's docstring). The squaring round
    is the portable nonlinearity; bit 20 of the middle word is the
    arm."""
    km = f"(({expr}) + {seed}) % 4294967296"
    h1 = (
        f"(((({km}) - ({km}) % 65536) // 65536 * 2654435761 % 4294967296"
        f" * 65536 + ({km}) % 65536 * 2654435761) % 4294967296)"
    )
    m = (
        f"(({h1} // 65536) * ({h1} // 65536) * 65536"
        f" + 2 * ({h1} // 65536) * ({h1} % 65536)"
        f" + ({h1} % 65536) * ({h1} % 65536) // 65536) % 4294967296"
    )
    return f"(({m}) // 1048576) % 2"


def _perm_oracle() -> str:
    # seeded per-permutation arm: pass the stride term INSIDE the
    # expression (no post-hoc string surgery on the hash body — the
    # _cms helper's own warning)
    bucket = _arm_oracle_sql(
        f"u.user_id + {_PERM_STRIDE} * g.b", _DID_SEED
    )
    return f"""
    WITH u AS (
      SELECT user_id, ROUND(SUM(value), 2) AS y
      FROM events GROUP BY user_id
    ), expanded AS (
      SELECT g.b, u.user_id, u.y,
             ({bucket}) = 1 AS t
      FROM u CROSS JOIN generate_series(0, {_PERM_B}) AS g(b)
    ), arms AS (
      SELECT b,
             SUM(CASE WHEN t THEN y ELSE 0 END)
               / SUM(CASE WHEN t THEN 1 ELSE 0 END)
             - SUM(CASE WHEN NOT t THEN y ELSE 0 END)
               / SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS d
      FROM expanded GROUP BY b
    ), obs AS (
      SELECT d AS d0 FROM arms WHERE b = 0
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_users,
           {_PERM_B} AS b_total,
           CAST(SUM(CASE WHEN a.b > 0 AND ABS(a.d) >= ABS(o.d0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           ROUND(ANY_VALUE(o.d0), 6) AS obs_diff
    FROM arms a CROSS JOIN obs o
    """


@query("a_permutation_test", oracle=_perm_oracle())
def a_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the treatment lift — the p-VALUE
    companion to a_bootstrap_ci's interval (the two pillars of
    resampling inference, both with DETERMINISTIC portable-hash
    randomness): B=100 re-assignments of users to arms via the
    MIDDLE-SQUARE arm (functions.columns.portable_arm; b=0 is the
    observed assignment — the first formulation drew arms from
    portable_bucket(k, 2), whose low bit is the key's PARITY, so
    every stride-shifted "permutation" was a whole-cohort sign flip
    and the null was the degenerate {±d_obs}; found live, fixed by
    the squaring nonlinearity), the
    null distribution of mean differences from ONE wide
    conditional-sum scan over the per-user money-grid outcomes, and
    the two-sided exceedance count n_extreme — the p-value is
    (1 + n_extreme)/(1 + B), an exact rational the consumer derives
    (integers-only discipline for the count; the comparison
    |diff_b| ≥ |diff_obs| runs on identical doubles and needs no
    rounding at all).

    Scale + PERF lesson: the first formulation computed 4(B+1)=404
    conditional-sum COLUMNS in one aggregate (the a_bootstrap_ci
    shape scaled 4x) and read 16.9 s at sf0.1 — past a few hundred
    heavy columns the wide aggregate falls out of whole-stage
    codegen. EXPLODING to (user × b) narrow rows and grouping by b
    is 12x faster (1.44 s) and flat 10x→100x: user-grain scan →
    explode(B+1) → one narrow groupBy(b) → 101-row arithmetic."""
    from ..functions.columns import portable_arm

    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("y"))
    expanded = u.select(
        "user_id",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B))).alias("b"),
    ).select(
        "b",
        "y",
        (
            portable_arm(
                F.col("user_id")
                + F.lit(_DID_SEED)
                + F.lit(_PERM_STRIDE) * F.col("b")
            )
            == 1
        ).alias("t"),
    )
    arms = expanded.groupBy("b").agg(
        (
            F.sum(F.when(F.col("t"), F.col("y")).otherwise(0.0))
            / F.sum(F.when(F.col("t"), 1).otherwise(0))
            - F.sum(F.when(~F.col("t"), F.col("y")).otherwise(0.0))
            / F.sum(F.when(~F.col("t"), 1).otherwise(0))
        ).alias("d")
    )
    obs = arms.filter(F.col("b") == 0).select(F.col("d").alias("d0"))
    n_users = u.agg(F.count("*").alias("n_users"))
    return (
        arms.crossJoin(F.broadcast(obs))
        .agg(
            F.sum(
                F.when(
                    (F.col("b") > 0)
                    & (F.abs(F.col("d")) >= F.abs(F.col("d0"))),
                    1,
                ).otherwise(0)
            ).alias("n_extreme"),
            F.round(F.first("d0"), 6).alias("obs_diff"),
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            F.col("n_users").cast("long").alias("n_users"),
            F.lit(_PERM_B).cast("long").alias("b_total"),
            F.col("n_extreme").cast("long").alias("n_extreme"),
            "obs_diff",
        )
    )
