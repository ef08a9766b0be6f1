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

All proven green at sf0.001 + sf0.01 (incl. --plain) before
registration, per the window discipline in queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.encode import hash_split_col
from ..operators.ranks import attach_global_ranks
from ..operators.sketches import bloom_build, bloom_probe
from ..operators.train import naive_bayes_fit, naive_bayes_score
from .registry import query
from .staged_r06 import _CMS_SEEDS, _cms_oracle_bucket_sql
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
