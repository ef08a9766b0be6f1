"""Round-11 additions. Registered BEHIND the live driver window;
enqueued in _ROUND13_QUEUE for the r13 rotation. Same discipline as
every prior staged batch: proven green at sf0.001+sf0.01 incl.
--plain BEFORE landing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window

from .registry import query
from .staged_r05 import _bpe_round_sql
from .staged_r07 import _t

# ---------------------------------------------------------------------------
# text_bpe_merges_k16 — BPE induction past demo depth (VERDICT r10 item 4)
# ---------------------------------------------------------------------------

_K16 = 16

_BPE_K16_ORACLE = (
    r"""
    WITH w0 AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> len(x) > 0) AS ws
      FROM documents
    ), t0 AS MATERIALIZED (
      SELECT doc_id, unnest(ws) AS sym,
             generate_subscripts(ws, 1) - 1 AS pos
      FROM w0
    ),"""
    + ",".join(_bpe_round_sql(r) for r in range(_K16))
    + """
    SELECT * FROM ("""
    + " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS round, a AS sym_a, "
        f"b AS sym_b, cnt FROM m{r}"
        for r in range(_K16)
    )
    + ")"
)


@query("text_bpe_merges_k16", oracle=_BPE_K16_ORACLE)
def text_bpe_merges_k16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE induction at DEPTH (VERDICT r10 item 4 — text_bpe_merges_k
    proves the loop at k=3 demo depth; a real tokenizer needs
    hundreds of merges, and the blocker was PLAN growth, not data
    volume): 16 merge rounds with per-round lineage truncation
    (operators/text.bpe_merge_rounds(checkpoint_rounds=True) —
    localCheckpoint per round cuts the ~3x-per-round logical plan
    blowup to linear, measured 38 KB@k=3 -> 875 KB@k=6 exponential
    vs ~1 KB/round flat checkpointed, test-pinned). Build-time
    laziness exception, documented in the operator: finalizing each
    round's checkpoint RDD materializes its shuffle stages (bounded,
    O(k) over the token stream) — the sanctioned inherently-iterative
    trade, same as pagerank's checkpoint discipline. Partitioning
    bounded off input bytes (catalog.bounded_parts — the plain-
    session guard).

    The DuckDB twin unrolls the SAME 16 rounds (the shared
    _bpe_round_sql builder, now AS MATERIALIZED per round — DuckDB
    inlines plain CTEs at every reference, and the unrolled chain
    references each round twice, so the un-materialized form was
    exponential too: it exhausted file handles at k=8 and runs 0.7 s
    at k=16 materialized). Every one of the 16 chosen pairs AND its
    count is hash-checked cross-engine; tie-breaks are
    integer/string only, so there is no float band anywhere.

    Scale: per-round cost is ONE pair-count aggregate (map-side
    partial) + ONE bounded window pass over the checkpointed token
    stream — k sequential rounds of linear work, the textbook
    distributed-BPE shape. The checkpoint keeps each round's plan
    O(1), so k=100s of merges grows wall-clock linearly, never the
    optimizer."""
    from .. import catalog
    from ..operators import text

    return text.bpe_merge_rounds(
        _t(spark, sf_dir, "documents"),
        k=_K16,
        checkpoint_rounds=True,
        n_parts=catalog.bounded_parts(spark, sf_dir, "documents"),
    )


# ---------------------------------------------------------------------------
# p_curation_pipeline — the END-TO-END training-data curation pipeline
# composed as ONE query (VERDICT r10 item 5)
# ---------------------------------------------------------------------------

#: Scale-free re-crawl synthesis: a doc with doc_id % 8 == 1 (and
#: id >= 20) is a re-crawl of the doc 20 ids back — 20 because sources
#: cycle every 20 ids and the 80/20 split every 5, so the neighbor
#: shares BOTH the URL host (source) and the corpus class: a constant
#: ~10% re-crawl RATE at ANY corpus size. The first draft used
#: doc_id % 300, whose 6000 distinct URL keys CAPPED the survivor
#: corpus at any scale (the same absolute-constant bug as the <400
#: split, caught by the same 100x audit).
_CP_JAC_N = 2       # near-dup word-ngram order (bigrams — fixture yields pairs)
_CP_JAC_T = 0.5     # near-dup Jaccard threshold (Lee et al. run NearDup at
                    # 0.8; 0.3 collapsed every doc carrying a duplicated
                    # 20-token window and starved the substring rung — the
                    # rungs must each have work at the fixture)
_CP_SUB_L = 20      # exact-substring window (tokens)
_CP_DECON_N = 5     # decontamination gram order
_CP_BUDGET = 800    # per-source token budget
_CP_CAP = 256       # pack bin capacity
_CP_SHARDS = 8      # pack shards

_CP_5G = (
    "list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' "
    "|| ws[i+3] || ' ' || ws[i+4] "
    "for i in generate_series(1, GREATEST(LEN(ws) - 4, 0))])"
)
_CP_ORACLE = rf"""
    WITH RECURSIVE base AS MATERIALIZED (
      SELECT doc_id, source, lang, text,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> len(x) > 0) AS ws
      FROM documents WHERE doc_id % 5 < 4
    ), bench AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> len(x) > 0) AS ws
      FROM documents WHERE doc_id % 5 = 4
    ), s0 AS MATERIALIZED (
      SELECT doc_id, source, lang, text, ws, LEN(ws) AS n_tok FROM base
    ), u AS (
      SELECT doc_id, source, lang, text, ws, n_tok,
             lower(regexp_extract(url, '^[a-z]+://([^/?]+)', 1))
             || regexp_replace(
                  regexp_extract(url, '^[a-z]+://[^/?]+([^?]*)', 1),
                  '/+$', '') AS curl
      FROM (SELECT *,
              'https://' || upper(source) || '.Example.com/Doc/'
              || CAST(CASE WHEN doc_id % 8 = 1 AND doc_id >= 20
                           THEN doc_id - 20 ELSE doc_id END AS VARCHAR)
              || '/?utm_lang=' || lang
              || '&session=' || CAST(doc_id AS VARCHAR) AS url
            FROM s0)
    ), s1 AS MATERIALIZED (
      SELECT doc_id, source, lang, text, ws, n_tok FROM u
      WHERE doc_id IN (SELECT MIN(doc_id) FROM u GROUP BY curl)
    ), s2 AS MATERIALIZED (
      SELECT * FROM s1
      WHERE doc_id IN (SELECT MIN(doc_id) FROM s1 GROUP BY lower(text))
    ), pos2 AS (
      SELECT doc_id, ws,
             unnest(generate_series(1, GREATEST(LEN(ws) - {_CP_SUB_L} + 1, 0)))
               AS pos
      FROM s2
    ), gr2 AS (
      SELECT doc_id, pos,
             list_aggr(ws[pos:pos + {_CP_SUB_L} - 1], 'string_agg', ' ') AS gram
      FROM pos2
    ), cov2 AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY gram
                                      ORDER BY doc_id, pos) AS rn
            FROM gr2)
      WHERE rn >= 2
    ), isl2 AS (
      SELECT doc_id, pos,
             CASE WHEN COALESCE(pos - LAG(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos), {_CP_SUB_L} + 1)
                  > {_CP_SUB_L} THEN 1 ELSE 0 END AS brk
      FROM cov2
    ), sp2 AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS span
      FROM isl2
    ), rem AS MATERIALIZED (
      SELECT doc_id, SUM(span_tokens) AS removed FROM (
        SELECT doc_id, span,
               MAX(pos) - MIN(pos) + {_CP_SUB_L} AS span_tokens
        FROM sp2 GROUP BY doc_id, span
      ) GROUP BY doc_id
    ), s3 AS MATERIALIZED (
      SELECT s2.*, s2.n_tok - COALESCE(rem.removed, 0) AS kept_tok
      FROM s2 LEFT JOIN rem USING (doc_id)
    ), g2 AS MATERIALIZED (
      SELECT doc_id,
             list_distinct([ws[i] || ' ' || ws[i+1]
               for i in generate_series(1, GREATEST(LEN(ws) - 1, 0))]) AS ng
      FROM s3
    ), prs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM g2 a JOIN g2 b ON a.doc_id < b.doc_id
      WHERE ROUND(CAST(LEN(list_intersect(a.ng, b.ng)) AS DOUBLE) /
            (LEN(a.ng) + LEN(b.ng) - LEN(list_intersect(a.ng, b.ng))), 4)
            >= {_CP_JAC_T}
    ), und(ua, ub) AS (
      SELECT id_a, id_b FROM prs UNION SELECT id_b, id_a FROM prs
    ), verts(vn) AS (
      SELECT ua FROM und UNION SELECT ub FROM und
    ), reach(rn_, rr) AS (
      SELECT vn, vn FROM verts
      UNION
      SELECT u2.ub, reach.rr FROM reach JOIN und u2 ON u2.ua = reach.rn_
    ), comp AS MATERIALIZED (
      SELECT rn_ AS cid, MIN(rr) AS component FROM reach GROUP BY rn_
    ), s4 AS MATERIALIZED (
      SELECT s3.* FROM s3 LEFT JOIN comp ON comp.cid = s3.doc_id
      WHERE comp.cid IS NULL OR comp.component = s3.doc_id
    ), bg AS MATERIALIZED (
      SELECT DISTINCT unnest({_CP_5G}) AS gram FROM bench
    ), contam AS MATERIALIZED (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest({_CP_5G}) AS gram FROM s4) t
      JOIN bg USING (gram)
    ), s5 AS MATERIALIZED (
      SELECT * FROM s4
      WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    ), s6 AS MATERIALIZED (
      SELECT doc_id, source, kept_tok FROM (
        SELECT *, SUM(kept_tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
        FROM s5
      ) WHERE cum <= {_CP_BUDGET}
    ), pk AS MATERIALIZED (
      SELECT doc_id, kept_tok, doc_id % {_CP_SHARDS} AS shard,
             ROW_NUMBER() OVER (PARTITION BY doc_id % {_CP_SHARDS}
                                ORDER BY doc_id) AS prn
      FROM s6
    ), walk AS (
      SELECT shard, doc_id, kept_tok, prn,
             CAST(0 AS BIGINT) AS bin, kept_tok AS fill
      FROM pk WHERE prn = 1
      UNION ALL
      SELECT pk.shard, pk.doc_id, pk.kept_tok, pk.prn,
             CASE WHEN w.fill + pk.kept_tok <= {_CP_CAP}
                  THEN w.bin ELSE w.bin + 1 END,
             CASE WHEN w.fill + pk.kept_tok <= {_CP_CAP}
                  THEN w.fill + pk.kept_tok ELSE pk.kept_tok END
      FROM walk w JOIN pk ON pk.shard = w.shard AND pk.prn = w.prn + 1
    ), nb AS (
      SELECT CAST(COALESCE(SUM(mx) + COUNT(*), 0) AS BIGINT) AS n_bins
      FROM (SELECT shard, MAX(bin) AS mx FROM walk GROUP BY shard)
    )
    SELECT CAST(stage_id AS BIGINT) AS stage_id, stage,
           CAST(docs AS BIGINT) AS docs,
           CAST(dropped AS BIGINT) AS dropped,
           CAST(tokens AS BIGINT) AS tokens,
           CAST(bins AS BIGINT) AS bins
    FROM (
      SELECT 0 AS stage_id, 'total' AS stage,
             (SELECT COUNT(*) FROM s0) AS docs, 0 AS dropped,
             (SELECT SUM(n_tok) FROM s0) AS tokens, 0 AS bins
      UNION ALL
      SELECT 1, 'url_dedup', (SELECT COUNT(*) FROM s1),
             (SELECT COUNT(*) FROM s0) - (SELECT COUNT(*) FROM s1),
             (SELECT SUM(n_tok) FROM s1), 0
      UNION ALL
      SELECT 2, 'exact_dedup', (SELECT COUNT(*) FROM s2),
             (SELECT COUNT(*) FROM s1) - (SELECT COUNT(*) FROM s2),
             (SELECT SUM(n_tok) FROM s2), 0
      UNION ALL
      SELECT 3, 'substring_rewrite', (SELECT COUNT(*) FROM s3), 0,
             (SELECT SUM(kept_tok) FROM s3), 0
      UNION ALL
      SELECT 4, 'neardup_minhash', (SELECT COUNT(*) FROM s4),
             (SELECT COUNT(*) FROM s3) - (SELECT COUNT(*) FROM s4),
             (SELECT SUM(kept_tok) FROM s4), 0
      UNION ALL
      SELECT 5, 'decontaminate', (SELECT COUNT(*) FROM s5),
             (SELECT COUNT(*) FROM s4) - (SELECT COUNT(*) FROM s5),
             (SELECT SUM(kept_tok) FROM s5), 0
      UNION ALL
      SELECT 6, 'token_budget', (SELECT COUNT(*) FROM s6),
             (SELECT COUNT(*) FROM s5) - (SELECT COUNT(*) FROM s6),
             (SELECT SUM(kept_tok) FROM s6), 0
      UNION ALL
      SELECT 7, 'pack', (SELECT COUNT(*) FROM s6), 0,
             (SELECT SUM(kept_tok) FROM s6), (SELECT n_bins FROM nb)
    )
"""


@query("p_curation_pipeline", oracle=_CP_ORACLE)
def p_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data curation pipeline composed as ONE
    query (VERDICT r10 item 5 — the flagship "the engine runs a real
    pipeline" demonstration; the per-op queries prove each rung, this
    proves the COMPOSITION): over the corpus slice (doc_id % 5 < 4 —
    an 80/20 PROPORTIONAL split, so the corpus side scales with the
    data; an absolute doc_id<400 split would pin the pipeline at 400
    docs under the stress harness's fresh replica ids and fake the
    scale point, caught live at 100x) —

      0 total
      1 URL dedup        (synthesize the re-crawl URL per doc with
                          case/query/session junk at a scale-free ~10%
                          re-crawl rate — the dedup_url_canonical
                          convention — then canonicalize + keep min-id
                          per canonical URL)
      2 exact dedup      (keep min-id per lower(text))
      3 substring rewrite (Lee-et-al exact-substring removal at L={sl}
                          over the post-exact corpus — token-level:
                          docs stay, every non-first copy of a
                          duplicated L-token window leaves;
                          operators/dedup.duplicated_token_spans
                          keep_first. Runs BEFORE doc-level near-dup,
                          where the duplicated runs still exist —
                          after it, near-dup's clone clusters would
                          already contain them)
      4 near-dup         (the PRODUCTION MinHash-LSH path: shingle ->
                          minhash -> band-bucket -> exact word-{jn}-gram
                          Jaccard >= {jt} verify on the ORIGINAL text ->
                          connected components -> keep each cluster's
                          min-id; the oracle replays the exact
                          ALL-PAIRS truth, so the hash check also
                          proves LSH recall == 1.0 at the oracle
                          scales)
      5 decontaminate    (drop survivors sharing ANY distinct word
                          {dn}-gram with the held-out benchmark slice
                          (doc_id % 5 == 4) — GPT-3 appendix-C
                          zero-tolerance; probe joined on the gram key
                          WITHOUT a broadcast hint: the benchmark side
                          scales with the corpus here)
      6 token budget     (per-source prefix sample by doc_id order,
                          cumulative post-rewrite tokens <= {bud} — the
                          deterministic mixture-sampling rung)
      7 pack             (next-fit packing of the final docs' rewritten
                          token counts, capacity {cap}, {sh} shards —
                          the trainer-facing bins)

    Output: the per-stage funnel (docs, dropped, tokens, bins) — ALL
    exact integers; token accounting switches to the REWRITTEN counts
    from stage 3 on (the tokens that would actually ship), and every
    doc-level rung reconciles (docs[i] + dropped[i] == docs[i-1]).
    The DuckDB twin replays the ENTIRE chain as one chained CTE
    (recursive closure for components, recursive walk for packing,
    MATERIALIZED on every multi-referenced stage — the CTE-inlining
    lesson), so the composition itself is hash-checked cross-engine,
    not just the rungs; a full independent Python replay is the third
    engine (tests/test_staged_r17.py).

    Scale: stages 1-2 are hash groupBys; stage 3 is the one-gram-
    shuffle window-cover; stage 4's candidates are LSH-bucket-bounded
    (never all-pairs — the first draft's lang-blocked exact pairs
    were 3.2B pairs/block at the 100x point); stage 5 shuffle-joins
    the gram key; stage 6 is a per-source window; stage 7 a
    grouped-map over shards. Stage boundaries localCheckpoint (real
    pipelines persist the intermediate corpus; 20.8 -> 8.1 s
    measured). Funnel aggregates multi-reference shared subtrees —
    byte-identical exchanges collapse to ReusedExchange under AQE
    (the PMI/bootstrap precedent)."""
    from ..operators import dedup, packing

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda w: F.length(w) > 0
    )
    corpus = d.filter(F.col("doc_id") % 5 < 4)
    bench = d.filter(F.col("doc_id") % 5 == 4)
    s0 = corpus.select(
        "doc_id", "source", "lang", "text", F.size(toks).alias("n_tok")
    )

    # stage 1: URL dedup (synthesize -> canonicalize -> min-id group)
    page_id = F.when(
        (F.col("doc_id") % 8 == 1) & (F.col("doc_id") >= 20),
        F.col("doc_id") - 20,
    ).otherwise(F.col("doc_id"))
    url = F.concat(
        F.lit("https://"),
        F.upper("source"),
        F.lit(".Example.com/Doc/"),
        page_id.cast("string"),
        F.lit("/?utm_lang="),
        F.col("lang"),
        F.lit("&session="),
        F.col("doc_id").cast("string"),
    )
    u = s0.withColumn(
        "curl",
        F.concat(
            F.lower(F.regexp_extract(url, r"^[a-z]+://([^/?]+)", 1)),
            F.regexp_replace(
                F.regexp_extract(url, r"^[a-z]+://[^/?]+([^?]*)", 1),
                "/+$",
                "",
            ),
        ),
    )
    k1 = u.groupBy("curl").agg(F.min("doc_id").alias("doc_id"))
    s1 = u.join(k1, ["curl", "doc_id"], "left_semi").drop("curl")

    # stage 2: exact dedup on the canonical text
    k2 = s1.groupBy(F.lower("text").alias("t")).agg(
        F.min("doc_id").alias("doc_id")
    )
    s2 = s1.join(
        k2,
        (F.lower(s1["text"]) == k2["t"]) & (s1["doc_id"] == k2["doc_id"]),
        "left_semi",
    )
    # stage boundary: every later stage + funnel aggregate re-reads the
    # post-exact corpus — truncate lineage (real pipelines persist the
    # intermediate corpus; the components fixpoint below executes at
    # build anyway, the established dedup_cluster_canonical precedent)
    s2 = s2.localCheckpoint(eager=False)

    # stage 3: exact-substring removal (token-level) on the post-exact
    # corpus — where the duplicated runs still exist
    spans = dedup.duplicated_token_spans(
        s2, min_tokens=_CP_SUB_L, hash_grams=True, keep_first=True
    )
    rem = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").alias("removed")
    )
    s3 = s2.join(rem, "doc_id", "left").withColumn(
        "kept_tok",
        F.col("n_tok") - F.coalesce(F.col("removed"), F.lit(0)),
    ).drop("removed")

    # stage 4: near-dup clusters -> keep each cluster's min-id (LSH
    # candidates, exact-Jaccard verify; see docstring)
    pairs = dedup.minhash_neardup_pairs(
        s3,
        threshold=_CP_JAC_T,
        shingle_fn=lambda c: dedup.word_ngrams(c, _CP_JAC_N),
    ).select("id_a", "id_b")
    comp = dedup.connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    s4 = s3.join(losers, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )  # stage boundary — contam, s5, and two funnel aggregates re-read

    # stage 5: decontaminate (any shared 5-gram with the benchmark;
    # no broadcast hint — the benchmark side scales with the corpus)
    contam = dedup.decontaminate(
        s4, bench, n=_CP_DECON_N, broadcast_probe=False
    ).select(F.col("id").alias("doc_id"))
    s5 = s4.join(contam, "doc_id", "left_anti")

    # stage 6: per-source token-budget prefix sample
    w6 = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s6 = s5.withColumn("cum", F.sum("kept_tok").over(w6)).filter(
        F.col("cum") <= _CP_BUDGET
    )

    # stage 7: next-fit pack on the final rewritten token counts
    packed = packing.pack_next_fit(
        s6.select(
            "doc_id",
            (F.col("doc_id") % _CP_SHARDS).alias("shard"),
            F.col("kept_tok").alias("n_tokens"),
        ),
        capacity=_CP_CAP,
    )
    nb = packed.groupBy("shard").agg(F.max("bin").alias("mx")).agg(
        F.coalesce(F.sum(F.col("mx") + 1), F.lit(0)).alias("n_bins")
    )

    zero = F.lit(0).cast("long")

    def cnt(df: DataFrame, dc: str, tc) -> DataFrame:
        return df.agg(
            F.count("*").cast("long").alias(dc),
            F.sum(tc).cast("long").alias(dc + "_t"),
        )

    c0 = cnt(s0, "c0", F.col("n_tok"))
    c1 = cnt(s1, "c1", F.col("n_tok"))
    c2 = cnt(s2, "c2", F.col("n_tok"))
    c3 = cnt(s3, "c3", F.col("kept_tok"))
    c4 = cnt(s4, "c4", F.col("kept_tok"))
    c5 = cnt(s5, "c5", F.col("kept_tok"))
    c6 = cnt(s6, "c6", F.col("kept_tok"))
    counts = (
        c0.crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .crossJoin(F.broadcast(c4))
        .crossJoin(F.broadcast(c5))
        .crossJoin(F.broadcast(c6))
        .crossJoin(F.broadcast(nb))
    )
    stages = [
        (0, "total", "c0", zero, F.col("c0_t"), zero),
        (1, "url_dedup", "c1", F.col("c0") - F.col("c1"), F.col("c1_t"), zero),
        (2, "exact_dedup", "c2", F.col("c1") - F.col("c2"), F.col("c2_t"), zero),
        (3, "substring_rewrite", "c3", zero, F.col("c3_t"), zero),
        (4, "neardup_minhash", "c4", F.col("c3") - F.col("c4"), F.col("c4_t"), zero),
        (5, "decontaminate", "c5", F.col("c4") - F.col("c5"), F.col("c5_t"), zero),
        (6, "token_budget", "c6", F.col("c5") - F.col("c6"), F.col("c6_t"), zero),
        (7, "pack", "c6", zero, F.col("c6_t"), F.col("n_bins")),
    ]
    rows = [
        counts.select(
            F.lit(sid).cast("long").alias("stage_id"),
            F.lit(name).alias("stage"),
            F.col(dc).cast("long").alias("docs"),
            dropped.cast("long").alias("dropped"),
            tokens.cast("long").alias("tokens"),
            bins.cast("long").alias("bins"),
        )
        for sid, name, dc, dropped, tokens, bins in stages
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


p_curation_pipeline.__doc__ = (
    p_curation_pipeline.__doc__.replace("{jn}", str(_CP_JAC_N))
    .replace("{jt}", str(_CP_JAC_T))
    .replace("{dn}", str(_CP_DECON_N))
    .replace("{sl}", str(_CP_SUB_L))
    .replace("{bud}", str(_CP_BUDGET))
    .replace("{cap}", str(_CP_CAP))
    .replace("{sh}", str(_CP_SHARDS))
)
