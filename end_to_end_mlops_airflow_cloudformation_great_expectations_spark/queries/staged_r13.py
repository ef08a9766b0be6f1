"""Round-8 additions (registered AFTER the pinned r8 window; rotation
slot in round 10 at the earliest — CLAUDE.md new-query discipline:
proven local-green at sf0.001 + sf0.01 incl. --plain before landing).

- ``dedup_embedding_probe_topk`` — the CAPPED semantic-dedup probe
  (VERDICT r07 item 4): serve near-dup lookups through the persisted
  hyperplane-LSH index with output capped to the k best corpus
  matches per probe vector (operators/similarity.
  embdedup_index_probe_topk). The uncapped probe's output is
  quadratic in duplicate-cluster size — at the 100x/4 GB stress
  point, 216 s of pure pair emission — while every dedup policy
  downstream consumes only the argmax pair; the cap makes emission
  O(k · probe). Driver-checked with the lifecycle queries' invariant
  pattern: per probe id, the capped result must equal the exact
  argmax (total (-sim, corpus_id) order on the 1e-6 grid) of the
  uncapped probe, and never exceed k rows — deterministic at fixed
  data, all-TRUE DuckDB twin (banded-oracle pattern, round 3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .registry import query
from .staged_r07 import _scratch
from .staged_r12 import _KNN_COHORT, _KNN_K, _KNN_SPLIT_SQL


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return catalog.load(spark, sf_dir, table)


@query(
    "dedup_embedding_probe_topk",
    oracle="""
    SELECT CAST(vec_id AS BIGINT) AS new_id,
           TRUE AS cap_ok, TRUE AS argmax_ok
    FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 400
    """,
)
def dedup_embedding_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped (k=1) probe of the persisted embedding-dedup index vs
    the uncapped probe's exact argmax. Index over even vec_ids, probe
    slice = odd vec_ids < 400 (disjoint from the corpus, so every
    emitted pair is a genuine cross near-dup; the fixture's planted
    semantic near-dups make ~tens of pairs real at threshold 0.35 —
    the invariant is exercised, not vacuous). Checks per probe id:

      cap_ok    — the capped probe emitted ≤ 1 row for this id;
      argmax_ok — that row IS the uncapped probe's best pair under
                  the total (-cos_sim · 1e6, corpus_id) order (both
                  sides null when the id has no pair — eqNullSafe).

    Build-time index construction is the sanctioned lifecycle
    exception (build once, query many); both probes stay lazy.
    Scale: the capped probe is the production posture — candidate
    generation and verify are identical to the uncapped path, the
    cap is a probe-partitioned window (external spillable sort, no
    SinglePartition), output O(k · probe size)."""
    from ..operators import similarity

    base = _scratch("embdedup_topk")
    e = _t(spark, sf_dir, "embeddings")
    probe = e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 400))

    idx = os.path.join(base, "idx")
    similarity.embdedup_index_build(e.filter(F.col("vec_id") % 2 == 0), idx)

    kw = dict(threshold=0.35)
    full = similarity.embdedup_index_probe(probe, idx, **kw)
    cap = similarity.embdedup_index_probe_topk(probe, idx, k=1, **kw)

    def best(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("new_id").agg(
            F.min(
                F.struct(
                    (-F.round(F.col("cos_sim") * 1e6)).cast("long").alias(
                        "neg"
                    ),
                    F.col("corpus_id").alias("corpus_id"),
                )
            ).alias(out),
            F.count("*").alias(f"{out}_n"),
        )

    ids = probe.select(F.col("vec_id").cast("long").alias("new_id"))
    joined = (
        ids.join(best(full, "want"), "new_id", "left")
        .join(best(cap, "got"), "new_id", "left")
    )
    return joined.select(
        "new_id",
        F.coalesce(F.col("got_n") <= 1, F.lit(True)).alias("cap_ok"),
        F.col("got").eqNullSafe(F.col("want")).alias("argmax_ok"),
    )


_KNN_IVF_NPROBE = 12
_KNN_IVF_AGREE_FLOOR = 0.75


@query(
    "sim_knn_classify_ivf",
    oracle=f"""
    SELECT (SELECT COUNT(*) FROM embeddings
            WHERE {_KNN_SPLIT_SQL} >= 80 AND vec_id < {_KNN_COHORT})
             AS n_queries,
           TRUE AS agree_ok
    """,
)
def sim_knn_classify_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification SERVED FROM THE PERSISTED IVF INDEX
    (VERDICT r07 item 8 — closes the loop between the index lifecycle
    and a consumer query): identical cohort, voting rule and
    tie-breaks as sim_knn_classify, but neighbors come from
    ivf_index_search over the cell-partitioned postings (partition-
    pruned probes) instead of the brute-force corpus scan — the
    production serving path at 100 TB, where scanning the corpus per
    query batch is not an option.

    Banded check (the _register_ann_recall convention): the IVF
    classifier's predictions must AGREE with the exact brute-force
    classifier on ≥ {_KNN_IVF_AGREE_FLOOR} of the cohort. Measured
    agreement at n_probe={_KNN_IVF_NPROBE}/16 cells: 0.913 (sf0.001)
    / 0.870 (sf0.01) — the floor sits under the measured minimum, so
    the check is deterministic at fixed data (quantizer sample and
    Lloyd rounds are seeded; all-TRUE DuckDB twin). n_queries is a
    real cross-engine integer: every cohort member must receive a
    prediction from BOTH paths (full-outer join + coalesced count),
    so dropped queries can't hide inside the band.

    Eager at build time (index build — the sanctioned lifecycle
    exception); both search paths and the vote stay lazy. The
    16-cell/12-probe geometry is fixture-sized; production geometry
    is thousands of cells with n_probe ≈ √cells — the plumbing
    (build → persisted postings → pruned search → vote) is what this
    query pins."""
    from ..functions.columns import portable_bucket
    from ..operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    split = portable_bucket(F.col("vec_id"), 100)
    train = e.filter(split < 80)
    test = e.filter(
        (split >= 80) & (F.col("vec_id") < _KNN_COHORT)
    ).withColumnRenamed("vec_id", "query_id")

    base = os.path.join(_scratch("knn_ivf"), "idx")
    similarity.ivf_index_build(train, base, n_centroids=16)

    def pred_of(nbrs: DataFrame) -> DataFrame:
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
        return votes.groupBy("query_id").agg(
            F.max(
                F.struct(
                    F.col("c"), (-F.col("nlabel")).cast("long").alias("nl")
                )
            ).alias("m")
        ).select("query_id", (-F.col("m.nl")).alias("pred"))

    bf = pred_of(
        similarity.brute_force_topk(test, train, k=_KNN_K)
    ).withColumnRenamed("pred", "p_bf")
    iv = pred_of(
        similarity.ivf_index_search(
            test, base, k=_KNN_K, n_probe=_KNN_IVF_NPROBE,
            query_id="query_id",
        )
    ).withColumnRenamed("pred", "p_ivf")
    j = bf.join(iv, "query_id", "full_outer")
    return j.agg(
        F.count("*").cast("long").alias("n_queries"),
        (
            F.sum(
                (F.col("p_bf") == F.col("p_ivf")).cast("long")
            )
            >= F.count("*") * F.lit(_KNN_IVF_AGREE_FLOOR)
        ).alias("agree_ok"),
    )
