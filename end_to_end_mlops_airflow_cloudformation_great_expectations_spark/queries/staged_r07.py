"""Round-7 queries: the streaming/index MAINTENANCE operators made
driver-visible (VERDICT r05 "Next round" item 3), plus the fit-free
PCA apply (item 7).

The maintenance sinks (ivf_index_append/compact, moment_stats_sink)
are foreachBatch side-effect operators, so a pure SELECT can't drive
them — instead each query here EXERCISES the lifecycle against a
throwaway on-disk index/rollup at build time and returns a lazy
comparison against the one-shot computation, with an all-TRUE DuckDB
twin (the banded-oracle pattern from round 3, in the GX-gate role the
reference applies to data quality — airflow-setup.py:457 — here
applied to index freshness). Deterministic at fixed data, so a local
pass at sf0.01 guarantees the driver pass.

LAZINESS NOTE (CLAUDE.md discipline): index build/append/compact and
the 1-row artifact write are inherently SIDE-EFFECTFUL lifecycle
steps — they run eagerly at query-build time against a fresh temp
dir, like the documented quantizer-training exception. Everything
data-sized stays lazy: the final searches, the moment comparison, and
the corpus-wide projection are unexecuted plans when the query
returns.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from .registry import ORACLES, query


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return catalog.load(spark, sf_dir, table)


def _search_sig(df: DataFrame) -> DataFrame:
    """Order-insensitive per-query signature of a top-k search result:
    the sorted (rnk, neighbor_id, cos_sim) array. cos_sim is already
    rounded to the 1e-6 grid inside ivf_index_search and every
    lifecycle path runs the identical arithmetic on the identical
    vectors, so signature equality is exact, not banded."""
    return df.groupBy("query_id").agg(
        F.array_sort(
            F.collect_list(F.struct("rnk", "neighbor_id", "cos_sim"))
        ).alias("sig")
    )


@query(
    "ivf_lifecycle_checked",
    oracle="""
    SELECT CAST(vec_id AS BIGINT) AS query_id,
           TRUE AS append_ok, TRUE AS compact_ok
    FROM embeddings WHERE vec_id < 20
    """,
)
def ivf_lifecycle_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index LIFECYCLE as a driver-checkable invariant: build
    the index on half the corpus, stream the other half through
    ivf_index_append in two micro-batches, and assert per query that

      search(base + deltas)      == search(one-shot index)   (append_ok)
      search(compacted base)     == search(one-shot index)   (compact_ok)

    — i.e. incremental maintenance changes WHERE the postings live
    (delta dirs, then the folded cell-partitioned base) but never a
    single search row. The one-shot twin appends the same rows as one
    batch, so both sides share centroids and assignment arithmetic.
    The two pre-compaction searches are collected at build time
    (bounded: 20 queries × k rows) because compaction DELETES the
    delta dirs their lazy plans would re-list; the post-compaction
    search stays lazy and exercises the recovered/compacted layout —
    including _recover_compaction — at driver collect time. All-TRUE
    oracle (banded-oracle discipline): deterministic at fixed data."""
    from ..operators import similarity

    base = tempfile.mkdtemp(prefix="sg_ivf_life_")
    e = _t(spark, sf_dir, "embeddings")
    first = e.filter(F.col("vec_id") % 2 == 0)
    rest = e.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        similarity._as_double(F.col("embedding")).alias("cv"),
    )
    q = e.filter(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")

    inc = os.path.join(base, "inc")
    similarity.ivf_index_build(first, inc, n_centroids=16)
    sink = similarity.ivf_index_append(inc)
    sink(rest.filter(F.col("neighbor_id") % 4 == 1), 0)
    sink(rest.filter(F.col("neighbor_id") % 4 == 3), 1)

    one = os.path.join(base, "one")
    similarity.ivf_index_build(first, one, n_centroids=16)
    similarity.ivf_index_append(one)(rest, 0)

    k = dict(k=5, n_probe=6, query_id="query_id")
    inc_rows = _search_sig(
        similarity.ivf_index_search(q, inc, **k)
    ).collect()
    one_rows = _search_sig(
        similarity.ivf_index_search(q, one, **k)
    ).collect()
    sig_schema = (
        "query_id long, "
        "sig array<struct<rnk: long, neighbor_id: long, cos_sim: double>>"
    )
    inc_df = spark.createDataFrame(inc_rows, sig_schema)
    one_df = spark.createDataFrame(one_rows, sig_schema)

    similarity.ivf_index_compact(spark, inc)
    cpt_df = _search_sig(similarity.ivf_index_search(q, inc, **k))

    o = one_df.select(
        "query_id",
        F.col("sig").alias("one_sig"),
    )
    return (
        o.join(inc_df.withColumnRenamed("sig", "inc_sig"), "query_id")
        .join(cpt_df.withColumnRenamed("sig", "cpt_sig"), "query_id")
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            (F.col("inc_sig") == F.col("one_sig")).alias("append_ok"),
            (F.col("cpt_sig") == F.col("one_sig")).alias("compact_ok"),
        )
    )


@query(
    "stream_moment_sink_checked",
    oracle="""
    SELECT CAST(d * d + d + 1 AS BIGINT) AS n_cells, TRUE AS ok
    FROM (SELECT LEN(embedding) AS d FROM embeddings LIMIT 1)
    """,
)
def stream_moment_sink_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpointed moment rollup made driver-checkable: push the
    embedding corpus through moment_stats_sink in THREE micro-batches
    (exactly the at-least-once foreachBatch shape the _snapshot_guard
    protects), then compare the final snapshot's (i, j, s) sufficient
    statistics against the one-shot moment_partials of the whole
    corpus. The merge is an associative/commutative SUM, so the two
    differ only by float summation order — |Δ| ≤ 1e-6·(1+|s|) is
    orders of magnitude above reorder noise and deterministic at
    fixed data. Output: the full d²+d+1 cell count and an all-TRUE
    conjunction (banded-oracle / GX-gate pattern — this is the
    'index freshness expectation' the reference's quality gate
    applies to tables, airflow-setup.py:457)."""
    from ..operators import linalg
    from ..streaming import jobs

    base = tempfile.mkdtemp(prefix="sg_moments_")
    e = _t(spark, sf_dir, "embeddings")
    sink = jobs.moment_stats_sink(base)
    for b in range(3):
        sink(e.filter(F.col("vec_id") % 3 == b), b)

    inc = spark.read.parquet(os.path.join(base, "v2")).select(
        "i", "j", F.col("s").alias("s_inc")
    )
    one = linalg.moment_partials(e).select("i", "j", F.col("s").alias("s_one"))
    cells = one.join(inc, ["i", "j"], "full_outer").select(
        (
            F.col("s_inc").isNotNull()
            & F.col("s_one").isNotNull()
            & (
                F.abs(F.col("s_inc") - F.col("s_one"))
                <= 1e-6 * (F.abs(F.col("s_one")) + 1.0)
            )
        ).alias("cell_ok")
    )
    return cells.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.bool_and("cell_ok").alias("ok"),
    )


@query("emb_pca_apply_artifact", oracle=ORACLES["emb_pca_project"])
def emb_pca_apply_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of PCA apply (VERDICT r05 item 7):
    emb_pca_project re-derives the fit in-plan on every run; at 100 TB
    the fit is computed once, persisted as a model ARTIFACT, and every
    later projection pass is fit-free — load the 1-row
    (component, means) table from parquet and run a zero-shuffle
    map-only scan (ivf_index_search's fit-free discipline applied to
    linear models). This query does exactly that: fit → write the
    bounded 1-row artifact → lazy projection that broadcasts the
    artifact read. Output is REQUIRED to equal emb_pca_project exactly
    (same oracle SQL, same 1e-4 banding), pinning that artifact
    round-tripping loses nothing."""
    from ..operators import linalg
    from .staged_r06 import _PCA_GRID, _PCA_ROUNDS

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    moments = linalg.moment_partials(e)
    G = linalg.centered_gram(moments)
    v = linalg.power_iteration(G, _PCA_ROUNDS)
    v_arr = v.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "vj"))), lambda p: p["vj"]
        ).alias("varr")
    )
    n = moments.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n")
    )
    m_arr = (
        moments.filter((F.col("j") == -1) & (F.col("i") >= 0))
        .crossJoin(F.broadcast(n))
        .select("i", (F.col("s") / F.col("n")).alias("m"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))), lambda p: p["m"]
            ).alias("marr")
        )
    )
    artifact_dir = os.path.join(tempfile.mkdtemp(prefix="sg_pca_"), "components")
    # the ARTIFACT write: a bounded 1-row table (component + means) —
    # the only eager step; everything corpus-sized below stays lazy
    v_arr.crossJoin(m_arr).coalesce(1).write.mode("overwrite").parquet(
        artifact_dir
    )

    comps = spark.read.parquet(artifact_dir)
    return e.crossJoin(F.broadcast(comps)).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.floor(
            F.aggregate(
                F.zip_with(
                    F.zip_with(
                        F.col("embedding"),
                        F.col("marr"),
                        lambda a, b: a.cast("double") - b,
                    ),
                    F.col("varr"),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * _PCA_GRID
        )
        .cast("long")
        .alias("coord_band"),
    )
