"""Distributed global ranking (operators/ranks.py) vs the one-task
global window it replaces — exact parity, including the cases that
bite: tie groups (rank/dense_rank), non-divisible NTILE buckets, and a
DOWNSTREAM FILTER (which breaks column-pruning-dependent exchange
reuse and exposed the independent-range-sampling bug the
localCheckpoint pin fixes)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import catalog
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    ranks,
)

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return catalog.load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )


def test_rank_dense_ntile_match_global_window(spark):
    """o_orderdate has heavy ties; row count is not divisible by 7."""
    o = _orders(spark)
    got = ranks.attach_global_ranks(
        o,
        sort_cols=[F.asc("o_orderdate"), F.asc("o_orderkey")],
        key_cols=[F.col("o_orderdate"), F.col("o_orderkey")],
        rn_col="rn",
        ntile=7,
        ntile_col="t7",
        num_partitions=8,
    )
    # rank/dense_rank over the DATE alone (real tie groups)
    got2 = ranks.attach_global_ranks(
        o,
        sort_cols=[F.asc("o_orderdate")],
        key_cols=[F.col("o_orderdate")],
        rank_col="rk",
        dense_rank_col="dr",
        num_partitions=8,
    )
    w_unique = Window.orderBy("o_orderdate", "o_orderkey")
    w_ties = Window.orderBy("o_orderdate")
    want = o.select(
        "o_orderkey",
        F.row_number().over(w_unique).cast("long").alias("rn"),
        F.ntile(7).over(w_unique).cast("long").alias("t7"),
        F.rank().over(w_ties).cast("long").alias("rk"),
        F.dense_rank().over(w_ties).cast("long").alias("dr"),
    )
    gj = (
        got.select("o_orderkey", "rn", "t7")
        .join(got2.select("o_orderkey", "rk", "dr"), "o_orderkey")
    )
    diff = gj.join(want, "o_orderkey").filter(
        (gj.rn != want.rn)
        | (gj.t7 != want.t7)
        | (gj.rk != want.rk)
        | (gj.dr != want.dr)
    )
    assert diff.count() == 0


def test_numbering_survives_downstream_filter(spark):
    """The p6 regression: a filter AFTER numbering must not perturb the
    assigned numbers (plan branches must agree on partitioning)."""
    o = _orders(spark)
    rn = ranks.global_row_number(
        o,
        sort_cols=[F.asc("o_orderkey")],
        key_cols=[F.col("o_orderkey")],
        out_col="rid",
        num_partitions=8,
    )
    filtered = rn.filter(F.col("o_orderstatus") == "F")
    bad = filtered.filter(F.col("rid") != F.col("o_orderkey") + 1)
    assert bad.count() == 0


def test_more_partitions_than_rows(spark):
    """Empty range partitions (n_parts >> n_rows) must not perturb the
    numbering — offsets only exist for non-empty partitions."""
    df = spark.createDataFrame(
        [(3,), (1,), (2,), (5,), (4,)], "k long"
    )
    out = ranks.attach_global_ranks(
        df,
        sort_cols=[F.asc("k")],
        key_cols=[F.col("k")],
        rn_col="rn",
        rank_col="rk",
        dense_rank_col="dr",
        num_partitions=16,
    )
    rows = sorted((r["k"], r["rn"], r["rk"], r["dr"]) for r in out.collect())
    assert rows == [(1, 1, 1, 1), (2, 2, 2, 2), (3, 3, 3, 3), (4, 4, 4, 4), (5, 5, 5, 5)]


def test_ntile_small_n(spark):
    """N < k: each row its own tile (ANSI NTILE)."""
    df = spark.range(3).select(F.col("id").alias("k"))
    out = ranks.attach_global_ranks(
        df,
        sort_cols=[F.asc("k")],
        key_cols=[F.col("k")],
        ntile=10,
        ntile_col="t",
        num_partitions=4,
    )
    assert sorted((r["k"], r["t"]) for r in out.collect()) == [
        (0, 1),
        (1, 2),
        (2, 3),
    ]
