"""Salted aggregation/join equivalence on a deliberately skewed key
(90% of rows share one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    skew,
)


def _skewed(spark, n=20000):
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
        F.col("id"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("v").alias("c"), F.max("v").alias("m")
    )
    salted = skew.salted_agg(
        df,
        ["k"],
        F.col("id"),
        {"s": ("v", "sum"), "c": ("v", "count"), "m": ("v", "max")},
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_matches_plain(spark):
    left = _skewed(spark, 5000)
    right = spark.range(100).select(
        F.col("id").alias("rk"), (F.col("id") * 2.0).alias("w")
    )
    plain = left.join(right, left.k == right.rk).select("id", "w")
    salted = skew.salted_join(
        left, right, "k", "rk", F.col("id"), n_salts=8
    ).select("id", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
