"""Bucketed co-located join (SURVEY.md §4 / pyspark guide): writing
both join sides bucketed on the key lets the join plan with ZERO
shuffle exchanges — the 100 TB answer to repeated fact-fact joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import catalog
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.plans import (
    explain,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    li = catalog.load(spark, SF_DIR, "lineitem")
    o = catalog.load(spark, SF_DIR, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    try:
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable("li_bucketed")
        )
        (
            o.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable("o_bucketed")
        )
        lb = spark.table("li_bucketed")
        ob = spark.table("o_bucketed")
        joined = lb.join(
            ob, lb.l_orderkey == ob.o_orderkey
        ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        # both sides pre-bucketed on the join key: the join itself
        # needs no Exchange (only the final agg shuffles)
        n_shuffles = explain.count_shuffles(joined)
        assert n_shuffles <= 1, explain.physical_plan(joined)
        # and results match the plain join
        want = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
