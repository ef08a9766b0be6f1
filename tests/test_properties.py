"""Property-based tests (hypothesis) for the pure column-expression
operators — driven through Spark on generated inputs."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.functions.columns import (
    KNUTH,
    M32,
    portable_bucket,
    tree_sum,
)
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.geo import (
    haversine_km,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_portable_bucket_matches_python(keys):
    """The Spark expression and plain-Python arithmetic agree exactly
    (the property the DuckDB oracles rely on)."""
    spark = _spark()
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", portable_bucket(F.col("k"), 100).alias("b")).collect()
    }
    for k in keys:
        assert got[k] == (k * KNUTH) % M32 % 100


@given(
    st.floats(min_value=-89, max_value=89),
    st.floats(min_value=-179, max_value=179),
    st.floats(min_value=-89, max_value=89),
    st.floats(min_value=-179, max_value=179),
)
@settings(max_examples=15, deadline=None)
def test_haversine_properties(lat1, lon1, lat2, lon2):
    """Symmetry, non-negativity, identity, and the half-circumference
    upper bound."""
    spark = _spark()
    df = spark.createDataFrame(
        [(lat1, lon1, lat2, lon2)], "a double, b double, c double, d double"
    )
    row = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("ab"),
        haversine_km(F.col("c"), F.col("d"), F.col("a"), F.col("b")).alias("ba"),
        haversine_km(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("self"),
    ).collect()[0]
    assert row["self"] < 1e-6
    assert row["ab"] >= 0 and abs(row["ab"] - row["ba"]) < 1e-9
    assert row["ab"] <= math.pi * 6371.0 + 1e-6


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200))
@settings(max_examples=10, deadline=None)
def test_tree_sum_equals_python_sum(vals):
    spark = _spark()
    df = spark.createDataFrame([tuple(vals)], ", ".join(f"c{i} int" for i in range(len(vals))))
    got = df.select(
        tree_sum([F.col(f"c{i}") for i in range(len(vals))]).alias("s")
    ).collect()[0]["s"]
    assert got == sum(vals)


def _spark():
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (
        get_spark,
    )

    return get_spark("props", master="local[4]")
