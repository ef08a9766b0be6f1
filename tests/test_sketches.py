"""Accuracy/mergeability bounds for the DataSketches operators
(operators/sketches.py). These pin the properties the rows-only driver
check can't see: estimate error vs exact, and union-of-parts ==
sketch-of-whole."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import catalog
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    sketches,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return catalog.load(spark, SF_DIR, "events")


def test_hll_theta_exact_in_sparse_regime(spark, events):
    """At cardinality ≪ 2^lgK both HLL and Theta are exact — the
    rollup's estimates must equal the true distinct count per group
    AND on the union row."""
    out = {
        r["event_type"]: r
        for r in sketches.sketch_rollup(
            events, "event_type", "user_id", "value"
        ).collect()
    }
    exact_total = events.select("user_id").distinct().count()
    exact_per = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact_per.items():
        assert out[et]["distinct_ids_hll"] == n
        assert out[et]["distinct_ids_theta"] == n
    assert out["__all__"]["distinct_ids_hll"] == exact_total
    assert out["__all__"]["distinct_ids_theta"] == exact_total


def test_kll_median_within_rank_error(spark, events):
    """KLL(k=200) rank error is ~1.65%; assert the reported median
    lies between the exact 45th and 55th percentile values (a 3×
    safety margin)."""
    out = sketches.sketch_rollup(events, "event_type", "user_id", "value")
    med = {r["event_type"]: r["median_kll"] for r in out.collect()}
    bounds = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.45)").alias("lo"),
        F.expr("percentile(value, 0.55)").alias("hi"),
    )
    for r in bounds.collect():
        assert r["lo"] <= med[r["event_type"]] <= r["hi"], r["event_type"]


def test_union_of_parts_equals_sketch_of_whole(spark, events):
    """Merging per-group HLL sketches must estimate the same as one
    sketch over the whole column — the mergeability contract that
    makes partition-level rollups valid."""
    whole = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).collect()[0]["n"]
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("n"))
        .collect()[0]["n"]
    )
    assert whole == merged


def test_theta_setops_planted_overlap(spark):
    """Planted audiences: A = ids 0..999, B = ids 500..1499 ⇒
    |A|=|B|=1000, |A∩B|=500, |A\\B|=500. Theta estimates must land
    within 5%."""
    df = spark.range(0, 1500).select(
        F.col("id").alias("uid"),
        (F.col("id") < 1000).alias("in_a"),
        (F.col("id") >= 500).alias("in_b"),
    )
    row = sketches.theta_audience_overlap(
        df, "uid", F.col("in_a"), F.col("in_b")
    ).collect()[0]
    for got, want in [
        (row["n_a"], 1000),
        (row["n_b"], 1000),
        (row["n_both"], 500),
        (row["n_a_only"], 500),
    ]:
        assert abs(got - want) <= 0.05 * want, (got, want)


def test_rolling_active_users_exact_in_sparse_regime(spark, events):
    """The sketch-window rolling distinct must equal the exact
    grid-join computation at sparse cardinality (independent of the
    in-query exact side, which uses a collect_set merge)."""
    from pyspark.sql import Window as W
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )

    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("s")
    )
    daily = daily.withColumn(
        "d", F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long")
    )
    w = W.orderBy("d").rangeBetween(-6, 0)
    got = {
        int(r["day"].timestamp()): r["n"]
        for r in daily.select(
            "day",
            F.hll_sketch_estimate(F.hll_union_agg("s").over(w))
            .cast("long")
            .alias("n"),
        ).collect()
    }
    days = events.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    a, b = days.alias("a"), days.alias("b")
    exact = (
        a.join(
            b,
            (F.col("b.day") >= F.date_sub(F.col("a.day"), 6))
            & (F.col("b.day") <= F.col("a.day")),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(F.countDistinct(F.col("b.user_id")).alias("n"))
    )
    want = {
        int(r["day"].timestamp()): r["n"] for r in exact.collect()
    }
    assert got == want
    # the registered banded projection must agree: every day TRUE
    banded = QUERIES["a_rolling_active_users"](spark, SF_DIR).collect()
    assert {r["day_epoch"] for r in banded} == set(want)
    assert all(r["ok"] for r in banded)


def test_scale_gate_parses_sf_dirs():
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.relational import (
        _oracle_scale,
    )

    assert _oracle_scale("/root/testdata/sf0.001")
    assert _oracle_scale("/root/testdata/sf0.01/")
    assert not _oracle_scale("/root/testdata/sf0.1")
    assert not _oracle_scale("/root/testdata/sf10")
    assert _oracle_scale("/some/unlabeled/dir")  # safe default: exact


def test_banded_queries_drop_exact_twin_at_bench_scale(spark, monkeypatch):
    """At non-oracle scale the registered a_sketch_rollup /
    a_rolling_active_users plans must be the pure sketch path — one
    fact scan, no exact countDistinct pass (VERDICT r03 item 8,
    ADVICE r03 item 3) — while the banded booleans (now same-scan
    self-consistency checks) still come out all-TRUE."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )
    from tests.test_plans import explain  # reuse plan helpers

    monkeypatch.setenv("SPARK_GRAFT_SKETCH_EXACT", "0")
    df = QUERIES["a_sketch_rollup"](spark, SF_DIR)
    plan = explain.physical_plan(df)
    assert "distinct" not in plan.lower().replace("distinct_ids", ""), plan
    assert "Join" not in plan, plan
    rows = df.collect()
    assert rows and all(
        v for r in rows for k, v in r.asDict().items() if isinstance(v, bool)
    )

    df = QUERIES["a_rolling_active_users"](spark, SF_DIR)
    plan = explain.physical_plan(df)
    assert "collect_set" not in plan and "collect_list" not in plan, plan
    assert "Join" not in plan, plan
    rows = df.collect()
    assert rows and all(r["ok"] for r in rows)


def test_rolling_exact_side_is_bounded_state(spark, monkeypatch):
    """At oracle scale the exact rolling-distinct side must be the
    explode+countDistinct plan — no collect_set / flatten carrying a
    week of user_ids per row (ADVICE r03 item 3)."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )
    from tests.test_plans import explain

    monkeypatch.setenv("SPARK_GRAFT_SKETCH_EXACT", "1")
    df = QUERIES["a_rolling_active_users"](spark, SF_DIR)
    plan = explain.physical_plan(df)
    assert "collect_set" not in plan and "collect_list" not in plan, plan
