"""Reference-fidelity tests (SURVEY.md §5.2-4): re-run the
reconstructed trips pipeline (§3.3) on synthetic trips_raw and assert
the structural invariants verified against
/root/reference/source_data/*.parquet during the survey:

- one-hot row-sums ∈ {0,1}; quarter/weekday/vendor groups sum to 1
- per-vendor partitions reunion exactly to the full table
- vendor_* columns absent from per-vendor outputs
- split disjoint and ≈80/20
- row provenance carried through the fan-out
"""

from __future__ import annotations

import datetime as dt
import random
from functools import reduce
from operator import add

from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    encode,
    geo,
)

VENDORS = ["alitran", "easy_destiny", "to_my_place_ai"]
ZONES = [f"zone_{i:03d}" for i in range(40)]


def make_trips(spark, n=1308, seed=42):
    rng = random.Random(seed)
    base = dt.datetime(2016, 1, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.choices(VENDORS, weights=[0.33, 0.41, 0.26])[0],
                base + dt.timedelta(seconds=rng.randrange(180 * 24 * 3600)),
                rng.choice(ZONES) if rng.random() > 0.01 else None,
                rng.choice(ZONES) if rng.random() > 0.01 else None,
                rng.uniform(48.0, 52.0),
                rng.uniform(2.0, 8.0),
                rng.uniform(48.0, 52.0),
                rng.uniform(2.0, 8.0),
                rng.randint(1, 7),
                rng.uniform(30.0, 25000.0),
            )
        )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.schemas import (
        TRIPS_RAW,
    )

    return spark.createDataFrame(rows, TRIPS_RAW)


def featurize(trips):
    """The reconstructed reference pipeline (SURVEY.md §3.3): datetime
    features + haversine + one-hot over explicit vocabularies."""
    f = trips.select(
        "trip_id",
        "trip_duration",
        "passenger_count",
        "vendor",
        (
            F.hour("pickup_ts")
            + F.minute("pickup_ts") / 60.0
            + F.second("pickup_ts") / 3600.0
        ).alias("hour"),
        F.date_format("pickup_ts", "EEEE").alias("weekday"),
        F.concat(F.lit("Q_"), F.quarter("pickup_ts")).alias("quarter"),
        geo.haversine_km(
            F.col("pickup_lat"),
            F.col("pickup_lon"),
            F.col("dropoff_lat"),
            F.col("dropoff_lon"),
        ).alias("distance"),
        "pickup_zone",
        "dropoff_zone",
    )
    f = encode.one_hot(f, "quarter", ["Q_1", "Q_2", "Q_3", "Q_4"], prefix="")
    f = encode.one_hot(
        f,
        "weekday",
        ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"],
        prefix="weekday",
    )
    f = encode.one_hot(f, "vendor", VENDORS, prefix="vendor")
    f = encode.one_hot(f, "pickup_zone", ZONES, prefix="pickup")
    f = encode.one_hot(f, "dropoff_zone", ZONES, prefix="dropoff")
    return f.drop("quarter", "weekday", "pickup_zone", "dropoff_zone")


def test_onehot_row_sums(spark):
    feats = featurize(make_trips(spark)).cache()
    try:
        q_cols = [c for c in feats.columns if c.startswith("Q_")]
        wd_cols = [c for c in feats.columns if c.startswith("weekday_")]
        v_cols = [c for c in feats.columns if c.startswith("vendor_")]
        pz_cols = [c for c in feats.columns if c.startswith("pickup_zone")]

        def rowsum(cols):
            return reduce(add, [F.col(c) for c in cols])

        sums = feats.select(
            rowsum(q_cols).alias("q_sum"),
            rowsum(wd_cols).alias("wd_sum"),
            rowsum(v_cols).alias("v_sum"),
            rowsum(pz_cols).alias("pz_sum"),
        )
        bad = sums.filter(
            (F.col("q_sum") != 1)
            | (F.col("wd_sum") != 1)
            | (F.col("v_sum") != 1)
            | ~F.col("pz_sum").isin(0, 1)
        ).count()
        assert bad == 0
        # NULL zones ⇒ all-zero groups exist (the reference's 7/1046 rows)
        assert sums.filter(F.col("pz_sum") == 0).count() > 0
    finally:
        feats.unpersist()


def test_split_and_vendor_fanout(spark, tmp_path):
    trips = make_trips(spark)
    train, test = encode.train_test_split(trips, "trip_id")
    n_train, n_test, n_all = train.count(), test.count(), trips.count()
    assert n_train + n_test == n_all
    assert 0.75 < n_train / n_all < 0.85
    # disjoint on the key
    assert train.join(test, "trip_id", "inner").count() == 0

    # vendor fan-out as a partitioned write — one job, directory per key
    # (the reference wrote datasets/<vendor>/ with a serial pandas loop)
    out = str(tmp_path / "fanout")
    train.write.mode("overwrite").partitionBy("vendor").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == n_train
    # partition column round-trips; reunion equals the original
    assert sorted(r[0] for r in back.select("vendor").distinct().collect()) == sorted(
        r[0] for r in train.select("vendor").distinct().collect()
    )
    assert (
        back.select("trip_id").exceptAll(train.select("trip_id")).count() == 0
    )


def test_wide_onehot_analyzer_stress(spark, tmp_path):
    """SURVEY.md §7 hard-point #1: the reference's real width (384
    pickup + 324 dropoff zones → 724 columns) must survive the
    analyzer, a parquet round-trip, and keep the row-sum invariants.
    Also exercises the vocab-artifact path: vocab computed once,
    persisted as JSON, reloaded, applied."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        encode as enc,
    )

    wide_zones = [f"wz_{i:03d}" for i in range(384)]
    trips = make_trips(spark, n=600)
    # remap zones onto the wide vocabulary deterministically
    t = trips.withColumn(
        "pickup_zone",
        F.when(
            F.col("pickup_zone").isNotNull(),
            F.concat(F.lit("wz_"), F.lpad((F.col("trip_id") % 384).cast("string"), 3, "0")),
        ),
    )
    vocab_path = str(tmp_path / "vocab.json")
    enc.save_vocab({"pickup_zone": wide_zones}, vocab_path)
    vocab = enc.load_vocab(vocab_path)["pickup_zone"]
    assert vocab == wide_zones

    wide = enc.one_hot(
        t.select("trip_id", "pickup_zone"), "pickup_zone", vocab, prefix="pickup"
    ).drop("pickup_zone")
    assert len(wide.columns) == 1 + 384

    out = str(tmp_path / "wide")
    wide.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert len(back.columns) == 385

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.functions.columns import (
        tree_sum,
    )

    # NB: reduce(add, 384 cols) left-nests 384 deep and throws
    # StackOverflowError in Catalyst — tree_sum balances to depth 9
    oh_cols = [c for c in back.columns if c != "trip_id"]
    sums = back.select(tree_sum([F.col(c) for c in oh_cols]).alias("s"))
    bad = sums.filter(~F.col("s").isin(0, 1)).count()
    assert bad == 0
    # long-form roundtrip over the full width: unpivot keeps only set flags
    long = enc.unpivot_onehot(back, ["trip_id"], oh_cols).filter("flag = 1")
    assert long.count() == back.select(
        tree_sum([F.col(c) for c in oh_cols]).alias("s")
    ).agg(F.sum("s")).collect()[0][0]


def test_partition_pruning_plan(spark, tmp_path):
    """Reading one vendor from the partitioned layout must prune
    partitions (the scan's plan mentions only the selected vendor)."""
    trips = make_trips(spark, n=300)
    out = str(tmp_path / "pruned")
    trips.write.mode("overwrite").partitionBy("vendor").parquet(out)
    one = spark.read.parquet(out).filter(F.col("vendor") == "alitran")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "alitran" in plan
    got = one.count()
    want = trips.filter(F.col("vendor") == "alitran").count()
    assert got == want


def test_vocabulary_cardinality_guard(spark):
    """encode.vocabulary is the one unbounded driver collect in the
    repo (VERDICT r04 nit): above max_size distinct values it must
    raise instead of flooding the driver, and the probe itself must
    not scan past max_size+1 distinct values."""
    import pytest

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        encode as enc,
    )

    ids = spark.range(0, 500).select(
        F.concat(F.lit("v_"), F.col("id")).alias("cat")
    )
    with pytest.raises(ValueError, match="more than 100 distinct"):
        enc.vocabulary(ids, "cat", max_size=100)
    # bounded cardinality still returns the sorted artifact
    small = spark.range(0, 500).select(
        F.concat(F.lit("v_"), (F.col("id") % 7)).alias("cat")
    )
    assert enc.vocabulary(small, "cat", max_size=100) == sorted(
        f"v_{i}" for i in range(7)
    )


def test_k_anonymity_report_exact_counts(spark):
    """k_anonymity_report on a frame with known group sizes: groups
    (a,1)x3, (a,2)x1, (b,1)x5 at k=3 -> one group of 1 below k."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.expectations import (
        k_anonymity_report,
    )

    rows = [("a", 1)] * 3 + [("a", 2)] * 1 + [("b", 1)] * 5
    df = spark.createDataFrame(rows, "q1 string, q2 int")
    rep = k_anonymity_report(df, ["q1", "q2"], k=3).collect()[0].asDict()
    assert rep == {
        "k": 3,
        "n_groups": 3,
        "groups_below_k": 1,
        "rows_at_risk": 1,
        "min_group_size": 1,
    }
    # a fully k-anonymous frame reports zero risk
    ok = k_anonymity_report(
        spark.createDataFrame([("a", 1)] * 4, "q1 string, q2 int"),
        ["q1", "q2"],
        k=3,
    ).collect()[0]
    assert ok.groups_below_k == 0 and ok.rows_at_risk == 0
