"""ML stage tests: the reference's regression path, Spark-native."""

from __future__ import annotations

import math

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.ml import (
    regression,
)
from tests.test_reference_fidelity import make_trips


def test_train_and_evaluate(spark):
    trips = make_trips(spark, n=1308)
    model, metrics = regression.train_and_evaluate(trips)
    # split matches the reference's ~80/20 discipline
    total = metrics["n_train"] + metrics["n_test"]
    assert total == 1308
    assert 0.75 < metrics["n_train"] / total < 0.85
    # model produced finite held-out metrics (targets are random in the
    # fixture, so only sanity is asserted, not accuracy)
    assert math.isfinite(metrics["rmse"]) and metrics["rmse"] > 0
    assert math.isfinite(metrics["mae"])
    # sparse one-hot (dropLast): numeric 3 + vendor (3+keep-invalid-1)
    # + weekday (7+keep-invalid-1)
    pred = model.transform(regression.featurize(trips)).first()
    assert pred["features"].size == 3 + 3 + 7


def test_predictions_are_deterministic(spark):
    trips = make_trips(spark, n=400)
    _, m1 = regression.train_and_evaluate(trips)
    _, m2 = regression.train_and_evaluate(trips)
    assert abs(m1["rmse"] - m2["rmse"]) < 1e-6
