"""Trip-duration regression — the ML stage the reference's lab feeds
(north star: "Airflow orchestrating Spark ML jobs"; the reference's
train/test parquet pairs are a regression design matrix with
trip_duration as the target, SURVEY.md §1.2).

The reference exports 724 one-hot columns to pandas-side modeling.
Spark-first, the model trains WHERE THE DATA IS: features assemble
into MLlib vectors (sparse for one-hots — the wide form never
materializes as 700 dense columns), LinearRegression fits
distributed, evaluation is a DataFrame pass. The train/test split is
the engine's reproducible hash split (operators.encode), so the
exact membership is auditable across engines.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import frac_hour
from ..operators.encode import train_test_split
from ..operators.geo import haversine_km

NUMERIC_FEATURES = ["hour", "distance", "passenger_count"]
CATEGORICAL_FEATURES = ["vendor", "weekday"]
LABEL = "trip_duration"


def featurize(trips_raw: DataFrame) -> DataFrame:
    """trips_raw (FIXTURES.md B1) → model input columns (A5/A6
    features + categoricals kept in long form for sparse encoding)."""
    return trips_raw.select(
        "trip_id",
        F.col(LABEL),
        F.round(frac_hour(F.col("pickup_ts")), 6).alias("hour"),
        F.round(
            haversine_km(
                F.col("pickup_lat"),
                F.col("pickup_lon"),
                F.col("dropoff_lat"),
                F.col("dropoff_lon"),
            ),
            4,
        ).alias("distance"),
        F.col("passenger_count").cast("double"),
        "vendor",
        F.date_format("pickup_ts", "EEEE").alias("weekday"),
    )


def build_pipeline() -> Pipeline:
    """Index → sparse one-hot → assemble → linear regression. The
    OneHotEncoder output is SPARSE vectors: the reference's 717 dense
    uint8 columns (the 100 TB anti-pattern, SURVEY.md §1.3) stay
    virtual."""
    stages = []
    ohe_outputs = []
    for c in CATEGORICAL_FEATURES:
        stages.append(
            StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        )
        stages.append(
            OneHotEncoder(inputCols=[f"{c}_idx"], outputCols=[f"{c}_oh"])
        )
        ohe_outputs.append(f"{c}_oh")
    stages.append(
        VectorAssembler(
            inputCols=NUMERIC_FEATURES + ohe_outputs, outputCol="features"
        )
    )
    stages.append(
        LinearRegression(
            featuresCol="features", labelCol=LABEL, regParam=0.1, maxIter=50
        )
    )
    return Pipeline(stages=stages)


def train_and_evaluate(trips_raw: DataFrame) -> tuple[PipelineModel, dict]:
    """The reference's end-to-end ML path: featurize → reproducible
    80/20 split → fit on train → RMSE/R² on held-out test."""
    feats = featurize(trips_raw)
    train, test = train_test_split(feats, "trip_id")
    model = build_pipeline().fit(train)
    pred = model.transform(test)
    metrics = {}
    for metric in ("rmse", "r2", "mae"):
        metrics[metric] = RegressionEvaluator(
            labelCol=LABEL, predictionCol="prediction", metricName=metric
        ).evaluate(pred)
    metrics["n_train"] = train.count()
    metrics["n_test"] = test.count()
    return model, metrics
