"""Grouped normalization (SURVEY.md A8): per-group standardization of
a measure column — the grouped-map pattern from the public Spark docs
(pattern ref /root/repo/SNIPPETS.md grouped-map pandas_udf normalize).

Two implementations with identical semantics:

- ``zscore_window``: window aggregates (avg/stddev over the group) —
  pure JVM, no Python, one shuffle; preferred at scale and
  SQL-oracle-able.
- ``zscore_pandas``: grouped-map ``applyInPandas`` — the Arrow
  crossing; exists as the template for per-group logic that
  genuinely needs pandas (fit a scaler, interpolate, etc.).

tests assert the two agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import zscore


def zscore_window(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score via window aggregates (sample stddev; NULL
    when the group has zero variance)."""
    w = Window.partitionBy(group_col)
    return df.withColumn(
        out_col,
        F.round(
            zscore(
                F.col(value_col),
                F.avg(value_col).over(w),
                F.stddev_samp(value_col).over(w),
            ),
            4,
        ),
    )


def zscore_pandas(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score via grouped-map applyInPandas (Arrow-batched).

    Same semantics as ``zscore_window`` (pandas ``std`` is the sample
    stddev; zero-variance groups yield NULL via inf→NA handling)."""
    from pyspark.sql import types as T

    # fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema object, giving df.columns a phantom output column
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std()
        if std and std > 0:
            z = ((pdf[value_col] - pdf[value_col].mean()) / std).round(4)
        else:
            z = pd.Series([None] * len(pdf), dtype="float64")
        return pdf.assign(**{out_col: z})

    return df.groupBy(group_col).applyInPandas(norm, schema)
