"""As-of and point-in-range joins (SURVEY.md J5/J6).

Spark has no native as-of join. Two implementations:

- ``asof_join``: union + window ``last(ignorenulls)`` — one shuffle on
  the partition key, fully JVM-side, scales to arbitrary key
  cardinality (the state per key is one running value, not a buffer).
- ``asof_join_pandas``: per-key ``applyInPandas`` + ``pandas.merge_asof``
  — Arrow-batched; simpler semantics surface (tolerance, nearest) but
  pays the Python crossing. Used when per-key data fits in memory.

The union trick: tag right rows (the "quotes") 0 and left rows (the
"trades") 1, sort by (time, tag) within each key so a right row at the
exact same time sorts first (inclusive match), then carry the latest
right-row payload forward with ``last(..., ignorenulls=True)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row
    within the same ``on`` key: the latest with ``right_time <=
    left_time`` (``direction="backward"``, default) or the earliest
    with ``right_time >= left_time`` (``"forward"``) — the full
    ``pandas.merge_asof`` direction surface, expressed as one shuffle +
    one window, fully JVM-side.

    ``tolerance`` (optional Column, e.g. ``F.expr("INTERVAL 7 DAYS")``
    for timestamps or a numeric literal for numeric time axes) bounds
    the match distance: a carried match farther than tolerance yields
    NULL payload, exactly like merge_asof's tolerance.

    Left columns are preserved; payload columns are added (null when no
    in-direction right row exists).

    The payload (plus the matched right time, needed for the tolerance
    check) rides in ONE nullable struct marker (null ⇔ the row is a
    left row), so ``last/first(ignorenulls=True)`` skips only left
    rows — a right row whose payload VALUES are legitimately NULL is
    still the carried match (carrying columns individually would skip
    it and attach an older non-null value — the r01 ADVICE finding).
    Ties: multiple right rows at the same (key, time) resolve to the
    greatest payload struct for backward / the smallest for forward
    (deterministic); like ``pandas.merge_asof``, prefer deduplicating
    right rows per (key, time) upstream as ``j5_asof_join`` does.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    pk_type = T.StructType(
        [T.StructField("__rt", right.schema[right_time].dataType)]
        + [right.schema[p] for p in payload]
    )
    l = left.select(
        *lcols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(pk_type).alias("__pk"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(p) for p in payload]
        ).alias("__pk"),
    ).select(*lcols, "__t", "__is_left", "__pk")

    unioned = l.unionByName(r)
    # __pk as the final sort key: right rows tied on (__t, __is_left)
    # order by payload struct, so the carry is deterministic (nulls-
    # first default keeps left-row null markers out of the way).
    if direction == "backward":
        # right (0) sorts before left (1) at equal time ⇒ inclusive <=
        w = (
            Window.partitionBy(on)
            .orderBy("__t", "__is_left", "__pk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("__pk", ignorenulls=True).over(w)
    else:
        # left (1) sorts before right (0) at equal time ⇒ inclusive >=
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__t"), F.col("__is_left").desc(), F.col("__pk"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("__pk", ignorenulls=True).over(w)
    carried = unioned.select(
        *lcols, "__t", "__is_left", carry.alias("__pk_c")
    )
    if tolerance is not None:
        dist = (
            F.col("__t") - F.col("__pk_c.__rt")
            if direction == "backward"
            else F.col("__pk_c.__rt") - F.col("__t")
        )
        carried = carried.withColumn(
            "__pk_c", F.when(dist <= tolerance, F.col("__pk_c"))
        )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(*lcols, *[F.col(f"__pk_c.{p}").alias(p) for p in payload])
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """merge_asof variant: cogroup both sides by key, Arrow-transfer to
    pandas, ``pd.merge_asof`` per key group (backward, inclusive)."""
    import pandas as pd

    out_schema = left.schema.fieldNames() + payload
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{p} {right.schema[p].dataType.simpleString()}" for p in payload]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(left_time)
        r_pdf = r_pdf.sort_values(right_time)[[right_time, *payload]]
        merged = pd.merge_asof(
            l_pdf,
            r_pdf,
            left_on=left_time,
            right_on=right_time,
            direction="backward",
        )
        return merged[out_schema]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda l, r: merge(l, r), schema)
    )
