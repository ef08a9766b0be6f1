"""Categorical encoding + deterministic splits (SURVEY.md A4/A7).

The reference's signature transformation is pandas ``get_dummies``:
/root/reference/source_data/train.parquet carries 717 one-hot uint8
columns (vendor 3, weekday 7, quarter 2, pickup-zone 384, dropoff-zone
324; verified row-sum ∈ {0,1}). Two Spark-first re-expressions:

- ``one_hot``: per-row indicator columns from an explicit vocabulary —
  pure ``when`` expressions, no shuffle, whole-stage codegen'd.
- ``pivot_agg``: the aggregating pivot (one row per group key).

Both take an explicit, sorted vocabulary: computing it from data (what
get_dummies does) makes the output *schema* a function of the data —
the reference's train/test drift bug (SURVEY.md §1.3: 7 train rows with
all-zero pickup one-hots) is this failure surfacing. ``vocabulary``
computes it once, sorted, as an explicit artifact.

At 100 TB the wide one-hot form is an anti-pattern (700-column plans
stress the analyzer; most entries are zero). Keep the long/normalized
form hot and derive the wide form only at ML-export boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vocabulary(df: DataFrame, col: str, max_size: int = 100_000) -> list[str]:
    """Distinct values of ``col``, sorted — the deterministic vocab
    artifact (persist alongside the model; do NOT recompute on test).

    ``max_size`` guards the one driver-side collect in this module: a
    one-hot vocabulary is only meaningful at bounded cardinality, and
    an accidental call on a high-cardinality column (ids, free text)
    would otherwise flood the driver. The check is a LIMIT-probe, not
    a full count — it reads at most max_size+1 distinct values before
    deciding, so the guard itself is cheap even on a 100 TB column."""
    d = df.select(col).distinct()
    if d.limit(max_size + 1).count() > max_size:
        raise ValueError(
            f"vocabulary({col!r}): more than {max_size} distinct values — "
            "not a categorical column; raise max_size explicitly if the "
            "cardinality is intentional (feature-hash or target-encode "
            "high-cardinality columns instead of one-hot)"
        )
    return sorted(
        r[0] for r in d.collect() if r[0] is not None
    )


def save_vocab(vocab: dict[str, list[str]], path: str) -> None:
    """Persist vocabularies as a JSON artifact (SURVEY.md §4.3: the
    'schema is a function of data' problem — the reference recomputed
    its one-hot column set from data, which is why its train/test
    files drift; the fix is computing the vocab ONCE and shipping it
    with the pipeline like a model artifact)."""
    import json

    with open(path, "w") as f:
        json.dump(vocab, f, indent=2, sort_keys=True)


def load_vocab(path: str) -> dict[str, list[str]]:
    import json

    with open(path) as f:
        return json.load(f)


def unpivot_onehot(
    df: DataFrame, id_cols: list[str], value_cols: list[str],
    var_name: str = "category", value_name: str = "flag",
) -> DataFrame:
    """Inverse of the wide one-hot form: wide indicator columns → long
    (id, category, flag) rows via native ``unpivot`` (single Expand
    node, no shuffle). The 100 TB recommendation is to keep THIS form
    hot and derive wide only at export boundaries."""
    return df.unpivot(id_cols, value_cols, var_name, value_name)


def one_hot(
    df: DataFrame,
    col: str,
    vocab: list[str],
    prefix: str | None = None,
    drop_input: bool = False,
) -> DataFrame:
    """Per-row indicator columns (pandas ``get_dummies`` semantics).

    NULL input ⇒ all-zero group — exactly how the reference encodes
    missing zones (verified: 7/1046 train rows all-zero pickup).
    """
    prefix = col if prefix is None else prefix
    prefix = f"{prefix}_" if prefix else ""
    cols = [
        F.when(F.col(col) == v, F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias(f"{prefix}{v}")
        for v in vocab
    ]
    out = df.select("*", *cols)
    return out.drop(col) if drop_input else out


def pivot_agg(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    vocab: list[str],
    agg: Column,
    fill: float | int = 0,
) -> DataFrame:
    """Aggregating pivot with an explicit vocabulary.

    Passing ``values=vocab`` skips the extra distinct job Spark runs
    for vocab discovery and fixes the output column order.
    """
    return (
        df.groupBy(*group_cols).pivot(pivot_col, vocab).agg(agg).na.fill(fill)
    )


def hash_split_col(key: Column, train_pct: int = 80) -> Column:
    """Deterministic, engine-portable train/test assignment (A7).

    The reference split 1046:262 ≈ 80:20 once on the full table
    (verified: per-vendor ratios vary ⇒ split before partitioning).
    ``randomSplit`` is partition-order-dependent; a multiplicative hash
    on a stable key is reproducible in any engine (same arithmetic in
    Spark and DuckDB — no engine-specific hash function):

        bucket = (key * 2654435761) mod 2^32 mod 100

    2654435761 is Knuth's multiplicative-hash constant (2^32/phi).
    Uses the overflow-safe ``portable_bucket`` (identical values;
    the naive product overflows ANSI longs for keys ≥ ~3.5e9).
    """
    from ..functions.columns import portable_bucket

    return F.when(
        portable_bucket(key, 100) < train_pct, F.lit("train")
    ).otherwise(F.lit("test"))


def train_test_split(
    df: DataFrame, key: str, train_pct: int = 80
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, reproducible split pair keyed on a stable id column."""
    tagged = df.withColumn("__split", hash_split_col(F.col(key), train_pct))
    train = tagged.filter(F.col("__split") == "train").drop("__split")
    test = tagged.filter(F.col("__split") == "test").drop("__split")
    return train, test
