"""UDF/UDAF/UDTF surface demonstrations (SURVEY.md §2.10).

Policy (SURVEY.md §2.10): built-in expressions first; these exist to
cover the *machinery* — grouped-aggregate ``pandas_udf`` (Arrow-batched
UDAF), and Python UDTF (1→N generator) — with semantics simple enough
that a plain-SQL oracle can verify the plumbing end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def geometric_mean_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas_udf (UDAF): geometric mean of
    (1 + x), i.e. exp(mean(log1p(x))) - 1. Deliberately chosen so the
    DuckDB oracle is EXP(AVG(LN(1 + x))) - 1 — verifying the Arrow
    grouped-agg path against closed-form SQL."""
    return float(np.expm1(np.log1p(v.to_numpy(dtype="float64")).mean()))


@F.pandas_udf(T.DoubleType())
def l2_norm_udf(vecs: pd.Series) -> pd.Series:
    """Scalar pandas_udf (Arrow-batched): L2 norm of an array column
    via one numpy matmul-style reduction per batch — the sanctioned
    vectorized-Python pattern (SNIPPETS.md scalar-udf ref). Semantics
    chosen SQL-expressible so the oracle verifies the Arrow scalar
    path itself: sqrt(sum(x^2))."""
    return vecs.map(
        lambda v: float(np.sqrt(np.dot(a := np.asarray(v, dtype="float64"), a)))
    )


class TokenExplode:
    """Python UDTF (Spark ≥3.5): one input row → one row per token.

    The oracle is the same double-unnest SQL as f_posexplode; what's
    under test is the lateral-join UDTF machinery, not tokenization.
    """

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        pos = 0
        for tok in text.lower().split():
            if tok:
                yield doc_id, pos, tok
                pos += 1


token_explode_udtf = F.udtf(
    TokenExplode,
    returnType="doc_id bigint, pos int, tok string",
    # Arrow-optimized UDTF (Spark 4): batches cross the Python boundary
    # as Arrow record batches (ArrowEvalPythonUDTF) instead of pickled
    # rows (BatchEvalPythonUDTF) — the generator body is unchanged.
    useArrow=True,
)


def grouped_ewma(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.1,
):
    """Grouped-map ``applyInPandas``: exponentially-weighted moving
    average per key — a sequential recurrence
    (ewma_t = α·x_t + (1-α)·ewma_{t-1}, seeded with x_0, i.e. pandas
    ``ewm(adjust=False)``) that no window frame can express. Each
    group is one Arrow batch sorted in-process; the shuffle carries
    raw (key, ts, value) rows and the output is one row per key.

    Scale: state per task is one group's rows — fine for per-user
    event streams (bounded by the hottest key, which is the same
    bound any sessionization carries); the DuckDB oracle re-folds the
    identical recurrence via list_reduce, so the Arrow grouped-map
    path is verified end to end, not rows-only."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col])
        ewma = pdf[value_col].ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "ewma": [float(ewma)],
            }
        )

    # Explicit keyed repartition at a CPU-appropriate width: the
    # grouped-map work is per-group Python cost, and AQE's byte-based
    # coalescing squeezed ~30k groups onto 6 tasks (measured r12,
    # 4.5 s). The groupBy reuses this exchange (§2.4); width is
    # stats-derived so it grows with the data (catalog.est_width).
    from .. import catalog as _catalog

    return (
        df.repartition(_catalog.est_width(df), key_col)
        .groupBy(key_col)
        .applyInPandas(fold, f"{key_col} long, n_events long, ewma double")
    )


def grouped_ewma_chunked(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.1,
):
    """Skew-guarded EWMA (VERDICT r02 item 8): same recurrence as
    :func:`grouped_ewma`, but safe against a single pathological key
    owning one task's memory at 100× scale.

    The trick: an EWMA segment is an AFFINE map of the incoming state
    — folding values x_1..x_n over state s yields
    ``(1-α)^n · s + Σ α(1-α)^(n-i) x_i`` — and affine maps compose
    associatively. So stage 1 reduces each (key, day) chunk to its
    (mult, add) coefficients with per-task state bounded by ONE DAY of
    one key's events, and stage 2 composes the per-chunk summaries in
    chunk order (a few rows per key, trivially small). A hot key costs
    many small tasks instead of one unbounded task.

    Matches :func:`grouped_ewma` to float tolerance (the algebra is
    exact; only FP association order differs) — parity-tested in
    tests/test_operators.py. The sequential variant stays the
    registered oracle-checked query (bit-identical to DuckDB's
    sequential list_reduce); this is the documented 100× escape hatch.
    """
    import numpy as np

    chunked = df.withColumn("__chunk", F.date_trunc("day", F.col(ts_col)))

    def seg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col])
        x = pdf[value_col].to_numpy(dtype="float64")
        n = len(x)
        beta = 1.0 - alpha
        # full map: fold the whole chunk over an incoming state
        add_full = float(np.sum(alpha * beta ** np.arange(n - 1, -1, -1) * x))
        # tail map: fold x[1:] over a seed (used for the FIRST chunk,
        # whose first observation seeds the recurrence)
        add_tail = (
            float(np.sum(alpha * beta ** np.arange(n - 2, -1, -1) * x[1:]))
            if n > 1
            else 0.0
        )
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "chunk": [pdf["__chunk"].iloc[0]],
                "n": [n],
                "x_first": [float(x[0])],
                "mult_full": [float(beta**n)],
                "add_full": [add_full],
                "mult_tail": [float(beta ** (n - 1))],
                "add_tail": [add_tail],
            }
        )

    summaries = chunked.groupBy(key_col, "__chunk").applyInPandas(
        seg,
        f"{key_col} long, chunk timestamp, n long, x_first double, "
        "mult_full double, add_full double, mult_tail double, "
        "add_tail double",
    )

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk")
        state = (
            pdf["x_first"].iloc[0] * pdf["mult_tail"].iloc[0]
            + pdf["add_tail"].iloc[0]
        )
        for m, a in zip(
            pdf["mult_full"].iloc[1:], pdf["add_full"].iloc[1:]
        ):
            state = m * state + a
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [int(pdf["n"].sum())],
                "ewma": [float(state)],
            }
        )

    return summaries.groupBy(key_col).applyInPandas(
        combine, f"{key_col} long, n_events long, ewma double"
    )


def segmented_ewma(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.1,
):
    """Throughput-oriented EWMA — MANY keys per Arrow batch.

    ``grouped_ewma`` (grouped-map applyInPandas) ships ONE Arrow batch
    per key: perfect for thousands of keys, but at a billion small
    keys the per-group Arrow/pandas overhead (batch construction, one
    Python call per group) dominates the actual fold. This variant is
    the billion-key shape: ``repartition(key)`` +
    ``sortWithinPartitions(key, ts, tiebreak)`` + ``mapInPandas``, so
    each Arrow batch carries THOUSANDS of complete key runs and the
    fold is one vectorized pass per batch — per-key Python cost is
    zero.

    Per segment the sequential fold (seeded with x_0) is evaluated in
    closed form: ewma = β^(n-1)·x_0 + Σ_{i≥1} α·β^(n-1-i)·x_i, with
    β = 1-α — the same affine-map algebra as ``grouped_ewma_chunked``,
    so results match the sequential fold to FP association order
    (parity-tested). Keys SPAN batch boundaries within a partition:
    the closed form folds the carried state s as β^n·s + Σ α·β^(n-1-i)
    ·x_i, and a key's row is emitted only once its run ends (next key
    seen, or partition exhausted) — state is one (key, state, count)
    triple per open run, O(1) per task.
    """
    part = df.select(key_col, ts_col, tiebreak_col, value_col).repartition(
        F.col(key_col)
    ).sortWithinPartitions(key_col, ts_col, tiebreak_col)
    beta = 1.0 - alpha

    def run(it):
        open_key = None
        open_state = 0.0
        open_n = 0
        chunks: list = []  # (keys, ns, ewmas) array triples to emit

        for pdf in it:
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype="float64")
            m = len(x)
            starts = np.concatenate(
                ([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1)
            )
            counts = np.diff(np.concatenate((starts, [m])))
            # Σ α·β^(n-1-i)·x_i per segment, one vectorized pass
            pos = np.arange(m) - np.repeat(starts, counts)
            seg_n = np.repeat(counts, counts)
            w = alpha * beta ** (seg_n - 1 - pos)
            sums = np.add.reduceat(w * x, starts)
            first_x = x[starts]
            seg_keys = keys[starts]
            # fresh-run fold: x_0 seeds, so its α-weight becomes full
            seg_ewma = sums + (1.0 - alpha) * beta ** (counts - 1) * first_x
            seg_ns = counts.astype("int64")

            lo = 0
            if open_key is not None and seg_keys[0] == open_key:
                # first segment continues the carried run
                open_state = beta ** counts[0] * open_state + float(sums[0])
                open_n += int(counts[0])
                if len(seg_keys) == 1:
                    continue  # still open into the next batch
                chunks.append(
                    (
                        np.array([open_key]),
                        np.array([open_n], dtype="int64"),
                        np.array([open_state]),
                    )
                )
                open_key = None
                lo = 1
            elif open_key is not None:
                chunks.append(
                    (
                        np.array([open_key]),
                        np.array([open_n], dtype="int64"),
                        np.array([open_state]),
                    )
                )
                open_key = None
            # all segments except the last are complete (the partition
            # is key-sorted); the last stays open until the next batch
            # proves the key ended
            if lo < len(seg_keys) - 1:
                chunks.append(
                    (
                        seg_keys[lo:-1],
                        seg_ns[lo:-1],
                        seg_ewma[lo:-1],
                    )
                )
            open_key = seg_keys[-1]
            open_state = float(seg_ewma[-1])
            open_n = int(seg_ns[-1])
        if open_key is not None:
            chunks.append(
                (
                    np.array([open_key]),
                    np.array([open_n], dtype="int64"),
                    np.array([open_state]),
                )
            )
        if chunks:
            yield pd.DataFrame(
                {
                    key_col: np.concatenate([c[0] for c in chunks]),
                    "n_events": np.concatenate([c[1] for c in chunks]),
                    "ewma": np.concatenate([c[2] for c in chunks]),
                }
            )

    return part.mapInPandas(run, f"{key_col} long, n_events long, ewma double")


def grouped_ewma_auto(
    df,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.1,
    hot_key_threshold: int = 500_000,
):
    """Skew-adaptive EWMA (VERDICT r03 item 5): per-key routing
    between the sequential fold and the chunked affine-composition
    path, decided BY THE DATA inside one lazy plan — no driver-side
    count, no build-time action.

    A window ``count(*) over (partition by key)`` tags every row with
    its key's event count (the window shuffle hash-partitions by key,
    and Catalyst reuses that exchange for both downstream
    ``groupBy(key)`` branches). Keys at or under the threshold take
    :func:`grouped_ewma` (bit-identical to the sequential oracle);
    keys above it take :func:`grouped_ewma_chunked`, whose per-task
    state is bounded by one key-day instead of the whole key. At 100×
    a pathological hot key costs many small tasks, not one unbounded
    task; results differ from sequential only in FP association order
    (parity-tested).

    The default threshold (500k events ≈ ~12 MB of Arrow per group)
    keeps every realistic key on the bit-exact path; only keys that
    would actually endanger a task's memory switch over.
    """
    from pyspark.sql import Window

    tagged = df.withColumn(
        "__key_n", F.count("*").over(Window.partitionBy(key_col))
    )
    cold = tagged.filter(F.col("__key_n") <= hot_key_threshold).drop("__key_n")
    hot = tagged.filter(F.col("__key_n") > hot_key_threshold).drop("__key_n")
    args = (key_col, ts_col, tiebreak_col, value_col, alpha)
    return grouped_ewma(cold, *args).unionByName(
        grouped_ewma_chunked(hot, *args)
    )


def arrow_sq_norm(df, id_col: str = "vec_id", vec_col: str = "embedding"):
    """``mapInArrow``: the zero-copy Arrow-native batch API (§2.10's
    lowest-overhead Python seam — no pandas conversion at all). Each
    RecordBatch's list column is flattened once and squared-summed per
    row with numpy reduceat over the Arrow offsets — O(batch) with no
    per-row Python. Semantics (Σ x², 4 dp) chosen SQL-expressible so
    the oracle verifies the Arrow path itself."""
    import numpy as np
    import pyarrow as pa

    def batches(it):
        for b in it:
            tbl = pa.table(b)
            ids = tbl.column(id_col)
            lists = tbl.column(vec_col)
            arr = lists.combine_chunks()
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.chunk(0)
            if arr.null_count:
                raise ValueError("arrow_sq_norm: null embedding rows")
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype("float64")
            # .offsets are raw indices into the UNSLICED child array,
            # while .flatten() rebases to the logical slice — rebase
            # the offsets to match (ADVICE r02: a nonzero slice offset
            # would otherwise pair values with the wrong rows)
            raw_off = arr.offsets.to_numpy(zero_copy_only=False)
            offsets = (raw_off - raw_off[0])[:-1]
            sq = np.add.reduceat(flat * flat, offsets) if len(flat) else np.array([])
            yield pa.RecordBatch.from_arrays(
                [
                    ids.combine_chunks(),
                    pa.array(np.round(sq, 4), type=pa.float64()),
                ],
                names=[id_col, "sq_norm"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        batches, f"{id_col} long, sq_norm double"
    )


def grouped_ols(
    df,
    key_col: str,
    y_col: str,
    x_col: str,
):
    """Grouped model fitting — one OLS regression PER KEY via
    ``applyInPandas`` + ``numpy.linalg.lstsq``: the embarrassingly-
    parallel per-entity model pattern (per-store demand curves,
    per-user calibrations). Each group fits independently in one
    Arrow batch; the shuffle carries raw (key, x, y) and returns one
    coefficient row per key.

    Semantics are exactly single-feature OLS, so the driver oracle is
    closed-form SQL (regr_slope/regr_intercept/regr_r2) — the fit
    itself is what gets cross-checked, not just the plumbing.

    Regime note: this shape is for MANY SMALL groups (per-task state =
    one group). For a FEW GIANT groups, single-feature OLS reduces to
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) — use plain
    aggregation / the regr_* expressions (f_regr_functions) instead,
    which partial-aggregate map-side and never hold a group in
    memory."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        A = np.column_stack([x, np.ones_like(x)])
        (slope, intercept), res, _, _ = np.linalg.lstsq(A, y, rcond=None)
        pred = slope * x + intercept
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n": [len(pdf)],
                "slope": [float(slope)],
                "intercept": [float(intercept)],
                "r2": [1.0 - ss_res / ss_tot if ss_tot else None],
            }
        )

    return df.groupBy(key_col).applyInPandas(
        fit, f"{key_col} string, n long, slope double, intercept double, r2 double"
    )
