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


@given(
    st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=60
    ),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=12, deadline=None)
def test_global_ranks_match_python(keys, k, n_parts):
    """attach_global_ranks agrees with a plain-Python oracle on random
    multisets (duplicates force tie groups across arbitrary range
    boundaries), arbitrary NTILE k, and arbitrary partition counts —
    including n_parts > n_rows."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        ranks,
    )

    spark = _spark()
    rows = [(key, i) for i, key in enumerate(keys)]  # (key, unique id)
    df = spark.createDataFrame(rows, "key long, rid long")
    out = ranks.attach_global_ranks(
        df,
        sort_cols=[F.asc("key"), F.asc("rid")],
        key_cols=[F.col("key"), F.col("rid")],
        rn_col="rn",
        ntile=k,
        ntile_col="tile",
        num_partitions=n_parts,
    )
    out2 = ranks.attach_global_ranks(
        df,
        sort_cols=[F.asc("key")],
        key_cols=[F.col("key")],
        rank_col="rk",
        dense_rank_col="dr",
        num_partitions=n_parts,
    )
    got = {r["rid"]: (r["rn"], r["tile"]) for r in out.collect()}
    got2 = {r["rid"]: (r["rk"], r["dr"]) for r in out2.collect()}

    # python oracle
    order = sorted(rows, key=lambda t: (t[0], t[1]))
    n = len(order)
    base, rem = divmod(n, k)
    uniq_sorted = sorted(set(keys))
    dense_of = {key: i + 1 for i, key in enumerate(uniq_sorted)}
    first_pos: dict[int, int] = {}
    for pos, (key, _) in enumerate(order, start=1):
        first_pos.setdefault(key, pos)
    for pos, (key, rid) in enumerate(order, start=1):
        tile = (
            (pos - 1) // (base + 1) + 1
            if base and pos <= rem * (base + 1) or base == 0
            else rem + (pos - rem * (base + 1) - 1) // base + 1
        )
        assert got[rid] == (pos, tile), (rid, got[rid], (pos, tile))
        assert got2[rid] == (first_pos[key], dense_of[key]), (
            rid,
            got2[rid],
        )


@given(
    st.lists(
        st.floats(
            min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=15, deadline=None)
def test_int8_quantization_error_bound(vec):
    """Symmetric max-abs int8 quantization: reconstruction error of
    every component is <= scale/2 (the round-half-up bound), and the
    quantized levels stay inside [-127, 127]."""
    spark = _spark()
    df = spark.createDataFrame([(vec,)], "v array<double>")
    scale_col = F.array_max(F.transform(F.col("v"), F.abs)) / F.lit(127.0)
    q_col = F.when(
        scale_col == 0.0, F.transform(F.col("v"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("v"), lambda x: F.floor(x / scale_col + F.lit(0.5)).cast("int")
        )
    )
    row = df.select(scale_col.alias("s"), q_col.alias("q")).collect()[0]
    scale, q = row["s"], row["q"]
    assert all(-127 <= qi <= 127 for qi in q)
    if scale > 0:
        for v, qi in zip(vec, q):
            assert abs(v - qi * scale) <= scale / 2 + 1e-12


def test_stratified_sample_exact_and_deterministic():
    """p_stratified_sample: exactly min(10, |stratum|) rows per group,
    and two independent runs return identical rows (the reproducibility
    sample() cannot give)."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )

    spark = _spark()
    sf = "/root/testdata/sf0.001"
    a = QUERIES["p_stratified_sample"](spark, sf).collect()
    b = QUERIES["p_stratified_sample"](spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    per_group = Counter(r["c_mktsegment"] for r in a)
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )

    sizes = {
        r["c_mktsegment"]: r["n"]
        for r in catalog.load(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for seg, n in sizes.items():
        assert per_group[seg] == min(10, n), (seg, n, per_group[seg])


@given(
    toks=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=200),
    capacity=st.integers(min_value=1, max_value=250),
)
@settings(max_examples=200, deadline=None)
def test_next_fit_bins_invariants(toks, capacity):
    """Pure next-fit fold (operators/packing.py): for ANY ordered
    token sequence and capacity, (a) bin ids start at 0 and are
    non-decreasing with steps of at most 1 (one open bin, never
    reopened); (b) every bin's total fits the capacity unless the bin
    holds a single oversized element; (c) a new bin opens ONLY when
    the previous bin could not have accepted the element."""
    import numpy as np

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.packing import (
        next_fit_bins,
    )

    arr = np.array(toks, dtype="int64")
    bins = next_fit_bins(arr, capacity)
    assert bins[0] == 0
    steps = np.diff(bins)
    assert ((steps == 0) | (steps == 1)).all()
    totals = {}
    for b, t in zip(bins, toks):
        totals.setdefault(int(b), []).append(t)
    for members in totals.values():
        assert sum(members) <= capacity or len(members) == 1
    # (c): the element that OPENED bin b+1 must not have fit in bin b
    idx = 0
    for b in range(bins.max() + 1):
        members = totals[b]
        idx += len(members)
        if idx < len(toks):
            assert sum(members) + toks[idx] > capacity


@given(
    colors=st.lists(
        st.tuples(*[st.integers(min_value=0, max_value=255)] * 3),
        min_size=4, max_size=4,
    ),
    q=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_flat_quadrants_roundtrip_within_two(colors, q):
    """Baseline-JPEG codec (operators/jpeg.py): ANY 16×16 image of four
    flat 8×8 quadrants round-trips with every pixel within ±2 at
    quality q ≤ 4 — the spec-level bound behind mm_jpeg_decode's
    stronger measured-exact fixture claim. Randomizing colors and the
    quant scalar covers clipping at 0/255 and DC quantization, not
    just the fixture's arithmetic family."""
    import numpy as np

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        jpeg,
    )

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :8] = colors[0]
    img[:8, 8:] = colors[1]
    img[8:, :8] = colors[2]
    img[8:, 8:] = colors[3]
    w, h, nc, px = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quant=q))
    assert (w, h, nc) == (16, 16, 3)
    err = np.abs(px.astype(int) - img.astype(int)).max()
    assert err <= 2 * q, err
