"""Round-5 staged queries (queries/staged_r05.py): proven green BEFORE
registration so the round-5 flip (unconditional import + window
rotation) is a mechanical change, not a correctness event.

The registration freeze (round-2 standing order) means these names
must NOT reach the driver's registry in round 4 — the gating itself is
tested here in a subprocess with a clean environment.
"""

from __future__ import annotations

import math
import os
import subprocess
import sys

import numpy as np

SF_DIR = "/root/testdata/sf0.001"
_PKG = "end_to_end_mlops_airflow_cloudformation_great_expectations_spark"


def test_staged_not_registered_without_flag():
    """Driver environments never set SPARK_GRAFT_STAGED — the staged
    names must be invisible there (freeze holds). Subprocess because
    the in-process registry may already contain them via the direct
    imports below."""
    env = {k: v for k, v in os.environ.items() if k != "SPARK_GRAFT_STAGED"}
    code = (
        f"import sys; sys.path.insert(0, '/root/repo')\n"
        f"from {_PKG}.queries import QUERIES\n"
        "assert 'mm_jpeg_decode' not in QUERIES\n"
        "assert 'g_pagerank_banded' not in QUERIES\n"
        "print('gated-ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "gated-ok" in out.stdout


def test_staged_names_append_after_the_pinned_window():
    """Even when staged queries ARE registered, they must land BEHIND
    the 50-name driver window so the round-4 window composition cannot
    shift."""
    import end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries as qpkg
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (  # noqa: F401
        staged_r05,
    )

    names = list(qpkg.QUERIES)
    assert names[:50] == qpkg._DRIVER_WINDOW_FIRST
    assert names.index("mm_jpeg_decode") >= 50
    assert names.index("g_pagerank_banded") >= 50
    # both staged queries are oracle-backed (window slots aren't wasted
    # on rows-only checks when they rotate in)
    assert "mm_jpeg_decode" in qpkg.ORACLES
    assert "g_pagerank_banded" in qpkg.ORACLES


def test_jpeg_corner_pixels_exact_across_id_sweep():
    """mm_jpeg_decode's oracle predicts corner pixels EXACTLY (no ±2
    codec band): flat 8×8-aligned quadrants at q=1 reconstruct to the
    fixture colors with pre-rounding error ≤ 0.17 px. Pin exactness
    across a stride of the full sf0.1 doc_id range so a codec change
    that erodes the margin fails here before it fails registration."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        jpeg,
    )

    for d in range(0, 5000, 83):
        w, h, nc, px = jpeg.decode_jpeg(jpeg._build_jpeg(d))
        assert (w, h, nc) == (16, 16, 3)
        tl = ((d * 37) % 200 + 20, (d * 59) % 200 + 20, (d * 83) % 200 + 20)
        br = (
            (d * 101) % 200 + 20,
            (d * 131) % 200 + 20,
            (d * 151) % 200 + 20,
        )
        assert tuple(int(v) for v in px[0, 0]) == tl, f"doc_id={d}"
        assert tuple(int(v) for v in px[15, 15]) == br, f"doc_id={d}"


def test_pagerank_band_edges_have_margin():
    """g_pagerank_banded quantizes ranks to 1e-6 bands; the oracle
    match is only deterministic if no rank sits near a band edge.
    Re-derive the ranks in numpy (same graph, damping, iterations)
    and assert every rank keeps ≥ 1e-3 band-widths of clearance —
    measured 0.04 at sf0.001/sf0.01, vs ~1e-9 cross-engine float
    noise."""
    import duckdb

    ks = duckdb.sql(
        "SELECT DISTINCT o_orderkey % 200 AS s, 200 + o_orderkey % 190 AS d "
        f"FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchnumpy()
    src = np.concatenate([ks["s"], ks["d"]]).astype(np.int64)
    dst = np.concatenate([ks["d"], ks["s"]]).astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    idx = {int(v): i for i, v in enumerate(nodes)}
    s = np.array([idx[int(v)] for v in src])
    t = np.array([idx[int(v)] for v in dst])
    deg = np.bincount(s, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        contrib = np.zeros(n)
        np.add.at(contrib, t, r[s] / deg[s])
        r = (1.0 - 0.85) / n + 0.85 * contrib
    band = r * 1e6
    dist = np.abs(band - np.round(band))
    assert float(dist.min()) > 1e-3, float(dist.min())


def _duck_oracle(sql: str):
    import duckdb

    conn = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        conn.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return conn.execute(sql).df()


def _norm(df):
    df = df[sorted(df.columns)]
    rows = [
        tuple(
            None
            if v is None or (isinstance(v, float) and math.isnan(v))
            else (round(v, 6) if isinstance(v, float) else v)
            for v in tup
        )
        for tup in df.itertuples(index=False)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def test_staged_queries_match_their_oracles(spark):
    """The same differential check the driver runs (rows + columns +
    order-insensitive values), in-process at sf0.001, for both staged
    queries — local green here is what licenses the round-5 flip."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        staged_r05,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.registry import (
        ORACLES,
    )

    for name, fn in [
        ("mm_jpeg_decode", staged_r05.mm_jpeg_decode),
        ("g_pagerank_banded", staged_r05.g_pagerank_banded),
    ]:
        sdf = fn(spark, SF_DIR).toPandas()
        ddf = _duck_oracle(ORACLES[name])
        assert len(sdf) == len(ddf), name
        assert sorted(sdf.columns) == sorted(ddf.columns), name
        assert _norm(sdf) == _norm(ddf), name
