"""Local driver-simulator: run every registered query on Spark AND its
DuckDB oracle, compare row-count + schema + order-insensitive values.

Usage: python tools/check.py [--plain] [--window] [sf_dir] [name ...]

``--window`` adds the live 50-name driver window to the selection —
the every-round re-proof is one command.

``--plain`` runs against a bare ``SparkSession`` (no engine conf
profile) — exactly what the real driver does — so it catches queries
that accidentally depend on ``session.get_spark()`` settings.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def duck_conn(sf_dir: str):
    import duckdb

    conn = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _norm_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 6)
    # array-typed columns arrive as numpy arrays (Spark) / lists
    # (DuckDB): make both hashable+comparable tuples. NOTE: the real
    # driver's value-hash contract is scalar-only — prefer serializing
    # arrays (array_join/array_to_string) in registered queries; this
    # branch keeps the LOCAL checker usable on array outputs anyway.
    if hasattr(v, "tolist"):
        return tuple(_norm_value(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def normalize(df):
    """pandas df → sorted-by-column-name, row-sorted list of tuples."""
    df = df[sorted(df.columns)]
    rows = [
        tuple(_norm_value(v) for v in tup)
        for tup in df.itertuples(index=False)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def main() -> None:
    argv = [a for a in sys.argv[1:] if a not in ("--plain", "--window")]
    plain = "--plain" in sys.argv[1:]
    window = "--window" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import ORACLES, QUERIES

    if window:  # the live 50-name driver window (every-round re-proof)
        import end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries as _qpkg

        only |= set(_qpkg._DRIVER_WINDOW_FIRST)

    if plain:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-plain")
            .getOrCreate()
        )
    else:
        from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import get_spark

        spark = get_spark("check", master="local[8]")
    conn = duck_conn(sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = conn.execute(ORACLES[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        if not problems:
            s_rows, d_rows = normalize(sdf), normalize(ddf)
            if s_rows != d_rows:
                diff = [
                    (a, b) for a, b in zip(s_rows, d_rows) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
