"""Query/oracle registry.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable plus
an optional ANSI-SQL oracle string DuckDB runs on the same parquet
tables (driver contract, /root/repo/__spark_entry__.py). Column names
must match exactly between the Spark result and the oracle — the
driver's compare sorts columns by name before hashing.

Convention for float stability: any aggregate whose value depends on
floating-point summation order is rounded identically on both sides
(``round(sum(x), 2)`` for money-scale, ``round(avg(x), 4)`` for means)
so the order-insensitive value hash is reproducible across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB SQL twin.

    ``oracle=None`` marks a non-SQL-expressible operator (approximate /
    stateful / iterative); the driver then records a rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
