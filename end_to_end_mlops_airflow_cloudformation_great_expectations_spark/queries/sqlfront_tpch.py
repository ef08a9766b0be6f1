"""SQL front end × TPC-H (VERDICT r06 item 7): the widened passthrough
set proving the front end runs the engine's own headline shapes from
portable SQL text with ZERO execution-path overhead.

Each query here re-runs an existing TPC-H DataFrame builder's ORACLE
string through :func:`.sqlfront.run_sql` — the SQL the independent
DuckDB check executes IS the SQL Spark executes (the passthrough module
invariant, test-pinned via object identity: ``ORACLES["sql_tpch_qN"] is
ORACLES["tpch_<twin>"]``). That gives three guarantees at once:

- dialect portability: the shared ANSI subset behaves identically on
  both engines for joins/aggs/HAVING/FILTER/subqueries;
- result parity with the DataFrame builders (same oracle, same hash);
- plan parity: tests/test_plans.py pins that the SQL text compiles to
  the same physical strategy mix (same join kinds, same number of
  exchanges/aggregates) as the hand-built DataFrame program — Catalyst
  is the one optimizer either way, so the front end adds nothing.

This module must import AFTER :mod:`.relational` and
:mod:`.tpch_extra` (queries/__init__.py order) — it reuses their
registered oracle strings verbatim instead of duplicating SQL.

Excluded twins are excluded for DIALECT reasons, not capability:
q3's oracle calls DuckDB's ``EPOCH()``; q4's relies on
``+ INTERVAL`` arithmetic whose timestamp semantics differ; q19's uses
engine-specific array syntax. Their DataFrame builders remain the
canonical implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import ORACLES, query
from .sqlfront import run_sql

#: passthrough name → the registered DataFrame twin whose oracle SQL
#: string is executed verbatim by BOTH engines. sql_window_topk is not
#: TPC-H but earns its slot as the WINDOW-function dialect surface
#: (ROW_NUMBER over a partition, rank-filter subquery) — the remaining
#: passthroughs cover joins/aggs/HAVING/FILTER/subqueries.
TPCH_PASSTHROUGHS = {
    "sql_window_topk": "w1_topk_per_group",
    "sql_tpch_q1": "tpch_q1_pricing_summary",
    "sql_tpch_q5": "tpch_q5_regional_revenue",
    "sql_tpch_q6": "tpch_q6_forecast_revenue",
    "sql_tpch_q12": "tpch_q12_conditional_agg",
    "sql_tpch_q14": "tpch_q14_promo_revenue",
    "sql_tpch_q17": "tpch_q17_small_qty_revenue",
    "sql_tpch_q18": "tpch_q18_large_orders",
}


def _register(name: str, twin: str) -> None:
    sql = ORACLES[twin]

    @query(name, oracle=sql)
    def passthrough(
        spark: SparkSession, sf_dir: str, _sql: str = sql
    ) -> DataFrame:
        return run_sql(spark, sf_dir, _sql)

    passthrough.__name__ = name
    passthrough.__doc__ = (
        f"SQL-front-end passthrough of {twin}: executes that query's "
        "oracle SQL string verbatim through spark.sql — same plan "
        "family as the DataFrame builder (pinned in test_plans.py), "
        "same oracle by object identity."
    )


for _name, _twin in TPCH_PASSTHROUGHS.items():
    _register(_name, _twin)
