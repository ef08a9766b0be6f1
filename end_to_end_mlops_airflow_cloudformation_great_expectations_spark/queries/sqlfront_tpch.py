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

Coverage: ALL 22 TPC-H shapes run through the front end — 21 of them
verbatim on the twin's oracle string. q3's twin oracle calls DuckDB's
``EPOCH()`` (Spark has no such routine), so ``sql_tpch_q3`` is the
one RESTATED passthrough: the same Q3 shape with the epoch column
re-spelled portably (``CAST(CAST(o_orderdate AS DATE) AS
VARCHAR(10))`` — the only date-output form both parsers accept with
identical text results), registered self-oracled like the sqlfront.py
originals and plan-family-pinned against the twin. Two passthroughs (q15, q22) live in
:data:`TPCH_PASSTHROUGHS_DIVERGENT`: Catalyst compiles their SQL text
to a *different but no-worse* strategy mix than the hand-built
DataFrame program (q15's scalar-subquery max reuses an aggregation
instead of a second broadcast join; q22's decorrelated AVG subquery
avoids the twin's BroadcastNestedLoopJoin at the cost of one
broadcast exchange). Both mixes are snapshot-pinned in
tests/test_plans.py so either side regressing is caught.
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
    "sql_tpch_q2": "tpch_q2_min_cost_match",
    "sql_tpch_q4": "tpch_q4_late_orders",
    "sql_tpch_q5": "tpch_q5_regional_revenue",
    "sql_tpch_q6": "tpch_q6_forecast_revenue",
    "sql_tpch_q7": "tpch_q7_nation_volume",
    "sql_tpch_q8": "tpch_q8_market_share",
    "sql_tpch_q9": "tpch_q9_product_profit",
    "sql_tpch_q10": "tpch_q10_returned_items",
    "sql_tpch_q11": "tpch_q11_important_parts",
    "sql_tpch_q12": "tpch_q12_conditional_agg",
    "sql_tpch_q13": "tpch_q13_order_histogram",
    "sql_tpch_q14": "tpch_q14_promo_revenue",
    "sql_tpch_q16": "tpch_q16_supplier_counts",
    "sql_tpch_q17": "tpch_q17_small_qty_revenue",
    "sql_tpch_q18": "tpch_q18_large_orders",
    "sql_tpch_q19": "tpch_q19_disjunctive",
    "sql_tpch_q20": "tpch_q20_bulk_suppliers",
    "sql_tpch_q21": "tpch_q21_sole_late_supplier",
}

#: passthroughs whose SQL text compiles to a DIFFERENT (no-worse)
#: physical strategy mix than the hand-built twin — see module
#: docstring; both mixes are snapshot-pinned in test_plans.py rather
#: than being held to the strict-equality loop.
TPCH_PASSTHROUGHS_DIVERGENT = {
    "sql_tpch_q15": "tpch_q15_top_supplier",
    "sql_tpch_q22": "tpch_q22_idle_customers",
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


for _name, _twin in {**TPCH_PASSTHROUGHS, **TPCH_PASSTHROUGHS_DIVERGENT}.items():
    _register(_name, _twin)


#: q3 restated portably (module docstring): identical joins, filters,
#: grouping, ordering and LIMIT as tpch_q3_shipping_priority's oracle;
#: only the epoch output column is re-spelled as an ISO date string.
SQL_TPCH_Q3 = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR(10)) AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("sql_tpch_q3", oracle=SQL_TPCH_Q3)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 22nd TPC-H shape through the SQL front end: dim-filtered
    multi-join → agg → ORDER BY + LIMIT (TakeOrderedAndProject). Not a
    verbatim twin-oracle passthrough — see module docstring — but the
    strategy mix is pinned against tpch_q3_shipping_priority in
    test_plans.py like the strict set."""
    return run_sql(spark, sf_dir, SQL_TPCH_Q3)
