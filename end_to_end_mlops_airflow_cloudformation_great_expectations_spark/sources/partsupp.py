"""Derived ``partsupp`` — the TPC-H table the fixture set lacks
(VERDICT r07 item 5: literal Q2/Q9/Q11/Q16/Q20 need it).

The driver's testdata directory is read-only and its DuckDB oracle
pre-registers only the fixed table list, so partsupp cannot be a
parquet fixture. Instead it is DERIVED deterministically from
``part`` × ``supplier`` with pure integer arithmetic that replays
bit-for-bit in BOTH engines (the stream_cms / bloom portability
discipline): the Spark builder below and the oracle CTE string in
:mod:`..queries.tpch_partsupp` compute identical rows, so literal
partsupp queries hash-check like any fixture-backed query.

Generation rule (TPC-H dbgen's supplier-assignment formula,
`supplier(i) = (p + i·(S/4 + (p-1)/S)) mod S + 1`, adapted to the
fixture's 0-based keys, spec §4.2.3):

    ps_suppkey(i)   = (p + i·(S//4 + p//S)) mod S          i = 0..3
    ps_availqty     = (p·7 + ps_suppkey·11) mod 9999 + 1   [1, 9999]
    ps_cost_cents   = (p·31 + ps_suppkey·17) mod 99900 + 100
    ps_supplycost   = ps_cost_cents / 100.0                [1.00, 1000.00]

availqty / supplycost replace dbgen's RNG draws with portable hashes
on the SAME key domain (the spec only requires uniform coverage of
the ranges). At tiny S the stride can collide (S=10, p//S ≡ 3 mod 10
gives stride 5 → i=0/2 repeat), so the builder deduplicates — the
spec's "4 distinct suppliers per part" holds wherever S ≥ 40, and the
PK (ps_partkey, ps_suppkey) holds always.

Scale shape: partsupp is a FACT table (4·|part| rows — at TPC-H sf
100k that is 80 B rows). The build is one map-only explode over the
part scan plus a 1-row supplier-count broadcast — no shuffle; the
DISTINCT collapses map-side (4 rows per key at most). Queries joining
it to lineitem must treat it as fact⋈fact (no broadcast hints)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp table: (ps_partkey, ps_suppkey,
    ps_availqty, ps_cost_cents, ps_supplycost). ps_cost_cents is the
    exact BIGINT the money arithmetic should use (band-grid lesson:
    ship the integers); ps_supplycost is the double both engines
    derive identically from it."""
    p = catalog.load(spark, sf_dir, "part").select("p_partkey")
    sc = catalog.load(spark, sf_dir, "supplier").agg(
        F.count("*").alias("sc")
    )
    pk = F.col("p_partkey")
    stride = F.floor(F.col("sc") / 4).cast("long") + F.floor(
        pk / F.col("sc")
    ).cast("long")
    ps0 = (
        p.join(F.broadcast(sc))
        .select(
            pk.alias("ps_partkey"),
            F.explode(
                F.array(*[(pk + F.lit(i) * stride) for i in range(4)])
            ).alias("raw"),
            "sc",
        )
        .select(
            "ps_partkey", (F.col("raw") % F.col("sc")).alias("ps_suppkey")
        )
        .distinct()
    )
    cents = (
        F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17
    ) % 99900 + 100
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999 + 1
         ).alias("ps_availqty"),
        cents.alias("ps_cost_cents"),
        (cents / 100.0).alias("ps_supplycost"),
    )
