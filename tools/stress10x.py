"""One-off 10x-corpus / reduced-heap stress harness (VERDICT r02
item 7) — the same discipline that exposed the minhash verify-join OOM
in round 2 (BASELINE.md "perf work banked").

Usage (SPARK_GRAFT_STRESS_REPLICAS=N picks the multiple, default 10;
each N gets its own /tmp/stressNx directory):
    python tools/stress10x.py build            # materialize the Nx corpus
    python tools/stress10x.py <query_name>     # run one query on it, 4g heap
    python tools/stress10x.py runall [names…]  # whole bench HEADLINE, one
                                               # 4g JVM, JSON summary line

``build`` unions each FACT table (lineitem, orders, events, documents,
embeddings) 10 times with id offsets — FK-consistent: lineitem's
l_orderkey shifts by the same per-replica stride as orders' o_orderkey,
so joins stay valid — while the dimension tables (region, nation,
customer, supplier, part) stay 1x, which is exactly how a warehouse
grows (facts accumulate, dims don't). Text/embedding payloads are
perturbed per replica so dedup/ANN can't shortcut on exact duplicates
of the whole corpus. Each query run gets a 4 GB driver heap —
deliberately SMALLER than the 8 GB default — so hash builds / sorts
that would OOM a real 4-16 GB executor fail here instead of at 100 TB.

``runall`` sets SPARK_GRAFT_SKETCH_EXACT=0 (the banded queries'
production path — the corpus dir has no sf marker, and the exact twin
is an oracle-scale artifact the 10x run must not pay for).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# SPARK_GRAFT_STRESS_REPLICAS picks the corpus multiple (default 10);
# each multiple gets its own directory, so 10x and 30x corpora coexist
# and two-point scaling curves (10x -> 30x at the same 4 GB heap) can
# be measured without rebuilds.
REPLICAS = int(os.environ.get("SPARK_GRAFT_STRESS_REPLICAS", "10"))
DST = os.environ.get(
    "SPARK_GRAFT_STRESS_DIR",
    "/tmp/stress10x" if REPLICAS == 10 else f"/tmp/stress{REPLICAS}x",
)


def build() -> None:
    from pyspark.sql import functions as F

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (
        get_spark,
    )

    spark = get_spark("stress10x-build", master="local[8]")
    # orders and lineitem must shift l_orderkey/o_orderkey by the SAME
    # per-replica stride or the fact-fact join silently loses matches.
    order_stride = (
        catalog.load(spark, SRC, "orders")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
        + 1
    )
    specs = {
        # (cols to offset → stride expr, columns to perturb per replica)
        "documents": ({"doc_id": None}, {"text": "concat(text, ' r', r)"}),
        "embeddings": (
            {"vec_id": None},
            # shift each replica's vectors slightly so ANN has 10x
            # distinct points, not 10 copies of the same cloud
            {"embedding": "transform(embedding, x -> x + r * 0.001)"},
        ),
        "events": ({"event_id": None}, {}),
        "orders": ({"o_orderkey": order_stride}, {}),
        "lineitem": ({"l_orderkey": order_stride}, {}),
    }
    for table, (offsets, perturb) in specs.items():
        df = catalog.load(spark, SRC, table)
        n = df.count()
        out = None
        for r in range(REPLICAS):
            rep = df
            for id_col, stride in offsets.items():
                rep = rep.withColumn(
                    id_col, F.col(id_col) + F.lit(r * (stride or n))
                )
            rep = rep.withColumn("r", F.lit(r))
            for col, expr in perturb.items():
                rep = rep.withColumn(col, F.expr(expr))
            rep = rep.drop("r")
            out = rep if out is None else out.unionByName(rep)
        path = os.path.join(DST, f"{table}.parquet")
        out.write.mode("overwrite").parquet(path)
        print(f"built {path}: {REPLICAS}x{n} rows")
    # dims stay 1x (facts grow, dims don't) — copy them so every
    # registered query resolves against DST alone
    for table in ("region", "nation", "customer", "supplier", "part"):
        path = os.path.join(DST, f"{table}.parquet")
        catalog.load(spark, SRC, table).write.mode("overwrite").parquet(path)
        print(f"copied {path} (1x dim)")
    spark.stop()


def _shuffle_parts() -> int:
    """Shuffle width sized to the corpus multiple — the brief's own
    sizing rule ("size spark.sql.shuffle.partitions so partitions fit
    in executor memory at the target SF"): the engine profile's 32 is
    right for 1-10x, but at 100x a 32-wide shuffle hands each task a
    ~15M-row sort under a ~275 MB execution share and the verify
    SMJ + pipelined partial-agg consumers thrash to
    UNABLE_TO_ACQUIRE_MEMORY (measured live, r11 — p_curation_pipeline
    stage 589). 10x keeps 32 (existing tables stay comparable); 30x
    gets 96; 100x caps at 256. A real 100 TB job sets exactly this
    knob per stage width.
    """
    return min(256, 32 * max(1, REPLICAS // 10))


def run(name: str) -> None:
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (
        get_spark,
    )

    spark = get_spark(
        f"stress10x-{name}",
        master="local[8]",
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.sql.shuffle.partitions": str(_shuffle_parts()),
        },
    )
    # Materialize through the noop sink like runall/bench — .count()
    # lets Catalyst PRUNE expensive output columns (observed: the
    # span-cut text reassembly dropped out entirely, undertiming the
    # query ~8x). The row count is taken untimed afterwards.
    t0 = time.time()
    QUERIES[name](spark, DST).write.format("noop").mode("overwrite").save()
    dt = round(time.time() - t0, 1)
    n = QUERIES[name](spark, DST).count()
    print(f"STRESS10X {name}: {n} rows in {dt}s "
          f"(4g heap, {REPLICAS}x sf0.1 corpus)")
    spark.stop()


def runall(names: list[str] | None = None) -> None:
    """The full bench HEADLINE on the 10x corpus in ONE 4g-heap JVM:
    scaling curves for every perf-tracked family, not just the heavy
    tail. Prints one line per query + a final JSON summary."""
    import json

    os.environ["SPARK_GRAFT_SKETCH_EXACT"] = "0"
    import bench

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (
        get_spark,
    )

    spark = get_spark(
        "stress10x-runall",
        master="local[8]",
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.sql.shuffle.partitions": str(_shuffle_parts()),
        },
    )
    timings: dict[str, float] = {}
    for name in names or bench.HEADLINE:
        t0 = time.time()
        try:
            QUERIES[name](spark, DST).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 2)
            print(f"STRESS10X {name}: {timings[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            timings[name] = -1.0
            print(f"STRESS10X {name}: FAILED {exc}", flush=True)
    print(
        json.dumps(
            {
                "metric": "stress10x_headline_wall",
                "value": round(sum(v for v in timings.values() if v > 0), 2),
                "unit": "sec",
                "queries": timings,
                "heap": "4g",
                "corpus": f"{REPLICAS}x sf0.1",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    elif sys.argv[1] == "runall":
        runall(sys.argv[2:] or None)
    else:
        run(sys.argv[1])
