"""One-off 10x-corpus / reduced-heap stress harness (VERDICT r02
item 7) — the same discipline that exposed the minhash verify-join OOM
in round 2 (BASELINE.md "perf work banked").

Usage:
    python tools/stress10x.py build            # materialize the 10x corpus
    python tools/stress10x.py <query_name>     # run one query on it, 4g heap

``build`` unions each source table 10 times with id offsets (text/
embedding payloads shifted per replica so dedup/ANN can't shortcut on
exact duplicates of the whole corpus). Each query run launches its own
JVM with a 4 GB driver heap — deliberately SMALLER than the 8 GB
default — so hash builds / sorts that would OOM a real 4-16 GB
executor fail here instead of at 100 TB.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/stress10x"
REPLICAS = 10


def build() -> None:
    from pyspark.sql import functions as F

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (
        get_spark,
    )

    spark = get_spark("stress10x-build", master="local[8]")
    specs = {
        # (id column to offset, columns to perturb per replica)
        "documents": ("doc_id", {"text": "concat(text, ' r', r)"}),
        "embeddings": (
            "vec_id",
            # shift each replica's vectors slightly so ANN has 10x
            # distinct points, not 10 copies of the same cloud
            {"embedding": "transform(embedding, x -> x + r * 0.001)"},
        ),
        "events": ("event_id", {}),
    }
    for table, (id_col, perturb) in specs.items():
        df = catalog.load(spark, SRC, table)
        n = df.count()
        out = None
        for r in range(REPLICAS):
            rep = df.withColumn(id_col, F.col(id_col) + F.lit(r * n))
            rep = rep.withColumn("r", F.lit(r))
            for col, expr in perturb.items():
                rep = rep.withColumn(col, F.expr(expr))
            rep = rep.drop("r")
            out = rep if out is None else out.unionByName(rep)
        path = os.path.join(DST, f"{table}.parquet")
        out.write.mode("overwrite").parquet(path)
        print(f"built {path}: {REPLICAS}x{n} rows")
    spark.stop()


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
        extra_conf={"spark.driver.memory": "4g"},
    )
    t0 = time.time()
    n = QUERIES[name](spark, DST).count()
    print(f"STRESS10X {name}: {n} rows in {round(time.time() - t0, 1)}s "
          f"(4g heap, 10x sf0.1 corpus)")
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(sys.argv[1])
