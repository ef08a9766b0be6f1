"""Snapshot `.explain("formatted")` for named queries into
plans/<tag>/<name>_<suffix>.txt — the optimization-round evidence
artifact (the judge reads these instead of running Spark).

Usage: python tools/plansnap.py <tag> <suffix> <name> [name ...]
   e.g. python tools/plansnap.py r11 before p_curation_pipeline

Plans are built at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 —
plan SHAPE is scale-independent; building at sf0.01 keeps build-time-
eager queries cheap). Uses the same engine-profile session the bench
uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_USAGE = "usage: python tools/plansnap.py <tag> <suffix> <name> [name ...]"


def main() -> None:
    if len(sys.argv) < 4:
        print(_USAGE, file=sys.stderr)
        sys.exit(2)
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (  # noqa: E501
        QUERIES,
    )

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}\n{_USAGE}", file=sys.stderr)
        sys.exit(2)
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (  # noqa: E501
        get_spark,
    )

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plansnap")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
