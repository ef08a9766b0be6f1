"""Work-metric harness for optimization A/Bs on a noisy host: run the
named queries (noop sink) and report HOST-INDEPENDENT work counters
from the Spark REST API — jobs, stages, tasks, input bytes, shuffle
read/write bytes — for the LAST of ``--reps`` runs (steady state).
Wall seconds are printed too but are load-sensitive; the counters are
what optimization decisions should compare (guide §1: measure first —
on a shared host, measure *work*).

Usage: python tools/workmeter.py [--reps N] <name> [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (  # noqa: E501
        QUERIES,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (  # noqa: E501
        get_spark,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )

    spark = get_spark("workmeter")
    catalog.load(spark, sf_dir, "documents").write.format("noop").mode(
        "overwrite"
    ).save()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def _get(url: str):
        return json.load(urllib.request.urlopen(url, timeout=30))

    def job_floor() -> int:
        jobs = _get(f"{ui}/api/v1/applications/{app}/jobs")
        return max((j["jobId"] for j in jobs), default=-1)

    for name in args:
        walls = []
        for i in range(reps):
            floor = job_floor()
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
            spark.catalog.clearCache()
        jobs = [
            j
            for j in _get(f"{ui}/api/v1/applications/{app}/jobs")
            if j["jobId"] > floor
        ]
        sids = {s for j in jobs for s in j["stageIds"]}
        # One entry per stage ATTEMPT comes back — a retried stage
        # would double-count tasks/bytes/runtime; keep only the
        # latest attempt per stageId (ADVICE r11).
        latest: dict[int, dict] = {}
        for s in _get(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ):
            if s["stageId"] not in sids:
                continue
            prev = latest.get(s["stageId"])
            if prev is None or s["attemptId"] > prev["attemptId"]:
                latest[s["stageId"]] = s
        stages = list(latest.values())
        m = {
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": sum(s["numTasks"] for s in stages),
            "input_mb": round(
                sum(s.get("inputBytes", 0) for s in stages) / 1e6, 2
            ),
            "sh_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 2
            ),
            "sh_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 2
            ),
            "exec_s": round(
                sum(s["executorRunTime"] for s in stages) / 1e3, 1
            ),
            "walls": [round(w, 2) for w in walls],
        }
        print(name, json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main()
