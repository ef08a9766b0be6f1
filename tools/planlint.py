"""Plan lint: scan every registered query's PHYSICAL plan for scale
antipatterns, without executing anything (plans are built at the given
sf_dir, default sf0.01).

Checked antipatterns:
- BatchEvalPython / PythonUDF-in-filter: a row-at-a-time Python UDF in
  the hot path (the sanctioned Python seams are Arrow ones:
  ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
- CartesianProduct: a non-broadcast cross product — at scale this is
  |A|x|B|; crossJoin is only acceptable under F.broadcast (which plans
  BroadcastNestedLoopJoin).
- Exchange SinglePartition feeding a Window/Sort over a FACT table:
  all rows funnel through one task. Global aggregates legitimately use
  SinglePartition (they reduce first), so only Window/Sort parents are
  flagged.

Queries that are eager at build time fall in two classes (ADVICE r07
made this contract explicit):
- EXPENSIVE iterative fits / checkpoint-lineage fixpoints (IVF
  quantizer training, pagerank/TextRank/k-core/PPR localCheckpoint
  rounds) are skipped by name via EAGER — building their plan would
  run heavy jobs.
- BOUNDED build-time side effects (the checked incremental sinks'
  three availableNow micro-batches, the persisted-index lifecycle
  builds, trainer-artifact writes) ARE executed during lint, by
  design: they write only to a throwaway tempdir scratch, cost
  seconds, and executing them is the only way to lint their final
  probe/scoring plan — the part that runs against the corpus at
  scale and therefore the part worth linting.

Usage: python tools/planlint.py [sf_dir] [name ...]
Exit code 1 if any query trips a hard antipattern.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Build-time-eager queries (documented iterative ops) — skipped.
#: The *_recall wrappers embed their approx query's build, so any
#: wrapper around an eager name is eager too; g_pagerank_banded's
#: pagerank() materializes localCheckpoints at call time.
EAGER = {
    "sim_topk_ivf",
    "dedup_embedding",
    "g_pagerank_banded",
    # TextRank reuses the eager pagerank fixpoint over the word graph
    "text_textrank_keywords",
    # ADVICE r07: k-core / PPR run localCheckpoint(eager=True) rounds
    # (+ a .count()) at build time — skipped like pagerank.
    "g_kcore",
    "g_ppr_banded",
    # r08: builds the persisted IVF index at build time (quantizer
    # training is the sanctioned eager fit — same reason as
    # sim_topk_ivf above)
    "sim_knn_classify_ivf",
}
EAGER |= {f"{n}_recall" for n in EAGER if n.startswith("sim_topk_")}
EAGER.add("sim_topk_ivfpq_recall")  # wraps sim_topk_ivfpq (PQ+IVF fit)

HARD = {
    "rowwise_python_udf": re.compile(r"BatchEvalPython"),
    "cartesian_product": re.compile(r"CartesianProduct"),
}


def single_partition_window_over_scan(plan: str) -> bool:
    """True if an `Exchange SinglePartition` directly feeds a Window or
    Sort whose subtree contains a parquet FileScan — the all-rows-in-
    one-task shape. (Tiny aggregate-output windows, e.g. the o1 offset
    cumsum over #partition rows, have an Aggregate between the scan and
    the exchange and are not flagged.)"""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" not in line and "Sort" not in line:
            continue
        indent = len(line) - len(line.lstrip())
        # walk the subtree under this node
        saw_single, saw_agg = False, False
        for nxt in lines[i + 1 :]:
            n_ind = len(nxt) - len(nxt.lstrip())
            if nxt.strip() and n_ind <= indent:
                break
            if "Exchange SinglePartition" in nxt:
                saw_single = True
            if "HashAggregate" in nxt or "SortAggregate" in nxt:
                saw_agg = True
        if saw_single and not saw_agg:
            return True
    return False


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.plans import (
        explain,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        QUERIES,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (
        get_spark,
    )

    spark = get_spark("planlint")
    todo = names or [n for n in QUERIES if n not in EAGER]
    failures: list[tuple[str, str]] = []
    warns: list[tuple[str, str]] = []
    for name in todo:
        try:
            plan = explain.physical_plan(QUERIES[name](spark, sf_dir))
        except Exception as exc:  # pragma: no cover
            failures.append((name, f"plan build failed: {exc}"))
            continue
        for label, rx in HARD.items():
            if rx.search(plan):
                failures.append((name, label))
        if single_partition_window_over_scan(plan):
            warns.append((name, "single-partition window/sort over a scan"))
    for name, why in warns:
        print(f"WARN  {name}: {why}")
    for name, why in failures:
        print(f"FAIL  {name}: {why}")
    print(
        f"\n{len(todo)} plans linted, {len(failures)} failures, "
        f"{len(warns)} warnings"
    )
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
