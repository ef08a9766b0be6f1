"""Randomized-interleaving test of the shared delta-index protocol
(operators/ledger.py): drive a minimal two-table index through random
sequences of appends, replays, aborted (partial) appends, compactions,
and manufactured crash states, checking after EVERY step that the
read-only resolution equals a python reference model. The enumerated
crash-state tests (test_minhash_index.py, test_llm_ops.py) pin each
transition once; this pins that arbitrary compositions of them can
never double-count, lose, or half-apply a batch."""

from __future__ import annotations

import os
import random
import shutil

import pytest

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    ledger,
)

TABLES = ("alpha", "beta")


def _tables_fn(batch_df):
    # two derived subtables from one batch: identity + a doubled copy,
    # so a half-applied batch is detectable as cross-table skew
    return {
        "alpha": batch_df,
        "beta": batch_df.selectExpr("id", "val * 2 AS val"),
    }


def _resolved_ids(spark, base):
    out = ledger.resolve_delta_tables(spark, base, TABLES)
    a = sorted((r.id, r.val) for r in out["alpha"].collect())
    b = sorted((r.id, r.val) for r in out["beta"].collect())
    return a, b


def _check(spark, base, model):
    """Both subtables must contain exactly the model's batches —
    mutually consistent (beta = alpha doubled), nothing lost, nothing
    double-counted."""
    a, b = _resolved_ids(spark, base)
    want_a = sorted((i, i * 10) for i in model)
    want_b = sorted((i, i * 20) for i in model)
    assert a == want_a, f"alpha diverged: {a} != {want_a}"
    assert b == want_b, f"beta diverged: {b} != {want_b}"


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_random_interleavings_never_lose_or_double_count(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    base = str(tmp_path / f"chaos_{seed}")
    first = spark.createDataFrame([(0, 0)], "id long, val long")
    for name, df in _tables_fn(first).items():
        df.write.mode("overwrite").parquet(os.path.join(base, name))
    model = {0}
    sink = ledger.delta_append_sink(base, _tables_fn)
    next_id = 1

    def batch(i):
        return spark.createDataFrame([(i, i * 10)], "id long, val long")

    for _ in range(14):
        op = rng.choice(
            ["append", "replay", "partial", "compact", "crash_precommit"]
        )
        if op == "append":
            sink(batch(next_id), next_id)
            model.add(next_id)
            next_id += 1
        elif op == "replay" and model:
            # re-deliver a random ALREADY-APPLIED batch id with the
            # same content — must no-op whether folded or still a delta
            i = rng.choice(sorted(model - {0}) or [1])
            if i in model:
                sink(batch(i), i)
        elif op == "partial":
            # an append that crashed mid-write: delta dir, no marker
            d = os.path.join(base, "delta", f"b{next_id}")
            os.makedirs(os.path.join(d, "alpha"), exist_ok=True)
            # replay completes it (the sink overwrites the aborted dir)
            sink(batch(next_id), next_id)
            model.add(next_id)
            next_id += 1
        elif op == "compact":
            ledger.compact_delta_index(spark, base, TABLES)
        elif op == "crash_precommit":
            # a compactor that died after materializing _new tables but
            # before the ledger commit: readers must ignore them and
            # the next compact must roll back then converge
            for t in TABLES:
                new = os.path.join(base, f"{t}_new")
                if os.path.isdir(new):
                    shutil.rmtree(new)
                shutil.copytree(os.path.join(base, t), new)
                ledger.write_folded_manifest(new, ["b999"])
        _check(spark, base, model)

    # settle: a final compact folds whatever is left; invariants hold
    ledger.compact_delta_index(spark, base, TABLES)
    _check(spark, base, model)
    assert not os.path.isdir(os.path.join(base, "delta"))


@pytest.mark.parametrize("seed", [11, 47])
def test_two_appenders_disjoint_ids_one_compactor(spark, tmp_path, seed):
    """VERDICT r07 item 6 — the concurrency contract the 4 index
    lifecycles inherit, pinned: TWO appenders may feed one index
    concurrently IFF their batch-id spaces are disjoint (each Spark
    streaming query's ids are distinct within itself by checkpoint;
    two queries must namespace — here writer A uses even ids, writer
    B odd, exactly the "two sources, one index" deployment). Every
    interleaving of their appends, replays, partial crashes, and a
    racing compactor must keep the resolved view exact. SAME-id
    concurrent writers are OUT OF CONTRACT (they would share one
    delta dir mid-write) — that exclusion is what Spark's checkpoint
    lock provides per query, documented in ledger.py."""
    rng = random.Random(seed)
    base = str(tmp_path / f"two_writers_{seed}")
    first = spark.createDataFrame([(0, 0)], "id long, val long")
    for name, df in _tables_fn(first).items():
        df.write.mode("overwrite").parquet(os.path.join(base, name))
    model = {0}
    # two independent sink instances — separate factory state, same
    # index directory (what two foreachBatch queries would hold)
    sink_a = ledger.delta_append_sink(base, _tables_fn)
    sink_b = ledger.delta_append_sink(base, _tables_fn)
    next_a, next_b = 2, 1  # A: even ids, B: odd ids

    def batch(i):
        return spark.createDataFrame([(i, i * 10)], "id long, val long")

    for _ in range(16):
        op = rng.choice(
            ["a_append", "b_append", "a_replay", "b_partial",
             "compact", "inflight_compact"]
        )
        if op == "a_append":
            sink_a(batch(next_a), next_a)
            model.add(next_a)
            next_a += 2
        elif op == "b_append":
            sink_b(batch(next_b), next_b)
            model.add(next_b)
            next_b += 2
        elif op == "a_replay":
            evens = [i for i in model if i and i % 2 == 0]
            if evens:
                i = rng.choice(evens)
                sink_a(batch(i), i)  # must no-op, folded or live
        elif op == "b_partial":
            # B crashes mid-append, then its replay completes it
            d = os.path.join(base, "delta", f"b{next_b}")
            os.makedirs(os.path.join(d, "alpha"), exist_ok=True)
            sink_b(batch(next_b), next_b)
            model.add(next_b)
            next_b += 2
        elif op == "compact":
            ledger.compact_delta_index(spark, base, TABLES)
        elif op == "inflight_compact":
            # A is mid-append (delta dir exists, no _SUCCESS yet) when
            # the compactor runs: the unmarked dir must survive, NOT
            # fold, and A's completion afterwards must commit it
            d = os.path.join(base, "delta", f"b{next_a}")
            os.makedirs(os.path.join(d, "alpha"), exist_ok=True)
            ledger.compact_delta_index(spark, base, TABLES)
            assert os.path.isdir(d), "compactor deleted in-flight append"
            assert f"b{next_a}" not in ledger.read_ledger(base)
            sink_a(batch(next_a), next_a)
            model.add(next_a)
            next_a += 2
        _check(spark, base, model)

    ledger.compact_delta_index(spark, base, TABLES)
    _check(spark, base, model)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
