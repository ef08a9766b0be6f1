"""Commit-ledger primitives for persisted, incrementally-maintained
indexes (IVF: :mod:`.similarity`; MinHash: :mod:`.dedup`).

Both indexes share one maintenance protocol (the LSM-ish discipline a
100 TB index needs — an object store gives you atomic rename and
nothing else):

- streaming appends land as per-batch DELTA directories, committed by
  a ``_SUCCESS`` marker (no marker = aborted write, redone on replay);
- compaction folds committed deltas into a rewritten base
  (version-then-swap: write ``{table}_new`` + a ``_FOLDED`` manifest,
  commit the fold in the LEDGER, then rename over the old base);
- the ledger doubles as the TOMBSTONE set: a replayed append whose
  batch id is already folded must no-op, and readers skip folded
  delta dirs even if a crash left them on disk.

The ledger append IS the compaction commit point, so it must be
all-or-nothing (ADVICE r06): a buffered in-place append can persist a
PREFIX of the folded ids on a crash — recovery would then roll back
the new base (manifest ⊄ ledger) yet treat those delta dirs as
'already folded' and delete them, permanently losing their rows; a
torn final line can even poison an unrelated batch id. Hence
:func:`append_ledger_atomic`: write the FULL updated ledger to a temp
file, flush+fsync, ``os.rename`` over the real one — POSIX rename is
atomic, so readers see either the old complete ledger or the new
complete ledger, never a prefix.

CONCURRENCY CONTRACT (VERDICT r07 item 6, pinned by
tests/test_ledger_chaos.py::test_two_appenders_disjoint_ids_one_compactor):

- **Appenders**: any number may feed one index concurrently IFF their
  batch-id spaces are DISJOINT — each batch id owns its own
  ``delta/b{id}`` directory, so disjoint writers never touch the same
  path, and the compactor/readers only consume ``_SUCCESS``-committed
  dirs. Within one Spark streaming query, ids are unique by
  checkpoint; TWO queries feeding the same index must namespace their
  ids (e.g. writer-stride or a writer prefix). Two writers REUSING an
  id concurrently are out of contract: they would interleave file
  writes inside one delta dir (Spark's per-checkpoint lock is what
  rules this out in a real deployment).
- **Compactor**: exactly ONE at a time (it owns ``{table}_new`` and
  the roll-forward/back decision). It may freely race appenders: an
  in-flight append (no ``_SUCCESS``) is skipped, never deleted, and
  commits normally afterwards; an append committing after the
  compactor lists its fold set simply stays live for the next fold.
- **Readers**: unrestricted (resolve_delta_tables is read-only).
"""

from __future__ import annotations

import os

LEDGER_NAME = "compacted_deltas.txt"


def read_ledger(base_dir: str) -> set:
    """Batch ids already folded into the base by compaction — the
    commit manifest readers consult to skip folded delta dirs and
    appends consult as the tombstone set."""
    path = os.path.join(base_dir, LEDGER_NAME)
    if not os.path.isfile(path):
        return set()
    with open(path) as fh:
        return set(fh.read().split())


def append_ledger_atomic(base_dir: str, ids) -> None:
    """Atomically commit ``ids`` to the ledger (temp + fsync + rename;
    see module docstring for why in-place append is a data-loss bug)."""
    path = os.path.join(base_dir, LEDGER_NAME)
    merged = sorted(read_ledger(base_dir) | set(ids))
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(merged) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)


def committed_new(base_dir: str, new_dir: str) -> bool:
    """True iff ``new_dir`` (a ``{table}_new`` versioned rewrite) is
    COMMITTED: its write finished (``_SUCCESS``), its ``_FOLDED``
    manifest exists, and every manifest id is in the ledger (the
    ledger write is the commit point). Used by the writer's recovery
    (roll forward vs roll back) and by read paths resolving a readable
    snapshot WITHOUT mutating the directory."""
    manifest = os.path.join(new_dir, "_FOLDED")
    if not (
        os.path.isdir(new_dir)
        and os.path.exists(os.path.join(new_dir, "_SUCCESS"))
        and os.path.isfile(manifest)
    ):
        return False
    with open(manifest) as fh:
        ids = set(fh.read().split())
    return bool(ids) and ids <= read_ledger(base_dir)


def write_folded_manifest(new_dir: str, ids) -> None:
    """Record which delta ids a ``{table}_new`` rewrite folded — written
    BEFORE the ledger commit so recovery can tell a committed compaction
    (manifest ids ⊆ ledger → roll forward) from a pre-commit crash
    (roll back). Underscore-prefixed files are ignored by parquet
    readers, so the manifest rides along through the rename."""
    with open(os.path.join(new_dir, "_FOLDED"), "w") as fh:
        fh.write("\n".join(ids) + "\n")


# ---------------------------------------------------------------------------
# Generic multi-table delta index (the protocol instantiated by the
# MinHash dedup index — operators/dedup.py — and the BM25 retrieval
# index — operators/textindex.py; the IVF index in similarity.py
# predates this factoring and keeps its own single-table layout with
# identical semantics). Layout:
#
#   {base_dir}/{table}/            per-table base parquet
#   {base_dir}/delta/b{id}/{table} per-batch delta, committed by a
#                                  root _SUCCESS written after ALL
#                                  subtables finish
#   {base_dir}/{table}_new         compaction rewrite (+ _FOLDED)
#   {base_dir}/compacted_deltas.txt the atomic commit ledger
# ---------------------------------------------------------------------------


def resolve_delta_tables(spark, base_dir: str, tables) -> dict:
    """READ-ONLY snapshot resolution: each table as a lazy union of
    base + committed, unfolded deltas. Never mutates the directory
    (ADVICE r06: a reader racing a live compactor must not delete its
    in-flight output): a committed-but-unswapped ``{table}_new``
    already contains the folded deltas, so it is read AS the base;
    ledger-folded delta dirs are skipped either way, so every appended
    row is counted exactly once at any crash point."""
    import os

    folded = read_ledger(base_dir)
    delta_root = os.path.join(base_dir, "delta")
    live = []
    if os.path.isdir(delta_root):
        live = [
            d
            for d in sorted(os.listdir(delta_root))
            if d not in folded
            and os.path.exists(os.path.join(delta_root, d, "_SUCCESS"))
        ]
    out = {}
    for table in tables:
        base_path = os.path.join(base_dir, table)
        new_dir = os.path.join(base_dir, f"{table}_new")
        if committed_new(base_dir, new_dir):
            base_path = new_dir
        df = spark.read.parquet(base_path)
        for d in live:
            df = df.unionByName(
                spark.read.parquet(os.path.join(delta_root, d, table))
            )
        out[table] = df
    return out


def delta_append_sink(base_dir: str, tables_fn):
    """foreachBatch sink factory: ``tables_fn(batch_df) -> {table:
    DataFrame}`` computes the batch's contribution to every subtable;
    the batch lands as ``delta/b{batch_id}`` with the root ``_SUCCESS``
    written only after all subtable writes finish (a crash between
    them leaves an uncommitted delta the replay overwrites —
    at-least-once → exactly-once). A batch id already in the ledger
    was folded into the base: the tombstone check makes its replay a
    no-op instead of a double-insert."""
    import os
    import shutil

    def apply(batch_df, batch_id: int) -> None:
        delta = os.path.join(base_dir, "delta", f"b{batch_id}")
        marker = os.path.join(delta, "_SUCCESS")
        if os.path.isdir(delta):
            if os.path.exists(marker):
                return  # committed append — replay no-ops
            shutil.rmtree(delta, ignore_errors=True)  # aborted — redo
        if f"b{batch_id}" in read_ledger(base_dir):
            return  # folded into base by compaction
        for name, df in tables_fn(batch_df).items():
            df.write.mode("overwrite").parquet(os.path.join(delta, name))
        with open(marker, "w"):
            pass

    return apply


def recover_delta_index(base_dir: str, tables) -> None:
    """Finish or roll back an interrupted compaction — DESTRUCTIVE,
    writer-only (the compactor calls it; read paths use
    resolve_delta_tables). All subtables commit under ONE ledger
    write, so recovery decides once and applies per table: committed
    ``{table}_new`` → roll the swap forward; uncommitted → delete it
    (base + deltas stay authoritative). Folded delta dirs are removed;
    unmarked (no ``_SUCCESS``) dirs are left for the append sink's
    replay — they may be an in-flight append mid-write."""
    import os
    import shutil

    for table in tables:
        new_dir = os.path.join(base_dir, f"{table}_new")
        if os.path.isdir(new_dir):
            if committed_new(base_dir, new_dir):
                swap_forward(base_dir, table)
            else:
                shutil.rmtree(new_dir, ignore_errors=True)
        aside = os.path.join(base_dir, f"{table}_old")
        if os.path.isdir(aside) and os.path.isdir(
            os.path.join(base_dir, table)
        ):
            shutil.rmtree(aside, ignore_errors=True)
    folded = read_ledger(base_dir)
    delta_root = os.path.join(base_dir, "delta")
    if os.path.isdir(delta_root):
        live = [d for d in sorted(os.listdir(delta_root)) if d not in folded]
        for d in os.listdir(delta_root):
            if d in folded:
                shutil.rmtree(os.path.join(delta_root, d), ignore_errors=True)
        if not live:
            shutil.rmtree(delta_root, ignore_errors=True)


def compact_delta_index(spark, base_dir: str, tables) -> None:
    """Fold accumulated append deltas back into the base layout —
    version-then-swap with ONE atomic commit point for ALL subtables:
    write every ``{table}_new`` (each carrying the ``_FOLDED``
    manifest), commit the folded ids to the ledger atomically, then
    swap each table into place. Read results are identical before and
    after; only the file layout changes (fewer, larger files). Crash-
    recoverable at every step via recover_delta_index; ledger entries
    tombstone folded batch ids so re-delivered appends cannot
    double-insert."""
    import os
    import shutil

    recover_delta_index(base_dir, tables)
    delta_root = os.path.join(base_dir, "delta")
    if not os.path.isdir(delta_root):
        return
    already = read_ledger(base_dir)
    folded = [
        d
        for d in sorted(os.listdir(delta_root))
        # skip already-folded ids (double-fold = permanent duplication)
        # and partial deltas (no root _SUCCESS — possibly an append
        # mid-write; its replay will redo an aborted one)
        if d not in already
        and os.path.exists(os.path.join(delta_root, d, "_SUCCESS"))
    ]
    if not folded:
        if not os.listdir(delta_root):
            shutil.rmtree(delta_root, ignore_errors=True)
        return
    for table in tables:
        df = spark.read.parquet(os.path.join(base_dir, table))
        for d in folded:
            df = df.unionByName(
                spark.read.parquet(os.path.join(delta_root, d, table))
            )
        new_dir = os.path.join(base_dir, f"{table}_new")
        df.write.mode("overwrite").parquet(new_dir)
        write_folded_manifest(new_dir, folded)
    # COMMIT POINT: all _new tables fully materialized; one atomic
    # ledger write commits the fold for every subtable, so readers and
    # recovery can never see one table folded and another not.
    append_ledger_atomic(base_dir, folded)
    for table in tables:
        swap_forward(base_dir, table)
    for d in folded:
        shutil.rmtree(os.path.join(delta_root, d), ignore_errors=True)
    if not os.listdir(delta_root):
        shutil.rmtree(delta_root, ignore_errors=True)


def swap_forward(base_dir: str, table: str) -> None:
    """Finish a committed version-then-swap for one table: move the old
    base aside (never delete first), rename ``{table}_new`` into place,
    drop the aside copy. Safe to resume from any crash point when the
    caller has verified the new dir is committed."""
    import shutil

    new_dir = os.path.join(base_dir, f"{table}_new")
    old_dir = os.path.join(base_dir, table)
    aside = os.path.join(base_dir, f"{table}_old")
    if os.path.isdir(new_dir):
        if os.path.isdir(old_dir):
            if os.path.isdir(aside):
                shutil.rmtree(aside)
            os.rename(old_dir, aside)
        os.rename(new_dir, old_dir)
    if os.path.isdir(aside) and os.path.isdir(old_dir):
        shutil.rmtree(aside, ignore_errors=True)
