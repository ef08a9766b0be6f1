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
