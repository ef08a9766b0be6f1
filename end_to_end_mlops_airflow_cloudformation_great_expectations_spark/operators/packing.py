"""Cross-document sequence packing — the LLM-training "sample packing"
step: assign whole documents to fixed-token-capacity training
sequences (bins) so batch construction wastes as little padding as
possible.

Distinct from ``text_chunking`` (which splits WITHIN a document): here
documents stay whole and are grouped ACROSS documents into bins. The
classic exact formulations (first-fit-decreasing) are inherently
sequential and driver-hostile, so the distributed shape is
shard-then-pack: hash documents into shards, pack each shard
independently with deterministic NEXT-FIT in id order. Next-fit keeps
only one open bin of state, makes the assignment a pure fold over the
shard's id-ordered (id, tokens) sequence — reproducible across runs,
engines and retries — and is what makes an exact cross-engine oracle
possible (DuckDB replays the identical fold as a recursive walk).

Scale shape (100 TB): only narrow (doc_id, n_tokens) rows enter the
packing shuffle — text NEVER moves; the assignment joins back to the
corpus on doc_id at shard-write time. Per-task state is one shard's id
list, and the shard count is the parallelism/state knob (shards are
independent, so growing the corpus 100x just means 100x shards of the
same bounded size). Packing efficiency stays high because waste is at
most one document's tokens per bin regardless of shard count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def next_fit_bins(toks: np.ndarray, capacity: int) -> np.ndarray:
    """Pure next-fit fold: bin index per element of an ordered token-
    count sequence. One open bin of state; an element that does not
    fit closes it; an oversized element occupies a bin alone.
    Hypothesis-tested invariants in tests/test_properties.py."""
    bins = np.zeros(len(toks), dtype="int64")
    fill = 0
    b = 0
    for i, t in enumerate(toks):
        if i > 0 and fill + t <= capacity:
            fill += t
        else:
            if i > 0:
                b += 1
            fill = int(t)
        bins[i] = b
    return bins


def pack_next_fit(
    df: DataFrame,
    capacity: int,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """Assign each row to a bin by next-fit packing within its shard.

    Rows are processed in ``id_col`` order; a row goes into the
    current bin if its tokens still fit in ``capacity``, otherwise the
    bin is closed and a new one opens (an oversized row gets a bin of
    its own — the caller decides whether to truncate or split such
    documents upstream). Output: one narrow row per input row with the
    bin assignment; grouped-map applyInPandas, one Arrow batch per
    shard.
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        toks = pdf[tok_col].to_numpy(dtype="int64")
        bins = next_fit_bins(toks, capacity)
        return pd.DataFrame(
            {
                shard_col: pdf[shard_col].to_numpy(),
                id_col: pdf[id_col].to_numpy(),
                tok_col: toks,
                "bin": bins,
            }
        )

    return df.select(shard_col, id_col, tok_col).groupBy(shard_col).applyInPandas(
        pack,
        f"{shard_col} long, {id_col} long, {tok_col} long, bin long",
    )
