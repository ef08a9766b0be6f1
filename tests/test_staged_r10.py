"""Round-8-queue third batch: ranking-eval family (ROC-AUC,
calibration, gains/lift), PMI collocations, hybrid RRF retrieval.
Python/numpy replays pin the math against the same parquet fixtures;
oracle equivalence is tools/check.py's job; plan shapes are pinned in
test_plans.py."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from tests.conftest import SF_DIR


def _emb_pdf(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .toPandas()
    )


def _replay_scores(pdf):
    """(vec_id, is_pos, score) replay of the label-0 centroid scorer,
    mirroring the 1e-6 rounding of the centroid then of the cosine."""
    mat = np.array([np.array(e, dtype=np.float64) for e in pdf.embedding])
    pos = pdf.label.values == 0
    cent = np.round(mat[pos].mean(axis=0), 6)
    dots = mat @ cent
    sims = np.round(
        dots / (np.linalg.norm(mat, axis=1) * np.linalg.norm(cent)), 6
    )
    return pdf.vec_id.values, pos.astype(int), sims


def _midrank_auc(is_pos, scores):
    """Tie-corrected AUC via midranks (scipy-free)."""
    order = np.lexsort((np.arange(len(scores)), is_pos, scores))
    ranks = np.empty(len(scores), dtype=np.float64)
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    np_, nn = is_pos.sum(), (1 - is_pos).sum()
    return (ranks[is_pos == 1].sum() - np_ * (np_ + 1) / 2.0) / (np_ * nn)


def test_roc_auc_matches_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r10 import (
        a_roc_auc,
    )

    row = a_roc_auc(spark, SF_DIR).collect()[0]
    _, is_pos, scores = _replay_scores(_emb_pdf(spark))
    assert row.n_pos == int(is_pos.sum())
    assert row.n_neg == int((1 - is_pos).sum())
    want = _midrank_auc(is_pos, scores)
    assert abs(row.auc - want) < 1e-5
    assert abs(row.gini - (2 * want - 1)) < 1e-5
    # the centroid scorer must actually separate its own class (the
    # sf0.001 fixture has only ~5 positives, so the bar is modest)
    assert row.auc > 0.7


def test_roc_auc_is_rank_invariant(spark):
    """AUC must depend only on the ORDER of scores: a monotone
    transform of the replay's scores leaves the replay AUC unchanged
    (guards the midrank formulation against accidental value use)."""
    _, is_pos, scores = _replay_scores(_emb_pdf(spark))
    a1 = _midrank_auc(is_pos, scores)
    a2 = _midrank_auc(is_pos, np.tanh(scores * 3.0))
    assert abs(a1 - a2) < 1e-12


def test_calibration_bins_match_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r10 import (
        a_calibration_bins,
    )

    rows = a_calibration_bins(spark, SF_DIR).collect()
    _, is_pos, scores = _replay_scores(_emb_pdf(spark))
    p = np.round((scores + 1.0) / 2.0, 6)
    bins = np.minimum(np.floor(p * 10).astype(int), 9)
    by_bin = {b: (bins == b) for b in np.unique(bins)}
    assert {r.bin for r in rows} == set(by_bin)
    for r in rows:
        m = by_bin[r.bin]
        assert r.n == int(m.sum())
        assert r.n_pos == int(is_pos[m].sum())
        assert abs(r.avg_p - p[m].mean()) < 1e-5
        assert abs(r.pos_rate - is_pos[m].mean()) < 1e-5
    # partition: bins cover every vector exactly once
    assert sum(r.n for r in rows) == len(p)


def test_gains_deciles_structure(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r10 import (
        a_gains_deciles,
    )

    rows = sorted(a_gains_deciles(spark, SF_DIR).collect(), key=lambda r: r.decile)
    _, is_pos, scores = _replay_scores(_emb_pdf(spark))
    n = len(scores)
    assert [r.decile for r in rows] == list(range(1, 11))
    # NTILE sizes: base/base+1 split
    base, rem = divmod(n, 10)
    assert [r.n for r in rows] == [base + 1] * rem + [base] * (10 - rem)
    # replay the decile assignment on the same total order
    order = np.lexsort((np.arange(n), -scores))  # score desc, vec_id asc
    sizes = [base + 1] * rem + [base] * (10 - rem)
    got_pos, i = [], 0
    for sz in sizes:
        got_pos.append(int(is_pos[order[i : i + sz]].sum()))
        i += sz
    assert [r.n_pos for r in rows] == got_pos
    # cumulative capture is nondecreasing and ends at 1
    caps = [r.cum_capture for r in rows]
    assert all(b >= a for a, b in zip(caps, caps[1:]))
    assert abs(caps[-1] - 1.0) < 1e-9
    # a good scorer front-loads: decile 1 lift far above base rate
    assert rows[0].lift > 2.0


def test_pmi_collocations_match_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r10 import (
        text_pmi_collocations,
    )

    rows = text_pmi_collocations(spark, SF_DIR).collect()
    texts = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .toPandas()
        .text
    )
    uni: Counter = Counter()
    pc: Counter = Counter()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        uni.update(ws)
        pc.update(" ".join(p) for p in zip(ws, ws[1:]))
    tw = float(sum(uni.values()))
    tp = float(sum(pc.values()))
    want = {}
    for pair, cnt in pc.items():
        if cnt >= 5:
            a, b = pair.split(" ")
            want[pair] = (
                cnt,
                round(
                    math.log(
                        (cnt / tp) / ((uni[a] / tw) * (uni[b] / tw))
                    ),
                    6,
                ),
            )
    ranked = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert [(r.pair, r.cnt) for r in rows] == [
        (p, c) for p, (c, _) in ranked
    ]
    for r, (_, (_, pmi)) in zip(rows, ranked):
        assert abs(r.pmi - pmi) < 1e-9
    # PMI of a collocation must exceed independence (0) for the top hits
    assert rows[0].pmi > 0


def test_hybrid_rrf_matches_arm_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.llm import (
        text_bm25,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.registry import (
        QUERIES,
    )

    rows = QUERIES["text_hybrid_rrf"](spark, SF_DIR).collect()
    assert len(rows) == 20
    # replay: lexical ranks from the registered bm25 query itself
    bm = text_bm25(spark, SF_DIR).collect()
    lex_order = sorted(bm, key=lambda r: (-r.bm25, r.doc_id))[:50]
    r_lex = {r.doc_id: i + 1 for i, r in enumerate(lex_order)}
    pdf = _emb_pdf(spark)
    mat = np.array([np.array(e, dtype=np.float64) for e in pdf.embedding])
    q = mat[pdf.vec_id.values == 0][0]
    sims = np.round(
        mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q)), 6
    )
    sem_order = sorted(
        zip(pdf.vec_id.values, sims), key=lambda t: (-t[1], t[0])
    )[:50]
    r_sem = {int(v): i + 1 for i, (v, _) in enumerate(sem_order)}
    fused = {}
    for d in set(r_lex) | set(r_sem):
        fused[d] = round(
            (1.0 / (60 + r_lex[d]) if d in r_lex else 0.0)
            + (1.0 / (60 + r_sem[d]) if d in r_sem else 0.0),
            6,
        )
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.doc_id, r.rrf) for r in rows] == want
    for r in rows:
        assert r.r_lex == r_lex.get(r.doc_id)
        assert r.r_sem == r_sem.get(r.doc_id)
    # the query-by-example doc itself must fuse at rank 1 of the sem arm
    sem_top = [r for r in rows if r.r_sem == 1]
    assert sem_top and sem_top[0].doc_id == 0


def test_conformal_sets_match_replay(spark):
    """Full replay of split-conformal: centroid sims (1e-6 grid),
    calibration order statistic, prediction sets, coverage. Also
    asserts the conformal guarantee holds on the test half."""
    import math

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r10 import (
        a_conformal_sets,
    )

    row = a_conformal_sets(spark, SF_DIR).collect()[0]
    pdf = _emb_pdf(spark)
    mat = np.array([np.array(e, dtype=np.float64) for e in pdf.embedding])
    labels = pdf.label.values
    vecids = pdf.vec_id.values
    cents = {}
    for c in np.unique(labels):
        cents[c] = np.round(mat[labels == c].mean(axis=0), 6)
    sims = {}
    for idx, v in enumerate(vecids):
        for c, cent in cents.items():
            sims[(int(v), int(c))] = round(
                float(
                    mat[idx] @ cent
                    / (np.linalg.norm(mat[idx]) * np.linalg.norm(cent))
                ),
                6,
            )
    calib = sorted(
        (round(1.0 - sims[(int(v), int(l))], 6), int(v))
        for v, l in zip(vecids, labels)
        if v % 2 == 0
    )
    n_calib = len(calib)
    k = math.ceil((n_calib + 1) * 0.9)
    qhat = calib[k - 1][0]
    assert row.n_calib == n_calib
    assert abs(row.qhat - qhat) < 1e-9
    sizes, covered = [], []
    for v, l in zip(vecids, labels):
        if v % 2 != 1:
            continue
        inset = [
            c for c in cents if round(1.0 - sims[(int(v), int(c))], 6) <= qhat
        ]
        sizes.append(len(inset))
        covered.append(int(l) in inset)
    assert row.n_test == len(sizes)
    assert abs(row.avg_set_size - sum(sizes) / len(sizes)) < 1e-6
    cov = sum(covered) / len(covered)
    assert abs(row.coverage - cov) < 1e-6
    # the conformal guarantee (within finite-sample slack): coverage
    # must not fall materially below 1 - alpha
    assert cov >= 0.9 - 2.0 / math.sqrt(len(covered))
    # sets are informative: smaller than the full label set on average
    assert row.avg_set_size < len(cents)
