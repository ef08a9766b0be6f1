"""Round-11 addition pins: BPE induction at depth (k=16, checkpointed
linear plan growth) — VERDICT r10 item 4."""

import re
from collections import Counter

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    text as T,
)
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
    ORACLES,
    QUERIES,
)
from tests.conftest import SF_DIR


def test_round11_names_registered_and_oracle_backed():
    assert "text_bpe_merges_k16" in QUERIES
    assert "text_bpe_merges_k16" in ORACLES


def _greedy_bpe(texts: dict[int, str], k: int):
    """Sequential textbook BPE (count pairs -> (cnt DESC, a, b) winner
    -> greedy left-to-right merge), independent of the engine's window
    formulation."""
    corpus = {
        i: [w for w in re.split(r"\s+", t.lower()) if w]
        for i, t in texts.items()
    }
    merges = []
    for r in range(k):
        cnt = Counter()
        for toks in corpus.values():
            for j in range(len(toks) - 1):
                cnt[(toks[j], toks[j + 1])] += 1
        if not cnt:
            break
        (a, b), n = sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((r + 1, a, b, n))
        nxt = {}
        for d, toks in corpus.items():
            res, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    res.append(a + " " + b)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            nxt[d] = res
        corpus = nxt
    return merges


def test_bpe_k16_matches_sequential_greedy_replay(spark):
    """The 16 checkpointed rounds must reproduce sequential textbook
    BPE merge-for-merge on the real sf0.001 corpus — the depth path
    must not change semantics, only plan shape (the Friedman-lesson
    insurance, applied to the engine-vs-Python axis; the DuckDB twin
    covers the engine-vs-engine axis)."""
    import duckdb

    texts = dict(
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        )
        .fetchall()
    )
    expected = _greedy_bpe(texts, 16)
    got = sorted(
        tuple(r) for r in QUERIES["text_bpe_merges_k16"](spark, SF_DIR).collect()
    )
    assert got == sorted(expected)
    assert len(got) == 16


def test_bpe_checkpoint_rounds_linear_plan_growth(spark):
    """The depth path's reason to exist: the analyzed logical plan must
    grow LINEARLY with k under checkpoint_rounds (the persist path is
    ~3x per round — 38 KB at k=3, 875 KB at k=6, measured). Pin
    per-round plan growth to a constant band so a refactor that loses
    the lineage cut fails here, not at explainString OOM."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )

    docs = catalog.load(spark, SF_DIR, "documents")

    def plan_chars(k: int) -> int:
        df = T.bpe_merge_rounds(docs, k=k, checkpoint_rounds=True)
        return len(df._jdf.queryExecution().analyzed().toString())

    p4, p8, p16 = plan_chars(4), plan_chars(8), plan_chars(16)
    # linear: doubling k roughly doubles the plan (allow 3x headroom);
    # exponential growth would be ~3^4 = 81x per doubling at this depth
    assert p8 < 3 * p4, (p4, p8)
    assert p16 < 3 * p8, (p8, p16)


def test_bpe_checkpoint_rounds_build_jobs_bounded(spark):
    """checkpoint_rounds is the SANCTIONED inherently-iterative
    laziness exception (documented in the operator): finalizing each
    round's checkpoint RDD materializes that round's shuffle stages
    as build-time jobs. Pin the job count to O(k) so a refactor that
    re-executes earlier rounds (losing the lineage cut's caching
    effect) fails here; and pin that the k=3 persist path stays
    FULLY lazy at build."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    docs = catalog.load(spark, SF_DIR, "documents")

    sc.setJobGroup("bpe-persist-probe", "persist build")
    try:
        T.bpe_merge_rounds(docs, k=3)  # default persist path
        persist_jobs = set(tracker.getJobIdsForGroup("bpe-persist-probe") or [])
    finally:
        sc.setJobGroup("", "")
    assert persist_jobs == set(), f"persist build ran jobs: {persist_jobs}"

    k = 6
    sc.setJobGroup("bpe-ckpt-probe", "checkpoint build")
    try:
        T.bpe_merge_rounds(docs, k=k, checkpoint_rounds=True)
        ckpt_jobs = set(tracker.getJobIdsForGroup("bpe-ckpt-probe") or [])
    finally:
        sc.setJobGroup("", "")
    # O(k): a handful of shuffle-stage jobs per round; re-execution of
    # earlier rounds would be quadratic (~k^2/2 extra jobs)
    assert len(ckpt_jobs) <= 4 * k, f"{len(ckpt_jobs)} build jobs for k={k}"


def test_curation_pipeline_replay_and_reconciliation(spark):
    """Full INDEPENDENT Python replay of the composed curation
    pipeline (the third engine next to Spark and DuckDB): sequential
    set operations over the raw parquet rows — union-find for
    components (not min-label rounds), the covered-position SET for
    substring removal (not gaps-and-islands spans), plain loops for
    budget and packing. Every stage's (docs, dropped, tokens, bins)
    must match, and the funnel must reconcile
    (docs[i] + dropped[i] == docs[i-1] at every doc-level rung)."""
    import re

    import duckdb

    got = {
        r.stage_id: (r.stage, r.docs, r.dropped, r.tokens, r.bins)
        for r in QUERIES["p_curation_pipeline"](spark, SF_DIR).collect()
    }
    assert len(got) == 8

    rows = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, source, lang, text FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        .fetchall()
    )
    corpus = {}
    raw_text = {}
    bench_ws = []
    for doc_id, source, lang, text in rows:
        ws = [w for w in re.split(r"\s+", text.lower()) if w]
        if doc_id % 5 < 4:
            corpus[doc_id] = (source, lang, ws)
            raw_text[doc_id] = text
        else:
            bench_ws.append(ws)
    funnel = []
    tok = {i: len(ws) for i, (_, _, ws) in corpus.items()}
    s = sorted(corpus)
    funnel.append((0, "total", len(s), 0, sum(tok[i] for i in s), 0))

    # stage 1: url dedup
    def curl(i):
        src, lang, _ = corpus[i]
        page = i - 20 if (i % 8 == 1 and i >= 20) else i
        url = (
            f"https://{src.upper()}.Example.com/Doc/{page}"
            f"/?utm_lang={lang}&session={i}"
        )
        host = re.match(r"^[a-z]+://([^/?]+)", url).group(1).lower()
        path = re.sub(r"/+$", "", re.match(r"^[a-z]+://[^/?]+([^?]*)", url).group(1))
        return host + path

    first = {}
    for i in s:
        first.setdefault(curl(i), i)
    s1 = sorted(first.values())
    funnel.append((1, "url_dedup", len(s1), len(s) - len(s1),
                   sum(tok[i] for i in s1), 0))

    # stage 2: exact dedup (the engines key on lower(text) verbatim —
    # whitespace runs included, so the raw text is the key, not the
    # token join)
    first = {}
    for i in s1:
        first.setdefault(raw_text[i].lower(), i)
    s2 = sorted(first.values())
    funnel.append((2, "exact_dedup", len(s2), len(s1) - len(s2),
                   sum(tok[i] for i in s2), 0))

    # stage 3: exact-substring removal on the post-exact corpus —
    # covered-position SET form (independent of gaps-and-islands)
    L = 20
    occ = {}
    for i in s2:
        ws = corpus[i][2]
        for pp in range(len(ws) - L + 1):
            occ.setdefault(" ".join(ws[pp:pp + L]), []).append((i, pp))
    covered = {}
    for positions in occ.values():
        for i, pp in sorted(positions)[1:]:  # all but the corpus-first
            covered.setdefault(i, set()).update(range(pp, pp + L))
    kept = {i: tok[i] - len(covered.get(i, set())) for i in s2}
    funnel.append((3, "substring_rewrite", len(s2), 0,
                   sum(kept.values()), 0))

    # stage 4: near-dup bigram jaccard (original text) -> union-find
    import math

    def bigrams(ws):
        return {f"{ws[j]} {ws[j+1]}" for j in range(len(ws) - 1)}

    parent = {i: i for i in s2}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ids = list(s2)
    gs = {i: bigrams(corpus[i][2]) for i in ids}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(gs[a] & gs[b])
            jac = inter / (len(gs[a]) + len(gs[b]) - inter)
            # HALF_UP at 4dp, the engines' shared rounding
            if math.floor(jac * 1e4 + 0.5) / 1e4 >= 0.5:
                union(a, b)
    s4 = sorted(i for i in s2 if find(i) == i)
    funnel.append((4, "neardup_minhash", len(s4), len(s2) - len(s4),
                   sum(kept[i] for i in s4), 0))

    # stage 5: decontaminate (any shared distinct 5-gram with bench)
    def grams5(ws):
        return {" ".join(ws[j:j + 5]) for j in range(len(ws) - 4)}

    probe = set()
    for ws in bench_ws:
        probe |= grams5(ws)
    s5 = sorted(i for i in s4 if not (grams5(corpus[i][2]) & probe))
    funnel.append((5, "decontaminate", len(s5), len(s4) - len(s5),
                   sum(kept[i] for i in s5), 0))

    # stage 6: per-source token budget (doc_id-order prefix)
    s6 = []
    by_src = {}
    for i in s5:
        by_src.setdefault(corpus[i][0], []).append(i)
    for ids6 in by_src.values():
        cum = 0
        for i in sorted(ids6):
            cum += kept[i]
            if cum <= 800:
                s6.append(i)
    s6.sort()
    funnel.append((6, "token_budget", len(s6), len(s5) - len(s6),
                   sum(kept[i] for i in s6), 0))

    # stage 7: next-fit pack (cap 256, shard = doc_id % 8)
    bins_total = 0
    by_shard = {}
    for i in s6:
        by_shard.setdefault(i % 8, []).append(i)
    for ids7 in by_shard.values():
        fill, nbins = 0, 1
        for i in sorted(ids7):
            if fill + kept[i] <= 256:
                fill += kept[i]
            else:
                nbins += 1
                fill = kept[i]
        bins_total += nbins
    funnel.append((7, "pack", len(s6), 0, sum(kept[i] for i in s6),
                   bins_total))

    for sid, stage, d, dr, t, b in funnel:
        assert got[sid] == (stage, d, dr, t, b), (sid, got[sid], (stage, d, dr, t, b))
    # reconciliation at every doc-level rung
    for sid in (1, 2, 4, 5, 6):
        prev = 3 if sid == 4 else sid - 1
        assert got[sid][1] + got[sid][2] == got[prev][1]
    # non-degenerate: every curation rung must actually work
    assert got[1][2] > 0          # url stage drops re-crawls
    assert got[3][3] < got[2][3]  # substring removal shrinks tokens
    assert got[4][2] > 0          # near-dup drops clone clusters
    assert got[5][2] > 0          # decontamination drops leaks
    assert got[6][2] > 0          # budget sampling drops tail docs
    assert got[7][4] > 0          # bins exist
