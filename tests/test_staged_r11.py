"""Round-8-queue fourth batch: label propagation, WOE/IV screening,
incremental CMS sink. Python replays pin the math; the CMS sink gets
the real-stream + restart + replay-guard treatment the other
versioned sinks have."""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict

from tests.conftest import SF_DIR

KNUTH = 2654435761
M32 = 4294967296


def _portable_bucket(key: int, n: int) -> int:
    km = (key) % M32
    lo = km % 65536
    hi = (km - lo) // 65536
    mixed = ((hi * KNUTH) % M32 * 65536 + lo * KNUTH) % M32
    return mixed % n


def _graph(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey")
    edges = {
        (int(r.o_orderkey) % 200, 200 + int(r.o_orderkey) % 190)
        for r in o.collect()
    }
    both = list(edges) + [(d, s) for s, d in edges]
    return both


def _replay_lpa(edges, seeds, rounds):
    verts = {v for e in edges for v in e}
    lab = {v: seeds.get(v) for v in verts}
    for _ in range(rounds):
        contrib = defaultdict(Counter)
        for s, d in edges:
            if lab.get(s) is not None:
                contrib[d][lab[s]] += 1
        new = {}
        for v in verts:
            if v in seeds:
                new[v] = seeds[v]
            elif contrib[v]:
                # majority, ties -> smallest label
                best = max(contrib[v].items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            else:
                new[v] = None
        lab = new
    return lab


def test_label_propagation_matches_python_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r11 import (
        g_label_propagation,
    )

    rows = g_label_propagation(spark, SF_DIR).collect()
    edges = _graph(spark)
    seeds = {v: v % 4 for v in range(20)}
    want = _replay_lpa(edges, seeds, 3)
    assert len(rows) == len(want)
    for r in rows:
        assert want[r.id] == (r.label if r.label is not None else None), r
    # labels actually spread beyond the seeds
    labeled = sum(1 for r in rows if r.label is not None)
    assert labeled > len(seeds)


def test_label_propagation_clamp_and_tiebreak(spark):
    """Tiny synthetic graph: node 2 hears labels {0 (from seed 0),
    1 (from seed 1)} with equal counts -> tie breaks to 0; seed labels
    never change even when neighbors disagree."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 3), (3, 0)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0, 1), (1, 0)], ["vid", "lab"])
    out = {
        r.id: r.label
        for r in label_propagation(edges, seeds, iterations=3).collect()
    }
    assert out[0] == 1 and out[1] == 0  # clamped
    assert out[2] == 0  # tie {1:1, 0:1} -> smallest label
    assert out[3] == 0  # from node 2's round-1 label


def test_woe_iv_matches_replay(spark):
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r11 import (
        a_woe_iv,
    )

    rows = sorted(a_woe_iv(spark, SF_DIR).collect(), key=lambda r: r.bin)
    pdf = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    pos = Counter()
    neg = Counter()
    for t, v in zip(pdf.event_type, pdf.value):
        b = min(max(int(v // 25.0), 0), 19)
        (pos if t == "purchase" else neg)[b] += 1
    tp, tn = sum(pos.values()), sum(neg.values())
    iv = 0.0
    woes = {}
    for b in range(20):
        p = (pos[b] + 0.5) / (tp + 10.0)
        q = (neg[b] + 0.5) / (tn + 10.0)
        woes[b] = math.log(p / q)
        iv += (p - q) * woes[b]
    assert [r.bin for r in rows] == list(range(20))
    for r in rows:
        assert r.n_pos == pos[r.bin] and r.n_neg == neg[r.bin]
        assert abs(r.woe - woes[r.bin]) < 1e-5
        assert abs(r.iv - iv) < 1e-5


def _cells_expected(keys):
    cells = Counter()
    for k in keys:
        for j, seed in enumerate((1000003, 2000029, 3000073)):
            cells[(j, _portable_bucket(k + seed, 64))] += 1
    return cells


def test_cms_sink_stream_and_restart(spark, tmp_path):
    """Feed events.user_id through cms_cells_sink over a real
    availableNow stream, then land a new file and RESTART with the
    same checkpoint. The merged cell table must equal the one-shot
    Python-replayed sketch EXACTLY at both points (integer merge —
    nothing is approximate about the cells), which is simultaneously
    the exactly-once witness and the hash-portability check."""
    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.streaming import (
        jobs,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id"
    )
    feed = tmp_path / "ev_feed"
    for b in range(2):
        ev.filter(SF.col("event_id") % 3 == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))

    def stream():
        return (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )

    sink_dir = str(tmp_path / "cms_snap")
    ckpt = str(tmp_path / "cms_ckpt")
    jobs.run_cms_cells(stream(), sink_dir, "user_id", checkpoint=ckpt)

    def check(df_expected):
        versions = sorted(os.listdir(sink_dir), key=lambda d: int(d[1:]))
        snap = {
            (r.j, r.bucket): r.c
            for r in spark.read.parquet(
                os.path.join(sink_dir, versions[-1])
            ).collect()
        }
        keys = [int(r.user_id) for r in df_expected.collect()]
        assert snap == dict(_cells_expected(keys))

    check(ev.filter(SF.col("event_id") % 3 != 2))

    ev.filter(SF.col("event_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(str(feed))
    jobs.run_cms_cells(stream(), sink_dir, "user_id", checkpoint=ckpt)
    check(ev)


def test_cms_sink_replay_guard(spark, tmp_path):
    """At-least-once delivery: re-applying an already-committed
    batch_id must be a no-op (the SUM merge is not idempotent, so a
    missing guard would double every cell)."""
    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.streaming import (
        jobs,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id"
    )
    base = str(tmp_path / "cms_guard")
    sink = jobs.cms_cells_sink(base, "user_id")
    sink(ev.filter(SF.col("event_id") % 2 == 0), 0)
    sink(ev.filter(SF.col("event_id") % 2 == 1), 1)
    snap = {
        (r.j, r.bucket): r.c
        for r in spark.read.parquet(os.path.join(base, "v1")).collect()
    }
    sink(ev.filter(SF.col("event_id") % 2 == 1), 1)  # replay
    snap2 = {
        (r.j, r.bucket): r.c
        for r in spark.read.parquet(os.path.join(base, "v1")).collect()
    }
    assert snap2 == snap
    keys = [int(r.user_id) for r in ev.collect()]
    assert snap == dict(_cells_expected(keys))


def test_bootstrap_ci_matches_replay(spark):
    """Full Python replay of the Poisson bootstrap: identical hash →
    identical integer weights → identical replicate means; the CI
    order statistics and band-edge gaps are checked too, plus the
    statistical sanity bound SE ≈ sd/sqrt(n)."""
    import math

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r11 import (
        _BOOT_B,
        _BOOT_BAND,
        _BOOT_HI_RANK,
        _BOOT_LO_RANK,
        _BOOT_SEED,
        _BOOT_T,
        _BOOT_W,
        a_bootstrap_ci,
    )

    row = a_bootstrap_ci(spark, SF_DIR).collect()[0]
    pdf = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "value")
        .toPandas()
    )
    n = len(pdf)
    assert row.n == n
    mean = pdf.value.sum() / n
    assert row.mean_band == round(mean * _BOOT_BAND)

    def weight(eid, rep):
        b = _portable_bucket(eid * _BOOT_B + rep + _BOOT_SEED, _BOOT_W)
        for k, t in enumerate(_BOOT_T):
            if b < t:
                return k
        return len(_BOOT_T)

    ms = []
    eids = pdf.event_id.values
    vals = pdf.value.values
    for rep in range(_BOOT_B):
        sw = swv = 0.0
        for eid, v in zip(eids, vals):
            w = weight(int(eid), rep)
            sw += w
            swv += w * v
        ms.append(swv / sw)
    banded = sorted(
        (round(m * _BOOT_BAND), rep) for rep, m in enumerate(ms)
    )
    assert row.ci_lo_band == banded[_BOOT_LO_RANK - 1][0]
    assert row.ci_hi_band == banded[_BOOT_HI_RANK - 1][0]
    mbar = sum(ms) / len(ms)
    se = math.sqrt(sum((m - mbar) ** 2 for m in ms) / (len(ms) - 1))
    assert row.se_band == round(se * _BOOT_BAND)
    # band-edge gaps: ROUND's unstable spots are the HALF-grid points
    # (FLOOR's were the grid points — and the point mean lands exactly
    # ON the grid here, which is why the query uses ROUND): every
    # banded quantity must sit clear of x.5
    for v in (mean, se, *ms):
        frac = (v * _BOOT_BAND) % 1.0
        assert abs(frac - 0.5) > 1e-4, v
    # the percentile CI contains the point mean, and the bootstrap SE
    # is within 3x of the CLT prediction sd/sqrt(n)
    assert row.ci_lo_band <= row.mean_band <= row.ci_hi_band
    clt = pdf.value.std(ddof=1) / math.sqrt(n)
    assert clt / 3 < se < clt * 3


def test_entity_resolution_matches_unionfind_replay(spark):
    """Replay ER in Python with blocking + exact-integer Jaccard +
    UNION-FIND run to FULL convergence — so the test also proves the
    query's 4 bounded min-label rounds reach the fixpoint on this
    graph (cluster minima equal), not just some intermediate state.
    Every synthesized variant must co-cluster with its original."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r11 import (
        j_entity_resolution,
    )

    rows = j_entity_resolution(spark, SF_DIR).collect()
    pdf = (
        spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_partkey", "p_name")
        .toPandas()
    )
    ents = {}
    for k, name in zip(pdf.p_partkey, pdf.p_name):
        k = int(k)
        ents[k] = name.lower().split(" ")
        if k % 4 == 0:
            ents[k + 10_000_000] = ents[k] + [f"zz{k % 7}"]
    blocks = defaultdict(list)
    for i, ws in ents.items():
        blocks[ws[0]].append(i)
    parent = {i: i for i in ents}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for _, ids in blocks.items():
        for ii in range(len(ids)):
            for jj in range(ii + 1, len(ids)):
                a, b = ids[ii], ids[jj]
                sa, sb = set(ents[a]), set(ents[b])
                nc = len(sa & sb)
                if 10 * nc > 6 * (len(sa) + len(sb) - nc):
                    union(a, b)
    want = {i: min(j for j in ents if find(j) == find(i)) for i in ents}
    got = {r.id: (r.cluster_id, r.is_duplicate) for r in rows}
    assert set(got) == set(want)
    for i, cl in want.items():
        assert got[i][0] == cl, (i, got[i], cl)
        assert got[i][1] == (cl != i)
    # every variant resolves onto its original's cluster (append-noise
    # keeps all original tokens: Jaccard = 2/3 > 0.6 by construction)
    variants = [i for i in ents if i >= 10_000_000]
    linked = sum(
        1
        for i in variants
        if want[i] == want[i - 10_000_000] or want[i] < 10_000_000
    )
    assert linked == len(variants), (linked, len(variants))
    # the clustering is non-trivial in both directions: real merging
    # happened (identical 2-word names are genuine duplicates in this
    # small adjective×noun vocabulary) but not one blob — and since
    # every match is within a first-word block, no cluster may span
    # blocks
    n_clusters = len(set(want.values()))
    assert 10 < n_clusters < len(ents), n_clusters
    first = {i: ws[0] for i, ws in ents.items()}
    for i, cl in want.items():
        assert first[i] == first[cl], (i, cl)


def test_textrank_matches_numpy_replay(spark):
    """Replay TextRank in plain Python: same word graph (distinct
    adjacent pairs, symmetric, no self-loops), same 5 damped
    iterations, same 1e-6 banding — band values must match exactly
    and every top-20 rank must sit clear of its band edge."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r11 import (
        text_textrank_keywords,
    )

    rows = text_textrank_keywords(spark, SF_DIR).collect()
    texts = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .toPandas()
        .text
    )
    edges = set()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        for a, b in zip(ws, ws[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
    verts = sorted({a for a, _ in edges})
    deg = Counter(a for a, _ in edges)
    n = len(verts)
    rk = {v: 1.0 / n for v in verts}
    base = (1.0 - 0.85) / n
    inbound = defaultdict(list)
    for a, b in edges:
        inbound[b].append(a)
    for _ in range(5):
        rk = {
            v: base + 0.85 * sum(rk[u] / deg[u] for u in inbound[v])
            for v in verts
        }
    want = sorted(
        ((math.floor(r * 1_000_000), w) for w, r in rk.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    assert [(r.rank_band, r.word) for r in rows] == want
    for w, r in rk.items():
        frac = (r * 1_000_000) % 1.0
        if (math.floor(r * 1_000_000), w) in want:
            assert min(frac, 1.0 - frac) > 1e-3, (w, r)
    # keywords are real words from the corpus, ranked by connectivity:
    # the top word must have above-median degree
    degs = sorted(deg.values())
    assert deg[rows[0].word] >= degs[len(degs) // 2]
