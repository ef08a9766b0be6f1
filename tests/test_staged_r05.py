"""Round-5 queries (queries/staged_r05.py): proven green BEFORE
registration so the round-5 flip (unconditional import + window
rotation) was a mechanical change, not a correctness event. Post-flip
the tests here pin (a) the window placement of the 11 names, (b) the
oracle-margin measurements the banded checks rely on, and (c) the
plan shapes."""

from __future__ import annotations

import math
import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def test_staged_names_registered_and_oracle_backed():
    """Round-5 queries got driver-green CORRECTNESS rows in round 5
    (CORRECTNESS_r05 50/50), so the round-6 rotation moved them OUT
    of the window to free slots for the round-6 queue. They must stay
    registered and oracle-backed (the ledger row remains valid only
    while the query + oracle pair exists unchanged)."""
    import end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries as qpkg

    names = list(qpkg.QUERIES)
    assert names[:50] == qpkg._DRIVER_WINDOW_FIRST
    for staged in (
        "mm_jpeg_decode",
        "g_pagerank_banded",
        "pack_sequences",
        "a_ewma_user_segmented",
        "sim_topk_lsh_recall",
        "sim_topk_ivf_recall",
        "sim_topk_pq_recall",
        "sim_topk_ivfpq_recall",
        "dedup_minhash_checked",
        "emb_random_projection_banded",
        "p_epoch_shuffle",
    ):
        assert staged in qpkg.QUERIES
        assert staged in qpkg.ORACLES


def test_jpeg_corner_pixels_exact_across_id_sweep():
    """mm_jpeg_decode's oracle predicts corner pixels EXACTLY (no ±2
    codec band): flat 8×8-aligned quadrants at q=1 reconstruct to the
    fixture colors with pre-rounding error ≤ 0.17 px. Pin exactness
    across a stride of the full sf0.1 doc_id range so a codec change
    that erodes the margin fails here before it fails registration."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        jpeg,
    )

    for d in range(0, 5000, 83):
        w, h, nc, px = jpeg.decode_jpeg(jpeg._build_jpeg(d))
        assert (w, h, nc) == (16, 16, 3)
        tl = ((d * 37) % 200 + 20, (d * 59) % 200 + 20, (d * 83) % 200 + 20)
        br = (
            (d * 101) % 200 + 20,
            (d * 131) % 200 + 20,
            (d * 151) % 200 + 20,
        )
        assert tuple(int(v) for v in px[0, 0]) == tl, f"doc_id={d}"
        assert tuple(int(v) for v in px[15, 15]) == br, f"doc_id={d}"


def test_pagerank_band_edges_have_margin():
    """g_pagerank_banded quantizes ranks to 1e-6 bands; the oracle
    match is only deterministic if no rank sits near a band edge.
    Re-derive the ranks in numpy (same graph, damping, iterations)
    and assert every rank keeps ≥ 1e-3 band-widths of clearance —
    measured 0.04 at sf0.001/sf0.01, vs ~1e-9 cross-engine float
    noise."""
    import duckdb

    ks = duckdb.sql(
        "SELECT DISTINCT o_orderkey % 200 AS s, 200 + o_orderkey % 190 AS d "
        f"FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchnumpy()
    src = np.concatenate([ks["s"], ks["d"]]).astype(np.int64)
    dst = np.concatenate([ks["d"], ks["s"]]).astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    idx = {int(v): i for i, v in enumerate(nodes)}
    s = np.array([idx[int(v)] for v in src])
    t = np.array([idx[int(v)] for v in dst])
    deg = np.bincount(s, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        contrib = np.zeros(n)
        np.add.at(contrib, t, r[s] / deg[s])
        r = (1.0 - 0.85) / n + 0.85 * contrib
    band = r * 1e6
    dist = np.abs(band - np.round(band))
    assert float(dist.min()) > 1e-3, float(dist.min())


def _duck_oracle(sql: str):
    import duckdb

    conn = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        conn.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return conn.execute(sql).df()


def _norm(df):
    df = df[sorted(df.columns)]
    rows = [
        tuple(
            None
            if v is None or (isinstance(v, float) and math.isnan(v))
            else (round(v, 6) if isinstance(v, float) else v)
            for v in tup
        )
        for tup in df.itertuples(index=False)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def test_staged_queries_match_their_oracles(spark):
    """The same differential check the driver runs (rows + columns +
    order-insensitive values), in-process at sf0.001, for both staged
    queries — local green here is what licenses the round-5 flip."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        staged_r05,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.registry import (
        ORACLES,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.registry import (
        QUERIES as qpkg_queries,
    )

    for name, fn in [
        ("mm_jpeg_decode", staged_r05.mm_jpeg_decode),
        ("g_pagerank_banded", staged_r05.g_pagerank_banded),
        ("pack_sequences", staged_r05.pack_sequences),
        ("a_ewma_user_segmented", staged_r05.a_ewma_user_segmented),
    ] + [
        (n, qpkg_queries[n])
        for n in (
            "sim_topk_lsh_recall",
            "sim_topk_ivf_recall",
            "sim_topk_pq_recall",
            "sim_topk_ivfpq_recall",
            "dedup_minhash_checked",
            "emb_random_projection_banded",
            "p_epoch_shuffle",
        )
    ]:
        sdf = fn(spark, SF_DIR).toPandas()
        ddf = _duck_oracle(ORACLES[name])
        assert len(sdf) == len(ddf), name
        assert sorted(sdf.columns) == sorted(ddf.columns), name
        assert _norm(sdf) == _norm(ddf), name


def test_pack_next_fit_invariants(spark):
    """Next-fit semantics on a hand-built shard, including the
    oversized-document path the corpus never hits: (a) bin totals
    never exceed capacity EXCEPT a singleton oversized doc, which gets
    a bin of its own; (b) bins are consecutive in id order (next-fit
    never reopens a bin); (c) every doc appears exactly once."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators.packing import (
        pack_next_fit,
    )

    rows = [
        # shard 0: 60+30 fit in 100, 50 overflows, 120 oversized, 10
        (0, 1, 60), (0, 2, 30), (0, 3, 50), (0, 4, 120), (0, 5, 10),
        # shard 1: exact-fit boundary (100 == capacity fits)
        (1, 6, 100), (1, 7, 1),
    ]
    df = spark.createDataFrame(rows, "shard long, doc_id long, n_tokens long")
    out = pack_next_fit(df, capacity=100)
    got = {
        r["doc_id"]: (r["shard"], r["bin"], r["n_tokens"])
        for r in out.collect()
    }
    assert len(got) == len(rows)
    # shard 0: [60,30] -> bin0; [50] -> bin1 (would overflow); [120] ->
    # bin2 alone (oversized); [10] -> bin3 (120+10 > 100)
    assert [got[d][1] for d in (1, 2, 3, 4, 5)] == [0, 0, 1, 2, 3]
    # shard 1: exact fit occupies the whole bin; next doc opens a new one
    assert [got[d][1] for d in (6, 7)] == [0, 1]
    # bin totals within capacity except singleton-oversized
    import collections

    totals = collections.defaultdict(list)
    for d, (s, b, t) in got.items():
        totals[(s, b)].append(t)
    for (s, b), toks in totals.items():
        assert sum(toks) <= 100 or len(toks) == 1


def test_staged_plan_shapes(spark):
    """Scale-posture pins for the staged queries (same discipline as
    tests/test_plans.py): (a) the pack_sequences shuffle carries only
    the narrow (shard, doc_id, n_tokens) rows — text must never enter
    an exchange; (b) a_ewma_user_segmented is ONE exchange (the key
    repartition) + a partition-local sort — no global sort, no second
    shuffle; (c) mm_jpeg_decode reads only doc_id from parquet and
    widens the narrow scan across cores."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.plans import (
        explain,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
        staged_r05,
    )

    pack = staged_r05.pack_sequences(spark, SF_DIR)
    plan = explain.physical_plan(pack)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line

    ewma = staged_r05.a_ewma_user_segmented(spark, SF_DIR)
    eplan = explain.physical_plan(ewma)
    assert eplan.count("Exchange") == 1, eplan
    # the sort under mapInPandas is partition-local (global=false)
    assert "Sort [" in eplan and "], false, 0" in eplan, eplan

    jpg = staged_r05.mm_jpeg_decode(spark, SF_DIR)
    assert set(explain.read_schema_columns(jpg)) <= {"doc_id"}
    jplan = explain.physical_plan(jpg)
    assert "RoundRobinPartitioning" in jplan or "Exchange" in jplan, jplan


def test_embedding_lsh_margins_and_recall(spark):
    """dedup_embedding_lsh's banded check is deterministic only while
    (a) no truth cosine sits near the 0.35 threshold (BLAS-vs-fold FP
    noise ~1e-12 must not flip membership) and (b) measured recall
    keeps clearance over the registered 0.85 floor. Pin both at
    sf0.001 — measured margin 4.2e-5, recall 0.9062."""
    from pyspark.sql import functions as F

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        similarity,
    )

    e = catalog.load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 300)
    truth = similarity.cosine_neardup_pairs(
        e.withColumn("__b", F.pmod(F.hash("vec_id"), F.lit(1))),
        "__b",
        threshold=0.35,
    ).collect()
    ts = {(r.id_a, r.id_b) for r in truth}
    # (a) threshold clearance — also check the NEAR-miss side so a
    # pair can't cross INTO the set either
    all_cos = similarity.cosine_neardup_pairs(
        e.withColumn("__b", F.pmod(F.hash("vec_id"), F.lit(1))),
        "__b",
        threshold=0.30,
    ).collect()
    assert min(abs(r.cos_sim - 0.35) for r in all_cos) >= 1e-5
    # (b) recall clearance + exact precision
    emitted = similarity.lsh_neardup_pairs(
        e, threshold=0.35, n_planes=4, n_tables=16
    ).collect()
    es = {(r.id_a, r.id_b) for r in emitted}
    assert es <= ts
    assert len(es & ts) / len(ts) >= 0.88  # registered floor is 0.85


def test_bpe_merge_rounds_greedy_semantics(spark):
    """bpe_merge_rounds must reproduce sequential greedy BPE exactly —
    including the self-adjacent case ("a a a a" merges to "aa aa", run
    parity, never "aa a a") — and per round: winner counts are
    non-increasing and the total adjacent-pair count strictly
    decreases (VERDICT r04 item 4's required property)."""
    import re
    from collections import Counter

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        text as T,
    )

    texts = [
        "a a a a a b",          # odd/even run parity
        "a b a b a b",          # overlapping alternation
        "x a a b y a b",        # mixed runs
        "the fast key order the fast key",
        "single",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    k = 4
    got = sorted(
        tuple(r) for r in T.bpe_merge_rounds(docs, k=k).collect()
    )

    corpus = {
        i: [w for w in re.split(r"\s+", t.lower()) if w]
        for i, t in enumerate(texts)
    }

    def count_pairs(c):
        cnt = Counter()
        for toks in c.values():
            for j in range(len(toks) - 1):
                cnt[(toks[j], toks[j + 1])] += 1
        return cnt

    def apply_merge(c, a, b):
        out = {}
        for d, toks in c.items():
            res, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    res.append(a + " " + b)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            out[d] = res
        return out

    expected = []
    prev_cnt = None
    for r in range(k):
        cnt = count_pairs(corpus)
        total = sum(cnt.values())
        if prev_cnt is not None:
            assert total < prev_total  # strict pair-count reduction
        (a, b), n = sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if prev_cnt is not None:
            assert n <= prev_cnt  # winner counts non-increasing
        expected.append((r + 1, a, b, n))
        corpus = apply_merge(corpus, a, b)
        prev_cnt, prev_total = n, total
    assert got == sorted(expected)


def test_jpeg420_roundtrip_exact_across_id_sweep():
    """mm_jpeg420_decode's oracle predicts corner pixels EXACTLY even
    through 4:2:0 subsampling + restart markers: flat 16×16-aligned
    quadrants stay flat under 2×2 box decimation, so all blocks are
    pure DC at q=1. Pin full-image exactness (not just corners)
    across a stride of the id range, and the restart-marker wire
    format itself."""
    import numpy as np

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        jpeg,
    )

    for d in range(0, 5000, 83):
        payload = jpeg._build_jpeg420(d)
        w, h, nc, px = jpeg.decode_jpeg(payload)
        assert (w, h, nc) == (32, 32, 3)
        tl = ((d * 37) % 200 + 20, (d * 59) % 200 + 20, (d * 83) % 200 + 20)
        br = (
            (d * 101) % 200 + 20,
            (d * 131) % 200 + 20,
            (d * 151) % 200 + 20,
        )
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        img[:16, :16] = tl
        img[16:, 16:] = br
        img[:16, 16:] = (tl[0], br[1], tl[2])
        img[16:, :16] = (br[0], tl[1], br[2])
        assert np.array_equal(px, img), f"doc_id={d}"
        # DRI=1 over 4 MCUs → RST0..RST2 in sequence on the wire
        for m in range(3):
            assert bytes([0xFF, 0xD0 + m]) in payload


def test_jpeg420_rejects_out_of_sequence_restart():
    """The decoder must verify the RSTm modulo-8 sequence — a skipped
    restart interval (truncated scan) is data corruption, not noise."""
    import pytest

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        jpeg,
    )

    payload = bytearray(jpeg._build_jpeg420(7))
    i = payload.index(bytes([0xFF, 0xD1]))
    payload[i + 1] = 0xD3  # RST1 -> RST3
    with pytest.raises(ValueError, match="restart|Huffman|marker"):
        jpeg.decode_jpeg(bytes(payload))


def test_repeated_span_extract_semantics(spark):
    """Span extraction must emit exactly the maximal runs of shared
    5-grams: planted corpus with a known shared sentence yields the
    same spans a sequential Python reference computes."""
    import re
    from collections import defaultdict

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        dedup,
    )

    boiler = "all rights reserved by the example corporation of earth"
    texts = [
        f"alpha beta gamma {boiler} delta epsilon",
        f"{boiler} zeta eta theta iota kappa",
        "totally unique document with no shared content at all here",
        f"prefix words here then {boiler} and also {boiler} again yes",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup.repeated_span_extract(docs, n=5).collect()
    }

    # reference: shared 5-gram positions -> maximal runs
    n = 5
    toks = {
        i: [w for w in re.split(r"\s+", t.lower()) if w]
        for i, t in enumerate(texts)
    }
    gram_docs = defaultdict(set)
    for i, ts in toks.items():
        for p in range(len(ts) - n + 1):
            gram_docs[" ".join(ts[p : p + n])].add(i)
    want = set()
    for i, ts in toks.items():
        shared = [
            p
            for p in range(len(ts) - n + 1)
            if len(gram_docs[" ".join(ts[p : p + n])]) >= 2
        ]
        run = []
        for p in shared + [None]:
            if run and (p is None or p != run[-1] + 1):
                want.add((i, run[0], run[-1] - run[0] + n))
                run = []
            if p is not None:
                run.append(p)
    assert got == want
    assert any(ln >= 9 for (_, _, ln) in got)  # the planted span


def test_repeated_span_cut_semantics(spark):
    """The cut must remove exactly the covered tokens and reassemble
    the remainder in order; unique docs pass through untouched."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        dedup,
    )

    boiler = "all rights reserved by the example corporation of earth"
    texts = [
        f"alpha beta gamma {boiler} delta epsilon",
        f"{boiler} zeta eta theta iota kappa",
        "totally unique document with no shared content at all here",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in dedup.repeated_span_cut(docs, n=5).collect()
    }
    assert got[0] == ("alpha beta gamma delta epsilon", 5, 9)
    assert got[1] == ("zeta eta theta iota kappa", 5, 9)
    assert got[2] == (texts[2], 10, 0)
