"""Round-8 additions: the capped semantic-dedup probe (VERDICT r07
item 4) and the bloom_probe duplicate-row contract (ADVICE r07)."""

import os

from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import catalog
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    similarity,
    sketches,
)
from tests.conftest import SF_DIR


def _index(spark, tmp_path):
    e = catalog.load(spark, SF_DIR, "embeddings")
    base = os.path.join(str(tmp_path), "embdedup_topk_idx")
    similarity.embdedup_index_build(e.filter(F.col("vec_id") % 2 == 0), base)
    probe = e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 400))
    return probe, base


def test_probe_topk_is_capped_subset_and_argmax(spark, tmp_path):
    probe, base = _index(spark, tmp_path)
    kw = dict(threshold=0.35)
    full = similarity.embdedup_index_probe(probe, base, **kw).collect()
    cap1 = similarity.embdedup_index_probe_topk(
        probe, base, k=1, **kw
    ).collect()

    assert len(full) > 0, "invariant must be exercised, not vacuous"
    full_set = {(r.new_id, r.corpus_id, r.cos_sim) for r in full}
    per_id = {}
    for r in cap1:
        per_id.setdefault(r.new_id, []).append(r)
        assert (r.new_id, r.corpus_id, r.cos_sim) in full_set
    assert all(len(v) == 1 for v in per_id.values())
    # the kept pair is the exact argmax under (-sim, corpus_id)
    best = {}
    for r in full:
        key = (-round(r.cos_sim * 1e6), r.corpus_id)
        if r.new_id not in best or key < best[r.new_id][0]:
            best[r.new_id] = (key, r.corpus_id)
    assert set(per_id) == set(best)
    for nid, rows in per_id.items():
        assert rows[0].corpus_id == best[nid][1]


def test_probe_topk_k3_is_ordered_prefix(spark, tmp_path):
    probe, base = _index(spark, tmp_path)
    kw = dict(threshold=0.35)
    full = similarity.embdedup_index_probe(probe, base, **kw).collect()
    cap3 = similarity.embdedup_index_probe_topk(
        probe, base, k=3, **kw
    ).collect()
    want = {}
    for r in full:
        want.setdefault(r.new_id, []).append(
            ((-round(r.cos_sim * 1e6), r.corpus_id), r.corpus_id)
        )
    got = {}
    for r in cap3:
        got.setdefault(r.new_id, []).append(r.corpus_id)
    for nid, cands in want.items():
        prefix = [c for _, c in sorted(cands)[:3]]
        assert sorted(got[nid]) == sorted(prefix)


def test_bloom_probe_duplicate_probe_rows_no_false_negative(spark):
    """ADVICE r07: duplicated probe rows (same key AND identical other
    columns) collapse into one group whose counts are a multiple of k;
    the count("hit") == count("*") form must still report membership
    TRUE for genuine members."""
    members = spark.createDataFrame([(7,), (13,)], "k int")
    seeds = (1, 2, 3)
    n_bits = 1 << 12
    bits = sketches.bloom_build(members, "k", seeds, n_bits)
    probes = spark.createDataFrame([(7,), (7,), (13,), (999,)], "k int")
    out = {
        r.k: r.bloom_pos
        for r in sketches.bloom_probe(
            probes, "k", bits, seeds, n_bits
        ).collect()
    }
    assert out[7] is True
    assert out[13] is True
    assert 999 not in out or out[999] in (True, False)  # fp allowed
