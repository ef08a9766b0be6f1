"""Advanced streaming semantics: watermark late-data drop across
micro-batches (T4), sliding windows through a real stream (T2)."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.streaming import (
    jobs,
)

BASE = dt.datetime(2024, 3, 1, 10, 0, 0)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, v double").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_stream(spark, src, sink, ckpt):
    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("window.start").alias("wstart"), "n")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_t4_watermark_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1: one event per minute for an hour (10:00..10:59)
    _write_events(
        spark, src, [(BASE + dt.timedelta(minutes=m), 1.0) for m in range(60)]
    )
    _run_stream(spark, src, sink, ckpt)

    # batch 2: one LATE event (10:05 — far below the 10:49 watermark)
    # and one fresh event (11:30) that advances the watermark
    _write_events(
        spark,
        src,
        [
            (BASE + dt.timedelta(minutes=5), 100.0),
            (BASE + dt.timedelta(minutes=90), 1.0),
        ],
    )
    _run_stream(spark, src, sink, ckpt)

    out = spark.read.parquet(sink)
    by_window = {r["wstart"]: r["n"] for r in out.collect()}
    w0 = int(BASE.timestamp())
    # the 10:00-10:10 window emitted exactly 10 events — the late
    # arrival was dropped, not appended as an update
    assert by_window[w0] == 10
    # no window ever counts the late event: totals == on-time events
    emitted = sum(by_window.values())
    assert emitted <= 61  # 60 on-time + possibly the 11:30 one, never 62
    # windows are emitted exactly once (append mode invariant)
    assert out.groupBy("wstart").count().filter("count > 1").count() == 0


def test_rate_source_smoke(spark):
    """Non-file streaming source (rate): true unbounded input driven
    for one short processing-time window, then stopped — verifies the
    engine's transformations run on a live source, not just backfill."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
    )
    agg = stream.groupBy().agg(
        F.count("*").alias("n"), F.max("value").alias("mx")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("rate_out")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            time.sleep(1)
            rows = spark.sql("SELECT * FROM rate_out").collect()
            if rows and rows[0]["n"] and rows[0]["n"] > 0:
                n = rows[0]["n"]
                break
        assert n > 0
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join (click→purchase within 1 h per
    user) equals the batch twin on the same input. State on both sides
    is bounded by the watermark + interval condition."""
    src = str(tmp_path / "ss_src")
    rows = []
    for u in range(5):
        for m in range(0, 120, 7):
            rows.append((BASE + dt.timedelta(minutes=m + u), float(u), u, "click"))
        for m in range(3, 120, 13):
            rows.append((BASE + dt.timedelta(minutes=m + u), float(u), u, "purchase"))
    df_rows = [(i, ts, v, u, et) for i, (ts, v, u, et) in enumerate(rows)]
    schema = "event_id long, ts timestamp, value double, user_id long, event_type string"
    spark.createDataFrame(df_rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        buys,
        (clicks.user_id == buys.p_user)
        & (buys.p_ts >= clicks.c_ts)
        & (buys.p_ts < clicks.c_ts + F.expr("INTERVAL 1 HOUR")),
    ).select("click_id", "purchase_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM ss_out").collect())

    batch = spark.read.parquet(src)
    bc = batch.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    bp = batch.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    want = sorted(
        tuple(r)
        for r in bc.join(
            bp,
            (bc.user_id == bp.p_user)
            & (bp.p_ts >= bc.c_ts)
            & (bp.p_ts < bc.c_ts + F.expr("INTERVAL 1 HOUR")),
        )
        .select("click_id", "purchase_id")
        .collect()
    )
    assert got == want and len(got) > 0


def test_t9_jobs_stream_stream_join_equals_registered_twin(spark, tmp_path):
    """The REGISTERED t9_stream_stream_join twin and a real two-stream
    watermarked run of the same jobs.stream_stream_join function must
    produce identical rows on the sf0.001 events feed — the oracle the
    driver hash-checks is exactly what the streaming job computes."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.streaming_batch import (
        t9_stream_stream_join,
    )

    sf_dir = "/root/testdata/sf0.001"
    want = sorted(tuple(r) for r in t9_stream_stream_join(spark, sf_dir).collect())

    # the streaming file source needs a directory, not a single file
    import shutil

    feed = tmp_path / "t9_feed"
    feed.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", feed / "part-0.parquet")
    stream = jobs.read_events_stream(spark, str(feed))
    joined = jobs.stream_stream_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    jobs.run_available_now(joined, "t9_out", "append")
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM t9_out").collect())
    assert got == want and len(got) > 0


def test_incremental_moment_stats_equal_batch_pca(spark, tmp_path):
    """Sufficient-statistics maintenance: feeding the embedding corpus
    through moment_stats_sink in 3 micro-batches must leave a moment
    snapshot whose merged statistics match a one-shot batch
    moment_partials run (~1e-9 relative — float summation order is the
    only difference), and whose centered-gram power iteration lands on
    the IDENTICAL 1e-4 component bands as the registered batch
    emb_pca_power_banded query — incremental maintenance changes
    nothing the consumer can see."""
    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        linalg,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.staged_r06 import (
        _PCA_GRID,
        _PCA_ROUNDS,
        emb_pca_power_banded,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 3 files -> 3 micro-batches (maxFilesPerTrigger=1)
    feed = tmp_path / "emb_feed"
    for b in range(3):
        emb.filter(SF.col("vec_id") % 3 == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    stats_dir = str(tmp_path / "moments")
    jobs.run_moment_stats(stream, stats_dir)

    import os

    versions = sorted(os.listdir(stats_dir), key=lambda d: int(d[1:]))
    assert len(versions) >= 1  # stale versions pruned to the latest
    snap = spark.read.parquet(os.path.join(stats_dir, versions[-1]))

    want = {
        (r.i, r.j): r.s for r in linalg.moment_partials(emb).collect()
    }
    got = {(r.i, r.j): r.s for r in snap.collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) <= 1e-9 * max(1.0, abs(v))

    pc_stream = {
        r.j: int(r.band)
        for r in linalg.power_iteration(
            linalg.centered_gram(snap), _PCA_ROUNDS
        )
        .select("j", SF.floor(SF.col("vj") * _PCA_GRID).alias("band"))
        .collect()
    }
    pc_batch = {
        r.dim: r.comp_band for r in emb_pca_power_banded(spark, sf_dir).collect()
    }
    assert pc_stream == pc_batch


def test_moment_stats_restart_is_exactly_once(spark, tmp_path):
    """The moment merge is a SUM (not idempotent), so restart safety
    comes from the checkpoint: run over 2 files, land a 3rd, restart
    with the SAME checkpoint — only the new file may be added, and the
    final snapshot must equal a one-shot batch run over all 3 files
    (exact: the per-file partials are identical either way)."""
    import os

    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        linalg,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feed = tmp_path / "emb_feed_ckpt"
    for b in range(2):
        emb.filter(SF.col("vec_id") % 3 == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))

    def stream():
        return (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )

    stats_dir = str(tmp_path / "moments_ckpt")
    ckpt = str(tmp_path / "ckpt")
    jobs.run_moment_stats(stream(), stats_dir, checkpoint=ckpt)
    emb.filter(SF.col("vec_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(str(feed))
    jobs.run_moment_stats(stream(), stats_dir, checkpoint=ckpt)

    versions = sorted(os.listdir(stats_dir), key=lambda d: int(d[1:]))
    snap = spark.read.parquet(os.path.join(stats_dir, versions[-1]))
    got = {(r.i, r.j): r.s for r in snap.collect()}
    want = {(r.i, r.j): r.s for r in linalg.moment_partials(emb).collect()}
    assert set(got) == set(want)
    # count row is integer-exact: a re-added batch would overshoot it
    assert got[(-1, -1)] == want[(-1, -1)]
    for k, v in want.items():
        assert abs(got[k] - v) <= 1e-9 * max(1.0, abs(v))


def test_t2_sliding_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src2")
    os.makedirs(src)
    rows = [(BASE + dt.timedelta(minutes=3 * m), float(m)) for m in range(40)]
    _write_events(spark, src, rows)

    stream = spark.readStream.schema("ts timestamp, v double").parquet(src)
    sliding = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s"))
        .select(F.unix_timestamp("window.start").alias("wstart"), "n", "s")
    )
    jobs.run_available_now(sliding, "t2_out", "complete")
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM t2_out").collect())

    batch = spark.createDataFrame(rows, "ts timestamp, v double")
    want = sorted(
        tuple(r)
        for r in (
            batch.groupBy(F.window("ts", "10 minutes", "5 minutes"))
            .agg(F.count("*").alias("n"), F.round(F.sum("v"), 2).alias("s"))
            .select(F.unix_timestamp("window.start").alias("wstart"), "n", "s")
        ).collect()
    )
    assert got == want
    # sliding invariant: every event lands in exactly width/slide windows
    assert sum(n for _, n, _ in got) == 2 * len(rows)


def test_streaming_merge_upsert_equals_batch(spark, tmp_path):
    """A change feed streamed one file per micro-batch through the
    foreachBatch MERGE sink must converge to the same latest-state
    snapshot as one batch window over the full feed — regardless of
    file arrival order."""
    import os

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )

    sf = "/root/testdata/sf0.001"
    orders = catalog.load(spark, sf, "orders")
    feed_dir = str(tmp_path / "feed")
    # split the feed into 3 files (3 micro-batches at maxFilesPerTrigger=1)
    orders.withColumn(
        "part", (F.col("o_orderkey") % 3).cast("int")
    ).repartition("part").write.partitionBy("part").parquet(feed_dir)

    snap_dir = str(tmp_path / "snapshot")
    stream = jobs.read_orders_stream(spark, feed_dir + "/part=*")
    jobs.run_merge_upsert(
        stream, snap_dir, "o_custkey", "o_orderdate", "o_orderkey"
    )

    versions = sorted(os.listdir(snap_dir), key=lambda d: int(d[1:]))
    assert len(versions) <= 2, "stale snapshot versions must be pruned"
    got = {
        r["o_custkey"]: (r["o_orderkey"], r["o_orderstatus"])
        for r in spark.read.parquet(
            os.path.join(snap_dir, versions[-1])
        ).collect()
    }

    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    want = {
        r["o_custkey"]: (r["o_orderkey"], r["o_orderstatus"])
        for r in orders.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want and len(got) > 0


def test_incremental_sketch_rollup_across_batches(spark, tmp_path, events_dir=None):
    """foreachBatch sketch rollup: two micro-batches over overlapping
    id sets must merge to the batch-exact distinct counts (sparse-
    regime HLL is exact), proving the union-across-batches is real
    sketch algebra, not double counting."""
    import shutil

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.streaming import (
        jobs,
    )

    src = tmp_path / "ev_in"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "a.parquet")
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "b.parquet")
    base = str(tmp_path / "rollup")

    footer = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(footer)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    jobs.run_sketch_rollup(stream, base, "event_type", "user_id")

    import os

    versions = sorted(os.listdir(base), key=lambda d: int(d[1:]))
    assert len(versions) >= 1  # stale versions pruned to latest two
    final = spark.read.parquet(os.path.join(base, versions[-1]))
    got = {
        r["event_type"]: r["n"]
        for r in final.select(
            "event_type",
            F.hll_sketch_estimate("hll").cast("long").alias("n"),
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in catalog.load(spark, "/root/testdata/sf0.001", "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_incremental_dedup_stream_equals_batch(spark, tmp_path):
    """Incoming documents streamed one file per micro-batch, deduped
    per batch against a PERSISTED MinHash index (postings + hashed
    shingles written as tables, read back — never recomputed), must
    produce exactly the pairs the one-shot batch operator finds."""
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import (
        catalog,
    )
    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        dedup,
    )

    sf = "/root/testdata/sf0.001"
    d = catalog.load(spark, sf, "documents")
    tri = lambda c: dedup.word_ngrams(c, 3)  # noqa: E731
    corpus = d.filter(F.col("doc_id") < 150)
    batch = d.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 250))

    # persist the index as tables — the thing a production pipeline
    # maintains incrementally
    postings_dir = str(tmp_path / "postings")
    shingles_dir = str(tmp_path / "shingles")
    p, sh = dedup.minhash_index(corpus, shingle_fn=tri)
    p.write.parquet(postings_dir)
    sh.write.parquet(shingles_dir)
    postings = spark.read.parquet(postings_dir)
    shingles = spark.read.parquet(shingles_dir)

    # batch twin
    want = {
        (r.new_id, r.corpus_id)
        for r in dedup.minhash_dedup_incremental(
            batch, postings, shingles, threshold=0.3, shingle_fn=tri
        ).collect()
    }

    # stream the batch in 3 files; dedup each micro-batch in
    # foreachBatch against the static index
    feed_dir = str(tmp_path / "feed")
    batch.select("doc_id", "text").withColumn(
        "part", (F.col("doc_id") % 3).cast("int")
    ).repartition("part").write.partitionBy("part").parquet(feed_dir)
    out_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def dedup_batch(bdf, _bid):
        dedup.minhash_dedup_incremental(
            bdf, postings, shingles, threshold=0.3, shingle_fn=tri
        ).write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir + "/part=*")
    )
    q = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == want and len(want) > 0


def test_versioned_sinks_skip_replayed_batches(spark, tmp_path):
    """foreachBatch is at-least-once: delivering the SAME batch_id
    twice (crash between snapshot write and checkpoint commit) must be
    a no-op on the second delivery — for the moment sink (whose SUM
    merge would otherwise double-count) and for the upsert/sketch
    sinks (which would otherwise overwrite the snapshot directory they
    are reading)."""
    import os

    import pyspark.sql.functions as SF

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half = emb.filter(SF.col("vec_id") % 2 == 0)

    base = str(tmp_path / "replay_moments")
    sink = jobs.moment_stats_sink(base)
    sink(half, 0)
    snap1 = {
        (r.i, r.j): r.s
        for r in spark.read.parquet(os.path.join(base, "v0")).collect()
    }
    sink(half, 0)  # replay of the same batch id: must not double-add
    snap2 = {
        (r.i, r.j): r.s
        for r in spark.read.parquet(os.path.join(base, "v0")).collect()
    }
    assert snap2 == snap1
    assert snap2[(-1, -1)] == half.count()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(50)
    ubase = str(tmp_path / "replay_upsert")
    usink = jobs.merge_upsert_sink(ubase, "user_id", "ts", "event_id")
    usink(ev, 0)
    n1 = spark.read.parquet(os.path.join(ubase, "v0")).count()
    usink(ev, 0)  # would self-read-overwrite without the guard
    assert spark.read.parquet(os.path.join(ubase, "v0")).count() == n1


def test_snapshot_guard_partial_version_is_redone(spark, tmp_path):
    """ADVICE r05: a crash mid-write leaves a v{batch_id} directory
    WITHOUT Spark's _SUCCESS marker. The guard must NOT treat it as
    committed — the re-delivered batch re-applies (partial dir
    deleted), and later batches must never merge onto a partial
    snapshot as their base."""
    import os

    import pyspark.sql.functions as SF

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b0 = emb.filter(SF.col("vec_id") % 2 == 0)
    b1 = emb.filter(SF.col("vec_id") % 2 == 1)

    base = str(tmp_path / "partial_moments")
    sink = jobs.moment_stats_sink(base)
    sink(b0, 0)

    # simulate the crash: v1 exists but has no _SUCCESS (partial write)
    partial = os.path.join(base, "v1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "w") as fh:
        fh.write("garbage")

    sink(b1, 1)  # redelivery: must delete the partial dir and re-apply
    assert os.path.exists(os.path.join(base, "v1", "_SUCCESS"))
    snap = {
        (r.i, r.j): r.s
        for r in spark.read.parquet(os.path.join(base, "v1")).collect()
    }
    assert snap[(-1, -1)] == emb.count()  # both batches counted once

    # and a partial LATEST version must not become the next base:
    # batch 2 sees v1 (committed) as base even if a partial v2 exists
    partial2 = os.path.join(base, "v2")
    os.makedirs(partial2)
    b2 = emb.limit(0)
    sink(b2, 2)
    snap2 = {
        (r.i, r.j): r.s
        for r in spark.read.parquet(os.path.join(base, "v2")).collect()
    }
    assert snap2 == snap


def test_quantile_sketch_stream_and_restart(spark, tmp_path):
    """KLL quantile maintenance (VERDICT r06 item 8): feed orders
    through quantile_sketch_sink over a real availableNow stream, then
    land a new file and RESTART with the same checkpoint. Invariants:
    the snapshot's n is integer-exact vs the full corpus at both
    points (the exactly-once witness — KLL's n is exact even though
    quantiles are approximate), and every probe quantile estimate sits
    within the generous ±0.05 rank band of the exact percentile."""
    import os

    import pyspark.sql.functions as SF

    sf_dir = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    feed = tmp_path / "ord_feed"
    for b in range(2):
        orders.filter(SF.col("o_orderkey") % 3 == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))

    def stream():
        return (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )

    sink_dir = str(tmp_path / "kll_snap")
    ckpt = str(tmp_path / "kll_ckpt")
    jobs.run_quantile_sketch(stream(), sink_dir, "o_totalprice", checkpoint=ckpt)

    def check(df_expected):
        versions = sorted(os.listdir(sink_dir), key=lambda d: int(d[1:]))
        snap = spark.read.parquet(os.path.join(sink_dir, versions[-1]))
        vals = sorted(r.o_totalprice for r in df_expected.collect())
        n = len(vals)
        row = snap.select(
            "n",
            *[
                SF.kll_sketch_get_quantile_double("kll", SF.lit(q)).alias(
                    f"q{int(q * 100)}"
                )
                for q in (0.25, 0.5, 0.9)
            ],
        ).collect()[0]
        assert int(row["n"]) == n
        for q in (0.25, 0.5, 0.9):
            lo = vals[max(0, int((q - 0.05) * (n - 1)))]
            hi = vals[min(n - 1, int((q + 0.05) * (n - 1)) + 1)]
            assert lo <= row[f"q{int(q * 100)}"] <= hi

    check(orders.filter(SF.col("o_orderkey") % 3 != 2))

    # land a third file; SAME checkpoint — only the new file is added
    orders.filter(SF.col("o_orderkey") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(str(feed))
    jobs.run_quantile_sketch(stream(), sink_dir, "o_totalprice", checkpoint=ckpt)
    check(orders)


def test_embdedup_index_streaming_append_equals_batch(spark, tmp_path):
    """The embedding-dedup index stays correct under a REAL stream:
    feeding the odd vectors through embdedup_index_append via
    availableNow micro-batches yields the same probe pairs as the
    one-shot batch append (foreachBatch batch_ids differ from the
    direct-call test, so this also exercises multi-delta resolution
    under engine-assigned ids)."""
    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        similarity,
    )

    sf_dir = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = e.filter(SF.col("vec_id") < 100)
    rest = e.filter(SF.col("vec_id") % 2 == 1)

    # one-shot twin
    one = str(tmp_path / "ed_batch")
    similarity.embdedup_index_build(e.filter(SF.col("vec_id") % 2 == 0), one)
    similarity.embdedup_index_append(one)(rest, 0)
    truth = sorted(
        tuple(r)
        for r in similarity.embdedup_index_probe(
            probe, one, threshold=0.35
        ).collect()
    )
    assert truth

    # streamed: 2 files -> 2 availableNow micro-batches
    feed = tmp_path / "ed_feed"
    for b in (1, 3):
        rest.filter(SF.col("vec_id") % 4 == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))
    inc = str(tmp_path / "ed_stream")
    similarity.embdedup_index_build(e.filter(SF.col("vec_id") % 2 == 0), inc)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(similarity.embdedup_index_append(inc))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in similarity.embdedup_index_probe(
            probe, inc, threshold=0.35
        ).collect()
    )
    assert got == truth


def test_t10_jobs_stream_asof_join_equals_registered_twin(spark, tmp_path):
    """T10: a real two-stream watermarked run of jobs.stream_asof_join
    (interval join chained into the finalizing window aggregation —
    two stateful operators) must equal the registered batch twin. The
    feed gets a far-future SENTINEL view+purchase with non-matching
    user ids: they join nothing, but their event times push the final
    watermark past every real window so append mode emits all
    per-purchase state (the no-data micro-batch flushes it)."""
    import shutil

    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.streaming_batch import (
        t10_stream_asof_join,
    )

    sf_dir = "/root/testdata/sf0.001"
    want = sorted(
        tuple(r) for r in t10_stream_asof_join(spark, sf_dir).collect()
    )

    feed = tmp_path / "t10_feed"
    feed.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", feed / "part-0.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    far = ev.agg(SF.max("ts").alias("m")).select(
        SF.lit(-1).cast(ev.schema["event_id"].dataType).alias("event_id"),
        (SF.col("m") + SF.expr("INTERVAL 2 HOURS")).alias("ts"),
        SF.lit(-1).cast(ev.schema["user_id"].dataType).alias("user_id"),
        SF.lit("view").alias("event_type"),
        SF.lit(0.0).alias("value"),
        SF.lit(None).cast(ev.schema["props"].dataType).alias("props"),
    ).unionByName(
        ev.agg(SF.max("ts").alias("m")).select(
            SF.lit(-2).cast(ev.schema["event_id"].dataType).alias("event_id"),
            (SF.col("m") + SF.expr("INTERVAL 2 HOURS")).alias("ts"),
            SF.lit(-2).cast(ev.schema["user_id"].dataType).alias("user_id"),
            SF.lit("purchase").alias("event_type"),
            SF.lit(0.0).alias("value"),
            SF.lit(None).cast(ev.schema["props"].dataType).alias("props"),
        )
    )
    far.select([c.name for c in ev.schema]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "sentinel"))
    for f in (tmp_path / "sentinel").glob("*.parquet"):
        shutil.copy(f, feed / "part-1-sentinel.parquet")

    stream = jobs.read_events_stream(spark, str(feed))
    joined = jobs.stream_asof_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    jobs.run_available_now(joined, "t10_out", "append")
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM t10_out").collect())
    assert got == want and len(got) > 0


def test_t10b_stream_asof_left_outer_equals_registered_twin(spark, tmp_path):
    """T10 left variant: the OUTER interval join chained into the
    finalizing aggregation — unmatched purchases must surface with
    null view columns in the real streaming run exactly as in the
    batch twin (outer-join null rows are emitted at the watermark,
    then finalized by the window agg)."""
    import shutil

    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries.streaming_batch import (
        t10b_stream_asof_left,
    )

    sf_dir = "/root/testdata/sf0.001"
    want = sorted(
        (tuple((x is None, x) for x in r))
        for r in t10b_stream_asof_left(spark, sf_dir).collect()
    )
    # non-vacuity: the corpus must actually contain organic purchases
    assert any(r[2][1] is None for r in want)

    feed = tmp_path / "t10b_feed"
    feed.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", feed / "part-0.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # BOTH sides need a sentinel: the global watermark is the MIN of
    # the two stream watermarks, so a view-only sentinel would leave
    # the purchase watermark at the real max and the final purchase's
    # outer-null row would never evict (found empirically: exactly the
    # last event went missing).
    far = ev.agg(SF.max("ts").alias("m")).select(
        SF.lit(-1).cast(ev.schema["event_id"].dataType).alias("event_id"),
        (SF.col("m") + SF.expr("INTERVAL 2 HOURS")).alias("ts"),
        SF.lit(-1).cast(ev.schema["user_id"].dataType).alias("user_id"),
        SF.lit("view").alias("event_type"),
        SF.lit(0.0).alias("value"),
        SF.lit(None).cast(ev.schema["props"].dataType).alias("props"),
    ).unionByName(
        ev.agg(SF.max("ts").alias("m")).select(
            SF.lit(-2).cast(ev.schema["event_id"].dataType).alias("event_id"),
            (SF.col("m") + SF.expr("INTERVAL 2 HOURS")).alias("ts"),
            SF.lit(-2).cast(ev.schema["user_id"].dataType).alias("user_id"),
            SF.lit("purchase").alias("event_type"),
            SF.lit(0.0).alias("value"),
            SF.lit(None).cast(ev.schema["props"].dataType).alias("props"),
        )
    )
    far.select([c.name for c in ev.schema]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "sentinel_b"))
    for f in (tmp_path / "sentinel_b").glob("*.parquet"):
        shutil.copy(f, feed / "part-1-sentinel.parquet")

    stream = jobs.read_events_stream(spark, str(feed))
    joined = jobs.stream_asof_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    jobs.run_available_now(joined, "t10b_out", "append")
    got = sorted(
        (tuple((x is None, x) for x in r))
        for r in spark.sql(
            "SELECT * FROM t10b_out WHERE purchase_id >= 0"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_hnsw_index_streaming_append_equals_direct(spark, tmp_path):
    """The graph-ANN index stays correct under a REAL stream: feeding
    two append batches through hnsw_index_append via availableNow
    micro-batches yields the same search results as the direct
    two-call sink (HNSW appends are ORDER-dependent — batch 2's
    inserts search a graph already holding batch 1's edges — so the
    twin replays the same splits in the same order; the feed files
    land in that order)."""
    import pyspark.sql.functions as SF

    from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
        similarity,
    )

    sf_dir = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = e.filter(SF.col("vec_id") % 4 != 3)
    q = e.filter(SF.col("vec_id") < 10).withColumnRenamed(
        "vec_id", "query_id"
    )

    direct = str(tmp_path / "hnsw_direct")
    similarity.hnsw_index_build(old, direct)
    sink = similarity.hnsw_index_append(direct)
    sink(e.filter(SF.col("vec_id") % 8 == 3), 0)
    sink(e.filter(SF.col("vec_id") % 8 == 7), 1)
    truth = sorted(
        tuple(r)
        for r in similarity.hnsw_index_search(spark, direct, q, k=5).collect()
    )
    assert truth

    feed = tmp_path / "hnsw_feed"
    for b in (3, 7):
        e.filter(SF.col("vec_id") % 8 == b).coalesce(1).write.mode(
            "append"
        ).parquet(str(feed))
        # FileStreamSource orders batches by mod time; HNSW appends
        # are order-dependent, so same-millisecond writes would make
        # the stream's batch order (and thus the test) flaky
        time.sleep(1.1)
    inc = str(tmp_path / "hnsw_stream")
    similarity.hnsw_index_build(old, inc)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    sq = (
        stream.writeStream.foreachBatch(similarity.hnsw_index_append(inc))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    got = sorted(
        tuple(r)
        for r in similarity.hnsw_index_search(spark, inc, q, k=5).collect()
    )
    assert got == truth
    # appended vectors reachable in the STREAMED index too
    probes = e.filter((SF.col("vec_id") % 4 == 3) & (SF.col("vec_id") < 100)).select(
        (SF.col("vec_id") + 10_000).alias("query_id"), "embedding"
    )
    res = similarity.hnsw_index_search(spark, inc, probes, k=3).collect()
    found = {
        r.query_id - 10_000
        for r in res
        if r.neighbor_id == r.query_id - 10_000 and r.cos_sim == 1.0
    }
    want = {r.vec_id for r in e.filter((SF.col("vec_id") % 4 == 3) & (SF.col("vec_id") < 100)).collect()}
    assert found == want
