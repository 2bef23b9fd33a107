"""Structured Streaming: pipeline foreachBatch front-end + windowed ops.

Stream source = parquet file stream over a temp dir (deterministic,
availableNow drains it); results checked against batch equivalents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_api_etl_spark.streaming import (
    run_streaming_pipeline,
    sessionized_stream,
    tumbling_window_stream,
)


@pytest.fixture
def stream_source(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    spark.range(50).select(
        F.col("id").cast("string").alias("tracking_id")
    ).write.parquet(src)
    schema = "tracking_id string"
    return spark.readStream.schema(schema).parquet(src)


def test_streaming_pipeline_foreach_batch(spark, tmp_path, stream_source):
    sink = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    cfg = {
        "endpoint": {
            "method": "GET",
            "url": "http://mock.local/api/things",
            "param_mapping": [{"endpoint_param": "id", "source_column": "request_id"}],
        },
        "transport": {"engine": "mock"},
        "execution": {"num_partitions": 4, "max_concurrent_requests": 8},
        "tables": {"sink": {"location": sink, "format": "parquet"}},
    }
    q = run_streaming_pipeline(
        spark, cfg, stream_source, source_id="tracking_id", checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    bronze = spark.read.parquet(sink)
    assert bronze.count() == 50
    assert bronze.where(F.col("status_code") == 200).count() == 50

    # restart with same checkpoint: no new files -> no new rows (exactly-once
    # source progress)
    q2 = run_streaming_pipeline(
        spark, cfg, stream_source, source_id="tracking_id", checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 50


def _events_stream(spark, sf_dir, tmp_path):
    # re-materialize events (ts normalized) as a file stream source
    from distributed_api_etl_spark.queries.registry import table

    src = str(tmp_path / "events_src")
    # watermarks need TIMESTAMP (LTZ); NTZ->LTZ is the identity under UTC
    ev = table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type", "value"
    )
    ev.write.parquet(src)
    return ev, spark.readStream.schema(ev.schema).parquet(src)


def test_tumbling_window_stream_matches_batch(spark, sf_dir, tmp_path):
    ev, stream = _events_stream(spark, sf_dir, tmp_path)
    out = tumbling_window_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, str(r.window_start)): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    expected = {
        (r.event_type, str(r.window_start)): (r.n_events, r.sum_value)
        for r in tumbling_window_stream.__wrapped__(ev).collect()
    } if hasattr(tumbling_window_stream, "__wrapped__") else None
    # batch equivalent: same expressions on the static frame
    batch = {
        (r.event_type, str(r.window_start)): (r.n_events, r.sum_value)
        for r in tumbling_window_stream(ev).collect()
    }
    assert got == batch
    assert len(got) > 100


def test_sessionized_stream_runs_and_bounds_state(spark, sf_dir, tmp_path):
    _, stream = _events_stream(spark, sf_dir, tmp_path)
    out = sessionized_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    # session integrity: end >= start, positive event counts
    assert all(r.session_end >= r.session_start and r.n_events > 0 for r in rows)
