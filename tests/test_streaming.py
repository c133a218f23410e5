"""Structured Streaming operators: run real streams with availableNow
triggers into memory sinks, compare against batch twins; sessionize batch
twin vs DuckDB oracle."""

from __future__ import annotations

import pytest

from dream_spark.streaming import events as SE
from tests.conftest import SF_DIR, assert_oracle_match


def test_sessionize_batch_oracle(spark, duck):
    assert_oracle_match(SE.sessionize_batch(spark, SF_DIR), duck, SE.SESSIONIZE_BATCH_SQL)


@pytest.mark.slow
def test_hourly_counts_stream_matches_batch(spark):
    """Stream the events parquet with an availableNow trigger; the closed
    windows must equal the batch hourly aggregation."""
    from dream_spark.operators.relational import events_hourly

    stream = SE.hourly_counts_stream(SE.read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("hourly_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from hourly_sink").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly(spark, SF_DIR).collect()
    }
    assert got == want


@pytest.mark.slow
def test_sessionize_stream_runs(spark):
    """The applyInPandasWithState sessionizer must run end-to-end and emit
    only closed sessions (a subset of the batch sessions, since the final
    open session per user awaits timeout)."""
    stream = SE.sessionize_stream(SE.read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sess_sink").collect()
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in SE.sessionize_batch(spark, SF_DIR).collect()
    }
    assert all(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]) in batch
        for r in got
    )
