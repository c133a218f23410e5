"""Structured Streaming operators over the events stream.

The reference has no streaming at all (SURVEY.md §2.3); this is the
north-star extension built the Spark way: ``readStream`` sources with
watermarked event-time windows, plus a custom stateful sessionizer via
``applyInPandasWithState``.  Batch twins of these aggregations (identical
semantics once windows close) live in operators/relational.py and
``sessionize_batch`` below, which is what the DuckDB oracle checks — the
streaming runtime itself is exercised by tests with an availableNow trigger.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dream_spark.functions.timeutils import epoch_micros
from dream_spark.sources.tables import load_table

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),  # parquet micros, no tz
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_GAP_MIN = 30


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    Watermarks require event time to be TIMESTAMP (Spark rejects
    TIMESTAMP_NTZ: EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the NTZ parquet
    column is cast here — deterministic because the engine session pins
    spark.sql.session.timeZone=UTC (session.py).

    Known limitation: the legacy NANOS-timestamp testdata generation (which
    the BATCH reader repairs via nanosAsLong + timestamp_micros,
    sources/tables.py) is not supported on the streaming path — the
    explicit schema here assumes the current micros generation; a legacy
    store would need the bigint column + repair projection instead."""
    # The file source requires a directory; the sf dir holds every table's
    # parquet, so glob-filter to the events file only.
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation: late data beyond the
    watermark is dropped, windows finalize incrementally."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# custom stateful operator: sessionization
# --------------------------------------------------------------------------
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """applyInPandasWithState sessionizer: per-user state carries the open
    session; a gap > ``gap_min`` (or state timeout) closes and emits it."""
    gap_us = gap_min * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_list.sort()
        out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = -1, -1, 0
        for t in ts_list:
            if start_us < 0:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(start_us, unit="us"))
                out["session_end"].append(pd.Timestamp(last_us, unit="us"))
                out["n_events"].append(n)
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        if start_us >= 0:
            state.update((start_us, last_us, n))
            state.setTimeoutDuration(gap_us // 1000)
        if out["user_id"]:
            yield pd.DataFrame(out)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the sessionizer (gaps-and-islands with window
    functions) — SQL-expressible, so the DuckDB oracle checks the session
    semantics the streaming operator implements."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact microsecond arithmetic on both engines (epoch_micros / epoch_us);
    # second-truncation would disagree on fractional-second gaps
    gap = F.lit(SESSION_GAP_MIN * 60 * 1_000_000)
    ts_us = epoch_micros(ev, "ts")
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(ts_us - F.lag(ts_us, 1).over(w) > gap, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


SESSIONIZE_BATCH_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_no
""".strip()


# --------------------------------------------------------------------------
# stream-stream interval join (streaming twin of operators/temporal.range_join)
# --------------------------------------------------------------------------
ATTRIBUTION_WINDOW_MIN = 30


def attribution_stream(
    events: DataFrame,
    window_min: int = ATTRIBUTION_WINDOW_MIN,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: purchases landing within
    ``window_min`` minutes after a click by the same user.

    Both sides carry watermarks and the join condition bounds purchase
    time on BOTH ends relative to click time, so Spark can expire buffered
    click state once `click_ts + window + watermark` passes — the state
    stays bounded on an unbounded stream (the defining constraint of
    stream-stream joins).  Inner semantics; one row per qualifying pair.
    """
    c = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"""click_user = purchase_user
                AND purchase_ts > click_ts
                AND purchase_ts <= click_ts + interval {window_min} minutes"""
        ),
    ).select("click_id", "click_user", "click_ts", "purchase_id", "purchase_ts", "purchase_value")


# --------------------------------------------------------------------------
# stream-static enrichment join
# --------------------------------------------------------------------------
def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: each micro-batch joins the STATIC dimension —
    no streaming state, no watermark (only stream-stream joins buffer), and
    the static side is re-planned per batch, so a small dimension
    broadcasts.  This is the standard enrichment shape (events × user
    profile / document metadata) and completes the streaming join
    inventory alongside the watermarked stream-stream interval join."""
    return events.join(F.broadcast(dim), on=on, how="left")


def user_profile_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A static per-user dimension snapshot derived from the batch events
    table: first/last seen and event count — the profile table an
    enrichment join consumes."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# streaming exact dedup
# --------------------------------------------------------------------------
def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state: the watermark
    lets Spark drop dedup state older than the lateness horizon — the only
    way exact dedup survives an unbounded stream."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dedup_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming dedup: duplicate-injected events (the
    FIXTURES recipe) reduced to one row per event_id."""
    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)
    return doubled.groupBy("event_id").agg(
        F.min("ts").alias("ts"),
        F.min("user_id").alias("user_id"),
        F.min("event_type").alias("event_type"),
        F.count(F.lit(1)).alias("n_copies"),
    )


DEDUP_EVENTS_SQL = """
SELECT event_id, MIN(ts) AS ts, MIN(user_id) AS user_id,
       MIN(event_type) AS event_type, COUNT(*) AS n_copies
FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
GROUP BY event_id
""".strip()


def cms_stream(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Windowed count-min sketch over the stream: per tumbling window,
    the depth×width heavy-hitter counter table of ``user_id``.

    Union of the depth bucket projections → ONE watermarked windowed
    groupBy: streaming state is depth·width counters per open window
    regardless of stream rate or cardinality — the bounded-state form of
    per-user counting (an exact per-user windowed count holds one state
    row per user per window; this holds 4096).  Counters merge across
    windows/streams by addition (operators/sketch.py::cms_estimate reads
    point estimates)."""
    from dream_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH, _CMS_FN0
    from dream_spark.functions.hashing import hash_sql

    ev = events.where(F.col("user_id").isNotNull())
    rows = [
        ev.select(
            "ts",
            F.lit(i).alias("row"),
            F.expr(f"{hash_sql('user_id', _CMS_FN0 + i)} % {CMS_WIDTH}").alias("bucket"),
        )
        for i in range(CMS_DEPTH)
    ]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionAll(r)
    return (
        u.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


QUERIES = {
    "streaming_sessionize_batch": sessionize_batch,
    "streaming_dedup_batch": dedup_events_batch,
}
ORACLES = {
    "streaming_sessionize_batch": SESSIONIZE_BATCH_SQL,
    "streaming_dedup_batch": DEDUP_EVENTS_SQL,
}
