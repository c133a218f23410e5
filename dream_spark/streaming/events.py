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
    TIMESTAMP_NTZ: EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).  The conversion
    goes through timezone-FREE integer arithmetic — NTZ epoch micros
    (``epoch_micros_expr``) rebuilt as a UTC instant via
    ``timestamp_micros`` — instead of a plain cast, which interprets the
    naive value in the SESSION timezone and would silently shift every
    window/gap under a caller-supplied non-UTC session (the engine's
    any-session contract, sources/tables.py).

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
    return _instant_ts(raw)


def _instant_ts(raw: DataFrame) -> DataFrame:
    """NTZ ``ts`` → UTC-instant TIMESTAMP via timezone-free integer
    arithmetic (see :func:`read_events_stream`'s contract note)."""
    from dream_spark.functions.timeutils import epoch_micros_expr

    return raw.withColumn(
        "ts", F.timestamp_micros(epoch_micros_expr("ts", "timestamp_ntz"))
    )


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


def merge_session_islands(
    items: list[tuple[int, int, int]], gap_us: int
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Interval-island merge over {new single-event intervals} ∪ {the open
    session interval}: sort by start, chain any item starting within
    ``gap_us`` of the running island's end.  Returns (closed islands in
    time order, open last island or None).

    This matches the batch twin's gaps-and-islands for in-run data,
    INCLUDING a late event arriving more than a gap BEFORE the open
    session's start — it forms its own earlier island instead of
    stretching the open session backwards past the gap (a bare
    min(start)/max(end) merge diverges from batch there).  All islands but
    the LAST are separated from the next by > gap_us, so they are emitted
    closed; the last stays open in state.  (An event in a FUTURE batch
    could in principle land between two emitted islands — bounded state
    cannot retract; the watermark bounds how late that can happen, the
    same contract as the timeout path.)"""
    if not items:
        return [], None
    items = sorted(items)
    closed: list[tuple[int, int, int]] = []
    start_us, last_us, n = items[0]
    for s2, l2, n2 in items[1:]:
        if s2 - last_us <= gap_us:
            last_us = max(last_us, l2)
            n += n2
        else:
            closed.append((start_us, last_us, n))
            start_us, last_us, n = s2, l2, n2
    return closed, (start_us, last_us, n)


def sessionize_stream(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN, watermark: str = "2 hours"
) -> DataFrame:
    """applyInPandasWithState sessionizer: per-user state carries the open
    session; a gap > ``gap_min`` closes and emits it, and the EVENT-time
    timeout (watermark-driven) closes sessions whose gap has provably
    expired — a processing-time timeout would close sessions on wall-clock
    lag or checkpoint restart, emitting split sessions the batch twin
    contradicts.  Out-of-order arrival across micro-batches is handled by
    :func:`merge_session_islands`: late events within a gap of the open
    session extend it (never moving its end backward); a late event MORE
    than a gap before the open session's start closes as its own earlier
    island, matching the batch twin's gaps-and-islands split.

    TIMEZONE DOMAIN: all arithmetic runs on ``__us`` — instant epoch
    micros computed JVM-side (``unix_micros``) — never on the pandas
    ``ts`` column, which Arrow delivers SESSION-timezone-naive: its
    ``.value`` is instant+offset under a non-UTC session, and comparing
    that against ``getCurrentWatermarkMs()`` (instant domain) would shift
    every timeout by the session offset (r7 review finding).  Emitted
    timestamps are tz-aware UTC for the same reason."""
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
                    "session_start": [pd.Timestamp(start_us, unit="us", tz="UTC")],
                    "session_end": [pd.Timestamp(last_us, unit="us", tz="UTC")],
                    "n_events": [n],
                }
            )
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(v) for v in pdf["__us"])
        out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
        items = [(t, t, 1) for t in ts_list]
        if state.exists:
            items.append(tuple(state.get))
        closed, open_sess = merge_session_islands(items, gap_us)
        for s, l, c in closed:
            out["user_id"].append(user_id)
            out["session_start"].append(pd.Timestamp(s, unit="us", tz="UTC"))
            out["session_end"].append(pd.Timestamp(l, unit="us", tz="UTC"))
            out["n_events"].append(c)
        start_us: int | None = None
        if open_sess is not None:
            start_us, last_us, n = open_sess
            state.update((start_us, last_us, n))
            # close when the WATERMARK passes the gap horizon; clamp above
            # the current watermark (setting a timeout at/below it raises)
            timeout_ms = (last_us + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if out["user_id"]:
            yield pd.DataFrame(out)

    src = events.withColumn("__us", F.unix_micros("ts")).withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_stream_agg(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN, watermark: str = "2 hours"
) -> DataFrame:
    """The JVM-native sessionizer: Spark's built-in ``session_window``
    (state-store-merged session intervals, no Python in the loop) — the
    high-key-cardinality twin of :func:`sessionize_stream`, the same
    relationship :func:`funnel_stream_agg` has to the stateful funnel.

    EXACTNESS NOTE: ``session_window`` merges an event into the open
    session iff ``ts < last_ts + gap`` (strict), while this engine's
    session semantics (the stateful operator, the batch twin, and the
    DuckDB oracle) CONTINUE a session at ``ts - last_ts <= gap``.  Over
    integer microseconds the two are reconciled exactly by widening the
    native gap one microsecond: ``diff <= gap  ⟺  diff < gap + 1µs``.
    Emitted columns are min/max event time per session (the window's
    start equals min ts; its end is last+gap, which is NOT the session
    end this engine reports)."""
    gap_us = gap_min * 60 * 1_000_000
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_us + 1} microseconds").alias("sw"),
            "user_id",
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
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
    inventory alongside the watermarked stream-stream interval join.

    No forced broadcast hint: a per-user profile dimension grows with the
    user population, and an unconditional hint would re-ship it to every
    executor per micro-batch and OOM past the broadcast cap — the
    threshold/AQE decide, falling back to a shuffle join on a large dim."""
    return events.join(dim, on=on, how="left")


def _enrich_projected(ev: DataFrame, dim: DataFrame) -> DataFrame:
    """The enrich live run's projected stream — ONE definition shared by
    the warm hook and the live entry, so both call sites build the same
    artifact under the same cache signature/digest row."""
    return enrich_stream(ev, dim).select(
        "event_id", "user_id", "event_type", "n_events"
    )


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


def enrich_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`enrich_stream` (identical join semantics — a
    micro-batch IS a batch): every event left-joined with the per-user
    profile dimension, projecting the attached profile count.  The
    dimension is derived from the same events table, so the left join
    always matches — the NULL-extension path is exercised by the streaming
    runtime test's synthetic dim instead."""
    ev = load_table(spark, sf_dir, "events")
    dim = user_profile_dim(spark, sf_dir).select("user_id", "n_events")
    return enrich_stream(ev, dim).select(
        "event_id", "user_id", "event_type", "n_events"
    )


ENRICH_EVENTS_SQL = """
SELECT e.event_id, e.user_id, e.event_type, p.n_events
FROM events e
LEFT JOIN (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) p
  ON p.user_id = e.user_id
""".strip()


# --------------------------------------------------------------------------
# streaming exact dedup
# --------------------------------------------------------------------------
def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state: the watermark
    lets Spark drop dedup state older than the lateness horizon — the only
    way exact dedup survives an unbounded stream.

    ``dropDuplicatesWithinWatermark`` is the API that actually EVICTS:
    plain ``dropDuplicates(["event_id"])`` only cleans state when the
    event-time column is part of the key, so keyed on id alone it keeps
    one state row per distinct id forever — the unbounded growth this
    function exists to prevent."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


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

    One depth-cell explode → ONE watermarked windowed groupBy: streaming state is depth·width counters per open window
    regardless of stream rate or cardinality — the bounded-state form of
    per-user counting (an exact per-user windowed count holds one state
    row per user per window; this holds 4096).  Counters merge across
    windows/streams by addition (operators/sketch.py::cms_estimate reads
    point estimates)."""
    from dream_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_cells

    ev = events.where(F.col("user_id").isNotNull())
    # ONE pass per micro-batch: the SAME depth-cell explode the batch
    # sketch builds from (operators/sketch.py::cms_cells — one definition,
    # so batch and stream sketches merge and probe identical buckets)

    u = ev.select("ts", cms_cells("user_id", CMS_DEPTH, CMS_WIDTH)).select(
        "ts", F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket")
    )
    return (
        u.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_KMV_STATE_SCHEMA = T.StructType([T.StructField("hashes", T.ArrayType(T.LongType()))])

KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("hour_bucket", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("kth_min", T.LongType()),
        T.StructField("est_distinct", T.LongType()),
    ]
)


def _check_hash_domain(x) -> None:
    """Enforce the 31-bit hash family's input contract (0 ≤ x < 2^31,
    documented at sketch._nn_hash_sql): the numpy replay here wraps A·x
    mod 2^64 and uses FLOORED ``%`` while Spark/DuckDB truncate, so a
    negative or ≥2^31 user_id would diverge from the batch/oracle twin
    SILENTLY — fail loudly instead.  Vectorized; negligible per batch."""
    if len(x) and (int(x.min()) < 0 or int(x.max()) >= (1 << 31)):
        raise ValueError(
            "kmv/hll streams require 0 <= user_id < 2^31 (the 31-bit "
            "universal-hash domain, see sketch._nn_hash_sql); got values "
            f"in [{int(x.min())}, {int(x.max())}]"
        )


def kmv_stream(
    events: DataFrame,
    window_min: int = 60,
    k: int | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed KMV distinct-count sketch over the stream: per tumbling
    window, the k smallest distinct universal hashes of ``user_id``
    (bounded ORDER-STATISTIC state: ≤ k longs per open window, however
    many distinct users flow through — the bounded-state form of windowed
    COUNT DISTINCT).  Windows close on EVENT-time timeout when the
    watermark passes the window end; a closed window's row is EXACTLY the
    batch twin's (operators/sketch.kmv_distinct_by_window — same hash
    constants, same estimator), so merged deployments can union batch and
    stream sketches freely."""
    from dream_spark.functions.hashing import MERSENNE_P, hash_params
    from dream_spark.operators.sketch import _KMV_FN, KMV_K, _window_bucket

    if k is None:
        k = KMV_K
    A, B = hash_params(_KMV_FN)
    win_us = window_min * 60 * 1_000_000

    ev = events.where(F.col("user_id").isNotNull())
    us = epoch_micros(ev, "ts")
    # the batch twin's bucket expression — ONE definition, so closed
    # stream windows land in exactly the batch rows' buckets
    keyed = ev.select(
        F.col("ts"), _window_bucket(us, win_us).alias("hour_bucket"), F.col("user_id")
    )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.hasTimedOut:
            (hashes,) = state.get
            hs = sorted(int(h) for h in hashes)
            n = len(hs)
            kth = hs[-1] if hs else None
            est = n if n < k else (k - 1) * MERSENNE_P // kth
            state.remove()
            yield pd.DataFrame(
                {
                    "hour_bucket": [bucket],
                    "k": [k],
                    "n_kept": [n],
                    "kth_min": [kth],
                    "est_distinct": [est],
                }
            )
            return
        cur: set[int] = set()
        if state.exists:
            (hashes,) = state.get
            cur = {int(h) for h in hashes}
        for pdf in pdfs:
            x = pdf["user_id"].to_numpy().astype("int64")
            _check_hash_domain(x)
            # the exact batch hash: (A·x + B) mod P mapped into [0, P)
            h = ((A * x + B) % MERSENNE_P + MERSENNE_P) % MERSENNE_P
            cur.update(int(v) for v in h)
        kept = sorted(cur)[:k]
        state.update((kept,))
        end_ms = ((int(bucket) + 1) * win_us) // 1000 + 1
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))

    return keyed.withWatermark("ts", watermark).groupBy("hour_bucket").applyInPandasWithState(
        fn,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_HLL_STATE_SCHEMA = T.StructType([T.StructField("regs", T.ArrayType(T.LongType()))])

HLL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("hour_bucket", T.LongType()),
        T.StructField("m_obs", T.LongType()),
        T.StructField("est", T.LongType()),
    ]
)


def hll_stream(
    events: DataFrame,
    window_min: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed HLL distinct-count sketch over the stream: per tumbling
    window, a DENSE m=256 register array max-updated per batch — fixed
    O(m) state per open window however many distinct users flow through
    (the complementary state shape to ``kmv_stream``'s order statistic:
    registers never grow, never sort, and merge by elementwise max).
    Windows close on EVENT-time timeout when the watermark passes the
    window end; a closed window's row is EXACTLY the batch twin's
    (operators/sketch.hll_by_window — same hash, same quadratic mixer,
    same integer estimator), so batch and stream sketches union freely."""
    import numpy as np

    from dream_spark.functions.hashing import MERSENNE_P, hash_params
    from dream_spark.operators.sketch import (
        _HLL_FN,
        _HLL_FN2,
        _HLL_RHO_MAX,
        HLL_M,
        _window_bucket,
        hll_est_py,
    )

    A, B = hash_params(_HLL_FN)
    A2, B2 = hash_params(_HLL_FN2)
    win_us = window_min * 60 * 1_000_000

    ev = events.where(F.col("user_id").isNotNull())
    us = epoch_micros(ev, "ts")
    keyed = ev.select(
        F.col("ts"), _window_bucket(us, win_us).alias("hour_bucket"), F.col("user_id")
    )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.hasTimedOut:
            (regs,) = state.get
            rs = [int(r) for r in regs]
            m_obs = sum(1 for r in rs if r > 0)
            s_obs = sum(1 << (_HLL_RHO_MAX - r) for r in rs if r > 0)
            est = hll_est_py(s_obs, m_obs)
            state.remove()
            yield pd.DataFrame(
                {"hour_bucket": [bucket], "m_obs": [m_obs], "est": [est]}
            )
            return
        regs = np.zeros(HLL_M, dtype="int64")
        if state.exists:
            (prev,) = state.get
            regs = np.asarray(prev, dtype="int64")
        for pdf in pdfs:
            x = pdf["user_id"].to_numpy().astype("int64")
            _check_hash_domain(x)
            # the exact batch hash + quadratic mixer (every intermediate
            # < 2^63: h < 2^31, so h*h < 2^62 and A2*h < 2^62)
            h = ((A * x + B) % MERSENNE_P + MERSENNE_P) % MERSENNE_P
            h = (h * h % MERSENNE_P + A2 * h + B2) % MERSENNE_P
            b = h % HLL_M
            w = h // HLL_M
            # exact integer bit length via frexp (float mantissa/exponent
            # decomposition is exact for ints < 2^53)
            _, exp = np.frexp(w.astype("float64"))
            rho = np.where(w == 0, _HLL_RHO_MAX, _HLL_RHO_MAX - exp).astype("int64")
            np.maximum.at(regs, b, rho)
        state.update(([int(r) for r in regs],))
        end_ms = ((int(bucket) + 1) * win_us) // 1000 + 1
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))

    return keyed.withWatermark("ts", watermark).groupBy("hour_bucket").applyInPandasWithState(
        fn,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


#: tumbling funnel window (minutes); hour-aligned so the batch twin's
#: date_trunc('hour') produces identical window starts
FUNNEL_WINDOW_MIN = 60

_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1", T.ArrayType(T.LongType())),
        T.StructField("t2", T.ArrayType(T.LongType())),
        T.StructField("t3", T.ArrayType(T.LongType())),
    ]
)

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("stage_reached", T.LongType()),
    ]
)


def funnel_stream(
    events: DataFrame,
    window_min: int = FUNNEL_WINDOW_MIN,
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed ordered funnel over the stream: per (user, tumbling
    window), the deepest view→click→purchase stage reached, where stage k
    counts only events at-or-after the user's stage k-1 time in that
    window — ``operators.temporal.funnel`` semantics, incremental.

    State per open (user, window) key: one sorted-on-close time list per
    stage, bounded by the user's step events inside ONE window (watermark
    evicts closed windows via event-time timeout).  Keeping the raw times
    — not a running min — is what makes out-of-order arrival exact: a
    late stage-1 event can retroactively qualify an earlier-seen stage-2
    time, which a running-min state would have already discarded.  Emits
    once per closed window (append semantics).

    TIMEZONE DOMAIN: the grouping key is ``__ws_us`` (instant epoch
    micros of the window start, computed JVM-side) and event times come
    from ``__us`` — a timestamp KEY would arrive session-timezone-naive
    in the pandas UDF, shifting the window-close timeout by the session
    offset under a non-UTC session (r7 review finding; same fix as
    sessionize_stream).

    STATE MIGRATION: the r7 key change (timestamp ``win_start`` →
    long ``__ws_us``) changed the state-store key schema.  A query
    restarted against a checkpoint written by the pre-r7 code fails at
    start with a key-schema incompatibility — point it at a FRESH
    checkpointLocation (and replay the source from the desired offset);
    there is no in-place upgrade for state-store key schemas."""
    from dream_spark.operators.temporal import FUNNEL_STEPS

    steps = list(FUNNEL_STEPS)
    win_us = window_min * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id, ws_us = key
        ws_us = int(ws_us)
        if state.hasTimedOut:
            lists = state.get
            state.remove()
            stage, s_prev = 0, None
            for i in range(len(steps)):
                arr = sorted(lists[i] or [])
                if i == 0:
                    cand = arr[0] if arr else None
                else:
                    cand = next((t for t in arr if t >= s_prev), None)
                if cand is None:
                    break
                stage, s_prev = i + 1, cand
            yield pd.DataFrame(
                {
                    "window_start": [pd.Timestamp(ws_us, unit="us", tz="UTC")],
                    "user_id": [user_id],
                    "stage_reached": [stage],
                }
            )
            return
        new: dict[str, list[int]] = {s: [] for s in steps}
        for pdf in pdfs:
            for t, et in zip(pdf["__us"], pdf["event_type"]):
                if et in new:
                    new[et].append(int(t))
        cur = list(state.get) if state.exists else [[] for _ in steps]
        state.update(tuple(list(cur[i] or []) + new[steps[i]] for i in range(len(steps))))
        # close just past the window end, driven by the event-time
        # watermark; clamp above the CURRENT watermark — a late-but-
        # admissible row for an old window otherwise sets a timeout at or
        # below it, which raises and kills the query
        timeout_ms = (ws_us + win_us) // 1000 + 1
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))

    ev = (
        events.where(F.col("event_type").isin(steps))
        .select(
            "user_id",
            "ts",
            "event_type",
            F.window("ts", f"{window_min} minutes").start.alias("win_start"),
        )
        .withColumn("__us", F.unix_micros("ts"))
        .withColumn("__ws_us", F.unix_micros("win_start"))
        .withWatermark("ts", watermark)
    )
    return ev.groupBy("user_id", "__ws_us").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def funnel_stream_agg(
    events: DataFrame,
    window_min: int = FUNNEL_WINDOW_MIN,
    watermark: str = "2 hours",
) -> DataFrame:
    """The JVM-ONLY windowed funnel — the 100-TB path.  Identical
    semantics to :func:`funnel_stream` (per (user, tumbling window) the
    deepest view→click→purchase stage, stage k counting only events
    at-or-after the stage k-1 time), but expressed as a streaming
    WINDOWED AGGREGATION (collect_list of per-stage event times in the
    JVM state store) followed by a stateless array-function chain
    (array_min over filter()) on the watermark-finalized rows.

    Why it exists: the r8 stream probe measured the
    applyInPandasWithState funnel at 8.2x wall for 10x data — bounded
    state, but LINEAR in distinct (user, window) keys with a ~0.3 ms
    per-key Python/Arrow constant (583k keys = 164 s on local[32]).
    This variant keeps the same raw-times state shape (late stage-1
    events still re-qualify earlier stage-2 times, the exactness
    property the raw lists exist for) entirely inside whole-stage
    codegen + the state store: no Python worker in the loop, measured
    ~10x faster at the 10x decade (SCALE.md §7).  funnel_stream remains
    the custom-stateful-operator surface; this is the operator to run
    when the key count is large."""
    from dream_spark.operators.temporal import FUNNEL_STEPS

    steps = list(FUNNEL_STEPS)
    ev = (
        events.where(F.col("event_type").isin(steps))
        .select("user_id", "ts", "event_type", F.unix_micros("ts").alias("__us"))
        .withWatermark("ts", watermark)
    )
    g = ev.groupBy(
        F.window("ts", f"{window_min} minutes").alias("win"), F.col("user_id")
    ).agg(
        *[
            F.collect_list(
                F.when(F.col("event_type") == s, F.col("__us"))
            ).alias(f"t{i + 1}")
            for i, s in enumerate(steps)
        ]
    )
    # the min-chain on closed windows: s1 = min(t1); s_k = min(t_k >= s_{k-1});
    # one projection per stage so each s_k can reference s_{k-1} as a column
    n = len(steps)
    chained = g
    for i in range(1, n + 1):
        expr = (
            "array_min(t1) AS s1"
            if i == 1
            else f"array_min(filter(t{i}, x -> x >= s{i - 1})) AS s{i}"
        )
        chained = chained.selectExpr(
            "win", "user_id",
            *[f"s{j}" for j in range(1, i)],
            expr,
            *[f"t{j}" for j in range(i + 1, n + 1)],
        )
    stage = "CASE " + " ".join(
        f"WHEN s{i} IS NOT NULL THEN {i}" for i in range(len(steps), 0, -1)
    ) + " ELSE 0 END"
    return chained.selectExpr(
        "win.start AS window_start", "user_id", f"CAST({stage} AS BIGINT) AS stage_reached"
    )


def sessionize_agg_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE run of the JVM-native session_window sessionizer (same
    construction and batch-twin oracle as :func:`sessionize_live`):
    proves Spark's built-in session merging answers identically to the
    custom stateful operator AND the gaps-and-islands SQL."""
    path = _live_run_path(spark, sf_dir, "sessionize_agg", sessionize_stream_agg)
    out = spark.read.parquet(f"{path}/out")
    return out.where(F.col("user_id") != _FLUSH_USER).select(
        "user_id",
        _ntz("session_start").alias("session_start"),
        _ntz("session_end").alias("session_end"),
        "n_events",
    )


def funnel_agg_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE run of the JVM windowed funnel (same construction as
    :func:`funnel_live`, same batch-twin oracle): proves the fast path
    answers identically to the stateful operator AND the batch SQL."""
    path = _live_run_path(spark, sf_dir, "funnel_agg", funnel_stream_agg)
    out = spark.read.parquet(f"{path}/out")
    return out.where(F.col("user_id") != _FLUSH_USER).select(
        "user_id",
        _ntz("window_start").alias("window_start"),
        "stage_reached",
    )


def funnel_windows_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``funnel_stream``: per (user, hour window) deepest
    funnel stage — SQL-expressible, so the DuckDB oracle checks the
    windowed-funnel semantics the streaming operator implements."""
    from dream_spark.operators.temporal import FUNNEL_STEPS, funnel_stages

    ev = load_table(spark, sf_dir, "events")
    ev = ev.where(F.col("event_type").isin(list(FUNNEL_STEPS))).select(
        "user_id", "ts", "event_type", F.date_trunc("hour", "ts").alias("window_start")
    )
    st = funnel_stages(ev, FUNNEL_STEPS, ["user_id", "window_start"])
    stage = F.lit(0).cast("bigint")
    for i in range(1, len(FUNNEL_STEPS) + 1):
        stage = F.when(F.col(f"s{i}").isNotNull(), F.lit(i).cast("bigint")).otherwise(stage)
    return st.select("user_id", "window_start", stage.alias("stage_reached"))


def _funnel_windows_sql() -> str:
    from dream_spark.operators.temporal import FUNNEL_STEPS

    steps = list(FUNNEL_STEPS)
    parts = [
        "se AS (SELECT user_id, ts, event_type, date_trunc('hour', ts) AS window_start"
        " FROM events WHERE event_type IN ("
        + ", ".join(f"'{s}'" for s in steps)
        + "))",
        f"u1 AS (SELECT user_id, window_start, MIN(CASE WHEN event_type = '{steps[0]}'"
        f" THEN epoch_us(ts) END) AS s1 FROM se GROUP BY user_id, window_start)",
    ]
    for i in range(2, len(steps) + 1):
        prev_cols = ", ".join(f"u{i-1}.s{j}" for j in range(1, i))
        parts.append(
            f"u{i} AS (SELECT se.user_id, se.window_start, {prev_cols},"
            f" MIN(CASE WHEN se.event_type = '{steps[i-1]}'"
            f" AND epoch_us(se.ts) >= u{i-1}.s{i-1} THEN epoch_us(se.ts) END) AS s{i}"
            f" FROM se JOIN u{i-1} ON se.user_id = u{i-1}.user_id"
            f" AND se.window_start = u{i-1}.window_start"
            f" GROUP BY se.user_id, se.window_start, {prev_cols})"
        )
    case = "CASE " + " ".join(
        f"WHEN s{i} IS NOT NULL THEN {i}"
        for i in range(len(steps), 0, -1)
    ) + " ELSE 0 END"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT user_id, window_start, CAST({case} AS BIGINT) AS stage_reached"
        + f" FROM u{len(steps)}"
    )


FUNNEL_WINDOWS_SQL = _funnel_windows_sql()


# --------------------------------------------------------------------------
# Live trigger-mode runs: the driver's oracle gate on ACTUAL stream output
# --------------------------------------------------------------------------
#: bump when the live-run layout (sentinel, sink shape) changes
_LIVE_FORMAT_VERSION = 2
#: sentinel flush row: a far-future event for a reserved user id — once
#: processed, the query's event-time watermark passes every real
#: session/window horizon, so EVERY real key's event-time timeout fires in
#: the trailing no-data micro-batch and the availableNow run emits the
#: COMPLETE closed result (without it, append mode keeps the last session/
#: window per key open forever and the output is only a subset of the
#: batch twin — un-oracle-able).  The sentinel's own state stays open past
#: the final watermark and is dropped by the user_id / far-future-window
#: filter on read-back.  The id is the TOP of the 31-bit hash domain (not
#: a negative id, which the kmv/hll streams' domain guard rightly
#: rejects); real testdata ids are orders of magnitude below it.
_FLUSH_USER = (1 << 31) - 1
_FLUSH_TS = "2100-01-01 00:00:00"
#: the sentinel's FULL row shape, folded verbatim into the augmented-input
#: cache signature — changing ANY field (not just id/ts) must rebuild the
#: cached input, with no _LIVE_FORMAT_VERSION bump to remember (r8 ADVICE)
_SENTINEL_ROW = (-1, _FLUSH_TS, _FLUSH_USER, "view", 0.0, "")


def _events_sig(sf_dir: str) -> str:
    import os

    root = os.path.abspath(sf_dir)
    ev_file = os.path.join(root, "events.parquet")
    return f"{root}|{os.path.getmtime(ev_file) if os.path.exists(ev_file) else 0}"


def _live_input_sig(sf_dir: str) -> str:
    """Cache signature of the augmented stream input.  Folds the sentinel
    row AND a source digest of :func:`_live_input_path` itself (r9
    ADVICE): an edit to the augmented-input construction (projection,
    unionByName, coalesce) self-invalidates the cached input with no
    ``_LIVE_FORMAT_VERSION`` bump to remember — the same hazard the
    ``_SENTINEL_ROW`` fold removed for sentinel edits."""
    from dream_spark.functions.artifacts import source_digest

    return (
        f"{_events_sig(sf_dir)}|livein-v{_LIVE_FORMAT_VERSION}"
        f"|{_SENTINEL_ROW!r}|{source_digest(_live_input_path)}"
    )


def _live_input_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once augmented stream input: the events table plus the flush
    sentinel, written as plain parquet — ONE copy shared by every live
    run over the same sf_dir (writing it per-run doubled the cold warm
    cost)."""
    from dream_spark.functions.artifacts import build_once_path

    sig = _live_input_sig(sf_dir)

    def build(tmp: str) -> None:
        import datetime

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        eid, ts_iso, uid, etype, val, props = _SENTINEL_ROW
        sentinel = spark.createDataFrame(
            # event_type is a funnel step, so step-filtered streams keep it
            [(eid, datetime.datetime.fromisoformat(ts_iso), uid, etype, val, props)],
            EVENTS_SCHEMA,
        )
        ev.unionByName(sentinel).coalesce(8).write.parquet(f"{tmp}/in")

    return build_once_path(sig, "livestream", build)


def _stream_digest_parts(name: str) -> tuple:
    """The code-defined semantics ONE stream's live run rides on: the
    stream function itself, the imported helpers/constants its semantics
    use (hash family, funnel steps, window geometry, state/output
    schemas), and the plumbing every live run shares (NTZ→instant
    conversion, the sentinel row, ``_live_run_path``'s own
    build/reconcile logic).  Narrow BY STREAM (r8 VERDICT task 5): a
    one-line edit to one stream re-runs ONE trigger run, not nine —
    while an edit to any digested dependency still invalidates, closing
    the r8 review's drift hazard (a cached sink silently disagreeing
    with the freshly-recomputed batch oracle).  An unknown stream name
    gets the whole module — the safe direction for a stream added
    without a deps row."""
    import sys

    from dream_spark.functions import hashing as _hashing
    from dream_spark.functions import timeutils as _tu
    from dream_spark.operators import sketch as _sk
    from dream_spark.operators.temporal import FUNNEL_STEPS

    common: tuple = (_instant_ts, _tu, _live_run_path, repr(_SENTINEL_ROW))
    sketch_common: tuple = (_check_hash_domain, _hashing, _sk._window_bucket)
    deps = {
        "sessionize": (
            sessionize_stream, merge_session_islands,
            str(SESSION_GAP_MIN), repr(SESSION_SCHEMA), repr(_STATE_SCHEMA),
        ),
        "sessionize_agg": (sessionize_stream_agg, str(SESSION_GAP_MIN)),
        "funnel": (
            funnel_stream, repr(FUNNEL_STEPS), str(FUNNEL_WINDOW_MIN),
            repr(_FUNNEL_STATE_SCHEMA), repr(FUNNEL_OUT_SCHEMA),
        ),
        "funnel_agg": (funnel_stream_agg, repr(FUNNEL_STEPS), str(FUNNEL_WINDOW_MIN)),
        "hourly": (hourly_counts_stream,),
        "kmv": sketch_common + (
            kmv_stream, str(_sk._KMV_FN), str(_sk.KMV_K), str(_sk.KMV_WINDOW_US),
            repr(_KMV_STATE_SCHEMA), repr(KMV_OUT_SCHEMA),
        ),
        "hll": sketch_common + (
            hll_stream, str(_sk._HLL_FN), str(_sk._HLL_FN2),
            str(_sk.HLL_M), str(_sk._HLL_RHO_MAX), _sk.hll_est_py,
            repr(_HLL_STATE_SCHEMA), repr(HLL_OUT_SCHEMA),
        ),
        "attribution": (attribution_stream, str(ATTRIBUTION_WINDOW_MIN)),
        "enrich": (_enrich_projected, enrich_stream, user_profile_dim),
    }
    if name not in deps:
        return common + (sys.modules[__name__],)
    return common + deps[name]


def _live_run_path(spark: SparkSession, sf_dir: str, name: str, build_stream) -> str:
    """Build-once location of a REAL availableNow trigger run of
    ``build_stream`` over the shared augmented input: the stream runs
    into a parquet sink at ``<dir>/out`` with a checkpoint, and the sink
    is what the live entries read back.  The cache signature folds a
    source digest of the stream's OWN semantics closure
    (:func:`_stream_digest_parts`), so any change to that stream — and
    only that stream — re-runs it; the driver's oracle row then fails if
    trigger-mode state handling ever drifts from the batch twin."""
    from dream_spark.functions.artifacts import build_once_path, source_digest

    src_digest = source_digest(*_stream_digest_parts(name))
    # fold the INPUT artifact's signature too: a rebuilt augmented input
    # lands at a new build_once_path directory, and a cached sink produced
    # from the old input must not be served over it (r9 ADVICE follow-on)
    sig = "|".join(
        [
            _events_sig(sf_dir),
            f"live-{name}-v{_LIVE_FORMAT_VERSION}",
            src_digest,
            _live_input_sig(sf_dir),
        ]
    )
    in_dir = _live_input_path(spark, sf_dir)

    def build(tmp: str) -> None:
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .format("parquet")
            .load(f"{in_dir}/in")
        )
        q = (
            build_stream(_instant_ts(raw))
            .writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError(f"live stream run {name!r} did not drain in 600s")
        # The sink's _spark_metadata log (and the checkpoint) record the
        # ABSOLUTE paths of the temp build dir — after build_once_path's
        # atomic rename those paths are gone and a metadata-log read of
        # the sink returns an empty file list.  So the live entries read
        # the sink by plain directory listing instead — which is only
        # correct if the listing equals the COMMITTED file set: a sink
        # task that wrote its part file but died before commit leaves an
        # orphan the manifest excludes but a listing would double-count
        # (r8 review finding).  Reconcile before dropping the log: keep
        # exactly the manifest's committed basenames, delete any other
        # part file, and materialize an empty-but-typed parquet when the
        # run emitted zero rows (a bare directory fails schema
        # inference; the oracle side is an empty table, not an error).
        import glob
        import json as _json
        import os as _os
        import shutil

        committed: set[str] = set()
        for log_file in glob.glob(f"{tmp}/out/_spark_metadata/[0-9]*"):
            with open(log_file) as f:
                for line in f:
                    line = line.strip()
                    if not line.startswith("{"):
                        continue
                    entry = _json.loads(line)
                    if "path" in entry:
                        committed.add(_os.path.basename(entry["path"]))
        for part in glob.glob(f"{tmp}/out/part-*"):
            if _os.path.basename(part) not in committed:
                _os.remove(part)
        if not glob.glob(f"{tmp}/out/part-*"):
            empty = spark.createDataFrame([], build_stream(_instant_ts(raw)).schema)
            empty.coalesce(1).write.mode("append").parquet(f"{tmp}/out")
        shutil.rmtree(f"{tmp}/out/_spark_metadata", ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)

    return build_once_path(sig, "livestream", build)


def _ntz(col: str):
    """UTC-instant TIMESTAMP → the equivalent NTZ wall time, timezone-free
    (integer micros through the NTZ epoch) — the sink stores tz-aware UTC
    instants, the batch twin and the DuckDB oracle speak naive NTZ."""
    return F.expr(
        f"timestampadd(MICROSECOND, unix_micros({col}),"
        " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )


def warm_live_streams(spark: SparkSession, sf_dir: str) -> None:
    """Bench/deployment warm hook: run the availableNow trigger runs once
    so the live entries measure sink read-back (the serving shape), not
    the stream execution — the maintenance_compact artifact convention.
    The nine independent streaming queries run on concurrent driver
    threads (seven at a time) over the shared augmented input; the cold
    warm cost is the slowest few runs overlapped, not the sum (a serial
    cold warm of just the first two streams was already ~50 s at
    sf0.1)."""
    from concurrent.futures import ThreadPoolExecutor

    _live_input_path(spark, sf_dir)  # once, BEFORE the concurrent runs
    dim = user_profile_dim(spark, sf_dir).select("user_id", "n_events")
    with ThreadPoolExecutor(max_workers=7) as pool:
        futs = [
            pool.submit(_live_run_path, spark, sf_dir, "sessionize", sessionize_stream),
            pool.submit(_live_run_path, spark, sf_dir, "funnel", funnel_stream),
            pool.submit(_live_run_path, spark, sf_dir, "hourly", hourly_counts_stream),
            pool.submit(_live_run_path, spark, sf_dir, "kmv", kmv_stream),
            pool.submit(_live_run_path, spark, sf_dir, "hll", hll_stream),
            pool.submit(_live_run_path, spark, sf_dir, "attribution", attribution_stream),
            pool.submit(_live_run_path, spark, sf_dir, "funnel_agg", funnel_stream_agg),
            pool.submit(_live_run_path, spark, sf_dir, "sessionize_agg", sessionize_stream_agg),
            pool.submit(
                _live_run_path,
                spark,
                sf_dir,
                "enrich",
                lambda ev: _enrich_projected(ev, dim),
            ),
        ]
        for f in futs:
            f.result()


def sessionize_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sessionizer's ACTUAL trigger-mode output, oracle-checked: read
    back the parquet a real availableNow run of :func:`sessionize_stream`
    wrote.  With the flush sentinel every real user's open session times
    out, so the result is the COMPLETE session set — hash-equal to
    ``sessionize_batch``'s gaps-and-islands oracle.  This is the entry
    that fails if applyInPandasWithState state handling (island merge,
    tz-domain state keys, timeout arithmetic) drifts from the twin."""
    path = _live_run_path(spark, sf_dir, "sessionize", sessionize_stream)
    out = spark.read.parquet(f"{path}/out")
    return out.where(F.col("user_id") != _FLUSH_USER).select(
        "user_id",
        _ntz("session_start").alias("session_start"),
        _ntz("session_end").alias("session_end"),
        "n_events",
    )


def attribution_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE stream-stream interval join: a real availableNow run of
    :func:`attribution_stream` (watermarked click→purchase window join),
    read back from the sink and hash-checked against a plain batch
    interval-join SQL.  Inner joins emit eagerly on match — no flush
    dependency — and the sentinel ('view' for the reserved user) is
    filtered out of both sides by the event_type predicates."""
    path = _live_run_path(spark, sf_dir, "attribution", attribution_stream)
    out = spark.read.parquet(f"{path}/out")
    return out.select(
        "click_id",
        "click_user",
        _ntz("click_ts").alias("click_ts"),
        "purchase_id",
        _ntz("purchase_ts").alias("purchase_ts"),
        "purchase_value",
    )


ATTRIBUTION_LIVE_SQL = f"""
SELECT c.event_id AS click_id, c.user_id AS click_user, c.ts AS click_ts,
       p.event_id AS purchase_id, p.ts AS purchase_ts, p.value AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) > epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + {ATTRIBUTION_WINDOW_MIN * 60 * 1_000_000}
""".strip()


def enrich_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE stream-static join: a real availableNow run of
    :func:`enrich_stream` against the per-user profile dimension,
    hash-checked by the batch twin's oracle.  Stateless — each
    micro-batch re-plans the static side; the sentinel row left-joins to
    nothing and is dropped on read-back."""
    dim = user_profile_dim(spark, sf_dir).select("user_id", "n_events")
    path = _live_run_path(
        spark, sf_dir, "enrich", lambda ev: _enrich_projected(ev, dim)
    )
    out = spark.read.parquet(f"{path}/out")
    return out.where(F.col("user_id") != _FLUSH_USER).select(
        "event_id", "user_id", "event_type", "n_events"
    )


def _flush_bucket(window_us: int) -> int:
    """The sentinel's window bucket index: everything at-or-past it is the
    sentinel's own (never-closed) state, excluded on read-back."""
    import datetime

    flush_us = int(
        datetime.datetime.fromisoformat(_FLUSH_TS)
        .replace(tzinfo=datetime.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    return flush_us // window_us


def kmv_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE bounded-state sketch run: a real availableNow run of
    :func:`kmv_stream` (order-statistic state), flushed complete by the
    sentinel — every real hourly bucket's event-time timeout fires, so
    the sink holds exactly the batch twin's rows (sketch_kmv_hourly's
    oracle, one hash/estimator definition).  Also the entry that executes
    the 31-bit domain guard on real data every round."""
    from dream_spark.operators.sketch import KMV_WINDOW_US

    path = _live_run_path(spark, sf_dir, "kmv", kmv_stream)
    out = spark.read.parquet(f"{path}/out")
    return out.where(F.col("hour_bucket") < _flush_bucket(KMV_WINDOW_US)).select(
        "hour_bucket", "k", "n_kept", "kth_min", "est_distinct"
    )


def hll_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE dense-register sketch run: :func:`hll_stream` under a real
    availableNow trigger, flushed complete (same construction as
    :func:`kmv_live`); hash-checked by the batch twin's oracle."""
    from dream_spark.operators.sketch import KMV_WINDOW_US

    path = _live_run_path(spark, sf_dir, "hll", hll_stream)
    out = spark.read.parquet(f"{path}/out")
    return out.where(F.col("hour_bucket") < _flush_bucket(KMV_WINDOW_US)).select(
        "hour_bucket", "m_obs", "est"
    )


def hourly_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATELESS live shape (same construction as
    :func:`sessionize_live`, third trigger-mode path): a real availableNow
    run of the watermarked tumbling-window aggregation
    :func:`hourly_counts_stream`.  The flush sentinel's watermark advance
    closes every REAL window (append mode emits only finalized windows),
    so the sink holds the complete hourly table — hash-equal to the batch
    ``rel_events_hourly`` oracle; the sentinel's own far-future window
    never closes and is additionally excluded by the year guard."""
    path = _live_run_path(spark, sf_dir, "hourly", hourly_counts_stream)
    out = spark.read.parquet(f"{path}/out")
    # integer-micros guard, NOT a timestamp-literal cast (which a non-UTC
    # session would shift, silently disarming the filter — the module's
    # timezone-free convention; r8 review finding)
    flush_us = _flush_bucket(1)  # window_us=1 -> raw epoch micros
    return out.where(F.unix_micros(F.col("hour")) < flush_us).select(
        _ntz("hour").alias("hour"),
        "event_type",
        "n_events",
        "sum_value",
    )


def funnel_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The windowed funnel's ACTUAL trigger-mode output (same construction
    as :func:`sessionize_live`): a real availableNow run of
    :func:`funnel_stream`, flushed complete by the sentinel, hash-checked
    against the batch twin's SQL oracle."""
    path = _live_run_path(spark, sf_dir, "funnel", funnel_stream)
    out = spark.read.parquet(f"{path}/out")
    return out.where(F.col("user_id") != _FLUSH_USER).select(
        "user_id",
        _ntz("window_start").alias("window_start"),
        "stage_reached",
    )


QUERIES = {
    "streaming_sessionize_batch": sessionize_batch,
    "streaming_dedup_batch": dedup_events_batch,
    "streaming_funnel_batch": funnel_windows_batch,
    "streaming_enrich_batch": enrich_events_batch,
    "streaming_sessionize_live": sessionize_live,
    "streaming_funnel_live": funnel_live,
    "streaming_hourly_live": hourly_live,
    "streaming_kmv_live": kmv_live,
    "streaming_hll_live": hll_live,
    "streaming_attribution_live": attribution_live,
    "streaming_enrich_live": enrich_live,
    "streaming_funnel_agg_live": funnel_agg_live,
    "streaming_sessionize_agg_live": sessionize_agg_live,
}
ORACLES = {
    "streaming_sessionize_batch": SESSIONIZE_BATCH_SQL,
    "streaming_dedup_batch": DEDUP_EVENTS_SQL,
    "streaming_funnel_batch": FUNNEL_WINDOWS_SQL,
    "streaming_enrich_batch": ENRICH_EVENTS_SQL,
    "streaming_sessionize_live": SESSIONIZE_BATCH_SQL,
    "streaming_funnel_live": FUNNEL_WINDOWS_SQL,
}


def _live_twin_oracles() -> dict[str, str]:
    # the batch twins' SQL, one definition each (operators/relational.py,
    # operators/sketch.py) — the live runs must reproduce the full batch
    # tables bit-for-bit
    from dream_spark.operators.relational import EVENTS_HOURLY_SQL
    from dream_spark.operators.sketch import (
        SKETCH_HLL_HOURLY_SQL,
        SKETCH_KMV_HOURLY_SQL,
    )

    return {
        "streaming_hourly_live": EVENTS_HOURLY_SQL,
        "streaming_kmv_live": SKETCH_KMV_HOURLY_SQL,
        "streaming_hll_live": SKETCH_HLL_HOURLY_SQL,
        "streaming_attribution_live": ATTRIBUTION_LIVE_SQL,
        "streaming_enrich_live": ENRICH_EVENTS_SQL,
        "streaming_funnel_agg_live": FUNNEL_WINDOWS_SQL,
        "streaming_sessionize_agg_live": SESSIONIZE_BATCH_SQL,
    }


ORACLES.update(_live_twin_oracles())
