"""Temporal join operators over the events stream: as-of join and
range (interval) join — operators Spark lacks as primitives and the
reference lacks entirely (SURVEY.md §2.3), composed from equi-join +
window semantics per the custom-operator ladder (composition of built-in
DataFrame ops before any UDF).

Scale notes:
- Both joins are equi-keyed on ``user_id`` first, so Spark shuffles both
  sides by user and evaluates the temporal predicate within the key group —
  never a cross join.  Skewed users are AQE's skew-join case.
- The as-of "latest prior" pick is a per-left-row top-1 window, the same
  dedup-rank shape Catalyst pipelines after the join without an extra
  shuffle (window partitions by the join's output key).
- All temporal comparisons run on integer microseconds
  (``functions.timeutils.epoch_micros`` / DuckDB ``epoch_us``) so Spark and
  the oracle agree exactly, including on fractional-second gaps, regardless
  of whether the session surfaces the parquet column as TIMESTAMP or
  TIMESTAMP_NTZ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.functions.timeutils import epoch_micros
from dream_spark.sources.tables import load_table

#: attribution window for the range join
RANGE_WINDOW_MIN = 30


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Generic AS-OF join (pandas ``merge_asof`` analog, backward
    direction): for each left row, the single latest right row with
    ``right_ts <= left_ts`` sharing the ``on`` key; LEFT semantics (no
    match → NULL right columns).

    Right-side column names must not collide with left's (rename before
    calling, as with any Spark join).  ``tiebreak`` breaks equal-timestamp
    ties deterministically (highest value wins); always pass one when
    right_ts isn't unique per key.

    Scale shape — the distributed ``merge_asof``: tag and UNION both sides,
    ONE shuffle+sort per key by (ts, side, tiebreak), then a running
    ``last(right-payload-struct, ignorenulls)`` window carries the latest
    right row forward onto each left row.  Linear in events per key — the
    naive join-then-rank form materializes every (left × earlier-right)
    pair per key first, an in-group quadratic that AQE skew-split cannot
    fix (10⁵ clicks × 10⁴ purchases for one power user = 10⁹ intermediate
    rows).  The right payload rides ONE struct column so all its fields
    come from the same matched row atomically."""
    us, side, pay, match = "__asof_us", "__asof_side", "__asof_r", "__asof_m"
    right_cols = [c for c in right.columns if c != on]
    l_us = epoch_micros(left, left_ts)
    r_us = epoch_micros(right, right_ts)
    # side 0 = right, 1 = left: at equal timestamps rights sort FIRST so
    # right_ts == left_ts matches (the <= bound).  Rights with a NULL key
    # or NULL timestamp are dropped up front — a join predicate never
    # matches NULL, but an ascending sort would place NULL-us rows FIRST
    # and the running last() would carry their payload onto every left row
    # (and NULL keys would group together under partitionBy)
    rs = right.where(F.col(on).isNotNull() & r_us.isNotNull()).select(
        F.col(on),
        r_us.alias(us),
        F.lit(0).alias(side),
        F.struct(*[F.col(c) for c in right_cols]).alias(pay),
    )
    ls = left.select(*left.columns, l_us.alias(us), F.lit(1).alias(side))
    u = ls.unionByName(rs, allowMissingColumns=True)
    order = [F.col(us).asc(), F.col(side).asc()]
    if tiebreak is not None:
        # ascending + take-last == "highest tiebreak wins", matching the
        # old rank-DESC pick; left rows sort after ALL rights at equal ts
        # via the side key, so their NULL tiebreak never interleaves
        order.append(F.col(pay)[tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(match, F.last(pay, ignorenulls=True).over(w))
    return matched.where(F.col(side) == 1).select(
        *left.columns, *[F.col(match)[c].alias(c) for c in right_cols]
    )


def _time_bucket(us, width: int):
    """Exact integer floor-division bucket of a microsecond column: the
    always-nonnegative pmod remainder is subtracted first, so the double
    division is exact for |us| < 2^53 (~year 2255) and negative (pre-1970)
    times bucket with floor semantics, not truncate-toward-zero."""
    return ((us - F.pmod(us, F.lit(width))) / F.lit(width)).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Generic RANGE (interval) join: right rows strictly after the left
    row's timestamp and within ``window_us`` microseconds, sharing the
    ``on`` key.  Inner semantics; one output row per qualifying pair.

    Scale shape — bucketed band join: right rows carry their
    ``floor(ts/window)`` bucket; each left row probes exactly the two
    buckets its window can span (an exploded 2-row expansion), and the
    join is EQUI on (key, bucket) with the exact band as a residual
    filter.  In-group work is bounded by events-per-2-windows — keying on
    the user alone would compare every (left × right) pair in a long-lived
    key's history, an in-group quadratic.  Each qualifying pair matches in
    exactly one bucket (the right row's bucket is fixed), so no dedup pass
    is needed."""
    rkey, rb, lb = "__range_rkey", "__range_rb", "__range_lb"
    l_us = epoch_micros(left, left_ts)
    rf = right.withColumnRenamed(on, rkey)
    r_us = epoch_micros(rf, right_ts)
    rf = rf.withColumn(rb, _time_bucket(r_us, window_us))
    lf = left.withColumn(
        lb,
        F.explode(
            F.array(_time_bucket(l_us, window_us), _time_bucket(l_us, window_us) + 1)
        ),
    )
    return lf.join(
        rf,
        (F.col(on) == F.col(rkey))
        & (F.col(lb) == F.col(rb))
        & (r_us > l_us)
        & (r_us <= l_us + window_us),
    ).drop(rkey, rb, lb)


def _typed_events(spark: SparkSession, sf_dir: str, etype: str, prefix: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == etype)
    return ev.select(
        F.col("event_id").alias(f"{prefix}_id"),
        F.col("user_id").alias(f"{prefix}_user"),
        F.col("ts").alias(f"{prefix}_ts"),
        F.col("value").alias(f"{prefix}_value"),
    )


def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for every purchase, the user's latest click at-or-before
    the purchase time (classic last-touch attribution).  LEFT semantics —
    purchases with no prior click keep NULL click columns.

    Shape: equi-join on user + inequality on time, then top-1 per left row
    by (click_ts DESC, click_id DESC) with explicit NULLS LAST so both
    engines rank the unmatched-left row identically.
    """
    p = _typed_events(spark, sf_dir, "purchase", "purchase").withColumnRenamed(
        "purchase_user", "user"
    )
    c = _typed_events(spark, sf_dir, "click", "click").withColumnRenamed("click_user", "user")
    out = asof_join(p, c, on="user", left_ts="purchase_ts", right_ts="click_ts", tiebreak="click_id")
    return out.select(
        "purchase_id",
        F.col("user").alias("purchase_user"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


ASOF_SQL = """
SELECT purchase_id, purchase_user, purchase_ts, click_id, click_ts
FROM (
  SELECT p.event_id AS purchase_id, p.user_id AS purchase_user, p.ts AS purchase_ts,
         c.event_id AS click_id, c.ts AS click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
  FROM events p
  LEFT OUTER JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
   AND epoch_us(c.ts) <= epoch_us(p.ts)
  WHERE p.event_type = 'purchase'
)
WHERE rn = 1
""".strip()


def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (interval) JOIN: purchases landing within RANGE_WINDOW_MIN
    minutes *after* each click, aggregated per click — the banded-time join
    every attribution/feature pipeline needs."""
    win_us = RANGE_WINDOW_MIN * 60 * 1_000_000
    c = _typed_events(spark, sf_dir, "click", "click").withColumnRenamed("click_user", "user")
    p = _typed_events(spark, sf_dir, "purchase", "purchase").withColumnRenamed(
        "purchase_user", "user"
    )
    joined = range_join(
        c, p, on="user", left_ts="click_ts", right_ts="purchase_ts", window_us=win_us
    ).withColumnRenamed("user", "click_user")
    return joined.groupBy("click_id", "click_user").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("purchase_value").cast("decimal(12,2)")).cast("double").alias("attributed_value"),
    )


RANGE_SQL = f"""
SELECT c.event_id AS click_id, c.user_id AS click_user,
       COUNT(*) AS n_purchases,
       CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id AND p.event_type = 'purchase'
 AND epoch_us(p.ts) > epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + {RANGE_WINDOW_MIN * 60 * 1_000_000}
WHERE c.event_type = 'click'
GROUP BY c.event_id, c.user_id
""".strip()


#: ordered funnel stages for the driver-contract wrapper
FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key funnel stage times: (keys..., s1..sk) where ``s_i`` is the
    earliest step-``i`` event time (integer µs) at-or-after the key's
    step-``i-1`` time, NULL when the stage was never reached.  ``keys``
    defaults to ``[user_id]``; pass ``[user_id, window_start]`` for a
    windowed funnel.  One shuffle on the key tuple; the k chained window
    mins reuse that exchange (unbounded frames, no sort)."""
    keys = keys or ["user_id"]
    us = epoch_micros(events, ts_col)
    w = Window.partitionBy(*keys)
    df = events.select(*keys, F.col(type_col).alias("__t"), us.alias("__us"))
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond = F.col("__t") == step
        if prev is not None:
            cond = cond & (F.col("__us") >= F.col(prev))
        df = df.withColumn(f"__s{i}", F.min(F.when(cond, F.col("__us"))).over(w))
        prev = f"__s{i}"
    return df.groupBy(*keys).agg(
        *[F.max(f"__s{i}").alias(f"s{i}") for i in range(1, len(steps) + 1)]
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis for ANY event DataFrame: how many users
    reach each stage, where stage k counts only events at-or-after the
    user's stage k-1 time (the sequential-conversion semantics product
    analytics engines ship as a primitive; Spark has no built-in).

    Returns (stage_idx, stage, n_users) — one row per step.

    Shape: ONE shuffle on the user key, then k chained unbounded window
    mins over the same partitioning (Catalyst reuses the exchange; no sort
    — the frames are unbounded), a per-user aggregate, and a 3-row unpivot.
    Users are near-uniform keys, so this scales like any per-user window;
    a celebrity-user skew is AQE's case.  All time comparisons are integer
    microseconds (``epoch_micros``), so TIMESTAMP vs TIMESTAMP_NTZ
    sessions and the DuckDB oracle agree exactly."""
    per_user = funnel_stages(events, steps, [user_col], ts_col, type_col)
    counts = per_user.agg(
        *[F.count(f"s{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)]
    )
    stack = ", ".join(
        f"CAST({i} AS BIGINT), '{step}', n{i}" for i, step in enumerate(steps, start=1)
    )
    return counts.select(
        F.expr(f"stack({len(steps)}, {stack}) AS (stage_idx, stage, n_users)")
    )


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: the view→click→purchase funnel over events."""
    return funnel(load_table(spark, sf_dir, "events"))


def _funnel_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    """DuckDB twin: chained per-user conditional-min CTEs (each stage joins
    the previous stage's per-user time), then the stage-count unpivot."""
    parts = [
        f"u1 AS (SELECT user_id, MIN(CASE WHEN event_type = '{steps[0]}'"
        f" THEN epoch_us(ts) END) AS s1 FROM events GROUP BY user_id)"
    ]
    for i in range(2, len(steps) + 1):
        prev_cols = ", ".join(f"u{i-1}.s{j}" for j in range(1, i))
        parts.append(
            f"u{i} AS (SELECT e.user_id, {prev_cols},"
            f" MIN(CASE WHEN e.event_type = '{steps[i-1]}'"
            f" AND epoch_us(e.ts) >= u{i-1}.s{i-1} THEN epoch_us(e.ts) END) AS s{i}"
            f" FROM events e JOIN u{i-1} ON e.user_id = u{i-1}.user_id"
            f" GROUP BY e.user_id, {prev_cols})"
        )
    last = f"u{len(steps)}"
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS stage_idx, '{step}' AS stage,"
        f" COUNT(s{i}) AS n_users FROM {last}"
        for i, step in enumerate(steps, start=1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + unions


FUNNEL_SQL = _funnel_sql()


#: inactivity threshold for gap detection
GAP_MIN = 60


def inactivity_gaps(
    events: DataFrame,
    gap_min: int = GAP_MIN,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user inactivity gaps: consecutive-event pairs (by time, id
    tiebreak) more than ``gap_min`` minutes apart — the dual of
    sessionization (these pairs are exactly where a session-cut falls) and
    the standard churn/outage probe.  ONE shuffle on the user key + a lag
    window over that same exchange; the gap predicate is row-local, so
    output size is bounded by #events and nothing quadratic exists in any
    key group.  Integer-µs arithmetic end to end."""
    us = epoch_micros(events, ts_col)
    w = Window.partitionBy(user_col).orderBy(F.col("__us").asc(), F.col(id_col).asc())
    gap = gap_min * 60 * 1_000_000
    return (
        events.select(user_col, id_col, us.alias("__us"))
        .withColumn("__prev_id", F.lag(id_col).over(w))
        .withColumn("__prev_us", F.lag("__us").over(w))
        .where(F.col("__us") - F.col("__prev_us") > gap)
        .select(
            F.col(user_col),
            F.col("__prev_id").alias("prev_event_id"),
            F.col(id_col).alias("event_id"),
            (F.col("__us") - F.col("__prev_us")).alias("gap_us"),
        )
    )


def temporal_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: >60-minute inactivity gaps in events."""
    return inactivity_gaps(load_table(spark, sf_dir, "events"))


TEMPORAL_GAPS_SQL = f"""
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         LAG(event_id) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_event_id,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
)
SELECT user_id, prev_event_id, event_id, us - prev_us AS gap_us
FROM seq WHERE us - prev_us > {GAP_MIN * 60 * 1_000_000}
""".strip()


#: one cohort/activity bucket in integer microseconds (7 days)
WEEK_US = 7 * 86_400 * 1_000_000


def cohort_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Weekly cohort retention: ``(cohort_week, week_offset, n_users)`` —
    of the users whose FIRST event fell in ``cohort_week``, how many were
    active again ``week_offset`` weeks later (offset 0 = the cohort size
    itself).  The standard product-analytics retention triangle.

    Weeks are ``epoch_µs div WEEK_US`` — plain integer buckets, NOT
    calendar ISO weeks, so both engines bucket identically with no
    timezone/week-numbering semantics in play.  Scale shape: one distinct
    (user, week) shuffle (activity), one min-aggregate on user (cohorts),
    then a user-keyed join (the cohort table is #users rows — far under
    the event count and independent of history length) and one
    partial-agg rollup to the at-most-#weeks² result."""
    us = epoch_micros(events, ts_col)
    act = (
        events.select(F.col(user_col).alias("u"), us.alias("__us"))
        # exact int64 division (`div`, mirroring DuckDB `//`): a double
        # `/`-then-cast could round across a bucket boundary
        .select("u", F.expr(f"__us div {WEEK_US}").alias("wk"))
        .distinct()
    )
    cohort = act.groupBy("u").agg(F.min("wk").alias("cohort_wk"))
    return (
        act.join(cohort, on="u")
        .groupBy(
            F.col("cohort_wk").alias("cohort_week"),
            (F.col("wk") - F.col("cohort_wk")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def temporal_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: weekly cohort retention over events."""
    return cohort_retention(load_table(spark, sf_dir, "events"))


TEMPORAL_RETENTION_SQL = f"""
WITH act AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {WEEK_US} AS wk FROM events
),
cohort AS (SELECT u, MIN(wk) AS cohort_wk FROM act GROUP BY u)
SELECT c.cohort_wk AS cohort_week, a.wk - c.cohort_wk AS week_offset,
       COUNT(*) AS n_users
FROM act a JOIN cohort c USING (u)
GROUP BY cohort_week, week_offset
""".strip()


#: one activity day in integer microseconds
DAY_US = 86_400 * 1_000_000
#: trailing window for WAU, in days
WAU_DAYS = 7


def active_users(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Daily and trailing-7-day active users per day: ``(day, dau, wau)``
    — the standard product-activity metric pair (stickiness = dau/wau is
    left to the consumer so the output stays exact-integer).

    Days are ``epoch_µs div DAY_US`` integer buckets (no calendar/zone
    semantics, identical on both engines).  WAU needs a trailing DISTINCT
    over a sliding window, which no per-key window function gives exactly
    — the lowering is a bounded RANGE self-join: each (user, active-day)
    row joins the ≤7 observed days in its trailing window, then a
    distinct-count per day.  Scale shape: the distinct (user, day)
    activity frame is bounded by users × active-days; the day table it
    range-joins is #days rows (broadcast), so the expansion is ≤7× the
    activity frame and the final count is one partial-agg shuffle."""
    us = epoch_micros(events, ts_col)
    act = (
        events.select(F.col(user_col).alias("u"), us.alias("__us"))
        .select("u", F.expr(f"__us div {DAY_US}").alias("day"))
        .distinct()
    )
    days = act.select("day").distinct()
    trailing = act.alias("a").join(
        F.broadcast(days.alias("d")),
        (F.col("a.day") <= F.col("d.day"))
        & (F.col("a.day") > F.col("d.day") - WAU_DAYS),
    )
    # ONE aggregation carries both counts: the trailing frame contains the
    # same-day rows, so dau is the distinct count restricted to them — no
    # second scan of the activity lineage, no day-keyed join afterwards
    return (
        trailing.groupBy(F.col("d.day").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("a.day") == F.col("d.day"), F.col("a.u"))
            ).alias("dau"),
            F.countDistinct("a.u").alias("wau"),
        )
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
        )
    )


def temporal_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: DAU/WAU over events."""
    return active_users(load_table(spark, sf_dir, "events"))


TEMPORAL_ACTIVE_SQL = f"""
WITH act AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {DAY_US} AS day FROM events
),
days AS (SELECT DISTINCT day FROM act)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(COUNT(DISTINCT CASE WHEN a.day = d.day THEN a.u END) AS BIGINT) AS dau,
       CAST(COUNT(DISTINCT a.u) AS BIGINT) AS wau
FROM act a JOIN days d ON a.day <= d.day AND a.day > d.day - {WAU_DAYS}
GROUP BY d.day
""".strip()


# --------------------------------------------------------------------------
# peak session concurrency (sweep line, two-level prefix sum)
# --------------------------------------------------------------------------
def session_concurrency(sessions: DataFrame) -> DataFrame:
    """(day, peak_concurrency) — the boundary-sampled peak number of
    simultaneously open sessions per day, for ANY ``(session_start,
    session_end)`` interval frame.

    Sweep line: each session contributes +1 at its start and -1 at its
    end; the running sum over boundaries ordered by (ts, starts-first) is
    the live concurrency.  Ordering starts (+1) BEFORE ends (-1) at equal
    timestamps makes the interval CLOSED [start, end]: a zero-duration
    session (session_start == session_end — common, since the sessionizer
    emits MIN/MAX ts, so one-event sessions are points) still registers
    +1 before its -1 cancels it, and two sessions that merely touch count
    as overlapping for that instant.  (r6 ADVICE: the previous half-open
    ordering made point sessions invisible — days dominated by one-event
    sessions reported peak 0.)  "Boundary-sampled" = concurrency is
    evaluated at the day's START (the carry) and at every boundary
    instant within the day: peak = carry + max(0, max in-day prefix sum).
    The day axis is the full [first, last] boundary-day range, so a day
    whose only activity is sessions carried over unchanged (no boundary
    at all — e.g. the middle day of a 3-day session) still reports its
    true peak, the carry.

    Scale shape — the textbook formulation is a running sum over ONE
    unpartitioned window, which serializes the whole timeline through a
    single task.  This is the two-level prefix sum instead: per-day
    running sums (day-partitioned shuffle, parallel across days) plus a
    day-level carry over the dense day table, which is calendar-sized
    (365 rows/year) so its unpartitioned window is a non-issue at any
    data scale."""
    starts = sessions.select(F.col("session_start").alias("ts"), F.lit(1).alias("delta"))
    ends = sessions.select(F.col("session_end").alias("ts"), F.lit(-1).alias("delta"))
    both = starts.unionByName(ends)
    # integer epoch-day buckets and integer-microsecond ordering (the
    # module's exact-time contract; a DATE column would round-trip as
    # python objects vs datetime64 across the engines)
    # exact int64 division (__us div N), NEVER float-divide-then-cast — a
    # double quotient can round across a bucket boundary above 2^53 µs and
    # diverge from the oracle's integer `//` (the module-wide contract)
    deltas = both.select(
        epoch_micros(both, "ts").alias("__us"), "delta"
    ).select(
        F.col("__us").alias("us"),
        "delta",
        F.expr(f"__us div {DAY_US}").alias("day"),
    )
    # delta DESC = starts (+1) before ends (-1) at equal us: closed
    # intervals.  Ties within one delta value are order-insensitive for
    # MAX(running sum): all-(+1) ties peak after the last, all-(-1) ties
    # peak before the first, either way a fixed value.
    w_day = Window.partitionBy("day").orderBy("us", F.col("delta").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    in_day = deltas.select("day", F.sum("delta").over(w_day).alias("run_in_day"))
    peak = in_day.groupBy("day").agg(F.max("run_in_day").alias("in_day_max"))
    # DENSE day axis [first, last]: boundary-less middle days of long
    # sessions must still report their carry
    bounds = deltas.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    all_days = bounds.select(F.explode(F.sequence("mn", "mx")).alias("day"))
    day_tot = deltas.groupBy("day").agg(F.sum("delta").alias("day_total"))
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carried = all_days.join(day_tot, on="day", how="left").select(
        "day",
        F.coalesce(
            F.sum(F.coalesce(F.col("day_total"), F.lit(0))).over(w_days), F.lit(0)
        ).alias("carry"),
    )
    return carried.join(peak, on="day", how="left").select(
        "day",
        (
            F.col("carry")
            + F.greatest(F.lit(0), F.coalesce(F.col("in_day_max"), F.lit(0)))
        )
        .cast("long")
        .alias("peak_concurrency"),
    )


def temporal_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: peak concurrent 30-minute-gap sessions per
    day over the events table (sessions from the shared gaps-and-islands
    sessionizer, streaming/events.sessionize_batch)."""
    from dream_spark.streaming.events import sessionize_batch

    return session_concurrency(sessionize_batch(spark, sf_dir))


def _concurrency_sql() -> str:
    from dream_spark.streaming.events import SESSIONIZE_BATCH_SQL

    return f"""
WITH sessions AS (
{SESSIONIZE_BATCH_SQL}
),
deltas AS (
  SELECT epoch_us(session_start) AS us, 1 AS delta,
         epoch_us(session_start) // {DAY_US} AS day FROM sessions
  UNION ALL
  SELECT epoch_us(session_end) AS us, -1 AS delta,
         epoch_us(session_end) // {DAY_US} AS day FROM sessions
),
run AS (
  SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY us, delta DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_in_day
  FROM deltas
),
peak AS (SELECT day, MAX(run_in_day) AS in_day_max FROM run GROUP BY day),
bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM deltas),
days AS (SELECT UNNEST(generate_series(mn, mx)) AS day FROM bounds),
tot AS (SELECT day, SUM(delta) AS day_total FROM deltas GROUP BY day),
carried AS (
  SELECT d.day, COALESCE(SUM(COALESCE(t.day_total, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
  FROM days d LEFT JOIN tot t ON t.day = d.day
)
SELECT c.day, CAST(c.carry + GREATEST(0, COALESCE(p.in_day_max, 0)) AS BIGINT) AS peak_concurrency
FROM carried c LEFT JOIN peak p ON p.day = c.day
""".strip()


# --------------------------------------------------------------------------
# gap-filled resampling (dense time axis + forward fill)
# --------------------------------------------------------------------------
#: resample bucket width in integer microseconds (6 hours)
RESAMPLE_US = 6 * 3600 * 1_000_000


def resample_events(
    events: DataFrame, bucket_us: int = RESAMPLE_US
) -> DataFrame:
    """Gap-FILLED resampling per event type: every ``bucket_us`` bucket on
    the DENSE [first, last] axis gets a row — n_events (0 on empty
    buckets) and last_seen_bucket, the most recent bucket with activity at
    or before this one (forward fill).  The staleness gap
    ``bucket - last_seen_bucket`` is the monitoring signal resampling
    exists for: an aggregation over observed rows only CANNOT see a
    silent source, because the empty buckets aren't rows.

    Shape: observed buckets come from one partial-agg shuffle; the dense
    axis is #types × #buckets rows (bounded by calendar time, not data —
    e.g. 1460 rows/type/year at 6 h), an explode over the per-type
    [min, max] span rows (no join builds it); the gap-fill join and the
    last(ignorenulls) forward-fill window then run over the two
    calendar-bounded frames — never over the event stream itself."""
    obs = (
        events.select("event_type", epoch_micros(events, "ts").alias("__us"))
        .select("event_type", F.expr(f"__us div {bucket_us}").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    span = obs.groupBy("event_type").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    dense = span.select(
        "event_type", F.explode(F.sequence("mn", "mx")).alias("bucket")
    )
    filled = dense.join(obs, on=["event_type", "bucket"], how="left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    active = F.when(F.col("n_events").isNotNull(), F.col("bucket"))
    return filled.select(
        "event_type",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last(active, ignorenulls=True).over(w).alias("last_seen_bucket"),
    )


def temporal_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: 6-hour gap-filled resample of events."""
    return resample_events(load_table(spark, sf_dir, "events"))


TEMPORAL_RESAMPLE_SQL = f"""
WITH obs AS (
  SELECT event_type, epoch_us(ts) // {RESAMPLE_US} AS bucket, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx FROM obs GROUP BY event_type),
dense AS (SELECT event_type, UNNEST(generate_series(mn, mx)) AS bucket FROM span),
filled AS (
  SELECT d.event_type, d.bucket, o.n_events
  FROM dense d LEFT JOIN obs o ON o.event_type = d.event_type AND o.bucket = d.bucket
)
SELECT event_type, bucket,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       MAX(CASE WHEN n_events IS NOT NULL THEN bucket END)
         OVER (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen_bucket
FROM filled
""".strip()


QUERIES = {
    "temporal_asof": asof_click_attribution,
    "temporal_range": range_join_attribution,
    "temporal_funnel": funnel_events,
    "temporal_gaps": temporal_gaps,
    "temporal_retention": temporal_retention,
    "temporal_active": temporal_active,
    "temporal_concurrency": temporal_concurrency,
    "temporal_resample": temporal_resample,
}

ORACLES = {
    "temporal_asof": ASOF_SQL,
    "temporal_range": RANGE_SQL,
    "temporal_funnel": FUNNEL_SQL,
    "temporal_gaps": TEMPORAL_GAPS_SQL,
    "temporal_retention": TEMPORAL_RETENTION_SQL,
    "temporal_active": TEMPORAL_ACTIVE_SQL,
    "temporal_concurrency": _concurrency_sql(),
    "temporal_resample": TEMPORAL_RESAMPLE_SQL,
}
