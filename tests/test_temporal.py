"""Temporal joins (as-of, range) vs DuckDB oracle + semantic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dream_spark.functions.timeutils import epoch_micros
from dream_spark.operators import temporal as T
from dream_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(T.QUERIES))
def test_temporal_oracle(spark, duck, name):
    df = T.QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, duck, T.ORACLES[name])


def test_asof_left_semantics(spark):
    """Every purchase appears exactly once, matched or not."""
    out = T.asof_click_attribution(spark, SF_DIR)
    n_purchases = (
        load_table(spark, SF_DIR, "events").where(F.col("event_type") == "purchase").count()
    )
    assert out.count() == n_purchases
    assert out.select("purchase_id").distinct().count() == n_purchases


def test_asof_click_not_after_purchase(spark):
    out = T.asof_click_attribution(spark, SF_DIR).where(F.col("click_id").isNotNull())
    late = out.where(epoch_micros(out, "click_ts") > epoch_micros(out, "purchase_ts"))
    assert late.count() == 0


def test_range_join_within_window(spark):
    """Attributed value only counts purchases inside (click, click+30min]."""
    out = T.range_join_attribution(spark, SF_DIR)
    assert out.where(F.col("n_purchases") <= 0).count() == 0


def test_funnel_monotone_and_sequential(spark):
    from dream_spark.operators.temporal import FUNNEL_STEPS, funnel
    from dream_spark.sources.tables import load_table

    out = {r["stage"]: r["n_users"] for r in T.funnel_events(spark, SF_DIR).collect()}
    assert list(out) == list(FUNNEL_STEPS)
    # each stage can only lose users, and the top stage is non-empty
    assert out["view"] >= out["click"] >= out["purchase"] and out["view"] > 0
    # sequential semantics: a click BEFORE the first view must not count —
    # synthetic user with click(t1) < view(t2), purchase(t3) reaches stage 1
    # only for click/purchase ordering reasons
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:05", 7, "click", 0.0, "{}"),
            (2, "2024-01-01 00:00:10", 7, "view", 0.0, "{}"),
            (3, "2024-01-01 00:00:20", 7, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["stage"]: r["n_users"] for r in funnel(ev).collect()}
    # user views at t10 but the only click is BEFORE it -> stage 2 empty,
    # so stage 3 (purchase after the stage-2 time) is empty too
    assert got == {"view": 1, "click": 0, "purchase": 0}


def test_asof_join_ignores_null_right_rows(spark):
    """Rights with NULL key or NULL timestamp must never match (join
    semantics) — in the union-sort form they would otherwise sort first
    and be carried onto every left row."""
    from dream_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "p1"), (None, "2024-01-01 10:00:00", "p2")],
        "u int, l_ts string, pid string",
    ).selectExpr("u", "cast(l_ts as timestamp) l_ts", "pid")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", "c_ok"),
            (1, None, "c_null_ts"),
            (None, "2024-01-01 09:30:00", "c_null_key"),
        ],
        "u int, r_ts string, cid string",
    ).selectExpr("u", "cast(r_ts as timestamp) r_ts", "cid")
    rows = {
        r["pid"]: r["cid"]
        for r in asof_join(
            left, right, on="u", left_ts="l_ts", right_ts="r_ts", tiebreak="cid"
        ).collect()
    }
    assert rows == {"p1": "c_ok", "p2": None}


def test_gaps_are_consecutive_pairs(spark):
    """Every reported gap pair is ADJACENT in the user's (ts, id)-ordered
    event sequence, the gap exceeds the threshold, and the count equals a
    driver-side replay."""
    from dream_spark.operators.temporal import GAP_MIN, temporal_gaps
    from dream_spark.functions.timeutils import epoch_micros
    from dream_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    seq: dict = {}
    for r in ev.select("user_id", "event_id", epoch_micros(ev, "ts").alias("us")).collect():
        seq.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))
    thresh = GAP_MIN * 60 * 1_000_000
    want = set()
    for u, rows in seq.items():
        rows.sort()
        for (us0, id0), (us1, id1) in zip(rows, rows[1:]):
            if us1 - us0 > thresh:
                want.add((u, id0, id1, us1 - us0))
    got = {
        (r["user_id"], r["prev_event_id"], r["event_id"], r["gap_us"])
        for r in temporal_gaps(spark, SF_DIR).collect()
    }
    assert got == want


def test_retention_triangle_invariants(spark):
    """Offset-0 mass equals each cohort's size (every user is active in
    their own first week by construction), every later offset is bounded
    by it, and the user masses reconcile with the distinct-user count."""
    from dream_spark.operators.temporal import temporal_retention
    from dream_spark.sources.tables import load_table

    rows = temporal_retention(spark, SF_DIR).collect()
    base = {r["cohort_week"]: r["n_users"] for r in rows if r["week_offset"] == 0}
    assert all(r["week_offset"] >= 0 for r in rows)
    for r in rows:
        assert r["cohort_week"] in base
        assert r["n_users"] <= base[r["cohort_week"]]
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(base.values()) == n_users  # cohorts partition the user set


def test_active_users_reconciles_with_raw_events(spark):
    """DAU and WAU recompute from the raw activity set: wau(day) counts
    distinct users over the trailing 7 observed-day window, wau >= dau
    always, and single-day corpora collapse to wau == dau."""
    from dream_spark.functions.timeutils import epoch_micros
    from dream_spark.operators.temporal import DAY_US, WAU_DAYS, temporal_active
    from dream_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    us = epoch_micros(ev, "ts")
    act = {
        (r["u"], r["d"])
        for r in ev.select(F.col("user_id").alias("u"), us.alias("__us"))
        .select("u", F.expr(f"__us div {DAY_US}").alias("d"))
        .collect()
    }
    rows = temporal_active(spark, SF_DIR).collect()
    # coverage: one output row per active day (also kills a vacuous pass
    # on an empty or day-dropping result)
    assert {r["day"] for r in rows} == {d for _, d in act}
    for r in rows:
        day = r["day"]
        dau = len({u for u, d in act if d == day})
        wau = len({u for u, d in act if day - WAU_DAYS < d <= day})
        assert (r["dau"], r["wau"]) == (dau, wau)
        assert r["wau"] >= r["dau"]


def test_session_concurrency_sweep_semantics(spark):
    """Hand-built intervals pin the sweep-line contract: half-open
    [start, end) — touching sessions never overlap — and the day-level
    carry counts sessions spanning midnight into the next day's peak."""
    import datetime as dt

    from dream_spark.operators.temporal import session_concurrency

    d0 = dt.datetime(2024, 1, 1)

    def s(h0, m0, h1, m1, day_off0=0, day_off1=0):
        return (
            1,
            d0 + dt.timedelta(days=day_off0, hours=h0, minutes=m0),
            d0 + dt.timedelta(days=day_off1, hours=h1, minutes=m1),
            1,
        )

    rows = [
        s(9, 0, 11, 0),            # A 9-11
        s(10, 0, 12, 0),           # B 10-12 (overlaps A -> 2)
        s(10, 30, 10, 45),         # C inside both -> 3
        s(12, 0, 13, 0),           # D starts exactly at B's end: touching, no overlap
        s(23, 0, 1, 0, 0, 1),      # E spans midnight -> day-2 carry = 1
        s(0, 30, 0, 45, 1, 1),     # F day 2, overlaps E's tail -> 2
        s(22, 0, 2, 0, 1, 3),      # G spans days 2-4: day 3 has NO boundary
    ]
    sess = spark.createDataFrame(
        rows, "user_id long, session_start timestamp_ntz, session_end timestamp_ntz, n_events long"
    )
    got = {r["day"]: r["peak_concurrency"] for r in session_concurrency(sess).collect()}
    day0 = (d0 - dt.datetime(1970, 1, 1)).days
    assert got[day0] == 3       # A+B+C at 10:30-10:45
    assert got[day0 + 1] == 2   # E carried over + F
    # day 3 has no boundaries at all (G open throughout): peak = carry = 1
    assert got[day0 + 2] == 1
    # day 4's only boundary is G's end: the day-START carry (1) is the
    # peak, not the post-decrement value (0)
    assert got[day0 + 3] == 1


def test_resample_fills_gaps_and_forward_fills(spark):
    """Hand-built stream: the dense axis materializes empty buckets with
    n_events=0, last_seen_bucket forward-fills across them, and each type
    gets its own [first, last] span (no cross-type bleed)."""
    import datetime as dt

    from dream_spark.operators.temporal import RESAMPLE_US, resample_events

    d0 = dt.datetime(2024, 1, 1)

    def ev(i, hours, typ):
        return (i, d0 + dt.timedelta(hours=hours), 1, typ, 0.0, "{}")

    rows = [
        ev(1, 0, "click"),   # bucket 0 of the day
        ev(2, 1, "click"),   # same 6h bucket
        ev(3, 20, "click"),  # bucket +3: buckets +1,+2 are EMPTY
        ev(4, 7, "view"),    # view spans just one bucket
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    out = {
        (r["event_type"], r["bucket"]): (r["n_events"], r["last_seen_bucket"])
        for r in resample_events(df).collect()
    }
    b0 = int((d0 - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000) // RESAMPLE_US
    assert out[("click", b0)] == (2, b0)
    assert out[("click", b0 + 1)] == (0, b0)      # gap: zero + forward fill
    assert out[("click", b0 + 2)] == (0, b0)
    assert out[("click", b0 + 3)] == (1, b0 + 3)
    assert [k for k in out if k[0] == "view"] == [("view", b0 + 1)]
