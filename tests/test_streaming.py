"""Structured Streaming operators: run real streams with availableNow
triggers into memory sinks, compare against batch twins; sessionize batch
twin vs DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_dedup_batch_oracle(spark, duck):
    assert_oracle_match(SE.dedup_events_batch(spark, SF_DIR), duck, SE.DEDUP_EVENTS_SQL)


@pytest.mark.slow
def test_sessionize_live_equals_batch_twin(spark):
    """The ACTUAL availableNow trigger run (with the flush sentinel) must
    emit the COMPLETE closed session set — exactly equal to the batch
    twin, not merely a subset.  This is the stream-mode/twin equivalence
    the driver's oracle row (streaming_sessionize_live) also pins."""
    live = sorted(map(tuple, SE.sessionize_live(spark, SF_DIR).collect()))
    batch = sorted(map(tuple, SE.sessionize_batch(spark, SF_DIR).collect()))
    assert live == batch and len(live) > 0


@pytest.mark.slow
def test_sessionize_agg_live_equals_batch_twin(spark):
    """Spark's native session_window (gap widened +1µs to match the <=
    merge semantics exactly) must emit exactly the batch twin's sessions
    — and therefore exactly the custom stateful sessionizer's."""
    live = sorted(map(tuple, SE.sessionize_agg_live(spark, SF_DIR).collect()))
    batch = sorted(map(tuple, SE.sessionize_batch(spark, SF_DIR).collect()))
    assert live == batch and len(live) > 0


@pytest.mark.slow
def test_funnel_agg_live_equals_batch_twin(spark):
    """The JVM windowed-agg funnel (the 100-TB path: collect_list state +
    array-min chain, no per-key Python) must emit exactly the batch
    twin's rows — and therefore exactly the stateful funnel_stream's."""
    live = sorted(map(tuple, SE.funnel_agg_live(spark, SF_DIR).collect()))
    batch = sorted(
        map(
            tuple,
            SE.funnel_windows_batch(spark, SF_DIR)
            .select("user_id", "window_start", "stage_reached")
            .collect(),
        )
    )
    assert live == batch and len(live) > 0


@pytest.mark.slow
def test_funnel_live_equals_batch_twin(spark):
    live = sorted(map(tuple, SE.funnel_live(spark, SF_DIR).collect()))
    batch = sorted(
        map(
            tuple,
            SE.funnel_windows_batch(spark, SF_DIR)
            .select("user_id", "window_start", "stage_reached")
            .collect(),
        )
    )
    assert live == batch and len(live) > 0


@pytest.mark.slow
def test_hourly_live_equals_batch_twin(spark):
    """The stateless watermark-window live run (append mode + flush
    sentinel) must emit the COMPLETE hourly table — exactly the batch
    aggregation, with the sentinel's own window never closing."""
    from dream_spark.operators.relational import events_hourly

    live = sorted(map(tuple, SE.hourly_live(spark, SF_DIR).collect()))
    batch = sorted(
        map(
            tuple,
            events_hourly(spark, SF_DIR)
            .select("hour", "event_type", "n_events", "sum_value")
            .collect(),
        )
    )
    assert live == batch and len(live) > 0


@pytest.mark.slow
def test_sketch_live_entries_equal_batch_twins(spark):
    """The bounded-state sketch live runs (kmv order statistic, hll dense
    registers) must emit exactly the batch twins' hourly rows once the
    sentinel closes every real window."""
    from dream_spark.operators.sketch import sketch_hll_hourly, sketch_kmv_hourly

    kl = sorted(map(tuple, SE.kmv_live(spark, SF_DIR).collect()))
    kb = sorted(map(tuple, sketch_kmv_hourly(spark, SF_DIR).collect()))
    assert kl == kb and len(kl) > 0
    hl = sorted(map(tuple, SE.hll_live(spark, SF_DIR).collect()))
    hb = sorted(map(tuple, sketch_hll_hourly(spark, SF_DIR).collect()))
    assert hl == hb and len(hl) > 0


def test_hash_domain_guard():
    """kmv/hll streams fail LOUDLY outside the 31-bit hash domain instead
    of silently diverging from the batch/oracle twin (numpy floored %
    vs Spark truncated %)."""
    import numpy as np

    SE._check_hash_domain(np.array([0, 2**31 - 1], dtype="int64"))  # in-domain
    SE._check_hash_domain(np.array([], dtype="int64"))  # empty batch
    with pytest.raises(ValueError):
        SE._check_hash_domain(np.array([-1], dtype="int64"))
    with pytest.raises(ValueError):
        SE._check_hash_domain(np.array([5, 2**31], dtype="int64"))


@pytest.mark.slow
def test_dedup_stream_drops_duplicates(spark):
    """Two unioned copies of the stream dedup down to one row per event."""
    s1 = SE.read_events_stream(spark, SF_DIR)
    s2 = SE.read_events_stream(spark, SF_DIR)
    deduped = SE.dedup_stream(s1.unionAll(s2))
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    from dream_spark.sources.tables import load_table

    n_events = load_table(spark, SF_DIR, "events").count()
    got = spark.sql("select count(*) c, count(distinct event_id) d from dedup_sink").first()
    assert got["c"] == got["d"] == n_events


@pytest.mark.slow
def test_stream_parquet_sink_roundtrip(spark, tmp_path):
    """foreachBatch-free sink check: stream → parquet files → re-read equals
    the batch aggregation."""
    from dream_spark.operators.relational import events_hourly

    stream = SE.hourly_counts_stream(SE.read_events_stream(spark, SF_DIR))
    out = str(tmp_path / "hourly_out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly(spark, SF_DIR).collect()
    }
    # append mode emits only watermark-finalized windows: a non-empty exact
    # subset of the batch result (the trailing horizon stays open)
    assert got and got.items() <= want.items()


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


@pytest.mark.slow
def test_attribution_stream_matches_batch_range_join(spark):
    """The watermarked stream-stream interval join must produce exactly the
    pairs the batch range_join produces once the stream drains
    (availableNow)."""
    from dream_spark.operators.temporal import RANGE_WINDOW_MIN, range_join
    from dream_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    joined = SE.attribution_stream(
        SE.read_events_stream(spark, SF_DIR), window_min=RANGE_WINDOW_MIN
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql("select * from attr_sink").collect()
    }

    ev = load_table(spark, SF_DIR, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("user"), F.col("ts").alias("click_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("user"), F.col("ts").alias("purchase_ts")
    )
    want = {
        (r["click_id"], r["purchase_id"])
        for r in range_join(
            c, p, on="user", left_ts="click_ts", right_ts="purchase_ts",
            window_us=RANGE_WINDOW_MIN * 60 * 1_000_000,
        ).collect()
    }
    assert got == want and len(want) > 0


def test_enrich_stream_static_join(spark):
    """Stream-static enrichment must attach the dimension row to every
    event (left semantics) and run stateless — each micro-batch re-plans
    the static side."""
    from pyspark.sql import functions as F

    from dream_spark.sources.tables import load_table
    from dream_spark.streaming.events import (
        enrich_stream,
        read_events_stream,
        user_profile_dim,
    )

    dim = user_profile_dim(spark, SF_DIR)
    out = enrich_stream(read_events_stream(spark, SF_DIR), dim)
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enriched_events")
    ev = load_table(spark, SF_DIR, "events")
    assert got.count() == ev.count()
    # every event's user exists in the dim (derived from the same table):
    # no NULL profile columns
    assert got.where(F.col("n_events").isNull()).count() == 0
    one = got.limit(1).collect()[0]
    assert one["first_seen"] is not None and one["n_events"] >= 1


def test_cms_stream_matches_batch_sketch(spark):
    """The windowed streaming CMS, drained with availableNow, must equal
    the batch CMS computed per hour window — counter for counter."""
    from pyspark.sql import functions as F

    from dream_spark.operators.sketch import cms_table
    from dream_spark.sources.tables import load_table

    stream = SE.cms_stream(SE.read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("cms_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"], r["row"], r["bucket"]): r["cnt"]
        for r in spark.sql("select * from cms_sink").collect()
    }
    ev = load_table(spark, SF_DIR, "events").where(F.col("user_id").isNotNull())
    ev = ev.withColumn("hour", F.date_trunc("hour", F.col("ts").cast("timestamp")))
    want = {}
    for hr in [r["hour"] for r in ev.select("hour").distinct().collect()]:
        for r in cms_table(ev.where(F.col("hour") == hr), "user_id").collect():
            want[(hr, r["row"], r["bucket"])] = r["cnt"]
    assert got == want


@pytest.mark.slow
def test_funnel_stream_matches_batch_windows(spark):
    """Closed (user, window) funnel stages emitted by the stream must
    equal the batch windowed-funnel twin on those keys; the final
    windows may still be open at availableNow termination (watermark
    never passes them), so the emitted set is a subset."""
    stream = SE.funnel_stream(SE.read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["window_start"]): r["stage_reached"]
        for r in spark.sql("select * from funnel_sink").collect()
    }
    # the stream reader casts NTZ->timestamp; normalize the batch twin's
    # window_start through the same cast for key comparison
    batch = {
        (r["user_id"], r["window_start"]): r["stage_reached"]
        for r in SE.funnel_windows_batch(spark, SF_DIR)
        .withColumn("window_start", F.col("window_start").cast("timestamp"))
        .collect()
    }
    assert got, "stream emitted no closed windows"
    mismatched = {k for k, v in got.items() if batch.get(k) != v}
    assert not mismatched, sorted(mismatched)[:5]


def test_merge_session_islands_late_split():
    """A late event more than a gap BEFORE the open session forms its own
    closed earlier island (batch gaps-and-islands semantics) instead of
    stretching the open session backwards past the gap."""
    gap = 100
    # open session [1000, 1200] (5 events); late lone event at 500
    closed, open_sess = SE.merge_session_islands([(500, 500, 1), (1000, 1200, 5)], gap)
    assert closed == [(500, 500, 1)]
    assert open_sess == (1000, 1200, 5)
    # within-gap late event still extends the open session backwards
    closed, open_sess = SE.merge_session_islands([(950, 950, 1), (1000, 1200, 5)], gap)
    assert closed == []
    assert open_sess == (950, 1200, 6)
    # chained late events bridge into the open session exactly like batch
    closed, open_sess = SE.merge_session_islands(
        [(700, 700, 1), (790, 790, 1), (880, 880, 1), (950, 1200, 5)], gap
    )
    assert closed == []
    assert open_sess == (700, 1200, 8)
    # forward gap still closes the earlier island
    closed, open_sess = SE.merge_session_islands([(100, 150, 2), (400, 400, 1)], gap)
    assert closed == [(100, 150, 2)]
    assert open_sess == (400, 400, 1)
    assert SE.merge_session_islands([], gap) == ([], None)


@pytest.mark.slow
def test_kmv_stream_matches_batch_windows(spark):
    """Closed stream windows must equal the batch per-window KMV rows
    EXACTLY (same hash constants, same estimator) — the merge contract
    between the bounded-state stream sketch and its batch twin."""
    from dream_spark.operators.sketch import kmv_distinct_by_window
    from dream_spark.sources.tables import load_table

    stream = SE.kmv_stream(SE.read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("kmv_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not finish"
    got = {
        r["hour_bucket"]: (r["k"], r["n_kept"], r["kth_min"], r["est_distinct"])
        for r in spark.sql("select * from kmv_sink").collect()
    }
    batch = {
        r["hour_bucket"]: (r["k"], r["n_kept"], r["kth_min"], r["est_distinct"])
        for r in kmv_distinct_by_window(
            load_table(spark, SF_DIR, "events"), "user_id"
        ).collect()
    }
    assert got, "stream emitted no closed windows"
    # the watermark leaves only the last few windows open at end-of-stream
    assert len(got) >= len(batch) - 4, (len(got), len(batch))
    mismatched = {b for b, v in got.items() if batch.get(b) != v}
    assert not mismatched, sorted(mismatched)[:5]


@pytest.mark.slow
def test_hll_stream_matches_batch_windows(spark):
    """Closed stream windows must equal the batch per-window HLL rows
    EXACTLY (same hash, same quadratic mixer, same integer estimator) —
    the merge contract between the dense-register stream sketch and its
    batch twin."""
    from dream_spark.operators.sketch import hll_by_window
    from dream_spark.sources.tables import load_table

    stream = SE.hll_stream(SE.read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("hll_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not finish"
    got = {
        r["hour_bucket"]: (r["m_obs"], r["est"])
        for r in spark.sql("select * from hll_sink").collect()
    }
    batch = {
        r["hour_bucket"]: (r["m_obs"], r["est"])
        for r in hll_by_window(load_table(spark, SF_DIR, "events"), "user_id").collect()
    }
    assert got, "stream emitted no closed windows"
    # the watermark leaves only the last few windows open at end-of-stream
    assert len(got) >= len(batch) - 4, (len(got), len(batch))
    mismatched = {b for b, v in got.items() if batch.get(b) != v}
    assert not mismatched, sorted(mismatched)[:5]


def test_stream_digest_is_per_stream():
    """r8 VERDICT task 5: the live-run cache signature must be a function
    of the ONE stream it caches (plus shared plumbing), so a one-line
    edit to one stream operator re-runs one trigger run, not nine.
    Pinned structurally: each stream's dedicated operator function
    appears ONLY in its own digest parts (editing funnel_stream cannot
    invalidate the sessionize artifact), every digest still folds the
    shared plumbing (sentinel row, _live_run_path reconcile logic), and
    an unknown name falls back to digesting the whole module — the safe
    direction for a stream added without a deps row."""
    import inspect
    import sys

    from dream_spark.functions.artifacts import source_digest

    names = [
        "sessionize", "sessionize_agg", "funnel", "funnel_agg", "hourly",
        "kmv", "hll", "attribution", "enrich",
    ]
    own = {
        "sessionize": SE.sessionize_stream,
        "sessionize_agg": SE.sessionize_stream_agg,
        "funnel": SE.funnel_stream,
        "funnel_agg": SE.funnel_stream_agg,
        "hourly": SE.hourly_counts_stream,
        "kmv": SE.kmv_stream,
        "hll": SE.hll_stream,
        "attribution": SE.attribution_stream,
        "enrich": SE._enrich_projected,
    }
    parts = {n: SE._stream_digest_parts(n) for n in names}
    digests = {n: source_digest(*parts[n]) for n in names}
    assert len(set(digests.values())) == len(names), digests
    for a in names:
        # own operator present; every OTHER stream's operator absent
        assert own[a] in parts[a], a
        for b in names:
            if b != a:
                assert own[b] not in parts[a], (a, b)
        # shared plumbing folded everywhere: sentinel + reconcile logic
        assert repr(SE._SENTINEL_ROW) in parts[a], a
        assert SE._live_run_path in parts[a], a
        # and never the whole module (that is the nine-run invalidation
        # the narrowing removes)
        assert sys.modules["dream_spark.streaming.events"] not in parts[a], a
    # unknown stream -> whole-module fallback, and it actually digests
    fallback = SE._stream_digest_parts("no_such_stream")
    assert sys.modules["dream_spark.streaming.events"] in fallback
    assert isinstance(source_digest(*fallback), str)
    # the digest is source-sensitive: dropping any one part changes it
    # (the property that makes "touch one stream fn -> only that cache
    # dir rebuilds" hold, without running nine live streams in a test)
    for n in names:
        assert source_digest(*parts[n][:-1]) != digests[n], n
    # sanity: parts are digestible (strings or source-inspectable)
    for n in names:
        for p in parts[n]:
            assert isinstance(p, str) or inspect.getsource(p), (n, p)


def test_stream_digest_closure_covers_referenced_globals():
    """r9 ADVICE: the per-stream deps table in _stream_digest_parts is
    hand-maintained, so a KNOWN stream that later gains a new module-level
    helper/constant dependency could silently miss it — later edits to
    that helper would not invalidate the cached sink, and a stale green
    oracle row could mask a regression until an unrelated rebuild.  Guard
    mechanically: every module-level name referenced by each stream
    function's code object (recursing into nested code objects — the
    applyInPandasWithState inner functions — and transitively into
    same-module helper functions that are themselves digest parts) must
    be covered by that stream's digest parts:

      * an object part by identity, or
      * a function/class whose defining module is itself a part (whole
        module source digested), or
      * third-party (non-dream_spark) — pyspark/pandas surface, stable
        relative to this repo's semantics, or
      * a constant whose str()/repr() is folded into the string parts.

    Anything else is an uncovered dependency and fails with the missing
    name, which is exactly the signal to extend the deps row."""
    import inspect
    import types

    def referenced_names(fn) -> set:
        names: set = set()
        stack = [fn.__code__]
        while stack:
            co = stack.pop()
            names |= set(co.co_names)
            for const in co.co_consts:
                if isinstance(const, types.CodeType):
                    stack.append(const)
        return names

    module_globals = vars(SE)
    streams = {
        "sessionize": SE.sessionize_stream,
        "sessionize_agg": SE.sessionize_stream_agg,
        "funnel": SE.funnel_stream,
        "funnel_agg": SE.funnel_stream_agg,
        "hourly": SE.hourly_counts_stream,
        "kmv": SE.kmv_stream,
        "hll": SE.hll_stream,
        "attribution": SE.attribution_stream,
        "enrich": SE._enrich_projected,
    }
    for name, fn in streams.items():
        parts = SE._stream_digest_parts(name)
        obj_parts = [p for p in parts if not isinstance(p, str)]
        str_parts = "||".join(p for p in parts if isinstance(p, str))
        part_modules = {
            p.__name__ for p in obj_parts if isinstance(p, types.ModuleType)
        }

        def covered(obj) -> bool:
            if any(obj is p for p in obj_parts):
                return True
            if isinstance(obj, types.ModuleType):
                return (
                    not obj.__name__.startswith("dream_spark")
                    or obj.__name__ in part_modules
                )
            if callable(obj) or inspect.isclass(obj):
                mod = getattr(obj, "__module__", "") or ""
                if not mod.startswith("dream_spark"):
                    return True  # third-party surface
                return mod in part_modules
            # module-level constant: printed form must be in the digest
            return str(obj) in str_parts or repr(obj) in str_parts

        todo, audited = [fn], set()
        while todo:
            current = todo.pop()
            if id(current) in audited:
                continue
            audited.add(id(current))
            for ref in sorted(referenced_names(current)):
                if ref not in module_globals:
                    continue  # local/builtin/inner-import, not a module dep
                obj = module_globals[ref]
                assert covered(obj), (
                    f"stream {name!r}: module-level dependency {ref!r} is "
                    f"not covered by its digest parts — add it to the "
                    f"deps row in _stream_digest_parts"
                )
                # transitively audit same-module helper functions that are
                # digest parts: THEIR new dependencies must be covered too
                if (
                    isinstance(obj, types.FunctionType)
                    and getattr(obj, "__module__", "") == SE.__name__
                    and any(obj is p for p in obj_parts)
                    and obj is not SE._live_run_path  # sig plumbing, not
                    # stream semantics: digested by identity, and its own
                    # deps are signature-computation code whose edits
                    # already flow into every sig value at runtime
                ):
                    todo.append(obj)


def test_live_input_sig_folds_builder_source():
    """r9 ADVICE: the augmented-input cache signature must fold a source
    digest of _live_input_path itself, so an edit to the input
    construction (projection, unionByName, coalesce) self-invalidates the
    cached input without a _LIVE_FORMAT_VERSION bump; and the per-stream
    run signature must fold the input signature, so a rebuilt input can
    never be paired with a stale cached sink."""
    from dream_spark.functions.artifacts import source_digest

    sig = SE._live_input_sig(SF_DIR)
    assert source_digest(SE._live_input_path) in sig
    assert repr(SE._SENTINEL_ROW) in sig
    # the run-sig fold: _live_run_path's own source calls _live_input_sig
    import inspect

    assert "_live_input_sig(sf_dir)" in inspect.getsource(SE._live_run_path)
