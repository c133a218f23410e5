"""Sketches (KMV distinct, exact grouped quantiles) vs DuckDB oracle +
estimator-quality invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dream_spark.operators import sketch as S
from dream_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(S.QUERIES))
def test_sketch_oracle(spark, duck, name):
    df = S.QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, duck, S.ORACLES[name])


def test_kmv_exact_below_k(spark):
    """Fewer distinct values than k → the sketch IS the exact count."""
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.select("user_id").distinct().count()
    row = S.kmv_distinct(ev, "user_id").collect()[0]
    if row["n_kept"] < row["k"]:
        assert row["est_distinct"] == exact


def test_kmv_estimator_error_bound(spark):
    """Above k the estimator lands within the ~1/sqrt(k) KMV error band
    (generous 5-sigma bound to keep the test deterministic-friendly)."""
    n = 100_000
    df = spark.range(n).select(F.col("id").alias("v"))
    row = S.kmv_distinct(df, "v", k=S.KMV_K).collect()[0]
    assert row["n_kept"] == S.KMV_K
    rel_err = abs(row["est_distinct"] - n) / n
    assert rel_err < 5 / (S.KMV_K ** 0.5), rel_err


def test_quantiles_ordered_and_member(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = S.grouped_quantiles(docs, "source", "n_chars")
    for r in out.collect():
        assert r["p25"] <= r["p50"] <= r["p75"]
        vals = {
            x["n_chars"]
            for x in docs.where(F.col("source") == r["source"]).select("n_chars").collect()
        }
        assert {r["p25"], r["p50"], r["p75"]} <= vals  # type-1: actual members


def test_kmv_oracle_estimator_branch_no_overflow():
    """The oracle's estimator branch ((k-1)·P // h_k) only executes when
    the corpus has > k distinct values — absent at the small test SF, so
    exercise it against a synthetic DuckDB view (catches INT32 overflow in
    the literal product)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT range AS user_id, 0 AS event_id, "
        "TIMESTAMP '2020-01-01' AS ts, '' AS event_type, 0.0 AS value, '' AS props "
        "FROM range(100000)"
    )
    row = con.execute(S.SKETCH_KMV_SQL).fetchone()
    k, n_kept, kth_min, est = row
    assert n_kept == S.KMV_K
    assert abs(est - 100000) / 100000 < 5 / (S.KMV_K ** 0.5)


def test_sampled_quantiles_approximate_exact(spark):
    """On a 100k-row skew-free synthetic column the bottom-k sample's
    quartiles land within a few percent of the exact ones, and the sample
    per group is capped at AQ_K."""
    n = 100_000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.col("id").alias("v"), F.col("id").alias("rid")
    )
    row = S.sampled_quantiles(df, "grp", "v", "rid").collect()[0]
    assert row["n"] == S.AQ_K
    for q, col in ((0.25, "p25"), (0.50, "p50"), (0.75, "p75")):
        assert abs(row[col] - q * n) / n < 0.10, (col, row[col])


def test_sampled_quantiles_exact_below_k(spark):
    """A group smaller than AQ_K is fully sampled: the sketch IS the exact
    quantile set."""
    docs = load_table(spark, SF_DIR, "documents")
    approx = {
        r["source"]: r for r in S.sketch_quantiles_sampled(spark, SF_DIR).collect()
    }
    exact = {r["source"]: r for r in S.sketch_quantiles(spark, SF_DIR).collect()}
    for src, e in exact.items():
        if e["n"] <= S.AQ_K:
            a = approx[src]
            assert (a["p25"], a["p50"], a["p75"]) == (e["p25"], e["p50"], e["p75"])


def test_cms_overestimates_within_bound(spark):
    """CMS point estimates are ≥ the true count (one-sided error) and the
    heavy hitters stay within ε·N of truth."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").where(F.col("user_id").isNotNull())
    sketch = S.sketch_cms_users(spark, SF_DIR).collect()
    truth = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(truth.values())
    eps_bound = 3 * n_total / S.CMS_WIDTH  # ~e/width with slack
    for uid, n in sorted(truth.items(), key=lambda kv: -kv[1])[:20]:
        est = S.cms_estimate(sketch, uid)
        assert est >= n, (uid, est, n)
        assert est - n <= eps_bound, (uid, est, n, eps_bound)


def test_cms_merge_is_counter_addition(spark):
    """Sketching two halves and adding counters equals sketching the whole
    — the mergeability that makes CMS a distributed-aggregation citizen."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").where(F.col("user_id").isNotNull())
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in S.cms_table(ev, "user_id").collect()}
    h1 = S.cms_table(ev.where(F.col("event_id") % 2 == 0), "user_id").collect()
    h2 = S.cms_table(ev.where(F.col("event_id") % 2 == 1), "user_id").collect()
    merged: dict = {}
    for r in list(h1) + list(h2):
        merged[(r["row"], r["bucket"])] = merged.get((r["row"], r["bucket"]), 0) + r["cnt"]
    assert merged == whole


def test_kmv_by_group_exact_below_k(spark):
    """Each group with fewer than k distinct values reports the exact
    per-group distinct count."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in S.sketch_kmv_by_type(spark, SF_DIR).collect():
        if r["n_kept"] < r["k"]:
            assert r["est_distinct"] == exact[r["event_type"]]
        else:
            n = exact[r["event_type"]]
            assert abs(r["est_distinct"] - n) / n < 5 / (S.KMV_K ** 0.5)


def test_cms_estimate_handles_negative_values(spark):
    """Spark/DuckDB % truncates toward zero (negative buckets for negative
    values); the estimator must probe the same bucket — never underestimate."""
    df = spark.createDataFrame([(v,) for v in (-5, -5, -5, 7)], "v long")
    sketch = S.cms_table(df, "v").collect()
    assert S.cms_estimate(sketch, -5) >= 3
    assert S.cms_estimate(sketch, 7) >= 1


def test_kmv_handles_negative_values(spark):
    """Negative inputs hash into [0, P) — the estimator must stay positive
    (raw truncated-% hashes went negative, making h_(k) <= 0 and the
    estimate negative or NULL identically on both engines)."""
    from dream_spark.operators.sketch import KMV_K, kmv_distinct

    df = spark.range(1000).selectExpr("-(id + 1) as v")
    row = kmv_distinct(df, "v").collect()[0]
    assert row["kth_min"] > 0 and row["est_distinct"] > 0
    # below-k branch stays exact
    small = spark.range(10).selectExpr("-(id + 1) as v")
    assert kmv_distinct(small, "v").collect()[0]["est_distinct"] == 10


def test_sampled_quantiles_null_ids_excluded(spark):
    """NULL ids must not enter the sample (Spark orders NULL hashes first,
    DuckDB last — they would pick different sample sets)."""
    from dream_spark.operators.sketch import sampled_quantiles

    df = spark.createDataFrame(
        [("g", 10, 1), ("g", 20, 2), ("g", 99, None)],
        "grp string, val long, rid long",
    )
    rows = sampled_quantiles(df, "grp", "val", "rid").collect()
    assert rows[0]["n"] == 2 and rows[0]["p75"] <= 20


def test_grouped_quantiles_survives_colliding_column_names(spark):
    """Internal rank plumbing must not collide with user columns named
    v/r/n."""
    from dream_spark.operators.sketch import grouped_quantiles

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 5)], "v string, r long"
    )
    got = {x["v"]: (x["n"], x["p50"]) for x in grouped_quantiles(df, "v", "r").collect()}
    assert got == {"a": (3, 2), "b": (1, 5)}


def test_cms_single_scan_plan(spark):
    """The sketch builds from ONE scan of the input (explode of depth
    cells), never depth unioned scans."""
    from dream_spark.operators.sketch import cms_table
    from dream_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    df = cms_table(load_table(spark, SF_DIR, "events"), "user_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1 and "Union" not in plan
    assert "Generate" in plan  # the explode


def test_kmv_overlap_exact_when_unsaturated(spark):
    """When BOTH sides' sketches are unsaturated (theta = P), the overlap
    estimator degrades to the EXACT distinct intersection; otherwise it
    lands within the ~1/sqrt(k) KMV band of it."""
    ev = load_table(spark, SF_DIR, "events")
    a = {r["user_id"] for r in ev.where("event_type = 'click'").select("user_id").distinct().collect()}
    b = {r["user_id"] for r in ev.where("event_type = 'purchase'").select("user_id").distinct().collect()}
    exact = len(a & b)
    row = S.sketch_kmv_overlap(spark, SF_DIR).collect()[0]
    if row["theta"] == S.MERSENNE_P:
        assert row["est_common"] == exact
    else:
        assert abs(row["est_common"] - exact) <= max(5, 5 * exact / (S.KMV_K ** 0.5))


def test_bloom_probe_invariants(spark):
    """Bounds and semantics: every non-build source reports, hits are
    bounded by docs, and a document whose every bit position is set in
    the filter is EXACTLY what n_maybe_seen counts — verified by
    recomputing membership from the filter's definition."""
    from dream_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    rows = S.sketch_bloom(spark, SF_DIR).collect()
    sources = {r["source"] for r in docs.select("source").distinct().collect()}
    assert {r["source"] for r in rows} == sources - {S.BLOOM_BUILD_SOURCE}
    for r in rows:
        assert 0 <= r["n_maybe_seen"] <= r["n_docs"]
    # no-false-negative contract: a probe doc with a build-identical text
    # prefix (same membership key) MUST count as maybe-seen
    from dream_spark.functions.features import pack_sql

    key = F.expr(pack_sql("text", S._BLOOM_KEY_CHARS))
    build_keys = {
        r[0]
        for r in docs.where(F.col("source") == S.BLOOM_BUILD_SOURCE)
        .select(key)
        .collect()
    }
    dup = (
        docs.where(F.col("source") != S.BLOOM_BUILD_SOURCE)
        .select("source", key.alias("k"))
        .collect()
    )
    per_src_true = {}
    for r in dup:
        if r["k"] in build_keys:
            per_src_true[r["source"]] = per_src_true.get(r["source"], 0) + 1
    by_src = {r["source"]: r["n_maybe_seen"] for r in rows}
    for src, n_true in per_src_true.items():
        assert by_src[src] >= n_true


# ---------------------------------------------------------------------------
# Heavy hitters (Misra–Gries two-pass)
# ---------------------------------------------------------------------------
def test_heavy_hitters_matches_exact_groupby(spark):
    """The two-pass result must equal the brute-force exact answer — the
    MG pass may only bound what gets recounted, never change the result."""
    from dream_spark.functions.features import tokens

    docs = load_table(spark, SF_DIR, "documents")
    toks = tokens(docs)
    total = toks.count()
    truth = {
        (r["tok"], r["cnt"])
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * S.HH_K >= total)
        .collect()
    }
    got = {(r["term"], r["cnt"]) for r in S.heavy_hitters(toks).collect()}
    assert got == truth and all(c * S.HH_K >= total for _, c in got)


def test_heavy_hitters_partitioning_independent(spark):
    """Exactness must hold under ANY partitioning of the token stream —
    the completeness argument is per-partition pigeonhole, so shuffling
    the stream around cannot change the recounted answer."""
    from dream_spark.functions.features import tokens

    toks = tokens(load_table(spark, SF_DIR, "documents"))
    a = {tuple(r) for r in S.heavy_hitters(toks.repartition(1)).collect()}
    b = {tuple(r) for r in S.heavy_hitters(toks.repartition(13, "tok")).collect()}
    c = {tuple(r) for r in S.heavy_hitters(toks.repartition(32)).collect()}
    assert a == b == c and len(a) > 0


def test_mg_candidates_bounded_and_superset(spark):
    """Per-partition MG state is ≤ k terms, and the candidate union
    contains every true heavy hitter (the guarantee the recount relies
    on)."""
    from dream_spark.functions.features import tokens

    k = 10  # tight budget to make the bound bite
    toks = tokens(load_table(spark, SF_DIR, "documents")).repartition(4)
    sk = S.misra_gries_candidates(toks, k)
    per_part = (
        sk.where(F.col("term").isNotNull())
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r["n"] <= k for r in per_part)
    # the sentinel count rows carry the exact stream length
    assert (
        sk.agg(F.sum("n_part")).collect()[0][0] == toks.count()
    )
    cands = {r["term"] for r in sk.where(F.col("term").isNotNull()).collect()}
    total = toks.count()
    truth = {
        r["tok"]
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k >= total)
        .collect()
    }
    assert truth <= cands


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------
def test_hll_registers_match_python(spark):
    """Every (bucket, register) row replays bit-for-bit against a pure
    Python evaluation of the same universal hash and rho."""
    from dream_spark.functions.hashing import MERSENNE_P, hash_params

    ev = load_table(spark, SF_DIR, "events")
    uids = [r[0] for r in ev.select("user_id").where(F.col("user_id").isNotNull()).collect()]
    a, b = hash_params(S._HLL_FN)
    a2, b2 = hash_params(S._HLL_FN2)
    regs: dict[int, int] = {}
    for u in uids:
        h = ((a * u + b) % MERSENNE_P + MERSENNE_P) % MERSENNE_P
        h = (h * h % MERSENNE_P + a2 * h + b2) % MERSENNE_P
        bucket, w = h % S.HLL_M, h // S.HLL_M
        rho = S._HLL_RHO_MAX if w == 0 else S._HLL_RHO_MAX - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    got = {r["bucket"]: r["register"] for r in S.hll_registers(ev, "user_id").collect()}
    assert got == regs


def test_hll_estimate_error_bound(spark):
    """Raw HLL estimate lands within a generous 5-sigma of truth on a
    100k-distinct range (sigma ≈ 1.04/sqrt(256) ≈ 6.5%)."""
    n = 100_000
    df = spark.range(1, n + 1).select(F.col("id").alias("v"))
    est = S.hll_registers(df, "v").select("est").first()["est"]
    assert abs(est - n) / n < 5 * 1.04 / (S.HLL_M ** 0.5), est


def test_hll_duplicates_are_free(spark):
    """max() idempotence: duplicating the input leaves every register —
    and therefore the estimate — unchanged (the merge-without-dedup
    property that makes HLL one-pass at scale)."""
    df = spark.range(1, 5_000).select(F.col("id").alias("v"))
    once = sorted(map(tuple, S.hll_registers(df, "v").collect()))
    tripled = sorted(map(tuple, S.hll_registers(df.union(df).union(df), "v").collect()))
    assert once == tripled


def test_hll_union_merge_equals_rebuild(spark):
    """The merged-union estimate must equal the estimate of a sketch built
    directly over the undivided stream — max-merge is lossless, the whole
    point of HLL rollups.  NULL groups are injected deliberately: their
    rows must stay in the union (a GROUP BY group of their own), or the
    contract silently breaks on any nullable group column (r7 review
    finding)."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "event_type",
        F.when(F.col("user_id") % 10 == 0, None).otherwise(F.col("event_type")),
    )
    direct = S.hll_registers(ev, "user_id").select("est").first()["est"]
    merged = S.hll_merge_union(ev, "user_id", "event_type").select("est_union").first()[
        "est_union"
    ]
    assert merged == direct


@pytest.mark.slow
def test_heavy_hitters_adversarial_streams(spark):
    """Exactness on adversarial synthetic shapes: all-unique stream (no
    heavy hitter), single-token stream (everything is the hitter), one
    planted hitter just above threshold, and a tie exactly AT the
    threshold — under a tight counter budget and hostile partitioning."""
    cases = [
        [f"u{i}" for i in range(200)],                      # all unique
        ["only"] * 50,                                       # degenerate
        ["hh"] * 40 + [f"u{i}" for i in range(160)],         # planted 20%
        ["a"] * 25 + ["b"] * 25 + [f"u{i}" for i in range(50)],  # ties at 25%
    ]
    for k in (4, 10):
        for toks_list in cases:
            df = spark.createDataFrame([(t,) for t in toks_list], "tok string")
            total = len(toks_list)
            truth = {
                (t, c)
                for t, c in __import__("collections").Counter(toks_list).items()
                if c * k >= total
            }
            for parts in (1, 7):
                got = {
                    (r["term"], r["cnt"])
                    for r in S.heavy_hitters(df.repartition(parts), k).collect()
                }
                assert got == truth, (k, parts, len(toks_list), got, truth)
