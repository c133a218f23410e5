"""Training-pipeline operators (split/sample/tfidf/bigrams) vs DuckDB oracle
+ semantic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dream_spark.operators import pipeline as P
from dream_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(P.QUERIES))
def test_pipeline_oracle(spark, duck, name):
    df = P.QUERIES[name](spark, SF_DIR)
    assert_oracle_match(df, duck, P.ORACLES[name])


def test_split_covers_every_doc_once(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = P.pipeline_split(spark, SF_DIR)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}


def test_split_roughly_matches_weights(spark):
    out = P.pipeline_split(spark, SF_DIR)
    n = out.count()
    n_train = out.where(F.col("split") == "train").count()
    # 80% ± 10 points at any sf — the hash is uniform
    assert abs(n_train / n - 0.8) < 0.10


def test_split_is_deterministic(spark):
    a = sorted(map(tuple, P.pipeline_split(spark, SF_DIR).collect()))
    b = sorted(map(tuple, P.pipeline_split(spark, SF_DIR).collect()))
    assert a == b


def test_stratified_sample_cap_per_group(spark):
    out = P.pipeline_sample(spark, SF_DIR)
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= P.SAMPLE_PER_GROUP for r in per)
    assert out.select("doc_id").distinct().count() == out.count()


def test_tfidf_rank_and_df_bounds(spark):
    out = P.pipeline_tfidf(spark, SF_DIR)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert out.where(F.col("rnk") > P.TFIDF_K).count() == 0
    assert out.where((F.col("df") < 1) | (F.col("df") > n_docs)).count() == 0
    # every doc with ≥1 token gets exactly min(k, #distinct terms) rows
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.where(F.col("count") > P.TFIDF_K).count() == 0


def test_bigram_counts_topk_sorted(spark):
    rows = P.pipeline_bigrams(spark, SF_DIR).collect()
    assert len(rows) <= P.BIGRAM_TOP_K
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(" " in r["bigram"] for r in rows)


def test_chunks_cover_every_token_once_per_window(spark):
    out = P.pipeline_chunks(spark, SF_DIR).collect()
    stride = P.CHUNK_TOKENS - P.CHUNK_OVERLAP
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        # chunk ids consecutive from 0, starts on the stride grid
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert all(r["start_pos"] == 1 + r["chunk_id"] * stride for r in rows)
        # every chunk non-empty, at most CHUNK_TOKENS, text token count agrees
        for r in rows:
            assert 1 <= r["n_chunk_tokens"] <= P.CHUNK_TOKENS
            assert len(r["chunk_text"].split(" ")) == r["n_chunk_tokens"]
        # consecutive chunks overlap by exactly CHUNK_OVERLAP positions
        # (except a short tail)
        for a, b in zip(rows, rows[1:]):
            assert b["start_pos"] - a["start_pos"] == stride


def test_shards_respect_budget_at_start_offset(spark):
    out = P.pipeline_shards(spark, SF_DIR)
    rows = out.collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert len(rows) == docs.count()  # every doc assigned exactly once
    # online bin-packing guarantee: each shard's tokens stay within
    # budget + max single doc
    agg = out.groupBy("shard").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx")
    )
    bad = agg.where(F.col("tok") > P.PACK_BUDGET_TOKENS + F.col("mx")).count()
    assert bad == 0
    # buckets partition the id space deterministically
    assert all(0 <= r["bucket"] < P.PACK_BUCKETS for r in rows)
    assert all(r["shard"] // P.PACK_SHARD_STRIDE == r["bucket"] for r in rows)


def test_curate_invariants(spark):
    from dream_spark.operators.dedup import duplicate_clusters

    docs = load_table(spark, SF_DIR, "documents")
    out = P.pipeline_curate(spark, SF_DIR)
    rows = out.collect()
    assert all(r["n_tokens"] >= P.CURATE_MIN_TOKENS for r in rows)
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    kept = {r["doc_id"] for r in rows}
    dropped = {
        r["doc_id"]
        for r in duplicate_clusters(docs).where("doc_id != cluster_id").collect()
    }
    assert not (kept & dropped)
    # canonical member of every cluster survives unless quality-gated
    assert len(kept) == len(set(kept))


def test_canonicalize_invariants(spark):
    """Every document maps somewhere; canonicals map to themselves; within
    a cluster the chosen canonical really has the (quality, -doc_id)-max
    score; unclustered documents are their own canonical."""
    from dream_spark.operators.dedup import duplicate_clusters
    from dream_spark.operators.text import features_of

    docs = load_table(spark, SF_DIR, "documents")
    rows = P.pipeline_canonicalize(spark, SF_DIR).collect()
    assert len(rows) == docs.count()
    by_id = {r["doc_id"]: r for r in rows}
    for r in rows:
        assert (r["kept"] == 1) == (r["canonical"] == r["doc_id"])
        # the canonical target is itself kept
        assert by_id[r["canonical"]]["kept"] == 1
    clusters = {}
    for r in duplicate_clusters(docs).collect():
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    q = {r["doc_id"]: r["quality_score"] for r in features_of(docs).collect()}
    for members in clusters.values():
        canon = by_id[members[0]]["canonical"]
        assert all(by_id[m]["canonical"] == canon for m in members)
        best = sorted(members, key=lambda d: (-q[d], d))[0]
        assert canon == best
    unclustered = set(by_id) - {m for ms in clusters.values() for m in ms}
    assert all(by_id[d]["canonical"] == d for d in unclustered)


def test_mixture_sample_rates_and_determinism(spark):
    """Per-source keep decisions: rate-0 sources vanish, rate-1M sources
    survive whole, everything is a subset of the corpus, and two runs
    agree row-for-row."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    out = P.pipeline_mixture(spark, SF_DIR)
    rows = out.collect()
    kept = {r["doc_id"] for r in rows}
    per_src_all = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    per_src_kept: dict[str, int] = {}
    for r in rows:
        per_src_kept[r["source"]] = per_src_kept.get(r["source"], 0) + 1
    assert per_src_kept.get("src3", 0) == 0  # rate 0 → dropped entirely
    assert per_src_kept.get("src0", 0) == per_src_all["src0"]  # rate 1.0 → all kept
    # half-rate source keeps roughly half (generous band for small strata)
    if "src1" in per_src_all:
        frac = per_src_kept.get("src1", 0) / per_src_all["src1"]
        assert 0.2 <= frac <= 0.8
    again = {r["doc_id"] for r in P.pipeline_mixture(spark, SF_DIR).collect()}
    assert again == kept


def test_contamination_detects_shared_ngrams(spark):
    """A training doc sharing a word trigram with the benchmark is flagged
    with the exact distinct-overlap count; a disjoint doc is absent."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # shares 'alpha beta gamma' + 'beta gamma delta'
            (2, "zeta eta theta iota"),           # disjoint vocabulary
            (3, "alpha beta gamma alpha beta gamma"),  # repeats: still DISTINCT grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_hits"] for r in P.contamination_check(train, bench).collect()}
    assert got[1] == 2          # both trigrams of doc 1 occur in the benchmark
    assert 2 not in got         # no shared grams -> no row
    # doc 3 has 4 trigram occurrences but only 2 distinct; only
    # 'alpha beta gamma' and 'beta gamma alpha' — the latter is NOT in bench
    assert got[3] == 1


def test_contamination_train_side_never_shuffles_wide(spark):
    """The benchmark side carries the broadcast hint (eval sets are small);
    the training side must not sort/exchange before the join.  Inspect the
    PROBE's plan: contamination_check returns a localCheckpoint-materialized
    frame (cache-ownership contract), whose own plan is just an RDD scan."""
    train = load_table(spark, SF_DIR, "documents")
    bs = P.benchmark_ngram_set(train.limit(50))
    plan = P.contamination_probe(train, bs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_flags_looping_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),            # one token repeated
            (2, "one two three four five six seven eight"),  # no repetition
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in P.repetition_stats(docs).collect()}
    assert rows[1]["repetitive"] and rows[1]["top_tok_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == pytest.approx(4 / 5)
    assert not rows[2]["repetitive"] and rows[2]["n_distinct_bigrams"] == 7


def test_repetition_single_token_doc_has_zero_bigrams(spark):
    rows = P.repetition_stats(
        spark.createDataFrame([(1, "lonely")], "doc_id long, text string")
    ).collect()
    assert rows[0]["n_bigrams"] == 0 and rows[0]["dup_bigram_frac"] == 0.0


def test_vocab_rank_deterministic_and_oov_consistent(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana cherry"),
            (2, "apple banana banana durian"),
            (3, "apple kiwi"),
        ],
        "doc_id long, text string",
    )
    vocab = P.build_vocab(docs, k=2)
    rows = {r["tok"]: (r["freq"], r["tok_id"]) for r in vocab.collect()}
    # apple(4) > banana(3); ids follow (freq DESC, tok ASC)
    assert rows == {"apple": (4, 1), "banana": (3, 2)}
    oov = {r["doc_id"]: (r["n_tokens"], r["n_oov"]) for r in P.oov_stats(docs, vocab).collect()}
    assert oov == {1: (4, 1), 2: (4, 1), 3: (2, 1)}
    frac = {r["doc_id"]: r["oov_frac"] for r in P.oov_stats(docs, vocab).collect()}
    assert frac[3] == 0.5


def test_vocab_window_touches_only_k_rows(spark):
    """The ROW_NUMBER single-partition window must sit above the top-k
    (TakeOrderedAndProject), never above the full distinct-token set."""
    from dream_spark.sources.tables import load_table

    plan = (
        P.build_vocab(load_table(spark, SF_DIR, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # the window consumes the take's k-row output (appears above it)
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_profile_generic_frame(spark):
    """profile() on an arbitrary frame: exact row/null/distinct counts and
    string-form min/max per column."""
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 9.5), (3, "b", None)],
        "id long, s string, v double",
    )
    rows = {r["col_name"]: r for r in P.profile(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert (rows["id"]["n_nulls"], rows["id"]["n_distinct"]) == (0, 3)
    assert (rows["s"]["n_nulls"], rows["s"]["n_distinct"]) == (1, 2)
    assert (rows["v"]["n_nulls"], rows["v"]["n_distinct"]) == (2, 2)
    assert rows["id"]["min_str"] == "1" and rows["id"]["max_str"] == "3"
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"


def test_boilerplate_flags_shared_template(spark):
    """Documents sharing a repeated template n-gram get n_boiler > 0; a
    document of unique text gets n_boiler = 0; a too-short document keeps
    a zero row instead of disappearing."""
    rows = [(i, "copyright footer text plus unique%d filler%d" % (i, i)) for i in range(10)]
    rows.append((100, "entirely singular wording nothing shared here at all"))
    rows.append((101, "tiny doc"))  # < 3 tokens after split -> no grams
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.boilerplate_stats(docs, frac_den=2).collect()}
    assert len(out) == 12
    # "copyright footer text" (and the 3-grams inside the shared prefix)
    # appear in 10/12 docs >= 12/2
    assert all(out[i]["n_boiler"] > 0 for i in range(10))
    assert out[100]["n_boiler"] == 0 and out[100]["n_grams"] > 0
    assert out[101]["n_grams"] == 0 and out[101]["n_boiler"] == 0


def test_familiarity_orders_common_vs_rare(spark):
    """A document made of corpus-common bigrams scores a higher fam_sum
    than an equally-long document of unique bigrams."""
    rows = [(i, "the quick brown fox") for i in range(5)]
    rows.append((50, "the quick brown fox"))       # all-common bigrams
    rows.append((51, "zyx wvu tsr qpo"))           # all-unique bigrams
    rows.append((52, "x"))                         # single token -> zero row
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.familiarity_stats(docs).collect()}
    assert out[50]["n_bigrams"] == out[51]["n_bigrams"] == 3
    assert out[50]["fam_sum"] > out[51]["fam_sum"]
    assert out[51]["fam_sum"] == 3  # each unique bigram counts once
    assert out[52]["fam_sum"] == 0 and out[52]["n_bigrams"] == 0


def test_length_buckets_are_log2_floor(spark):
    """len_bucket == floor(log2(n_chars)) for every doc, and per-bucket
    totals reconcile with the raw table."""
    import math

    from dream_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("lang", "n_chars").collect()
    want: dict = {}
    for r in docs:
        if r["n_chars"] >= 1:
            key = (r["lang"], int(math.log2(r["n_chars"])))
            n, tot = want.get(key, (0, 0))
            want[key] = (n + 1, tot + r["n_chars"])
    got = {
        (r["lang"], r["len_bucket"]): (r["n_docs"], r["total_chars"])
        for r in P.pipeline_lengths(spark, SF_DIR).collect()
    }
    assert got == want


def test_dup_rate_reconciles(spark):
    """n_dups = n_docs − n_distinct per source, and the n_docs column sums
    to the table's row count."""
    from dream_spark.sources.tables import load_table

    total = load_table(spark, SF_DIR, "documents").count()
    rows = P.pipeline_dup_rate(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == total
    assert all(r["n_dups"] == r["n_docs"] - r["n_distinct"] >= 0 for r in rows)


def test_rulegate_flags_recompute(spark):
    """Each rule flag recomputes from the raw text, and the composite gate
    is exactly the conjunction (no rule silently dominates another)."""
    import re as _re

    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, SF_DIR, "documents").collect()}
    rows = P.pipeline_rulegate(spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    for r in rows:
        text = docs[r["doc_id"]]
        toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
        n_chars = len(text)
        n_sym = len(_re.sub(r"[A-Za-z0-9 ]", "", text))
        n_digit = len(_re.sub(r"[^0-9]", "", text))
        assert r["r_minwords"] == int(len(toks) >= P.RULE_MIN_WORDS)
        assert r["r_wordlen"] == int((max(map(len, toks)) if toks else 0) <= P.RULE_MAX_WORD_CHARS)
        assert r["r_symbol"] == int(n_sym * 100 <= n_chars * P.RULE_MAX_SYMBOL_PCT)
        assert r["r_digit"] == int(n_digit * 100 <= n_chars * P.RULE_MAX_DIGIT_PCT)
        assert r["pass"] == int(
            r["r_minwords"] and r["r_wordlen"] and r["r_symbol"] and r["r_digit"]
        )


def test_stratified_alloc_sample_exact_apportionment(spark):
    """Largest-remainder allocation: quotas sum to the budget exactly
    (when the corpus is large enough), every stratum gets within 1 of its
    exact proportional share, and the per-stratum sample size equals the
    quota."""
    import math

    from pyspark.sql import functions as F

    from dream_spark.operators.pipeline import SAMPLE_BUDGET, stratified_alloc_sample
    from dream_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    counts = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    out = stratified_alloc_sample(docs, "source").collect()
    got = {}
    for r in out:
        got.setdefault(r["source"], set()).add(r["doc_id"])
        assert r["samp_rank"] <= r["n_alloc"]
    assert sum(len(v) for v in got.values()) == min(SAMPLE_BUDGET, total)
    for src, n in counts.items():
        exact = SAMPLE_BUDGET * n / total
        assert math.floor(exact) <= len(got.get(src, set())) <= math.floor(exact) + 1


def test_surprisal_python_parity(spark):
    """surprisal_stats must reproduce the exact floor-log2 reference math
    on a hand-checkable corpus: surp(tok) = (total // freq).bit_length()-1."""
    from collections import Counter

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the the the the"),
        (3, "quantum flux capacitor"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in P.surprisal_stats(df).collect()}

    toks = {d: t.lower().split() for d, t in docs}
    freq = Counter(t for ts in toks.values() for t in ts)
    total = sum(freq.values())
    for d, ts in toks.items():
        surps = [(total // freq[t]).bit_length() - 1 for t in ts]
        assert got[d]["n_tokens"] == len(ts)
        assert got[d]["sum_surprisal"] == sum(surps)
        assert got[d]["avg_surprisal_x100"] == (100 * sum(surps)) // len(ts)
    # rare-token doc must outscore the repetitive doc
    assert got[3]["avg_surprisal_x100"] > got[2]["avg_surprisal_x100"]


# ---------------------------------------------------------------------------
# Weighted Bernoulli sampling
# ---------------------------------------------------------------------------
def test_weighted_sample_is_calibrated_and_deterministic(spark):
    """The realized sample size lands within binomial noise of the exact
    expectation Σp_i, inclusion is EXACTLY the documented predicate (coin
    < p), and the decision is partitioning-independent (map-only)."""
    from dream_spark.functions.hashing import hash_params

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "n_chars")
    kept = {r["doc_id"]: r["p_micro"] for r in P.pipeline_sample_weighted(spark, SF_DIR).collect()}
    a, b = hash_params(P._WS_FN)
    exp, var = 0.0, 0.0
    for r in docs.collect():
        p_micro = P.WS_RATE_MICRO * min(r["n_chars"], P.WS_SAT_CHARS) // P.WS_SAT_CHARS
        coin = ((a * r["doc_id"] + b) % 2_147_483_647) % P.WS_PSCALE
        assert (r["doc_id"] in kept) == (coin < p_micro)
        if r["doc_id"] in kept:
            assert kept[r["doc_id"]] == p_micro
        p = p_micro / P.WS_PSCALE
        exp += p
        var += p * (1 - p)
    # 5-sigma binomial band around the exact expectation
    assert abs(len(kept) - exp) <= 5 * max(var, 1.0) ** 0.5
    # partitioning independence: same ids survive under a repartition
    re = P.weighted_sample(docs.repartition(13), "n_chars")
    assert {r["doc_id"] for r in re.collect()} == set(kept)
