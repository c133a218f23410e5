"""Dedup operators vs DuckDB oracle + behavioral checks."""

from __future__ import annotations

import pytest

from dream_spark.operators import dedup as D
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(D.QUERIES))
def test_dedup_oracle(spark, duck, name):
    assert_oracle_match(D.QUERIES[name](spark, SF_DIR), duck, D.ORACLES[name])


def test_exact_dedup_removes_injected_duplicates(spark):
    from dream_spark.sources.tables import load_table

    part = load_table(spark, SF_DIR, "part")
    assert D.dedup_exact(spark, SF_DIR).count() == part.dropDuplicates().count()


def test_minhash_finds_near_identical_docs(spark):
    """A doc is trivially near-identical to itself — shingle sets of docs
    sharing long substrings must collide in at least one band.  Sanity: the
    candidate set is nonempty at this corpus's similarity level and contains
    no self-pairs."""
    pairs = D.dedup_minhash(spark, SF_DIR)
    rows = pairs.collect()
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_minhash_served_prune_equivalence(spark):
    """The serve path's probe pruning is an optimization, never a
    semantics change: kept batch ids must EQUAL the unpruned incremental
    path over the full persisted index on the same corpus/batch split —
    and the batch must actually lose documents to the index (the corpus
    collision path is exercised, not vacuously absent)."""
    from pyspark.sql import functions as F

    from dream_spark.sources.tables import load_table

    path = D._served_minhash_index_path(spark, SF_DIR)
    full_index = spark.read.parquet(f"{path}/bands")
    batch = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") % 2 == 1)
    ref_ids, _ = D.incremental_minhash_dedup(batch, full_index)
    ref = {r["doc_id"] for r in ref_ids.collect()}
    got = {r["doc_id"] for r in D.dedup_minhash_served(spark, SF_DIR).collect()}
    assert got == ref
    n_batch = batch.count()
    assert len(got) < n_batch  # some batch docs were dropped (hit or dup)


def test_jaccard_threshold_respected(spark):
    rows = D.dedup_jaccard(spark, SF_DIR).collect()
    assert all(r["jaccard"] >= D.JACCARD_THRESHOLD for r in rows)


def test_simhash_16bit_range(spark):
    rows = D.simhash_docs(spark, SF_DIR).collect()
    assert all(0 <= r["simhash"] < (1 << D.SIMHASH_BITS) for r in rows)


# ---- connected-components cluster assembly --------------------------------
@pytest.mark.parametrize("small_edges", [0, 10**6])
def test_connected_components_unit(spark, small_edges):
    """small_edges=0 forces the distributed label-propagation loop;
    the default exercises the driver union-find fast path."""
    from dream_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        ["src", "dst"],
    )
    got = {
        (r["node"], r["cluster"])
        for r in connected_components(edges, small_edges=small_edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_dedup_clusters_oracle(spark, duck):
    from dream_spark.operators import dedup as D
    from tests.conftest import SF_DIR, assert_oracle_match

    assert_oracle_match(
        D.dedup_clusters(spark, SF_DIR), duck, D.DEDUP_CLUSTERS_SQL
    )


def test_incremental_minhash_dedup_two_batches(spark):
    """Batch flow: batch1 establishes the index; batch2 documents that
    near-dup batch1 (or each other) are dropped; survivors extend the
    index.  Verified against a driver-side reference over the SAME band
    rows (the kernel output is the shared ground truth): drop index hits,
    then keep only each band-collision component's minimum id."""
    from pyspark.sql import functions as F

    from dream_spark.operators.dedup import (
        _unionfind_components,
        incremental_minhash_dedup,
        minhash_index,
    )
    from dream_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)

    kept1, idx1 = incremental_minhash_dedup(b1, None)
    kept2, idx2 = incremental_minhash_dedup(b2, idx1)

    all_bands = minhash_index(docs).collect()
    by_doc: dict[int, set] = {}
    for r in all_bands:
        by_doc.setdefault(r["doc_id"], set()).add((r["band"], r["bh"]))

    def ref_batch(ids, index_bands):
        fresh = [d for d in sorted(ids) if not (by_doc[d] & index_bands)]
        edges = [
            (x, y)
            for i, x in enumerate(fresh)
            for y in fresh[i + 1 :]
            if by_doc[x] & by_doc[y]
        ]
        label = dict(_unionfind_components(edges))
        kept = [d for d in fresh if label.get(d, d) == d]
        return kept, set().union(set(), *(by_doc[d] for d in kept))

    ids1 = [r["doc_id"] for r in b1.select("doc_id").collect()]
    ids2 = [r["doc_id"] for r in b2.select("doc_id").collect()]
    ref_kept1, ref_bands1 = ref_batch(ids1, set())
    assert sorted(r["doc_id"] for r in kept1.collect()) == ref_kept1
    ref_kept2, _ = ref_batch(ids2, ref_bands1)
    assert sorted(r["doc_id"] for r in kept2.collect()) == ref_kept2
    # the updated index holds exactly the kept documents' band rows
    assert {r["doc_id"] for r in idx2.collect()} == set(ref_kept2)


def test_cross_source_pairs_are_minhash_subset(spark):
    """Cross-source pairs are exactly the minhash pairs whose endpoint
    sources differ — no pair invented, none lost."""
    from dream_spark.sources.tables import load_table

    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    }
    all_pairs = {(r["doc_a"], r["doc_b"]) for r in D.dedup_minhash(spark, SF_DIR).collect()}
    got = {(r["doc_a"], r["doc_b"]) for r in D.dedup_cross_source(spark, SF_DIR).collect()}
    want = {(a, b) for a, b in all_pairs if src[a] != src[b]}
    assert got == want


def test_minhash_measured_recall_vs_exact_jaccard(spark):
    """MEASURED recall of the banded MinHash-LSH against exact shingle-set
    Jaccard ground truth (all pairs, driver-side) — the quantified twin of
    the analytic S-curve argument.  With 2 bands x 8 rows the detection
    probability is 1-(1-s^8)^2 (50% point near s=0.86), so high-similarity
    pairs must be found reliably while low-similarity pairs may be missed
    BY DESIGN.  Everything is deterministic (fixed hash family, fixed
    testdata), so the floors are safe margins under the measured values
    (1.00 at J>=0.8, 0.82 at J>=0.7 on the sf0.001 corpus)."""
    from itertools import combinations

    from dream_spark.functions.textkernels import shingle_sets
    from dream_spark.sources.tables import load_table

    sets: dict = {}
    for r in shingle_sets(load_table(spark, SF_DIR, "documents")).collect():
        sets.setdefault(r["doc_id"], set()).add(r["sid"])
    true_pairs: dict = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter:
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.7:
                true_pairs[(a, b)] = j
    found = {(r["doc_a"], r["doc_b"]) for r in D.dedup_minhash(spark, SF_DIR).collect()}

    def recall(thr: float) -> float | None:
        tp = {p for p, j in true_pairs.items() if j >= thr}
        return len(tp & found) / len(tp) if tp else None

    r08, r07 = recall(0.8), recall(0.7)
    assert r08 is not None and r08 >= 0.9
    assert r07 is not None and r07 >= 0.7


def test_span_dedup_semantics(spark):
    """Exact substring-span dedup on a hand-built corpus: only the 8-token
    run shared verbatim by docs 1 and 2 is flagged; the per-doc coverage
    counts every distinct span and the shared ones."""
    from dream_spark.operators.dedup import span_frames

    from pyspark.sql import functions as F

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three"),
            (2, f"zero {shared} four"),
            (3, "totally different words that never repeat anywhere else at all"),
            (4, "short doc"),  # < 8 tokens: no spans, no row
        ],
        "doc_id long, text string",
    )
    spans, dup = span_frames(docs)
    flagged = {r["sid"]: r["n_docs"] for r in dup.collect()}
    assert set(flagged.values()) == {2}
    # doc 1: tokens 8+3 -> 4 spans; doc 2: 1+8+1 -> 3 spans; the SHARED
    # span id must be among the duplicated ones in both docs
    per_doc = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in spans.join(
            dup.select("sid").withColumn("d", F.lit(1)), "sid", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).alias("n_dup_spans"),
        )
        .collect()
    }
    assert per_doc[1] == (4, 1)
    assert per_doc[2] == (3, 1)
    assert per_doc[3][1] == 0
    assert 4 not in per_doc


def test_lsh_cluster_star_edges_match_allpairs_components(spark):
    """The per-bucket STAR edge list must produce exactly the components of
    the all-pairs-in-bucket graph (stars span each bucket), and a chain of
    length ≫ _CC_MAX_ITERS must still converge on the distributed path
    (pointer doubling — plain neighbor-min would need diameter rounds)."""
    from dream_spark.operators.dedup import (
        connected_components,
        lsh_duplicate_clusters,
        minhash_pairs,
    )
    from dream_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in lsh_duplicate_clusters(docs).collect()
    }
    allpairs = {
        (r["node"], r["cluster"])
        for r in connected_components(minhash_pairs(docs), "doc_a", "doc_b").collect()
    }
    assert star == allpairs

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], ["src", "dst"]
    )
    got = connected_components(chain, small_edges=0).collect()
    assert {(r["node"], r["cluster"]) for r in got} == {(i, 0) for i in range(121)}


def test_jaccard_scale_path_matches_oracle(spark, duck):
    """Force the scale path (rarest-first order + label-pruned two-phase
    clustering) at test SF via the conf gate and oracle-match it — the
    exactness claim (order-blind prefix filtering, connectivity-blind
    pair pruning) as a cross-engine value hash, not just a proof sketch."""
    from dream_spark.operators.dedup import JACCARD_SMALL_DOCS_CONF
    from tests.conftest import assert_oracle_match

    spark.catalog.clearCache()  # evict small-path cached pair sets
    spark.conf.set(JACCARD_SMALL_DOCS_CONF, "0")
    try:
        assert_oracle_match(D.dedup_jaccard(spark, SF_DIR), duck, D.DEDUP_JACCARD_SQL)
        assert_oracle_match(D.dedup_clusters(spark, SF_DIR), duck, D.DEDUP_CLUSTERS_SQL)
    finally:
        spark.conf.unset(JACCARD_SMALL_DOCS_CONF)
        spark.catalog.clearCache()
