"""Similarity search vs DuckDB oracle + recall sanity."""

from __future__ import annotations

import pytest

from dream_spark.operators import similarity as S
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(S.QUERIES))
def test_similarity_oracle(spark, duck, name):
    assert_oracle_match(S.QUERIES[name](spark, SF_DIR), duck, S.ORACLES[name])


def test_bruteforce_topk_shape(spark):
    rows = S.knn_bruteforce(spark, SF_DIR).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert len(per_q) == S.N_QUERIES
    for q, rs in per_q.items():
        assert len(rs) == S.TOP_K
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, S.TOP_K + 1))
        assert all(r["neighbor_id"] != q for r in rs)


def test_lsh_is_subset_quality(spark):
    """LSH top-1 should agree with brute-force top-1 for most queries when
    the top neighbor is strongly similar; minimally, every LSH result must
    appear in the brute-force full ranking with the same cosine."""
    bf = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in S.knn_bruteforce(spark, SF_DIR).collect()}
    for r in S.knn_lsh(spark, SF_DIR).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            assert abs(bf[key] - r["cos"]) < 1e-12


def test_knn_topk_generic_corpus_numpy_parity(spark):
    """The DataFrame-level API must work on arbitrary (non-dense) vec_ids
    and a disjoint query set, matching a numpy brute-force reference."""
    import numpy as np

    from dream_spark.operators.similarity import knn_topk

    rng = np.random.RandomState(7)
    corpus_ids = [100, 205, 333, 404, 512, 999]
    query_ids = [7000, 8001]
    cvecs = {i: rng.rand(8).astype("float64") for i in corpus_ids}
    qvecs = {i: rng.rand(8).astype("float64") for i in query_ids}

    def quant(v):
        return np.floor(v * 1_000_000).astype("int64")

    def cos(a, b):
        qa, qb = quant(a), quant(b)
        return float(qa @ qb) / (np.sqrt(float(qa @ qa)) * np.sqrt(float(qb @ qb)))

    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in cvecs.items()], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(i, v.tolist()) for i, v in qvecs.items()], "vec_id long, embedding array<double>"
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
        for r in knn_topk(corpus, queries, k=3).collect()
    }
    for qid, qv in qvecs.items():
        ranked = sorted(((cos(qv, cv), -cid) for cid, cv in cvecs.items()), reverse=True)
        for rank, (c, negcid) in enumerate(ranked[:3], start=1):
            nid, gcos = got[(qid, rank)]
            assert nid == -negcid
            assert abs(gcos - c) < 1e-12


def test_ivf_kmeans_trains_and_memoizes(spark):
    """Trained centroids must differ from the seed vectors (Lloyd moved
    them) and be served from the per-session memo on re-training."""
    from dream_spark.operators.similarity import IVF_K, _ivf_centroids, _ivf_seed
    from dream_spark.operators.dedup import quantize
    from dream_spark.sources.tables import load_table

    qc = quantize(load_table(spark, SF_DIR, "embeddings"))
    seed = {r["cell"]: list(r["ce"]) for r in _ivf_seed(qc, IVF_K).collect()}
    trained = _ivf_centroids(qc, IVF_K)
    got = {r["cell"]: list(r["ce"]) for r in trained.collect()}
    assert any(got[c] != seed[c] for c in got), "k-means did not move any centroid"
    assert _ivf_centroids(qc, IVF_K) is trained  # memo hit


def test_vector_index_save_load_roundtrip(spark, tmp_path):
    """Serving from the persisted index must return byte-identical results
    to serving from the freshly built session artifacts — the train/serve
    split as actual storage."""
    from pyspark.sql import functions as F

    from dream_spark.operators.similarity import (
        N_QUERIES,
        knn_ivf_topk,
        knn_lsh_topk,
        load_vector_index,
        save_vector_index,
    )
    from dream_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    path = str(tmp_path / "vidx")
    save_vector_index(spark, SF_DIR, path)
    ql, bl, cl = load_vector_index(spark, path)
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)

    fresh_lsh = sorted(map(tuple, knn_lsh_topk(emb, queries).collect()))
    loaded_lsh = sorted(
        map(
            tuple,
            knn_lsh_topk(
                emb, queries, corpus_quantized=ql, corpus_buckets=bl
            ).collect(),
        )
    )
    assert loaded_lsh == fresh_lsh

    fresh_ivf = sorted(map(tuple, knn_ivf_topk(emb, queries).collect()))
    loaded_ivf = sorted(
        map(
            tuple,
            knn_ivf_topk(
                emb, queries, corpus_quantized=ql, centroids=cl
            ).collect(),
        )
    )
    assert loaded_ivf == fresh_ivf


def test_served_index_path_install_reuse_and_versioning(spark, tmp_path, monkeypatch):
    """The cross-process index cache must (a) build exactly once and serve
    the marker-guarded copy afterwards, (b) key on the index format
    version so changed index code never serves a stale layout, and (c)
    refuse a cache base owned by another user (predictable-/tmp-path
    poisoning)."""
    import os
    import tempfile

    from dream_spark.operators import similarity as sim
    from tests.conftest import SF_DIR

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    p1 = sim._served_index_path(spark, SF_DIR)
    marker = os.path.join(p1, "COMPLETE")
    assert os.path.exists(marker)
    built_at = os.path.getmtime(marker)

    # a second call must reuse the installed index, never rebuild
    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("save_vector_index re-ran despite COMPLETE marker")

    monkeypatch.setattr(sim, "save_vector_index", _boom)
    assert sim._served_index_path(spark, SF_DIR) == p1
    assert os.path.getmtime(marker) == built_at

    # bumping the format version must select a DIFFERENT directory (and
    # hence rebuild — which the _boom stub turns into a loud failure)
    monkeypatch.setattr(sim, "_INDEX_FORMAT_VERSION", sim._INDEX_FORMAT_VERSION + 1)
    with pytest.raises(AssertionError, match="re-ran"):
        sim._served_index_path(spark, SF_DIR)
    monkeypatch.undo()

    # an interrupted build's temp dir must not be mistaken for an index
    assert not [d for d in os.listdir(os.path.dirname(p1)) if d.startswith(".build-")]

    # ownership check: a base dir owned by someone else is refused
    if os.getuid() == 0:  # chown needs privilege; skip otherwise
        monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
        base = os.path.dirname(p1)
        os.chown(base, 12345, 12345)
        try:
            with pytest.raises(RuntimeError, match="owned by uid"):
                sim._served_index_path(spark, SF_DIR)
        finally:
            os.chown(base, 0, 0)

    # a pre-planted SYMLINK at the predictable base path must fail
    # (O_NOFOLLOW → ELOOP), never be followed to an attacker target
    link_root = tmp_path / "linked"
    link_root.mkdir()
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(link_root))
    target = tmp_path / "attacker_target"
    target.mkdir()
    os.symlink(str(target), str(link_root / os.path.basename(os.path.dirname(p1))))
    with pytest.raises(OSError):
        sim._served_index_path(spark, SF_DIR)


def test_filtered_neighbors_satisfy_predicate(spark):
    """Every returned neighbor carries the filter label, and each of the
    10 queries still gets a full top-k (the filtered corpus slice is
    larger than k)."""
    from dream_spark.sources.tables import load_table

    ok = {
        r["vec_id"]
        for r in load_table(spark, SF_DIR, "embeddings")
        .where(f"label = {S.FILTER_LABEL}")
        .select("vec_id")
        .collect()
    }
    rows = S.knn_filtered(spark, SF_DIR).collect()
    assert {r["neighbor_id"] for r in rows} <= ok
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], 0)
        per_q[r["query_id"]] += 1
    assert all(n == S.TOP_K for n in per_q.values()) and len(per_q) == S.N_QUERIES


def test_lsh_measured_recall_at_k(spark):
    """MEASURED recall@k of the LSH path against the brute-force ground
    truth — quantifying the documented bucket-miss tradeoff instead of
    only asserting subset-consistency.  Deterministic (fixed hyperplanes,
    fixed corpus): measured mean recall@5 is 0.40 on the sf0.001 corpus
    with 4 tables x 4 planes; the floor leaves margin for testdata
    regeneration.  Recall here is a TUNING knob (tables x planes), not an
    implementation-quality bound — the serve/scale story rests on the
    bucket join shape, the exactness story on the rerank."""
    bf: dict = {}
    for r in S.knn_bruteforce(spark, SF_DIR).collect():
        bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ls: dict = {}
    for r in S.knn_lsh(spark, SF_DIR).collect():
        ls.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recs = [len(bf[q] & ls.get(q, set())) / len(bf[q]) for q in bf]
    assert len(recs) == S.N_QUERIES
    assert sum(recs) / len(recs) >= 0.25


def test_borda_fuse_math_and_missing_lists(spark):
    """Hand-built rankings pin the fusion contract: points = (k+1 - rank)
    summed across lists, candidates present in ONE list score that list's
    points alone, ties break on neighbor id, and only top-k survive."""
    from dream_spark.operators.similarity import borda_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank long",
    )
    vec = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, neighbor_id long, rank long",
    )
    got = {
        r["neighbor_id"]: (r["borda"], r["rank"])
        for r in borda_fuse(lex, vec, k=3).collect()
    }
    # 11: (4-2)+(4-1)=5 ; 10: 3+0 ; 13: 0+2 ; 12: 1+0 -> top-3 cut drops 12
    assert got[11] == (5, 1)
    assert got[10] == (3, 2)
    assert got[13] == (2, 3)
    assert 12 not in got


def test_refresh_vector_index_matches_union_build(spark, tmp_path):
    """An index built on half the corpus then REFRESHED with the other
    half (refresh_vector_index: assign-to-existing-centroids append, no
    retrain) must be indistinguishable from one combined assignment of
    the full corpus under the same base-trained centroids — the
    maintenance contract knn_ivf_refreshed's oracle relies on."""
    from pyspark.sql import functions as F

    from dream_spark.operators.dedup import quantize
    from dream_spark.operators.similarity import (
        IVF_K,
        _ivf_assign,
        _ivf_centroids,
        refresh_vector_index,
    )
    from dream_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where(F.col("vec_id") % 2 == 0)
    delta = emb.where(F.col("vec_id") % 2 != 0)
    qb = quantize(base)
    cents = _ivf_centroids(qb, IVF_K)
    path = str(tmp_path / "idx")
    cents.write.parquet(f"{path}/centroids")
    qb.write.parquet(f"{path}/quantized")
    cells0 = _ivf_assign(qb, cents, 1).select("vec_id", "cell")
    qb.join(cells0, on="vec_id").write.partitionBy("cell").parquet(f"{path}/cells")

    refresh_vector_index(spark, path, delta)

    got = {
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(f"{path}/cells").select("vec_id", "cell").collect()
    }
    want = {
        (r["vec_id"], r["cell"])
        for r in _ivf_assign(quantize(emb), cents, 1).select("vec_id", "cell").collect()
    }
    assert got == want
    n_q = spark.read.parquet(f"{path}/quantized").count()
    assert n_q == emb.count()

    # idempotency: re-refreshing the same batch (the retry-after-partial-
    # failure case) must converge, not append duplicate vec_id rows — a
    # duplicate would take two of the k ranks in the no-dedup top-k
    refresh_vector_index(spark, path, delta)
    assert spark.read.parquet(f"{path}/cells").count() == emb.count()
    assert spark.read.parquet(f"{path}/quantized").count() == emb.count()


def test_ivf_assign1_matches_windowed_assignment(spark):
    """The fused nprobe=1 assignment (_ivf_assign1: one partial-aggregating
    min(struct(d2, cell, payload)) groupBy) must reproduce the windowed
    argmin (_ivf_assign rank-1, ties by cell id) EXACTLY, including the
    carried (qe, nrm) payload matching a vec_id join-back — the r10 plan
    change the inverted-file writers and knn_ivf's corpus side rely on."""
    from pyspark.sql import functions as F

    from dream_spark.operators.dedup import quantize
    from dream_spark.operators.similarity import (
        IVF_K,
        _ivf_assign,
        _ivf_assign1,
        _ivf_centroids,
    )
    from dream_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    qc = quantize(load_table(spark, SF_DIR, "embeddings"))
    cents = _ivf_centroids(qc, IVF_K)
    want = {
        (r["vec_id"], r["cell"], tuple(r["qe"]), r["nrm"])
        for r in qc.join(
            _ivf_assign(qc, cents, 1).select("vec_id", "cell"), on="vec_id"
        ).collect()
    }
    got = {
        (r["vec_id"], r["cell"], tuple(r["qe"]), r["nrm"])
        for r in _ivf_assign1(qc, cents, carry=("qe", "nrm")).collect()
    }
    assert got == want and len(got) == qc.count()


def test_sq8_codes_bounded_and_recall(spark):
    """SQ8 codes must lie in [0, 255]; the compressed-domain scan with
    exact rerank must (a) report the same exact cosine as brute force for
    every pair both return, and (b) recover most of the true top-k — the
    rerank makes rank-1 especially robust."""
    from pyspark.sql import functions as F

    from dream_spark.operators.dedup import shared_quantized
    from tests.conftest import SF_DIR

    qn = shared_quantized(spark, SF_DIR)
    codes = S.sq8_encode(qn, S.sq8_stats(qn))
    bad = codes.where(
        F.expr("exists(code, x -> x < 0 OR x > 255)")
    ).count()
    assert bad == 0

    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in S.knn_bruteforce(spark, SF_DIR).collect()
    }
    sq = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in S.knn_sq8(spark, SF_DIR).collect()
    }
    for key, c in sq.items():
        if key in bf:
            assert abs(bf[key] - c) < 1e-12
    recall = len(set(sq) & set(bf)) / len(bf)
    assert recall >= 0.6, f"SQ8 recall@{S.TOP_K} = {recall}"
