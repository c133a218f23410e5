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
