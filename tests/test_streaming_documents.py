"""Streaming document curation vs its batch contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dream_spark.operators.pipeline import CURATE_MIN_TOKENS, split_assign
from dream_spark.sources.tables import load_table
from dream_spark.streaming.documents import curate_stream, read_documents_stream
from tests.conftest import SF_DIR


def _run_available_now(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return df.sparkSession.table(name)


def test_curate_stream_matches_batch_contract(spark):
    out = _run_available_now(
        curate_stream(read_documents_stream(spark, SF_DIR)), "curated_docs"
    ).collect()

    docs = load_table(spark, SF_DIR, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
    ).cast("bigint")
    gated = docs.withColumn("n_tokens", n_tokens).where(
        F.col("n_tokens") >= CURATE_MIN_TOKENS
    )

    # one survivor per distinct content among quality-passing docs
    n_distinct_texts = gated.select("text").distinct().count()
    assert len(out) == n_distinct_texts
    assert len({r["doc_id"] for r in out}) == len(out)

    # every survivor passes the gate and carries the deterministic split
    batch = {
        r["doc_id"]: (r["n_tokens"], r["split"])
        for r in split_assign(gated).select("doc_id", "n_tokens", "split").collect()
    }
    for r in out:
        assert batch[r["doc_id"]] == (r["n_tokens"], r["split"])


def test_curate_stream_state_is_bounded(spark):
    """The dedup operator must be the within-watermark variant (bounded
    state), not a plain dropDuplicates over all history."""
    plan = curate_stream(read_documents_stream(spark, SF_DIR))._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in plan
