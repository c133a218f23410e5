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


def test_incremental_dedup_stream_matches_sequential_batches(spark, tmp_path):
    """Draining the stream batch-by-batch must equal calling the batch
    incremental dedup sequentially with the same arrival order."""
    from pyspark.sql import functions as F

    from dream_spark.operators.dedup import incremental_minhash_dedup
    from dream_spark.sources.tables import load_table
    from dream_spark.streaming.documents import dedup_stream_incremental
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    paths = dict(
        index=str(tmp_path / "index"),
        kept=str(tmp_path / "kept"),
        ckpt=str(tmp_path / "ckpt"),
    )

    def drain():
        q = dedup_stream_incremental(spark, src, paths["index"], paths["kept"], paths["ckpt"])
        q.awaitTermination()

    b1.write.mode("append").parquet(src)
    drain()
    kept_after_1 = {r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()}
    b2.write.mode("append").parquet(src)
    drain()
    kept_after_2 = {r["doc_id"] for r in spark.read.parquet(paths["kept"]).collect()}

    ref1_ids, ref1_bands = incremental_minhash_dedup(b1.select("doc_id", "text"), None)
    want1 = {r["doc_id"] for r in ref1_ids.collect()}
    assert kept_after_1 == want1
    ref2_ids, _ = incremental_minhash_dedup(b2.select("doc_id", "text"), ref1_bands)
    want2 = want1 | {r["doc_id"] for r in ref2_ids.collect()}
    assert kept_after_2 == want2
    # the index holds band rows for exactly the kept documents
    idx_docs = {r["doc_id"] for r in spark.read.parquet(paths["index"]).collect()}
    assert idx_docs == kept_after_2


def test_contamination_stream_matches_batch(spark, tmp_path):
    """The per-batch contamination gate must flag exactly the documents the
    batch operator flags over the same corpus and benchmark."""
    from pyspark.sql import functions as F

    from dream_spark.operators.pipeline import contamination_check
    from dream_spark.sources.tables import load_table
    from dream_spark.streaming.documents import contamination_stream
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 10 != 0)

    src = str(tmp_path / "src")
    train.write.parquet(src)
    flagged_path = str(tmp_path / "flagged")
    q = contamination_stream(
        spark, src, bench, flagged_path, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["n_hits"]) for r in spark.read.parquet(flagged_path).collect()
    }
    want = {
        (r["doc_id"], r["n_hits"]) for r in contamination_check(train, bench).collect()
    }
    assert got == want and got


def test_bloom_stream_gate_matches_sequential_probe(spark, tmp_path):
    """Draining the stream batch-by-batch equals a hand-rolled sequential
    Bloom simulation with the same position kernel: batch-1 docs are all
    unseen (empty filter), batch-2 decisions probe exactly batch-1's
    accumulated bit set, and the persisted set stays within BLOOM_M."""
    from pyspark.sql import functions as F

    from dream_spark.operators.sketch import BLOOM_M, bloom_position_array
    from dream_spark.sources.tables import load_table
    from dream_spark.streaming.documents import bloom_stream_gate
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    dec = str(tmp_path / "dec")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = bloom_stream_gate(spark, src, dec, ckpt)
        q.awaitTermination()

    b1.write.mode("append").parquet(src)
    drain()
    d1 = {r["doc_id"]: r["maybe_seen"] for r in spark.read.parquet(dec).collect()}
    assert set(d1) == {r["doc_id"] for r in b1.collect()}
    assert all(v == 0 for v in d1.values())  # empty filter: nothing seen

    b2.write.mode("append").parquet(src)
    drain()
    rows = spark.read.parquet(dec).collect()
    d2 = {r["doc_id"]: r["maybe_seen"] for r in rows if r["doc_id"] not in d1}
    # sequential reference: batch-1 bit set, probed by batch-2 rows
    bits1 = {
        r["pos"]
        for r in b1.select(F.explode(bloom_position_array()).alias("pos")).collect()
    }
    want = {
        r["doc_id"]: int(set(r["ps"]) <= bits1)
        for r in b2.select("doc_id", bloom_position_array().alias("ps")).collect()
    }
    assert d2 == want
    import os
    bits_path = os.path.join(ckpt, "bloom_bits")
    bits_df = spark.read.parquet(bits_path)
    # bounded membership set (sketch geometry) + per-batch physical layout
    assert bits_df.select("pos").distinct().count() <= BLOOM_M
    assert {r["batch"] for r in bits_df.select("batch").distinct().collect()} == {0, 1}
