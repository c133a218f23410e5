"""Multimodal column plumbing: catalog oracle match, binary round-trip,
mapInPandas decode/resize pipeline, frame sampling."""

from __future__ import annotations

from dream_spark.operators import multimodal as M
from tests.conftest import SF_DIR, assert_oracle_match


def test_media_catalog_oracle(spark, duck):
    assert_oracle_match(M.media_catalog_meta(spark, SF_DIR), duck, M.MEDIA_CATALOG_META_SQL)


def test_payload_roundtrip(spark):
    """Binary payload decodes back to the source text (schema plumbing)."""
    from pyspark.sql import functions as F
    from dream_spark.sources.tables import load_table

    cat = M.media_catalog(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    j = cat.join(docs, on="doc_id").select(
        (F.decode(F.col("payload"), "UTF-8") == F.col("text")).alias("ok")
    )
    assert j.where(~F.col("ok")).count() == 0


def test_decode_pipeline(spark):
    cat = M.media_catalog(spark, SF_DIR)
    out = M.decode_and_resize(cat, target=224)
    rows = out.collect()
    assert len(rows) == cat.count()
    for r in rows[:20]:
        assert r["decode_ok"]
        assert 0.0 <= r["mean_luma"] <= 1.0
        assert max(r["out_width"], r["out_height"]) <= 224


def test_frame_sample_expands_rows(spark):
    cat = M.media_catalog(spark, SF_DIR).limit(5)
    frames = M.frame_sample(cat, every_n=50).collect()
    assert len(frames) > 5
    assert all(f["frame_offset"] == f["frame_idx"] * 50 for f in frames)


def test_media_knn_oracle(spark, duck):
    from dream_spark.operators import multimodal as M
    from tests.conftest import SF_DIR, assert_oracle_match

    assert_oracle_match(M.media_knn(spark, SF_DIR), duck, M.MEDIA_KNN_SQL)


def test_pseudo_embed_shape(spark):
    from dream_spark.operators import multimodal as M
    from tests.conftest import SF_DIR

    emb = M.pseudo_embed(M.media_catalog(spark, SF_DIR))
    row = emb.limit(1).collect()[0]
    assert len(row["embedding"]) == M.EMBED_DIMS
    assert all(0.0 <= x < 1.0 for x in row["embedding"])


def test_payload_dedup_groups_identical_bytes(spark):
    from dream_spark.operators.multimodal import payload_dedup

    media = spark.createDataFrame(
        [(1, bytearray(b"imgA")), (2, bytearray(b"imgA")), (3, bytearray(b"imgB"))],
        "doc_id long, payload binary",
    )
    rows = {r["canonical_id"]: r["n_copies"] for r in payload_dedup(media).collect()}
    assert rows == {1: 2, 3: 1}


def test_payload_dedup_never_shuffles_payload_bytes(spark):
    """Only digests + ids may reach the exchange — the payload column must
    be projected away below the aggregation."""
    from dream_spark.operators.multimodal import media_dedup
    from tests.conftest import SF_DIR

    plan = media_dedup(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    exchange_inputs = plan.split("Exchange")[1] if "Exchange" in plan else ""
    assert "payload#" not in exchange_inputs.split("Scan")[0]


def test_audio_chunk_segmentation_math(spark):
    """Hand-built clips pin the windowing contract: ceil-division chunk
    count at each clip's OWN sample rate, ragged tail length, and the
    exact-multiple case (tail = one full chunk, never 0)."""
    from dream_spark.operators.multimodal import AUDIO_CHUNK_SEC, audio_chunk_stats

    rows = [
        (1, b"x" * 100, 8000, 40_000),    # exactly one 5 s chunk at 8 kHz
        (2, b"x" * 100, 8000, 40_001),    # one sample over -> 2 chunks, tail 1
        (3, b"x" * 100, 16000, 200_000),  # 2.5 chunks at 16 kHz -> 3, tail 40k
        (4, b"", 16000, 0),               # empty payload: decode_ok False
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, sample_rate int, n_samples long"
    )
    got = {r["doc_id"]: r for r in audio_chunk_stats(df).collect()}
    assert (got[1]["n_chunks"], got[1]["last_chunk_samples"]) == (1, 40_000)
    assert (got[2]["n_chunks"], got[2]["last_chunk_samples"]) == (2, 1)
    assert (got[3]["n_chunks"], got[3]["last_chunk_samples"]) == (3, 40_000)
    assert got[3]["n_chunks"] * 16000 * AUDIO_CHUNK_SEC >= 200_000
    assert got[4]["decode_ok"] is False and got[4]["n_chunks"] == 0


def test_pair_gate_bounds(spark):
    """The pair gate keeps exactly the rows inside BOTH bounds: every
    survivor has aspect <= 2:1 and caption length in [100, 2000], and the
    survivors plus the single-gate failures account for the catalog."""
    from dream_spark.operators.multimodal import (
        PAIR_CAPTION_MAX,
        PAIR_CAPTION_MIN,
        PAIR_MAX_ASPECT,
        media_catalog,
        media_pair_gate,
    )

    out = media_pair_gate(spark, SF_DIR).collect()
    assert out, "gate dropped everything — fixture drift"
    for r in out:
        assert max(r["width"], r["height"]) <= PAIR_MAX_ASPECT * min(r["width"], r["height"])
        assert PAIR_CAPTION_MIN <= r["caption_len"] <= PAIR_CAPTION_MAX
    assert len(out) < media_catalog(spark, SF_DIR).count()
