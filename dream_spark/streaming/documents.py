"""Streaming document curation — the streamable subset of
``operators/pipeline.curate`` as a Structured Streaming pipeline.

Production training-data platforms split curation across two layers: the
STREAM layer applies per-document gates the moment data lands (quality
filter, exact dedup against recent history, split assignment — all
map-only or bounded-state), while the BATCH compaction layer runs the
corpus-wide passes a stream cannot (near-duplicate clustering needs a
corpus self-join; that is ``pipeline_curate``).  This module is the stream
layer:

- quality gate: whitespace-token count ≥ CURATE_MIN_TOKENS — a pure
  projection, no state;
- exact dedup: ``dropDuplicatesWithinWatermark`` on the content hash —
  state holds one hash per document seen within the lateness horizon, so
  it stays bounded on an unbounded stream (the same contract as
  events.dedup_stream);
- split: the deterministic universal-hash bucketing (map-only — the hash
  IS the membership function, so stream and batch agree on every id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dream_spark.operators.pipeline import CURATE_MIN_TOKENS, split_assign

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (glob-filtered: the sf
    dir holds every table)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def dedup_stream_incremental(
    spark: SparkSession,
    src_dir: str,
    index_path: str,
    kept_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming NEAR-duplicate dedup: every micro-batch runs the batch
    incremental LSH dedup (operators/dedup.py::incremental_minhash_dedup)
    against the signature index persisted so far, appends the surviving
    documents to ``kept_path`` and their band rows to ``index_path``.

    This is the production shape for dedup on a growing corpus: the
    exact-dedup stream layer (``curate_stream``) catches byte-identical
    repeats within the watermark horizon; THIS layer catches near-dups
    against ALL history, because its state is the persisted index, not
    bounded streaming state — per-batch work is one (band, bh) equi-join
    probe against the index plus within-batch banding.  First-seen wins
    across batches (order-dependent by design, like any incremental
    dedup); the corpus-wide re-dedup remains the batch compaction layer.
    Exactly-once at the file-source level via the checkpoint; the parquet
    appends are at-least-once on retry (the standard foreachBatch caveat —
    a MERGE-capable sink closes it in production).  Write ORDER matters
    for that retry: documents land in ``kept_path`` BEFORE their band rows
    land in the index — were the index written first and the batch
    retried, the batch would collide with its own band rows and silently
    drop every document; with this order a replay re-appends duplicates
    (the documented at-least-once behavior), never loses data."""
    from pyspark.sql.utils import AnalysisException

    from dream_spark.operators.dedup import incremental_minhash_dedup

    def _sink(batch_docs: DataFrame, batch_id: int) -> None:
        # no os.path.exists probe: it only answers for LOCAL paths and
        # would report a fully-present s3://... index as absent on every
        # batch — silently disabling the against-all-history check (the
        # same trap streaming/triples.py::store documents; r7 review)
        try:
            idx = spark.read.parquet(index_path)
        except AnalysisException:  # first batch: no index yet
            idx = None
        kept_ids, kept_bands = incremental_minhash_dedup(
            batch_docs.select("doc_id", "text"), idx
        )
        batch_docs.join(kept_ids, on="doc_id").write.mode("append").parquet(kept_path)
        kept_bands.write.mode("append").parquet(index_path)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .load(src_dir)
    )
    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curate_stream(
    docs: DataFrame,
    min_tokens: int = CURATE_MIN_TOKENS,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming curation: quality gate → bounded-state exact dedup on the
    content hash → deterministic split.  Output: (doc_id, n_tokens, split)
    — the same schema as the batch ``curate`` so a consumer can read
    either layer."""
    # token count matching functions.features.tokens: non-empty lowercase
    # alnum runs.  filter(x -> x != '') keeps the count JVM-side.  The
    # SHARED regex constant, not a duplicated literal — a TOKEN_SPLIT_RE
    # change must move the streaming gate with the batch gate (r7 review).
    from dream_spark.functions.features import TOKEN_SPLIT_RE

    n_tokens = F.size(
        F.filter(F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE), lambda x: x != "")
    ).cast("bigint")
    gated = (
        docs.withColumn("n_tokens", n_tokens)
        .where(F.col("n_tokens") >= min_tokens)
        .withColumn("content_hash", F.xxhash64("text"))
        .withColumn("ingest_ts", F.current_timestamp())
    )
    deduped = gated.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    return split_assign(deduped).select("doc_id", "n_tokens", "split")


def bloom_stream_gate(
    spark: SparkSession,
    src_dir: str,
    decisions_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming have-we-seen-it ingest gate: per micro-batch, probe each
    arriving document's Bloom bit positions against the PERSISTED bit
    set, append ``(doc_id, source, maybe_seen)`` decisions, then fold the
    batch's positions into the set — the in-flight form of
    ``operators.sketch.bloom_probe`` (identical position kernel, so a
    batch doc marked maybe_seen would collide in the batch probe too).

    The filter's MEMBERSHIP SET stays within ``BLOOM_M`` (4096) positions
    regardless of how much history has streamed past — the bounded-state
    story other streaming operators get from watermarks, here from the
    sketch's geometry.  Physically the positions live PER BATCH
    (``bloom_bits/batch=N`` parquet dirs, ≤ m rows ≈ 32 KB each; the
    union over batches is the filter) so that foreachBatch REPLAY is
    exactly-once by construction: a replayed batch probes only the
    batches BEFORE it — identical inputs, identical decisions — and
    overwrites its own partition dirs, never corrupting earlier state or
    re-probing its own positions.  Decisions are likewise written per
    batch, so a replay rewrites the same rows instead of appending
    contradictions.  First-seen wins across batches (order-dependent by
    design, like incremental dedup)."""
    import os

    from pyspark.sql.utils import AnalysisException

    from dream_spark.operators.sketch import bloom_position_array

    bits_path = os.path.join(checkpoint_dir, "bloom_bits")

    def _sink(batch_docs: DataFrame, batch_id: int) -> None:
        # read-gated by try/except, not os.path.exists (local-only; would
        # silently report an s3:// bit set absent forever — r7 review);
        # DISTINCT positions before the collect, so the driver pull is
        # bounded by BLOOM_M regardless of batch count (the raw per-batch
        # rows grow with history), and NULL positions (NULL-text docs)
        # never reach the sort
        bits: list[int] = []
        # the try wraps ONLY the read: a missing path is the legitimate
        # first-batch case, but an AnalysisException from the filter/
        # select chain (schema drift, foreign data at bits_path) must
        # propagate — swallowing it would silently reset the bit set and
        # discard all accumulated history
        try:
            prior = spark.read.parquet(bits_path)
        except AnalysisException:  # first batch: no bit set yet
            prior = None
        if prior is not None:
            bits = sorted(
                r["pos"]
                for r in prior.where(F.col("batch") < batch_id)
                .select("pos")
                .where(F.col("pos").isNotNull())
                .distinct()
                .collect()
            )
        pos = batch_docs.select(
            "doc_id", "source", bloom_position_array().alias("__ps")
        ).persist()
        if bits:
            hit = F.size(F.array_except(F.col("__ps"), F.lit(bits))) == 0
        else:
            hit = F.lit(False)
        decided = pos.select(
            "doc_id", "source", hit.cast("bigint").alias("maybe_seen")
        )
        decided.write.mode("overwrite").parquet(
            os.path.join(decisions_path, f"batch={batch_id}")
        )
        (
            pos.select(F.explode("__ps").alias("pos"))
            .distinct()  # ≤ m rows per batch
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(bits_path, f"batch={batch_id}"))
        )
        # persisted because TWO actions consume pos (decisions + bit set):
        # unpersisted, the source re-read and the Horner pack x 3 hashes
        # would run twice per micro-batch (r7 review)
        pos.unpersist()

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .load(src_dir)
    )
    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def contamination_stream(
    spark: SparkSession,
    src_dir: str,
    benchmark: DataFrame,
    flagged_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming benchmark-contamination gate: every micro-batch runs the
    batch ``contamination_check`` of the arriving documents against a
    STATIC benchmark/eval set and appends the flagged (doc_id, n_hits)
    rows to ``flagged_path``.

    This is the in-flight form of the decontamination pass: documents are
    screened the moment they land instead of in a corpus-wide sweep.  The
    benchmark n-gram set is computed ONCE and written as a parquet
    artifact under the checkpoint directory — durable (survives a stream
    restart with the checkpoint), no session cache to leak, and the
    per-batch probe is the SAME ``contamination_probe`` the batch operator
    runs (size-gated broadcast, degrades to a sid-keyed shuffle join on an
    oversized benchmark).  Exactly-once at the file-source level via the
    checkpoint; the parquet append is at-least-once on retry (same
    foreachBatch caveat as the incremental dedup sink — flags are
    idempotent per doc_id, so a replay re-appends rows, never corrupts
    them)."""
    import os

    from dream_spark.operators.pipeline import benchmark_ngram_set, contamination_probe

    bpath = os.path.join(checkpoint_dir, "benchmark_sids")
    benchmark_ngram_set(benchmark).write.mode("overwrite").parquet(bpath)
    bset = spark.read.parquet(bpath)

    def _sink(batch_docs: DataFrame, batch_id: int) -> None:
        flagged = contamination_probe(batch_docs.select("doc_id", "text"), bset)
        flagged.write.mode("append").parquet(flagged_path)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .load(src_dir)
    )
    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
