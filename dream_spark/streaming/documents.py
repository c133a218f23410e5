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
    # alnum runs.  filter(x -> x != '') keeps the count JVM-side.
    n_tokens = F.size(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: x != "")
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
