"""Multimodal column support: opaque binary payloads + typed metadata.

Design (per the north-star spec): image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct alongside.  All *plumbing* —
schema, metadata predicate pushdown, batched Arrow transfer, partition-sized
processing — is real Spark; the actual codec work (image decode, resampling,
frame extraction) is stubbed behind ``mapInPandas`` UDFs because the codec
libraries are not in this container.  The UDF signatures, batch shapes and
output schemas are exactly what a real decoder drops into.

``media_catalog`` is the oracle-checked surface: the binary payload +
metadata synthesis is pure deterministic SQL-expressible derivation from
``documents``, so DuckDB replays it (binary column included — both engines
produce the same UTF-8 bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dream_spark.sources.tables import load_table

FORMATS = ["png", "jpeg", "webp"]


def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table: (doc_id, payload BINARY, fmt, width,
    height, n_bytes), with a metadata predicate (n_bytes bounds + format
    filter) that prunes before any decode touches the payload."""
    docs = load_table(spark, sf_dir, "documents")
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, FORMATS[0])
        .when(F.col("doc_id") % 3 == 1, FORMATS[1])
        .otherwise(FORMATS[2])
    )
    out = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        fmt.alias("fmt"),
        (F.lit(64) + F.col("doc_id") % 448).cast("int").alias("width"),
        (F.lit(64) + (F.col("doc_id") * 7) % 448).cast("int").alias("height"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
    )
    return out.where((F.col("n_bytes") >= 64) & (F.col("fmt") != "webp"))


def media_catalog_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked projection of the catalog: metadata columns only.
    (Binary payload bytes are identical on both engines but typed
    differently across drivers — bytes vs memoryview — so the compared
    surface sticks to scalars; the payload itself is exercised by the
    decode-pipeline tests.)"""
    return media_catalog(spark, sf_dir).drop("payload")


MEDIA_CATALOG_META_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg'
            ELSE 'webp' END AS fmt,
       CAST(64 + doc_id % 448 AS INT) AS width,
       CAST(64 + (doc_id * 7) % 448 AS INT) AS height,
       octet_length(encode(text)) AS n_bytes
FROM documents
WHERE octet_length(encode(text)) >= 64
  AND (CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg'
            ELSE 'webp' END) <> 'webp'
""".strip()


MEDIA_CATALOG_SQL = """
SELECT doc_id,
       encode(text) AS payload,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg'
            ELSE 'webp' END AS fmt,
       CAST(64 + doc_id % 448 AS INT) AS width,
       CAST(64 + (doc_id * 7) % 448 AS INT) AS height,
       octet_length(encode(text)) AS n_bytes
FROM documents
WHERE octet_length(encode(text)) >= 64
  AND (CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg'
            ELSE 'webp' END) <> 'webp'
""".strip()


# --------------------------------------------------------------------------
# decode / feature-extract pipeline (stubbed codecs, real Spark plumbing)
# --------------------------------------------------------------------------
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def _fake_decode(payload: bytes, width: int, height: int) -> tuple[float, bool]:
    """Deterministic stand-in for an image decoder: 'luma' = mean byte value.

    A real implementation replaces this body with e.g. PIL/libvips decode —
    the surrounding Arrow-batched plumbing is unchanged.
    """
    if not payload:
        return 0.0, False
    return sum(payload) / len(payload) / 255.0, True


def decode_and_resize(df: DataFrame, target: int = 224) -> DataFrame:
    """mapInPandas decode+resize: Arrow-batched, partition-parallel, constant
    memory per batch — the canonical shape for CPU-bound media work on
    Spark.  Codec calls are stubbed (see _fake_decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lumas, oks, ows, ohs = [], [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                luma, ok = _fake_decode(bytes(payload), int(w), int(h))
                lumas.append(luma)
                oks.append(ok)
                # aspect-preserving fit into target×target with INTEGER floor
                # scaling: exact (no float ties), replayable in plain SQL
                m = max(int(w), int(h), 1)
                ows.append(int(w) * target // m)
                ohs.append(int(h) * target // m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": pdf["fmt"],
                    "out_width": ows,
                    "out_height": ohs,
                    "mean_luma": lumas,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling stub: emit one row per sampled 'frame'
    index derived from payload length — demonstrates the row-expanding
    mapInPandas shape (one input row → many output rows)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_offset", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(bytes(payload)) // every_n
                for k in range(n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k)
                    rows["frame_offset"].append(k * every_n)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=schema)


def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full decode pipeline surfaced as a query: catalog → metadata
    prune → mapInPandas decode/resize → per-format stats.  The luma kernel
    is the genuinely non-SQL part (a real codec replaces _fake_decode), but
    the COMPARED surface — decode counts and integer resize geometry — is
    pure arithmetic, so the oracle replays it in SQL and this entry gets a
    full hash check rather than the weaker rows-only one."""
    decoded = decode_and_resize(media_catalog(spark, sf_dir))
    return decoded.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n_decoded"),
        F.sum(F.when(F.col("decode_ok"), 1).otherwise(0)).alias("n_ok"),
        F.max("out_width").alias("max_w"),
        F.max("out_height").alias("max_h"),
    )


MEDIA_DECODE_STATS_SQL = """
WITH cat AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'jpeg'
              ELSE 'webp' END AS fmt,
         CAST(64 + doc_id % 448 AS INT) AS width,
         CAST(64 + (doc_id * 7) % 448 AS INT) AS height,
         octet_length(encode(text)) AS n_bytes
  FROM documents
  WHERE octet_length(encode(text)) >= 64
    AND (CASE WHEN doc_id % 3 = 0 THEN 'png'
              WHEN doc_id % 3 = 1 THEN 'jpeg'
              ELSE 'webp' END) <> 'webp'
)
SELECT fmt,
       CAST(COUNT(*) AS BIGINT) AS n_decoded,
       CAST(SUM(CASE WHEN n_bytes > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       MAX(CAST(width * 224 // GREATEST(width, height, 1) AS INT)) AS max_w,
       MAX(CAST(height * 224 // GREATEST(width, height, 1) AS INT)) AS max_h
FROM cat GROUP BY fmt
""".strip()


def media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline surfaced as a query: catalog → mapInPandas
    frame_sample (1 row in → n rows out) → per-document frame stats.
    Unlike the decode kernel, the sampling schedule is a pure function of
    payload length, so the row-expanding UDF output IS oracle-checkable:
    n_frames = ⌊n_bytes/10⌋, last offset = (n_frames−1)·10."""
    frames = frame_sample(media_catalog(spark, sf_dir), every_n=10)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_offset").alias("last_offset"),
    )


MEDIA_FRAME_STATS_SQL = """
SELECT doc_id,
       octet_length(encode(text)) // 10 AS n_frames,
       CAST((octet_length(encode(text)) // 10 - 1) * 10 AS BIGINT) AS last_offset
FROM documents
WHERE octet_length(encode(text)) >= 64
  AND doc_id % 3 <> 2
  AND octet_length(encode(text)) // 10 > 0
""".strip()


# --------------------------------------------------------------------------
# embedding-extractor stub + similarity integration
# --------------------------------------------------------------------------
EMBED_DIMS = 8
_EMBED_QUANT = 1000  # per-dim values land in {0/1000, …, 999/1000}
_EMBED_FN_BASE = 3  # universal-hash family offset for the embed dims


def pseudo_embed(media: DataFrame) -> DataFrame:
    """Embedding-extractor STUB over the opaque binary payload: a real
    image/audio encoder drops into this exact mapInPandas slot (same batch
    shape, same output schema).  The stand-in embedding is deterministic
    integer math — Horner-pack the first 8 payload bytes (identical to
    features.pack_sql over the source text, since payload = encode(text)
    and the corpus is ASCII), then dim_i = h_i(base) mod 1000 / 1000 — so
    the DuckDB oracle replays it bit-for-bit, which a real encoder could
    never offer.  Output: (vec_id, embedding array<double>)."""
    import numpy as np

    from dream_spark.functions.hashing import MERSENNE_P, hash_params

    ab = [hash_params(_EMBED_FN_BASE + i) for i in range(EMBED_DIMS)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)[:8]
                acc = np.int64(b[0]) if b else np.int64(0)
                for ch in b[1:]:
                    acc = (acc * 256 + ch) % MERSENNE_P
                ids.append(doc_id)
                vecs.append(
                    np.array(
                        [((a * acc + c) % MERSENNE_P % _EMBED_QUANT) for a, c in ab],
                        dtype=np.float64,
                    )
                    / _EMBED_QUANT
                )
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(ids, dtype="int64"),
                    "embedding": pd.Series(vecs, dtype=object),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="vec_id long, embedding array<double>"
    )


MEDIA_KNN_K = 3
_MEDIA_QUERY_MOD = 101


def media_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal → similarity integration: extract (stub) embeddings from
    the media payloads, then exact top-k cosine neighbors for the query
    subset (doc_id ≡ 0 mod 101) — the metadata filter prunes before the
    extractor ever touches a payload, and the kNN reuses the generic
    brute-force primitive (query side broadcast, corpus never shuffled)."""
    from dream_spark.operators.similarity import knn_topk

    cat = media_catalog(spark, sf_dir)
    emb = pseudo_embed(cat)
    # filter the QUERY side on metadata (doc_id ≡ vec_id) BEFORE the
    # extractor: filtering emb after pseudo_embed cannot push the predicate
    # through the mapInPandas barrier, so the (expensive with a real
    # encoder) extractor would run over the full catalog a second time just
    # to keep ~1% of it
    q = pseudo_embed(cat.where(F.col("doc_id") % _MEDIA_QUERY_MOD == 0))
    return knn_topk(emb, q, k=MEDIA_KNN_K)


def _media_knn_sql() -> str:
    from dream_spark.functions.features import pack_sql
    from dream_spark.functions.hashing import hash_sql

    base = pack_sql("text", 8)
    dims = ", ".join(
        f"CAST(FLOOR((CAST({hash_sql('base', _EMBED_FN_BASE + i)} % {_EMBED_QUANT} AS DOUBLE)"
        f" / {_EMBED_QUANT}) * 1000000) AS BIGINT) AS q{i}"
        for i in range(EMBED_DIMS)
    )
    dot_ab = " + ".join(f"a.q{i} * b.q{i}" for i in range(EMBED_DIMS))
    nrm = " + ".join(f"q{i} * q{i}" for i in range(EMBED_DIMS))
    cos = f"CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"
    return f"""
WITH cat AS (
  SELECT doc_id, text FROM documents
  WHERE octet_length(encode(text)) >= 64 AND doc_id % 3 <> 2
),
packed AS (SELECT doc_id, {base} AS base FROM cat),
emb AS (SELECT doc_id AS vec_id, {dims} FROM packed),
qn AS (SELECT *, {nrm} AS nrm FROM emb),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {dot_ab} AS dot, a.nrm AS na, b.nrm AS nb
  FROM qn a JOIN qn b
    ON a.vec_id % {_MEDIA_QUERY_MOD} = 0 AND a.vec_id <> b.vec_id
),
scored AS (SELECT query_id, neighbor_id, {cos} AS cos FROM pairs)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {MEDIA_KNN_K}
""".strip()


MEDIA_KNN_SQL = _media_knn_sql()


def payload_dedup(media: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Exact byte-level dedup for ANY binary-payload DataFrame: group by
    the payload's SHA-256, report (payload_sha256, n_copies,
    canonical_id) with the minimum id as canonical — the
    hash-the-bytes-once pass every multimodal ingest runs before any
    decode spends GPU/CPU on a duplicate asset.

    Scale shape: the hash is a map-side projection (the 100-TB payload
    column never shuffles — only 64-char digests + ids move), then one
    partially-aggregated groupBy on the digest."""
    h = F.sha2(F.col(payload_col), 256)
    return (
        media.select(h.alias("payload_sha256"), F.col(id_col))
        .groupBy("payload_sha256")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: exact payload dedup over the media
    catalog."""
    return payload_dedup(media_catalog(spark, sf_dir))


# The synthesized payload is encode(text), so hashing the source VARCHAR
# (DuckDB sha256 accepts only VARCHAR) hashes the identical bytes the
# Spark side hashes as BINARY — the digests match bit-for-bit.
MEDIA_DEDUP_SQL = """
SELECT sha256(text) AS payload_sha256,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS canonical_id
FROM documents
WHERE octet_length(encode(text)) >= 64
  AND (CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg'
            ELSE 'webp' END) <> 'webp'
GROUP BY sha256(text)
""".strip()


# --------------------------------------------------------------------------
# audio modality (stubbed PCM decode, real windowed-segmentation plumbing)
# --------------------------------------------------------------------------
#: audio chunk length in seconds (training pipelines segment long audio
#: into fixed windows before feature extraction)
AUDIO_CHUNK_SEC = 5

AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_chunks", T.LongType()),
        T.StructField("last_chunk_samples", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def audio_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio analog of :func:`media_catalog`: (doc_id, payload BINARY,
    sample_rate, n_samples) — payload bytes stand in for mono PCM16, so
    n_samples = n_bytes // 2; the sample rate comes from id arithmetic
    like the image formats do.  The metadata predicate (minimum byte
    length) prunes before any decode touches the payload."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("doc_id") % 3 == 0, 8000)
        .when(F.col("doc_id") % 3 == 1, 16000)
        .otherwise(44100)
    )
    out = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        rate.cast("int").alias("sample_rate"),
        # exact integer `div`, matching the oracle's `//` — float
        # divide-then-cast can round across a boundary above 2^53 (the
        # module-wide exact-integer-division contract; r6 ADVICE)
        F.expr("octet_length(encode(text, 'UTF-8')) div 2").alias("n_samples"),
    )
    return out.where(F.col("n_samples") >= 16)


_AUDIO_CATALOG_CTE = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 8000
            WHEN doc_id % 3 = 1 THEN 16000
            ELSE 44100 END AS sample_rate,
       octet_length(encode(text)) // 2 AS n_samples
FROM documents
WHERE octet_length(encode(text)) // 2 >= 16
""".strip()


def audio_chunk_stats(df: DataFrame) -> DataFrame:
    """mapInPandas windowed segmentation: each clip splits into
    AUDIO_CHUNK_SEC-second windows at ITS OWN sample rate — n_chunks =
    ceil(n_samples / (rate·sec)), plus the ragged tail length.  The
    decode call is stubbed (a real implementation decodes the container
    and reads frames per window; the Arrow-batched plumbing, schema, and
    per-batch memory bound are what this pins).  All compared outputs are
    integer arithmetic, so the oracle replays them in SQL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_chunks, tails, oks = [], [], []
            for payload, rate, n in zip(
                pdf["payload"], pdf["sample_rate"], pdf["n_samples"]
            ):
                ok = len(bytes(payload)) > 0  # stub: a codec validates here
                chunk = int(rate) * AUDIO_CHUNK_SEC
                k = (int(n) + chunk - 1) // chunk if n else 0
                n_chunks.append(k)
                tails.append(int(n) - (k - 1) * chunk if k else 0)
                oks.append(ok)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pdf["sample_rate"],
                    "n_samples": pdf["n_samples"],
                    "n_chunks": n_chunks,
                    "last_chunk_samples": tails,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(run, schema=AUDIO_CHUNK_SCHEMA)


def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: per sample rate, clip count, total chunk
    count, and the longest ragged tail — the segmentation summary a
    feature-extraction stage is sized from."""
    stats = audio_chunk_stats(audio_catalog(spark, sf_dir))
    return stats.groupBy("sample_rate").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_chunks").alias("total_chunks"),
        F.max("last_chunk_samples").alias("max_tail"),
    )


MEDIA_AUDIO_CHUNKS_SQL = f"""
WITH cat AS ({_AUDIO_CATALOG_CTE}),
chunks AS (
  SELECT sample_rate, n_samples,
         (n_samples + sample_rate * {AUDIO_CHUNK_SEC} - 1) // (sample_rate * {AUDIO_CHUNK_SEC}) AS n_chunks
  FROM cat
)
SELECT sample_rate,
       CAST(COUNT(*) AS BIGINT) AS n_clips,
       CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
       CAST(MAX(n_samples - (n_chunks - 1) * sample_rate * {AUDIO_CHUNK_SEC}) AS BIGINT) AS max_tail
FROM chunks GROUP BY sample_rate
""".strip()


# --------------------------------------------------------------------------
# image-text pair curation gate
# --------------------------------------------------------------------------
#: pair-gate bounds: captions outside [MIN, MAX] chars or images with
#: aspect ratio beyond 2:1 are dropped (the standard web-pair filters)
PAIR_CAPTION_MIN, PAIR_CAPTION_MAX = 100, 2000
PAIR_MAX_ASPECT = 2


def media_pair_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text PAIR curation (the web-scale pair-filtering shape): the
    media catalog joined back to its caption text, keeping pairs whose
    image passes the geometry gate (aspect ratio ≤ 2:1, exact integer
    test max ≤ 2·min) AND whose caption passes the length gate.  One
    equi-join on doc_id plus row-local predicates — the join prunes both
    sides before any decode, so at scale this gates the expensive stages
    rather than following them."""
    cat = media_catalog(spark, sf_dir).drop("payload")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("caption_len")
    )
    paired = cat.join(docs, on="doc_id")
    aspect_ok = (
        F.greatest("width", "height") <= PAIR_MAX_ASPECT * F.least("width", "height")
    )
    caption_ok = F.col("caption_len").between(PAIR_CAPTION_MIN, PAIR_CAPTION_MAX)
    return paired.where(aspect_ok & caption_ok).select(
        "doc_id", "fmt", "width", "height", "caption_len"
    )


MEDIA_PAIR_GATE_SQL = f"""
WITH cat AS ({MEDIA_CATALOG_META_SQL})
SELECT c.doc_id, c.fmt, c.width, c.height, LENGTH(d.text) AS caption_len
FROM cat c JOIN documents d ON d.doc_id = c.doc_id
WHERE GREATEST(c.width, c.height) <= {PAIR_MAX_ASPECT} * LEAST(c.width, c.height)
  AND LENGTH(d.text) BETWEEN {PAIR_CAPTION_MIN} AND {PAIR_CAPTION_MAX}
""".strip()


QUERIES = {
    "media_audio_chunks": media_audio_chunks,
    "media_pair_gate": media_pair_gate,
    "media_catalog": media_catalog_meta,
    "media_decode_stats": media_decode_stats,
    "media_frames": media_frame_stats,
    "media_knn": media_knn,
    "media_dedup": media_dedup,
}
ORACLES = {
    "media_audio_chunks": MEDIA_AUDIO_CHUNKS_SQL,
    "media_pair_gate": MEDIA_PAIR_GATE_SQL,
    "media_catalog": MEDIA_CATALOG_META_SQL,
    "media_decode_stats": MEDIA_DECODE_STATS_SQL,
    "media_frames": MEDIA_FRAME_STATS_SQL,
    "media_knn": MEDIA_KNN_SQL,
    "media_dedup": MEDIA_DEDUP_SQL,
}
