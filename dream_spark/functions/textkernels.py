"""Arrow-batched numpy kernels for per-document text signatures.

A MinHash signature, SimHash fingerprint, or shingle set is a *per-document*
computation — there is no cross-row dependency — so the Spark-first shape is
a narrow ``mapInPandas`` projection with ZERO shuffles, not an
explode → groupBy pipeline (which shuffles every shingle row).  At 100 TB
the explode form shuffles ~300× the corpus size; this form shuffles nothing
until the band join.

Exactness contract: every kernel replays the same integer math the DuckDB
oracle runs in SQL (functions/features.py fragments):

- character code = Unicode code point (``ascii()`` on both engines; the
  kernel uses UTF-32 views, identical for any BMP text),
- shingle id = Horner pack c1·65536 + c2·256 + c3  (< 2^24, no modulus
  reached),
- h_i(x) = (A_i·x + B_i) mod (2^31-1) in int64 (products < 2^55, exact).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from dream_spark.functions.features import SHINGLE_LEN
from dream_spark.functions.hashing import MERSENNE_P, hash_params


def spread_small(df: DataFrame) -> DataFrame:
    """Spread the (narrow) kernel input across the cluster ONLY when it
    arrives under-split: a small parquet table comes in as one input split,
    which would run the whole Arrow kernel on a single core.  When the scan
    already spans >= defaultParallelism input files (every real-scale
    input), return the frame untouched — an unconditional ``repartition``
    here is a FULL shuffle of the raw (doc_id, text) corpus, which at
    100 TB moves the entire text payload the zero-shuffle kernels exist to
    avoid.  The gate reads ``inputFiles()`` (analysis-only, ~free) rather
    than ``rdd.getNumPartitions()`` (full physical planning + RDD
    conversion, ~1 s cold per call); file count under-estimates split
    count for files above maxPartitionBytes, which only errs toward the
    harmless small-input branch."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= par:
            return df
    except Exception:
        pass
    return df.repartition(par)


_spread = spread_small


def _doc_sids(text: str, distinct: bool) -> np.ndarray:
    """int64 shingle ids of one document (character 3-grams of lower()) —
    the exact numpy replay of features.shingle_id_sql:

    - the Horner pack applies the mod-P reduction at EVERY step, like the
      SQL does: codepoints ≥ U+8000 push the unreduced pack past P, so a
      direct base-256 pack diverges from the oracle on any CJK text (and
      the unreduced ~2^32 sid then silently overflows A·sid in int64
      inside the minhash);
    - the shingle count and guard use the ORIGINAL text length, like the
      SQL's ``sequence(1, length(text)-2)`` over ``lower(text)`` — Python
      ``lower()`` can change a string's length (e.g. İ → i̇), which would
      otherwise emit shingles for documents the oracle skips.  Positions
      past the lowered string's end pack as 0, matching ``ascii('') = 0``.
    """
    t = text.lower()
    n_orig = len(text)
    if n_orig < SHINGLE_LEN:
        return np.empty(0, dtype=np.int64)
    c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    num = n_orig - (SHINGLE_LEN - 1)
    need = num + SHINGLE_LEN - 1
    if len(c) < need:
        c = np.concatenate([c, np.zeros(need - len(c), dtype=np.int64)])
    acc = c[0:num].copy()
    for j in range(1, SHINGLE_LEN):
        acc = (acc * 256 + c[j : num + j]) % MERSENNE_P
    return np.unique(acc) if distinct else acc


def _hash_rows(k: int) -> tuple[np.ndarray, np.ndarray]:
    ab = np.array([hash_params(i) for i in range(k)], dtype=np.int64)
    return ab[:, 0:1], ab[:, 1:2]  # column vectors for broadcasting


def _batch_segments(pdf: pd.DataFrame, distinct: bool):
    """Flatten one Arrow batch's documents into a single shingle-id vector
    with segment bookkeeping: (kept doc_ids, flat sids, per-doc lengths,
    segment start offsets).  Documents with zero shingles are dropped.
    Shingle extraction stays per-document (string work), but every
    subsequent hash/reduce runs ONCE over the flat vector — batch-level
    vectorization instead of a Python loop of tiny numpy calls per doc."""
    sid_arrays = [_doc_sids(t, distinct=distinct) for t in pdf["text"]]
    lens = np.array([len(s) for s in sid_arrays], dtype=np.int64)
    keep = lens > 0
    if not keep.any():
        return None
    doc_ids = pdf["doc_id"].to_numpy()[keep]
    lens = lens[keep]
    sids = np.concatenate([s for s in sid_arrays if len(s)])
    starts = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)[:-1]])
    return doc_ids, sids, lens, starts


def minhash_signatures(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, sig0..sig{k-1}) for every document with ≥1 shingle.
    One pass, no shuffle: sig_i = min over shingles of h_i(sid) as ONE
    (k × n_shingles) blocked matrix op per document.

    Measured (sf0.1, 5000 docs, k=16): this per-doc blocked form beats a
    whole-batch flatten + ``minimum.reduceat`` segment-min 2× at both
    ~300 and ~3000 shingles/doc — the (16 × n) block stays in cache
    across all k hash rows, while the flat form streams the full shingle
    vector through memory once per hash fn.  (SimHash is the opposite
    case — see :func:`simhash_fingerprints`.)"""
    A, B = _hash_rows(k)
    schema = "doc_id long, " + ", ".join(f"sig{i} long" for i in range(k))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = _doc_sids(text, distinct=False)
                if not len(s):
                    continue
                ids.append(doc_id)
                sigs.append(((A * s + B) % MERSENNE_P).min(axis=1))
            out = np.array(sigs, dtype=np.int64).reshape(len(ids), k)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    **{f"sig{i}": out[:, i] for i in range(k)},
                }
            )

    return _spread(docs.select("doc_id", "text")).mapInPandas(run, schema=schema)


def simhash_fingerprints(docs: DataFrame, bits: int) -> DataFrame:
    """(doc_id, simhash) for every document with ≥1 shingle.  Bit j is the
    sign of Σ over the shingle *set* of (2·bit_j − 1), where bit_j is bit
    (j mod 16) of h_{j//16}(sid) — the exact SQL the oracle runs.  Per
    hash fn: one whole-batch hash pass, then per bit an ``add.reduceat``
    popcount per segment — no per-document Python loop.

    Measured (sf0.1, 5000 docs, 32 bits): 3× faster than the per-doc form,
    whose 32 tiny numpy calls PER DOCUMENT are pure interpreter overhead;
    batching amortizes them to 32 whole-batch passes.  (MinHash measures
    the other way — see :func:`minhash_signatures`.)"""
    n_fns = (bits + 15) // 16
    A, B = _hash_rows(n_fns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seg = _batch_segments(pdf, distinct=True)
            if seg is None:
                continue
            doc_ids, sids, lens, starts = seg
            fp = np.zeros(len(doc_ids), dtype=np.int64)
            for f in range(n_fns):
                h = (A[f, 0] * sids + B[f, 0]) % MERSENNE_P
                for jj in range(min(16, bits - f * 16)):
                    ones = np.add.reduceat((h >> jj) & 1, starts)
                    fp |= ((2 * ones - lens) > 0).astype(np.int64) << (f * 16 + jj)
            yield pd.DataFrame({"doc_id": doc_ids, "simhash": fp})

    return _spread(docs.select("doc_id", "text")).mapInPandas(run, schema="doc_id long, simhash long")


_TOKEN_RE = None


def _doc_token_ids(text: str) -> np.ndarray:
    """int64 token ids of one document in order — the numpy replay of
    features.token_id_sql (Horner pack of the first 8 chars, mod P each
    step) over the lowercase-alnum-run tokenizer."""
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[^a-z0-9]+")
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if not toks:
        return np.empty(0, dtype=np.int64)
    m = np.zeros((len(toks), 8), dtype=np.int64)
    for r, t in enumerate(toks):
        for j, ch in enumerate(t[:8]):
            m[r, j] = ord(ch)
    acc = m[:, 0].copy()
    for j in range(1, 8):
        acc = (acc * 256 + m[:, j]) % MERSENNE_P
    return acc


#: final-step packing base: acc < P < 2^31, so acc·2^31 + tid < 2^62
#: (exact in int64 on both engines)
BIGRAM_BASE = 2_147_483_648
#: intermediate-fold multiplier.  Must NOT be ≡ 1 (mod P): 2^31 ≡ 1 mod
#: (2^31 − 1), which would collapse the fold into an order-insensitive SUM
#: of token ids (any permutation of the first n−1 tokens would collide).
#: 2^16 is ≢ 1 mod P and keeps acc·2^16 + tid < 2^47, exact in int64.
NGRAM_FOLD_MULT = 65_536


def _ngram_ids(tids: np.ndarray, n: int) -> np.ndarray:
    """Distinct packed ids of consecutive token ``n``-grams: Horner fold
    acc = (acc·2^16 + tid) mod P over the first n−1 tokens, final
    acc·2^31 + tid_n without the modulus (< 2^62).  The SQL twin is
    features.token_ngram_sid_expr — identical arithmetic."""
    if len(tids) < n:
        return np.empty(0, dtype=np.int64)
    acc = tids[: len(tids) - n + 1].copy()
    for j in range(1, n - 1):
        acc = (acc * NGRAM_FOLD_MULT + tids[j : len(tids) - n + 1 + j]) % MERSENNE_P
    return np.unique(acc * BIGRAM_BASE + tids[n - 1 :])


def token_ngram_sets(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, sid) distinct — consecutive-token ``n``-grams.  Word n-grams
    are the right Jaccard feature space for text: vastly more discriminative
    than character shingles (and higher n stays discriminative even over a
    tiny vocabulary), so prefix-filtered candidate joins stay near-linear."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_sid = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                u = _ngram_ids(_doc_token_ids(text), n)
                if not len(u):
                    continue
                out_id.append(np.full(len(u), doc_id, dtype=np.int64))
                out_sid.append(u)
            if out_id:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(out_id), "sid": np.concatenate(out_sid)}
                )

    return _spread(docs.select("doc_id", "text")).mapInPandas(run, schema="doc_id long, sid long")


def token_bigram_sets(docs: DataFrame) -> DataFrame:
    """Bigram special case of :func:`token_ngram_sets` (kept for callers
    pinned to the 2-gram feature space, e.g. MinHash banding)."""
    return token_ngram_sets(docs, 2)


def token_ngram_arrays(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, sids: sorted array<long>, n) — the set form of
    token_ngram_sets, for broadcast-join verification of candidate pairs
    (one row per document instead of one per n-gram)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, arrs, ns = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                u = _ngram_ids(_doc_token_ids(text), n)
                if not len(u):
                    continue
                ids.append(doc_id)
                arrs.append(u)
                ns.append(len(u))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    # explicit object Series: a list of EQUAL-length arrays
                    # would otherwise coerce to one 2-D block, which the
                    # Arrow serializer rejects for an array<long> column
                    "sids": pd.Series(arrs, dtype=object),
                    "n": np.asarray(ns, dtype=np.int64),
                }
            )

    return _spread(docs.select("doc_id", "text")).mapInPandas(
        run, schema="doc_id long, sids array<long>, n long"
    )


def token_bigram_arrays(docs: DataFrame) -> DataFrame:
    """Bigram special case of :func:`token_ngram_arrays`."""
    return token_ngram_arrays(docs, 2)


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sid) distinct — numpy twin of features.shingle_ids (same
    rows, ~10× the extraction throughput of explode+substr+ascii)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_sid = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                u = _doc_sids(text, distinct=True)
                if not len(u):
                    continue
                out_id.append(np.full(len(u), doc_id, dtype=np.int64))
                out_sid.append(u)
            if out_id:
                yield pd.DataFrame(
                    {"doc_id": np.concatenate(out_id), "sid": np.concatenate(out_sid)}
                )

    return _spread(docs.select("doc_id", "text")).mapInPandas(run, schema="doc_id long, sid long")
