"""Operator library.

Two surfaces per operator family:
- DataFrame-level functions (the library API — bring your own DataFrame):
  ``jaccard_pairs``, ``minhash_pairs``, ``simhash_pairs``,
  ``embedding_pairs``, ``duplicate_clusters``, ``connected_components``,
  ``quantize``, ``simhash_of``, ``knn_topk``, ``asof_join``,
  ``range_join``, ``funnel``, ``split_assign``, ``stratified_sample``,
  ``tfidf_topterms``, ``bigram_counts``, ``curate``,
  ``contamination_check``, ``repetition_stats``, ``kmv_distinct``,
  ``grouped_quantiles``, ``pagerank``, ``pseudo_embed``.
- ``(spark, sf_dir)`` wrappers in each module's ``QUERIES`` dict (the
  driver contract, each with a DuckDB oracle in ``ORACLES``).
"""

from dream_spark.operators.dedup import (
    connected_components,
    duplicate_clusters,
    embedding_pairs,
    jaccard_pairs,
    minhash_pairs,
    quantize,
    simhash_of,
    simhash_pairs,
)
from dream_spark.operators.graph import pagerank
from dream_spark.operators.multimodal import payload_dedup, pseudo_embed
from dream_spark.operators.pipeline import (
    bigram_counts,
    build_vocab,
    contamination_check,
    curate,
    oov_stats,
    repetition_stats,
    split_assign,
    stratified_sample,
    tfidf_topterms,
)
from dream_spark.operators.similarity import knn_ivf_topk, knn_lsh_topk, knn_topk
from dream_spark.operators.sketch import grouped_quantiles, kmv_distinct
from dream_spark.operators.temporal import asof_join, funnel, range_join
from dream_spark.operators.text import features_of, fingerprint_of, langid_of, topterms_of

__all__ = [
    "asof_join",
    "bigram_counts",
    "build_vocab",
    "connected_components",
    "contamination_check",
    "curate",
    "duplicate_clusters",
    "embedding_pairs",
    "features_of",
    "fingerprint_of",
    "funnel",
    "grouped_quantiles",
    "jaccard_pairs",
    "kmv_distinct",
    "knn_ivf_topk",
    "knn_lsh_topk",
    "knn_topk",
    "langid_of",
    "minhash_pairs",
    "oov_stats",
    "pagerank",
    "payload_dedup",
    "pseudo_embed",
    "quantize",
    "range_join",
    "repetition_stats",
    "simhash_of",
    "simhash_pairs",
    "split_assign",
    "stratified_sample",
    "tfidf_topterms",
    "topterms_of",
]
