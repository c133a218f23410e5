"""Operator library.

Two surfaces per operator family:
- DataFrame-level functions (the library API — bring your own DataFrame):
  ``jaccard_pairs``, ``minhash_pairs``, ``simhash_pairs``,
  ``embedding_pairs``, ``duplicate_clusters``, ``connected_components``,
  ``quantize``, ``simhash_of``, ``knn_topk``, ``asof_join``,
  ``range_join``.
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
from dream_spark.operators.similarity import knn_ivf_topk, knn_lsh_topk, knn_topk
from dream_spark.operators.temporal import asof_join, range_join
from dream_spark.operators.text import features_of, fingerprint_of, langid_of, topterms_of

__all__ = [
    "asof_join",
    "connected_components",
    "duplicate_clusters",
    "embedding_pairs",
    "features_of",
    "fingerprint_of",
    "jaccard_pairs",
    "knn_ivf_topk",
    "knn_lsh_topk",
    "knn_topk",
    "langid_of",
    "minhash_pairs",
    "quantize",
    "range_join",
    "simhash_of",
    "simhash_pairs",
    "topterms_of",
]
