"""Operator library.

Two surfaces per operator family:
- DataFrame-level functions (the library API — bring your own DataFrame):
  ``jaccard_pairs``, ``minhash_pairs``, ``simhash_pairs``,
  ``embedding_pairs``, ``duplicate_clusters``, ``connected_components``,
  ``quantize``, ``simhash_of``.
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

__all__ = [
    "connected_components",
    "duplicate_clusters",
    "embedding_pairs",
    "jaccard_pairs",
    "minhash_pairs",
    "quantize",
    "simhash_of",
    "simhash_pairs",
]
