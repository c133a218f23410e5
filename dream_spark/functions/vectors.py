"""Vector math: Arrow-vectorized integer kernels on the Spark side, flat
scalar SQL on the DuckDB oracle side — identical int64 arithmetic on both.

Two Spark-side kernels, chosen per call site by measurement (not dogma):

- Once-per-corpus builds (self-norms, LSH bucket bits): ``dot_udf`` /
  ``buckets_udf`` — one numpy int64 matmul per Arrow batch.  The batch
  matmul amortizes the Arrow transfer over the whole corpus pass and beats
  16 interpreted plane-dot expressions per row by a wide margin.
- Per-pair scoring (rerank joins, brute-force, centroid probes):
  ``dot_col`` — JVM ``aggregate(zip_with(...))``.  Measured equal to the
  UDF warm and faster cold (no Python-worker fork, no per-pair round-trip
  of two 64-element arrays — transfer, not multiplication, is the UDF
  path's cost); keeps pair stages 100% JVM-side, which is what a
  1000-executor cluster wants in its widest join.

Unrolling the dot into a flat ``qe[1]*w1 + ... + qe[64]*w64`` expression is
the one form that is NEVER used on Spark: a stage carrying a few of them
overflows the 64 KB JVM method limit, paying seconds of codegen and falling
back to interpreted evaluation.  (The flat form IS used on the DuckDB
oracle side, where it vectorizes fine.)  All kernels share exact int64
arithmetic — no floats until the final cosine division, which both engines
compute with the same double formula.

Hyperplane weights for LSH are *literals* computed once in Python from the
same universal hash family (functions/hashing.py), instead of re-hashing the
dimension index per element per row on both engines.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

from dream_spark.functions.hashing import MERSENNE_P, hash_params

#: Embedding dimensionality of the testdata `embeddings.embedding` column.
EMB_DIM = 64


def plane_weight(p: int, i: int) -> int:
    """Deterministic hyperplane weight w[p][i] in [-1000, 1000]: the Python
    replay of ``((h_p(i) % 2001) - 1000)`` (all operands positive, so Python
    ``%`` and SQL ``%`` agree)."""
    a, b = hash_params(p)
    return ((a * i + b) % MERSENNE_P) % 2001 - 1000


def _elem(col: str, i: int, duck: bool) -> str:
    # both accessors are 1-based
    return f"{col}[{i}]" if duck else f"element_at({col}, {i})"


def dot_sql(ca: str, cb: str, dim: int = EMB_DIM, duck: bool = False) -> str:
    """SQL for the integer dot product of two BIGINT array columns.
    Quantized values |x| < 2^21, so 64 products of 2^42 sum < 2^48 — exact
    in int64 on both engines."""
    return "(" + " + ".join(
        f"{_elem(ca, i, duck)} * {_elem(cb, i, duck)}" for i in range(1, dim + 1)
    ) + ")"


def l2_sql(ca: str, cb: str, dim: int = EMB_DIM, duck: bool = False) -> str:
    """SQL for the integer squared-L2 distance of two BIGINT array columns.
    Used on 8-bit SQ codes: diffs |d| <= 255, 64 squares of <= 65025 sum
    < 2^23 — exact in int64 on both engines."""
    return "(" + " + ".join(
        f"({_elem(ca, i, duck)} - {_elem(cb, i, duck)})"
        f" * ({_elem(ca, i, duck)} - {_elem(cb, i, duck)})"
        for i in range(1, dim + 1)
    ) + ")"


def l2_col(ca, cb):
    """JVM-side exact int64 squared-L2 distance of two BIGINT array
    columns: ``aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)`` —
    same pair-scoring posture as :func:`dot_col` (whole stage in the JVM,
    zero Python in the per-pair path)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    a = F.col(ca) if isinstance(ca, str) else ca
    b = F.col(cb) if isinstance(cb, str) else cb
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def plane_dot_sql(col: str, p: int, dim: int = EMB_DIM, duck: bool = False) -> str:
    """SQL for <qe, w_p> with literal integer weights."""
    return "(" + " + ".join(
        f"{_elem(col, i, duck)} * ({plane_weight(p, i)})" for i in range(1, dim + 1)
    ) + ")"


def cos_sql(dot: str, na: str, nb: str) -> str:
    """cosine = dot / (|a|·|b|) with the exact float formula both engines
    share: one double division of a double cast of the exact integer dot."""
    return (
        f"CAST({dot} AS DOUBLE)"
        f" / (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)))"
    )


def dot_col(ca, cb):
    """JVM-side exact int64 dot product of two BIGINT array columns:
    ``aggregate(zip_with(a, b, *), 0L, +)``.

    This is the PAIR-SCORING hot path (rerank joins, brute-force scoring):
    measured head-to-head against :func:`dot_udf` at sf0.1 the two are equal
    warm (~1.0s for 3M 64-dim pairs on local[32]), but the higher-order
    function wins cold (no Python-worker fork, no Arrow round-trip of two
    64-element arrays per pair — the transfer, not the multiply, is the UDF
    path's cost) and keeps the whole stage in the JVM, which is the posture
    a 1000-executor cluster wants: zero Python processes in the per-pair
    path.  ``dot_udf`` (one numpy matmul per Arrow batch) remains the right
    kernel for the once-per-corpus passes (self-norms, LSH bucket bits)
    where the batch matmul amortizes the transfer over the whole build."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    a = F.col(ca) if isinstance(ca, str) else ca
    b = F.col(cb) if isinstance(cb, str) else cb
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


# --- Arrow-vectorized Spark-side kernels ----------------------------------
def _mat(col: pd.Series) -> np.ndarray:
    """Stack an Arrow list column into an (n, dim) int64 matrix."""
    return np.vstack(col.to_numpy()).astype(np.int64, copy=False)


@lru_cache(maxsize=None)
def dot_udf():
    """pandas UDF: exact int64 dot product of two BIGINT array columns."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def dot64(qa: pd.Series, qb: pd.Series) -> pd.Series:
        if qa.empty:
            return pd.Series([], dtype="int64")
        return pd.Series((_mat(qa) * _mat(qb)).sum(axis=1))

    return dot64


@lru_cache(maxsize=None)
def plane_matrix(n_planes: int, dim: int) -> np.ndarray:
    """(n_planes, dim) int64 literal hyperplane weights."""
    return np.array(
        [[plane_weight(p, i) for i in range(1, dim + 1)] for p in range(n_planes)],
        dtype=np.int64,
    )


@lru_cache(maxsize=None)
def buckets_udf(n_tables: int = 4, planes_per_table: int = 4, dim: int = EMB_DIM):
    """pandas UDF: qe -> array<int> of per-table LSH bucket ids.  One numpy
    matmul per Arrow batch replaces n_tables·planes·dim interpreted ops per
    row."""
    from pyspark.sql.functions import pandas_udf

    W = plane_matrix(n_tables * planes_per_table, dim)  # (P, dim)
    pows = np.array([1 << pp for pp in range(planes_per_table)], dtype=np.int64)

    @pandas_udf("array<int>")
    def buckets(qe: pd.Series) -> pd.Series:
        if qe.empty:
            return pd.Series([], dtype="object")
        bits = (_mat(qe) @ W.T >= 0).astype(np.int64)  # (n, P)
        bkts = bits.reshape(len(qe), n_tables, planes_per_table) @ pows  # (n, T)
        return pd.Series(list(bkts.astype(np.int32)))

    return buckets
