"""Deterministic cross-engine hashing.

Spark's ``hash()``/``xxhash64`` and DuckDB's ``hash()`` are different
functions, so any operator whose output must hash-match the oracle cannot use
either.  Instead every fuzzy operator here follows the engine's own
dictionary-encoding idea (SURVEY.md §4.2): map features (tokens, shingles) to
dense integer ids via a deterministic vocabulary (ROW_NUMBER over the sorted
distinct features), then apply universal hashing

    h_i(x) = (A_i * x + B_i) mod P          P = 2^31 - 1

with constants small enough that every intermediate fits in int64 on both
engines (A_i, B_i, x < 2^31 → products < 2^62).  The same constants are
rendered into the DuckDB oracle SQL, so both engines replay the identical
computation — the fixed-seed requirement from FIXTURES.md §F4.
"""

from __future__ import annotations

MERSENNE_P = 2_147_483_647  # 2^31 - 1
_MULT = 1_103_515_245  # classic LCG multiplier
_INC = 12_345
_GOLDEN = 2_654_435_761  # Knuth multiplicative constant


def hash_params(i: int) -> tuple[int, int]:
    """(A_i, B_i) for the i-th universal hash function; A_i never 0."""
    a = (_MULT * (i + 1) + _INC) % MERSENNE_P
    if a == 0:
        a = 1
    b = (_GOLDEN * (i + 1)) % MERSENNE_P
    return a, b


def hash_sql(expr: str, i: int) -> str:
    """SQL text for h_i(expr) — valid on Spark SQL and DuckDB (explicit
    BIGINT casts: DuckDB overflows INT32 literal products otherwise)."""
    a, b = hash_params(i)
    return f"((CAST({a} AS BIGINT) * ({expr}) + CAST({b} AS BIGINT)) % {MERSENNE_P})"


def hash_case_sql(expr: str, i_expr: str, k: int) -> str:
    """SQL for h_{i_expr}(expr) where the function index is itself a column
    (0 <= i_expr < k): rendered as a CASE over the k fixed parameter pairs."""
    whens = " ".join(f"WHEN {i} THEN {hash_sql(expr, i)}" for i in range(k))
    return f"(CASE CAST({i_expr} AS INT) {whens} END)"


# Band-combining constants for LSH banding: commutative polynomial over the
# in-band signature values, weights 31^(slot) — fits int64 for 4-slot bands
# of 31-bit values (2^31 * 31^3 ≈ 2^46).
BAND_WEIGHTS = [1, 31, 961, 29791]


def band_weight_sql(slot_expr: str) -> str:
    whens = " ".join(f"WHEN {s} THEN {w}" for s, w in enumerate(BAND_WEIGHTS))
    return f"(CASE CAST({slot_expr} AS INT) {whens} END)"
