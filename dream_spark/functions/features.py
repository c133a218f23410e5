"""Shared text-feature extraction: tokens, character shingles, and
integer feature encoding.

Feature ids are computed by Horner-packing character codes with a running
modulus (every intermediate < 2^31 · 256 < 2^39, exact in int64 on both
engines) — a *vocabulary-free* dictionary encoding: no global ROW_NUMBER
window over the distinct-feature set, which would serialize on one partition
at 100 TB.  ``ascii(substr(x, j, 1))`` returns 0 past the end of the string
on both Spark and DuckDB, so short tokens pack consistently.

The SQL fragments here are dialect-portable (ascii/substr/CAST only) and are
used verbatim by the Spark DataFrame side (via F.expr) AND rendered into the
DuckDB oracle strings, so both engines replay the identical feature mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dream_spark.functions.hashing import MERSENNE_P

TOKEN_SPLIT_RE = "[^a-z0-9]+"
SHINGLE_LEN = 3


def pack_sql(expr: str, nchars: int) -> str:
    """Horner-pack the first ``nchars`` characters of ``expr`` into a BIGINT
    < 2^31 (mod P at each step).  Portable across Spark SQL and DuckDB."""
    acc = f"CAST(ascii(substr({expr}, 1, 1)) AS BIGINT)"
    for j in range(2, nchars + 1):
        acc = f"(({acc}) * 256 + ascii(substr({expr}, {j}, 1))) % {MERSENNE_P}"
    return f"({acc})"


TOKEN_PACK_CHARS = 8  # longest vocab words distinguish within 8 chars


def token_id_sql(expr: str) -> str:
    return pack_sql(expr, TOKEN_PACK_CHARS)


def shingle_id_sql(expr: str) -> str:
    # 3 chars pack into 24 bits — collision-free.
    return pack_sql(expr, SHINGLE_LEN)


# ---- Spark-side extraction ------------------------------------------------
def tokens(docs: DataFrame, with_pos: bool = False) -> DataFrame:
    """(doc_id, tok[, pos]) — lowercased alnum runs, bag semantics.
    1-based positions count empty split artifacts so they line up with the
    DuckDB ``generate_subscripts`` numbering."""
    arr = F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE)
    if with_pos:
        out = docs.select("doc_id", F.posexplode(arr).alias("pos0", "tok")).where(
            F.col("tok") != ""
        )
        return out.select("doc_id", "tok", (F.col("pos0") + 1).alias("pos"))
    return docs.select("doc_id", F.explode(arr).alias("tok")).where(F.col("tok") != "")


def shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) — character 3-grams of lower(text), bag semantics.
    Documents shorter than the shingle length yield no rows (same guard in
    the oracle SQL)."""
    return (
        docs.where(F.length("text") >= SHINGLE_LEN)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(text) - {SHINGLE_LEN - 1}),"
                    f" i -> substring(lower(text), i, {SHINGLE_LEN}))"
                )
            ).alias("sh"),
        )
    )


def shingle_ids(docs: DataFrame) -> DataFrame:
    """(doc_id, sid) distinct — the set of encoded shingles per document."""
    return shingles(docs).select("doc_id", F.expr(shingle_id_sql("sh")).alias("sid")).distinct()


def shingle_ids_bag(docs: DataFrame) -> DataFrame:
    """(doc_id, sid) with duplicates — for consumers whose aggregation is
    duplicate-insensitive (MIN/MAX): skips the distinct's extra shuffle."""
    return shingles(docs).select("doc_id", F.expr(shingle_id_sql("sh")).alias("sid"))


# ---- DuckDB-side extraction fragments ------------------------------------
def duck_tokens_cte(table: str = "documents", with_pos: bool = False) -> str:
    lst = f"string_split_regex(lower(text), '{TOKEN_SPLIT_RE}')"
    if with_pos:
        return (
            f"SELECT doc_id, tok, pos FROM (SELECT doc_id, unnest({lst}) AS tok,"
            f" generate_subscripts({lst}, 1) AS pos FROM {table}) WHERE tok <> ''"
        )
    return (
        f"SELECT doc_id, tok FROM (SELECT doc_id, unnest({lst}) AS tok FROM {table})"
        f" WHERE tok <> ''"
    )


def duck_shingles_cte(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, unnest([substr(lower(text), CAST(i AS INT), {SHINGLE_LEN})"
        f" FOR i IN range(1, length(text) - {SHINGLE_LEN - 2})]) AS sh"
        f" FROM {table} WHERE length(text) >= {SHINGLE_LEN}"
    )


def duck_shingle_ids_cte(table: str = "documents") -> str:
    return (
        f"SELECT DISTINCT doc_id, {shingle_id_sql('sh')} AS sid"
        f" FROM ({duck_shingles_cte(table)})"
    )


#: word-n-gram packing bases (= textkernels.BIGRAM_BASE / NGRAM_FOLD_MULT).
#: The intermediate fold multiplier must not be ≡ 1 (mod P) — 2^31 is,
#: which would collapse the fold into an order-insensitive sum — so the
#: fold uses 2^16 and only the final (modulus-free) step uses 2^31.
BIGRAM_BASE = 2_147_483_648
NGRAM_FOLD_MULT = 65_536


def token_ngram_sid_expr(n: int) -> str:
    """The packed n-gram id over columns tid, tid_1..tid_{n-1} (LEADs):
    Horner fold acc = (acc·2^16 + tid_j) mod P, final acc·2^31 + tid_{n-1}
    without the modulus — identical to textkernels._ngram_ids."""
    acc = "tid"
    for j in range(1, n - 1):
        acc = f"(({acc}) * {NGRAM_FOLD_MULT} + tid_{j}) % {MERSENNE_P}"
    return f"({acc}) * {BIGRAM_BASE} + tid_{n - 1}"


def duck_token_ngram_ids_cte(table: str = "documents", n: int = 2) -> str:
    """DuckDB twin of textkernels.token_ngram_sets: consecutive-token
    ``n``-gram ids, distinct per document."""
    leads = ", ".join(
        f"LEAD(tid, {j}) OVER (PARTITION BY doc_id ORDER BY pos) AS tid_{j}"
        for j in range(1, n)
    )
    return f"""
SELECT DISTINCT doc_id, {token_ngram_sid_expr(n)} AS sid
FROM (SELECT doc_id, tid, pos, {leads}
      FROM (SELECT doc_id, {token_id_sql('tok')} AS tid, pos
            FROM ({duck_tokens_cte(table, with_pos=True)})))
WHERE tid_{n - 1} IS NOT NULL""".strip()


def duck_token_bigram_ids_cte(table: str = "documents") -> str:
    """Bigram special case of :func:`duck_token_ngram_ids_cte`."""
    return duck_token_ngram_ids_cte(table, 2)
