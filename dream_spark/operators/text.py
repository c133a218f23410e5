"""Text-analysis operators over the ``documents`` table: token statistics,
quality scoring, language-ID heuristic, and positional document
fingerprinting.

All scalar math happens on integer counts (exact) with one final cast to
DOUBLE per ratio, so Spark and the DuckDB oracle agree bitwise (see
operators/relational.py for the determinism contract).  Everything is
built-in-function Spark SQL — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.functions.features import (
    TOKEN_SPLIT_RE,
    duck_tokens_cte,
    token_id_sql,
    tokens,
)
from dream_spark.functions.hashing import MERSENNE_P
from dream_spark.functions.textkernels import spread_small
from dream_spark.sources.tables import load_table

# "BPE-ish" tokenizer regex: alpha runs, digit runs, single punctuation.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "en", "los"],
    "fr": ["le", "la", "de", "et", "les"],
    "de": ["der", "die", "und", "das", "von"],
}
_ALL_STOP = sorted({w for ws in STOPWORDS.values() for w in ws})

# Positional weights for the rolling fingerprint: 31^(pos mod 8).
_POS_W = [31**k for k in range(8)]


def features_of(docs: DataFrame) -> DataFrame:
    """Per-document token counting + quality scoring for ANY ``(doc_id,
    text)`` DataFrame — the library surface; ``text_features`` wraps it.

    Columns: n_chars, n_ws_tokens (whitespace-ish split), n_bpe_tokens
    (regex tokenizer), n_distinct_tokens, alpha_ratio, digit_ratio,
    stop_ratio, quality_score.  Entirely map-side: the token counts are
    array higher-order functions over the SAME split the explode-based
    form tokenized with, so one scan and zero shuffles replace the old
    scan + explode + per-doc aggregation + self-join (guide §2.4 — the
    per-doc "aggregate" never needed a shuffle because every token of a
    document is already in its row).  The coalesce(…, 0) mirrors the old
    left-join + zero-fill for NULL text; token-less text yields an empty
    array either way.
    """
    stops = ", ".join(f"'{w}'" for w in _ALL_STOP)
    arr = f"filter(split(lower(text), '{TOKEN_SPLIT_RE}'), x -> x != '')"
    j = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.expr(f"size(regexp_extract_all(lower(text), '{BPE_RE}', 0))").cast("bigint").alias("n_bpe_tokens"),
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).alias("n_digit"),
        F.coalesce(F.expr(f"size({arr})"), F.lit(0)).cast("bigint").alias("n_ws_tokens"),
        F.coalesce(F.expr(f"size(array_distinct({arr}))"), F.lit(0))
        .cast("bigint")
        .alias("n_distinct_tokens"),
        F.coalesce(F.expr(f"size(filter({arr}, x -> x in ({stops})))"), F.lit(0))
        .cast("bigint")
        .alias("n_stop"),
    )
    # zero-guard: Spark 4's default ANSI mode makes the bare division THROW
    # DIVIDE_BY_ZERO on an empty document, killing the whole job; DuckDB's
    # double division yields NULL — so return NULL explicitly on both
    alpha_ratio = F.when(
        F.col("n_chars") > 0, F.col("n_alpha").cast("double") / F.col("n_chars")
    )
    digit_ratio = F.when(
        F.col("n_chars") > 0, F.col("n_digit").cast("double") / F.col("n_chars")
    )
    stop_ratio = F.when(F.col("n_ws_tokens") > 0, F.col("n_stop").cast("double") / F.col("n_ws_tokens")).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * F.least(F.col("n_ws_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
    )
    return j.select(
        "doc_id",
        "n_chars",
        "n_ws_tokens",
        "n_bpe_tokens",
        "n_distinct_tokens",
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality_score"),
    )


def text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``features_of`` over the documents table."""
    return features_of(load_table(spark, sf_dir, "documents"))


def _stop_list_sql(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


TEXT_FEATURES_SQL = f"""
WITH toks AS ({duck_tokens_cte()}),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_ws_tokens, COUNT(DISTINCT tok) AS n_distinct_tokens,
         SUM(CASE WHEN tok IN ({", ".join(repr(w) for w in _ALL_STOP)}) THEN 1 ELSE 0 END) AS n_stop
  FROM toks GROUP BY doc_id
),
base AS (
  SELECT doc_id, length(text) AS n_chars,
         len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpe_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
  FROM documents
)
SELECT b.doc_id, b.n_chars,
       COALESCE(p.n_ws_tokens, 0) AS n_ws_tokens,
       b.n_bpe_tokens,
       COALESCE(p.n_distinct_tokens, 0) AS n_distinct_tokens,
       CAST(b.n_alpha AS DOUBLE) / b.n_chars AS alpha_ratio,
       CAST(b.n_digit AS DOUBLE) / b.n_chars AS digit_ratio,
       CASE WHEN COALESCE(p.n_ws_tokens, 0) > 0
            THEN CAST(p.n_stop AS DOUBLE) / p.n_ws_tokens ELSE 0.0 END AS stop_ratio,
       0.4 * (CASE WHEN COALESCE(p.n_ws_tokens, 0) > 0
                   THEN CAST(p.n_stop AS DOUBLE) / p.n_ws_tokens ELSE 0.0 END)
       + 0.3 * (CAST(b.n_alpha AS DOUBLE) / b.n_chars)
       + 0.3 * (least(CAST(COALESCE(p.n_ws_tokens, 0) AS DOUBLE) / 100.0, 1.0)) AS quality_score
FROM base b LEFT JOIN per_doc p USING (doc_id)
""".strip()


def langid_of(docs: DataFrame) -> DataFrame:
    """N-gram/stopword language-ID heuristic: count per-language stopword
    hits, argmax with a fixed preference order (en > es > fr > de, else
    'und').  The synthetic corpus is English-ish word salad, so this mostly
    demonstrates the deterministic plumbing; with real multilingual text the
    same plan discriminates."""
    toks = tokens(docs)
    agg = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("tok").isin(STOPWORDS[lang]), 1).otherwise(0)).alias(f"n_{lang}")
            for lang in STOPWORDS
        ]
    )
    n = {lang: F.col(f"n_{lang}") for lang in STOPWORDS}
    pred = (
        F.when((n["en"] >= n["es"]) & (n["en"] >= n["fr"]) & (n["en"] >= n["de"]) & (n["en"] > 0), "en")
        .when((n["es"] >= n["fr"]) & (n["es"] >= n["de"]) & (n["es"] > 0), "es")
        .when((n["fr"] >= n["de"]) & (n["fr"] > 0), "fr")
        .when(n["de"] > 0, "de")
        .otherwise("und")
    )
    out = docs.select("doc_id").join(agg, on="doc_id", how="left").na.fill(0)
    return out.select("doc_id", pred.alias("lang_pred"), "n_en", "n_es", "n_fr", "n_de")


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``langid_of`` over the documents table."""
    return langid_of(load_table(spark, sf_dir, "documents"))


TEXT_LANGID_SQL = f"""
WITH toks AS ({duck_tokens_cte()}),
agg AS (
  SELECT doc_id,
         {", ".join(f"CAST(SUM(CASE WHEN tok IN ({_stop_list_sql(lang)}) THEN 1 ELSE 0 END) AS BIGINT) AS n_{lang}" for lang in STOPWORDS)}
  FROM toks GROUP BY doc_id
)
, filled AS (
  SELECT d.doc_id, COALESCE(a.n_en, 0) AS n_en, COALESCE(a.n_es, 0) AS n_es,
         COALESCE(a.n_fr, 0) AS n_fr, COALESCE(a.n_de, 0) AS n_de
  FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)
)
SELECT doc_id,
       CASE WHEN n_en >= n_es AND n_en >= n_fr AND n_en >= n_de AND n_en > 0 THEN 'en'
            WHEN n_es >= n_fr AND n_es >= n_de AND n_es > 0 THEN 'es'
            WHEN n_fr >= n_de AND n_fr > 0 THEN 'fr'
            WHEN n_de > 0 THEN 'de'
            ELSE 'und' END AS lang_pred,
       n_en, n_es, n_fr, n_de
FROM filled
""".strip()


def _pos_weight_sql(pos_expr: str) -> str:
    whens = " ".join(f"WHEN {k} THEN {w}" for k, w in enumerate(_POS_W))
    return f"(CASE CAST(({pos_expr}) % 8 AS INT) {whens} END)"


def fingerprint_of(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: a rolling polynomial hash over
    the token sequence — SUM((token_id mod 2^16) * 31^(pos mod 8)) mod P.
    Commutative integer summation makes it partition-order independent while
    still depending on token *positions* (unlike a bag hash)."""
    tk = tokens(docs, with_pos=True)
    # per-term mod-P reduction BEFORE the sum: raw terms reach 65535·31^7
    # (~1.8e15), so ~5k max-weight tokens overflow int64 — Spark's ANSI
    # SUM throws ARITHMETIC_OVERFLOW on a big document while DuckDB sums
    # exactly in HUGEINT.  Reduced terms are < P, congruent mod P, and
    # int64-safe to 2^32 tokens per document; the final % P is unchanged.
    term = F.expr(
        f"(({token_id_sql('tok')} % 65536) * {_pos_weight_sql('pos')}) % {MERSENNE_P}"
    )
    fp = tk.groupBy("doc_id").agg((F.sum(term) % MERSENNE_P).alias("fingerprint"))
    return docs.select("doc_id").join(fp, on="doc_id", how="left").na.fill({"fingerprint": 0})


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``fingerprint_of`` over documents."""
    return fingerprint_of(load_table(spark, sf_dir, "documents"))


TEXT_FINGERPRINT_SQL = f"""
WITH toks AS ({duck_tokens_cte(with_pos=True)}),
fp AS (
  SELECT doc_id,
         CAST(SUM(({token_id_sql('tok')} % 65536) * {_pos_weight_sql('pos')}) % {MERSENNE_P} AS BIGINT) AS fingerprint
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(fp.fingerprint, 0) AS BIGINT) AS fingerprint
FROM (SELECT doc_id FROM documents) d LEFT JOIN fp USING (doc_id)
""".strip()


TOP_TERMS_K = 25


def topterms_of(docs: DataFrame, k: int = TOP_TERMS_K) -> DataFrame:
    """Corpus vocabulary profile for ANY ``(doc_id, text)`` DataFrame:
    top-k terms by document frequency (deterministic tiebreak on the term
    itself) with total occurrence counts — the df/tf sketch a
    corpus-analysis pipeline starts from."""
    # spread the token explode across the cluster before the ~1000× row
    # expansion — gated: only when the input arrives under-split (small
    # parquet = one split); at real scale the scan already spans the
    # cluster and repartitioning would shuffle the whole raw corpus
    docs = spread_small(docs)
    toks = tokens(docs)
    stats = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf"),
    )
    return stats.orderBy(F.col("df").desc(), F.col("tok")).limit(k)


def text_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``topterms_of`` over the documents table."""
    return topterms_of(load_table(spark, sf_dir, "documents"))


TEXT_TOPTERMS_SQL = f"""
WITH toks AS ({duck_tokens_cte()})
SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
FROM toks GROUP BY tok
ORDER BY df DESC, tok LIMIT {TOP_TERMS_K}
""".strip()


# --------------------------------------------------------------------------
# PII redaction (training-corpus scrubbing)
# --------------------------------------------------------------------------
#: (placeholder, pattern) scrub rules.  Patterns use the regex subset that
#: Java (Spark) and RE2 (DuckDB) evaluate identically: character classes,
#: +, {m,n} — no backrefs or lookarounds.  ORDER matters: outermost spans
#: first (a URL can contain an email in its userinfo; scrubbing the URL
#: first makes the nested email part of ONE redacted span, not two).
REDACT_RULES = [
    # explicit whitespace class: Java's \s includes \x0B, RE2's does not —
    # [^\s] would redact different spans around a vertical tab on the two
    # engines; the spelled-out class is identical in both dialects
    ("<URL>", r"https?://[^ \t\n\x0B\f\r]+"),
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<PHONE>", r"\+?[0-9][0-9()\- ]{7,}[0-9]"),
]


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII-shaped spans from ANY ``(doc_id, text)`` DataFrame —
    the compliance pass a training pipeline runs before tokenization:
    emails, URLs, and phone-number-shaped digit runs are replaced with
    typed placeholders.  Map-only (regexp_replace chain, whole-stage
    codegen), no shuffle; ``n_redactions`` counts replaced spans so the
    scrub rate is monitorable per corpus slice."""
    # Column-API regex calls throughout: embedding the patterns in an SQL
    # string literal would eat the backslashes a second time.  Each rule
    # COUNTS against the text as cleaned by the PRECEDING rules (the same
    # string it replaces on), so n_redactions equals the number of
    # placeholders emitted — counting every rule against the original text
    # double-counts nested spans (an email inside a URL).
    clean = F.col(text_col)
    n_red = F.lit(0).cast("bigint")
    for placeholder, pat in REDACT_RULES:
        n_red = n_red + F.size(F.regexp_extract_all(clean, F.lit(pat), F.lit(0))).cast("bigint")
        clean = F.regexp_replace(clean, pat, placeholder)
    return docs.select("doc_id", clean.alias("text_clean"), n_red.alias("n_redactions"))


def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``redact`` over the documents table."""
    return redact(load_table(spark, sf_dir, "documents"))


def _redact_sql() -> str:
    clean = "text"
    counts = []
    for placeholder, pat in REDACT_RULES:
        # count against the text cleaned by preceding rules, like the
        # Spark side — placeholder-count semantics, no double counting
        counts.append(f"len(regexp_extract_all({clean}, '{pat}'))")
        clean = f"regexp_replace({clean}, '{pat}', '{placeholder}', 'g')"
    return f"""
SELECT doc_id, {clean} AS text_clean,
       CAST({" + ".join(counts)} AS BIGINT) AS n_redactions
FROM documents
""".strip()


TEXT_REDACT_SQL = _redact_sql()


# --------------------------------------------------------------------------
# hashed bag-of-words featurization + raw-text similarity search
# --------------------------------------------------------------------------
#: hashing-trick vector width (the classic sparse-features trick: token →
#: h(token_id) mod dims, counts summed per bucket — vocabulary-free, fixed
#: width, mergeable)
HBOW_DIMS = 32
#: hash-function index reserved for the feature hash.  64 is genuinely
#: free: dedup's LSH band combiner consumes MINHASH_K + b·BAND_ROWS + r =
#: indices 16..31 (the previous value, 16, collided with band 0/row 0 —
#: correlated hash draws if the two constructions ever co-occur)
_HBOW_FN = 64
#: document similarity search: query set + k
TEXT_KNN_QUERIES = 10
TEXT_KNN_K = 5


def hashed_bow(docs: DataFrame, dims: int = HBOW_DIMS) -> DataFrame:
    """(doc_id, qe, nrm) — hashing-trick bag-of-words vectors for ANY
    ``(doc_id, text)`` DataFrame: dimension i holds the count of tokens
    whose hashed id lands in bucket i.  Exact integer counts (no float
    tf-idf), so dot products and norms are int64-exact cross-engine.
    Documents with zero tokens yield no row (both engines agree).

    Scale shape: one partially-aggregated shuffle of (doc, bucket) counts,
    then a map-side array assembly — never a vocabulary-sized window."""
    from dream_spark.functions.hashing import hash_sql

    tid = token_id_sql("tok")
    # ONE rendering of the load-bearing hash for both engines: hash_sql is
    # exactly what the DuckDB oracle embeds, so the two sides cannot drift
    counts = (
        tokens(docs)
        .select("doc_id", F.expr(f"CAST({hash_sql(tid, _HBOW_FN)} % {dims} AS INT)").alias("dim"))
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("dim", "cnt"))).alias("m")
    )
    vec = m.select(
        "doc_id",
        F.expr(f"transform(sequence(0, {dims - 1}), i -> coalesce(element_at(m, i), 0L))").alias("qe"),
    )
    from dream_spark.functions.vectors import dot_udf

    return vec.select("doc_id", "qe", dot_udf()("qe", "qe").alias("nrm"))


#: (session id, sf_dir) -> persisted hashed-BoW corpus frame
_HBOW_MEMO: dict = {}


def shared_hbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session's persisted hashed-BoW corpus — the lexical twin of
    ``dedup.shared_quantized``: text_knn and hybrid_search both score
    against the SAME (doc_id, qe, nrm) table, so re-running the
    tokenize+hash+aggregate kernel per call is pure waste (the r6 bench
    measured hybrid_search paying the build twice, VERDICT r6 task 2).  A
    deployment materializes this as a parquet artifact per corpus version;
    ``bench.py`` warms it in setup for the same train/serve economics as
    the vector indexes."""
    from dream_spark.operators.dedup import _shared_artifact

    return _shared_artifact(
        _HBOW_MEMO,
        (id(spark), sf_dir),
        lambda: hashed_bow(load_table(spark, sf_dir, "documents")),
    )


def text_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search over RAW TEXT end-to-end: hashed-BoW vectors →
    exact cosine top-k (query docs = doc_id < TEXT_KNN_QUERIES).  The
    text→vector→ANN chain a retrieval pipeline runs, with every stage
    oracle-replayable."""
    from pyspark.sql import Window

    from dream_spark.functions.vectors import cos_sql, dot_col

    bow = shared_hbow(spark, sf_dir)
    qa = bow.where(F.col("doc_id") < TEXT_KNN_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("qe").alias("qa"), F.col("nrm").alias("na")
    )
    qb = bow.select(
        F.col("doc_id").alias("neighbor_id"), F.col("qe").alias("qb"), F.col("nrm").alias("nb")
    )
    pairs = F.broadcast(qa).crossJoin(qb).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.withColumn("dot", dot_col("qa", "qb")).select(
        "query_id", "neighbor_id", F.expr(cos_sql("dot", "na", "nb")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= TEXT_KNN_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _text_knn_sql() -> str:
    from dream_spark.functions.hashing import hash_sql
    from dream_spark.functions.vectors import cos_sql, dot_sql

    tid = token_id_sql("tok")
    dot = dot_sql("qa.qe", "qb.qe", dim=HBOW_DIMS, duck=True)
    return f"""
WITH toks AS ({duck_tokens_cte()}),
counts AS (
  SELECT doc_id, CAST({hash_sql(tid, _HBOW_FN)} % {HBOW_DIMS} AS INT) AS dim,
         COUNT(*) AS cnt
  FROM toks GROUP BY doc_id, dim
),
grid AS (
  SELECT d.doc_id, r.r AS dim
  FROM (SELECT DISTINCT doc_id FROM counts) d
  CROSS JOIN (SELECT unnest(range(0, {HBOW_DIMS})) AS r) r
),
vec AS (
  SELECT g.doc_id, list(CAST(COALESCE(c.cnt, 0) AS BIGINT) ORDER BY g.dim) AS qe
  FROM grid g LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.dim = g.dim
  GROUP BY g.doc_id
),
qn AS (SELECT doc_id AS vec_id, qe, {dot_sql("qe", "qe", dim=HBOW_DIMS, duck=True)} AS nrm FROM vec),
pairs AS (
  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id,
         {cos_sql(dot, "qa.nrm", "qb.nrm")} AS cos
  FROM qn qa JOIN qn qb ON qa.vec_id < {TEXT_KNN_QUERIES} AND qa.vec_id <> qb.vec_id
)
SELECT query_id, neighbor_id, cos, rank FROM (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
) WHERE rank <= {TEXT_KNN_K}
""".strip()


TEXT_KNN_SQL = _text_knn_sql()


# --------------------------------------------------------------------------
# BM25 retrieval (Robertson/Spärck Jones), integer-exact quantized form
# --------------------------------------------------------------------------
#: results per query
BM25_K = 5
#: idf quantization scale (the BM25 idf (N−df+½)/(df+½) replayed as the
#: exact rational (2(N−df)+1)/(2df+1), scaled)
BM25_IDF_Q = 4096
#: idf saturation cap.  The int64 budget is allocated across the WHOLE
#: per-pair sum, not just one product: documents are bounded at 2^17
#: tokens (the module contract), so a query/candidate pair shares at most
#: 2^17 terms, and the summed score must stay under 2^62 — i.e. each
#: idf·sat product gets ≤ 2^45.  With sat < 2.2·SAT_Q ≈ 2^17.2, the idf
#: cap is 2^27 (binds for terms rarer than ~N/2^15).  A cap of 2^30 with
#: SAT_Q = 2^20 (the first-cut values) left the SUM free to overflow on
#: near-duplicate long documents of rare terms — Spark would wrap
#: silently while the DuckDB oracle raises (r7 review finding).
BM25_IDF_CAP = 1 << 27
#: fixed-point scale for the tf-saturation factor (range (0, 2.2))
BM25_SAT_Q = 1 << 16


def _bm25_idf_sql(n: str, df: str) -> str:
    """Quantized BM25 idf: LEAST(Q·(2(N−df)+1) div (2df+1), CAP).  A
    monotone rational surrogate for ln((N−df+½)/(df+½)): never negative
    (unlike raw ln-idf for df > N/2 — common terms here keep a small
    positive weight, flooring to 0 only when the rational drops below
    1/Q, i.e. df within ~1/(2Q) of N).  Document-frequency ORDER is
    preserved exactly; only the rare-term growth curve is steeper than
    ln, a documented property of the quantization (the oracle gate needs
    replayable arithmetic, which float ln is not)."""
    return (
        f"LEAST(CAST({BM25_IDF_Q} AS BIGINT) * (2 * (({n}) - ({df})) + 1)"
        f" {{d}} (2 * ({df}) + 1), {BM25_IDF_CAP})"
    )


def _bm25_sat_sql(tf: str, dl: str, avgdl: str) -> str:
    """Quantized BM25 tf-saturation tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    with k1 = 1.2, b = 0.75: multiplying through by 20·avgdl clears every
    fraction — numerator 44·tf·avgdl, denominator 20·tf·avgdl + 6·avgdl +
    18·dl — then fixed-point scaled by SAT_Q.  int64-exact for documents
    up to ~2^17 tokens: 44·tf·avgdl·SAT_Q < 2^56 there, and the FULL
    per-pair score sum stays under 2^62 (see the BM25_IDF_CAP budget)."""
    return (
        f"(44 * ({tf}) * ({avgdl}) * {BM25_SAT_Q})"
        f" {{d}} (20 * ({tf}) * ({avgdl}) + 6 * ({avgdl}) + 18 * ({dl}))"
    )


def bm25_topk(docs: DataFrame, n_queries: int = TEXT_KNN_QUERIES, k: int = BM25_K) -> DataFrame:
    """BM25 top-``k`` retrieval: the query documents' token sets score
    every OTHER document that shares at least one term (docs sharing no
    term score 0 and are omitted — inverted-index semantics), summing the
    per-term idf·saturation products.  All arithmetic is exact int64, so
    scores AND tie-breaks replay identically on the oracle.

    Scale shape: tf/df/dl are one partially-aggregated shuffle each over
    the token stream; the query-term table (n_queries documents' distinct
    terms) broadcasts, so the scoring join is the classic postings-list
    probe — the corpus-sized tf table is filtered map-side by the
    broadcast hash join, never re-shuffled, and only matching (query,
    candidate) partials flow into the final sum.  At real scale tf/df/dl
    are materialized index artifacts; the plan from there on is
    unchanged."""
    tf, dfreq, dl, scal = _bm25_stats(tokens(spread_small(docs)))
    return _bm25_score(tf, dfreq, dl, scal, _bm25_qterms(tf, n_queries), k)


def _bm25_stats(toks: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tf, dfreq, dl, scal) — the four BM25 corpus statistics, ONE
    definition shared by the inline path and the index builder so the two
    entries (and their shared oracle) cannot drift.  dl/dfreq/scal all
    derive from tf: dl = Σtf per doc is the doc's token count, and the
    scalars aggregate the same sums."""
    return _bm25_stats_from_tf(
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    )


def _bm25_stats_from_tf(
    tf: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The dfreq/dl/scal derivations from an existing (doc_id, tok, tf)
    table — used directly by the index builder over the materialized
    postings parquet."""
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    scal = tf.agg(
        F.expr("sum(tf) div count(distinct doc_id)").alias("avgdl"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return tf, dfreq, dl, scal


def _bm25_qterms(tf: DataFrame, n_queries: int) -> DataFrame:
    """(query_id, qtok) — the query documents' distinct terms."""
    return (
        tf.where(F.col("doc_id") < n_queries)
        .select(F.col("doc_id").alias("query_id"), F.col("tok").alias("qtok"))
        .distinct()
    )


def _bm25_score(
    tf: DataFrame,
    dfreq: DataFrame,
    dl: DataFrame,
    scal: DataFrame,
    qterms: DataFrame,
    k: int,
    dfreq_query_bounded: bool = False,
) -> DataFrame:
    """The shared BM25 scoring join: the (query_id, qtok) table broadcasts
    onto the postings, statistics attach, per-term quantized scores sum,
    window top-k.  One definition for the inline path and the
    persisted-index serve path, so the two entries cannot drift.

    The df attach (r10): only query terms can survive the qterms join, so
    dfreq is semi-filtered to the query's distinct terms first and the
    remainder broadcast UNCONDITIONALLY — it is at most one row per query
    term, the same bounded-by-the-query-set contract as the qterms
    broadcast itself.  Without the filter the join's build side is the
    VOCABULARY (corpus-scale at 100 TB), which sort-merge re-shuffled the
    whole df table against a query-bounded scored stream."""
    idf = _bm25_idf_sql("n_docs", "df").format(d="div")
    sat = _bm25_sat_sql("tf", "dl", "avgdl").format(d="div")
    if dfreq_query_bounded:
        # caller already restricted dfreq to the query terms (the serve
        # path's inline tok IN (...) gate): the semi-join would re-derive
        # what the literal filter guarantees — broadcast directly
        dfreq_q = F.broadcast(dfreq)
    else:
        qt = qterms.select(F.col("qtok").alias("tok")).distinct()
        dfreq_q = F.broadcast(dfreq.join(F.broadcast(qt), "tok", "left_semi"))
    scored = (
        tf.join(F.broadcast(qterms), (tf["tok"] == qterms["qtok"]) & (tf["doc_id"] != qterms["query_id"]))
        .join(dfreq_q, on="tok")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            F.expr(f"({idf}) * ({sat})").alias("term_score"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("term_score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: BM25 top-k over the documents table, query
    docs = doc_id < TEXT_KNN_QUERIES (the text_knn convention)."""
    return bm25_topk(load_table(spark, sf_dir, "documents"))


def _bm25_oracle_sql(qterms_cte: str) -> str:
    """The BM25 oracle body, parameterized ONLY by the qterms CTE — the
    statistics, scoring, and ranking SQL is one definition shared by the
    broad (``text_bm25``/``_served``) and narrow (``text_bm25_lookup``)
    oracles, so the scoring arithmetic cannot drift between them (the
    shared-fragment convention; drift is guarded by the per-entry hash
    contract tests in tests/test_text.py)."""
    idf = _bm25_idf_sql("n_docs", "df").format(d="//")
    sat = _bm25_sat_sql("tf", "dl", "avgdl").format(d="//")
    return f"""
WITH toks AS ({duck_tokens_cte()}),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
scal AS (SELECT CAST(COUNT(*) // COUNT(DISTINCT doc_id) AS BIGINT) AS avgdl,
                COUNT(DISTINCT doc_id) AS n_docs FROM toks),
qterms AS ({qterms_cte}),
scored AS (
  SELECT q.query_id, t.doc_id AS neighbor_id,
         CAST(SUM(({idf}) * ({sat})) AS BIGINT) AS score
  FROM tf t
  JOIN qterms q ON t.tok = q.qtok AND t.doc_id <> q.query_id
  JOIN dfreq f ON f.tok = t.tok
  JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN scal
  GROUP BY q.query_id, t.doc_id
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT query_id, neighbor_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {BM25_K}
""".strip()


TEXT_BM25_SQL = _bm25_oracle_sql(
    "SELECT DISTINCT doc_id AS query_id, tok AS qtok FROM tf"
    f" WHERE doc_id < {TEXT_KNN_QUERIES}"
)


# --------------------------------------------------------------------------
# Persisted lexical (postings) index: the BM25 train/serve split as storage
# --------------------------------------------------------------------------
#: Persisted-postings layout/parameter version: part of the cache digest —
#: a change to anything index-defining (tokenizer regex, quantization
#: constants, layout) must BUMP this, or a stale on-disk index with a
#: COMPLETE marker would keep serving statistics the new code (and the
#: DuckDB oracle) no longer computes.
_POSTINGS_FORMAT_VERSION = 1
#: range partitions for the postings file (tok-sorted within partitions)
POSTINGS_PARTS = 16
#: inline-IN pushdown gate: queries with ≤ this many distinct terms push a
#: literal ``tok IN (...)`` into the postings scan (the bounded-collect
#: contract — the query side is bounded by definition; past the gate the
#: broadcast join alone filters, map-side)
_BM25_INLINE_TERMS = 1024


def save_postings_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Persist the BM25 serving artifacts to parquet — the build-once
    deployment step ``text_bm25`` computes inline: the postings table
    (doc_id, tok, tf) RANGE-PARTITIONED AND SORTED BY ``tok`` so parquet
    min/max row-group statistics turn a query-term predicate into real
    I/O skipping (the Spark-native analog of reading only the query
    terms' postings lists), the per-term lexicon (tok, df), per-document
    lengths (doc_id, dl), and the two corpus scalars."""
    save_postings_index_from(
        spark, spread_small(load_table(spark, sf_dir, "documents")), path
    )


def save_postings_index_from(spark: SparkSession, docs: DataFrame, path: str) -> None:
    """Index ANY (doc_id, text) DataFrame at ``path`` — the layout step
    shared by the sf_dir builder above and synthetic-corpus tests."""
    toks = tokens(docs)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    (
        tf.repartitionByRange(POSTINGS_PARTS, "tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    # derive the statistics tables from the JUST-WRITTEN postings (one
    # tokenize+aggregate pass total — each .write action would otherwise
    # re-execute the full corpus tokenization lineage), using the shared
    # _bm25_stats definitions over the materialized tf
    _, dfreq, dl, scal = _bm25_stats_from_tf(
        spark.read.parquet(f"{path}/postings")
    )
    dfreq.write.mode("overwrite").parquet(f"{path}/lexicon")
    dl.write.mode("overwrite").parquet(f"{path}/doclens")
    scal.write.mode("overwrite").parquet(f"{path}/stats")


def load_postings_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(postings, lexicon, doclens, stats) read back from
    :func:`save_postings_index`'s layout."""
    return (
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/lexicon"),
        spark.read.parquet(f"{path}/doclens"),
        spark.read.parquet(f"{path}/stats"),
    )


def _postings_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache location of the postings index for ``sf_dir`` —
    keyed on the documents parquet mtime + the format version, via the
    shared secure artifact cache (see functions/artifacts.py)."""
    import os

    from dream_spark.functions.artifacts import build_once_path

    root = os.path.abspath(sf_dir)
    doc = os.path.join(root, "documents.parquet")
    # keyed on what DEFINES the stored artifact: the FULL tokenizer
    # definition — a source digest of tokens(), not just its regex, so a
    # behavior change anywhere in tokenization (case folding, filters)
    # invalidates the cache without anyone remembering to bump the manual
    # version (r7 ADVICE) — and the layout.  Scoring constants like
    # BM25_IDF_Q apply at serve time; they neither invalidate nor rebuild.
    from dream_spark.functions.artifacts import source_digest

    tok_digest = source_digest(tokens, TOKEN_SPLIT_RE)
    sig = "|".join(
        [
            root,
            str(os.path.getmtime(doc) if os.path.exists(doc) else 0),
            f"v{_POSTINGS_FORMAT_VERSION}",
            f"tok[{tok_digest}]-p{POSTINGS_PARTS}",
        ]
    )
    return build_once_path(sig, "lexindex", lambda tmp: save_postings_index(spark, sf_dir, tmp))


def warm_postings_index(spark: SparkSession, sf_dir: str) -> None:
    """Bench/deployment warm hook: ensure the persisted postings index
    exists so serve entries measure retrieval, not construction."""
    _postings_index_path(spark, sf_dir)


def bm25_serve(
    spark: SparkSession,
    path: str,
    qterms: DataFrame | None = None,
    n_queries: int = TEXT_KNN_QUERIES,
    k: int = BM25_K,
) -> DataFrame:
    """Serve BM25 queries from the PERSISTED postings index: no
    tokenization, no corpus statistics pass — scoring is pure joins
    against storage.  ``qterms`` is any (query_id, qtok) table; when
    omitted, the first ``n_queries`` indexed documents' term sets are the
    queries (the text_knn convention).  For small query-term sets
    (≤ _BM25_INLINE_TERMS) a literal ``tok IN (...)`` predicate is pushed
    into the tok-sorted postings scan, so parquet row-group min/max
    statistics skip everything but the probed terms' postings ranges —
    at 100 TB that is the difference between scanning the index and
    scanning the probed lists.  Results are identical to the inline
    :func:`bm25_topk` (the roundtrip preserves exact int64 quantities),
    so the BM25 oracle replays byte-identically."""
    postings, lex, dl, stats = load_postings_index(spark, path)
    if qterms is None:
        qterms = _bm25_qterms(postings, n_queries)
    terms = [
        r["qtok"]
        for r in qterms.select("qtok").distinct().limit(_BM25_INLINE_TERMS + 1).collect()
    ]
    if len(terms) <= _BM25_INLINE_TERMS:
        postings = postings.where(F.col("tok").isin(terms))
        lex = lex.where(F.col("tok").isin(terms))
        return _bm25_score(postings, lex, dl, stats, qterms, k, dfreq_query_bounded=True)
    return _bm25_score(postings, lex, dl, stats, qterms, k)


def text_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper for the SERVE path: same query set and
    results as ``text_bm25`` (same oracle), probed against the persisted
    index."""
    return bm25_serve(spark, _postings_index_path(spark, sf_dir))


# --------------------------------------------------------------------------
# Narrow-query BM25 lookup: the few-term serve path
# --------------------------------------------------------------------------
#: the query document whose rarest terms form the narrow lookup query
BM25_LOOKUP_DOC = 0
#: how many of its rarest terms (by df asc, tok asc) the lookup probes
BM25_LOOKUP_TERMS = 8


def bm25_lookup(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    query_doc: int = BM25_LOOKUP_DOC,
    n_terms: int = BM25_LOOKUP_TERMS,
    k: int = BM25_K,
) -> DataFrame:
    """The NARROW serve shape: a handful of query terms probed against the
    persisted postings index — the interactive-lookup workload, as opposed
    to the ~10³-distinct-term batch shape ``text_bm25_served`` measures.

    Query = the ``n_terms`` rarest distinct tokens of ``query_doc``
    (ranked by lexicon df ascending, then token — deterministic, and
    replayable on the oracle from the raw corpus).  Building the term set
    touches ONE document (the doc_id predicate pushes into the documents
    parquet scan) plus the lexicon (vocabulary-sized, sublinear in corpus
    rows); scoring then rides :func:`bm25_serve`, whose inline ``tok IN
    (...)`` gate fires at ``n_terms`` literals — parquet row-group min/max
    on the tok-sorted postings skip everything but the probed terms'
    postings ranges.  At 100 TB this is the path whose cost tracks the
    probed lists, not the corpus (the IVF-pruned analog for lexical
    retrieval; slope measured in SCALE.md §7)."""
    _, lex, _, _ = load_postings_index(spark, path)
    qtoks = tokens(docs.where(F.col("doc_id") == query_doc)).select("tok").distinct()
    qterms = (
        lex.join(F.broadcast(qtoks), on="tok")
        .orderBy(F.col("df").asc(), F.col("tok").asc())
        .limit(n_terms)
        .select(
            F.lit(query_doc).cast("bigint").alias("query_id"),
            F.col("tok").alias("qtok"),
        )
    )
    return bm25_serve(spark, path, qterms=qterms, k=k)


def text_bm25_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: narrow BM25 lookup against the persisted
    index (SCALE.md §7's narrow-query slope entry)."""
    return bm25_lookup(
        spark,
        _postings_index_path(spark, sf_dir),
        load_table(spark, sf_dir, "documents"),
    )


TEXT_BM25_LOOKUP_SQL = _bm25_oracle_sql(
    f"""SELECT CAST({BM25_LOOKUP_DOC} AS BIGINT) AS query_id, tok AS qtok FROM (
    SELECT f.tok FROM dfreq f
    JOIN (SELECT DISTINCT tok FROM toks WHERE doc_id = {BM25_LOOKUP_DOC}) q
      ON q.tok = f.tok
    ORDER BY f.df ASC, f.tok ASC LIMIT {BM25_LOOKUP_TERMS}
  )"""
)


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS selector)
# --------------------------------------------------------------------------
#: tokens per k-gram and winnow window width (guarantee: any token run of
#: length >= WINNOW_W + WINNOW_K - 1 shared by two docs yields a shared
#: selected fingerprint)
WINNOW_K = 3
WINNOW_W = 8


def _kgram_sql(ids: tuple[str, str, str]) -> str:
    """Positional polynomial over 3 consecutive token ids — each id is
    already < 2^30 (Horner pack), weights 1/31/961 keep the sum < 2^40,
    exact in int64; mod P normalizes into hash space."""
    a, b, c = ids
    return f"(({a}) + 31 * ({b}) + 961 * ({c})) % {MERSENNE_P}"


def winnow_fingerprints(docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W) -> DataFrame:
    """Winnowed fingerprint SET of every document: (doc_id, fp, pos) — the
    minimum k-gram hash of each w-window of consecutive k-grams, distinct.
    The classic robust selection: total-coverage guarantee above (any
    sufficiently long shared run is detected) with expected density
    2/(w+1) — an ~80% reduction over all-grams at w=8.

    Shape at 100 TB: ONE shuffle keyed by doc_id; the k-gram LEADs and the
    w-window MIN/COUNT all run over that same per-doc sort (Catalyst
    collapses the window specs into one exchange+sort).  Ties inside a
    window break by position through the packed key (fp·2³¹ + pos —
    deterministic, and both engines compare the identical integer).  Only
    FULL windows select (COUNT(gram)=w over the frame), matching the
    guarantee's preconditions."""
    tk = tokens(docs, with_pos=True).select(
        "doc_id", "pos", F.expr(token_id_sql("tok")).alias("tid")
    )
    per_doc = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        tk.withColumn("__t1", F.lead("tid", 1).over(per_doc))
        .withColumn("__t2", F.lead("tid", 2).over(per_doc))
        .where(F.col("__t2").isNotNull())
        .select("doc_id", "pos", F.expr(_kgram_sql(("tid", "__t1", "__t2"))).alias("gram"))
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    key = (F.col("gram") * (1 << 31) + F.col("pos"))
    sel = (
        grams.withColumn("__key", F.min(key).over(frame))
        .withColumn("__n", F.count("gram").over(frame))
        .where(F.col("__n") == w)
        .select(
            "doc_id",
            F.expr(f"__key div {1 << 31}").cast("bigint").alias("fp"),
            F.expr(f"__key % {1 << 31}").cast("bigint").alias("pos"),
        )
        .distinct()
    )
    return sel


def text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: per-doc winnow digest (count + integer
    checksum of the selected fingerprint set) — the bounded summary; the
    full (doc_id, fp, pos) set is the library surface above."""
    sel = winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    return sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fps"),
        (F.sum("fp") % MERSENNE_P).cast("bigint").alias("fp_checksum"),
    )


TEXT_WINNOW_SQL = f"""
WITH toks AS ({duck_tokens_cte(with_pos=True)}),
tids AS (SELECT doc_id, pos, {token_id_sql('tok')} AS tid FROM toks),
grams AS (
  SELECT doc_id, pos, {_kgram_sql(('tid', 't1', 't2'))} AS gram FROM (
    SELECT doc_id, pos, tid,
           LEAD(tid, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
           LEAD(tid, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
    FROM tids
  ) WHERE t2 IS NOT NULL
),
sel AS (
  SELECT DISTINCT doc_id,
         CAST(mk // {1 << 31} AS BIGINT) AS fp,
         CAST(mk % {1 << 31} AS BIGINT) AS pos
  FROM (
    SELECT doc_id,
           MIN(gram * {1 << 31} + pos) OVER win AS mk,
           COUNT(gram) OVER win AS n
    FROM grams
    WINDOW win AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
  ) WHERE n = {WINNOW_W}
)
SELECT doc_id, COUNT(*) AS n_fps,
       CAST(SUM(fp) % {MERSENNE_P} AS BIGINT) AS fp_checksum
FROM sel GROUP BY doc_id
""".strip()


QUERIES = {
    "text_winnow": text_winnow,
    "text_features": text_features,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_topterms": text_topterms,
    "text_knn": text_knn,
    "text_redact": text_redact,
    "text_bm25": text_bm25,
    "text_bm25_served": text_bm25_served,
    "text_bm25_lookup": text_bm25_lookup,
}

ORACLES = {
    "text_features": TEXT_FEATURES_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_winnow": TEXT_WINNOW_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_topterms": TEXT_TOPTERMS_SQL,
    "text_knn": TEXT_KNN_SQL,
    "text_redact": TEXT_REDACT_SQL,
    "text_bm25": TEXT_BM25_SQL,
    "text_bm25_served": TEXT_BM25_SQL,
    "text_bm25_lookup": TEXT_BM25_LOOKUP_SQL,
}
