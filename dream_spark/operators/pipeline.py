"""Training-data pipeline operators over the ``documents`` table:
deterministic dataset splitting, stratified sampling, quantized TF-IDF
term ranking, and corpus n-gram statistics.

These are the plumbing every large-scale training-data pipeline needs
between dedup and tokenization (the reference engine has nothing like them
— SURVEY.md §2.3; they extend the north-star LLM-pipeline suite).  All
randomness is replaced by the package's universal hashing
(functions/hashing.py) so both engines — and any two cluster runs — assign
identical splits/samples: reproducible data curation is a correctness
feature, not a nicety.

Scale notes (100 TB posture):
- ``split_assign`` is map-only: a projection over the scan, no shuffle, no
  state.  Split assignment must never require a join against a membership
  table — the hash IS the membership function.
- ``stratified_sample`` shuffles once on the stratum key and ranks inside
  each stratum.  With few huge strata the per-stratum sort serializes; the
  scale path is a two-phase sample (hash-threshold prefilter sized from
  per-stratum counts ≈ 2n survivors, then the exact window on the tiny
  survivor set).  The prefilter is a pure map, so the expensive sort sees
  ~2n rows per stratum instead of the full corpus.
- ``tfidf_topterms`` is two partial-aggregated shuffles (doc×term, then
  term) plus a term-keyed join; stop-word-like terms are the classic skew
  case — AQE skew-join handles moderate skew, and the df side is a
  term-level aggregate (vocabulary-sized, far smaller than the token
  stream) so Spark's planner can broadcast it when it fits.
- ``bigram_counts`` needs token *adjacency*, which the bag-of-tokens
  explode loses — the per-document window (LEAD over pos) shuffles by
  doc_id, which is near-uniform by construction; the following global
  count is partially aggregated map-side.

Integer determinism contract: every ranking key and output metric is
either an exact integer or a deterministic CASE over integers; TF-IDF's
idf is integer-quantized (``IDF_QUANT · (N+1) div (df+1)``) instead of a
float logarithm, so cross-engine comparisons never meet float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dream_spark.functions.features import TOKEN_SPLIT_RE, duck_tokens_cte, tokens
from dream_spark.functions.hashing import hash_sql
from dream_spark.functions.joins import broadcast_if_small
from dream_spark.functions.textkernels import spread_small, token_ngram_sets
from dream_spark.sources.tables import load_table

#: (train, val, test) percentage weights for the deterministic split
SPLIT_WEIGHTS = (80, 10, 10)
#: documents sampled per stratum
SAMPLE_PER_GROUP = 20
#: top terms kept per document by quantized TF-IDF
TFIDF_K = 5
#: idf quantization factor: idf_q = IDF_QUANT * (N+1) div (df+1)
IDF_QUANT = 1_000_000
#: corpus bigrams kept
BIGRAM_TOP_K = 50


def _split_bucket_sql(id_expr: str) -> str:
    """Portable SQL for the 0-99 split bucket of an integer id column."""
    return f"({hash_sql(id_expr, 0)} % 100)"


def _split_case_sql(bucket_expr: str, weights: tuple[int, int, int]) -> str:
    train, val, _ = weights
    return (
        f"(CASE WHEN {bucket_expr} < {train} THEN 'train'"
        f" WHEN {bucket_expr} < {train + val} THEN 'val'"
        f" ELSE 'test' END)"
    )


def split_assign(
    df: DataFrame, id_col: str = "doc_id", weights: tuple[int, int, int] = SPLIT_WEIGHTS
) -> DataFrame:
    """Deterministic train/val/test assignment for ANY DataFrame with an
    integer id column: bucket = h(id) mod 100, split by cumulative weights.

    Map-only (no shuffle, no membership table); the same id gets the same
    split on every engine, run, and cluster size — the reproducibility
    contract training pipelines require."""
    if sum(weights) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    bucket = F.expr(_split_bucket_sql(id_col))
    split = F.expr(_split_case_sql(_split_bucket_sql(id_col), weights))
    return df.withColumn("bucket", bucket).withColumn("split", split)


def pipeline_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: deterministic 80/10/10 split of documents."""
    docs = load_table(spark, sf_dir, "documents")
    return split_assign(docs.select("doc_id", "lang")).select(
        "doc_id", "lang", "bucket", "split"
    )


PIPELINE_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CAST({_split_bucket_sql("doc_id")} AS BIGINT) AS bucket,
       {_split_case_sql(_split_bucket_sql("doc_id"), SPLIT_WEIGHTS)} AS split
FROM documents
""".strip()


# --------------------------------------------------------------------------
# Quality-weighted Bernoulli sampling (deterministic per-document coin)
# --------------------------------------------------------------------------
#: fixed-point scale for keep probabilities (micro-units)
WS_PSCALE = 1_000_000
#: saturation point of the length-derived weight: p grows linearly with
#: n_chars and flattens here (longer is better evidence of substance, but
#: unboundedly long is not unboundedly better)
WS_SAT_CHARS = 800
#: maximum keep probability in micro-units (docs at/over saturation keep
#: with p = 0.6)
WS_RATE_MICRO = 600_000
#: hash-function index reserved for the sampling coin (outside the
#: minhash signature range 0-15 and the HBOW band range)
_WS_FN = 33


def _ws_p_micro_sql(weight_expr: str) -> str:
    """Keep probability in micro-units: RATE · LEAST(w, SAT) div SAT.
    ``{d}`` is the integer-division operator (`div` on Spark, `//` on
    DuckDB) — format before use."""
    return f"({WS_RATE_MICRO} * LEAST({weight_expr}, {WS_SAT_CHARS}) {{d}} {WS_SAT_CHARS})"


def _ws_coin_sql(id_expr: str) -> str:
    """The per-id coin in [0, PSCALE): a universal-hash draw reduced mod
    PSCALE.  P mod PSCALE ≠ 0, so the reduction carries a ~5·10⁻⁴
    relative modulo bias — deterministic and identical on both engines,
    and orders of magnitude below the binomial noise of any real sample;
    documented rather than engineered away."""
    return f"({hash_sql(id_expr, _WS_FN)} % {WS_PSCALE})"


def weighted_sample(df: DataFrame, weight_col: str, id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted Bernoulli sample for ANY DataFrame with an
    integer id column: keep row i iff h(id_i) mod PSCALE < p_i, where the
    keep probability p_i is proportional to the (saturated) weight column
    — the quality-proportional subsampling step of a data-curation
    pipeline (keep more of what scores well, a deterministic fraction of
    the rest), with the reproducibility contract of ``split_assign``: the
    same id draws the same coin on every engine, run, and cluster size.

    Scale shape: MAP-ONLY — the weight is a row-local expression and the
    coin is a hash of the id, so the decision is a projection+filter on
    the scan; nothing shuffles at any corpus size."""
    p = F.expr(_ws_p_micro_sql(weight_col).format(d="div"))
    coin = F.expr(_ws_coin_sql(id_col))
    return df.withColumn("p_micro", p).where(coin < F.col("p_micro"))


def pipeline_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: length-weighted deterministic sample of
    documents (weight = n_chars saturated at WS_SAT_CHARS)."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs.select("doc_id", "source", "n_chars"), "n_chars").select(
        "doc_id", "source", F.col("p_micro").cast("bigint")
    )


PIPELINE_SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, source, CAST({_ws_p_micro_sql("n_chars").format(d="//")} AS BIGINT) AS p_micro
FROM documents
WHERE {_ws_coin_sql("doc_id")} < {_ws_p_micro_sql("n_chars").format(d="//")}
""".strip()


def stratified_sample(
    df: DataFrame, group_col: str, id_col: str = "doc_id", n: int = SAMPLE_PER_GROUP
) -> DataFrame:
    """Deterministic per-stratum sample: the ``n`` rows of each stratum with
    the smallest universal-hash value (ties broken by id).  Because the hash
    is uniform this is an unbiased sample, and because it is a function of
    the id it is identical across engines and runs."""
    h = F.expr(hash_sql(id_col, 1))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("samp_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("samp_rank") <= n)
    )


def pipeline_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: 20 deterministic documents per language."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(docs, "lang").select("lang", "doc_id", "samp_rank")


PIPELINE_SAMPLE_SQL = f"""
SELECT lang, doc_id, samp_rank FROM (
  SELECT lang, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY {hash_sql("doc_id", 1)}, doc_id) AS BIGINT) AS samp_rank
  FROM documents
) WHERE samp_rank <= {SAMPLE_PER_GROUP}
""".strip()


#: total budget of the PROPORTIONAL stratified sample (largest-remainder
#: allocation across strata; a stratum smaller than its allocation simply
#: contributes all of itself — the rank filter caps at the stratum size)
SAMPLE_BUDGET = 200


def stratified_alloc_sample(
    docs: DataFrame, stratum: str, budget: int = SAMPLE_BUDGET
) -> DataFrame:
    """Proportional stratified sample with EXACT integer largest-remainder
    allocation — the mixture-preserving sampler a training-data pipeline
    uses to cut a corpus to a token/document budget without skewing the
    source mix (fixed per-group quotas — :func:`stratified_sample` — keep
    rare strata over-represented; proportional floats drift across
    engines; largest-remainder is the standard exact apportionment).

    Allocation: n_s = ⌊budget·c_s/N⌋, then the budget − Σ⌊…⌋ leftover
    seats go to the largest remainders (ties by stratum key).  Every
    quantity is int64 arithmetic, so both engines compute identical
    quotas.  Selection within a stratum is the deterministic hash rank
    (same as the fixed sampler).

    Scale shape: the allocation is computed over the strata-COUNT table
    (one partial-agg shuffle of counters; the windows on it are
    single-partition but bounded by stratum cardinality, never corpus
    size — the temporal day-carry pattern), then broadcast-joined onto
    the per-stratum hash-rank window.  No corpus-sized global window
    anywhere."""
    counts = docs.groupBy(stratum).agg(F.count(F.lit(1)).alias("c"))
    w_all = Window.partitionBy()
    alloc0 = counts.select(
        stratum,
        (F.lit(budget) * F.col("c")).alias("bc"),
        F.sum("c").over(w_all).alias("n"),
    ).select(
        stratum,
        F.expr("bc div n").alias("base"),
        (F.col("bc") % F.col("n")).alias("rem"),
    )
    w_rem = Window.orderBy(F.col("rem").desc(), F.col(stratum))
    alloc = (
        alloc0.withColumn("extra", F.lit(budget) - F.sum("base").over(w_all))
        .withColumn("rr", F.row_number().over(w_rem))
        .select(
            stratum,
            (F.col("base") + (F.col("rr") <= F.col("extra")).cast("long")).alias("n_alloc"),
        )
    )
    w_rank = Window.partitionBy(stratum).orderBy(F.expr(hash_sql("doc_id", 1)), "doc_id")
    ranked = docs.withColumn("samp_rank", F.row_number().over(w_rank).cast("long"))
    return ranked.join(F.broadcast(alloc), on=stratum).where(
        F.col("samp_rank") <= F.col("n_alloc")
    )


def pipeline_sample_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: SAMPLE_BUDGET documents proportionally
    allocated across sources by exact largest remainder."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_alloc_sample(docs, "source").select(
        "source", "doc_id", "samp_rank", "n_alloc"
    )


PIPELINE_SAMPLE_ALLOC_SQL = f"""
WITH counts AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
alloc0 AS (
  SELECT source, ({SAMPLE_BUDGET} * c) // n AS base, ({SAMPLE_BUDGET} * c) % n AS rem
  FROM counts, tot
),
extra AS (SELECT CAST({SAMPLE_BUDGET} - SUM(base) AS BIGINT) AS e FROM alloc0),
alloc AS (
  SELECT source,
         CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source) <= e
                          THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
  FROM alloc0, extra
),
ranked AS (
  SELECT source, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY {hash_sql("doc_id", 1)}, doc_id) AS BIGINT) AS samp_rank
  FROM documents
)
SELECT r.source, r.doc_id, r.samp_rank, a.n_alloc
FROM ranked r JOIN alloc a USING (source)
WHERE r.samp_rank <= a.n_alloc
""".strip()


def tfidf_topterms(docs: DataFrame, k: int = TFIDF_K) -> DataFrame:
    """Top-``k`` terms per document by integer-quantized TF-IDF for ANY
    ``(doc_id, text)`` DataFrame.

    score = tf · (IDF_QUANT · (N+1) div (df+1)) — the standard tf·idf
    ranking with the logarithm replaced by a quantized rational so the
    ranking is exact integer arithmetic on every engine (a monotone
    transform of N/df preserves the idf ordering; only inter-term score
    *ratios* differ from ln-idf, which a top-k ranking never uses)."""
    # spread the token explode across the cluster — gated: only when the
    # input arrives under-split (small parquet = one split); at real scale
    # the scan already spans the cluster and repartitioning would shuffle
    # the whole raw corpus before the explode
    docs = spread_small(docs)
    toks = tokens(docs)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # df is derivable from tf — one row per (doc_id, tok) means row count
    # per tok IS the distinct-doc count — so the corpus is tokenized once
    # and the (doc_id, tok) shuffle stage is shared (AQE stage reuse)
    # instead of a second full scan+explode feeding a countDistinct
    # (guide §2.3 aggregate-first / §2.4 shared exchange).  COUNT_IF(tf>0)
    # not COUNT(*): tf >= 1 always so the value is identical, but a plain
    # count lets the optimizer prune tf out of this branch's child
    # aggregate, which de-canonicalizes the two subtrees and blocks the
    # stage reuse this rewrite exists for.
    dfreq = tf.groupBy("tok").agg(F.count_if(F.col("tf") > 0).alias("df"))
    total = docs.select(F.countDistinct("doc_id").alias("n_total"))
    scored = (
        tf.join(dfreq, on="tok")
        .crossJoin(F.broadcast(total))
        .withColumn("score", F.expr(f"tf * (({IDF_QUANT} * (n_total + 1)) div (df + 1))"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select("doc_id", F.col("tok").alias("term"), "tf", "df", "score", "rnk")
    )


def pipeline_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``tfidf_topterms`` over documents."""
    return tfidf_topterms(load_table(spark, sf_dir, "documents"))


PIPELINE_TFIDF_SQL = f"""
WITH toks AS ({duck_tokens_cte()}),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
total AS (SELECT COUNT(DISTINCT doc_id) AS n_total FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
         tf.tf * (({IDF_QUANT} * (total.n_total + 1)) // (dfreq.df + 1)) AS score
  FROM tf JOIN dfreq USING (tok) CROSS JOIN total
)
SELECT doc_id, tok AS term, tf, df, score, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, tok) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= {TFIDF_K}
""".strip()


def bigram_counts(docs: DataFrame, k: int = BIGRAM_TOP_K) -> DataFrame:
    """Corpus-level top-``k`` consecutive-token bigrams for ANY ``(doc_id,
    text)`` DataFrame — the co-occurrence statistic BPE-style tokenizer
    training and collocation analysis start from.  Adjacency comes from a
    per-document LEAD over token position; the global count is a partially
    aggregated groupBy."""
    tk = tokens(docs, with_pos=True)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tk.withColumn("nxt", F.lead("tok", 1).over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "tok", "nxt").alias("bigram"))
    )
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("bigram").asc()).limit(k)


def pipeline_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``bigram_counts`` over documents."""
    return bigram_counts(load_table(spark, sf_dir, "documents"))


PIPELINE_BIGRAMS_SQL = f"""
WITH toks AS ({duck_tokens_cte(with_pos=True)}),
bg AS (
  SELECT tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM toks
  QUALIFY bigram IS NOT NULL
)
SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT {BIGRAM_TOP_K}
""".strip()


#: chunking geometry: tokens per chunk, tokens shared between neighbors
CHUNK_TOKENS = 40
CHUNK_OVERLAP = 10

#: portable token-array fragment (Spark HOF syntax); the DuckDB twin uses
#: list_filter/string_split_regex over the identical regex
_TOKARR_SPARK = f"filter(split(lower(text), '{TOKEN_SPLIT_RE}'), x -> x != '')"
_TOKARR_DUCK = f"list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')"


def chunk_documents(
    docs: DataFrame, chunk: int = CHUNK_TOKENS, overlap: int = CHUNK_OVERLAP
) -> DataFrame:
    """Split ANY ``(doc_id, text)`` DataFrame into overlapping token windows
    — the doc→training-sequence step between curation and tokenization.

    Chunks start every ``chunk − overlap`` tokens; the final chunk may be
    short (never empty).  Entirely map-side built-ins (split → sequence →
    explode → slice): no shuffle, no UDF, no state — at 100 TB this is a
    pure scan-shaped stage that AQE never has to re-plan.  Output rows are
    (doc_id, chunk_id, start_pos, n_chunk_tokens, chunk_text)."""
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got {chunk=} {overlap=}")
    stride = chunk - overlap
    base = (
        docs.select("doc_id", F.expr(_TOKARR_SPARK).alias("toks"))
        .withColumn("n", F.size("toks"))
        .where(F.col("n") > 0)
    )
    st = base.select(
        "doc_id", "toks", "n", F.explode(F.expr(f"sequence(1, n, {stride})")).alias("start")
    )
    return st.select(
        "doc_id",
        F.expr(f"CAST((start - 1) div {stride} AS BIGINT)").alias("chunk_id"),
        F.col("start").cast("bigint").alias("start_pos"),
        F.expr(f"CAST(least({chunk}, n - start + 1) AS BIGINT)").alias("n_chunk_tokens"),
        F.expr(f"array_join(slice(toks, start, {chunk}), ' ')").alias("chunk_text"),
    )


def pipeline_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: overlapping 40/10 token chunks of documents."""
    return chunk_documents(load_table(spark, sf_dir, "documents"))


PIPELINE_CHUNKS_SQL = f"""
WITH arr AS (
  SELECT doc_id, {_TOKARR_DUCK} AS toks FROM documents
),
st AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(1, len(toks) + 1, {CHUNK_TOKENS - CHUNK_OVERLAP})) AS start
  FROM arr WHERE len(toks) > 0
)
SELECT doc_id,
       CAST((start - 1) // {CHUNK_TOKENS - CHUNK_OVERLAP} AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start_pos,
       CAST(LEAST({CHUNK_TOKENS}, n - start + 1) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[start:start + {CHUNK_TOKENS} - 1], ' ') AS chunk_text
FROM st
""".strip()


#: shard packing: token budget per shard, hash buckets packed independently
PACK_BUDGET_TOKENS = 500
PACK_BUCKETS = 8
#: shard id = bucket · stride + in-bucket shard ordinal
PACK_SHARD_STRIDE = 1_000_000


def pack_shards(
    docs: DataFrame,
    budget: int = PACK_BUDGET_TOKENS,
    n_buckets: int = PACK_BUCKETS,
) -> DataFrame:
    """Assign ANY ``(doc_id, text)`` DataFrame to token-budget training
    shards: a document starts in shard ``floor(prior_bucket_tokens /
    budget)`` of its hash bucket.

    A single global running sum would serialize the whole corpus through
    one partition; instead documents hash into ``n_buckets`` independent
    buckets (map-only), each bucket packs by a running sum over the
    deterministic (hash, id) order, and the global shard id is
    ``bucket · PACK_SHARD_STRIDE + local``.  At 100 TB, n_buckets scales
    with the cluster and each bucket's window is an ordinary partitioned
    sort — no global barrier.  Every shard's token count stays within
    ``budget + max_doc_tokens`` (bin packing's online guarantee)."""
    h_bucket = f"({hash_sql('doc_id', 2)} % {n_buckets})"
    h_order = F.expr(hash_sql("doc_id", 3))
    base = docs.select(
        "doc_id",
        F.expr(f"CAST(size({_TOKARR_SPARK}) AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST({h_bucket} AS BIGINT)").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(h_order.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.withColumn("cum", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "n_tokens",
        "bucket",
        F.expr(
            f"CAST(bucket * {PACK_SHARD_STRIDE} + (cum - n_tokens) div {budget} AS BIGINT)"
        ).alias("shard"),
    )


def pipeline_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: token-budget shard packing of documents."""
    return pack_shards(load_table(spark, sf_dir, "documents"))


PIPELINE_SHARDS_SQL = f"""
WITH arr AS (
  SELECT doc_id, CAST(len({_TOKARR_DUCK}) AS BIGINT) AS n_tokens,
         CAST({hash_sql("doc_id", 2)} % {PACK_BUCKETS} AS BIGINT) AS bucket
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens, bucket,
         CAST(SUM(n_tokens) OVER (PARTITION BY bucket
                                  ORDER BY {hash_sql("doc_id", 3)}, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM arr
)
SELECT doc_id, n_tokens, bucket,
       CAST(bucket * {PACK_SHARD_STRIDE} + (cum - n_tokens) // {PACK_BUDGET_TOKENS} AS BIGINT) AS shard
FROM c
""".strip()


#: mixture weights: source -> keep-rate in parts-per-million (exact integer
#: thresholds so both engines draw the identical sample).  Sources not
#: listed keep MIXTURE_DEFAULT_PPM.
MIXTURE_RATES_PPM = {"src0": 1_000_000, "src1": 500_000, "src2": 250_000, "src3": 0}
MIXTURE_DEFAULT_PPM = 750_000
#: hash-function index reserved for mixture sampling
_MIX_FN = 5


def mixture_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int] = MIXTURE_RATES_PPM,
    default_ppm: int = MIXTURE_DEFAULT_PPM,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset-mixture sampling — the per-source keep-rates a training run
    applies when blending corpora (upweight curated sources, cap crawl):
    keep a document iff ``h(id) mod 10^6 < rate_ppm(source)``.

    Map-only: the hash IS the sampling decision, so no per-source counts,
    no shuffle, no state — and the same id is kept or dropped identically
    on every engine, run, and cluster size (resampling a grown corpus
    keeps the previous sample's decisions, the reproducibility property
    mixture schedules need).  Rates are integer parts-per-million so the
    threshold comparison is exact on both engines."""
    if not all(0 <= r <= 1_000_000 for r in list(rates_ppm.values()) + [default_ppm]):
        raise ValueError("rates must be in [0, 1_000_000] ppm")
    u = F.expr(f"({hash_sql(id_col, _MIX_FN)} % 1000000)")
    whens = None
    for src, r in sorted(rates_ppm.items()):
        cond = F.col(source_col) == src
        whens = F.when(cond, r) if whens is None else whens.when(cond, r)
    rate = whens.otherwise(default_ppm) if whens is not None else F.lit(default_ppm)
    return docs.withColumn("__u", u).where(F.col("__u") < rate).drop("__u")


def pipeline_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: mixture-sampled documents (ids + source)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_sample(docs)


def _mixture_sql() -> str:
    whens = " ".join(f"WHEN '{s}' THEN {r}" for s, r in sorted(MIXTURE_RATES_PPM.items()))
    return f"""
SELECT doc_id, source FROM documents
WHERE ({hash_sql("doc_id", _MIX_FN)} % 1000000)
      < (CASE source {whens} ELSE {MIXTURE_DEFAULT_PPM} END)
""".strip()


PIPELINE_MIXTURE_SQL = _mixture_sql()


#: curation quality gate: keep documents with ≥ this many whitespace tokens
CURATE_MIN_TOKENS = 30


def curate(docs: DataFrame) -> DataFrame:
    """The end-to-end corpus-curation pipeline in ONE plan, for ANY
    ``(doc_id, text)`` DataFrame: quality gate → near-duplicate removal →
    deterministic split.

    1. Quality: drop documents under CURATE_MIN_TOKENS whitespace tokens
       (the integer-exact core of the quality score — the float composite
       stays available via ``text.features_of``).
    2. Dedup: within every verified near-duplicate cluster
       (trigram-Jaccard ≥ 0.8, connected components) keep only the
       canonical (minimum) doc_id — an anti join against the non-canonical
       cluster members; the duplicate set is orders of magnitude smaller
       than the corpus, so the anti join's build side stays tiny.
    3. Split: map-only universal-hash bucketing (``split_assign``).

    Output: (doc_id, n_tokens, split) for every surviving document —
    exactly what a tokenizer/sharding stage consumes."""
    from dream_spark.operators.dedup import duplicate_clusters

    # map-side token count (same split the explode-based form tokenized
    # with): one scan, zero shuffles, instead of explode + groupBy(doc_id)
    # (guide §2.4 — every token of a document is already in its row).
    # Token-less/NULL text never reaches the >= gate either way.
    counts = docs.select(
        "doc_id", F.expr(f"size({_TOKARR_SPARK})").cast("bigint").alias("n_tokens")
    )
    quality = counts.where(F.col("n_tokens") >= CURATE_MIN_TOKENS)
    drop = (
        duplicate_clusters(docs)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    kept = quality.join(drop, on="doc_id", how="left_anti")
    return split_assign(kept).select("doc_id", "n_tokens", "split")


def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``curate`` over the documents table."""
    return curate(load_table(spark, sf_dir, "documents"))


def _curate_sql() -> str:
    from dream_spark.operators.dedup import DEDUP_CLUSTERS_SQL

    return f"""
WITH toks AS ({duck_tokens_cte()}),
counts AS (SELECT doc_id, COUNT(*) AS n_tokens FROM toks GROUP BY doc_id),
quality AS (SELECT * FROM counts WHERE n_tokens >= {CURATE_MIN_TOKENS}),
clusters AS ({DEDUP_CLUSTERS_SQL}),
dropped AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
SELECT q.doc_id, q.n_tokens,
       {_split_case_sql(_split_bucket_sql("q.doc_id"), SPLIT_WEIGHTS)} AS split
FROM quality q ANTI JOIN dropped d ON q.doc_id = d.doc_id
""".strip()


PIPELINE_CURATE_SQL = _curate_sql()


def canonicalize(docs: DataFrame) -> DataFrame:
    """Quality-aware canonical selection per near-duplicate cluster, for
    ANY ``(doc_id, text)`` DataFrame: every document maps to the surviving
    representative of its cluster — the member with the HIGHEST composite
    quality score (``text.features_of``), ties broken by lowest doc_id —
    and unclustered documents map to themselves.  Output one row per
    input document: ``(doc_id, canonical, kept)``, kept = 1 iff the
    document IS its own canonical.  This is the keep-the-best-copy step a
    training pipeline runs between near-dup clustering and tokenization
    (``curate`` keeps min-doc_id instead — the cheap integer rule; this
    operator trades one features pass for keeping the best-written copy).

    The float quality_score is used ONLY as an ordering key: both engines
    evaluate the identical IEEE expression (the shared fragment in
    ``TEXT_FEATURES_SQL``) and ties fall back to doc_id, so the selection
    is deterministic and the OUTPUT stays all-integer.

    Scale shape: the cluster table is duplicate-set-sized (orders of
    magnitude under the corpus), so the rank window partitions tiny
    groups; the corpus-wide work is one features pass (map-side since
    ``features_of`` went HOF) and one id-keyed left join whose build side
    (the mapped duplicates) broadcasts at any realistic dup rate."""
    from dream_spark.functions.joins import broadcast_if_small
    from dream_spark.operators.dedup import duplicate_clusters
    from dream_spark.operators.text import features_of

    cc = duplicate_clusters(docs)
    q = features_of(docs).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    canon = (
        cc.join(q, on="doc_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("cluster_id", F.col("doc_id").alias("canonical"))
    )
    mapped = cc.join(canon, on="cluster_id").select("doc_id", "canonical")
    # |mapped| = |cc| (one row per clustered doc), and cc is already
    # materialized (small path: driver-local; scale path: checkpointed CC
    # labels) so its count is a metadata-cheap job — gate the final join's
    # build side on it instead of letting the planner's blown-up estimate
    # of the window subtree force both sides through a sort-merge exchange
    # (guide §3.1: the corpus side should not shuffle for a dup-sized map)
    mapped = broadcast_if_small(mapped, known_count=cc.count())
    out_canon = F.coalesce(F.col("canonical"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(mapped, on="doc_id", how="left")
        .select(
            "doc_id",
            out_canon.alias("canonical"),
            F.when(out_canon == F.col("doc_id"), 1).otherwise(0).cast("bigint").alias("kept"),
        )
    )


def pipeline_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``canonicalize`` over the documents table."""
    return canonicalize(load_table(spark, sf_dir, "documents"))


def _canonicalize_sql() -> str:
    from dream_spark.operators.dedup import DEDUP_CLUSTERS_SQL
    from dream_spark.operators.text import TEXT_FEATURES_SQL

    return f"""
WITH clusters AS ({DEDUP_CLUSTERS_SQL}),
feats AS ({TEXT_FEATURES_SQL}),
ranked AS (
  SELECT c.doc_id, c.cluster_id,
         ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id
           ORDER BY f.quality_score DESC, c.doc_id
         ) AS rk
  FROM clusters c JOIN feats f USING (doc_id)
),
canon AS (SELECT cluster_id, doc_id AS canonical FROM ranked WHERE rk = 1),
mapped AS (
  SELECT c.doc_id, can.canonical FROM clusters c JOIN canon can USING (cluster_id)
)
SELECT d.doc_id,
       COALESCE(m.canonical, d.doc_id) AS canonical,
       CAST(CASE WHEN COALESCE(m.canonical, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM documents d LEFT JOIN mapped m ON m.doc_id = d.doc_id
""".strip()


PIPELINE_CANONICALIZE_SQL = _canonicalize_sql()


#: benchmark-contamination n-gram order (word n-grams; 13 is the common
#: eval-decontamination choice on natural text — 3 here because the
#: synthetic docs are ~50 tokens over a tiny vocabulary)
CONTAM_NGRAM = 3
#: split buckets (0-99, split_assign scheme): train < 80, benchmark ≥ 90
_CONTAM_TRAIN_MAX = 80
_CONTAM_BENCH_MIN = 90


def contamination_check(docs: DataFrame, benchmark: DataFrame, n: int = CONTAM_NGRAM) -> DataFrame:
    """Benchmark-contamination detection for ANY pair of ``(doc_id, text)``
    DataFrames: for each training document, how many of its DISTINCT word
    ``n``-grams also occur anywhere in the benchmark/eval set — the
    eval-decontamination pass every serious training-data pipeline runs
    before a model ships (and before eval numbers mean anything).

    Output: (doc_id, n_hits) for documents with ≥ 1 shared n-gram; a
    downstream gate drops or flags them.

    Scale shape: the benchmark n-gram set is DISTINCT and eval-set-sized
    (thousands of docs in practice → well under the broadcast gate), so the
    training side — the 100 TB side — is never shuffled: n-gram explode,
    broadcast-hash join, map-side partial count.  Above the gate it
    degrades to a sid-keyed shuffle join.  The n-gram ids are the same
    Horner-packed integers the Jaccard/MinHash operators use, so the
    oracle replays them exactly."""
    bs = benchmark_ngram_set(benchmark, n).persist()
    try:
        # localCheckpoint (eager) materializes the result AND cuts lineage,
        # so the benchmark cache can be released before returning — unlike a
        # returned .persist(), which would leak a cached frame per call
        # (bench reruns accumulate them for the session's lifetime)
        out = contamination_probe(docs, bs, n).localCheckpoint()
    finally:
        bs.unpersist()
    return out


def benchmark_ngram_set(benchmark: DataFrame, n: int = CONTAM_NGRAM) -> DataFrame:
    """The DISTINCT word-``n``-gram id set of a benchmark/eval corpus — the
    build-once artifact the contamination probes join against (a deployment
    persists it; ``streaming/documents.contamination_stream`` writes it
    under its checkpoint)."""
    return token_ngram_sets(benchmark, n).select("sid").distinct()


def contamination_probe(docs: DataFrame, benchmark_sids: DataFrame, n: int = CONTAM_NGRAM) -> DataFrame:
    """The shared probe both the batch check and the streaming gate run:
    explode the documents' n-grams, size-gated broadcast join against the
    prepared benchmark sid set, partial-aggregated per-doc count."""
    ts = token_ngram_sets(docs, n)
    return (
        ts.join(broadcast_if_small(benchmark_sids), on="sid")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def pipeline_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: contamination of the train split (buckets
    0-79) against the test split (buckets 90-99) as the stand-in benchmark
    — self-contained on the documents table, deterministic via the split
    hash."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_split_bucket_sql("doc_id"))
    return contamination_check(
        docs.where(bucket < _CONTAM_TRAIN_MAX),
        docs.where(bucket >= _CONTAM_BENCH_MIN),
    )


def _contamination_sql() -> str:
    from dream_spark.functions.features import duck_token_ngram_ids_cte

    bucket = _split_bucket_sql("doc_id")
    return f"""
WITH ng AS ({duck_token_ngram_ids_cte('documents', CONTAM_NGRAM)}),
bmark AS (SELECT DISTINCT sid FROM ng WHERE {bucket} >= {_CONTAM_BENCH_MIN}),
train AS (SELECT doc_id, sid FROM ng WHERE {bucket} < {_CONTAM_TRAIN_MAX})
SELECT t.doc_id, COUNT(*) AS n_hits
FROM train t JOIN bmark b ON t.sid = b.sid
GROUP BY t.doc_id
""".strip()


PIPELINE_CONTAMINATION_SQL = _contamination_sql()


#: repetition-gate thresholds, calibrated so both fire on real tails of
#: THIS corpus (synthetic ~50-token docs: dup-bigram median 0.03 / p90
#: 0.065, top-token median 0.09 / p90 0.14).  Gopher's natural-text rules
#: use the same statistics with looser bounds (e.g. dup-line 0.30,
#: top-2-gram 0.18).
REP_DUP_BIGRAM_MAX = 0.05
REP_TOP_TOKEN_MAX = 0.12
#: the top-token rule only applies above this length: a short all-unique
#: document has top_tok_frac = 1/n by arithmetic, not by repetition
REP_MIN_TOKENS = 20


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality statistics for ANY ``(doc_id,
    text)`` DataFrame: per document, the fraction of bigram occurrences
    that are repeats and the share of the single most frequent token —
    the two cheapest high-signal detectors of boilerplate/spam/looping
    text in a pretraining corpus.

    Output: (doc_id, n_tokens, n_bigrams, n_distinct_bigrams,
    dup_bigram_frac, top_tok_frac, repetitive).

    Scale shape: two doc_id-keyed partial aggregations over the token
    stream (Catalyst reuses the doc_id exchange), one #docs-row join — no
    UDF, no global state.  Fractions are double divisions of exact integer
    counts with the identical formula on both engines."""
    tk = tokens(docs, with_pos=True)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tk.withColumn("nxt", F.lead("tok", 1).over(w))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("b"))
    )
    bgn = bg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("b").alias("n_distinct_bigrams"),
    )
    per_tok = tk.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    tt = per_tok.groupBy("doc_id").agg(
        F.max("c").alias("top_tok_n"), F.sum("c").cast("bigint").alias("n_tokens")
    )
    j = tt.join(bgn, on="doc_id", how="left").na.fill(
        {"n_bigrams": 0, "n_distinct_bigrams": 0}
    )
    dup = F.when(
        F.col("n_bigrams") > 0,
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
        / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    top = F.col("top_tok_n").cast("double") / F.col("n_tokens")
    return j.select(
        "doc_id",
        "n_tokens",
        "n_bigrams",
        "n_distinct_bigrams",
        dup.alias("dup_bigram_frac"),
        top.alias("top_tok_frac"),
        (
            (dup > REP_DUP_BIGRAM_MAX)
            | ((F.col("n_tokens") >= REP_MIN_TOKENS) & (top > REP_TOP_TOKEN_MAX))
        ).alias("repetitive"),
    )


def pipeline_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``repetition_stats`` over documents."""
    return repetition_stats(load_table(spark, sf_dir, "documents"))


PIPELINE_REPETITION_SQL = f"""
WITH toks AS ({duck_tokens_cte("documents", with_pos=True)}),
bg AS (
  SELECT doc_id, b FROM (
    SELECT doc_id, tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
    FROM toks
  ) WHERE b IS NOT NULL
),
bgn AS (SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(DISTINCT b) AS n_distinct_bigrams
        FROM bg GROUP BY doc_id),
per_tok AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
tt AS (SELECT doc_id, MAX(c) AS top_tok_n, CAST(SUM(c) AS BIGINT) AS n_tokens
       FROM per_tok GROUP BY doc_id),
j AS (
  SELECT tt.doc_id, tt.n_tokens, tt.top_tok_n,
         COALESCE(bgn.n_bigrams, 0) AS n_bigrams,
         COALESCE(bgn.n_distinct_bigrams, 0) AS n_distinct_bigrams
  FROM tt LEFT JOIN bgn ON tt.doc_id = bgn.doc_id
)
SELECT doc_id, n_tokens, n_bigrams, n_distinct_bigrams,
       (CASE WHEN n_bigrams > 0
             THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams
             ELSE 0.0 END) AS dup_bigram_frac,
       CAST(top_tok_n AS DOUBLE) / n_tokens AS top_tok_frac,
       ((CASE WHEN n_bigrams > 0
              THEN CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams
              ELSE 0.0 END) > {REP_DUP_BIGRAM_MAX}
        OR (n_tokens >= {REP_MIN_TOKENS}
            AND CAST(top_tok_n AS DOUBLE) / n_tokens > {REP_TOP_TOKEN_MAX})) AS repetitive
FROM j
""".strip()


#: vocabulary size for the driver-contract wrappers (corpus has ~31
#: distinct tokens at any sf, so 20 leaves a real OOV tail)
VOCAB_K = 20


def build_vocab(docs: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Frequency-ranked token vocabulary for ANY ``(doc_id, text)``
    DataFrame: the top-``k`` corpus tokens as (tok, freq, tok_id) with
    dense ids 1..k by (freq DESC, tok ASC) — the deterministic seed
    vocabulary a tokenizer-training or feature-hashing stage starts from.

    Scale shape: one partially-aggregated token count (vocabulary-sized
    shuffle), top-k via TakeOrderedAndProject (no global sort
    materializes), and a ROW_NUMBER over the K SURVIVORS only — the
    single-partition window touches k rows, never the corpus (the
    anti-pattern this library bans is a global rank over the full
    distinct-token set)."""
    tk = tokens(docs)
    freq = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    top = freq.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(k)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    return top.withColumn("tok_id", F.row_number().over(w).cast("bigint"))


def oov_stats(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Per-document out-of-vocabulary statistics against a ``(tok, …)``
    vocabulary table: (doc_id, n_tokens, n_oov, oov_frac) — the coverage
    check run before committing to a tokenizer/vocab.

    The vocabulary is k-sized by construction, so it broadcasts
    unconditionally; the token stream aggregates map-side per doc —
    one #docs-row shuffle."""
    tk = tokens(docs)
    marked = tk.join(
        F.broadcast(vocab.select("tok").withColumn("__in_v", F.lit(1))),
        on="tok",
        how="left",
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0)).cast("bigint").alias("n_oov"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_frac"),
    )


def pipeline_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: top-20 token vocabulary of documents."""
    return build_vocab(load_table(spark, sf_dir, "documents"))


def pipeline_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: per-document OOV stats against the
    corpus's own top-20 vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    return oov_stats(docs, build_vocab(docs))


PIPELINE_VOCAB_SQL = f"""
SELECT tok, freq, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS tok_id
FROM (
  SELECT tok, COUNT(*) AS freq FROM ({duck_tokens_cte()}) GROUP BY tok
  ORDER BY freq DESC, tok LIMIT {VOCAB_K}
)
""".strip()


PIPELINE_OOV_SQL = f"""
WITH toks AS ({duck_tokens_cte()}),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
    ORDER BY freq DESC, tok LIMIT {VOCAB_K}
  )
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_frac
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY doc_id
""".strip()


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data profile for ANY DataFrame — the ingest health check
    every pipeline runs before training on a new dump: (col_name, n_rows,
    n_nulls, n_distinct, min_str, max_str), one row per column.

    min/max compare the STRING form (binary collation on both engines) —
    deliberately: a single engine-agnostic ordering for every type beats a
    per-type ordering the oracle could disagree on (so '10' < '9' for
    numeric columns; the profile is a drift detector, not an aggregate).

    Scale shape: ONE aggregation pass (Catalyst plans the multi-distinct
    via expand — #cols passes over the scan, partial aggregation before
    the shuffle, only one row moves), then a cols-sized stack unpivot."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"__nulls_{c}"),
            F.countDistinct(c).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    a = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return a.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, n_distinct, min_str, max_str)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def pipeline_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: profile of the documents table."""
    return profile(load_table(spark, sf_dir, "documents"))


def _profile_sql(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS col_name,"
        f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
        f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
        f" MIN(CAST({c} AS VARCHAR)) AS min_str,"
        f" MAX(CAST({c} AS VARCHAR)) AS max_str"
        f" FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


PIPELINE_PROFILE_SQL = _profile_sql(
    "documents", ["doc_id", "text", "lang", "source", "n_chars"]
)


#: boilerplate geometry: word-n-gram order and the document-frequency
#: fraction denominator — a gram occurring in ≥ n_docs/BOILER_FRAC_DEN
#: distinct documents is boilerplate (C4/RefinedWeb-style cleaning signal)
BOILER_N = 3
BOILER_FRAC_DEN = 20


def boilerplate_stats(docs: DataFrame, n: int = BOILER_N, frac_den: int = BOILER_FRAC_DEN) -> DataFrame:
    """Per-document cross-corpus boilerplate statistics for ANY ``(doc_id,
    text)`` DataFrame: ``(doc_id, n_grams, n_boiler)`` where ``n_grams``
    counts the document's DISTINCT word ``n``-grams and ``n_boiler`` those
    that occur in at least ``n_docs / frac_den`` distinct documents — the
    C4-style repeated-template signal (navigation bars, license headers,
    ad blocks share n-grams across many pages).  Ratio is left to the
    consumer so the output stays exact-integer for the oracle.

    Scale shape: one (doc_id, gram) distinct shuffle, one partial-agg
    groupBy for gram document frequency; the BOILERPLATE set (grams above
    the threshold) is tiny by construction — a corpus where 5% of grams
    clear n_docs/20 is pathological — so the per-doc flag join
    broadcasts.  ``n_docs`` is a metadata-only count.  Documents shorter
    than ``n`` tokens keep a (doc_id, 0, 0) row via the left join."""
    n_docs = docs.count()
    tk = tokens(docs, with_pos=True)
    w = Window.partitionBy("doc_id").orderBy("pos")
    # window expressions are select-only in Spark: materialize the n-1
    # lookaheads as columns, then filter on the LAST one (non-null last
    # lead ⟺ all earlier leads non-null ⟺ a full n-gram fits)
    lead_cols = [F.lead("tok", i).over(w).alias(f"__t{i}") for i in range(1, n)]
    grams = (
        tk.select("doc_id", "tok", *lead_cols)
        .where(F.col(f"__t{n - 1}").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "tok", *[f"__t{i}" for i in range(1, n)]).alias("g"),
        )
        .distinct()
        # deliberately NOT materialized despite three consumers (dfreq /
        # per_total / per_boiler): measured at sf0.1, localCheckpoint here
        # is 2-5x SLOWER (0.73-0.88 s lazy vs 1.5-4.4 s checkpointed) —
        # the distinct's shuffle files are reused across the consumers at
        # stage level, so only the cheap pre-shuffle map side re-runs, and
        # eagerly writing the corpus-sized gram frame costs more than that
        # recompute.  At 100 TB the same holds a fortiori: the gram frame
        # is the largest intermediate in the query.
    )
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    boiler = dfreq.where(F.col("df") * frac_den >= F.lit(n_docs)).select("g")
    per_total = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    per_boiler = (
        grams.join(F.broadcast(boiler), on="g", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        docs.select("doc_id")
        .join(per_total, on="doc_id", how="left")
        .join(per_boiler, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
        )
    )


def pipeline_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``boilerplate_stats`` over documents."""
    return boilerplate_stats(load_table(spark, sf_dir, "documents"))


PIPELINE_BOILERPLATE_SQL = f"""
WITH toks AS ({duck_tokens_cte(with_pos=True)}),
grams AS (
  SELECT DISTINCT doc_id,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS g
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY LEAD(tok, {BOILER_N - 1}) OVER w IS NOT NULL
),
ndocs AS (SELECT COUNT(*) AS n_docs FROM documents),
dfreq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
boiler AS (SELECT g FROM dfreq CROSS JOIN ndocs WHERE df * {BOILER_FRAC_DEN} >= n_docs),
per_total AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
per_boiler AS (
  SELECT doc_id, COUNT(*) AS n_boiler FROM grams
  WHERE g IN (SELECT g FROM boiler) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per_total.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(per_boiler.n_boiler, 0) AS BIGINT) AS n_boiler
FROM documents d
LEFT JOIN per_total ON per_total.doc_id = d.doc_id
LEFT JOIN per_boiler ON per_boiler.doc_id = d.doc_id
""".strip()


def familiarity_stats(docs: DataFrame) -> DataFrame:
    """Per-document corpus-familiarity score for ANY ``(doc_id, text)``
    DataFrame: ``(doc_id, fam_sum, n_bigrams)`` where ``fam_sum`` is the
    sum over the document's consecutive-token bigrams (bag semantics) of
    each bigram's CORPUS occurrence count — the integer-exact stand-in
    for n-gram LM perplexity filtering (a document of corpus-common
    bigrams scores high; rare/garbled text scores low).  Average is left
    to the consumer so the output stays exact for the oracle.

    Scale shape: bigram corpus counts are one partial-agg groupBy; the
    per-doc join shuffles each bigram occurrence once with its count —
    no collect, no driver state.  Documents with fewer than two tokens
    keep a (doc_id, 0, 0) row via the left join."""
    tk = tokens(docs, with_pos=True)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tk.withColumn("nxt", F.lead("tok", 1).over(w))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bigram"))
        # deliberately NOT materialized despite two consumers — same
        # measured result as boilerplate_stats' gram frame: the map-side
        # recompute is cheaper than eagerly writing the corpus-sized
        # bigram frame (localCheckpoint measured 3x slower at sf0.1)
    )
    counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    per_doc = (
        bg.join(counts, on="bigram")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("fam_sum"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("fam_sum", F.lit(0)).cast("bigint").alias("fam_sum"),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        )
    )


def pipeline_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``familiarity_stats`` over documents."""
    return familiarity_stats(load_table(spark, sf_dir, "documents"))


PIPELINE_FAMILIARITY_SQL = f"""
WITH toks AS ({duck_tokens_cte(with_pos=True)}),
bg AS (
  SELECT doc_id, tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM toks
  QUALIFY bigram IS NOT NULL
),
counts AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram),
per_doc AS (
  SELECT bg.doc_id, SUM(counts.n) AS fam_sum, COUNT(*) AS n_bigrams
  FROM bg JOIN counts USING (bigram) GROUP BY bg.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per_doc.fam_sum, 0) AS BIGINT) AS fam_sum,
       CAST(COALESCE(per_doc.n_bigrams, 0) AS BIGINT) AS n_bigrams
FROM documents d
LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
""".strip()


#: log2 length bucket as ONE shared integer fragment: LENGTH(BIN(n)) - 1 ==
#: floor(log2 n) for n >= 1 on both engines (bin() renders the minimal
#: binary string in Spark SQL and DuckDB alike) — no float log whose
#: rounding could flip a power-of-2 boundary between engines.
_LEN_BUCKET_SQL = "(LENGTH(BIN(n_chars)) - 1)"


#: Gopher/C4-style rule thresholds (integer-exact forms: every ratio rule
#: is cross-multiplied, so no float division reaches the oracle hash)
RULE_MIN_WORDS = 10
RULE_MAX_WORD_CHARS = 15
RULE_MAX_SYMBOL_PCT = 20  # non-alphanumeric-non-space chars ≤ 20% of chars
RULE_MAX_DIGIT_PCT = 20


def quality_rules(docs: DataFrame) -> DataFrame:
    """Gopher/C4-style heuristic rule battery for ANY ``(doc_id, text)``
    DataFrame: per-document 0/1 flags for each rule plus the composite
    gate — the explainable quality filter a curation pipeline runs before
    any model-based scoring (each rule's pass rate is monitorable on its
    own, unlike a single opaque score).

    Rules (all INTEGER-exact — ratios are cross-multiplied):
      r_minwords : ≥ RULE_MIN_WORDS whitespace tokens;
      r_wordlen  : longest token ≤ RULE_MAX_WORD_CHARS chars;
      r_symbol   : non-alphanumeric-non-space chars ≤ 20% of chars;
      r_digit    : digit chars ≤ 20% of chars;
      pass       : every rule holds.

    Scale shape: one token explode with a per-doc partial aggregation
    (count + max length — both map-side combinable) joined back to the
    map-only char-class counters; the join is doc-keyed and 1:1.  Empty
    documents fail r_minwords and keep a row (left join + coalesce)."""
    toks = tokens(docs)
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.max(F.length("tok")).alias("max_tok"),
    )
    base = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", "")).cast("bigint").alias("n_sym"),
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("bigint").alias("n_digit"),
    )
    j = base.join(per_doc, on="doc_id", how="left").na.fill({"n_toks": 0, "max_tok": 0})
    r_minwords = (F.col("n_toks") >= RULE_MIN_WORDS).cast("bigint")
    r_wordlen = (F.col("max_tok") <= RULE_MAX_WORD_CHARS).cast("bigint")
    r_symbol = (F.col("n_sym") * 100 <= F.col("n_chars") * RULE_MAX_SYMBOL_PCT).cast("bigint")
    r_digit = (F.col("n_digit") * 100 <= F.col("n_chars") * RULE_MAX_DIGIT_PCT).cast("bigint")
    return j.select(
        "doc_id",
        r_minwords.alias("r_minwords"),
        r_wordlen.alias("r_wordlen"),
        r_symbol.alias("r_symbol"),
        r_digit.alias("r_digit"),
        (r_minwords + r_wordlen + r_symbol + r_digit == 4).cast("bigint").alias("pass"),
    )


def pipeline_rulegate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: ``quality_rules`` over documents."""
    return quality_rules(load_table(spark, sf_dir, "documents"))


PIPELINE_RULEGATE_SQL = f"""
WITH toks AS ({duck_tokens_cte()}),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_toks, MAX(LENGTH(tok)) AS max_tok
  FROM toks GROUP BY doc_id
),
base AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS BIGINT) AS n_chars,
         CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_sym,
         CAST(LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit
  FROM documents
),
j AS (
  SELECT b.doc_id, b.n_chars, b.n_sym, b.n_digit,
         COALESCE(p.n_toks, 0) AS n_toks, COALESCE(p.max_tok, 0) AS max_tok
  FROM base b LEFT JOIN per_doc p ON p.doc_id = b.doc_id
)
SELECT doc_id,
       CAST(n_toks >= {RULE_MIN_WORDS} AS BIGINT) AS r_minwords,
       CAST(max_tok <= {RULE_MAX_WORD_CHARS} AS BIGINT) AS r_wordlen,
       CAST(n_sym * 100 <= n_chars * {RULE_MAX_SYMBOL_PCT} AS BIGINT) AS r_symbol,
       CAST(n_digit * 100 <= n_chars * {RULE_MAX_DIGIT_PCT} AS BIGINT) AS r_digit,
       CAST((CAST(n_toks >= {RULE_MIN_WORDS} AS INT)
           + CAST(max_tok <= {RULE_MAX_WORD_CHARS} AS INT)
           + CAST(n_sym * 100 <= n_chars * {RULE_MAX_SYMBOL_PCT} AS INT)
           + CAST(n_digit * 100 <= n_chars * {RULE_MAX_DIGIT_PCT} AS INT)) = 4 AS BIGINT) AS pass
FROM j
""".strip()


def length_histogram(docs: DataFrame) -> DataFrame:
    """Doc-length distribution per language in log2 buckets — the
    first-look corpus diagnostic (truncation cliffs, short-doc spam, and
    per-language length skew all show up here before any curation
    threshold is chosen).  Map-only bucket assignment + one
    partial-aggregated shuffle keyed by (lang, bucket): at 100 TB the
    shuffle carries #langs × ~40 bucket rows per partition, never docs."""
    return (
        docs.where(F.col("n_chars") >= 1)
        .groupBy("lang", F.expr(_LEN_BUCKET_SQL).cast("bigint").alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def pipeline_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: log2 length histogram of the documents."""
    return length_histogram(load_table(spark, sf_dir, "documents"))


PIPELINE_LENGTHS_SQL = f"""
SELECT lang, CAST({_LEN_BUCKET_SQL} AS BIGINT) AS len_bucket,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE n_chars >= 1
GROUP BY lang, {_LEN_BUCKET_SQL}
""".strip()


def dup_rate_by_source(docs: DataFrame) -> DataFrame:
    """Exact-duplicate pressure per source: (source, n_docs, n_distinct,
    n_dups) — the triage table that decides WHERE dedup effort goes (a
    source at 40% dup rate gets cleaned; one at 0.1% gets passed through).
    Distinctness is counted over the SHA-256 content digest, not the text:
    the digest is computed map-side, so the distinct-aggregation shuffle
    moves 32-byte digests instead of document bodies — the only shape that
    survives 100 TB (same posture as multimodal payload dedup)."""
    digest = F.sha2(F.col("text"), 256)
    return (
        docs.select("source", digest.alias("digest"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("digest").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct")).alias("n_dups"),
        )
    )


def pipeline_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: per-source exact-dup stats."""
    return dup_rate_by_source(load_table(spark, sf_dir, "documents"))


# DuckDB sha256(VARCHAR) hashes the identical UTF-8 bytes Spark's
# sha2(text, 256) does, and both render lowercase hex — value-equal digests
PIPELINE_DUP_RATE_SQL = """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT sha256(text)) AS n_distinct,
       COUNT(*) - COUNT(DISTINCT sha256(text)) AS n_dups
FROM documents GROUP BY source
""".strip()


# --------------------------------------------------------------------------
# unigram surprisal: integer-exact LM quality score
# --------------------------------------------------------------------------
def surprisal_stats(docs: DataFrame) -> DataFrame:
    """Per-document unigram-LM surprisal over ANY ``(doc_id, text)``
    DataFrame: ``(doc_id, n_tokens, sum_surprisal, avg_surprisal_x100)``
    — the quality signal behind perplexity-based corpus filters (rare-
    token-heavy docs score high; boilerplate scores low), kept INTEGER-
    EXACT so the cross-engine hash holds: per-token surprisal is
    ``floor(log2(total/freq))`` computed as ``length(bin(total div
    freq)) − 1`` (binary digit count — no libm, whose last-ulp log()
    differences across engines would poison a float average), and the
    doc average ships as an exact ``(100·sum) div n`` fixed-point.

    Shape at 100 TB: token counts are one partial-aggregated shuffle
    (map-side combine bounds it by vocab per partition); the scoring join
    is tokens ⋈ vocab — the vocab side broadcasts when provably small,
    else it's a standard shuffle join whose stop-word skew AQE's skew
    split handles (values this frequent are LOW-surprisal, so a salted
    variant changes nothing semantically); the per-doc rollup is the
    second and final shuffle."""
    tk = tokens(docs)
    tf = tk.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    tot = tf.groupBy().agg(F.sum("freq").cast("bigint").alias("total"))
    scored = (
        tk.join(broadcast_if_small(tf), on="tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr("CAST(length(bin(total div freq)) - 1 AS BIGINT)").alias("surp"))
    )
    per = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("surp").cast("bigint").alias("sum_surprisal"),
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "sum_surprisal",
        F.expr("CAST((100 * sum_surprisal) div n_tokens AS BIGINT)").alias(
            "avg_surprisal_x100"
        ),
    )


def pipeline_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper: unigram surprisal scores over documents."""
    return surprisal_stats(load_table(spark, sf_dir, "documents"))


PIPELINE_SURPRISAL_SQL = f"""
WITH tk AS ({duck_tokens_cte()}),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM tk GROUP BY tok),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM tf),
sc AS (
  SELECT doc_id, CAST(length(bin(total // freq)) - 1 AS BIGINT) AS surp
  FROM tk JOIN tf USING (tok) CROSS JOIN tot
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(surp) AS BIGINT) AS sum_surprisal
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_surprisal,
       CAST((100 * sum_surprisal) // n_tokens AS BIGINT) AS avg_surprisal_x100
FROM per
""".strip()


QUERIES = {
    "pipeline_split": pipeline_split,
    "pipeline_profile": pipeline_profile,
    "pipeline_sample": pipeline_sample,
    "pipeline_sample_alloc": pipeline_sample_alloc,
    "pipeline_sample_weighted": pipeline_sample_weighted,
    "pipeline_tfidf": pipeline_tfidf,
    "pipeline_bigrams": pipeline_bigrams,
    "pipeline_curate": pipeline_curate,
    "pipeline_canonicalize": pipeline_canonicalize,
    "pipeline_rulegate": pipeline_rulegate,
    "pipeline_chunks": pipeline_chunks,
    "pipeline_shards": pipeline_shards,
    "pipeline_mixture": pipeline_mixture,
    "pipeline_contamination": pipeline_contamination,
    "pipeline_repetition": pipeline_repetition,
    "pipeline_vocab": pipeline_vocab,
    "pipeline_oov": pipeline_oov,
    "pipeline_boilerplate": pipeline_boilerplate,
    "pipeline_familiarity": pipeline_familiarity,
    "pipeline_lengths": pipeline_lengths,
    "pipeline_dup_rate": pipeline_dup_rate,
    "pipeline_surprisal": pipeline_surprisal,
}

ORACLES = {
    "pipeline_split": PIPELINE_SPLIT_SQL,
    "pipeline_profile": PIPELINE_PROFILE_SQL,
    "pipeline_sample": PIPELINE_SAMPLE_SQL,
    "pipeline_sample_alloc": PIPELINE_SAMPLE_ALLOC_SQL,
    "pipeline_sample_weighted": PIPELINE_SAMPLE_WEIGHTED_SQL,
    "pipeline_tfidf": PIPELINE_TFIDF_SQL,
    "pipeline_bigrams": PIPELINE_BIGRAMS_SQL,
    "pipeline_curate": PIPELINE_CURATE_SQL,
    "pipeline_canonicalize": PIPELINE_CANONICALIZE_SQL,
    "pipeline_rulegate": PIPELINE_RULEGATE_SQL,
    "pipeline_chunks": PIPELINE_CHUNKS_SQL,
    "pipeline_shards": PIPELINE_SHARDS_SQL,
    "pipeline_mixture": PIPELINE_MIXTURE_SQL,
    "pipeline_contamination": PIPELINE_CONTAMINATION_SQL,
    "pipeline_repetition": PIPELINE_REPETITION_SQL,
    "pipeline_vocab": PIPELINE_VOCAB_SQL,
    "pipeline_oov": PIPELINE_OOV_SQL,
    "pipeline_boilerplate": PIPELINE_BOILERPLATE_SQL,
    "pipeline_familiarity": PIPELINE_FAMILIARITY_SQL,
    "pipeline_lengths": PIPELINE_LENGTHS_SQL,
    "pipeline_dup_rate": PIPELINE_DUP_RATE_SQL,
    "pipeline_surprisal": PIPELINE_SURPRISAL_SQL,
}
