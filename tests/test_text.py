"""Text-analysis operators vs DuckDB oracle."""

from __future__ import annotations

import pytest

from dream_spark.operators import text as T
from dream_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(T.QUERIES))
def test_text_oracle(spark, duck, name):
    assert_oracle_match(T.QUERIES[name](spark, SF_DIR), duck, T.ORACLES[name])


def test_fingerprint_is_order_sensitive(spark):
    """Permuting token order must change the fingerprint (it is positional,
    not a bag hash)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma"), Row(doc_id=2, text="gamma beta alpha")]
    )
    df.createOrReplaceTempView("___tmp")
    from dream_spark.functions.features import tokens
    from dream_spark.functions.hashing import MERSENNE_P
    from pyspark.sql import functions as F
    from dream_spark.operators.text import _pos_weight_sql
    from dream_spark.functions.features import token_id_sql

    tk = tokens(df, with_pos=True)
    term = F.expr(f"({token_id_sql('tok')} % 65536) * {_pos_weight_sql('pos')}")
    fps = {
        r["doc_id"]: r["fp"]
        for r in tk.groupBy("doc_id").agg((F.sum(term) % MERSENNE_P).alias("fp")).collect()
    }
    assert fps[1] != fps[2]


def test_text_knn_self_similarity_and_shape(spark):
    """Raw-text similarity search: per-query exactly k ranked neighbors,
    cosine in [-1, 1], and a duplicated document is its near-identical
    twin's top neighbor (cos == 1 for identical token bags)."""
    from pyspark.sql import functions as F

    from dream_spark.operators.text import TEXT_KNN_K, text_knn
    from tests.conftest import SF_DIR

    out = text_knn(spark, SF_DIR)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert -1.0000001 <= r["cos"] <= 1.0000001
    assert all(len(v) == TEXT_KNN_K for v in per_q.values())


def test_redact_scrubs_injected_pii(spark):
    """Injected emails/URLs/phone numbers disappear; clean rows untouched."""
    from dream_spark.operators.text import redact

    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or visit https://example.com/x?q=1 now"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact(df).collect()}
    assert rows[1]["text_clean"] == "contact <EMAIL> or visit <URL> now"
    assert rows[1]["n_redactions"] == 2
    assert rows[2]["text_clean"] == "call <PHONE> today"
    assert rows[2]["n_redactions"] == 1
    assert rows[3]["text_clean"] == "nothing sensitive here"
    assert rows[3]["n_redactions"] == 0


def test_redact_nested_spans_count_once(spark):
    """An email inside a URL is ONE redacted span: counts run against the
    progressively-cleaned text, so nested matches are not double-counted."""
    from dream_spark.operators.text import redact

    df = spark.createDataFrame(
        [(1, "see https://a@b.co/path now")], "doc_id long, text string"
    )
    r = redact(df).collect()[0]
    assert r["n_redactions"] == 1
    assert "<URL>" in r["text_clean"] and "<EMAIL>" not in r["text_clean"]


def test_features_empty_text_yields_null_ratios_not_crash(spark):
    """Spark 4's default ANSI mode throws DIVIDE_BY_ZERO on 0-char docs
    without the guard; DuckDB's double division yields NULL — both engines
    must return NULL ratios."""
    docs = spark.createDataFrame([(1, "hello world"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in T.features_of(docs).collect()}
    assert rows[2]["alpha_ratio"] is None and rows[2]["digit_ratio"] is None
    assert rows[1]["alpha_ratio"] is not None


def test_fingerprint_survives_huge_document(spark):
    """Per-term mod-P reduction: ~5k max-weight tokens overflowed int64
    under the old unreduced sum (ANSI ARITHMETIC_OVERFLOW)."""
    big = " ".join(["zzzzzzzz"] * 300_000)
    docs = spark.createDataFrame([(1, big)], "doc_id long, text string")
    row = T.fingerprint_of(docs).collect()[0]
    assert 0 <= row["fingerprint"] < 2_147_483_647


def test_shingle_kernel_matches_sql_pack_on_cjk():
    """The kernel must apply the mod-P reduction at every Horner step like
    shingle_id_sql — codepoints >= U+8000 diverge without it."""
    import duckdb

    from dream_spark.functions.features import shingle_id_sql
    from dream_spark.functions.textkernels import _doc_sids

    # Not covered: characters whose case mapping itself differs between
    # engines (e.g. İ: DuckDB lowers to 'i', Java/Python to 'i̇') — that
    # divergence is in lower(), not the pack, and affects the SQL explode
    # paths identically
    for text in ["高高高", "안녕하세요", "abc高x"]:
        kernel = sorted(int(x) for x in _doc_sids(text, distinct=True))
        con = duckdb.connect()
        con.execute("CREATE TABLE d AS SELECT ? AS text", [text])
        sql = (
            f"SELECT DISTINCT {shingle_id_sql('sh')} AS sid FROM ("
            f"  SELECT unnest([substr(lower(text), CAST(i AS INT), 3)"
            f"  FOR i IN range(1, length(text) - 1)]) AS sh FROM d"
            f"  WHERE length(text) >= 3) ORDER BY sid"
        )
        oracle = [r[0] for r in con.execute(sql).fetchall()]
        assert kernel == oracle, text


def test_winnow_coverage_guarantee(spark):
    """The winnowing guarantee, checked directly: selected fingerprints are
    a subset of each doc's k-gram hashes, density is well below 1 (the
    point of winnowing), and for a document pair constructed to share a
    long token run, the selected sets intersect."""
    from dream_spark.operators.text import WINNOW_K, WINNOW_W, winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [
            (1, "xx yy " + run + " zz qq"),
            (2, "completely different prefix words here " + run),
            (3, "no overlap with anything else at all whatsoever today"),
        ],
        "doc_id long, text string",
    )
    sel: dict = {}
    for r in winnow_fingerprints(docs).collect():
        sel.setdefault(r["doc_id"], set()).add(r["fp"])
    assert sel[1] & sel[2], "shared long run must yield a shared fingerprint"
    # doc 3: 9 tokens -> 7 grams < w full-window requirement -> no
    # selections at all (winnowing needs >= w+k-1 tokens), and certainly
    # no overlap with the others
    assert not (sel.get(3, set()) & sel[1]) and not (sel.get(3, set()) & sel[2])
    # density: far fewer selections than grams (expected ~2/(w+1))
    n_tokens = len(("xx yy " + run + " zz qq").split())
    n_grams = n_tokens - WINNOW_K + 1
    assert len(sel[1]) < n_grams / 2


# ---------------------------------------------------------------------------
# BM25 (quantized integer form)
# ---------------------------------------------------------------------------
def test_bm25_matches_python_reference(spark):
    """Integer BM25 scores replay exactly against a pure-Python mirror of
    the quantized formula on a hand-built corpus."""
    rows = [
        (0, "apple banana apple cherry"),
        (1, "apple apple apple apple banana"),
        (2, "banana cherry durian durian"),
        (3, "cherry cherry cherry apple"),
        (4, "durian elderberry fig grape"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in T.bm25_topk(docs, n_queries=1, k=10).collect()
    }
    # python mirror
    toks = {d: t.split() for d, t in rows}
    n_docs = len(rows)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) // n_docs
    df_ = {}
    for t in toks.values():
        for w in set(t):
            df_[w] = df_.get(w, 0) + 1
    expect = {}
    for nb in range(1, n_docs):
        s = 0
        for w in set(toks[0]):
            tf = toks[nb].count(w)
            if tf == 0:
                continue
            idf = min(
                T.BM25_IDF_Q * (2 * (n_docs - df_[w]) + 1) // (2 * df_[w] + 1),
                T.BM25_IDF_CAP,
            )
            sat = (44 * tf * avgdl * T.BM25_SAT_Q) // (
                20 * tf * avgdl + 6 * avgdl + 18 * dl[nb]
            )
            s += idf * sat
        if s > 0:
            expect[(0, nb)] = s
    assert got == expect


def test_bm25_rank_contract(spark):
    """Self never retrieved; ranks are 1..k dense per query; scores
    non-increasing within a query."""
    docs = load_table(spark, SF_DIR, "documents")
    rows = T.bm25_topk(docs).collect()
    assert rows and all(r["query_id"] != r["neighbor_id"] for r in rows)
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_bm25_served_matches_inline(spark):
    """The persisted-index serve path returns exactly the inline result —
    the parquet roundtrip preserves every int64 statistic and the scoring
    join is the shared definition."""
    inline = sorted(map(tuple, T.text_bm25(spark, SF_DIR).collect()))
    served = sorted(map(tuple, T.text_bm25_served(spark, SF_DIR).collect()))
    assert inline == served and len(inline) > 0


def test_bm25_served_matches_inline_on_random_corpora(spark, tmp_path):
    """Index build + serve over SYNTHETIC corpora (unicode, duplicate
    tokens, empty and token-free documents, singleton corpus) must equal
    the inline scorer exactly — the parquet roundtrip and the IN-pushdown
    pruning may never change a score."""
    corpora = [
        [(0, "alpha beta beta"), (1, "beta gamma"), (2, ""), (3, "??!!"), (4, "alpha gamma delta")],
        [(0, "höhe straße héllo"), (1, "hohe strasse hello"), (2, "höhe höhe")],
        [(0, "solo")],
        [(0, "x " * 200), (1, "x y"), (2, "y z"), (3, "z x")],
    ]
    for i, rows in enumerate(corpora):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        path = str(tmp_path / f"idx{i}")
        T.save_postings_index_from(spark, docs, path)
        inline = sorted(map(tuple, T.bm25_topk(docs, n_queries=1, k=10).collect()))
        served = sorted(map(tuple, T.bm25_serve(spark, path, n_queries=1, k=10).collect()))
        assert inline == served, (i, inline[:3], served[:3])


def test_bm25_lookup_selects_rarest_terms(spark, tmp_path):
    """The narrow lookup probes exactly the n rarest distinct terms of the
    query doc (df asc, tok asc tiebreak) and scores them with the shared
    quantized formula — verified against a pure-Python mirror."""
    rows = [
        (0, "apple banana cherry"),
        (1, "apple banana"),
        (2, "apple"),
        (3, "banana durian"),
    ]
    # dfs: apple=3, banana=3, cherry=1 -> rarest 2 of doc 0 = {cherry, apple}
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "idx")
    T.save_postings_index_from(spark, docs, path)
    got = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in T.bm25_lookup(spark, path, docs, query_doc=0, n_terms=2, k=10).collect()
    }
    qterms = {"cherry", "apple"}
    toks = {d: t.split() for d, t in rows}
    n_docs = len(rows)
    dl = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dl.values()) // n_docs
    df_: dict = {}
    for t in toks.values():
        for w in set(t):
            df_[w] = df_.get(w, 0) + 1
    expect = {}
    for nb in range(1, n_docs):
        s = 0
        for w in qterms:
            tf = toks[nb].count(w)
            if tf == 0:
                continue
            idf = min(
                T.BM25_IDF_Q * (2 * (n_docs - df_[w]) + 1) // (2 * df_[w] + 1),
                T.BM25_IDF_CAP,
            )
            sat = (44 * tf * avgdl * T.BM25_SAT_Q) // (
                20 * tf * avgdl + 6 * avgdl + 18 * dl[nb]
            )
            s += idf * sat
        if s > 0:
            expect[(0, nb)] = s
    assert got == expect and len(got) == 2  # docs 1 and 2 share apple; 3 shares nothing


def test_bm25_serve_empty_and_termless_query(spark, tmp_path):
    """A corpus whose query doc has no tokens (or no corpus at all after
    tokenization) serves an EMPTY result, not a crash."""
    docs = spark.createDataFrame([(0, "!!!"), (1, "alpha beta")], "doc_id long, text string")
    path = str(tmp_path / "idx")
    T.save_postings_index_from(spark, docs, path)
    assert T.bm25_serve(spark, path, n_queries=1).count() == 0
