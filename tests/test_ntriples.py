"""N-Triples ingester: parse, hash-encode, query, decode round-trip."""

from __future__ import annotations

import pytest

from dream_spark.plans.translator import translate
from dream_spark.plans.sparql import parse_sparql
from dream_spark.sources.triples import TripleStore

NT = """\
# a tiny graph
<http://ex/alice> <http://ex/knows> <http://ex/bob> .
<http://ex/bob> <http://ex/knows> <http://ex/carol> .
<http://ex/alice> <http://ex/name> "Alice" .
<http://ex/bob> <http://ex/name> "Bob" .
<http://ex/carol> <http://ex/name> "Carol" .
_:b0 <http://ex/name> "Anon"@en .

<http://ex/alice> <http://ex/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
"""


@pytest.fixture(scope="module")
def nt_store(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("nt") / "g.nt"
    p.write_text(NT)
    return TripleStore.from_ntriples(spark, str(p), validate=True)


def test_parse_counts(nt_store):
    assert nt_store.triples.count() == 7
    # distinct terms: alice bob carol b0 knows name age "Alice" "Bob"
    # "Carol" "Anon" "30"
    assert nt_store.dictionary.count() == 12


def test_query_and_decode(nt_store):
    q = parse_sparql(
        "select ?A ?B where { ?A <http://ex/knows> ?B }"
    )
    rows = translate(nt_store, q, None, decode=True).collect()
    got = sorted((r["A"], r["B"]) for r in rows)
    assert got == [
        ("http://ex/alice", "http://ex/bob"),
        ("http://ex/bob", "http://ex/carol"),
    ]


def test_constant_resolution_via_dict(nt_store):
    q = parse_sparql("select ?N where { <http://ex/alice> <http://ex/name> ?N }")
    rows = translate(nt_store, q, None, decode=True).collect()
    assert [r["N"] for r in rows] == ["Alice"]


def test_literal_suffixes_stripped(nt_store):
    q = parse_sparql("select ?X where { ?X <http://ex/name> <Anon> }")
    rows = translate(nt_store, q, None).collect()
    assert len(rows) == 1


def test_unknown_constant_empty(nt_store):
    """A term absent from the N-Triples dictionary matches nothing — the
    UNKNOWN_ID sentinel, not an error (same contract as the TPC-H store:
    tests/test_sparql.py::test_unknown_constant_matches_nothing)."""
    q = parse_sparql("select ?X where { ?X <http://ex/name> <NoSuch> }")
    assert translate(nt_store, q, None).count() == 0


def test_write_roundtrip(nt_store, spark, tmp_path_factory):
    """write_ntriples → load_ntriples must preserve the triple multiset
    (modulo the datatype/lang tags the data model deliberately drops)."""
    from dream_spark.sources.ntriples import write_ntriples

    out = str(tmp_path_factory.mktemp("ntout") / "g")
    write_ntriples(nt_store, out, max_files=1)
    back = TripleStore.from_ntriples(spark, out, validate=True)

    def lex_triples(store):
        d = store.dictionary
        t = store.triples
        from pyspark.sql import functions as F

        for slot in ("s", "p", "o"):
            lex = d.select(F.col("id").alias(slot), F.col("lexical").alias(f"{slot}_lex"))
            t = t.join(lex, on=slot).drop(slot)
        return sorted(map(tuple, t.collect()))

    assert lex_triples(back) == lex_triples(nt_store)


def test_echar_escapes_roundtrip(spark, tmp_path):
    """Literals with ECHAR escapes (\\n \\t \\r \\" \\\\) decode to the true
    string and re-encode on export — read->write->read is a fixed point;
    and a literal backslash before 'n' is NEVER misread as a newline."""
    from dream_spark.sources.ntriples import load_ntriples, write_ntriples

    src = tmp_path / "esc.nt"
    src.write_text(
        '<a:s> <a:p> "line1\\nline2" .\n'
        '<a:s> <a:p> "tab\\there" .\n'
        '<a:s> <a:p> "back\\\\nslash" .\n'
    )
    st = load_ntriples(spark, str(src))
    lex = {r["lexical"] for r in st.dictionary.collect()}
    assert "line1\nline2" in lex and "tab\there" in lex
    assert "back\\nslash" in lex  # literal backslash + n, NOT a newline
    out = tmp_path / "out"
    write_ntriples(st, str(out))
    st2 = load_ntriples(spark, str(out))
    assert {tuple(r) for r in st2.triples.collect()} == {
        tuple(r) for r in st.triples.collect()
    }


def test_literal_subject_rejected_and_iri_with_gt_quoted(spark, tmp_path):
    """A literal in subject position must not parse as a triple; an
    IRI-looking lexical containing '>' must export as a QUOTED literal (a
    bracketed form would be unparseable and silently lost)."""
    from dream_spark.sources.ntriples import load_ntriples, write_ntriples
    from dream_spark.sources.triples import TripleStore
    from pyspark.sql import functions as F

    src = tmp_path / "bad.nt"
    src.write_text('"lit" <a:p> <a:o> .\n<a:s> <a:p> <a:o> .\n')
    st = load_ntriples(spark, str(src))
    assert st.triples.count() == 1  # the literal-subject line is rejected
    # build a store whose OBJECT lexical is IRI-like but contains '>' —
    # it must export as a quoted literal (bracketed would be unparseable)
    d = spark.createDataFrame([(1, "a:s"), (2, "a:p"), (3, "a:b>c")], "id long, lexical string")
    t = spark.createDataFrame([(1, 2, 3)], "s long, p long, o long")
    out = tmp_path / "gt"
    write_ntriples(TripleStore(spark, t, d, resolver=None), str(out))
    st2 = load_ntriples(spark, str(out))
    assert st2.triples.count() == 1  # survived as a quoted literal
    assert "a:b>c" in {r["lexical"] for r in st2.dictionary.collect()}


def test_write_ntriples_fails_fast_on_missing_dict_id(spark, tmp_path):
    """Triples referencing ids absent from the dictionary are a store
    integrity error: export must raise, not silently emit malformed lines
    that a reader then silently drops."""
    import pytest as _pytest

    from dream_spark.sources.ntriples import write_ntriples
    from dream_spark.sources.triples import TripleStore

    d = spark.createDataFrame([(1, "a:s"), (2, "a:p")], "id long, lexical string")
    t = spark.createDataFrame([(1, 2, 999)], "s long, p long, o long")  # 999 unknown
    with _pytest.raises(ValueError):
        write_ntriples(TripleStore(spark, t, d, resolver=None), str(tmp_path / "x"))


def test_bare_lexical_subject_predicate_roundtrip(spark, tmp_path):
    """A store whose terms are NOT IRI-shaped (this repo's bare
    ``inRegion``-style vocabulary) must still export VALID N-Triples:
    subject/predicate slots mint <urn:x-lex:TERM> (literals are illegal
    there), and load_ntriples strips the namespace back off — the
    roundtrip preserves the exact lexicals.  Pre-r6 the writer emitted a
    quoted literal in the predicate slot, which the strict reader then
    silently dropped: a written graph read back EMPTY."""
    from dream_spark.sources.ntriples import load_ntriples, write_ntriples
    from dream_spark.sources.triples import TripleStore

    triples = spark.createDataFrame([(1, 2, 3), (4, 2, 5)], "s long, p long, o long")
    dict_df = spark.createDataFrame(
        [(1, "alpha:1"), (2, "linksTo"), (3, "plain words"), (4, "alpha:4"), (5, "beta:5")],
        "id long, lexical string",
    )
    st = TripleStore(spark, triples, dict_df, resolver=None)
    out = str(tmp_path / "bare.nt")
    write_ntriples(st, out, max_files=1)
    nt = load_ntriples(spark, out)
    assert nt.triples.count() == 2
    lex = {r["lexical"] for r in nt.dictionary.collect()}
    assert "linksTo" in lex          # namespace stripped on the way in
    assert "plain words" in lex      # object literal with a space survives
    assert not any(x.startswith("urn:x-lex:") for x in lex)


def test_unexportable_subject_raises(spark, tmp_path):
    """A subject lexical that cannot be an IRIREF (embedded whitespace)
    has no valid N-Triples rendering — the writer must fail fast, not
    emit a line the reader will silently drop."""
    import pytest as _pytest

    from dream_spark.sources.ntriples import write_ntriples
    from dream_spark.sources.triples import TripleStore

    triples = spark.createDataFrame([(1, 2, 3)], "s long, p long, o long")
    dict_df = spark.createDataFrame(
        [(1, "has space"), (2, "p:ok"), (3, "o")], "id long, lexical string"
    )
    st = TripleStore(spark, triples, dict_df, resolver=None)
    with _pytest.raises(ValueError, match="cannot be rendered"):
        write_ntriples(st, str(tmp_path / "bad.nt"), max_files=1)


def test_reserved_namespace_lexicals_roundtrip(spark, tmp_path):
    """A lexical that GENUINELY starts with urn:x-lex: must survive the
    roundtrip: the writer doubles the reserved prefix (every slot), the
    reader strips exactly one layer — without the doubling, loading our
    own export would corrupt the term to its suffix."""
    from dream_spark.sources.ntriples import load_ntriples, write_ntriples
    from dream_spark.sources.triples import TripleStore

    triples = spark.createDataFrame([(1, 2, 3)], "s long, p long, o long")
    dict_df = spark.createDataFrame(
        [(1, "urn:x-lex:subject"), (2, "linksTo"), (3, "urn:x-lex:object")],
        "id long, lexical string",
    )
    st = TripleStore(spark, triples, dict_df, resolver=None)
    out = str(tmp_path / "reserved.nt")
    write_ntriples(st, out, max_files=1)
    # on disk: doubled prefix for the genuine terms, single for the minted
    import glob

    line = [
        ln
        for f in glob.glob(out + "/part*")
        if not f.endswith(".crc")
        for ln in open(f).read().splitlines()
    ][0]
    assert "<urn:x-lex:urn:x-lex:subject>" in line
    assert "<urn:x-lex:linksTo>" in line
    nt = load_ntriples(spark, out)
    lex = {r["lexical"] for r in nt.dictionary.collect()}
    assert lex == {"urn:x-lex:subject", "linksTo", "urn:x-lex:object"}


def test_iriref_illegal_object_renders_as_literal(spark, tmp_path):
    """An IRI-shaped object containing an IRIREF-illegal character (a
    double quote) must render as an escaped literal, not an invalid
    bracketed IRI a conformant parser would reject."""
    from dream_spark.sources.ntriples import load_ntriples, write_ntriples
    from dream_spark.sources.triples import TripleStore

    triples = spark.createDataFrame([(1, 2, 3)], "s long, p long, o long")
    dict_df = spark.createDataFrame(
        [(1, "a:subj"), (2, "b:pred"), (3, 'c:has"quote')], "id long, lexical string"
    )
    st = TripleStore(spark, triples, dict_df, resolver=None)
    out = str(tmp_path / "illegal.nt")
    write_ntriples(st, out, max_files=1)
    nt = load_ntriples(spark, out)
    lex = {r["lexical"] for r in nt.dictionary.collect()}
    assert 'c:has"quote' in lex  # literal-escaped roundtrip, not <c:has"quote>


def test_blank_node_labels_outside_grammar_take_the_urn_path(spark, tmp_path):
    """An empty blank label ``_:`` (or one with grammar-illegal chars) has
    no valid BLANK_NODE_LABEL rendering — pre-review the writer emitted it
    raw and the strict reader silently dropped the line (1 written, 0 read
    back).  Such labels now take the urn minting (subject) / literal form
    (object) and round-trip losslessly; LEGAL labels still pass through."""
    from dream_spark.sources.ntriples import load_ntriples, write_ntriples
    from dream_spark.sources.triples import TripleStore

    triples = spark.createDataFrame(
        [(1, 2, 3), (4, 2, 5)], "s long, p long, o long"
    )
    dict_df = spark.createDataFrame(
        [(1, "_:"), (2, "p:link"), (3, "_:end."), (4, "_:ok1"), (5, "x:o")],
        "id long, lexical string",
    )
    st = TripleStore(spark, triples, dict_df, resolver=None)
    out = str(tmp_path / "blank.nt")
    write_ntriples(st, out, max_files=1)
    nt = load_ntriples(spark, out)
    assert nt.triples.count() == 2  # nothing silently dropped
    lex = {r["lexical"] for r in nt.dictionary.collect()}
    assert lex == {"_:", "p:link", "_:end.", "_:ok1", "x:o"}
    import glob

    text = "".join(
        open(f).read() for f in glob.glob(out + "/part*") if not f.endswith(".crc")
    )
    assert "<urn:x-lex:_:>" in text     # empty label minted, not raw
    assert "_:ok1 " in text             # legal label passes through raw
