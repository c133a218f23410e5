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


def test_unknown_constant_raises(nt_store):
    q = parse_sparql("select ?X where { ?X <http://ex/name> <NoSuch> }")
    with pytest.raises(KeyError):
        translate(nt_store, q, None)


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
