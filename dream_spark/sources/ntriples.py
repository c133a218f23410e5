"""N-Triples ingester — the generic loader for the triple store (replaces
the reference's RDF-3X database build step, README.md:36-37, with a
Spark-native one; SURVEY.md §7.2 M0).

Dictionary encoding strategy: term id = ``xxhash64(lexical)``.  A hash id is
computed locally per row with no coordination — the scalable choice at
100 TB, where the classic ROW_NUMBER-over-sorted-terms dictionary would
serialize the distinct-term set through one partition.  64-bit collisions
(~2^-64 per pair) are detectable by ``validate=True`` (one groupBy over the
dictionary) for pipelines that want the guarantee.

Grammar: one triple per line, ``<iri> | _:blank`` subject, ``<iri>``
predicate, ``<iri> | _:blank | "literal"[^^<dt> | @lang]`` object.
``#`` comment lines and blank lines are skipped.  IRIs are stored without
angle brackets, literals without quotes/suffix (datatype/lang tags are not
modeled — the reference's value space is opaque strings either way,
SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TERM = r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w\-]+)?)'
NT_PATTERN = rf"^\s*{_TERM}\s+{_TERM}\s+{_TERM}\s*\.\s*$"


def _lexical(col):
    """Strip IRI brackets / literal quotes+suffix from a raw N-Triples term."""
    c = F.col(col)
    return (
        F.when(c.startswith("<"), F.regexp_extract(c, r"^<(.*)>$", 1))
        .when(c.startswith('"'), F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"', 1))
        .otherwise(c)
    )


def parse_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """(s_lex, p_lex, o_lex) — parsed, bracket/quote-stripped lexicals."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.regexp_extract("value", NT_PATTERN, 1).alias("s_raw"),
        F.regexp_extract("value", NT_PATTERN, 2).alias("p_raw"),
        F.regexp_extract("value", NT_PATTERN, 3).alias("o_raw"),
    ).where(F.col("s_raw") != "")
    return parsed.select(
        _lexical("s_raw").alias("s_lex"),
        _lexical("p_raw").alias("p_lex"),
        _lexical("o_raw").alias("o_lex"),
    )


def encode(parsed: DataFrame, validate: bool = False):
    """parsed lexical triples -> (triples(s,p,o) BIGINT, dict(id, lexical)).

    Row-local hash encoding: zero shuffles for the triples side; the
    dictionary is one distinct over the term union."""
    triples = parsed.select(
        F.xxhash64("s_lex").alias("s"),
        F.xxhash64("p_lex").alias("p"),
        F.xxhash64("o_lex").alias("o"),
    )
    terms = (
        parsed.select(F.col("s_lex").alias("lexical"))
        .unionAll(parsed.select(F.col("p_lex").alias("lexical")))
        .unionAll(parsed.select(F.col("o_lex").alias("lexical")))
        .distinct()
    )
    dictionary = terms.select(F.xxhash64("lexical").alias("id"), "lexical")
    if validate:
        dup = dictionary.groupBy("id").count().where(F.col("count") > 1)
        if dup.limit(1).count():
            raise ValueError("xxhash64 dictionary collision detected")
    return triples, dictionary


def load_ntriples(spark: SparkSession, path: str, validate: bool = False):
    """path -> TripleStore (constants resolve via dictionary lookup only —
    no TPC-H arithmetic id scheme)."""
    from dream_spark.sources.triples import TripleStore

    triples, dictionary = encode(parse_ntriples(spark, path), validate=validate)
    return TripleStore(spark, triples, dictionary, resolver=None)
