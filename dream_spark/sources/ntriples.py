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
    """Strip IRI brackets / literal quotes+suffix from a raw N-Triples term,
    and UNESCAPE literal bodies (\\" and \\\\) so the stored lexical is the
    true string — write_ntriples re-escapes on the way out, keeping
    read→write→read a fixed point."""
    c = F.col(col)
    body = F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"', 1)
    unescaped = F.regexp_replace(body, r'\\(["\\])', r"$1")
    return (
        F.when(c.startswith("<"), F.regexp_extract(c, r"^<(.*)>$", 1))
        .when(c.startswith('"'), unescaped)
        .otherwise(c)
    )


def parse_lines(raw: DataFrame) -> DataFrame:
    """``value``-column line DataFrame (batch OR streaming) →
    (s_lex, p_lex, o_lex) parsed, bracket/quote-stripped lexicals.
    Pure projections — works unchanged on a streaming source."""
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


def parse_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """(s_lex, p_lex, o_lex) — parsed, bracket/quote-stripped lexicals."""
    return parse_lines(spark.read.text(path))


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


def _nt_term(col) -> "F.Column":
    """Render a lexical back to N-Triples syntax: IRI-looking terms (scheme
    prefix) get angle brackets, blank-node labels pass through, everything
    else becomes a quoted literal with minimal escaping."""
    c = F.col(col) if isinstance(col, str) else col
    is_iri = c.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
    is_blank = c.startswith("_:")
    quoted = F.concat(
        F.lit('"'),
        F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', '\\\\"'),
        F.lit('"'),
    )
    return (
        F.when(is_blank, c)
        .when(is_iri, F.concat(F.lit("<"), c, F.lit(">")))
        .otherwise(quoted)
    )


def write_ntriples(store, path: str, mode: str = "overwrite", max_files: int = 0) -> None:
    """Export a TripleStore back to N-Triples text — the inverse of
    ``load_ntriples`` (the reference's interchange format).

    Decodes (s,p,o) ids through the dictionary with three id-keyed joins —
    the lexicals shuffle once each, never the triple rows' full decode
    product — then renders one triple per line.  ``max_files`` caps the
    output file count via coalesce (narrow, no shuffle)."""
    d = store.dictionary
    t = store.triples
    for slot in ("s", "p", "o"):
        lex = d.select(F.col("id").alias(slot), F.col("lexical").alias(f"{slot}_lex"))
        t = t.join(lex, on=slot, how="left").drop(slot)
    lines = t.select(
        F.concat_ws(
            " ", _nt_term("s_lex"), _nt_term("p_lex"), _nt_term("o_lex"), F.lit(".")
        ).alias("value")
    )
    if max_files > 0:
        lines = lines.coalesce(max_files)
    lines.write.mode(mode).text(path)
