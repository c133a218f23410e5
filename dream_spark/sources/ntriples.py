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

_IRI = r"<[^>]*>"
_BLANK = r"_:\S+"
_LITERAL = r'"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[\w\-]+)?'
#: positional term classes per the W3C grammar: subject iri|blank,
#: predicate iri ONLY, object any — a literal in subject/predicate position
#: must not silently parse as a triple.  Stricter than spec in ONE way
#: (documented): whitespace between terms is required here, optional in the
#: grammar — spaceless lines are rejected, never mis-parsed.
NT_PATTERN = rf"^\s*({_IRI}|{_BLANK})\s+({_IRI})\s+({_IRI}|{_BLANK}|{_LITERAL})\s*\.\s*$"

#: sentinel for two-phase escape decoding: raw NUL cannot appear in
#: conformant N-Triples text (control characters must be escaped)
_ESC_SENTINEL = "\x00"


#: IRI namespace write_ntriples mints for subject/predicate lexicals that
#: are not themselves IRI-shaped (N-Triples allows only IRIs there); the
#: parser strips ONE layer back off, so self-roundtrips are lossless while
#: the exported file stays valid N-Triples for ANY consumer.  A lexical
#: that GENUINELY starts with the namespace exports with the prefix
#: DOUBLED (in every slot), so stripping one layer restores it exactly —
#: the namespace is reserved by this convention, which external producers
#: would have to share for their urn:x-lex: terms to survive a load here
#: (documented boundary; any fixed escape prefix has the same property).
_LEX_URN = "urn:x-lex:"


def _lexical(col):
    """Strip IRI brackets / literal quotes+suffix from a raw N-Triples term,
    and UNESCAPE literal bodies (ECHAR subset: \\" \\\\ \\n \\t \\r) so the
    stored lexical is the true string — write_ntriples re-escapes on the
    way out, keeping read→write→read a fixed point.  (\\uXXXX numeric
    escapes are not decoded — documented limitation; they round-trip as
    their source text.)

    Two-phase decode: ``\\\\`` is replaced FIRST with a sentinel so a
    literal backslash followed by 'n' (source text ``\\\\n``) is never
    misread as a newline escape."""
    c = F.col(col)
    body = F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"', 1)
    u = F.regexp_replace(body, r"\\\\", _ESC_SENTINEL)
    u = F.regexp_replace(u, r'\\"', '"')
    u = F.regexp_replace(u, r"\\n", "\n")
    u = F.regexp_replace(u, r"\\t", "\t")
    u = F.regexp_replace(u, r"\\r", "\r")
    u = F.regexp_replace(u, _ESC_SENTINEL, r"\\")
    # negated class, NOT '.': Java regex '.' excludes the unicode line
    # terminators (U+0085 NEL, U+2028, U+2029), which are IRIREF-legal —
    # '.*' silently extracted "" for any bracketed term containing one
    # (found by the lexical-roundtrip fuzzer)
    iri = F.regexp_extract(c, r"^<([^>]*)>$", 1)
    # invert write_ntriples' convention: non-IRI-shaped s/p terms export
    # as <urn:x-lex:TERM> and genuine urn:x-lex:* lexicals export with
    # the prefix DOUBLED, so stripping exactly ONE layer restores every
    # case — read -> write -> read stays a fixed point
    iri = F.when(
        iri.startswith(_LEX_URN),
        F.substring(iri, len(_LEX_URN) + 1, 1 << 24),
    ).otherwise(iri)
    return (
        F.when(c.startswith("<"), iri)
        .when(c.startswith('"'), u)
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


def _nt_term(col, slot: str = "o") -> "F.Column":
    """Render a lexical back to N-Triples syntax:

    - IRI-shaped terms (scheme prefix AND no IRIREF-illegal character —
      the grammar forbids ``<>"{}|^`\``, space, and controls anywhere
      inside the brackets) get angle brackets; a term in the RESERVED
      ``urn:x-lex:`` namespace exports with the prefix doubled so the
      parser's strip-one-layer restores it;
    - blank-node labels matching a conservative BLANK_NODE_LABEL subset
      (leading alnum/underscore, no trailing dot) pass through; labels
      OUTSIDE the subset (empty ``_:``, embedded quotes, …) do NOT — they
      take the urn minting like any other non-IRI term, because emitting
      them raw produces lines conformant parsers (including this module's
      own reader) silently drop;
    - everything else becomes a quoted literal with ECHAR escaping
      (backslash FIRST, then quote/newline/tab/CR — so escape sequences
      are never double-escaped).

    ``slot``: the N-Triples grammar allows literals ONLY in the object
    slot — a non-IRI subject/predicate lexical (e.g. this repo's bare
    ``inRegion``) must still export as an IRI, so s/p slots mint
    ``<urn:x-lex:TERM>``; terms with no valid rendering at all render
    NULL and the writer's fail-fast gate raises."""
    c = F.col(col) if isinstance(col, str) else col
    # IRIREF-legal body: grammar forbids <>"{}|^`\ plus controls and
    # space (chars 0x00-0x20) anywhere inside the brackets — emitting any
    # of them would produce a line conformant external parsers reject
    iriref_ok = ~c.rlike(r'[\x00-\x20<>"{}|^`\\]')
    is_iri = c.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:") & iriref_ok
    is_blank = c.rlike(r"^_:[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?$")
    esc = F.regexp_replace(c, r"\\", r"\\\\")
    esc = F.regexp_replace(esc, '"', '\\\\"')
    esc = F.regexp_replace(esc, "\n", r"\\n")
    esc = F.regexp_replace(esc, "\t", r"\\t")
    esc = F.regexp_replace(esc, "\r", r"\\r")
    quoted = F.concat(F.lit('"'), esc, F.lit('"'))
    # the reserved namespace doubles on export (every slot) so the
    # parser's strip-one-layer restores genuine urn:x-lex:* lexicals
    reserved = c.startswith(_LEX_URN)
    urn = F.concat(F.lit("<" + _LEX_URN), c, F.lit(">"))
    plain_iri = F.concat(F.lit("<"), c, F.lit(">"))
    if slot in ("s", "p"):
        return (
            F.when(is_blank & F.lit(slot == "s"), c)
            .when(is_iri & reserved, urn)
            .when(is_iri, plain_iri)
            .when(iriref_ok, urn)
            .otherwise(F.lit(None))  # unexportable: caught by the null gate
        )
    return (
        F.when(is_blank, c)
        .when(is_iri & reserved, urn)
        .when(is_iri, plain_iri)
        .otherwise(quoted)
    )


def write_ntriples(store, path: str, mode: str = "overwrite", max_files: int = 0) -> None:
    """Export a TripleStore back to N-Triples text — the inverse of
    ``load_ntriples`` (the reference's interchange format).

    Decodes (s,p,o) ids through the dictionary with three id-keyed joins —
    the lexicals shuffle once each, never the triple rows' full decode
    product — then renders one triple per line.  ``max_files`` caps the
    output file count via coalesce (narrow, no shuffle).

    When the exported triple set is SMALL (size-gated on the row count,
    same conf as the join gate), the dictionary is first semi-filtered to
    the ids the export references through one broadcast semi-join — the
    three decode joins then build against an export-sized table instead
    of shuffling the full dictionary three times (measured r10: the
    3×dictionary SMJ was ~2/3 of the 25-triple roundtrip entry; guide
    §3.2's pre-filter-the-big-side move).  A large export skips the gate
    and keeps the plain id-keyed joins."""
    from dream_spark.functions.joins import (
        BROADCAST_MAX_ROWS_CONF,
        DEFAULT_BROADCAST_MAX_ROWS,
        conf_int,
    )

    d = store.dictionary
    # localCheckpoint, not persist: the export set is typically a DERIVED
    # frame over a tall store lineage (the entry exports a predicate slice
    # of the 7-table triple union), and every downstream action here — the
    # semi-filter build, the two fail-fast gates, the write — would re-plan
    # that whole tree per action (the r10 CC finding, guide §7.2).  The
    # checkpoint truncates it once; n_t is then a cached-scan count.
    t0 = store.triples.localCheckpoint()
    n_t = t0.count()
    gate = conf_int(
        store.triples.sparkSession, BROADCAST_MAX_ROWS_CONF, DEFAULT_BROADCAST_MAX_ROWS
    )
    slim_ckpt = None
    if 3 * n_t <= gate:
        needed = (
            t0.select(F.col("s").alias("id"))
            .unionAll(t0.select(F.col("p").alias("id")))
            .unionAll(t0.select(F.col("o").alias("id")))
            .distinct()
        )
        # materialize the slim dictionary ONCE (it is ≤ 3·n_t rows): the
        # three slot joins each build their own broadcast, and without the
        # checkpoint each build would re-run the dictionary-wide semi scan
        d = d.join(F.broadcast(needed), on="id", how="leftsemi").localCheckpoint()
        slim_ckpt = d
        d = F.broadcast(d)
    t = t0
    for slot in ("s", "p", "o"):
        lex = d.select(F.col("id").alias(slot), F.col("lexical").alias(f"{slot}_lex"))
        t = t.join(lex, on=slot, how="left").drop(slot)
    # the two fail-fast gates below plus the write itself each scan this
    # frame — persist the 3-way decode join ONCE so the gates are cheap
    # cached projections, not three full join evaluations
    t = t.persist()
    try:
        rendered = t.select(
            F.col("s_lex").isNull()
            | F.col("p_lex").isNull()
            | F.col("o_lex").isNull(),
            _nt_term("s_lex", "s").alias("s_t"),
            _nt_term("p_lex", "p").alias("p_t"),
            _nt_term("o_lex", "o").alias("o_t"),
        ).toDF("__miss", "s_t", "p_t", "o_t")
        # BOTH fail-fast gates in ONE aggregate job (each limit(1).count()
        # scanned the whole frame on the happy path anyway):
        # - undecodable ids: concat_ws silently SKIPS nulls, which would
        #   emit a malformed 2-term line the reader then silently drops —
        #   data loss with no error at either end;
        # - unexportable subject/predicate terms (characters illegal in an
        #   IRIREF): a NULL rendering must raise, not drop through.
        # The missing-id error wins when both fire, same as the old
        # two-job order (a missing lexical also renders NULL).
        flags = rendered.agg(
            F.max(F.col("__miss")).alias("any_missing"),
            F.max(F.col("s_t").isNull() | F.col("p_t").isNull()).alias("any_bad"),
        ).first()
        if flags["any_missing"]:
            raise ValueError(
                "write_ntriples: triples reference ids missing from the dictionary "
                "(store integrity error — dictionary and triples are out of sync)"
            )
        if flags["any_bad"]:
            raise ValueError(
                "write_ntriples: a subject/predicate lexical cannot be rendered "
                "as an IRI (whitespace, control, or <>\"{}|^`\\ in the term) — "
                "no valid N-Triples line exists for it"
            )
        lines = rendered.select(
            F.concat_ws(" ", "s_t", "p_t", "o_t", F.lit(".")).alias("value")
        )
        if max_files > 0:
            lines = lines.coalesce(max_files)
        lines.write.mode(mode).text(path)
    finally:
        from dream_spark.session import release_local_checkpoint

        t.unpersist()
        release_local_checkpoint(t0)
        if slim_ckpt is not None:
            release_local_checkpoint(slim_ckpt)


# --------------------------------------------------------------------------
# driver-contract entry: interchange-format roundtrip
# --------------------------------------------------------------------------
def sparql_nt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end N-Triples roundtrip as a query: export the ``inRegion``
    subgraph in the RDF interchange format (the reference's actual input
    format, Loader.c), re-load it through the N-Triples parser into a
    FRESH store — its own dictionary, ids assigned by the loader, no
    TPC-H arithmetic scheme — and answer a DECODED query over the
    roundtripped store.  Comparing lexicals (not ids) against the oracle
    running on the ORIGINAL tables proves the whole chain preserves the
    graph: serializer → escaping → parser → dictionary encode → BGP
    translate → decode.

    The result is localCheckpoint-materialized before the scratch export
    is removed (the caller's collect must not depend on scratch files).

    FILESYSTEM ASSUMPTION (r6 ADVICE): the tempfile scratch dir is
    driver-local, so the write_ntriples → load_ntriples hop works in local
    mode or on a shared filesystem; a cluster deployment points the export
    at a shared URI (s3/hdfs) instead of tempfile.mkdtemp — the
    serializer/parser themselves are plain DataFrame text IO and run
    anywhere."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dream_spark.plans.sparql import parse_sparql
    from dream_spark.plans.translator import translate
    from dream_spark.sources.triples import TripleStore, resolve_lexical

    st = TripleStore.shared(spark, sf_dir)
    sub = TripleStore(
        spark,
        st.triples.where(F.col("p") == F.lit(resolve_lexical("inRegion"))),
        st.dictionary,
        resolver=None,
    )
    base = tempfile.mkdtemp(prefix="dream_spark_nt_")
    path = f"{base}/graph.nt"
    try:
        write_ntriples(sub, path, max_files=1)
        nt_store = load_ntriples(spark, path)
        q = parse_sparql("select ?N ?R where { ?N inRegion ?R }")
        return translate(nt_store, q, None, decode=True).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _nt_roundtrip_sql() -> str:
    from dream_spark.plans.oracle import bgp_to_sql
    from dream_spark.plans.sparql import parse_sparql

    return bgp_to_sql(
        parse_sparql("select ?N ?R where { ?N inRegion ?R }"), decode=True
    )


QUERIES = {"sparql_nt_roundtrip": sparql_nt_roundtrip}
ORACLES = {"sparql_nt_roundtrip": _nt_roundtrip_sql()}
