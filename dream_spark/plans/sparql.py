"""SPARQL basic-graph-pattern parser.

Covers the reference grammar exactly (reference QueryPlanner.c:933-1015):
``select ?v1 ?v2 … where { s p o . s p o . … }`` — conjunctive triple
patterns only; a term starting with ``?`` is a variable
(QueryPlanner.c:299-315), anything else is a constant.  Variable predicates
are supported (QueryPlanner.c:305-309).  The reference grammar has no
FILTER/OPTIONAL/UNION/ORDER BY/LIMIT (SURVEY.md §2.3 — ``Query.filter``
exists as an always-NULL field, Structs.h:82); we additionally accept as
documented supersets: a ``distinct`` marker, angle-bracketed constants
``<lexical>``, ``order by``/``limit``, ``optional { … }`` groups (left
outer join semantics), ``filter`` clauses of the forms
``filter (?X != ?Y)``, ``filter (?X = <const>)``, ``filter (?X != <const>)``,
``filter regex(?X, "pattern")``, string-function filters
``filter contains/strstarts/strends(?X, "lit")``,
``filter (ucase|lcase(?X) =/!= "lit")``,
``filter (substr(?X, start[, len]) =/!= "lit")`` and
``filter (strlen(?X) op N)``, typed-numeric arithmetic
``filter (?X [±·n] op N)`` and two-variable ``filter (?X ± ?Y op N)``,
``filter [not] exists { … }`` groups
(semi/anti-join semantics on the shared variables), ``minus { … }`` groups
(anti-join semantics on the shared variables), top-level
``{ BGP } union { BGP }`` alternation (bag-union semantics; variables
unbound in a branch come back NULL, per the SPARQL spec), property-path
markers on constant predicates (``p+`` transitive, ``^p`` inverse,
``p1|p2`` alternation — one per predicate), and
``(count([distinct] ?v|*) | min | max | sample | group_concat as ?alias)``
aggregate projections with ``group by ?v …``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace


def strslice_sql(fn: str, ref: str, sep: str) -> str:
    """SPARQL STRBEFORE/STRAFTER as ONE SQL fragment applied verbatim on
    both engines (Spark ``F.expr`` and the DuckDB oracle — ``instr``,
    ``substr``, ``length`` and ``CASE`` are identical in both dialects, so
    the semantics cannot drift): the substring strictly before/after the
    FIRST occurrence of ``sep``, and ``''`` when ``sep`` does not occur
    (§17.4.3.4/.5).  ``sep`` must be non-empty — the grammar rejects the
    empty separator whose spec result ("" / the whole string) differs
    between the two functions and is never what a query means."""
    lit = sep.replace("'", "''")
    if fn == "strbefore":
        return (
            f"(CASE WHEN instr({ref}, '{lit}') > 0"
            f" THEN substr({ref}, 1, instr({ref}, '{lit}') - 1) ELSE '' END)"
        )
    assert fn == "strafter", fn
    return (
        f"(CASE WHEN instr({ref}, '{lit}') > 0"
        f" THEN substr({ref}, instr({ref}, '{lit}') + {len(sep)}) ELSE '' END)"
    )


def _mask_brackets(t: str) -> str:
    """Blank everything inside ``<…>`` (position-preserving): path-operator
    detection must only see characters OUTSIDE bracketed constants — an IRI
    like ``<http://a|b+c>`` contains every marker character legally."""
    out, depth = [], 0
    for ch in t:
        if ch == "<":
            depth += 1
            out.append("_")
        elif ch == ">":
            depth = max(0, depth - 1)
            out.append("_")
        else:
            out.append(ch if depth == 0 else "_")
    return "".join(out)


def _scan_connectives(expr: str) -> tuple[list[str], list[int]]:
    """Positions of top-level ``||`` / ``&&`` in a filter expression —
    outside parentheses, quoted strings, and <…> bracketed constants (an
    IRI like ``<x||y>`` legally contains the connective characters, same
    hazard :func:`_mask_brackets` documents).  A bracketed constant is
    recognized ATOMICALLY (``<``, no whitespace, ``>``) because a lone
    ``<`` is the less-than operator, not a bracket — ``?a < 5 || ?b > 3``
    must still split.  Returns (connectives, cut offsets)."""
    depth, in_str, conns, cuts = 0, False, [], []
    i = 0
    while i < len(expr):
        ch = expr[i]
        if ch == '"':
            in_str = not in_str
        elif not in_str:
            if ch == "<":
                mi = _IRI_ATOM.match(expr, i)
                if mi:
                    i = mi.end()
                    continue
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and expr[i : i + 2] in ("||", "&&"):
                conns.append(expr[i : i + 2])
                cuts.append(i)
                i += 2
                continue
        i += 1
    return conns, cuts


_IRI_ATOM = re.compile(r"<[^<>\s]*>")


def _peel_outer_parens(expr: str) -> tuple[str, bool]:
    """Strip ALL redundant outer paren layers from a filter expression;
    returns ``(stripped, any_peeled)``.  Shared by the connective claim
    pass and the operand parser so a future quoting fix lands in both."""
    peeled = False
    while True:
        m = re.fullmatch(r"(?s)\((.*)\)", expr)
        if m is None:
            break
        inner, depth = m.group(1), 0
        ok = True
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    ok = False
                    break
        if not ok or depth != 0:
            break
        expr = inner.strip()
        peeled = True
    return expr, peeled


def _split_outside_brackets(t: str, sep: str) -> list[str]:
    """Split on ``sep`` occurrences outside ``<…>`` only."""
    parts, cur, depth = [], [], 0
    for ch in t:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth = max(0, depth - 1)
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


@dataclass(frozen=True)
class Term:
    """One s/p/o slot: either a variable (?X) or a lexical constant.

    A constant PREDICATE may additionally carry (SPARQL 1.1 property-path
    subset; mutually exclusive, parser-enforced):

    - a trailing ``+`` (OneOrMorePath): ``?x inRegion+ ?y`` matches pairs
      connected by 1..n hops — ``is_transitive``;
    - a trailing ``*`` (ZeroOrMorePath): 0..n hops — ``is_zero_or_more``;
      the zero-length path matches every node of the graph to itself
      (nodes = distinct subjects ∪ objects, the usual engine reading of
      the spec's "terms in the graph");
    - a trailing ``?`` (ZeroOrOnePath): 0..1 hops — ``is_zero_or_one``;
    - a leading ``^`` (InversePath): ``?x ^placedBy ?o`` ≡ ``?o placedBy
      ?x`` — ``is_inverse``;
    - ``|`` alternation (PathAlternative): ``?s madeBy|placedBy ?e``
      matches via either predicate — ``is_alternation`` /
      ``alternatives``;
    - a parenthesized alternation-closure group ``(p1|p2)+``
      (OneOrMorePath over the UNION edge set): ``is_transitive`` AND
      ``is_alternation`` both hold — the only combined form accepted
      (``(…)*`` / ``(…)?`` are rejected loudly).

    ``lexical`` strips the path markers."""

    text: str

    @property
    def is_var(self) -> bool:
        return self.text.startswith("?")

    @property
    def var(self) -> str:
        return self.text[1:]

    @property
    def is_transitive(self) -> bool:
        return (not self.is_var) and _mask_brackets(self.text).endswith("+")

    @property
    def is_zero_or_more(self) -> bool:
        return (not self.is_var) and _mask_brackets(self.text).endswith("*")

    @property
    def is_zero_or_one(self) -> bool:
        return (not self.is_var) and _mask_brackets(self.text).endswith("?")

    @property
    def is_path_closure(self) -> bool:
        """Any of the hop-count path forms (+ / * / ?): the pattern scans a
        derived pair frame instead of the raw triples."""
        return self.is_transitive or self.is_zero_or_more or self.is_zero_or_one

    @property
    def is_inverse(self) -> bool:
        return self.text.startswith("^")

    @property
    def is_alternation(self) -> bool:
        return (not self.is_var) and "|" in _mask_brackets(self._alt_body)

    @property
    def is_negated(self) -> bool:
        """SPARQL 1.1 NegatedPropertySet: ``!p`` / ``!(p1|p2)`` — match any
        predicate EXCEPT the listed ones."""
        return self.text.startswith("!")

    @property
    def _negation_body(self) -> str:
        t = self.text
        if t.startswith("!"):
            t = t[1:]
            if t.startswith("(") and t.endswith(")"):
                t = t[1:-1]
        return t

    @property
    def _alt_body(self) -> str:
        """The alternation list with any wrapping stripped: ``!``/parens
        for a negated set, a trailing hop marker + parens for a closure
        group ``(p1|p2)+``."""
        if self.text.startswith("!"):
            return self._negation_body
        t = self.text
        m = _mask_brackets(t)
        if m.endswith(("+", "*")) or (not t.startswith("?") and m.endswith("?")):
            t = t[:-1]
        if t.startswith("(") and t.endswith(")"):
            t = t[1:-1]
        return t

    @property
    def alternatives(self) -> tuple[str, ...]:
        """The lexical of each ``|`` alternative (a 1-tuple when the term
        is a plain constant; the excluded set for a negated term; the
        union set for an alternation-closure group ``(p1|p2)+``)."""
        return tuple(
            Term(t).lexical for t in _split_outside_brackets(self._alt_body, "|")
        )

    @property
    def lexical(self) -> str:
        t = self.text
        if t.startswith("^"):
            t = t[1:]
        if t.endswith(("+", "*")) and not t.startswith("?"):
            t = t[:-1]
        elif t.endswith("?") and not t.startswith("?"):
            t = t[:-1]
        return t[1:-1] if t.startswith("<") and t.endswith(">") else t


@dataclass(frozen=True)
class Condition:
    """A triple pattern — the analog of reference ``Condition`` (Structs.h:41-48)."""

    cid: int
    subj: Term
    pred: Term
    obj: Term

    def variables(self) -> list[str]:
        out: list[str] = []
        for t in (self.subj, self.pred, self.obj):
            if t.is_var and t.var not in out:
                out.append(t.var)
        return out


@dataclass(frozen=True)
class Filter:
    """A FILTER clause.  ``kind`` is ``cmp`` (``var op var-or-const`` with op
    in =/!=, evaluated on dictionary IDs — exact because the dictionary is a
    bijection), ``regex`` (``regex(?v, "pat")``, evaluated on the decoded
    lexical), ``str`` (``contains/strstarts/strends(?v, "lit")`` — literal
    substring/prefix/suffix tests on the decoded lexical, ``op`` holds the
    function name and ``pattern`` the literal; also ``ucase``/``lcase``
    — case-mapped =/!= against the literal, comparison operator in
    ``lhs_op`` — and ``substr`` — 1-based ``substr(?v, lhs_num[,
    rhs_num]) =/!= "lit"``), ``strlen``
    (``strlen(?v) op <int>`` — character-length comparison on the decoded
    lexical), ``arith`` (``?v [±·n] op <integer>``: comparison/arithmetic
    on the term's TYPED NUMERIC VALUE — sources/triples.numeric_value_sql —
    NULL for non-numeric terms, which drops the row like SPARQL's
    type-error contract), or ``arith2`` (``?a [+−×] ?b op <integer>``:
    two-variable arithmetic over the typed values — ``lhs_op`` holds the
    arithmetic operator, ``rhs_var`` the second operand,
    sources/triples.arith2_sql).

    ``boolop`` combines row-local sub-filters with one SPARQL logical
    connective (§17.4.1.5/.6): ``op`` is ``||`` or ``&&`` and ``parts``
    the operand filters (kinds cmp / arith / arith2 / in / bound only —
    forms that lower to a single row-local predicate; the join-backed
    string/regex forms are rejected by the grammar).  Mixed connectives
    require explicit grouping and are rejected rather than guessed.
    Three-valued logic matches across engines: an unbound operand's
    sub-predicate is SQL NULL, and SQL's NULL OR TRUE = TRUE / otherwise
    non-TRUE mirrors SPARQL's error || true = true / error-drops
    (§17.2), so WHERE keeps exactly the SPARQL solutions."""

    kind: str
    var: str
    op: str | None = None
    rhs_var: str | None = None
    rhs_const: str | None = None
    pattern: str | None = None
    consts: tuple[str, ...] | None = None  # kind="in": VALUES constants
    # kind="in_rows": multi-variable VALUES — variables + constant rows
    # (a None slot is UNDEF: that variable is unconstrained in the row)
    vars_: tuple[str, ...] | None = None
    rows: tuple[tuple[str | None, ...], ...] | None = None
    # kind="arith": optional lhs arithmetic (?v lhs_op lhs_num) and the
    # integer rhs literal
    lhs_op: str | None = None
    lhs_num: int | None = None
    rhs_num: int | None = None
    # kind="arith2": True wraps the two-variable expression in ABS() —
    # ``filter (abs(?a − ?b) cmp n)``, the magnitude-difference idiom
    abs_fn: bool = False
    # kind="boolop": the operand sub-filters (op holds "||" or "&&")
    parts: tuple["Filter", ...] | None = None

    def refs(self) -> tuple[str, ...]:
        """Every variable this filter references (str-kind REPLACE stores
        its replacement LITERAL in rhs_var, so that slot is skipped;
        boolop unions over its parts)."""
        if self.kind == "boolop":
            return tuple(v for p in self.parts for v in p.refs())
        rhs = None if self.kind == "str" else self.rhs_var
        return tuple(
            v for v in (self.var, rhs, *(self.vars_ or ())) if v is not None
        )


@dataclass(frozen=True)
class Aggregate:
    """One aggregate projection item: ``(count([distinct] ?v|*) as ?a)``,
    ``(min(?v) as ?a)``, ``(max(?v) as ?a)``, ``(sample(?v) as ?a)``,
    ``(group_concat(?v) as ?a)``.

    min/max/sample operate on the dictionary ids — meaningful because the
    arithmetic id scheme is order-preserving within an entity kind
    (sources/triples.py); sample is deterministically MIN (SPARQL leaves
    the choice open; a distributed engine must pin it or two runs
    disagree).  group_concat emits the DECODED lexicals sorted ascending
    joined with ``sep`` (SPARQL 1.1 ``SEPARATOR=`` scalar argument,
    default ``,``) — same determinism reasoning (SPARQL leaves the
    order open).  sum/avg operate on the TYPED NUMERIC VALUE
    (sources/triples.numeric_value_sql): non-numeric terms contribute NULL
    (skipped, the SPARQL error-term contract); avg is pinned to
    CAST(sum AS DOUBLE)/count so both engines divide the same exact
    integers."""

    fn: str  # "count" | "min" | "max" | "sample" | "group_concat" | "sum" | "avg"
    var: str | None  # None => count(*)
    alias: str
    distinct: bool = False
    sep: str = ","  # group_concat separator (SPARQL SEPARATOR= argument)


@dataclass
class ParsedQuery:
    """Projection list + conditions — reference ``Result``+``Condition`` lists
    (QueryPlanner.c:24-28).  ``order``/``limit``/``filters``/``optionals``
    extend the reference grammar (which has none of them, SURVEY.md §2.3) as
    documented supersets."""

    projection: list[str]
    conditions: list[Condition]
    distinct: bool = False
    order: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    limit: int | None = None
    offset: int | None = None
    # HAVING superset: (Aggregate, op, int) filter applied after grouping
    having: tuple[Aggregate, str, int] | None = None
    filters: list[Filter] = field(default_factory=list)
    optionals: list[list[Condition]] = field(default_factory=list)
    # per-optional-group filters (same index as ``optionals``): evaluated
    # INSIDE the group before its left join — LeftJoin(P1, P2, E) for E
    # over group-local variables (incl. shared ones, whose merged value
    # equals the group value under the equi-join)
    optional_filters: list[list[Filter]] = field(default_factory=list)
    # nested OPTIONAL: optional_parent[i] is the index of the group that
    # lexically encloses group i, or -1 for a top-level group — group i
    # then left-joins INSIDE its parent (LeftJoin(A, LeftJoin(B, …)))
    # before the parent's own left join onto the required part
    optional_parent: list[int] = field(default_factory=list)
    minuses: list[list[Condition]] = field(default_factory=list)
    # FILTER [NOT] EXISTS { … } groups: (positive?, patterns).  Semi-join
    # (EXISTS) / anti-join (NOT EXISTS) on the shared variables; group
    # variables do NOT bind into the solution (unlike OPTIONAL).
    exists_groups: list[tuple[bool, list[Condition]]] = field(default_factory=list)
    # aggregate projection: group_by vars + Aggregate items; ``projection``
    # then lists group_by vars followed by aggregate aliases, in select order
    aggregates: list[Aggregate] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    # non-empty => the where clause is { branch } union { branch } …;
    # ``conditions`` then holds the FIRST branch (so single-branch helpers
    # keep working) and filters/optionals are disallowed by the parser
    union_branches: list[list[Condition]] = field(default_factory=list)
    # SPARQL 1.1 subquery: one nested ``{ select … }`` group in the WHERE
    # clause, inner-joined to the outer patterns on the shared projected
    # variables; inner aggregate aliases become plain outer columns
    subquery: "ParsedQuery | None" = None
    # BIND clauses: (kind, source, alias) with kind "var" (source = bound
    # variable name), "const" (source = constant lexical), "coalesce"
    # (source = tuple of bound variable names; alias = first non-NULL,
    # the SPARQL fallback-after-OPTIONAL idiom), "arith"
    # (source = (var, op, int) over the typed numeric value layer; the
    # alias carries a plain number, not a dictionary id), or "if"
    # (source = (var, op, rhs, then, else): numeric conditional whose
    # alias ALSO carries a plain number — see numeric_bind_aliases)
    binds: list[tuple[str, object, str]] = field(default_factory=list)
    # ASK form (SPARQL 1.1; superset of the reference grammar): the result
    # is a single boolean row — does any binding exist?
    ask: bool = False
    # CONSTRUCT form: non-empty => emit (s,p,o) rows from these template
    # patterns, one set per WHERE binding (bag semantics)
    construct_template: list[Condition] = field(default_factory=list)
    # DESCRIBE form: a constant term — emit every triple with it as
    # subject or object
    describe_term: str | None = None
    # DESCRIBE ?v WHERE { … } form: the body is this query's own
    # conditions/filters with ``projection == [describe_var]``; the result
    # is every triple touching any DISTINCT matched term
    describe_var: str | None = None
    text: str = field(default="", repr=False)

    def all_variables(self) -> list[str]:
        out: list[str] = []
        groups = self.union_branches if self.union_branches else [self.conditions]
        for grp in list(groups) + list(self.optionals):
            for c in grp:
                for v in c.variables():
                    # internal sequence-path hop variables join patterns
                    # but never surface (not projectable, not `select *`)
                    if v not in out and not v.startswith("__seq"):
                        out.append(v)
        if self.subquery is not None:
            for v in self.subquery.projection:
                if v not in out:
                    out.append(v)
        for _, _, alias in self.binds:
            if alias not in out:
                out.append(alias)
        return out

    def numeric_bind_aliases(self) -> frozenset[str]:
        """Aliases of BINDs whose column holds a PLAIN NUMBER rather than
        a dictionary id ("arith" and "if" kinds).  Single source of truth
        for the translator and the DuckDB oracle, which both must (a) skip
        the id→value wrap when filtering/aggregating over these columns
        and (b) refuse to dictionary-decode them."""
        return frozenset(
            a for k, _, a in self.binds if k in ("arith", "if", "arith2")
        )

    def string_bind_aliases(self) -> frozenset[str]:
        """Aliases of BINDs whose column holds a DECODED STRING ("concat"
        kind, which also backs str()) — a third value space next to ids
        and plain numbers.  Id-level filters, aggregates, grouping, and
        dictionary decode are all meaningless over these columns and are
        rejected loudly by the validator on BOTH engines."""
        return frozenset(a for k, _, a in self.binds if k == "concat")


_WS = re.compile(r"\s+")


class SparqlSyntaxError(ValueError):
    pass


def parse_sparql(text: str) -> ParsedQuery:
    """Parse the SPARQL-BGP subset into (projection, conditions).

    Tokenization mirrors the reference: split the select clause on
    whitespace, split the where body on ``.`` pattern separators, then each
    pattern into exactly three whitespace-separated terms
    (QueryPlanner.c:946-1013).
    """
    src = text.strip()
    # ASK { … } / ASK WHERE { … }: parse the body exactly like
    # `select * where { … }` (same pattern/filter/optional grammar), then
    # mark the query as boolean-existence
    if re.match(r"(?is)^\s*ask\s*(?:where\s*)?\{", src):
        inner = re.sub(r"(?is)^\s*ask\s*(?:where\s*)?\{", "select * where {", src, count=1)
        return replace(parse_sparql(inner), ask=True, text=src)
    # DESCRIBE ?v WHERE { … }: every triple touching any DISTINCT term the
    # body binds to ?v (the body reuses the full select grammar)
    mdv = re.match(r"(?is)^\s*describe\s+(\?\w+)\s+where\s*\{(.*)\}\s*$", src, re.DOTALL)
    if mdv:
        var = mdv.group(1)[1:]
        body_q = parse_sparql(f"select {mdv.group(1)} where {{{mdv.group(2)}}}")
        return replace(body_q, describe_var=var, text=src)
    # DESCRIBE <constant>: every triple touching the term
    md = re.match(r"(?is)^\s*describe\s+(<[^>]*>|[^\s?]+)\s*$", src)
    if md:
        term = Term(md.group(1))
        return ParsedQuery(
            projection=["s", "p", "o"],
            conditions=[],
            describe_term=term.lexical,
            text=src,
        )
    # CONSTRUCT { template } WHERE { body }: body parses like
    # `select * where { body }`; the template is a plain pattern list whose
    # variables must all be bound by the body
    mc = re.match(r"(?is)^\s*construct\s*\{(.*?)\}\s*where\s*\{(.*)\}\s*$", src, re.DOTALL)
    if mc:
        tpl = _parse_patterns_from(mc.group(1), 1)
        if not tpl:
            raise SparqlSyntaxError("construct template needs at least one pattern")
        if any(c.pred.is_path_closure for c in tpl):
            raise SparqlSyntaxError("path '+'/'*'/'?' is not valid in a construct template")
        q = parse_sparql(f"select * where {{{mc.group(2)}}}")
        bound = set(q.all_variables())
        unbound = sorted(
            {v for c in tpl for v in c.variables() if v not in bound}
        )
        if unbound:
            raise SparqlSyntaxError(
                f"construct template variables not bound in where clause: {unbound}"
            )
        return replace(q, construct_template=tpl, text=src)
    m = re.match(
        r"(?is)^\s*select\s+(distinct\s+)?(.*?)\s+where\s*\{(.*)\}\s*"
        r"(?:group\s+by\s+((?:\?\w+\s*)+))?"
        r"(?:having\s*\(([^()]*\([^()]*\)[^()]*)\)\s*)?"
        r"(?:order\s+by\s+((?:(?:(?:asc|desc)\s*\(\s*\?\w+\s*\)|\?\w+(?:\s+(?:asc|desc))?)\s*)+))?"
        r"(?:limit\s+(\d+))?\s*"
        r"(?:offset\s+(\d+))?\s*$",
        src,
        re.DOTALL,
    )
    if not m:
        raise SparqlSyntaxError(f"expected 'select … where {{ … }}': {text[:120]!r}")
    distinct = bool(m.group(1))
    proj_src, body = m.group(2), m.group(3)
    group_by: list[str] = []
    if m.group(4):
        group_by = [t[1:] for t in _WS.split(m.group(4).strip()) if t]
    having: tuple[Aggregate, str, int] | None = None
    if m.group(5):
        hm = re.match(
            r"(?is)^\s*count\(\s*(distinct\s+)?(\?\w+|\*)\s*\)\s*(=|!=|<=|>=|<|>)\s*(\d+)\s*$",
            m.group(5),
        )
        hs = re.match(
            r"(?is)^\s*sum\(\s*(\?\w+)\s*\)\s*(=|!=|<=|>=|<|>)\s*(-?\d+)\s*$",
            m.group(5),
        )
        if hm:
            hvar = None if hm.group(2) == "*" else hm.group(2)[1:]
            having = (
                Aggregate(fn="count", var=hvar, alias="__having", distinct=bool(hm.group(1))),
                hm.group(3),
                int(hm.group(4)),
            )
        elif hs:
            # sum over the TYPED NUMERIC VALUE (non-numeric terms skip,
            # like the SUM projection aggregate) against an int literal
            having = (
                Aggregate(fn="sum", var=hs.group(1)[1:], alias="__having"),
                hs.group(2),
                int(hs.group(3)),
            )
        else:
            raise SparqlSyntaxError(
                "having must be 'count([distinct] ?v|*) op N' or "
                f"'sum(?v) op N': {m.group(5)!r}"
            )
    order: list[tuple[str, bool]] = []
    if m.group(6):
        # normalize the SPARQL function-call ordering syntax DESC(?v) /
        # ASC(?v) (§18.2.5.1 OrderCondition) to the postfix token form
        # the loop below consumes — same semantics, two spellings
        normalized = re.sub(
            r"(?is)\b(asc|desc)\s*\(\s*(\?\w+)\s*\)", r"\2 \1", m.group(6)
        )
        toks = _WS.split(normalized.strip())
        i = 0
        while i < len(toks):
            var = toks[i]
            if not var.startswith("?"):
                raise SparqlSyntaxError(f"order by terms must be variables, got {var!r}")
            desc = i + 1 < len(toks) and toks[i + 1].lower() in ("asc", "desc") and toks[i + 1].lower() == "desc"
            i += 2 if (i + 1 < len(toks) and toks[i + 1].lower() in ("asc", "desc")) else 1
            order.append((var[1:], desc))
    limit = int(m.group(7)) if m.group(7) else None
    offset = int(m.group(8)) if m.group(8) else None

    projection: list[str] = []
    aggregates: list[Aggregate] = []
    # aggregate items first: (count([distinct] ?v|*) as ?alias)
    def _grab_agg(m2: re.Match) -> str:
        fn = m2.group(1).lower()
        var = None if m2.group(3) == "*" else m2.group(3)[1:]
        distinct = bool(m2.group(2))
        sep = m2.group(4)
        if fn in ("min", "max", "sample", "group_concat", "sum", "avg"):
            if var is None:
                raise SparqlSyntaxError(f"{fn}(*) is not valid — {fn} needs a variable")
            if distinct and fn in ("min", "max", "sample"):
                raise SparqlSyntaxError(f"{fn}(distinct …) is redundant — drop distinct")
            if distinct and fn in ("group_concat", "sum", "avg"):
                raise SparqlSyntaxError(f"{fn}(distinct …) is not supported")
        if sep is not None and fn != "group_concat":
            raise SparqlSyntaxError(f"separator= is only valid on group_concat, not {fn}")
        if fn == "count" and distinct and var is None:
            raise SparqlSyntaxError("count(distinct *) is not supported")
        aggregates.append(
            Aggregate(
                fn=fn,
                var=var,
                alias=m2.group(5)[1:],
                distinct=distinct,
                sep="," if sep is None else sep,
            )
        )
        return " "

    proj_src = re.sub(
        r'(?is)\(\s*(count|min|max|sample|group_concat|sum|avg)\s*\(\s*(distinct\s+)?(\?\w+|\*)'
        r'\s*(?:;\s*separator\s*=\s*"([^"]*)")?\s*\)\s+as\s+(\?\w+)\s*\)',
        _grab_agg,
        proj_src,
    )
    plain_vars: list[str] = []
    star = False
    for tok in _WS.split(proj_src.strip()):
        if not tok:
            continue
        if tok == "*":
            if aggregates:
                raise SparqlSyntaxError("select * cannot be combined with aggregates")
            star = True
            continue
        if not tok.startswith("?"):
            raise SparqlSyntaxError(f"projection terms must be variables, got {tok!r}")
        if tok[1:].startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        if tok[1:] not in plain_vars:
            plain_vars.append(tok[1:])
    if aggregates:
        if distinct:
            raise SparqlSyntaxError("select distinct with aggregates is not supported")
        aliases = [a.alias for a in aggregates]
        # case-INSENSITIVE collision check: Spark resolves column names
        # case-insensitively by default, so ?c vs ?C is ambiguous there
        dup = {a.lower() for a in aliases} & {v.lower() for v in plain_vars}
        if dup:
            raise SparqlSyntaxError(f"aggregate alias collides with projected variable: {sorted(dup)}")
        if len(set(aliases)) != len(aliases):
            raise SparqlSyntaxError("duplicate aggregate aliases")
        not_grouped = [v for v in plain_vars if v not in group_by]
        if not_grouped:
            raise SparqlSyntaxError(f"projected variables not in group by: {not_grouped}")
        projection = plain_vars + aliases
    elif group_by:
        raise SparqlSyntaxError("group by requires at least one aggregate projection")
    else:
        projection = [] if star else plain_vars

    # SPARQL 1.1 subquery: one nested { select … } group comes out of the
    # body FIRST (its inner text may legally contain every keyword the
    # outer grammar checks for — union, filter, optional — and must not
    # trip the outer detection)
    sub_text, body = _extract_subselect(body)
    subquery: ParsedQuery | None = None
    if sub_text is not None:
        if re.search(r"\{\s*select\b", body, re.IGNORECASE):
            raise SparqlSyntaxError("at most one subquery group is supported")
        subquery = parse_sparql(sub_text)

    # { … } union { … } alternation: detected before optional/filter
    # extraction (branches are plain BGPs; combining union with
    # filter/optional is not supported)
    union_branches: list[list[Condition]] = []
    if re.search(r"(?i)\bunion\b", body):
        if re.search(r"(?i)\b(filter|optional|minus|values|bind)\b", body):
            raise SparqlSyntaxError(
                "filter/optional/minus/values/bind combined with union is not supported"
            )
        if aggregates:
            raise SparqlSyntaxError("aggregates combined with union are not supported")
        if subquery is not None:
            raise SparqlSyntaxError("a subquery combined with union is not supported")
        branch_bodies = re.findall(r"\{([^{}]*)\}", body)
        residue = [t.lower() for t in _WS.split(re.sub(r"\{[^{}]*\}", " ", body).strip()) if t]
        if len(branch_bodies) < 2 or residue != ["union"] * (len(branch_bodies) - 1):
            raise SparqlSyntaxError(f"malformed union clause: {body[:120]!r}")
        cid = 1
        for bb in branch_bodies:
            grp = _parse_patterns_from(bb, cid)
            if not grp:
                raise SparqlSyntaxError("empty union branch")
            union_branches.append(grp)
            cid += len(grp)
        if having is not None:
            raise SparqlSyntaxError("having combined with union is not supported")
        q = ParsedQuery(
            projection=projection,
            conditions=union_branches[0],
            distinct=distinct,
            order=order,
            limit=limit,
            offset=offset,
            union_branches=union_branches,
            text=src,
        )
        return _validate(q)

    # filter [not] exists { … } / optional { … } / minus { … } groups
    # (non-nested) come out of the body first — exists before the generic
    # filter grammar so its braces never reach the comparison regexes
    exists_raw: list[tuple[bool, str]] = []
    optional_bodies: list[str] = []
    minus_bodies: list[str] = []

    # a FILTER nested INSIDE a minus group — or a FILTER EXISTS nested
    # inside an optional group — must fail loudly: the exists grab below
    # runs on the whole body, so without this guard a nested 'filter
    # exists { … }' would be silently HOISTED to a top-level filter —
    # changing semantics identically on both engines, which the oracle
    # cross-check can therefore never catch.  (Simple single-clause
    # filters inside OPTIONAL are supported: they extract into the group's
    # own filter list below and apply BEFORE the left join — the
    # LeftJoin(P1, P2, E) semantics for E over group-local variables.)
    for gm in re.finditer(r"(?is)\b(optional|minus)\s*\{", body):
        depth, i = 0, gm.end() - 1
        while i < len(body):
            if body[i] == "{":
                depth += 1
            elif body[i] == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        inner = body[gm.end() : i]
        kind_l = gm.group(1).lower()
        if kind_l == "minus" and re.search(r"(?i)\bfilter\b", inner):
            raise SparqlSyntaxError(
                "filter inside a minus group is not supported "
                "(write it at the top level, where it applies after the join)"
            )
        if kind_l == "optional" and re.search(r"(?i)\bfilter\s+(not\s+)?exists\b", inner):
            raise SparqlSyntaxError(
                "filter [not] exists inside an optional group is not supported"
            )

    def _grab_exists(m2: re.Match) -> str:
        exists_raw.append((m2.group(1) is None, m2.group(2)))
        return " "

    optional_filter_lists: list[list[Filter]] = []

    optional_parents: list[int] = []

    def _grab_optional(m2: re.Match) -> str:
        flts: list[Filter] = []
        rem = _strip_simple_filters(m2.group(1), flts)
        if re.search(r"(?i)\bfilter\b", rem):
            raise SparqlSyntaxError(
                "unsupported filter form inside an optional group (supported:"
                " bound / arithmetic / regex / comparison single-clause"
                " filters and ||/&&/! connectives over the row-local forms)"
            )
        # nested OPTIONAL: inner groups were grabbed on an earlier pass of
        # the innermost-first loop and left a marker in this body — claim
        # them as children of THIS group (LeftJoin(A, LeftJoin(B, …))
        # algebra, §18.2.2.6)
        idx = len(optional_bodies)
        for mk in re.findall(r"\x00OPT(\d+)\x00", rem):
            optional_parents[int(mk)] = idx
        rem = re.sub(r"\x00OPT\d+\x00", " ", rem)
        optional_bodies.append(rem)
        optional_filter_lists.append(flts)
        optional_parents.append(-1)
        return f" \x00OPT{idx}\x00 "

    def _grab_minus(m2: re.Match) -> str:
        minus_bodies.append(m2.group(1))
        return " "

    body = re.sub(r"(?is)filter\s+(not\s+)?exists\s*\{([^{}]*)\}\s*\.?", _grab_exists, body)
    # innermost-first loop: the brace-free pattern only matches a group
    # whose body holds no nested braces, so each pass peels one nesting
    # level (inner groups replaced by \x00OPT{i}\x00 markers that the
    # enclosing group claims on the next pass); markers surviving in the
    # top-level body are root groups — stripped here, parent stays -1
    while True:
        body, n_subs = re.subn(r"(?is)optional\s*\{([^{}]*)\}\s*\.?", _grab_optional, body)
        if n_subs == 0:
            break
    body = re.sub(r"\x00OPT\d+\x00\s*\.?", " ", body)
    body = re.sub(r"(?is)minus\s*\{([^{}]*)\}\s*\.?", _grab_minus, body)

    # then filter clauses (the single-clause forms shared with optional
    # groups — bound / arith / regex / cmp, in that order)
    filters: list[Filter] = []
    body = _strip_simple_filters(body, filters)

    # values ?X { <c1> <c2> … } — single-variable inline binding, lowered
    # to an IN filter.  Duplicate constants are rejected: the IN lowering
    # cannot reproduce the bag multiplicity SPARQL assigns to duplicates.
    def _grab_values(m2: re.Match) -> str:
        var = m2.group(1)[1:]
        items = [Term(t).lexical for t in _WS.split(m2.group(2).strip()) if t]
        if not items:
            raise SparqlSyntaxError("empty values clause")
        if any(t.startswith("?") for t in items):
            raise SparqlSyntaxError("values items must be constants")
        if len(set(items)) != len(items):
            raise SparqlSyntaxError("duplicate constants in values clause")
        filters.append(Filter(kind="in", var=var, consts=tuple(items)))
        return " "

    # values (?a ?b …) { (<c> <c> …) … } — multi-variable row bindings,
    # lowered to a row-IN predicate (inner-join semantics with a constant
    # bindings table) when every slot is ground, or to an OR of per-row
    # conjunctions when a row carries UNDEF (§10.2.2: an UNDEF slot leaves
    # its variable unconstrained in that row — represented as None; the
    # conjunction simply omits it).  Duplicate rows stay rejected: the
    # predicate lowering cannot express bag multiplicity.
    def _grab_values_rows(m2: re.Match) -> str:
        vars_ = tuple(v[1:] for v in _WS.split(m2.group(1).strip()) if v)
        if len(set(vars_)) != len(vars_):
            raise SparqlSyntaxError("duplicate variables in values clause")
        rows: list[tuple[str | None, ...]] = []
        for rm in re.finditer(r"\(([^()]*)\)", m2.group(2)):
            items = [t for t in _WS.split(rm.group(1).strip()) if t]
            if len(items) != len(vars_):
                raise SparqlSyntaxError(
                    f"values row arity {len(items)} != variable count {len(vars_)}"
                )
            if any(t.startswith("?") for t in items):
                raise SparqlSyntaxError("values rows must be constants or UNDEF")
            rows.append(
                tuple(
                    None if t.upper() == "UNDEF" else Term(t).lexical for t in items
                )
            )
        if not rows:
            raise SparqlSyntaxError("empty values clause")
        if len(set(rows)) != len(rows):
            raise SparqlSyntaxError("duplicate rows in values clause")
        filters.append(Filter(kind="in_rows", var=vars_[0], vars_=vars_, rows=tuple(rows)))
        return " "

    body = re.sub(
        r"(?is)values\s*\(\s*((?:\?\w+\s*)+)\)\s*\{((?:\s*\([^()]*\))+)\s*\}\s*\.?",
        _grab_values_rows,
        body,
    )
    body = re.sub(r"(?is)values\s+(\?\w+)\s*\{([^{}]*)\}\s*\.?", _grab_values, body)

    # bind(?src as ?alias) / bind(<const> as ?alias): variable aliasing and
    # constant binding; bind(?v ± n as ?alias) additionally computes over
    # the TYPED NUMERIC VALUE layer (sources/triples.numeric_value_sql) —
    # the alias carries a plain number, not a dictionary id (id arithmetic
    # remains meaningless and is not offered)
    binds: list[tuple[str, object, str]] = []

    def _grab_bind_coalesce(m2: re.Match) -> str:
        alias = m2.group(2)[1:]
        if alias.startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        vars_ = tuple(v[1:] for v in re.findall(r"\?\w+", m2.group(1)))
        binds.append(("coalesce", vars_, alias))
        return " "

    # bind(coalesce(?a, ?b, …) as ?x): first bound (non-NULL) argument —
    # the standard fallback idiom after OPTIONAL (SPARQL 1.1 §17.4.1.3);
    # grabbed BEFORE the plain-bind grammar, whose token rule would reject
    # the parenthesized argument list
    body = re.sub(
        r"(?is)bind\s*\(\s*coalesce\s*\(\s*(\?\w+(?:\s*,\s*\?\w+)+)\s*\)\s+as\s+(\?\w+)\s*\)\s*\.?",
        _grab_bind_coalesce,
        body,
    )

    def _grab_bind_if(m2: re.Match) -> str:
        alias = m2.group(6)[1:]
        if alias.startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        binds.append(
            (
                "if",
                (
                    m2.group(1)[1:],
                    m2.group(2),
                    int(m2.group(3)),
                    int(m2.group(4)),
                    int(m2.group(5)),
                ),
                alias,
            )
        )
        return " "

    def _grab_bind_concat(m2: re.Match) -> str:
        alias = m2.group(2)[1:]
        if alias.startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        args: list[tuple[str, str]] = []
        for tok in re.findall(r'\?\w+|"[^"]*"', m2.group(1)):
            if tok.startswith("?"):
                args.append(("v", tok[1:]))
            else:
                args.append(("l", tok[1:-1]))
        if not any(k == "v" for k, _ in args):
            raise SparqlSyntaxError(
                "concat() must reference at least one variable"
            )
        binds.append(("concat", tuple(args), alias))
        return " "

    # bind(concat(arg, arg, …) as ?x) with args ?var | "literal": the
    # alias carries the CONCATENATED DECODED LEXICALS — a STRING, not a
    # dictionary id (see ParsedQuery.string_bind_aliases).  An unbound
    # (OPTIONAL-miss) variable argument is a CONCAT type error, so the
    # alias stays unbound for that row — NULL-propagating concatenation
    # on both engines (Spark concat(), DuckDB ||).
    body = re.sub(
        r'(?is)bind\s*\(\s*concat\s*\(\s*((?:\?\w+|"[^"]*")(?:\s*,\s*(?:\?\w+|"[^"]*"))*)\s*\)'
        r"\s+as\s+(\?\w+)\s*\)\s*\.?",
        _grab_bind_concat,
        body,
    )

    def _grab_bind_str(m2: re.Match) -> str:
        alias = m2.group(2)[1:]
        if alias.startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        binds.append(("concat", (("v", m2.group(1)[1:]),), alias))
        return " "

    # bind(str(?v) as ?x): the variable's decoded lexical as a STRING —
    # the 1-argument degenerate of concat, same alias value space
    body = re.sub(
        r"(?is)bind\s*\(\s*str\s*\(\s*(\?\w+)\s*\)\s+as\s+(\?\w+)\s*\)\s*\.?",
        _grab_bind_str,
        body,
    )

    # bind(if(?v op n, then, else) as ?x): numeric conditional over the
    # TYPED NUMERIC VALUE — integer branches only, so the alias carries a
    # plain number like the arithmetic binds; a non-numeric ?v is a
    # condition type error and leaves the alias UNBOUND (SPARQL §17.4.1.2
    # error propagation through IF), see sources/triples.if_numeric_sql.
    # Grabbed BEFORE the plain-bind grammar (parenthesized argument list).
    body = re.sub(
        r"(?is)bind\s*\(\s*if\s*\(\s*(\?\w+)\s*(!=|<=|>=|<|>|=)\s*(-?\d+)\s*,"
        r"\s*(-?\d+)\s*,\s*(-?\d+)\s*\)\s+as\s+(\?\w+)\s*\)\s*\.?",
        _grab_bind_if,
        body,
    )

    def _grab_bind_arith2(m2: re.Match) -> str:
        alias = m2.group(4)[1:]
        if alias.startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        binds.append(
            ("arith2", (m2.group(1)[1:], m2.group(2), m2.group(3)[1:]), alias)
        )
        return " "

    # bind(?a [+−×] ?b as ?x): two-variable arithmetic over the typed
    # numeric values — grabbed BEFORE the one-var arith grammar (whose rhs
    # is a literal integer) and the plain-bind grammar
    body = re.sub(
        r"(?is)bind\s*\(\s*(\?\w+)\s*([+*-])\s*(\?\w+)\s+as\s+(\?\w+)\s*\)\s*\.?",
        _grab_bind_arith2,
        body,
    )

    def _grab_bind_arith(m2: re.Match) -> str:
        alias = m2.group(4)[1:]
        if alias.startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        binds.append(("arith", (m2.group(1)[1:], m2.group(2), int(m2.group(3))), alias))
        return " "

    body = re.sub(
        r"(?is)bind\s*\(\s*(\?\w+)\s*([+*-])\s*(-?\d+)\s+as\s+(\?\w+)\s*\)\s*\.?",
        _grab_bind_arith,
        body,
    )

    def _grab_bind(m2: re.Match) -> str:
        src_t, alias = m2.group(1), m2.group(2)[1:]
        if alias.startswith("__seq"):
            raise SparqlSyntaxError(
                "variable names starting with '__seq' are reserved for "
                "sequence-path rewriting"
            )
        if src_t.startswith("?"):
            binds.append(("var", src_t[1:], alias))
        else:
            binds.append(("const", Term(src_t).lexical, alias))
        return " "

    body = re.sub(
        r"(?is)bind\s*\(\s*(\?\w+|<[^>]*>|[^\s()]+)\s+as\s+(\?\w+)\s*\)\s*\.?",
        _grab_bind,
        body,
    )
    if re.search(r"(?i)\b(filter|optional|minus|values|bind)\b", body):
        raise SparqlSyntaxError(
            f"unparsable filter/optional/minus/values/bind clause in: {body[:120]!r}"
        )

    conditions = _parse_patterns_from(body, 1)
    if not conditions:
        raise SparqlSyntaxError(
            "empty where clause"
            if subquery is None
            else "a subquery must be joined to at least one triple pattern"
        )
    if subquery is not None:
        outer_vars = {v for c in conditions for v in c.variables()}
        if not (set(subquery.projection) & outer_vars):
            raise SparqlSyntaxError(
                "subquery shares no projected variable with the outer patterns"
            )
        # case-insensitive: Spark column resolution would see ?cnt vs ?CNT
        # as the same name and fail with AMBIGUOUS_REFERENCE
        clash = {a.alias.lower() for a in subquery.aggregates} & {
            v.lower() for v in outer_vars
        }
        if clash:
            raise SparqlSyntaxError(
                f"subquery aggregate alias collides with an outer pattern variable: {sorted(clash)}"
            )
        # same hazard for PLAIN projected variables: an exact-name match is
        # the intended join key, but a case-only difference (?c vs ?C)
        # joins under Spark's case-insensitive resolution while remaining
        # two distinct columns — reject it
        for v in subquery.projection:
            twins = {w for w in outer_vars if w.lower() == v.lower() and w != v}
            if twins:
                raise SparqlSyntaxError(
                    f"subquery variable ?{v} differs only in case from outer "
                    f"variable(s) {sorted(twins)} — Spark resolves column names "
                    "case-insensitively; use the identical spelling to join"
                )
    optionals: list[list[Condition]] = []
    next_cid = len(conditions) + 1
    for ob in optional_bodies:
        grp = _parse_patterns_from(ob, next_cid)
        if not grp:
            raise SparqlSyntaxError("empty optional group")
        optionals.append(grp)
        next_cid += len(grp)
    minuses: list[list[Condition]] = []
    required_vars_ = {v for c in conditions for v in c.variables()}
    for mb in minus_bodies:
        grp = _parse_patterns_from(mb, next_cid)
        if not grp:
            raise SparqlSyntaxError("empty minus group")
        if not ({v for c in grp for v in c.variables()} & required_vars_):
            # SPARQL MINUS with disjoint domains removes nothing; our
            # anti-join lowering needs shared variables — reject explicitly
            raise SparqlSyntaxError("minus group shares no variable with the required patterns")
        minuses.append(grp)
        next_cid += len(grp)
    exists_groups: list[tuple[bool, list[Condition]]] = []
    for positive, eb in exists_raw:
        grp = _parse_patterns_from(eb, next_cid)
        if not grp:
            raise SparqlSyntaxError("empty exists group")
        if not ({v for c in grp for v in c.variables()} & required_vars_):
            # a variable-disjoint EXISTS is a global boolean gate, not a
            # per-row filter; the semi/anti-join lowering needs correlation
            raise SparqlSyntaxError(
                "filter exists group shares no variable with the required patterns"
            )
        exists_groups.append((positive, grp))
        next_cid += len(grp)

    # a variable introduced by one optional group must not also be
    # introduced by another, UNLESS the two groups are ancestor/descendant
    # (a child sharing its parent's variables is exactly how nesting
    # correlates) — SPARQL allows sibling re-binding; our left-join
    # translation does not
    def _ancestors(i: int) -> set[int]:
        out: set[int] = set()
        while optional_parents[i] != -1:
            i = optional_parents[i]
            out.add(i)
        return out

    required_vars = {v for c in conditions for v in c.variables()}
    new_by_group: list[set[str]] = [
        {v for c in grp for v in c.variables()} - required_vars for grp in optionals
    ]
    for i, new in enumerate(new_by_group):
        related = _ancestors(i) | {j for j in range(len(optionals)) if i in _ancestors(j)}
        for j in range(i):
            if j in related:
                continue
            clash = new & new_by_group[j]
            if clash:
                raise SparqlSyntaxError(
                    f"variable(s) bound in two optional groups: {sorted(clash)}"
                )
    # exactness guard for the nested lowering: at every nesting level the
    # child SUBTREE (the group plus all its descendants) joins into its
    # parent on their shared variables.  A column the subtree carries only
    # from a deeper descendant is NULL-able inside the subtree result, so
    # every variable the subtree shares with ANY binding site outside
    # itself (the required patterns, an ancestor's own patterns, or a
    # disjoint group) must occur in the IMMEDIATE parent's own patterns —
    # otherwise the equi-join key at some level can be NULL and drop rows
    # SPARQL's compatibility keeps.  (Checking only required_vars against
    # the whole ancestor chain — the previous form — missed a variable
    # bound by a grandparent and re-used in a non-immediate descendant.)
    group_vars = [{v for c in grp for v in c.variables()} for grp in optionals]
    subtree_vars: list[set[str]] = [set(gv) for gv in group_vars]
    # children fold into parents; iterate deepest-first (children always
    # have larger indices than their parents in parse order)
    for i in range(len(optionals) - 1, -1, -1):
        p = optional_parents[i]
        if p != -1:
            subtree_vars[p] |= subtree_vars[i]
    for i, grp in enumerate(optionals):
        p = optional_parents[i]
        if p == -1:
            continue
        in_subtree = {i} | {j for j in range(len(optionals)) if i in _ancestors(j)}
        outside_bound = set(required_vars)
        for j in range(len(optionals)):
            if j not in in_subtree:
                outside_bound |= group_vars[j]
        loose = (subtree_vars[i] & outside_bound) - group_vars[p]
        if loose:
            raise SparqlSyntaxError(
                f"nested optional variable(s) {sorted(loose)} are bound both "
                "inside this subtree and outside it, but not in the immediate "
                "enclosing optional group — the equi-join lowering cannot "
                "express that compatibility"
            )

    if having is not None and not aggregates:
        raise SparqlSyntaxError(
            "having requires an aggregate projection (the translator's "
            "grouped path carries the having filter)"
        )
    q = ParsedQuery(
        projection=projection,
        conditions=conditions,
        distinct=distinct,
        order=order,
        limit=limit,
        offset=offset,
        having=having,
        filters=filters,
        optionals=optionals,
        optional_filters=optional_filter_lists,
        optional_parent=optional_parents,
        minuses=minuses,
        exists_groups=exists_groups,
        aggregates=aggregates,
        group_by=group_by,
        subquery=subquery,
        binds=binds,
        text=src,
    )
    return _validate(q)


def _extract_subselect(body: str) -> tuple[str | None, str]:
    """Pull the first ``{ select … }`` group out of a WHERE body via
    balanced-brace scanning (regex alone cannot match nested braces);
    returns (inner text or None, remaining body)."""
    m = re.search(r"\{\s*select\b", body, re.IGNORECASE)
    if not m:
        return None, body
    start = m.start()
    depth = 0
    for i in range(start, len(body)):
        if body[i] == "{":
            depth += 1
        elif body[i] == "}":
            depth -= 1
            if depth == 0:
                inner = body[start + 1 : i]
                rest = body[:start] + " " + re.sub(r"^\s*\.", " ", body[i + 1 :], count=1)
                return inner, rest
    raise SparqlSyntaxError("unbalanced braces in subquery group")


def _parse_patterns_from(text_: str, start: int) -> list[Condition]:
    out: list[Condition] = []
    for pat in (p.strip() for p in re.split(r"\s+\.(?:\s+|$)", text_.strip())):
        pat = pat.strip().rstrip(".").strip()
        if not pat:
            continue
        terms = _WS.split(pat)
        if len(terms) != 3:
            raise SparqlSyntaxError(f"triple pattern needs 3 terms, got {terms!r}")
        for st in (terms[0], terms[2]):
            # markers only matter OUTSIDE bracketed constants (an IRI may
            # contain any of them); on s/o slots only a path suffix/prefix
            # shape is plausibly a user mistake — reject those loudly
            sm = _mask_brackets(st)
            # a trailing '?' on a CONSTANT is also a (misplaced) path
            # marker — without this check Term.lexical would silently
            # strip it and the typo'd query would run as if unmarked
            if (
                sm.endswith(("+", "*"))
                or (not st.startswith("?") and sm.endswith("?"))
                or sm.startswith("^")
                or "|" in sm
                or "/" in sm
            ):
                raise SparqlSyntaxError(
                    f"path markers are only valid on a predicate: {st!r}"
                )
        for t in terms:
            if t.startswith("?") and t[1:].startswith("__seq"):
                raise SparqlSyntaxError(
                    "variable names starting with '__seq' are reserved for "
                    "sequence-path rewriting"
                )
            # a variable token must be ?\w+ exactly: '?N?' (a typo'd path
            # marker on a variable) would otherwise silently parse as a
            # DISTINCT variable named 'N?' that never joins with ?N
            if t.startswith("?") and not re.fullmatch(r"\?\w+", t):
                raise SparqlSyntaxError(f"malformed variable token: {t!r}")
        p = terms[1]
        if p.startswith("!"):
            # NegatedPropertySet — validated standalone; never a sequence
            _check_pred_markers(p)
            out.append(Condition(start + len(out), Term(terms[0]), Term(p), Term(terms[2])))
            continue
        if "/" in _mask_brackets(p) and not p.startswith("?"):
            # SequencePath p1/p2/…: rewrite into chained patterns through
            # fresh internal variables (never projectable — see
            # all_variables).  Each hop carries its own +/^/| marker and is
            # validated like a standalone predicate.
            hops = _split_outside_brackets(p, "/")
            if any(not h for h in hops):
                raise SparqlSyntaxError(f"malformed sequence path: {p!r}")
            if any(h.lstrip("^").startswith("?") for h in hops):
                raise SparqlSyntaxError(
                    f"sequence-path hops must be constant predicates: {p!r}"
                )
            subj = terms[0]
            for j, hop in enumerate(hops):
                _check_pred_markers(hop)
                last = j == len(hops) - 1
                obj = terms[2] if last else f"?__seq{start + len(out)}"
                out.append(Condition(start + len(out), Term(subj), Term(hop), Term(obj)))
                subj = obj
            continue
        _check_pred_markers(p)
        out.append(Condition(start + len(out), Term(terms[0]), Term(terms[1]), Term(terms[2])))
    return out


def _strip_simple_filters(body: str, filters: list[Filter]) -> str:
    """Extract the single-clause FILTER forms from ``body`` into
    ``filters``, returning the remaining text.  Order matters:

    - BOUND test ``filter ([!]bound(?v))`` — NULL test on an
      OPTIONAL-bound variable (SPARQL negation-by-failure, §17.4.1.1);
    - arithmetic FILTER ``filter (?v [±·n] op <int>)`` — BEFORE the
      generic cmp rule (whose rhs pattern would swallow a bare integer as
      an unresolvable constant); compares the TYPED NUMERIC VALUE
      (non-numeric terms → NULL → dropped, the type-error contract);
    - string-function FILTERs ``filter [(]contains|strstarts|strends(?v,
      "lit")[)]`` and ``filter (strlen(?v) op <int>)`` — evaluated on the
      decoded lexical via a one-column dict join (SPARQL 1.1 CONTAINS /
      STRSTARTS / STRENDS / STRLEN over simple literals);
    - ``filter regex(?v, "pat")`` on the decoded lexical;
    - ordering/equality comparisons on dictionary ids (the arithmetic id
      scheme is order-preserving within an entity kind, so same-kind
      range filters are meaningful — the caller owns kind-compatibility).

    Shared by the top-level grammar and OPTIONAL group bodies."""

    def _parse_boolop_part(txt: str) -> Filter:
        """One operand of a ``||`` / ``&&`` filter: the row-local forms
        only (bound / arith / arith2[+abs] / in / cmp, tried in the same
        order as the single-clause rules so e.g. ``?v = 5`` keeps its
        typed-numeric-VALUE reading).  The join-backed forms (regex and
        the string functions) cannot ride a disjunction — each would need
        its dict join applied unconditionally — and are rejected."""
        txt = txt.strip()
        # strip ALL redundant outer paren layers (loop, not once): the
        # recursive grammar legally produces ((A || B)) operands
        txt, _ = _peel_outer_parens(txt)
        # nested connectives FIRST — this makes the grammar fully
        # recursive: ``!(A || B)``, ``(A || B) && C``, and mixed
        # connectives with explicit grouping ``A || (B && C)`` all lower
        # to nested boolop trees (both renderers recurse on parts).  The
        # scan must precede the ``!`` rule so ``!(A) || B`` reads as
        # ``(!A) || B`` — unary ! binds tighter than the connectives.
        conns, cuts = _scan_connectives(txt)
        if conns:
            if len(set(conns)) > 1:
                raise SparqlSyntaxError(
                    "mixed || and && in one filter require explicit grouping"
                )
            pieces, prev = [], 0
            for c in cuts:
                pieces.append(txt[prev:c])
                prev = c + 2
            pieces.append(txt[prev:])
            return Filter(
                kind="boolop", var="", op=conns[0],
                parts=tuple(_parse_boolop_part(p) for p in pieces),
            )
        # !(simple): logical negation (§17.4.1.7 fn:not) — one-operand
        # boolop; NOT over a NULL'd operand stays NULL on both engines,
        # matching SPARQL !(error) = error (the row drops either way)
        if txt.startswith("!") and re.match(r"!\s*\(", txt):
            return Filter(
                kind="boolop", var="", op="!",
                parts=(_parse_boolop_part(txt[1:]),),
            )
        m2 = re.fullmatch(r"(?is)(!)?\s*bound\s*\(\s*(\?\w+)\s*\)", txt)
        if m2:
            return Filter(kind="bound", var=m2.group(2)[1:], op=("!" if m2.group(1) else ""))
        m2 = re.fullmatch(r"(?is)(!)?\s*isnumeric\s*\(\s*(\?\w+)\s*\)", txt)
        if m2:
            return Filter(kind="isnum", var=m2.group(2)[1:], op=("!" if m2.group(1) else ""))
        m2 = re.fullmatch(
            r"(?is)abs\s*\(\s*(\?\w+)\s*([+*-])\s*(\?\w+)\s*\)\s*(!=|<=|>=|<|>|=)\s*(-?\d+)", txt
        )
        if m2:
            return Filter(
                kind="arith2", var=m2.group(1)[1:], lhs_op=m2.group(2),
                rhs_var=m2.group(3)[1:], op=m2.group(4), rhs_num=int(m2.group(5)),
                abs_fn=True,
            )
        m2 = re.fullmatch(
            r"(?is)(\?\w+)\s*([+*-])\s*(\?\w+)\s*(!=|<=|>=|<|>|=)\s*(-?\d+)", txt
        )
        if m2:
            return Filter(
                kind="arith2", var=m2.group(1)[1:], lhs_op=m2.group(2),
                rhs_var=m2.group(3)[1:], op=m2.group(4), rhs_num=int(m2.group(5)),
            )
        m2 = re.fullmatch(
            r"(?is)(\?\w+)\s*(?:([+*-])\s*(-?\d+)\s*)?(!=|<=|>=|<|>|=)\s*(-?\d+)", txt
        )
        if m2:
            return Filter(
                kind="arith", var=m2.group(1)[1:], lhs_op=m2.group(2),
                lhs_num=int(m2.group(3)) if m2.group(3) is not None else None,
                op=m2.group(4), rhs_num=int(m2.group(5)),
            )
        m2 = re.fullmatch(r"(?is)(\?\w+)\s+(not\s+)?in\s*\(([^()]*)\)", txt)
        if m2:
            items = [
                t.strip()
                for t in _split_outside_brackets(m2.group(3), ",")
                if t.strip()
            ]
            if not items:
                raise SparqlSyntaxError("empty IN list")
            if any(t.startswith("?") for t in items):
                raise SparqlSyntaxError("IN list items must be constants")
            lex = tuple(Term(t).lexical for t in items)
            if len(set(lex)) != len(lex):
                raise SparqlSyntaxError("duplicate constants in IN list")
            return Filter(kind="in", var=m2.group(1)[1:], op="!" if m2.group(2) else "", consts=lex)
        # sameTerm as a connective atom — same id-equality lowering as the
        # single-clause rule (dictionary bijection: sameTerm ≡ `=`)
        m2 = re.fullmatch(
            r"(?is)(!)?\s*sameterm\s*\(\s*(\?\w+)\s*,\s*(\?\w+|<[^>]*>|[^\s(),]+)\s*\)", txt
        )
        if m2:
            var, rhs = m2.group(2)[1:], m2.group(3)
            op = "!=" if m2.group(1) else "="
            if rhs.startswith("?"):
                return Filter(kind="cmp", var=var, op=op, rhs_var=rhs[1:])
            return Filter(kind="cmp", var=var, op=op, rhs_const=Term(rhs).lexical)
        m2 = re.fullmatch(r"(?is)(\?\w+)\s*(!=|<=|>=|<|>|=)\s*(\?\w+|<[^>]*>|[^\s()]+)", txt)
        if m2:
            var, op, rhs = m2.group(1)[1:], m2.group(2), m2.group(3)
            if rhs.startswith("?"):
                return Filter(kind="cmp", var=var, op=op, rhs_var=rhs[1:])
            return Filter(kind="cmp", var=var, op=op, rhs_const=Term(rhs).lexical)
        raise SparqlSyntaxError(
            f"unsupported operand in ||/&& filter: {txt!r} (row-local forms "
            "only: comparison / arithmetic / IN / bound)"
        )


    def _boolop_outcome(raw_expr: str) -> str | None:
        """Process one balanced ``filter ( … )`` body for the connective
        layer: returns ``" "`` when claimed (a Filter was appended), a
        canonical re-emission string when redundant outer parens were
        peeled off a single clause, or ``None`` to leave the original
        text for the single-clause rules."""
        # peel redundant outer paren layers first: `filter ((A || B))` must
        # scan the INNER expression (the outer layer hides the connectives
        # at depth 1), and `filter ((A))` must reach the single-clause
        # rules in their canonical one-paren form
        expr, peeled = _peel_outer_parens(raw_expr.strip())
        # find top-level connectives (see _scan_connectives for the quote/
        # IRI/paren handling); no connective means some single-clause rule
        # owns this filter — leave it intact (re-emitted in canonical form
        # when layers were peeled, so those rules can match)
        conns, cuts = _scan_connectives(expr)
        if not conns:
            # no connective: claim only the standalone negation form
            # ``filter (!(simple))`` — everything else falls through to
            # the single-clause rules (including !bound, which has its
            # own rule and reading)
            e = expr.strip()
            if e.startswith("!") and re.match(r"!\s*\(", e):
                filters.append(
                    Filter(kind="boolop", var="", op="!", parts=(_parse_boolop_part(e[1:]),))
                )
                return " "
            if peeled:
                # canonical one-paren re-emission; the single-clause rules
                # run after this pass and will claim it (the consumed
                # separator dot, if any, was only the filter's own)
                return f" filter ({e}) "
            return None
        if len(set(conns)) > 1:
            raise SparqlSyntaxError(
                "mixed || and && in one filter require explicit grouping"
            )
        pieces, prev = [], 0
        for c in cuts:
            pieces.append(expr[prev:c])
            prev = c + 2
        pieces.append(expr[prev:])
        filters.append(
            Filter(
                kind="boolop",
                var="",
                op=conns[0],
                parts=tuple(_parse_boolop_part(p) for p in pieces),
            )
        )
        return " "

    def _grab_strfn(m2: re.Match) -> str:
        filters.append(
            Filter(kind="str", var=m2.group(2)[1:], op=m2.group(1).lower(), pattern=m2.group(3))
        )
        return " "

    def _grab_strlen(m2: re.Match) -> str:
        filters.append(
            Filter(kind="strlen", var=m2.group(1)[1:], op=m2.group(2), rhs_num=int(m2.group(3)))
        )
        return " "

    def _grab_strcase(m2: re.Match) -> str:
        # ucase/lcase(?v) =/!= "lit": the comparison operator rides in
        # lhs_op (op already names the function, like the other str forms)
        filters.append(
            Filter(
                kind="str",
                var=m2.group(2)[1:],
                op=m2.group(1).lower(),
                lhs_op=m2.group(3),
                pattern=m2.group(4),
            )
        )
        return " "

    def _grab_substr(m2: re.Match) -> str:
        # substr(?v, start[, len]) =/!= "lit" — 1-based start (SPARQL
        # §17.4.3.3, identical in Spark substring and DuckDB substr);
        # start ≥ 1 required: the grammar's \d+ admits no sign but does
        # admit 0, whose semantics diverge across engines
        if int(m2.group(2)) < 1:
            raise SparqlSyntaxError("substr start position must be >= 1")
        filters.append(
            Filter(
                kind="str",
                var=m2.group(1)[1:],
                op="substr",
                lhs_num=int(m2.group(2)),
                rhs_num=int(m2.group(3)) if m2.group(3) is not None else None,
                lhs_op=m2.group(4),
                pattern=m2.group(5),
            )
        )
        return " "

    def _grab_replace(m2: re.Match) -> str:
        # replace(?v, "pat", "rep") =/!= "lit" — SPARQL REPLACE
        # (§17.4.3.15) is REGEX-based and global (every match); pat rides
        # in pattern, rep in rhs_var (a spare slot — never a variable for
        # str filters), the target literal in rhs_const, comparator in
        # lhs_op
        filters.append(
            Filter(
                kind="str",
                var=m2.group(1)[1:],
                op="replace",
                pattern=m2.group(2),
                rhs_var=m2.group(3),
                lhs_op=m2.group(4),
                rhs_const=m2.group(5),
            )
        )
        return " "

    def _grab_strslice(m2: re.Match) -> str:
        # strbefore/strafter(?v, "sep") =/!= "lit" — separator extraction
        # on the decoded lexical; both sides of the comparison are literals
        # (sep in pattern, the target in rhs_const, comparator in lhs_op)
        if m2.group(3) == "":
            raise SparqlSyntaxError(
                f"{m2.group(1).lower()} separator must be non-empty"
            )
        filters.append(
            Filter(
                kind="str",
                var=m2.group(2)[1:],
                op=m2.group(1).lower(),
                pattern=m2.group(3),
                lhs_op=m2.group(4),
                rhs_const=m2.group(5),
            )
        )
        return " "

    def _grab_bound(m2: re.Match) -> str:
        filters.append(
            Filter(kind="bound", var=m2.group(2)[1:], op=("!" if m2.group(1) else ""))
        )
        return " "

    def _grab_isnum(m2: re.Match) -> str:
        # filter ([!]isNumeric(?v)) — SPARQL §17.4.2.4 type introspection,
        # lowered to the typed-value window test (numeric_value_sql IS
        # [NOT] NULL).  The store's one introspectable type axis: the id
        # scheme has a numeric-literal window but no IRI-vs-string-literal
        # tag, so isIRI/isLiteral are NOT offered rather than guessed.
        filters.append(
            Filter(kind="isnum", var=m2.group(2)[1:], op=("!" if m2.group(1) else ""))
        )
        return " "

    def _grab_arith(m2: re.Match) -> str:
        filters.append(
            Filter(
                kind="arith",
                var=m2.group(1)[1:],
                lhs_op=m2.group(2),
                lhs_num=int(m2.group(3)) if m2.group(3) is not None else None,
                op=m2.group(4),
                rhs_num=int(m2.group(5)),
            )
        )
        return " "

    def _grab_arith2(m2: re.Match) -> str:
        # ?a [+−×] ?b cmp <int>: two-variable arithmetic over the typed
        # numeric values (sources/triples.arith2_sql) — lhs_op carries the
        # arithmetic operator, rhs_var the second operand
        filters.append(
            Filter(
                kind="arith2",
                var=m2.group(1)[1:],
                lhs_op=m2.group(2),
                rhs_var=m2.group(3)[1:],
                op=m2.group(4),
                rhs_num=int(m2.group(5)),
            )
        )
        return " "

    def _grab_arith2_abs(m2: re.Match) -> str:
        # abs(?a [+−×] ?b) cmp <int>: the magnitude form of arith2 (ABS is
        # SPARQL §17.4.4.4; the expression stays exact in int64 — |a op b|
        # never exceeds the operands' product bound)
        filters.append(
            Filter(
                kind="arith2",
                var=m2.group(1)[1:],
                lhs_op=m2.group(2),
                rhs_var=m2.group(3)[1:],
                op=m2.group(4),
                rhs_num=int(m2.group(5)),
                abs_fn=True,
            )
        )
        return " "

    def _grab_in(m2: re.Match) -> str:
        # filter (?v [not] in (<c>, <c>, …)) — SPARQL 1.1 §17.4.1.9/.10:
        # the same constant-membership lowering as single-variable VALUES
        # (an IN literal list on the encoded ids), with op="!" marking the
        # negated form.  NOT IN over a constant list has no NULL pitfall
        # here: the tested column is a pattern-bound id, never NULL at
        # filter time, and the list is ground by grammar.
        items = [t for t in _split_outside_brackets(m2.group(3), ",") if t.strip()]
        if not items:
            raise SparqlSyntaxError("empty IN list")
        lex = tuple(Term(t.strip()).lexical for t in items)
        if any(t.strip().startswith("?") for t in items):
            raise SparqlSyntaxError("IN list items must be constants")
        if len(set(lex)) != len(lex):
            raise SparqlSyntaxError("duplicate constants in IN list")
        filters.append(
            Filter(
                kind="in",
                var=m2.group(1)[1:],
                op="!" if m2.group(2) else "",
                consts=lex,
            )
        )
        return " "

    def _grab_regex(m2: re.Match) -> str:
        filters.append(Filter(kind="regex", var=m2.group(1)[1:], pattern=m2.group(2)))
        return " "

    def _grab_cmp(m2: re.Match) -> str:
        var, op, rhs = m2.group(1)[1:], m2.group(2), m2.group(3)
        if rhs.startswith("?"):
            filters.append(Filter(kind="cmp", var=var, op=op, rhs_var=rhs[1:]))
        else:
            filters.append(Filter(kind="cmp", var=var, op=op, rhs_const=Term(rhs).lexical))
        return " "

    # ||/&& connectives FIRST: a manual BALANCED-PAREN scan (a depth-capped
    # regex would silently skip deeply nested connective trees and have a
    # later rule reject them) that rewrites ONLY when a top-level
    # connective or negation is present — everything else falls through
    # verbatim to the single-clause rules below
    _filter_open = re.compile(r"(?is)\bfilter\s*\(")
    out_parts: list[str] = []
    pos = 0
    while True:
        mo = _filter_open.search(body, pos)
        if mo is None:
            out_parts.append(body[pos:])
            break
        # match the opening paren to its balanced close — quote-aware AND
        # IRI-aware: a '(' inside an atomic <…> constant must not derail
        # the pairing for the rest of the body (same hazard
        # _scan_connectives documents; an IRI legally contains parens)
        depth, in_str, j = 0, False, mo.end() - 1
        while j < len(body):
            ch = body[j]
            if ch == '"':
                in_str = not in_str
            elif not in_str:
                if ch == "<":
                    mi = _IRI_ATOM.match(body, j)
                    if mi:
                        j = mi.end()
                        continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
            j += 1
        if j >= len(body):  # unbalanced: leave for the later error report
            out_parts.append(body[pos:])
            break
        outcome = _boolop_outcome(body[mo.end() : j])
        if outcome is None:
            # unclaimed: keep verbatim (including any separator dot)
            out_parts.append(body[pos : j + 1])
            pos = j + 1
        else:
            # claimed or re-emitted: also consume the filter's own
            # optional trailing dot, exactly like the rule-regexes do
            out_parts.append(body[pos : mo.start()])
            out_parts.append(outcome)
            k = j + 1
            while k < len(body) and body[k] in " \t\n":
                k += 1
            pos = k + 1 if (k < len(body) and body[k] == ".") else j + 1
    body = "".join(out_parts)
    body = re.sub(
        r'(?is)filter\s*(\bcontains|\bstrstarts|\bstrends)\s*\(\s*(\?\w+)\s*,\s*"([^"]*)"\s*\)\s*\.?',
        _grab_strfn,
        body,
    )
    body = re.sub(
        r'(?is)filter\s*\(\s*(contains|strstarts|strends)\s*\(\s*(\?\w+)\s*,\s*"([^"]*)"\s*\)\s*\)\s*\.?',
        _grab_strfn,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*strlen\s*\(\s*(\?\w+)\s*\)\s*(!=|<=|>=|<|>|=)\s*(\d+)\s*\)\s*\.?",
        _grab_strlen,
        body,
    )
    body = re.sub(
        r'(?is)filter\s*\(\s*(ucase|lcase)\s*\(\s*(\?\w+)\s*\)\s*(!=|=)\s*"([^"]*)"\s*\)\s*\.?',
        _grab_strcase,
        body,
    )
    body = re.sub(
        r'(?is)filter\s*\(\s*(strbefore|strafter)\s*\(\s*(\?\w+)\s*,\s*"([^"]*)"\s*\)'
        r'\s*(!=|=)\s*"([^"]*)"\s*\)\s*\.?',
        _grab_strslice,
        body,
    )
    body = re.sub(
        r'(?is)filter\s*\(\s*replace\s*\(\s*(\?\w+)\s*,\s*"([^"]*)"\s*,\s*"([^"]*)"\s*\)'
        r'\s*(!=|=)\s*"([^"]*)"\s*\)\s*\.?',
        _grab_replace,
        body,
    )
    body = re.sub(
        r'(?is)filter\s*\(\s*substr\s*\(\s*(\?\w+)\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)\s*(!=|=)\s*"([^"]*)"\s*\)\s*\.?',
        _grab_substr,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*(!)?\s*bound\s*\(\s*(\?\w+)\s*\)\s*\)\s*\.?",
        _grab_bound,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*(!)?\s*isnumeric\s*\(\s*(\?\w+)\s*\)\s*\)\s*\.?",
        _grab_isnum,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*abs\s*\(\s*(\?\w+)\s*([+*-])\s*(\?\w+)\s*\)\s*(!=|<=|>=|<|>|=)\s*(-?\d+)\s*\)\s*\.?",
        _grab_arith2_abs,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*(\?\w+)\s*([+*-])\s*(\?\w+)\s*(!=|<=|>=|<|>|=)\s*(-?\d+)\s*\)\s*\.?",
        _grab_arith2,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*(\?\w+)\s*(?:([+*-])\s*(-?\d+)\s*)?(!=|<=|>=|<|>|=)\s*(-?\d+)\s*\)\s*\.?",
        _grab_arith,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*(\?\w+)\s+(not\s+)?in\s*\(([^()]*)\)\s*\)\s*\.?",
        _grab_in,
        body,
    )
    body = re.sub(r'(?is)filter\s+regex\(\s*(\?\w+)\s*,\s*"([^"]*)"\s*\)\s*\.?', _grab_regex, body)

    def _grab_sameterm(m2: re.Match) -> str:
        # sameTerm(a, b) (§17.4.1.8): syntactic term identity.  The
        # dictionary encoding is a bijection terms↔ids, so sameTerm IS id
        # equality — same lowering as `=` (which, over this engine's
        # all-IRI/plain-literal value space, never does the numeric
        # type-promotion that distinguishes the two in full SPARQL).
        var, rhs = m2.group(2)[1:], m2.group(3)
        op = "!=" if m2.group(1) else "="
        if rhs.startswith("?"):
            filters.append(Filter(kind="cmp", var=var, op=op, rhs_var=rhs[1:]))
        else:
            filters.append(Filter(kind="cmp", var=var, op=op, rhs_const=Term(rhs).lexical))
        return " "

    body = re.sub(
        r"(?is)filter\s*\(\s*(!)?\s*sameterm\s*\(\s*(\?\w+)\s*,\s*(\?\w+|<[^>]*>|[^\s(),]+)\s*\)\s*\)\s*\.?",
        _grab_sameterm,
        body,
    )
    body = re.sub(
        r"(?is)filter\s*\(\s*(\?\w+)\s*(!=|<=|>=|<|>|=)\s*(\?\w+|<[^>]*>|[^\s()]+)\s*\)\s*\.?",
        _grab_cmp,
        body,
    )
    return body


def _check_pred_markers(p: str) -> None:
    """Validate the path-marker grammar of one predicate slot (or one hop
    of a sequence path).  All character tests run on the bracket-MASKED
    text, so operator characters inside ``<…>`` constants never trip them."""
    if p.startswith("!"):
        # NegatedPropertySet !p / !(p1|p2): constant predicates only, '|'
        # the only operator inside
        body = p[1:]
        if body.startswith("(") != body.endswith(")"):
            raise SparqlSyntaxError(f"malformed negated property set: {p!r}")
        inner = body[1:-1] if body.startswith("(") else body
        mi = _mask_brackets(inner)
        if (
            not inner
            or "?" in mi
            or any(x in mi for x in ("+", "^", "/", "(", ")", "!"))
            or mi.startswith("|")
            or mi.endswith("|")
            or "||" in mi
        ):
            raise SparqlSyntaxError(
                f"negated property sets contain constant predicates only: {p!r}"
            )
        return
    m = _mask_brackets(p)
    # split off a trailing hop-count marker first: a '?' PREFIX is a
    # variable, a '?' SUFFIX on a constant is ZeroOrOnePath
    suffix = None
    if m.endswith(("+", "*")) or (not p.startswith("?") and m.endswith("?")):
        suffix = m[-1]
        m = m[:-1]
    if suffix is not None and (p.startswith("?") or not m):
        raise SparqlSyntaxError(f"path '{suffix}' requires a constant predicate")
    if m.startswith("(") and m.endswith(")"):
        # parenthesized alternation-closure group: (p1|p2)+ ONLY — the
        # union edge set's transitive closure; */? on a group would need
        # the zero-length identity machinery per pid-SET and is rejected
        if suffix != "+":
            raise SparqlSyntaxError(
                f"parenthesized path groups support only '+': {p!r}"
            )
        inner = m[1:-1]
        if (
            not inner
            or "|" not in inner
            or "?" in inner
            or any(x in inner for x in ("+", "*", "^", "/", "(", ")", "!"))
            or inner.startswith("|")
            or inner.endswith("|")
            or "||" in inner
        ):
            raise SparqlSyntaxError(
                f"a path group must be a plain alternation of constant "
                f"predicates: {p!r}"
            )
        return
    if ("^" in m or "|" in m) and ("?" in m):
        raise SparqlSyntaxError("path '^'/'|' require constant predicates")
    if ("^" in m and m.count("^") > 1) or m.startswith("|") or m.endswith("|") or "||" in m:
        raise SparqlSyntaxError(f"malformed property path: {p!r}")
    if (suffix is not None) + ("^" in m) + ("|" in m) > 1:
        raise SparqlSyntaxError(
            f"combined path operators are not supported (one of +/*/?/^/| per predicate): {p!r}"
        )
    if "^" in m and not m.startswith("^"):
        raise SparqlSyntaxError(f"'^' must prefix the predicate: {p!r}")


def _validate(q: ParsedQuery) -> ParsedQuery:
    aliases = {a.alias for a in q.aggregates}
    if not q.projection:
        q.projection = q.all_variables()
    else:
        known = set(q.all_variables())
        missing = [v for v in q.projection if v not in known and v not in aliases]
        if missing:
            raise SparqlSyntaxError(f"projected variables not bound in where clause: {missing}")
    known = set(q.all_variables())
    bad_group = [v for v in q.group_by if v not in known]
    if bad_group:
        raise SparqlSyntaxError(f"group-by variables not bound in where clause: {bad_group}")
    bad_agg = [a.var for a in q.aggregates if a.var is not None and a.var not in known]
    if q.having is not None and q.having[0].var is not None and q.having[0].var not in known:
        bad_agg.append(q.having[0].var)
    if bad_agg:
        raise SparqlSyntaxError(f"aggregate variables not bound in where clause: {bad_agg}")
    bad_order = [v for v, _ in q.order if v not in q.projection]
    if bad_order:
        raise SparqlSyntaxError(f"order-by variables must be projected: {bad_order}")
    known = set(q.all_variables())
    arith_aliases = q.numeric_bind_aliases()
    str_aliases = q.string_bind_aliases()
    for f in q.filters:
        unbound = [v for v in f.refs() if v not in known]
        if unbound:
            raise SparqlSyntaxError(f"filter variables not bound in where clause: {unbound}")
        # alias value-space checks apply PER LEAF OPERAND for boolop (each
        # leaf has its own kind and therefore its own reading of the
        # column; negation nodes nest, so flatten recursively)
        def _leaves(x):
            if x.kind == "boolop":
                for p in x.parts:
                    yield from _leaves(p)
            else:
                yield x

        for sub in _leaves(f):
            # an arithmetic BIND alias holds a plain NUMBER: only
            # arithmetic filters compare it meaningfully — an id-level
            # cmp/in/regex/bound over it would silently mix values with
            # dictionary ids
            misused = [v for v in sub.refs() if v in arith_aliases]
            if misused and sub.kind not in ("arith", "arith2"):
                raise SparqlSyntaxError(
                    f"only arithmetic filters may reference arithmetic bind "
                    f"alias(es) {misused} (they carry numbers, not ids)"
                )
            # a string BIND alias (concat/str) holds a decoded lexical: no
            # filter form applies to it — id comparisons would mix value
            # spaces and the string-function forms join the dict on what
            # they assume is an id column
            str_misused = [v for v in sub.refs() if v in str_aliases]
            if str_misused:
                raise SparqlSyntaxError(
                    f"filters over string bind alias(es) are not supported: "
                    f"{str_misused} (they carry strings, not ids)"
                )
    # group_concat decodes its variable through the dictionary — an
    # arithmetic bind alias is a plain number with no dictionary entry
    # (sum/avg/min/max/sample/count over aliases aggregate the VALUE and
    # are supported)
    bad_gc = [a.alias for a in q.aggregates if a.fn == "group_concat" and a.var in arith_aliases]
    if bad_gc:
        raise SparqlSyntaxError(
            f"group_concat over arithmetic bind alias(es) is not supported: {bad_gc}"
        )
    # string bind aliases: aggregation, grouping, and ordering all assume
    # id or numeric columns — reject every use beyond plain projection
    bad_sagg = [a.alias for a in q.aggregates if a.var in str_aliases]
    if q.having is not None and q.having[0].var in str_aliases:
        bad_sagg.append("__having")
    bad_sgrp = [v for v in q.group_by if v in str_aliases]
    bad_sord = [v for v, _ in q.order if v in str_aliases]
    if bad_sagg or bad_sgrp or bad_sord:
        raise SparqlSyntaxError(
            "aggregates/group-by/order-by over string bind aliases are not "
            f"supported: {sorted(set(bad_sagg + bad_sgrp + bad_sord))}"
        )
    # optional-group filters: group-local forms (all vars bound by the
    # group's own patterns) lower to a pre-join filter; cmp/arith forms may
    # also reference OUTER variables — they become part of the left-join
    # condition (full LeftJoin(P1, P2, E)) — provided those variables are
    # bound by the required patterns, the subquery, or an EARLIER group
    # (a later group's column does not exist yet at join time)
    prior = {v for c in q.conditions for v in c.variables() if not v.startswith("__seq")}
    if q.subquery is not None:
        prior |= set(q.subquery.projection)
    parents = list(q.optional_parent or [-1] * len(q.optionals))
    for gi, (grp, flts) in enumerate(zip(q.optionals, q.optional_filters)):
        gvars = {v for c in grp for v in c.variables()}
        for f in flts:
            outside = [v for v in f.refs() if v not in gvars]
            # NESTED groups lower inside their parent's subtree where no
            # outer column exists yet — both engines support group-local
            # filters only there; reject at parse, not mid-translation
            if outside and parents[gi] != -1:
                raise SparqlSyntaxError(
                    f"filters referencing variables outside a nested optional "
                    f"group are not supported (got {sorted(outside)})"
                )
            if outside and f.kind not in ("cmp", "arith"):
                raise SparqlSyntaxError(
                    f"only comparison/arithmetic optional-group filters may "
                    f"reference outer variables (got {f.kind!r} over {outside})"
                )
            unbound = [v for v in outside if v not in prior]
            if unbound:
                raise SparqlSyntaxError(
                    f"optional-group filter references variable(s) {unbound} not "
                    "bound by the required patterns or an earlier top-level group"
                )
        # only TOP-LEVEL groups export columns to later ON clauses: a
        # nested child renders inside its parent's subtree, and neither
        # engine exposes its variables to a later group's join condition
        # (parse order ≠ render order for nested children)
        if parents[gi] == -1:
            prior |= gvars
    aliases_b = [alias for _, _, alias in q.binds]
    if len({a.lower() for a in aliases_b}) != len(aliases_b):
        raise SparqlSyntaxError("duplicate bind aliases")
    # pattern-bound variables computed INDEPENDENTLY of the binds: an alias
    # spelled exactly like a bound variable must be caught too (SPARQL 1.1
    # makes rebinding an in-use variable a syntax error; the silent
    # alternative overwrites the column identically on both engines, which
    # the oracle cross-check could never catch)
    base_vars: set[str] = set()
    for grp in list(q.union_branches or [q.conditions]) + list(q.optionals):
        for c in grp:
            base_vars |= {v for v in c.variables() if not v.startswith("__seq")}
    if q.subquery is not None:
        base_vars |= set(q.subquery.projection)
    agg_aliases = {a.alias.lower() for a in q.aggregates}
    for kind, src_v, alias in q.binds:
        # alias must be NEW (case-insensitively — Spark resolution)
        if alias.lower() in {v.lower() for v in base_vars} or alias.lower() in agg_aliases:
            raise SparqlSyntaxError(
                f"bind alias ?{alias} collides with a bound variable or aggregate alias"
            )
        if kind == "var" and src_v not in base_vars:
            raise SparqlSyntaxError(
                f"bind source variable not bound in where clause: ?{src_v}"
            )
        if kind in ("arith", "if") and src_v[0] not in base_vars:
            raise SparqlSyntaxError(
                f"bind source variable not bound in where clause: ?{src_v[0]}"
            )
        if kind == "arith2":
            missing = [v for v in (src_v[0], src_v[2]) if v not in base_vars]
            if missing:
                raise SparqlSyntaxError(
                    f"bind source variable(s) not bound in where clause: {missing}"
                )
        if kind == "concat":
            missing = [v for t, v in src_v if t == "v" and v not in base_vars]
            if missing:
                raise SparqlSyntaxError(
                    f"bind source variable(s) not bound in where clause: {missing}"
                )
        if kind == "coalesce":
            # pattern-bound id columns only: an arith alias (a plain
            # number) mixed into COALESCE would silently blend value
            # spaces; it is not in base_vars, so this check rejects it too
            missing = [v for v in src_v if v not in base_vars]
            if missing:
                raise SparqlSyntaxError(
                    f"coalesce source variable(s) not bound in where clause: {missing}"
                )
    return q
