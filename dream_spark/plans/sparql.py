"""SPARQL basic-graph-pattern parser.

Covers the reference grammar exactly (reference QueryPlanner.c:933-1015):
``select ?v1 ?v2 … where { s p o . s p o . … }`` — conjunctive triple
patterns only; a term starting with ``?`` is a variable
(QueryPlanner.c:299-315), anything else is a constant.  Variable predicates
are supported (QueryPlanner.c:305-309).  The reference grammar has no
FILTER/OPTIONAL/UNION/ORDER BY/LIMIT (SURVEY.md §2.3); we additionally accept
an optional ``distinct`` marker and angle-bracketed constants ``<lexical>``
for readability — both strict supersets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Term:
    """One s/p/o slot: either a variable (?X) or a lexical constant."""

    text: str

    @property
    def is_var(self) -> bool:
        return self.text.startswith("?")

    @property
    def var(self) -> str:
        return self.text[1:]

    @property
    def lexical(self) -> str:
        t = self.text
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


@dataclass
class ParsedQuery:
    """Projection list + conditions — reference ``Result``+``Condition`` lists
    (QueryPlanner.c:24-28).  ``order``/``limit`` extend the reference grammar
    (which has neither, SURVEY.md §2.3) as a documented superset."""

    projection: list[str]
    conditions: list[Condition]
    distinct: bool = False
    order: list[tuple[str, bool]] = field(default_factory=list)  # (var, desc)
    limit: int | None = None
    text: str = field(default="", repr=False)

    def all_variables(self) -> list[str]:
        out: list[str] = []
        for c in self.conditions:
            for v in c.variables():
                if v not in out:
                    out.append(v)
        return out


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
    m = re.match(
        r"(?is)^\s*select\s+(distinct\s+)?(.*?)\s+where\s*\{(.*)\}\s*"
        r"(?:order\s+by\s+((?:\?\w+(?:\s+(?:asc|desc))?\s*)+))?"
        r"(?:limit\s+(\d+))?\s*$",
        src,
        re.DOTALL,
    )
    if not m:
        raise SparqlSyntaxError(f"expected 'select … where {{ … }}': {text[:120]!r}")
    distinct = bool(m.group(1))
    proj_src, body = m.group(2), m.group(3)
    order: list[tuple[str, bool]] = []
    if m.group(4):
        toks = _WS.split(m.group(4).strip())
        i = 0
        while i < len(toks):
            var = toks[i]
            if not var.startswith("?"):
                raise SparqlSyntaxError(f"order by terms must be variables, got {var!r}")
            desc = i + 1 < len(toks) and toks[i + 1].lower() in ("asc", "desc") and toks[i + 1].lower() == "desc"
            i += 2 if (i + 1 < len(toks) and toks[i + 1].lower() in ("asc", "desc")) else 1
            order.append((var[1:], desc))
    limit = int(m.group(5)) if m.group(5) else None

    projection: list[str] = []
    for tok in _WS.split(proj_src.strip()):
        if not tok:
            continue
        if tok == "*":
            projection = []  # empty => project all variables
            continue
        if not tok.startswith("?"):
            raise SparqlSyntaxError(f"projection terms must be variables, got {tok!r}")
        if tok[1:] not in projection:
            projection.append(tok[1:])

    conditions: list[Condition] = []
    for i, pat in enumerate(p.strip() for p in re.split(r"\s+\.(?:\s+|$)", body.strip())):
        pat = pat.strip().rstrip(".").strip()
        if not pat:
            continue
        terms = _WS.split(pat)
        if len(terms) != 3:
            raise SparqlSyntaxError(f"triple pattern needs 3 terms, got {terms!r}")
        conditions.append(Condition(i + 1, Term(terms[0]), Term(terms[1]), Term(terms[2])))
    if not conditions:
        raise SparqlSyntaxError("empty where clause")

    q = ParsedQuery(
        projection=projection,
        conditions=conditions,
        distinct=distinct,
        order=order,
        limit=limit,
        text=src,
    )
    if not q.projection:
        q.projection = q.all_variables()
    else:
        known = set(q.all_variables())
        missing = [v for v in q.projection if v not in known]
        if missing:
            raise SparqlSyntaxError(f"projected variables not bound in where clause: {missing}")
    bad_order = [v for v, _ in q.order if v not in q.projection]
    if bad_order:
        raise SparqlSyntaxError(f"order-by variables must be projected: {bad_order}")
    return q
