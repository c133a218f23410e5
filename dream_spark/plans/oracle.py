"""Generate DuckDB oracle SQL for a BGP query.

The correctness driver runs the engine's DataFrame plan AND an independent
ANSI-SQL formulation side-by-side (see __spark_entry__.py).  This module
renders a parsed BGP as a plain self-join SQL statement over a ``triples``
CTE (the shared TRIPLES_SQL derivation), executed by DuckDB's own optimizer —
a genuinely independent evaluation path from the Spark translator.
"""

from __future__ import annotations

from collections.abc import Callable

from dream_spark.plans.sparql import ParsedQuery
from dream_spark.sources.triples import DICT_SQL, TRIPLES_SQL, resolve_lexical


def _default_resolver(lexical: str) -> int:
    rid = resolve_lexical(lexical)
    if rid is None:
        raise KeyError(f"unknown lexical constant: {lexical!r}")
    return rid


def bgp_to_sql(
    query: ParsedQuery, decode: bool = False, resolver: Callable[[str], int] | None = None
) -> str:
    """Render the BGP as ``WITH triples AS (…) SELECT … FROM triples t1, …``.

    Variables become equality chains across pattern aliases; constants become
    literal ID predicates; projection picks each variable's first binding
    slot.  Bag semantics (no DISTINCT) unless the query says otherwise.
    """
    resolve = resolver or _default_resolver
    first_slot: dict[str, str] = {}
    where: list[str] = []
    aliases: list[str] = []
    for i, cond in enumerate(query.conditions, start=1):
        t = f"t{i}"
        aliases.append(f"triples {t}")
        for slot, term in (("s", cond.subj), ("p", cond.pred), ("o", cond.obj)):
            ref = f"{t}.{slot}"
            if term.is_var:
                if term.var in first_slot:
                    where.append(f"{ref} = {first_slot[term.var]}")
                else:
                    first_slot[term.var] = ref
            else:
                where.append(f"{ref} = {resolve(term.lexical)}")

    if decode:
        sel = []
        for j, v in enumerate(query.projection, start=1):
            aliases.append(f"dict d{j}")
            where.append(f"d{j}.id = {first_slot[v]}")
            sel.append(f"d{j}.lexical AS {v}")
        select_list = ", ".join(sel)
        ctes = f"WITH triples AS (\n{TRIPLES_SQL}\n), dict AS (\n{DICT_SQL}\n)"
    else:
        select_list = ", ".join(f"{first_slot[v]} AS {v}" for v in query.projection)
        ctes = f"WITH triples AS (\n{TRIPLES_SQL}\n)"

    distinct = "DISTINCT " if query.distinct else ""
    where_sql = " AND ".join(where) if where else "TRUE"
    sql = f"{ctes}\nSELECT {distinct}{select_list}\nFROM {', '.join(aliases)}\nWHERE {where_sql}"
    if query.order or query.limit is not None:
        # wrap so ORDER BY/LIMIT apply to the projected (possibly decoded)
        # output columns, same as the DataFrame plan
        sql = f"SELECT * FROM (\n{sql}\n)"
        if query.order:
            sql += "\nORDER BY " + ", ".join(
                f"{v} DESC" if desc else f"{v}" for v, desc in query.order
            )
        if query.limit is not None:
            sql += f"\nLIMIT {query.limit}"
    return sql
