"""User-facing engine facade.

The reference's entry point is a SPARQL text file handed to a proxy process
(Client.c:7-25, Proxy.c:40); ours is ``Engine.sparql(text)`` returning a
DataFrame.  ``Engine.sql`` passes through to Spark SQL (the reference has no
SQL surface; this is the superset the extensions use).  ``Engine.explain``
exposes the Catalyst plan the way the reference printed its optimal compact
graph (Optimizer.cpp:1049-1106), and ``Engine.timed`` reproduces the
``dream: <sec>`` wall-clock line (Proxy.c:266-271).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from dream_spark.plans.sparql import ParsedQuery, parse_sparql
from dream_spark.plans.stats import TripleStats, default_stats_path
from dream_spark.plans.translator import translate
from dream_spark.sources.triples import TripleStore


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        store: TripleStore,
        stats: TripleStats | None = None,
        sf_dir: str | None = None,
    ):
        self.spark = spark
        self.store = store
        self._stats = stats
        self._sf_dir = sf_dir
        self._sql_tables_registered = False

    @classmethod
    def from_tpch(
        cls,
        spark: SparkSession,
        sf_dir: str,
        collect_stats: bool = True,
        stats_path: str | None = None,
    ) -> "Engine":
        """Build the engine over the TPC-H-derived triple store.

        Statistics persist across constructions (the reference reloads its
        stat files at startup rather than re-profiling, Main.c:146-161):
        load from ``stats_path`` (default: an mtime-keyed tmp cache file)
        when present, else run the one aggregation pass and save it.
        """
        store = TripleStore.shared(spark, sf_dir)
        stats = None
        if collect_stats:
            path = stats_path or default_stats_path(sf_dir)
            stats = TripleStats.load(path)
            if stats is None:
                stats = TripleStats.collect(store.triples)
                try:
                    stats.save(path)
                except OSError:
                    pass  # read-only tmp: stats stay in-memory for this engine
        return cls(spark, store, stats, sf_dir=sf_dir)

    # -- stats --------------------------------------------------------------
    @property
    def stats(self) -> TripleStats | None:
        return self._stats

    def analyze(self) -> TripleStats:
        """One aggregation pass over triples → per-predicate stats (replaces
        the reference's execute-to-estimate, PlanCostEstimator.cpp:585-655)."""
        self._stats = TripleStats.collect(self.store.triples)
        return self._stats

    # -- query surfaces -----------------------------------------------------
    def parse(self, sparql_text: str) -> ParsedQuery:
        return parse_sparql(sparql_text)

    def _ensure_open(self) -> None:
        """Re-open the store if an external clearCache dropped its cache —
        a ~ms storage-level lookup per query, nothing vs. silently
        re-deriving the triple union under every pattern scan.  EVERY
        query surface (sparql/sql/profile) goes through this, or the
        open-store contract holds on one path and silently breaks on the
        others."""
        self.store.ensure_open()

    def sparql(self, sparql_text: str, decode: bool = False) -> DataFrame:
        self._ensure_open()
        return translate(self.store, parse_sparql(sparql_text), self._stats, decode=decode)

    def sql(self, sql_text: str) -> DataFrame:
        """ANSI SQL over all the store's base tables PLUS the triple store
        itself: ``triples`` (s,p,o) and ``dict`` (id, lexical) register as
        views, so SQL can join graph data with relational tables in one
        statement (the interop surface the reference's split RDF-3X/MPI
        stack could never offer).

        Table views register lazily on first use — the SPARQL path stays
        independent of tables it never reads (store derivation registers
        only its own 7), while the SQL surface sees all of them."""
        self._ensure_open()
        if not self._sql_tables_registered:
            if self._sf_dir is not None:
                from dream_spark.sources.tables import register_tables

                register_tables(self.spark, self._sf_dir)
            self.store.triples.createOrReplaceTempView("triples")
            self.store.dictionary.createOrReplaceTempView("dict")
            self._sql_tables_registered = True
        return self.spark.sql(sql_text)

    def explain(self, sparql_text: str, mode: str = "formatted") -> str:
        df = self.sparql(sparql_text)
        return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)

    def timed(self, sparql_text: str, decode: bool = False) -> tuple[DataFrame, float, int]:
        """Run to completion, return (df, seconds, rows) — the reference's
        end-to-end timing semantics (query receipt → final result)."""
        t0 = time.perf_counter()
        df = self.sparql(sparql_text, decode=decode)
        n = df.count()
        return df, time.perf_counter() - t0, n

    def profile(self, sparql_text: str) -> dict:
        """Per-pattern result sizes + estimates + end-to-end wall — the
        query statistics the reference materializes as its ResStats /
        CostStats files (LUBMStats-RDFDB/LUBMResStats-2.txt records
        per-condition-set result sizes, LUBMCostStats-2.txt their scan
        times, produced by execute-to-estimate planning) recreated as an
        API over the live store.  Each pattern row reports the planner's
        cardinality estimate next to the measured count, so estimate drift
        is observable the way the reference's stat files made it."""
        from dream_spark.plans.translator import _condition_frame, _estimate

        self._ensure_open()
        q = parse_sparql(sparql_text)
        patterns = []
        groups = list(q.union_branches) if q.union_branches else [q.conditions]
        all_conds = [c for grp in groups for c in grp]
        # EVERY group kind contributes patterns: optional, minus, exists,
        # and subquery groups are where estimate drift hides too
        all_conds += [c for grp in q.optionals for c in grp]
        all_conds += [c for grp in q.minuses for c in grp]
        all_conds += [c for _, grp in q.exists_groups for c in grp]
        if q.subquery is not None:
            sub_groups = (
                list(q.subquery.union_branches)
                if q.subquery.union_branches
                else [q.subquery.conditions]
            )
            all_conds += [c for grp in sub_groups for c in grp]
        for cond in all_conds:
            t0 = time.perf_counter()
            n = _condition_frame(self.store, cond).count()
            patterns.append(
                {
                    "cid": cond.cid,
                    "pattern": f"{cond.subj.text} {cond.pred.text} {cond.obj.text}",
                    "rows": n,
                    "estimate": _estimate(self._stats, self.store, cond),
                    "seconds": round(time.perf_counter() - t0, 4),
                }
            )
        df, secs, rows = self.timed(sparql_text)
        return {"patterns": patterns, "rows": rows, "seconds": round(secs, 4)}
