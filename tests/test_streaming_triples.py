"""Streaming N-Triples ingestion: incremental store growth must converge to
exactly the batch loader's result — triples as a multiset, dictionary as a
duplicate-free id→lexical map — across multiple micro-batch drains."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dream_spark.plans.sparql import parse_sparql
from dream_spark.plans.translator import translate
from dream_spark.sources.triples import TripleStore
from dream_spark.streaming.triples import ingest_ntriples_stream, store

NT_BATCH1 = """\
<http://ex/alice> <http://ex/knows> <http://ex/bob> .
<http://ex/alice> <http://ex/name> "Alice" .
<http://ex/bob> <http://ex/name> "Bob" .
"""

# batch 2 reuses terms (alice, knows, name) and adds new ones — the
# dictionary merge must add ONLY the new terms
NT_BATCH2 = """\
<http://ex/bob> <http://ex/knows> <http://ex/carol> .
<http://ex/carol> <http://ex/name> "Carol" .
<http://ex/alice> <http://ex/knows> <http://ex/carol> .
"""


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("nt_stream")
    (root / "src").mkdir()
    return {
        "src": str(root / "src"),
        "triples": str(root / "triples"),
        "dict": str(root / "dict"),
        "ckpt": str(root / "ckpt"),
        "root": root,
    }


def _drain(spark, paths):
    q = ingest_ntriples_stream(
        spark, paths["src"], paths["triples"], paths["dict"], paths["ckpt"]
    )
    q.awaitTermination()


def test_incremental_ingest_matches_batch_loader(spark, paths):
    (paths["root"] / "src" / "b1.nt").write_text(NT_BATCH1)
    _drain(spark, paths)
    st1 = store(spark, paths["triples"], paths["dict"])
    assert st1.triples.count() == 3
    assert st1.dictionary.count() == 6  # alice bob knows name "Alice" "Bob"

    (paths["root"] / "src" / "b2.nt").write_text(NT_BATCH2)
    _drain(spark, paths)
    st2 = store(spark, paths["triples"], paths["dict"])
    assert st2.triples.count() == 6
    # only carol + "Carol" are new terms
    assert st2.dictionary.count() == 8
    # dictionary stays duplicate-free across batches
    assert st2.dictionary.groupBy("id").count().where(F.col("count") > 1).count() == 0

    # converged store == batch loader over the full file set
    batch = TripleStore.from_ntriples(spark, paths["src"], validate=True)
    assert sorted(map(tuple, st2.triples.collect())) == sorted(
        map(tuple, batch.triples.collect())
    )
    assert sorted(map(tuple, st2.dictionary.collect())) == sorted(
        map(tuple, batch.dictionary.collect())
    )


def test_checkpoint_prevents_reprocessing(spark, paths):
    """A third drain with no new files must be a no-op: the checkpoint
    remembers every processed file."""
    before = store(spark, paths["triples"], paths["dict"]).triples.count()
    _drain(spark, paths)
    after = store(spark, paths["triples"], paths["dict"]).triples.count()
    assert after == before


def test_streamed_store_answers_sparql(spark, paths):
    """The streamed store is a first-class TripleStore: SPARQL + decode
    work unchanged."""
    st = store(spark, paths["triples"], paths["dict"])
    q = parse_sparql("select ?A ?B where { ?A <http://ex/knows> ?B }")
    got = sorted((r["A"], r["B"]) for r in translate(st, q, None, decode=True).collect())
    assert got == [
        ("http://ex/alice", "http://ex/bob"),
        ("http://ex/alice", "http://ex/carol"),
        ("http://ex/bob", "http://ex/carol"),
    ]
