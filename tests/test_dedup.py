"""Dedup operators vs DuckDB oracle + behavioral checks."""

from __future__ import annotations

import pytest

from dream_spark.operators import dedup as D
from tests.conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(D.QUERIES))
def test_dedup_oracle(spark, duck, name):
    assert_oracle_match(D.QUERIES[name](spark, SF_DIR), duck, D.ORACLES[name])


def test_exact_dedup_removes_injected_duplicates(spark):
    from dream_spark.sources.tables import load_table

    part = load_table(spark, SF_DIR, "part")
    assert D.dedup_exact(spark, SF_DIR).count() == part.dropDuplicates().count()


def test_minhash_finds_near_identical_docs(spark):
    """A doc is trivially near-identical to itself — shingle sets of docs
    sharing long substrings must collide in at least one band.  Sanity: the
    candidate set is nonempty at this corpus's similarity level and contains
    no self-pairs."""
    pairs = D.dedup_minhash(spark, SF_DIR)
    rows = pairs.collect()
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_jaccard_threshold_respected(spark):
    rows = D.dedup_jaccard(spark, SF_DIR).collect()
    assert all(r["jaccard"] >= D.JACCARD_THRESHOLD for r in rows)


def test_simhash_16bit_range(spark):
    rows = D.simhash_docs(spark, SF_DIR).collect()
    assert all(0 <= r["simhash"] < (1 << D.SIMHASH_BITS) for r in rows)


# ---- connected-components cluster assembly --------------------------------
@pytest.mark.parametrize("small_edges", [0, 10**6])
def test_connected_components_unit(spark, small_edges):
    """small_edges=0 forces the distributed label-propagation loop;
    the default exercises the driver union-find fast path."""
    from dream_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        ["src", "dst"],
    )
    got = {
        (r["node"], r["cluster"])
        for r in connected_components(edges, small_edges=small_edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_dedup_clusters_oracle(spark, duck):
    from dream_spark.operators import dedup as D
    from tests.conftest import SF_DIR, assert_oracle_match

    assert_oracle_match(
        D.dedup_clusters(spark, SF_DIR), duck, D.DEDUP_CLUSTERS_SQL
    )
