"""Dedup operators vs the DuckDB oracle + sanity on planted near-dups."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import dedup
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_vs_oracle(spark, sf_dir, name):
    df = dedup.QUERIES[name](spark, sf_dir)
    compare(df, dedup.ORACLE[name], sf_dir, name)


def test_components_cover_pairs(spark, sf_dir):
    """d08: both endpoints of every near-dup pair resolve into one
    component, every component has ≥2 docs, and the component id is its
    own minimum member."""
    pairs = dedup.d03_dedup_minhash_lsh(spark, sf_dir).collect()
    comps = dedup.d08_dup_components(spark, sf_dir).collect()
    assert all(r["n_docs"] >= 2 for r in comps)
    assert all(r["component"] < r["max_doc"] for r in comps)
    n_nodes = len({d for r in pairs for d in (r["doc1"], r["doc2"])})
    assert sum(r["n_docs"] for r in comps) == n_nodes


def test_near_dups_found(spark, sf_dir):
    """The synthetic corpus has planted near-dup pairs (jaccard ≈ 0.99)."""
    rows = dedup.d03_dedup_minhash_lsh(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["jaccard"] >= dedup.JACCARD_THRESHOLD for r in rows)
