"""Dedup operators vs the DuckDB oracle + sanity on planted near-dups."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import dedup
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_vs_oracle(spark, sf_dir, name):
    df = dedup.QUERIES[name](spark, sf_dir)
    compare(df, dedup.ORACLE[name], sf_dir, name)


def test_near_dups_found(spark, sf_dir):
    """The synthetic corpus has planted near-dup pairs (jaccard ≈ 0.99)."""
    rows = dedup.d03_dedup_minhash_lsh(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["jaccard"] >= dedup.JACCARD_THRESHOLD for r in rows)
