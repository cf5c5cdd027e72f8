"""Similarity-search operators vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import similarity
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(similarity.QUERIES))
def test_similarity_vs_oracle(spark, sf_dir, name):
    df = similarity.QUERIES[name](spark, sf_dir)
    compare(df, similarity.ORACLE[name], sf_dir, name)


def test_topk_is_sorted(spark, sf_dir):
    rows = similarity.s01_cosine_topk(spark, sf_dir).collect()
    assert len(rows) == similarity.TOP_K
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
