"""Text-analysis operators vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import text
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_vs_oracle(spark, sf_dir, name):
    df = text.QUERIES[name](spark, sf_dir)
    compare(df, text.ORACLE[name], sf_dir, name)
