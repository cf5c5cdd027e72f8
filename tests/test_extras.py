"""Late-registered (plans/extras.py) queries vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.plans import extras
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(extras.QUERIES))
def test_extras_vs_oracle(spark, sf_dir, name):
    df = extras.QUERIES[name](spark, sf_dir)
    compare(df, extras.ORACLE[name], sf_dir, name)
