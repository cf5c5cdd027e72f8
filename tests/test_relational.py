"""Every relational queries()/oracle_sql() pair vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.plans import relational
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_vs_oracle(spark, sf_dir, name):
    df = relational.QUERIES[name](spark, sf_dir)
    compare(df, relational.ORACLE[name], sf_dir, name)


def test_q01_returns_rows(spark, sf_dir):
    rows = relational.q01_pricing_summary(spark, sf_dir).collect()
    assert len(rows) > 0
    assert rows[0]["count_order"] > 0
