"""Events plans vs the DuckDB oracle (incl. ASOF join)."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.plans import events
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_vs_oracle(spark, sf_dir, name):
    df = events.QUERIES[name](spark, sf_dir)
    compare(df, events.ORACLE[name], sf_dir, name)
