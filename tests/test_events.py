"""Events plans vs the DuckDB oracle (incl. ASOF join)."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.plans import events
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(events.QUERIES))
def test_events_vs_oracle(spark, sf_dir, name):
    df = events.QUERIES[name](spark, sf_dir)
    compare(df, events.ORACLE[name], sf_dir, name)


def test_e09_dims_broadcast_no_fact_shuffle(spark, sf_dir):
    """Dim enrichment must broadcast both dims: the events fact side is
    never shuffled for the joins (only the final tiny agg exchanges)."""
    df = events.e09_stream_static_enrich(spark, sf_dir)
    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # final AQE plan only
    )
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
