"""Plan-shape regression guard for the headline queries.

Correctness tests can't catch a plan regression: a future edit that
flips a broadcast to a cartesian product, or adds an extra fact-sized
exchange, still returns the right rows at sf0.001 — and melts at
100×.  This pins an UPPER BOUND on the wide-shuffle count of each
headline query's finalized adaptive plan, plus two absolute bans
(CartesianProduct anywhere, BroadcastNestedLoopJoin outside the
queries that legitimately need one).

Bounds are ceilings, not exact counts, so AQE coalescing or benign
optimizer changes don't false-alarm; raising a ceiling in this file is
a deliberate, reviewed act.
"""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark import registry

# query -> max allowed "Exchange hashpartitioning" nodes in the FINAL
# adaptive plan at sf0.001 (ceilings chosen = observed + headroom 1).
MAX_WIDE_EXCHANGES = {
    "q01_pricing_summary": 2,       # one agg exchange
    "q03_revenue_by_nation": 4,     # fact⋈fact + agg
    "q12_distinct_agg": 5,          # Expand + distinct aggs
    "e02_tumbling_window": 2,
    "e04_sessionize": 3,            # one user_id shuffle + agg
    "e05_asof_join": 4,
    "d03_dedup_minhash_lsh": 8,     # sig agg, band groupBy, verify joins
    "s01_cosine_topk": 1,           # broadcast query vector, top-k only
    "s11_ivf_pq_search": 1,         # narrow map + two top-k's
    "t02_quality_score": 1,
    "c13_mixture_rebalance": 3,
    "x08_fk_orphans": 12,           # 3 edges × (distinct + join + agg)
}

# BNLJ is legitimate in exactly two shapes: a non-equi join with no
# hash form, and the crossJoin(broadcast(<1-row scalar>)) attach
# pattern (query vector, global totals) — a 1-row build side makes the
# "nested loop" a constant lookup.
BNLJ_ALLOWED = {
    "q06_range_join",
    "e08_interval_join",
    "s01_cosine_topk",        # broadcast 1-row query vector
    "c13_mixture_rebalance",  # broadcast 1-row totals
}


def _final_plan(df) -> str:
    df.collect()
    return (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )


@pytest.mark.parametrize("name", sorted(MAX_WIDE_EXCHANGES))
def test_wide_shuffle_ceiling(spark, sf_dir, name):
    plan = _final_plan(registry.all_queries()[name](spark, sf_dir))
    n = plan.count("Exchange hashpartitioning")
    assert n <= MAX_WIDE_EXCHANGES[name], (
        f"{name}: {n} wide exchanges (ceiling {MAX_WIDE_EXCHANGES[name]}) — "
        f"a plan regression, not a correctness bug; inspect before raising "
        f"the ceiling"
    )
    assert "CartesianProduct" not in plan, f"{name} degraded to a cross join"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} fell back to nested-loop"
        )
