#!/usr/bin/env python
"""Regenerate PLANS.md: annotated physical plans for representative
queries.  Run from the repo root:

    python tools/dump_plans.py            # writes PLANS.md at sf0.01

The commentary states what to LOOK FOR in each plan — the properties
that make the plan survive a 100×–1000× scale-up (pushdown, broadcast
vs shuffle, partial aggregation, codegen spans).  PLANS.md is a
generated artifact; edit the ANNOTATIONS here, not the file.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"

# query name -> what the plan proves (scale-relevant reading guide)
ANNOTATIONS = {
    "q01_pricing_summary": (
        "Scan→filter→hash-agg, the TPC-H Q1 shape. Look for: the "
        "`l_shipdate` predicate and 7-column projection inside "
        "`PushedFilters`/`ReadSchema` (the scan never reads the other 9 "
        "columns); `partial_sum/partial_count` BEFORE the exchange "
        "(map-side combine — the shuffle moves 6 groups, not 600k rows); "
        "one WholeStageCodegen span covering filter+project+partial agg."
    ),
    "q02_top_orders": (
        "Top-k. Look for: `TakeOrderedAndProject` instead of a global "
        "Sort+Limit — each partition keeps its local top-20, the driver "
        "merges; no full sort of the fact table at any scale."
    ),
    "q03_revenue_by_nation": (
        "Fact⋈fact⋈dims. Look for: `BroadcastHashJoin` for every dim "
        "(customer/nation/region side, built once, no fact shuffle) and "
        "`SortMergeJoin` only for lineitem⋈orders — the single shuffle "
        "that must exist; at 100 TB the bucketed layout "
        "(scale_utils.write_bucketed) removes even that exchange."
    ),
    "d03_dedup_minhash_lsh": (
        "MinHash+LSH dedup. Look for: ONE `ObjectHashAggregate` pass "
        "producing 16 minhash lanes from 4 md5 calls (partial agg before "
        "the doc_id exchange); candidate pairs from a single "
        "`groupBy(band)` + in-bucket expansion (no bands⋈bands self-join, "
        "which would double the signature compute); the verify pass scans "
        "`documents` AFTER a broadcast semi-join on candidate ids — "
        "non-candidate text is never re-tokenized."
    ),
    "s05_ann_ivf": (
        "IVF ANN. Look for: the K-row centroid index folded to ONE array "
        "row and attached via `BroadcastNestedLoopJoin` (a 1-row build "
        "side); cell assignment as a narrow `array_max(transform(...))` "
        "projection — NO hashpartitioning(vec_id), no Window; the final "
        "top-k is again `TakeOrderedAndProject`."
    ),
    "c03_chunk_windows": (
        "Docs→chunks fan-out. Look for: `Generate explode` fed by a "
        "codegen'd `transform(sequence(...))` — zero Python, zero "
        "shuffle before the output sort; chunk rows inherit the scan's "
        "partitioning."
    ),
    "e05_asof_join": (
        "As-of join. Look for: one `hashpartitioning(user_id)` exchange "
        "shared by the union'd sides, then a Window sort WITHIN "
        "partitions (`last(..., ignorenulls)`) — no range self-join "
        "blow-up, no broadcast of a fact."
    ),
    "e09_stream_static_enrich": (
        "Dim enrichment (stream-static shape). Look for: both dims as "
        "`BroadcastHashJoin` build sides; the events fact is scanned "
        "once, filtered by `PushedFilters: EqualTo(event_type,purchase)`, "
        "and never shuffled until the 25-group rollup."
    ),
    "q24_column_profile": (
        "Single-pass column profiling. Look for: ONE `FileScan` with "
        "`ReadSchema` holding only the 4 profiled columns; `Expand` "
        "(rows ×5 — Spark's multi-distinct strategy: one gid per "
        "distinct column + one for the plain aggs) feeding partial "
        "aggregation BEFORE the exchange; the `stack` Generate reshapes "
        "a 1-row agg result, so the post-shuffle side is 4 rows no "
        "matter the table size. 100 TB cost = one scan + Expand, never "
        "4 scans."
    ),
    "e10_gap_fill": (
        "Gap fill + forward fill (resample/locf). Look for: the day "
        "grid built by `Generate explode(sequence(d0,d1))` over a "
        "`BroadcastNestedLoopJoin` with the 1-row bounds agg (broadcast "
        "of one row — not a shuffle); the daily-agg side joined with "
        "`BroadcastHashJoin` at this SF; ONE hash exchange on user_id "
        "(from the users-distinct) satisfies the join AND the "
        "last-ignorenulls Window clustering — the fill never re-shuffles. "
        "Per-user day counts are bounded by the retention span, so the "
        "window sort stays small at any corpus size."
    ),
    "s06_quantize_int8": (
        "int8 quantization QA. Look for: ZERO `Exchange` nodes before "
        "the final `TakeOrderedAndProject` — amax/quantize/mse are all "
        "per-row array folds inside one WholeStageCodegen span; each "
        "partition keeps a local top-10 and the driver merges. The "
        "narrow-map shape that lets a billion-vector corpus quantize "
        "in one pass with no shuffle at all."
    ),
    "q25_exists_late_ship": (
        "Correlated EXISTS (TPC-H Q4 shape). Look for: ONE "
        "`SortMergeJoin LeftSemi` (or BroadcastHashJoin LeftSemi under "
        "AQE) with the date-range predicate as the join's extra "
        "condition — the decorrelated form; no inner-join + distinct, "
        "no second lineitem scan, no duplicate-row blowup before the "
        "priority rollup."
    ),
    "q26_volume_shipping": (
        "Two-nation volume shipping (TPC-H Q7 shape — same dim joined "
        "in two roles). Look for: `(n_name = A) OR (n_name = B)` inside "
        "the nation scan's `PushedFilters` — Catalyst's "
        "PushExtraPredicateThroughJoin derives it from the symmetric "
        "pair disjunction, so lineitem is pruned to the two nations' "
        "suppliers BEFORE the orderkey join; AQE additionally serves "
        "both nation roles from one `ReusedExchange` broadcast."
    ),
    "e11_cohort_retention": (
        "Weekly cohort retention triangle. Look for: ONE "
        "`hashpartitioning(user_id, week)` exchange for the distinct, "
        "then the per-user min() and the activity⋈cohort join both "
        "reusing user_id partitioning (AQE-planned broadcast at this "
        "SF); final agg output is ~weeks² rows regardless of input TB."
    ),
    "i01_windowed_mean_grid": (
        "Imaging windowed-mean as relational agg. Look for: the "
        "grid-key groupBy with `partial_avg` before the exchange — "
        "window-aligned chunk boundaries mean the real pyramid kernel "
        "(mapInPandas) needs NO shuffle at all; this query is its "
        "relational twin for the oracle."
    ),
    "c08_contamination": (
        "Benchmark decontamination. Look for: the eval shingle set "
        "(tiny by construction — benchmarks are small) built once and "
        "attached via `BroadcastHashJoin LeftSemi` — the train corpus "
        "explodes to shingles in codegen (`Generate`) but is NEVER "
        "shuffled for the membership test; only the per-doc distinct "
        "and the O(sources) rollup exchange."
    ),
    "t10_vocab_zipf": (
        "Vocabulary/Zipf coverage. Look for: exactly TWO exchanges — "
        "the word groupBy (with partial_count map-side combine, so the "
        "shuffle carries vocab-sized data, not the token stream) and "
        "the single-partition global-rank window, which runs over vocab "
        "rows only. The corpus is read once; the window never sees it."
    ),
    "q32_disjunctive_revenue": (
        "Disjunctive predicate blocks across join sides (TPC-H Q19 "
        "shape). Look for: BOTH scans carrying derived `PushedFilters` — "
        "the brand/size union on the part scan and the quantity envelope "
        "on the lineitem scan — Catalyst factors the common parts out of "
        "the OR; the naive plan would stream both tables unfiltered into "
        "the join and filter after."
    ),
    "e13_rolling_24h": (
        "Trailing-24h RANGE-frame rolling aggregate. Look for: ONE "
        "`hashpartitioning(user_id)` exchange + in-partition sort on the "
        "integer-microsecond frame key; `specifiedwindowframe(RangeFrame, "
        "-86400000000, currentrow$())` — per-event trailing windows with "
        "state bounded by a user's 24-hour event count, the shape a "
        "fixed-grid sliding bucket (e03) cannot express."
    ),
    "s08_ann_recall_panel": (
        "Multi-query ANN recall panel. Look for: the centroid index and "
        "the Q-row query panel both attached via broadcast "
        "(`BroadcastNestedLoopJoin` of 1-row/Q-row build sides); "
        "per-query top-k as Window over hashpartitioning(query_id) — "
        "state O(Q×k); the final exact⋈approx recall join is a "
        "`BroadcastHashJoin` (hinted: Spark can't see top-k cardinality "
        "through the Window)."
    ),
}


def main() -> None:
    from aind_smartspim_data_transformation_spark import registry
    from aind_smartspim_data_transformation_spark.session import (
        build_local_session,
    )

    spark = build_local_session(app_name="plans", cpus=8)
    queries = registry.all_queries()
    out = [
        "# PLANS — physical plans of representative queries (generated)",
        "",
        f"Regenerate with `python tools/dump_plans.py` (sf_dir={SF_DIR},",
        "AQE on; plans shown are the pre-execution `explain(formatted)`).",
        "Each section says what to look for — the properties that let the",
        "plan survive a 100×–1000× scale-up.",
        "",
    ]
    for name, note in ANNOTATIONS.items():
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", note, "", "```", buf.getvalue().rstrip(), "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'}")


if __name__ == "__main__":
    main()
