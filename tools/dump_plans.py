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
        "(scale_utils.write_bucketed) removes even that exchange. "
        "Since round 5 the SF-scaling customer dim carries NO forced "
        "hint — the broadcast below is AQE's runtime choice, which "
        "flips to sort-merge at the SF where the build stops fitting "
        "(nation/region keep explicit hints; they are bounded)."
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
    "d07_simhash_hamming_pairs": (
        "All-pairs ≤2-hamming listing over 16-bit simhash (r10 "
        "sig-group formulation). Look for: hamming decided ONCE per "
        "DISTINCT-sig pair (≤65536-row sides over the pigeonhole "
        "bands — the sig-pair distinct is constant-sized; the r9 "
        "plan's 200M-row doc-level DISTINCT and two sig re-joins are "
        "gone); the only doc-sided work is the final expansion join "
        "whose row count IS the output (cross pairs unique via the "
        "sig1<sig2 direction, intra pairs via the doc1<doc2 guard on "
        "the self edge); the expansion salted doc1%8 with the build "
        "side replicated ×8, BOTH under EXPLICIT AQE-exempt "
        "repartition (a verbatim-replica corpus folds each replica "
        "set onto ONE sig — unsalted, that fat sig's |group|² "
        "expansion lands on one task). 10× sweep: 354 s → 38.5 s, "
        "identical 203,697,800 rows. Output is the diagnostic full "
        "listing — the bounded 100× contract is d14."
    ),
    "d14_hamming_neighbor_topk": (
        "Bounded per-doc neighbor top-k (round 10 — the contract a "
        "100× consumer actually wants). BOTH output AND intermediate "
        "are linear: the signature space is 16 bits, so hamming is "
        "computed once per DISTINCT-sig pair (≤65536-row sides, "
        "broadcast) and each doc expands only against its ≤137 "
        "neighbor groups' k+1-SMALLEST id arrays (a non-smallest "
        "member is dominated at equal hamming by smaller ids from "
        "its own group). Look for: TWO WindowGroupLimit nodes (the "
        "per-sig member rank pruned to k+1 before the aggregate; the "
        "final per-doc rank pruned to k); the sym and top_ids joins "
        "as BroadcastHashJoin — the doc table never shuffles except "
        "for the two windows; no doc-level pair join anywhere (the "
        "first d14 bounded only the output and still paid d07's "
        "~20G-pair enumeration at 100×)."
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
        "Vocabulary/Zipf coverage. Look for: the word groupBy (with "
        "partial_count map-side combine, so the shuffle carries "
        "vocab-sized data, not the token stream) feeding "
        "distributed_order_stats (r7): literal bucket ids, a window "
        "PARTITIONED by _rpid for rank+cum, and the corpus total as a "
        "LITERAL from the offsets pass — no Exchange SinglePartition "
        "anywhere (the old plan had the global-rank window AND a "
        "sum() OVER () total). Observed wide exchanges: 2 (ceiling 3)."
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
        "fixed-grid sliding bucket (e03) cannot express.  KNOWN SKEW "
        "LIMIT (SCALE.md §6o): the partition is one USER, and Spark "
        "re-scans the sliding frame per row — a zipf hot key turns this "
        "into one O(n·frame) task (killed at ~80 min, 100× skewed); e16 "
        "below is the bounded-partition twin."
    ),
    "e16_rolling_24h_bucketed": (
        "e13's skew-proof twin (identical output, same oracle). Look "
        "for: BOTH window exchanges hashpartitioning on (user_id, "
        "day-bucket) — never user_id alone, so the hot key's work "
        "parallelizes across its days; the own-bucket cumulative as a "
        "RangeFrame(unboundedpreceding$(), currentrow$()) (tie-inclusive, "
        "O(n) incremental — growing frames are cheap, sliding frames are "
        "not); the prev-bucket term as a UNION with probe rows scanned "
        "by a DESCENDING RowFrame cumulative (counts ts' ≥ ts−24h "
        "directly — no total-minus-below subtraction, no FP "
        "cancellation); one final join back on event_id.  12.1 s on the "
        "skewed 100× corpus where e13's native frame was killed at "
        "~80 min."
    ),
    "e08_interval_join": (
        "Click⋈purchase within [click, click+30min). Look for: the "
        "equi-join keys (user_id, bkt) — user AND 30-minute bucket, "
        "never user alone: the range predicate only filters WITHIN an "
        "equi-key group, so a user_id-only key inherits a hot user's "
        "skew QUADRATICALLY (437 s at 100× zipf; SCALE.md §6o).  The "
        "purchase side carries a 2-element `Generate explode` (its own "
        "bucket + the previous one) so every in-range pair matches "
        "exactly once; the residual range condition rides the join as a "
        "post-condition.  13.0 s on the same skewed corpus — 34×."
    ),
    "d16_lsh_recovered_pairs": (
        "d03 with bounded recall inside saturated LSH buckets. Look "
        "for: ONE ObjectHashAggregate bucket pass (same as d03 — the "
        "signature pipeline is never computed twice); the pair expansion "
        "as a single CASE over the sorted member array — full i<j "
        "in-bucket pairs when |bucket| ≤ 64, first-K-representatives × "
        "later-members when saturated (K·n, linear in bucket size); the "
        "r13 DIGEST COLLAPSE in the verify: a sha2(text) projection "
        "splits pairs into same-digest (emitted directly at jaccard 1.0 "
        "— no shingle work) and cross-digest (shingle sets built once "
        "per DISTINCT digest via a min-doc_id rep, jaccard once per "
        "distinct digest pair, verdict joined back) — 100.1× fewer "
        "shingle rows / 6,024× fewer set-join rows at 100× zipf; the "
        "verify joins are SHUFFLE joins, not broadcast — recovered pairs "
        "can reach K·n per boilerplate family (40.5M pairs at 1000×), "
        "too big to force onto the driver."
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
    "q34_market_share": (
        "National market share (TPC-H Q8 shape — nation joined in two "
        "roles). Look for: SIX broadcast build sides (customer, "
        "supplier, region, nation ×2) so the fact shuffles exactly once "
        "(lineitem⋈orders on orderkey); the share numerator is a "
        "conditional sum inside the SAME aggregate as the denominator — "
        "one pass, no second join back."
    ),
    "q35_avg_yearly": (
        "Correlated scalar subquery (TPC-H Q17 shape), decorrelated by "
        "hand. Look for: the Brand filter semi-joining lineitem through "
        "a broadcast of ~0.5% of part keys BEFORE anything else (both "
        "sides of the per-part average see only brand lineitems); the "
        "per-part average attached as `BroadcastHashJoin` — NO "
        "SortMergeJoin anywhere, the fact is never shuffled on a "
        "fact-sized key."
    ),
    "q36_large_volume_customer": (
        "IN-(grouped-HAVING-subquery) (TPC-H Q18 shape). Look for: ONE "
        "aggregation of lineitem on l_orderkey with partial_sum before "
        "its exchange, then the filtered (rare: total_qty > 300) "
        "aggregate joined to orders — AQE plans it as a broadcast at "
        "this SF; at 100 TB both sides bucketed by orderkey make the "
        "join exchange-free, and the final top-100 is "
        "`TakeOrderedAndProject`."
    ),
    "q37_important_parts": (
        "Scalar aggregate subquery in HAVING (TPC-H Q11 shape). The "
        "static plan below shows the per-part groupBy TWICE (row side "
        "+ global-mean side); at runtime AQE's ReuseExchange collapses "
        "them — the executed plan carries ONE parquet scan and a "
        "`ReusedExchange` (asserted in tests/test_relational.py), so "
        "the 100 TB fact is scanned and aggregated exactly once; the "
        "1-row mean attaches via `BroadcastNestedLoopJoin`."
    ),
    "d10_substring_coverage": (
        "Duplicated-substring span coverage (exact-substring dedup "
        "shape). Look for: `partial_count` BEFORE the hash exchange "
        "(map-side combine — a boilerplate 8-gram repeated a million "
        "times collapses locally, where an analytic window would pile "
        "every occurrence into one partition); the ≥2-occurrence hash "
        "set rejoined `LeftSemi` on h (skewed probe side is AQE "
        "skew-join territory); then ONE doc_id exchange for the "
        "interval-merge island sweep. The 8-token windows explode in "
        "codegen (`Generate` over transform(sequence)), ~n_tokens rows."
    ),
    "q39_returned_items": (
        "Returned-item reporting (TPC-H Q10 shape). Look for: "
        "`EqualTo(l_returnflag,R)` in the lineitem scan's PushedFilters "
        "AND the o_orderdate range in the orders scan's — both facts "
        "pruned before the orderkey join; customer/nation broadcast; "
        "top-20 as `TakeOrderedAndProject` (no global sort of the agg)."
    ),
    "s10_pq_adc": (
        "Product quantization + asymmetric distance computation. Look "
        "for: ZERO Exchange nodes before `TakeOrderedAndProject`, and "
        "(since r16) ONE `MapInPandas` node — codebooks and the "
        "query's distance LUT ride the task closure of a vectorized "
        "numpy kernel (the pre-r16 literal-expression folds were "
        "CodegenFallback and their constant-tree analysis dominated "
        "the wall; 4.6x interleaved — OPTIMIZATION_r16.md §2; the "
        "expression twin `_s10_pq_adc_expr` stays in-tree, identity-"
        "pinned). The billion-code single-pass scan shape "
        "(plan-asserted in tests/test_similarity.py)."
    ),
    "c10_pii_redaction": (
        "PII redaction accounting. Look for: a single narrow Project "
        "holding all three `regexp_count`s and the triple "
        "`regexp_replace` length delta — JVM regex inside one "
        "WholeStageCodegen span, no Python — and ONE exchange total "
        "(the 20-source rollup with partial_sum map-side combine). The "
        "cheapest possible 100 TB shape: linear scan, shuffle carries "
        "20 rows."
    ),
    "q41_min_cost_supplier": (
        "Correlated MIN subquery (TPC-H Q2 shape), PART-FILTER-FIRST "
        "(round-5 restructure after the r4 judge flagged the old "
        "aggregate-everything-then-broadcast shape). Look for: the "
        "size/type part predicate pushed into the part scan and applied "
        "to lineitem as a broadcast LEFT-SEMI **before** the (partkey, "
        "suppkey) aggregation — the per-part regional minimum is "
        "independent of the part predicate, so the slice is "
        "semantically identical and `min_cost` is bounded by part "
        "selectivity instead of one row per regional partkey (~20 M at "
        "sf100). No forced broadcast on any SF-scaling side: supplier "
        "and min_cost joins are AQE's runtime choice. The static plan "
        "below shows the ps aggregation twice (row side + per-part-min "
        "side); at runtime AQE's ReuseExchange collapses them to one "
        "(asserted in tests/test_relational.py, along with the "
        "semi-join-first shape). Final top-100 is "
        "TakeOrderedAndProject."
    ),
    "q42_product_profit": (
        "Product-type profit (TPC-H Q9 shape). Look for: the p_name "
        "LIKE filter pruning parts INSIDE a broadcast build side, so "
        "the lineitem⋈part broadcast join discards non-widget rows "
        "before the only fact-sized exchange (lineitem⋈orders on "
        "orderkey — bucket-able to zero at scale); supplier and nation "
        "broadcast; one partial_sum aggregate on (nation, year)."
    ),
    "q43_supplier_part_counts": (
        "Parts/supplier relationship (TPC-H Q16 shape with NOT IN). "
        "Look for: the fact collapsing to DISTINCT (partkey, suppkey) "
        "pairs first — partial HashAggregate before the pair-keyed "
        "exchange, so the shuffle carries the dedup'd partsupp relation "
        "(~1e-3 of lineitem), not the fact; NOT IN compiled to "
        "BroadcastHashJoin LeftAnti (keys non-null); part filter "
        "broadcast; the final count-distinct groups the tiny pair set."
    ),
    "q44_surge_suppliers": (
        "Doubly-nested IN with correlated aggregate threshold (TPC-H "
        "Q20 shape). Look for: the widget part filter as a broadcast "
        "LeftSemi BEFORE the only fact exchange; the correlated "
        "all-time total and the 1999 window folded into ONE conditional "
        "aggregation on (suppkey, partkey) — sum(qty WHERE 1999) vs "
        "sum(qty), a single pass where the naive plan joins the fact to "
        "itself; surviving keys collapse to a broadcast semi-filter on "
        "the supplier dim."
    ),
    "q45_dormant_customers": (
        "Scalar subquery + filtered NOT EXISTS (TPC-H Q22 shape). Look "
        "for: the o_orderdate predicate in the orders scan's "
        "PushedFilters (partition-prunable at scale — the anti side "
        "reads months, not years); the positive-balance mean as a "
        "1-row BroadcastNestedLoopJoin; LeftAnti on custkey (AQE "
        "skew-splittable); customer scanned once."
    ),
    "x02_countmin_heavyhitters": (
        "Count-min sketch heavy hitters. Look for: the sketch branch's "
        "exchange keyed on (lane, bucket) — ≤4096 distinct keys at ANY "
        "corpus size, with partial_count map-side combine after the "
        "posexplode; the md5-lane buckets computed in codegen (no "
        "Python); the probe side exploding only the top-k candidate "
        "set and joining the broadcast sketch. The exact-count branch "
        "exists only for the QA compare — production keeps the "
        "4096-key path and drops the token-keyed shuffle entirely."
    ),
    "q46_shipmode_priority": (
        "Two-level conditional counts (TPC-H Q12 shape). Look for: the "
        "1999 ship-year envelope in the lineitem scan's PushedFilters; "
        "the lateness predicate applied right after the orderkey join "
        "(the only fact exchange, bucket-able to zero); both priority "
        "CASE counts in ONE aggregate pass with partial_sum map-side."
    ),
    "q47_nation_reconciliation": (
        "Sell-side vs buy-side reconciliation — FULL OUTER join. Look "
        "for: each side aggregated FIRST (partial agg + date envelope "
        "in its scan), so the full outer joins two ~75-row aggregates, "
        "never fact rows; COALESCE key merging and null-as-zero "
        "accounting in the final Project. The at-scale rule this query "
        "encodes: full outer on pre-aggregated keys only."
    ),
    "x06_histogram_quantiles": (
        "Histogram quantile sketch. Look for: the grid exchange keyed "
        "on (flag, bucket) — ≤ groups·B keys at any row count, "
        "partial_count map-side; the bucketing floor() in codegen; the "
        "cumulative/window pass over the tiny grid; integer rank "
        "thresholds ((n·p + 999) div 1000) so the estimate itself is "
        "oracle-verified. +-mergeable registers = shard-parallel and "
        "streamable, same as the count-min grid."
    ),
    "x04_hll_distinct": (
        "HyperLogLog distinct sketch. Look for: the register branch's "
        "exchange keyed on bucket — ≤256 keys with partial_max "
        "map-side (shard registers merge by max; that IS the "
        "mergeability HLL exists for); every rho/harmonic-sum/estimate "
        "expression integer (bin/length/shiftleft in codegen, `div` "
        "divisions) so the ESTIMATE is oracle-verified, not a float "
        "neighbor. The exact-count branch (Expand for countDistinct) "
        "exists only for the QA compare."
    ),
    "x05_bloom_crosscorpus": (
        "Bloom-filter cross-corpus membership. Look for: corpus A "
        "(train shingles) collapsing to a ≤65536-row distinct bit set "
        "that rejoins as BroadcastHashJoin LeftSemi — corpus B probes "
        "WITHOUT shuffling A; matched-vs-needed DISTINCT position "
        "counts (lanes can collide) decide membership; the k=4 "
        "md5-lane positions in codegen. No false negatives by "
        "construction (n_bloom_hits ≥ n_true_members in the output); "
        "the FP count is exact on both engines."
    ),
    "c11_priority_sample": (
        "Weighted sampling via Priority Sampling (Duffield–Lund–"
        "Thorup). Look for: TakeOrderedAndProject for the top-(k+1) — "
        "per-partition heaps, driver merges k+1 rows, NO global sort; "
        "the priority (w << 24) // u as exact integer codegen (no "
        "selection-boundary ulp risk); τ attached as a 1-row broadcast "
        "and the Horvitz–Thompson weights computed in the same narrow "
        "Project."
    ),
    "x03_zorder_cells": (
        "Z-order (Morton) cell audit. Look for: the interleave as pure "
        "integer bitwise ops inside one WholeStageCodegen span (four "
        "spread rounds per dimension, no UDF); ONE exchange keyed on "
        "the coarse cell (bounded key space, partial aggregates "
        "map-side); top-20 as TakeOrderedAndProject. The write-side "
        "twin (zorder_layout) turns the same key into "
        "repartitionByRange + sortWithinPartitions for min-max file "
        "skipping on BOTH dimensions (tests/test_layout.py measures "
        "it on real parquet footers)."
    ),
    "s11_ivf_pq_search": (
        "The COMPOSED IVF-PQ query (round 5; numpy kernel since r16): "
        "coarse probe → PQ-ADC scan → exact re-rank. Look for: ONE "
        "parquet scan; centroid assignment, cell filter, PQ codes, "
        "the ADC sum and the exact distance all inside ONE "
        "`MapInPandas` (centroids + codebooks + LUT in the task "
        "closure — 7.6x interleaved vs the literal-expression twin "
        "`_s11_ivf_pq_search_expr`, which stays identity-pinned); NO "
        "Exchange hashpartitioning anywhere; the shortlist is "
        "TakeOrderedAndProject(20) over narrow (id, cell, d2) rows. "
        "At scale `cell` is the partition key and the nprobe filter "
        "prunes files."
    ),
    "c13_mixture_rebalance": (
        "Temperature-scaled mixture weights (round 5). Look for: one "
        "HashAggregate pair (partial → final) collapsing the corpus to "
        "|sources| rows BEFORE anything else; the totals are an "
        "aggregate OF that tiny table cross-joined back as a broadcast "
        "single row. The fact is scanned once, shuffled as |sources| "
        "rows."
    ),
    "x08_fk_orphans": (
        "Referential-integrity audit (round 5). Look for: per edge, "
        "ONE distinct-key aggregation feeding ONE left-outer "
        "SortMergeJoin whose single aggregate computes both counts "
        "(count + count-of-null-parent) — no second scan per edge; the "
        "three edges are independent subtrees unioned at one row each."
    ),
    "t12_mean_token_rank": (
        "Mean corpus-frequency rank (round 5; rank distributed r7). "
        "Look for: explode → token-keyed HashAggregate (map-side "
        "combine) collapsing occurrences to the vocab, then "
        "distributed_order_stats' bucket-partitioned row_number (no "
        "single-task vocab sort at any vocab size), one token-keyed "
        "join back, and a doc-keyed aggregate. Observed wide "
        "exchanges: 3 (ceiling 4)."
    ),
    "e15_transition_matrix": (
        "Event-type transition matrix (round 5). Look for: ONE "
        "user_id-keyed Exchange feeding the lag Window (the same "
        "partitioning e04 sessionization shuffles on — co-schedulable), "
        "then a (from,to)-keyed aggregate of |types|² rows and a "
        "broadcast join for row totals."
    ),
    "d13_keep_best_quality": (
        "Keep-best-quality dedup (round 5; plan-audited round 6). "
        "Composes d03 pairs → d09 star clustering → max_by keeper. "
        "Look for: the d03 candidate-pair subtree computed ONCE — the "
        "executed plan carries `ReusedExchange` nodes where clustering "
        "and scoring both consume it (observed 2 reuse nodes, asserted "
        "in tests/test_plan_fingerprints.py); quality scoring semi-"
        "joined to cluster MEMBERS before the tokenize-heavy "
        "projection, so non-clustered text is never scored; no forced "
        "broadcast on the SF-scaling membership side (AQE decides). "
        "Observed wide exchanges: 6 (ceiling 7)."
    ),
    "c14_curation_pipeline": (
        "Full curation pipeline in ONE lazy plan (round 5; plan-"
        "audited round 6): d03 dedup → d09 clusters → keep-best → "
        "quality gate → hash split → per-(split,lang) manifest. Look "
        "for: `ReusedExchange` where keepers and the anti-joined "
        "unclustered survivors share the d03/comp subtrees (observed 3 "
        "reuse nodes, asserted in tests/test_plan_fingerprints.py); "
        "the md5 split and token count in codegen; the final agg "
        "carries |splits|×|langs| rows. Observed wide exchanges: 8 "
        "(ceiling 9) — for the THREE heaviest subsystems composed, "
        "Catalyst sees end-to-end and nothing is materialized between "
        "stages."
    ),
    "n01_minhash_estimator_qa": (
        "MinHash calibration audit (round 6): lane-agreement estimate "
        "vs exact shingle Jaccard for every VERIFIED d03 pair. Look "
        "for: the broadcast semi-filter restricting the tokenize-heavy "
        "shingle explode to PAIR DOCS only (candidates ≪ corpus); one "
        "signature aggregation shared with the estimate. Observed wide "
        "exchanges: 3 (ceiling 4)."
    ),
    "n02_source_pair_tvd": (
        "Pairwise source token-distribution TVD. Look for: the ONLY "
        "join keyed on the SHARED vocabulary (the union term is "
        "algebraic: Σ_union|p1−p2| = Σ_shared|p1−p2| − Σ_shared p1 − "
        "Σ_shared p2 + T1 + T2) — no dense |vocab|×|pairs| grid "
        "anywhere in the plan. Observed wide exchanges: 7 (ceiling 8)."
    ),
    "n03_source_gini": (
        "Gini of source doc counts. Look for: the pairwise cross "
        "product fed by the |sources|-ROW aggregate (broadcast-sized), "
        "never the corpus — the corpus contributes one map-side-"
        "combined count agg; the BNLJ is the legitimate tiny-aggregate "
        "attach. Observed wide exchanges: 3 (ceiling 4)."
    ),
    "n04_event_burstiness": (
        "Fano factor of daily per-type counts over the DENSE day grid. "
        "Look for: one (type, day) fact aggregation with partial agg; "
        "the dense grid built from sequence(min,max) × tiny distinct "
        "types (broadcast BNLJ, legit); exact int64 moments. Observed "
        "wide exchanges: 2 (ceiling 3)."
    ),
    "n05_sequence_packing": (
        "Concat-and-chunk training-shard audit, riding the two-pass "
        "distributed prefix sum since r7 (distributed_cumsum with "
        "partition_cols=source). Look for: every window PARTITIONED by "
        "(source, _rpid) or source — NO partition-less window, no "
        "Exchange SinglePartition (guarded); the offsets come from a "
        "window over the (source, bucket) partial-sum AGGREGATE. "
        "Observed wide exchanges: 2 (ceiling 3)."
    ),
    "n06_quality_deciles": (
        "Curriculum deciles via distributed_ntile since r7 — the r6 "
        "single-reducer global ntile is GONE. Look for: literal "
        "quantile-boundary bucket ids in the projection; the "
        "row_number window partitioned by _rpid; tile assignment as "
        "pure CASE arithmetic on the reconstructed global position; NO "
        "Exchange SinglePartition (guarded in "
        "test_plan_fingerprints). Observed wide exchanges: 2 "
        "(ceiling 3)."
    ),
    "n14_token_volume_deciles": (
        "Token-budget share per length decile (r7). Look for: the same "
        "distributed_ntile shape as n06 over the heavy-tie tok key "
        "(ties never split a range bucket); the corpus total attached "
        "as a broadcast 1-row scalar (BNLJ-allowed). Observed wide "
        "exchanges: 2 (ceiling 3)."
    ),
    "n15_vocab_coverage": (
        "Per-language k50/k90/k99 vocabulary head sizes (r7). Look "
        "for: ONE (lang, token) count aggregate over the exploded "
        "stream (map-side combined — the only pass over text); the "
        "running coverage via distributed_cumsum(partition_cols=lang, "
        "DESC, tie=tok) — windows partitioned by (lang, _rpid), no "
        "single-task per-language sort; threshold ranks as integer "
        "comparison counts, no rank window at all. Observed wide "
        "exchanges: 1 (ceiling 2)."
    ),
    "n16_retention_cohorts": (
        "Weekly cohort retention matrix (r7). Look for: distinct "
        "(user, week) activity as a partial-agg'd aggregate; cohorts "
        "as a per-user min (no window); ONE user_id-keyed join back; "
        "cohort sizes broadcast. Integer week arithmetic — no "
        "date_trunc semantics to align across engines. Observed wide "
        "exchanges: 2 (ceiling 3)."
    ),
    "n17_event_heavy_hitters": (
        "Per-type top-3 user share (r7). Look for: the rank window "
        "PARTITIONED by event_type with the rnk<=3 filter planned as "
        "WindowGroupLimit (each partition retains only its top rows "
        "before the full sort); per-type totals broadcast; ppm is "
        "integer math. Observed wide exchanges: 4 (ceiling 5)."
    ),
    "n07_semantic_dedup": (
        "SemDeDup composition (round 6; fat-cell guard round 10): "
        "shared Lloyd trainer → (cell, vector) exact-dup collapse → "
        "cluster-scoped pairwise cosine over group REPRESENTATIVES → "
        "keep-lowest-id. Look for: assignment as a NARROW "
        "literal-centroid map (no corpus shuffle inside iterations); "
        "the (cell, v) hash aggregate BEFORE the pair join, so the "
        "quadratic term is Σ|distinct-per-cell|², not Σ|cell|² (a "
        "duplicate-heavy corpus — the 10× sweep's 271 s wall — "
        "collapses to base-corpus pair work: 9.6 s); the pair join "
        "under EXPLICIT AQE-exempt (cell, bucket) repartitions; "
        "intra-group drops from ONE conditional aggregate over the "
        "groups (no filter fork of the collapse subtree). Observed "
        "wide exchanges: 2 (ceiling 2)."
    ),
    "n09_cross_source_contamination": (
        "Cross-source contamination matrix (round 6). Look for: ONE "
        "parquet scan and ONE Generate explode feeding the whole "
        "query (the shingle subtree is shared via ReusedExchange — 3 "
        "reuse nodes — not recomputed per consumer); the boilerplate "
        "cap as a Window count over `h` whose exchange ALSO "
        "pre-partitions the pair self-join (no second h-shuffle); "
        "pair fan-out bounded at C(16,2) per shingle by the cap, so "
        "the quadratic term is a constant, not corpus-sized. Observed "
        "wide exchanges: 6 (ceiling 7)."
    ),
    "n10_embedding_dispersion": (
        "Per-label embedding dispersion (round 6). Look for: "
        "posexplode → ONE (label, dim) hash aggregate with "
        "partial_sum before the exchange (dims × labels rows move, "
        "not vectors), then a labels-sized reduction; no joins, no "
        "second pass over the embedding column. Quantize-then-sum "
        "keeps every cross-row sum int64-exact. Observed wide "
        "exchanges: 2 (ceiling 3)."
    ),
    "n11_split_balance": (
        "Split-balance audit (round 6). Look for: ONE fact-sized "
        "(lang, split) aggregate; lang totals, split totals, and the "
        "grand total all derive from those ≤ |langs|×3 rows (the "
        "cell exchange is reused) and attach as broadcasts — the "
        "1-row grand total via the allowed BNLJ attach pattern. "
        "Shares computed in ppm first, so no n_lang×n_split product "
        "forms (int64-safe at any corpus size). Observed wide "
        "exchanges: 6 (ceiling 7)."
    ),
    "n12_source_dup_profile": (
        "Intra- vs cross-source duplicate profile (round 6). Look "
        "for: ONE parquet scan — the (source, h) stake aggregate is "
        "the only fact-sized exchange, and the group classifier "
        "derives FROM it (g_docs = sum of stakes, g_srcs = stake "
        "count per h), so the h join moves only digest-sized "
        "aggregates and the text column never shuffles. Observed "
        "wide exchanges: 4 (ceiling 5)."
    ),
}

INGEST_NOTE = (
    "The r3 VERDICT scale defect, fixed, plus the r4 tile-first fused "
    "assembly. z comes from a content-PRUNED listing (the window's "
    "exchange moves ~100-byte path rows — `ReadSchema: "
    "struct<path:string>` on its scan — and rejoins as a broadcast), "
    "so decode runs in the scan's own file-split partitions. ONE fused "
    "kernel decodes a slice AND cuts it into (cy, cx) tiles (two "
    "chained kernels would round-trip the full pixel volume through an "
    "extra JVM↔Python Arrow crossing) BEFORE the one real shuffle, "
    "whose key is the full chunk coordinate (channel, stack, cz, cy, "
    "cx): assembly parallelism scales with #tiles (not #z-slabs), peak "
    "group memory is chunk_z × tile bytes (~512 KB for 128³ bricks, vs "
    "chunk_z × plane bytes ≈ hundreds of MB), and the exchange moves "
    "exactly the same pixel bytes it always had to."
)

SUBPLAN_AUDIT = """## Shared-subplan audit of the headline set (round 4, VERDICT ask #6)

Checked each bench.py headline query for subplans computed more than
once (the pattern d03 already guards with an explicit persist of its
candidate-pair table):

- **e04_sessionize** — one events scan; lag-flag and running-sum ride
  the SAME (user_id, ts) window partitioning, so Catalyst plans one
  Exchange and two Window operators over it.  Nothing consumed twice.
- **e05_asof_join** — `events` appears twice (purchase side, click
  side) but each is a separate PRUNED scan (`PushedFilters:
  EqualTo(event_type, purchase|click)`, verified in the formatted
  plan) feeding one Union → one Window.  Each subplan executes exactly
  once per action.  An explicit cache of the unfiltered table would
  *hurt* at scale: it trades two predicate-pushed columnar scans for a
  full-table materialization.  No change.
- **d03_dedup_minhash_lsh** — `cand` persisted (unchanged); the only
  headline query whose DAG genuinely consumes an intermediate twice
  (candidate verify + output), and it is cached.
- **q01/q03/q07/q12/e02/s01/t02/i01/i03** — straight-line DAGs, every
  operator consumed once (q12's Expand ×4 for the 3 exact
  countDistincts is one pass, inherent to the semantics).

Conclusion: single-computation holds across the headline set; no new
persist() calls warranted.
"""


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
        # harness-level cache hygiene (the plans keep their persists)
        spark.catalog.clearCache()
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", note, "", "```", buf.getvalue().rstrip(), "```", ""]

    # imaging ingest plan over a tiny generated stack tree (no parquet
    # surface for this path, so it can't ride the registry loop above)
    import shutil
    import tempfile

    sys.path.insert(0, str(REPO / "tests"))
    from imaging_fixtures import make_dataset

    from aind_smartspim_data_transformation_spark.sources.stack_reader import (
        read_stack_tree,
    )

    tmp = Path(tempfile.mkdtemp(prefix="plans_img_"))
    try:
        make_dataset(tmp)
        df = read_stack_tree(spark, str(tmp / "SmartSPIM"), chunk_z=2, chunk_y=32, chunk_x=40)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [
            "## imaging ingest (read_stack_tree: scan → decode → tile → chunk)",
            "",
            INGEST_NOTE,
            "",
            "```",
            buf.getvalue().rstrip(),
            "```",
            "",
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # fingerprints: measured wide-exchange counts of the guarded set
    # (executed adaptive plans — the numbers the test ceilings pin)
    from test_plan_fingerprints import (  # tests/ already on sys.path
        MAX_WIDE_EXCHANGES,
        REQUIRE_REUSED_EXCHANGE,
    )

    fp = [
        "## Fingerprints — measured wide-exchange counts (guarded set)",
        "",
        f"Executed adaptive plans at {SF_DIR} (identical counts were",
        "measured at sf0.001 in r6).  `tests/test_plan_fingerprints.py`",
        "pins each query's ceiling at observed+1; regenerate this table",
        "before touching a ceiling.",
        "",
        "| query | wide exchanges | ceiling | reused | BNLJ |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(MAX_WIDE_EXCHANGES):
        spark.catalog.clearCache()
        df = queries[name](spark, SF_DIR)
        df.collect()
        plan = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        n = plan.count("Exchange hashpartitioning")
        reuse = plan.count("ReusedExchange")
        mark = " (required)" if name in REQUIRE_REUSED_EXCHANGE else ""
        fp.append(
            f"| {name} | {n} | {MAX_WIDE_EXCHANGES[name]} | "
            f"{reuse}{mark} | "
            f"{'yes' if 'BroadcastNestedLoopJoin' in plan else 'no'} |"
        )
    out += fp + [""]

    out += [SUBPLAN_AUDIT]
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'}")


if __name__ == "__main__":
    main()
