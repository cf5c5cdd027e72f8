#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line on stdout:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": 0.1}

(r16: the bulky per-run noise telemetry — `query_runs` — is emitted on
STDERR as `# query_runs: {...}` so the stdout contract line stays
short; the r14 line grew long enough that the driver's tail capture
truncated it and the round lost its PERF comparison.)

Each query is executed to completion (results are collected — headline
results are small aggregates / top-ks), timed individually after a JVM
warm-up action.  Run locally while iterating:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import build_local_session  # noqa: E402

# Headline set: one per operator family — scan+agg, fact-fact join,
# window, time-window, as-of, minhash dedup, similarity, text quality,
# imaging windowed-mean semantics.
HEADLINE = (
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q07_window_rank",
    "q12_distinct_agg",
    "e02_tumbling_window",
    "e04_sessionize",
    "e05_asof_join",
    "d03_dedup_minhash_lsh",
    "s01_cosine_topk",
    "t02_quality_score",
    "i01_windowed_mean_grid",
    "i03_pyramid_level",
)

# Dedup/ANN pair-loop family (VERDICT r9 #6: the headline list never
# sampled it, so its biggest wins — d05's 30× norm precompute, d07's
# bucketed self-join, n07's fat-cell collapse — were invisible to
# BENCH).  Reported as its own block, NOT folded into total_query_sec,
# which stays comparable round-over-round.  d07 materializes ~2M pair
# rows at sf0.1 — timed via count() so the figure measures the join
# engine, not 2M-row driver pickling.  Under count(), Catalyst prunes
# the plan ABOVE the join by design (EliminateSorts drops the global
# orderBy under an aggregate, and the least/greatest projection is
# column-pruned) — the figure therefore measures the join stage only,
# which is the stated target; a collect() would add sort + pickling.
DEDUP_BENCH = (
    "d05_dedup_embedding_cosine",
    "d07_simhash_hamming_pairs",
    "n07_semantic_dedup",
    "d14_hamming_neighbor_topk",
)
_COUNT_ONLY = {"d07_simhash_hamming_pairs"}

# Graph / d03-consumer family (r16, VERDICT r15 ask #4): the
# registry's most expensive block — the shared-candidate persist +
# loop-fusion wins of r15 (n01 90→37 jobs, d08 57→41) — was invisible
# to BENCH because neither HEADLINE nor DEDUP_BENCH samples it.
# Reported as its own block, NOT folded into total_query_sec, which
# stays comparable round-over-round.
GRAPH_BENCH = (
    "n01_minhash_estimator_qa",
    "c14_curation_pipeline",
    "d08_dup_components",
)

# PQ/ANN family (r16): s10/s11 carry this round's largest per-query
# win (literal codebook/LUT expression trees → numpy mapInPandas,
# 4.6×/7.6× interleaved) but sat in no bench block — additive block so
# the change is driver-measurable.  NOT folded into total_query_sec.
PQ_BENCH = (
    "s10_pq_adc",
    "s11_ivf_pq_search",
)


def _host_calibration(reps: int = 3) -> float:
    """Fixed single-core CPU reference: sha256 over 128 MiB, min-of-N
    seconds.  The r13 convergence flags catch a NOISY host (two
    fastest runs disagreeing) but not a HOMOGENEOUSLY SLOW window —
    every r14 sf0.1 anchor query read ~1.3× elevated with
    converged=true (NOTES_r14).  This constant-work loop gives
    cross-round comparisons an absolute denominator: walls from two
    rounds are comparable only after dividing out their calibration
    ratio.  Single-threaded on purpose — Spark tasks are per-core, so
    per-core speed (frequency scaling, steal time) is the confounder
    to measure."""
    import hashlib

    buf = bytes(range(256)) * (128 * 1024 * 1024 // 256)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        hashlib.sha256(buf).hexdigest()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _host_calibration_parallel(reps: int = 2) -> float:
    """ALL-CORES CPU reference (r15, VERDICT r14 "what's wrong" #1):
    os.cpu_count() threads each sha256 the same 128 MiB buffer;
    reported figure is the min-of-N wall for ALL threads to finish.

    The serial loop above cannot sense the noise source that actually
    moved the r14 driver bench: multi-core contention against a
    local[32] Spark job.  Measured proof — the r14 loaded-host run
    read serial calibration 0.101/0.105, statistically identical to
    the idle-host 0.1012/0.1008, while the Spark walls differed
    1.19×.  With every core hashing at once, neighbor load inflates
    this wall roughly in proportion to the core-seconds it steals
    (hashlib releases the GIL for large buffers, so the threads
    genuinely occupy all cores).  Validation run (idle vs synthetic
    16-core load): tools/r15_calibration_validation.json."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    n = os.cpu_count() or 1
    buf = bytes(range(256)) * (128 * 1024 * 1024 // 256)
    best = float("inf")
    with ThreadPoolExecutor(max_workers=n) as pool:
        for _ in range(reps):
            t0 = time.perf_counter()
            list(pool.map(lambda _: hashlib.sha256(buf).digest(), range(n)))
            best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    load_pre = list(os.getloadavg())
    calib_pre = _host_calibration()
    calib_par_pre = _host_calibration_parallel()
    spark = build_local_session(app_name="bench", driver_memory="32g")
    # JVM warm-up: codegen pipeline + parquet reader paths (tiny sf0.001
    # dim table — NOT the benchmark data, which stays cold).
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").groupBy(
        "r_name"
    ).count().collect()

    queries = registry.all_queries()
    # Per-query-shape warm-up at sf0.001 (~100× smaller than the
    # benchmark data): compiles each plan's whole-stage codegen once so
    # the timed runs below measure engine throughput, not JIT compile.
    for name in HEADLINE + DEDUP_BENCH + GRAPH_BENCH + PQ_BENCH:
        try:
            queries[name](spark, "/root/testdata/sf0.001").collect()
        except Exception as exc:  # warm-up must never fail the bench
            print(f"# warm-up {name} skipped: {exc}", file=sys.stderr)
    spark.catalog.clearCache()  # drop any persist() leftovers from warm-up

    # Per-query noise telemetry (VERDICT r12 ask #7): every run is
    # reported, plus whether the adaptive best-of CONVERGED (two
    # fastest within 30%) — so a uniformly-inflated loaded-host round
    # is machine-distinguishable from a real regression without
    # digging out a local anchor (BASELINE.md protocol step 1).
    run_log: dict[str, dict] = {}

    def time_query(name: str) -> float:
        fn = queries[name]
        # Adaptive best-of: the container shares a host and neighbor
        # load can double a run at random.  Keep timing (max 4 runs)
        # until the two fastest agree within 30% — the reported best is
        # then a steady-state measurement, not a noise draw.
        runs: list[float] = []
        n = 0
        converged = False
        for attempt in range(4):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count() if name in _COUNT_ONLY else len(df.collect())
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            if attempt >= 1:
                a, b = sorted(runs)[:2]
                if b <= a * 1.3:
                    converged = True
                    break
        best = round(min(runs), 4)
        run_log[name] = {
            "runs": [round(r, 4) for r in runs],
            "converged": converged,
        }
        print(
            f"# {name}: {best:.3f}s ({n} rows, {len(runs)} runs, "
            f"{'converged' if converged else 'NOT CONVERGED'})",
            file=sys.stderr,
        )
        return best

    timings = {name: time_query(name) for name in HEADLINE}
    dedup_timings = {name: time_query(name) for name in DEDUP_BENCH}
    graph_timings = {name: time_query(name) for name in GRAPH_BENCH}
    pq_timings = {name: time_query(name) for name in PQ_BENCH}

    # Imaging end-to-end (scan → decode → pyramid → OME-Zarr) on a
    # generated 2000×1600 stack tree, graduated from
    # tools/bench_imaging.py so ingest regressions land in BENCH_r{N}.
    # Reported as its own block — NOT folded into total_query_sec, which
    # stays comparable round-over-round.  mb_per_sec is the depth-robust
    # comparable.  Depth 64 (1.6 GB raw) since round 5: the 16-slice
    # figure was startup-dominated and understated steady-state
    # throughput by ~2× (NOTES_r04 "Imaging ingest parallelism").
    imaging = None
    try:
        from tools.bench_imaging import run_e2e

        # Best-of-N (VERDICT r9 #7): the single-shot figure swung
        # 50–199 MB/s across rounds on identical code — min-of-N
        # wall-clock (= max throughput) is the honest statistic per
        # BASELINE.md's own protocol.  All N throughputs are reported
        # so a noise draw is visible instead of needing adjudication.
        # r16 (VERDICT r15 ask #6): N raised to 5 and a parallel
        # host-calibration sample is taken IMMEDIATELY BEFORE each
        # attempt, so each throughput figure carries its own load
        # context — cross-round imaging drift (the r15 driver number
        # halved on pure host noise) becomes adjudicable from the
        # artifact alone, per-run, without a judge re-run.
        n_sl = int(os.environ.get("IMG_BENCH_SLICES", "64"))
        reps = int(os.environ.get("IMG_BENCH_REPS", "5"))
        attempts = []
        run_calibs = []
        for _ in range(reps):
            run_calibs.append(_host_calibration_parallel(reps=1))
            attempts.append(run_e2e(spark, n_sl))
        imaging = dict(max(attempts, key=lambda m: m["mb_per_sec"]))
        imaging["runs"] = [m["mb_per_sec"] for m in attempts]
        imaging["runs_calibration_parallel_sec"] = run_calibs
        print(f"# imaging_e2e: {imaging}", file=sys.stderr)
    except Exception as exc:  # imaging bench must never fail the harness
        print(f"# imaging e2e skipped: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    # r16 (VERDICT r15 ask #2): the per-run noise telemetry is the
    # bulky field that grew the one-line JSON past the driver's tail
    # capture (BENCH_r14 parsed:null silently cost r15 its whole PERF
    # comparison).  It moves to STDERR — same content, still committed
    # in local artifacts — so the stdout contract line stays short
    # enough that truncation-from-the-front can never reach it.
    print(f"# query_runs: {json.dumps(run_log)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "dedup_queries": dedup_timings,
                "dedup_total_sec": round(sum(dedup_timings.values()), 4),
                "graph_queries": graph_timings,
                "graph_total_sec": round(sum(graph_timings.values()), 4),
                "pq_queries": pq_timings,
                "pq_total_sec": round(sum(pq_timings.values()), 4),
                "imaging_e2e": imaging,
                # pre/post absolute host-speed reference (see
                # _host_calibration): divergent pre/post = load arrived
                # mid-bench; elevated both = slow host window — the
                # case converged=true cannot flag.
                "host_calibration_sec": {
                    "pre": calib_pre,
                    "post": _host_calibration(),
                },
                # all-cores twin (r15): the figure that actually moves
                # under multi-core neighbor load — read THIS one first
                # when adjudicating cross-round drift (BASELINE.md
                # protocol step 1); the serial figure only moves under
                # per-core slowdown (frequency scaling, steal time).
                "host_calibration_parallel_sec": {
                    "pre": calib_par_pre,
                    "post": _host_calibration_parallel(),
                },
                "loadavg_1m": {
                    "pre": round(load_pre[0], 2),
                    "post": round(os.getloadavg()[0], 2),
                },
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
