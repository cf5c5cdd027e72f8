#!/usr/bin/env python
"""e14 pointer-jumping ABAB probe (VERDICT r13 ask #4).

e14's recursive-CTE formulation replays ONE chain step per recursion
level, so the 100x-zipf hot user's ~1.48M-event session makes
iteration count the wall — the r12 sweep measured it KILLED on this
corpus (SCALE.md §6o waiver).  The pointer-jumping reformulation
(`plans/events.py::_e14_pointer_jumping`) composes ptr <- ptr(ptr)
each round: O(log longest-chain) shuffle joins instead of
O(longest-chain) recursion levels.

This probe gates the adoption the e16 way: row-identity is asserted
by tests at small SF; here both formulations run INTERLEAVED
(pointer, rcte, pointer, rcte) as SUBPROCESSES on the same prebuilt
100x zipf corpus, each under --timeout (a killed run records its
bound as a lower-bound wall — the r12 sweep's finding predicts the
rCTE needs it).  Adopt if pointer-jumping is >=1.3x faster.

Orchestrate:  python tools/e14_pointer_probe.py --factor 100 \
    --skew zipf --reps 2 --timeout 1800 [--out <json>]
Single run (used internally):
    python tools/e14_pointer_probe.py --mode pointer --dir <corpus>
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_one(mode: str, corpus: str) -> int:
    from aind_smartspim_data_transformation_spark.plans import events as E
    from aind_smartspim_data_transformation_spark.session import (
        build_local_session,
    )

    spark = build_local_session(
        app_name=f"e14-probe-{mode}", driver_memory="32g"
    )
    if mode == "pointer":
        fn = E._e14_pointer_jumping
    else:
        # the rCTE formulation — named e14_sessions_rcte since the r14
        # adoption (the registered e14_sessions_recursive IS pointer
        # jumping now, so measuring it as "rcte" would be circular)
        fn = E.e14_sessions_rcte
        if mode == "rcte_raised":
            # rcte with default confs fails LOUDLY at level 101
            # (RECURSION_LEVEL_LIMIT_EXCEEDED — any session longer
            # than 100 events, the documented guard).  This mode
            # raises the LEVEL limit on the e14 scoped clone so the
            # probe can measure what an operator who "just raises the
            # knob" gets: an iteration-count-bound wall (levels =
            # longest chain).  The ROW-limit guard e14 sizes itself
            # stays untouched.
            scoped = E._e14_scoped_session(spark)
            scoped.conf.set("spark.sql.cteRecursionLevelLimit", "2000000")
    t0 = time.perf_counter()
    n = fn(spark, corpus).count()
    wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({"mode": mode, "wall_sec": wall, "rows": n}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["pointer", "rcte", "rcte_raised"])
    ap.add_argument(
        "--modes",
        default="pointer,rcte,rcte_raised",
        help="comma-separated modes to interleave per rep",
    )
    ap.add_argument("--dir")
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--skew", choices=["zipf"], default="zipf")
    ap.add_argument(
        "--base", default=os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.mode:
        return run_one(args.mode, args.dir)

    if args.dir:
        tmp = args.dir  # reuse a prebuilt corpus
    else:
        from aind_smartspim_data_transformation_spark.session import (
            build_local_session,
        )
        from tools.overflow_sweep import build_scale_dir

        tmp = tempfile.mkdtemp(prefix="e14_probe_")
        spark = build_local_session(
            app_name="e14-probe-build", driver_memory="32g"
        )
        build_scale_dir(spark, args.base, tmp, args.factor, skew=args.skew)
        spark.stop()

    runs: list[dict] = []
    for rep in range(args.reps):
        for mode in args.modes.split(","):
            cmd = [
                sys.executable,
                __file__,
                "--mode",
                mode,
                "--dir",
                tmp,
            ]
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    cmd,
                    cwd=REPO,
                    timeout=args.timeout,
                    capture_output=True,
                    text=True,
                )
                line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
                if proc.returncode == 0 and line.startswith("{"):
                    rec = json.loads(line)
                    rec["rep"] = rep
                    rec["status"] = "ok"
                else:
                    rec = {
                        "mode": mode,
                        "rep": rep,
                        "status": "error",
                        "rc": proc.returncode,
                        "wall_sec": round(time.perf_counter() - t0, 1),
                        "stderr_tail": proc.stderr[-500:],
                    }
            except subprocess.TimeoutExpired:
                rec = {
                    "mode": mode,
                    "rep": rep,
                    "status": "timeout",
                    "wall_sec": args.timeout,
                }
            runs.append(rec)
            print(json.dumps(rec), flush=True)

    ok = lambda m: [  # noqa: E731
        r["wall_sec"] for r in runs if r["mode"] == m and r["status"] == "ok"
    ]
    p_walls, r_walls = ok("pointer"), ok("rcte") + ok("rcte_raised")
    summary = {
        "probe": "e14_pointer_jumping_abab",
        "factor": args.factor,
        "skew": args.skew,
        "timeout_sec": args.timeout,
        "runs": runs,
        "pointer_min_sec": min(p_walls) if p_walls else None,
        # a timed-out / errored rCTE run records the timeout as a LOWER
        # bound; min over completed walls if any, else the bound
        "rcte_min_sec": min(r_walls) if r_walls else None,
        "rcte_all_killed": not r_walls,
        "rows_match": len(
            {
                r["rows"]
                for r in runs
                if r["status"] == "ok" and "rows" in r
            }
        )
        <= 1,
    }
    if p_walls:
        bound = min(r_walls) if r_walls else args.timeout
        summary["speedup_x_lower_bound"] = round(bound / min(p_walls), 2)
    line = json.dumps(summary)
    print(line)
    out = Path(
        args.out or (Path(__file__).parent / "e14_pointer_probe.json")
    )
    out.write_text(line + "\n")
    print(f"artifact written: {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
