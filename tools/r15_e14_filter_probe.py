#!/usr/bin/env python
"""r15 ABAB probe: e14 pointer jumping, converged-row filtering vs
the r14 every-row-rejoins shape (VERDICT r14 ask #7).

A pointer-jumping row whose target already self-loops can never move
again; filtering it out of the next round's join LEFT side makes the
iterated input shrink geometrically instead of staying corpus-sized
for every one of the ~log2(max chain) rounds.  Both arms share the
r15 exact-handle release mechanics so the probe isolates ONLY the
filtering.  Adopt at >=1.3x (the standard gate); row-identity is
asserted by tests at small SF and cross-checked here via row counts.

Orchestrate:  python tools/r15_e14_filter_probe.py --factor 100 \
    --reps 2 --timeout 1800 [--out tools/r15_e14_filter_probe.json]
Single run (used internally):
    python tools/r15_e14_filter_probe.py --mode filtered --dir <corpus>
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
        app_name=f"e14-filter-probe-{mode}", driver_memory="32g"
    )
    # "unfiltered" IS the registered plan (the probe rejected the
    # filtered candidate — 0.87× min-over-min; see the decision in
    # plans/events.py::_e14_pointer_jumping_filtered's docstring).
    fn = (
        E._e14_pointer_jumping_filtered
        if mode == "filtered"
        else E._e14_pointer_jumping
    )
    t0 = time.perf_counter()
    n = fn(spark, corpus).count()
    wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({"mode": mode, "wall_sec": wall, "rows": n}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["filtered", "unfiltered"])
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
        tmp = args.dir
    else:
        from aind_smartspim_data_transformation_spark.session import (
            build_local_session,
        )
        from tools.overflow_sweep import build_scale_dir

        tmp = tempfile.mkdtemp(prefix="e14_filter_probe_")
        spark = build_local_session(
            app_name="e14-filter-probe-build", driver_memory="32g"
        )
        build_scale_dir(spark, args.base, tmp, args.factor, skew=args.skew)
        spark.stop()

    runs: list[dict] = []
    for rep in range(args.reps):
        # interleaved ABAB: unfiltered first so cache/page warmth, if
        # any, favors the INCUMBENT arm
        for mode in ("unfiltered", "filtered"):
            cmd = [sys.executable, __file__, "--mode", mode, "--dir", tmp]
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    cmd,
                    cwd=REPO,
                    timeout=args.timeout,
                    capture_output=True,
                    text=True,
                )
                line = (
                    proc.stdout.strip().splitlines()[-1]
                    if proc.stdout.strip()
                    else ""
                )
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
    f_walls, u_walls = ok("filtered"), ok("unfiltered")
    summary = {
        "probe": "r15_e14_converged_filter_abab",
        "factor": args.factor,
        "skew": args.skew,
        "timeout_sec": args.timeout,
        "runs": runs,
        "filtered_min_sec": min(f_walls) if f_walls else None,
        "unfiltered_min_sec": min(u_walls) if u_walls else None,
        "speedup_min_over_min": (
            round(min(u_walls) / min(f_walls), 2)
            if f_walls and u_walls
            else None
        ),
        "rows_match": len(
            {r["rows"] for r in runs if r["status"] == "ok" and "rows" in r}
        )
        <= 1,
    }
    print(json.dumps(summary))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
