#!/usr/bin/env python
"""ABAB probe: e16's probe-union plan vs the fused one-pass candidate.

VERDICT r12 ask #6: the fused `_e16_fused_two_frame` folds the
own-bucket cumulative into the probe-union's window pass (one
exchange + one fewer parquet scan, at the cost of the asc window
sorting 2n rows).  Gate: the fused form replaces e16's registered
plan only if it measures >=1.3x on the UNSKEWED 100x corpus —
otherwise the union form stays and SCALE.md §6s records why.

Both plans are consumed through a value-forcing aggregate
(sum(n_24h), sum(sum_24h), count(*)) rather than count(*) alone:
under a bare count Catalyst prunes the window columns and both plans
degenerate to the event<->probe join, timing nothing.  The final
global orderBy is eliminated under the aggregate in BOTH plans —
identical in both, so its absence sharpens the comparison of the
parts that differ.  Interleaved A/B pairs, min-of-N, same-session
(cache cleared between runs) — the BASELINE.md noise protocol.

    python tools/e16_fused_probe.py [--factor 100] [--pairs 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from aind_smartspim_data_transformation_spark.plans import events  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)
from tools.overflow_sweep import build_scale_dir  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument(
        "--base", default=os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--skew", choices=["zipf"], default=None)
    args = ap.parse_args()

    spark = build_local_session(
        app_name="e16-fused-probe", driver_memory="32g"
    )
    tmp = tempfile.mkdtemp(prefix="e16_fused_")
    build_scale_dir(spark, args.base, tmp, args.factor, skew=args.skew)

    def run(fn) -> float:
        t0 = time.perf_counter()
        row = (
            fn(spark, tmp)
            .agg(
                F.count("*").alias("n"),
                F.sum("n_24h").alias("sn"),
                F.round(F.sum("sum_24h"), 2).alias("ss"),
            )
            .collect()[0]
        )
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        return wall, (row["n"], row["sn"], row["ss"])

    # warm both plan shapes' codegen at sf0.001 first
    for fn in (events.e16_rolling_24h_bucketed, events._e16_fused_two_frame):
        fn(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    unions, fuseds = [], []
    check = None
    for i in range(args.pairs):
        wu, vu = run(events.e16_rolling_24h_bucketed)
        wf, vf = run(events._e16_fused_two_frame)
        assert vu == vf, f"plans disagree: {vu} vs {vf}"
        check = vu
        unions.append(wu)
        fuseds.append(wf)
        print(f"pair {i}: union {wu:.2f}s | fused {wf:.2f}s", flush=True)
    ratio = min(unions) / min(fuseds)
    print(
        f"min-of-{args.pairs}: union {min(unions):.2f}s vs fused "
        f"{min(fuseds):.2f}s ({ratio:.2f}x); aggregate check {check}; "
        f"gate >=1.3x -> {'SWITCH' if ratio >= 1.3 else 'KEEP UNION'}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
