#!/usr/bin/env python
"""r16 probe: does AQE stage-cache reuse already dedupe d07/d14's five
signature subtrees at RUNTIME (the r15 plan dumps are pre-execution
initial plans, where AQE reuse is invisible)?

Prints, per query: Scan-parquet count in the FINAL executed plan,
ReusedExchange / reused-stage markers, and the executed job/stage
counts — the ground truth VERDICT r16 #3 needs before choosing a fix.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_local_session(app_name="r16-d07-reuse-probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    dump = None
    for name in ("d04_simhash", "d07_simhash_hamming_pairs", "d14_hamming_neighbor_topk"):
        df = registry.all_queries()[name](spark, sf_dir)
        sc.setJobDescription(f"probe {name}")
        n = len(df.collect())  # executes df's OWN QueryExecution (count() builds a new one)
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        print(f"== {name}: rows={n}")
        print(f"  final-plan Scan parquet: {final.count('Scan parquet')}")
        print(f"  final-plan ReusedExchange: {final.count('ReusedExchange')}")
        print(f"  final-plan isFinalPlan=true: {plan.count('isFinalPlan=true')}")
        sys.stdout.flush()
        if name == "d07_simhash_hamming_pairs":
            dump = final
    print(dump)


if __name__ == "__main__":
    main()
