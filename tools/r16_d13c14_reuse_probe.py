#!/usr/bin/env python
"""r16 probe (VERDICT r15 ask #5): what does the REQUIRE_REUSED_EXCHANGE
pin actually match at runtime for d13/c14, and does the d03 pair
pipeline execute once?

Reports, per query: Scan-parquet count per table in the FINAL executed
plan, ReusedExchange lines (with what they reuse), job count for the
whole build+collect, and whether the d03 machinery appears in the
final plan at all (it should NOT — connected_components_star
checkpoints it during build, so the collected plan starts from a
LogicalRDD).
"""

from __future__ import annotations

import os
import re
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
    spark = build_local_session(app_name="r16-d13c14-probe", driver_memory="32g")
    sc = spark.sparkContext
    for name in ("d13_keep_best_quality", "c14_curation_pipeline"):
        jobs0 = len(sc.statusTracker().getJobIdsForGroup() or [])
        df = registry.all_queries()[name](spark, sf_dir)
        n = len(df.collect())
        jobs1 = len(sc.statusTracker().getJobIdsForGroup() or [])
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        scans = re.findall(r"FileScan parquet \[([^\]]*)\].*?file:[^ ,\]]*/(\w+)\.parquet", final)
        print(f"== {name}: rows={n} jobs={jobs1 - jobs0}")
        from collections import Counter

        print("  scans:", Counter(t for _, t in scans))
        print(f"  ReusedExchange: {final.count('ReusedExchange')}")
        for line in final.splitlines():
            if "ReusedExchange" in line:
                print("   ", line.strip()[:160])
        print(f"  LogicalRDD/Scan ExistingRDD: {final.count('Scan ExistingRDD')}")
        print(f"  Generate(explode) nodes: {final.count('Generate')}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
