#!/usr/bin/env python
"""Time named registry queries in ONE JVM and print a JSON line.

Usage:
    SF_DIR=/root/testdata/sf0.1 REPS=4 python tools/r16_time_queries.py q1 q2 ...

Methodology matches bench.py: per-query warm-up at sf0.001 (codegen
compile), then REPS timed collect()s at SF_DIR with clearCache between
runs; reports min-of-N per query plus all runs.  Import path is taken
from cwd/PYTHONPATH so an interleave driver can run this same file
against two checked-out trees.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))
    names = sys.argv[1:]
    spark = build_local_session(app_name="r16-time-queries", driver_memory="32g")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    queries = registry.all_queries()
    for name in names:
        try:
            queries[name](spark, "/root/testdata/sf0.001").collect()
        except Exception as exc:
            print(f"# warm-up {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()
    # mirror bench.py's _COUNT_ONLY: d07 materializes ~2M rows at
    # sf0.1 — count() times the join engine, collect() times pickling
    count_only = {"d07_simhash_hamming_pairs"}
    out = {}
    for name in names:
        runs = []
        for _ in range(reps):
            # build INSIDE the timed region, like bench.py: driver-side
            # work in the query builder (pivot collects, plan analysis)
            # is part of what optimizations target
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.count() if name in count_only else df.collect()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        out[name] = {"min": min(runs), "runs": runs}
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
