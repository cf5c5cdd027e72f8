#!/usr/bin/env python
"""r15 probe: time the vector-arithmetic-bound queries (d05, n07, s01,
s04, s09) end-to-end in one session.  Imports the package from
PYTHONPATH (NOT a hard-coded repo path) so tools/abab.py can run the
same file against two trees.

    SF_DIR=/root/testdata/sf0.1 python tools/r15_pairloop_probe.py
"""

from __future__ import annotations

import os
import time

from aind_smartspim_data_transformation_spark import registry
from aind_smartspim_data_transformation_spark.session import build_local_session


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    names = os.environ.get(
        "PROBE_QUERIES", "d05_dedup_embedding_cosine,n07_semantic_dedup,s01_cosine_topk,s04_similarity_join,s09_kmeans_train"
    ).split(",")
    spark = build_local_session(app_name="r15-pairloop-probe", driver_memory="16g")
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    queries = registry.all_queries()
    # warm-up pass at sf0.001 compiles each plan shape once
    for n in names:
        queries[n](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    total = 0.0
    for n in names:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"probe:{n}")
            rows = len(queries[n](spark, sf_dir).collect())
            dt = time.perf_counter() - t0
            best = min(best, dt)
            spark.catalog.clearCache()
        print(f"{n}: best {best:.3f}s ({rows} rows)", flush=True)
        total += best
    print(f"TOTAL best-sum: {total:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
