#!/usr/bin/env python
"""r15 full-registry warm-timing sweep (guide §1: measure first).

Times EVERY registered query at sf0.1 with the bench's methodology
(collect(), clearCache() between runs, per-shape warm-up at sf0.001 so
run 2 measures engine throughput, not first-plan codegen).  Two timed
runs per query; both reported.  Output: tools/r15_registry_sweep.json
{name: {"runs": [r1, r2], "warm": min, "rows": n}} — the ranking that
decides which non-bench queries get optimization attention.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = Path(os.environ.get("SWEEP_OUT", REPO / "tools" / "r15_registry_sweep.json"))
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    spark = build_local_session(app_name="r15-registry-sweep", driver_memory="32g")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    queries = registry.all_queries()
    names = only or sorted(queries)
    results: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        try:
            fn(spark, "/root/testdata/sf0.001").collect()  # plan-shape warm-up
            spark.catalog.clearCache()
            runs = []
            rows = 0
            for _ in range(2):
                spark.sparkContext.setJobDescription(f"sweep:{name}")
                t0 = time.perf_counter()
                rows = len(fn(spark, sf_dir).collect())
                runs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            results[name] = {"runs": runs, "warm": min(runs), "rows": rows}
            print(f"# {name}: {runs} ({rows} rows)", file=sys.stderr, flush=True)
        except Exception as exc:
            results[name] = {"error": str(exc)[:300]}
            print(f"# {name}: ERROR {exc}", file=sys.stderr, flush=True)
        out_path.write_text(json.dumps(results, indent=1, sort_keys=True))
    ranked = sorted(
        ((v.get("warm", 9e9), k) for k, v in results.items()), reverse=True
    )
    for w, k in ranked[:25]:
        print(f"{w:8.3f}  {k}")


if __name__ == "__main__":
    main()
