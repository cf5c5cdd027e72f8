#!/usr/bin/env python
"""r16: d07 at 100x zipf through count() — the bench's timed action.

The overflow sweep evaluates through the noop sink, which computes
EVERY row of the final orderBy(doc1, doc2): for d07 that is a range
shuffle of the full quadratic pair listing (~billions of rows at 100x
zipf), which fills local shuffle disk — the exact regime the r13
standing waiver covers (SCALE.md 6l: the listing IS the contract; the
bounded twin d14 sweeps clean).  Under count() — how the bench times
d07 — EliminateSorts prunes the global sort and the figure measures
the join engine.  This probe shows the r16 plan (single shared sig
scan) executes to completion at 100x zipf under that action.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)
from tools.overflow_sweep import build_scale_dir  # noqa: E402


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = build_local_session(app_name="r16-d07-zipf-count", driver_memory="32g")
    tmp = tempfile.mkdtemp(prefix="d07_zipf_")
    print(f"# building {factor}x zipf dir at {tmp}")
    build_scale_dir(spark, "/root/testdata/sf0.1", tmp, factor, skew="zipf")
    df = registry.all_queries()["d07_simhash_hamming_pairs"](spark, tmp)
    t0 = time.perf_counter()
    n = df.count()
    wall = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(f"d07 @ {factor}x zipf: count()={n} in {wall:.1f}s")
    print(f"# note: count() builds its own QueryExecution; plan checks "
          f"for the collect-path plan live in tools/r16_d07_reuse_probe.py")


if __name__ == "__main__":
    main()
