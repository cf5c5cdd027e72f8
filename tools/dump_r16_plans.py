#!/usr/bin/env python
"""Dump plans for the r16 optimization round.

    python tools/dump_r16_plans.py <tag> <names...>

Writes plans/r16/<name>_<tag>.txt containing BOTH the pre-execution
`.explain("formatted")` AND the final executed adaptive plan after a
collect() — the r16 evidence (AQE stage-cache reuse, MapInPandas
nodes) is only visible in the latter; the r15 dumps were initial
plans only, which is why they showed "5 FileScans, zero
ReusedExchange" for d07 when the runtime truth was 2/3.

The registry is imported from PYTHONPATH/cwd, so the interleave
pattern (run this file with cwd at an old worktree) produces `before`
dumps from old code.  sf_dir defaults to sf0.1 — override with SF_DIR.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, os.getcwd())

REPO = Path(__file__).resolve().parent.parent

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = build_local_session(app_name=f"plans-r16-{tag}")
    queries = registry.all_queries()
    for name in names:
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        df.collect()
        executed = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        (out_dir / f"{name}_{tag}.txt").write_text(
            buf.getvalue()
            + "\n\n== FINAL EXECUTED PLAN (post-collect, AQE) ==\n"
            + executed
        )
        print(f"wrote plans/r16/{name}_{tag}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
