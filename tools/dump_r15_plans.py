#!/usr/bin/env python
"""Dump `.explain("formatted")` for the r15 optimization round.

    python tools/dump_r15_plans.py before q01_pricing_summary d03_... ,
    python tools/dump_r15_plans.py after  <names...>

Writes plans/r15/<name>_<tag>.txt.  sf_dir defaults to sf0.1 (the
bench SF) — override with SF_DIR.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = build_local_session(app_name=f"plans-r15-{tag}")
    queries = registry.all_queries()
    for name in names:
        spark.catalog.clearCache()
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote plans/r15/{name}_{tag}.txt")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
