#!/usr/bin/env python
"""Driver-style STRICT verify: Spark queries vs DuckDB oracles.

Unlike tests/oracle.py (rounds floats to 6dp), this compares values
EXACTLY the way the driver's hash does — any last-ulp float divergence
between Spark (JVM) and DuckDB (libm) fails here.  Run it at BOTH
sf0.01 and sf0.1 before committing a new query (boundary hits are
data-dependent; see memory note on round-half-even collisions).

Usage:
    python tools/strict_verify.py [query ...]            # sf0.01
    SF_DIR=/root/testdata/sf0.1 python tools/strict_verify.py [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)
from aind_smartspim_data_transformation_spark.tables import TABLE_NAMES  # noqa: E402


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)  # EXACT — no rounding
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


# Oracle result types whose arrow/pandas materialization diverges from
# the plain-Python `fetchall()` path this script compares through.
# DuckDB widens integer sum() to HUGEINT (int128) — arrow has no int128,
# so the driver's hash pipeline sees a different representation (e.g.
# decimal128/float64) than BIGINT even when every value fits int64.
# The r5 driver's ONLY two red rows (x07, d12) were exactly this:
# strict_verify said OK while the driver hash said FAIL.  Rejecting
# these types here makes "ALL STRICT-OK" imply a green driver hash.
_HASH_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def unsafe_oracle_types(con, sql):
    """Return [(col, type), ...] for driver-hash-unsafe result columns."""
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(u in str(t).upper() for u in _HASH_UNSAFE_TYPES)
    ]


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    names = sys.argv[1:] or sorted(oracles)
    # Same heap as bench.py: the default 1g JVM survives sf0.01 but can
    # OOM mid-sweep at sf0.1 (an executor death then cascades FAILED
    # into every later query — if dozens fail from some point onward,
    # check for java.lang.OutOfMemoryError before debugging queries).
    spark = build_local_session(app_name="strict-verify", driver_memory="32g")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (rows-only, no oracle)")
            continue
        try:
            # Cache hygiene at the harness level (not in the plans —
            # the returned plans keep their InMemoryRelations).
            spark.catalog.clearCache()
            df = queries[name](spark, sf_dir)
            s_cols, s_rows = df.columns, [tuple(r) for r in df.collect()]
            bad_types = unsafe_oracle_types(con, oracles[name])
            if bad_types:
                failed.append(name)
                print(f"{name}: FAIL driver-hash-unsafe oracle types {bad_types}")
                continue
            cur = con.execute(oracles[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
            sc, s_canon = _canon(s_cols, s_rows)
            oc, o_canon = _canon(o_cols, o_rows)
            if len(s_rows) != len(o_rows):
                failed.append(name)
                print(f"{name}: FAIL rows {len(s_rows)} != {len(o_rows)}")
            elif sc != oc:
                failed.append(name)
                print(f"{name}: FAIL cols {sc} != {oc}")
            elif s_canon != o_canon:
                bad = [
                    (a, b) for a, b in zip(s_canon, o_canon) if a != b
                ]
                failed.append(name)
                print(f"{name}: FAIL {len(bad)} rows; first {bad[0]}")
            else:
                print(f"{name}: OK ({len(s_rows)} rows)")
        except Exception as exc:  # keep sweeping; report at end
            failed.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    print(f"\n{'FAILED: ' + ' '.join(failed) if failed else 'ALL STRICT-OK'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
