#!/usr/bin/env python
"""Registry-wide integer-envelope sweep at a ≥50k-row scale-up.

VERDICT r7 ask #2: n18's int64 overflow was found by inspection; this
makes the hunt systematic.  The ppm/milli integer-arithmetic family
(n02, n03, n10, n11, t09, s06, …) all multiply by 10⁶-scale literals —
each either has a safe envelope at a 10× scale-up of the LLM-pipeline
tables or fails loudly here under Spark's ANSI mode.

What it does:

- builds a synthetic scale dir: every TPC-H-ish table symlinked from
  the base SF (default sf0.1) and documents / events / embeddings
  replicated ``--factor`` times (default 10× → 50k docs / 1M events /
  20k vectors) with re-keyed ids (doc_id·f+rep etc. — uniqueness
  preserved; text/vec payloads repeat, which is exactly the heavy-tie
  regime integer rank/ppm arithmetic must survive);
- executes EVERY registered query against that dir (collect, bounded
  by the queries' own aggregate-first shapes) and classifies failures:
  ``OVERFLOW`` (ANSI arithmetic overflow / out-of-range cast) vs other
  errors;
- prints one line per query and a final verdict; exit 1 on any
  OVERFLOW or ERROR.

Results are recorded in SCALE.md §6h.  Run:

    python tools/overflow_sweep.py [--factor 10] [query ...]
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

from aind_smartspim_data_transformation_spark import registry  # noqa: E402
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)
from aind_smartspim_data_transformation_spark.tables import TABLE_NAMES  # noqa: E402

_SCALED = ("documents", "events", "embeddings")

_OVERFLOW_MARKERS = (
    "ARITHMETIC_OVERFLOW",
    "CAST_OVERFLOW",
    "NUMERIC_VALUE_OUT_OF_RANGE",
    "overflow",
    "Out of Range",
)


def build_scale_dir(spark, base_sf: str, out_dir: str, factor: int) -> None:
    """Symlink the star schema; replicate the LLM-pipeline tables.

    The replicated tables are written REPARTITIONED (32 files): the
    broadcast crossJoin otherwise runs as ONE task and writes ONE
    parquet file, and every downstream explode-heavy scan+partial-agg
    in the sweep then executes single-task (50 MB of text is one
    maxPartitionBytes split) — the whole sweep serializes.  Real
    100 TB layouts are many-file; the sweep's should be too."""
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLE_NAMES:
        if t in _SCALED:
            continue
        dst = Path(out_dir) / f"{t}.parquet"
        if not dst.exists():
            dst.symlink_to(f"{base_sf}/{t}.parquet")

    rep = spark.range(factor).withColumnRenamed("id", "rep")

    docs = spark.read.parquet(f"{base_sf}/documents.parquet")
    docs.crossJoin(rep).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    ev = spark.read.parquet(f"{base_sf}/events.parquet")
    # event_id re-keyed for uniqueness; ts jittered by the replica index
    # (seconds) so exact-duplicate timestamps don't collapse DISTINCT
    # shapes below the scale this sweep is meant to stress.
    ev.crossJoin(rep).select(
        (F.col("event_id") * factor + F.col("rep")).alias("event_id"),
        F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, rep)").alias("ts"),
        (F.col("user_id") * factor + F.col("rep")).alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    emb = spark.read.parquet(f"{base_sf}/embeddings.parquet")
    emb.crossJoin(rep).select(
        (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
        "embedding",
        "label",
    ).repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default=os.environ.get("SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--skip",
        action="append",
        default=[],
        metavar="NAME=REASON",
        help="waive a query from the sweep; a written reason is "
        "REQUIRED and echoed into the log so the waiver is always "
        "in-band (SCALE.md quotes it verbatim)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    skips: dict[str, str] = {}
    for s in args.skip:
        if "=" not in s:
            ap.error(f"--skip needs NAME=REASON, got {s!r}")
        k, _, reason = s.partition("=")
        skips[k] = reason

    spark = build_local_session(app_name="overflow-sweep", driver_memory="32g")
    queries = registry.all_queries()
    unknown = set(skips) - set(queries)
    if unknown:
        ap.error(f"--skip names not in registry: {sorted(unknown)}")
    names = args.names or list(queries)
    for k, reason in skips.items():
        if k in names:
            names.remove(k)
            print(f"{k}: WAIVED — {reason}")

    tmp = tempfile.mkdtemp(prefix="overflow_sweep_")
    print(f"# scale dir {tmp}: {args.base} with {_SCALED} x{args.factor}")
    build_scale_dir(spark, args.base, tmp, args.factor)

    overflowed, errored = [], []
    for name in names:
        # Cache hygiene lives HERE, not in the plans: queries persist
        # inputs their returned plan still references, so releasing
        # between queries keeps a long sweep bounded without breaking
        # plan shapes (r8 n05/n15 regression).
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            # Evaluate through the noop sink, not collect(): every
            # output expression is computed on the executors (the
            # overflow check this sweep exists for) but nothing is
            # serialized to the driver — a duplicate-heavy 10× corpus
            # makes pair-listing queries (d07) return tens of millions
            # of rows, which is a result-SIZE harness limit, not an
            # engine envelope.  Row count rides an Observation on the
            # same single execution.
            from pyspark.sql import Observation

            obs = Observation()
            df = queries[name](spark, tmp).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            df.write.mode("overwrite").format("noop").save()
            n = obs.get["n"]
            print(f"{name}: OK rows={n} ({time.perf_counter() - t0:.1f}s)")
        except Exception as exc:  # keep sweeping; classify
            msg = f"{type(exc).__name__}: {exc}"
            if any(m.lower() in msg.lower() for m in _OVERFLOW_MARKERS):
                overflowed.append(name)
                print(f"{name}: OVERFLOW {msg.splitlines()[0][:200]}")
            else:
                errored.append(name)
                print(f"{name}: ERROR {msg.splitlines()[0][:200]}")
    print(
        f"\n{len(names)} swept; "
        + (
            f"OVERFLOW: {' '.join(overflowed)}; ERROR: {' '.join(errored)}"
            if (overflowed or errored)
            else "ALL CLEAN"
        )
    )
    return 1 if (overflowed or errored) else 0


if __name__ == "__main__":
    raise SystemExit(main())
