#!/usr/bin/env python
"""Side-by-side measurement of n06's two tier constructions at ~sf1.

VERDICT r6 ask #7: evidence that the scale-path tiering is acceptable
for curriculum use at a larger corpus.  Round 7 made the scale path
EXACT (operators/scale_utils.distributed_ntile — range buckets +
per-bucket windows + tile arithmetic, row-identical to ntile by
construction), so the probe verifies exactness AND measures wall-clock:

- synthesize a ~sf1 documents corpus (10x sf0.1, text re-synthesized
  per row so TTR ties stay realistic);
- run n06's aggregate through BOTH forms: the single-reducer global
  ntile window (the r6 plan) and distributed_ntile (the r7 plan);
- assert per-tier outputs IDENTICAL (boundary delta = 0 by
  construction) and print both wall-clocks.

Writes its findings to stdout; SCALE.md records the measured numbers.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

from aind_smartspim_data_transformation_spark.operators.scale_utils import (  # noqa: E402
    distributed_ntile,
)
from aind_smartspim_data_transformation_spark.session import (  # noqa: E402
    build_local_session,
)


def main() -> None:
    spark = build_local_session(app_name="ntile-probe", driver_memory="32g")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    # ~sf1: 10 copies, doc_id re-keyed, words shuffled per copy by a
    # deterministic per-copy rotation so TTR values (and their ties)
    # keep the corpus's real distribution
    big = (
        docs.crossJoin(spark.range(10).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            "n_chars",
            "text",
        )
    )
    scored = big.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).alias("tok"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000"
            " div size(split(text, ' '))"
        ).alias("ttr_milli"),
    ).persist()
    n = scored.count()
    print(f"corpus rows: {n}")

    def tiers_of(tiered):
        return (
            tiered.groupBy("tier")
            .agg(
                F.count("*").alias("n_docs"),
                F.min("ttr_milli").alias("ttr_lo"),
                F.max("ttr_milli").alias("ttr_hi"),
                F.sum("tok").alias("total_tokens"),
            )
            .orderBy("tier")
            .collect()
        )

    t0 = time.perf_counter()
    global_rows = tiers_of(
        scored.select(
            "tok",
            "ttr_milli",
            F.ntile(10)
            .over(W.orderBy("ttr_milli", "doc_id"))
            .alias("tier"),
        )
    )
    t_global = time.perf_counter() - t0

    t0 = time.perf_counter()
    dist_rows = tiers_of(
        distributed_ntile(
            scored, "ttr_milli", 10, tie_cols=("doc_id",), out_col="tier"
        )
    )
    t_dist = time.perf_counter() - t0

    same = [tuple(r) for r in global_rows] == [tuple(r) for r in dist_rows]
    print(f"tier tables identical: {same}")
    for g, d in zip(global_rows, dist_rows):
        print(
            f"tier {g['tier']:2d}: n={g['n_docs']:7d} "
            f"ttr=[{g['ttr_lo']},{g['ttr_hi']}] "
            f"delta_n={d['n_docs'] - g['n_docs']} "
            f"delta_lo={d['ttr_lo'] - g['ttr_lo']} "
            f"delta_hi={d['ttr_hi'] - g['ttr_hi']}"
        )
    print(
        f"wall: global-window ntile {t_global:.2f}s, "
        f"distributed_ntile {t_dist:.2f}s"
    )
    if not same:
        sys.exit(1)


if __name__ == "__main__":
    main()
