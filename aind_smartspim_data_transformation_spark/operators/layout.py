"""Z-order (Morton) data layout for multi-dimensional data skipping.

At 100 TB, the cheapest query is the one that never reads the data:
parquet row-group/file min-max statistics let Spark skip files whose
[min, max] range excludes the predicate.  Sorting by ONE column gives
perfect skipping on that column and none on any other; interleaving
the bits of two columns (the Morton / Z-order curve) gives good
skipping on BOTH — the standard layout trick for multi-dimensional
scan-heavy tables (Delta/Iceberg `ZORDER BY`, here first-principles).

The bit-spread uses the classic magic-number sequence (public-domain
"Interleave bits by Binary Magic Numbers", Stanford bit-twiddling
hacks) — four mask-and-shift rounds per dimension, pure integer
column expressions that stay inside whole-stage codegen in Spark and
vectorize in DuckDB, so the oracle replays the key exactly.

`zorder_layout` is the write-side helper: range-partition by the
Morton key (contiguous key ranges per output file → tight per-file
min-max on both dimensions), sort within partitions, ready for
`.write.parquet`.  `x03_zorder_cells` is the registered QA query: the
key's coarse cells must tile BOTH dimensions into narrow ranges —
count + per-dimension extents per cell, oracle-checked.

No counterpart in the reference repo ([driver-ext]: at-scale layout
machinery).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aind_smartspim_data_transformation_spark.tables import load_table

# (shift, mask) rounds spreading a 16-bit value so its bits occupy the
# even positions of a 32-bit lane.
_SPREAD = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread_bits(col: Column) -> Column:
    x = col.bitwiseAND(F.lit(0xFFFF)).cast("long")
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(x: Column, y: Column) -> Column:
    """32-bit Morton code interleaving the low 16 bits of x and y."""
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def _duck_spread(expr: str) -> str:
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def duck_morton(x: str, y: str) -> str:
    """DuckDB SQL twin of :func:`morton_key` (same rounds, same masks)."""
    return f"({_duck_spread(x)} | ({_duck_spread(y)} << 1))"


def zorder_layout(df: DataFrame, x: str, y: str, num_files: int) -> DataFrame:
    """Cluster ``df`` on the (x, y) Morton curve for write-out.

    Both dimensions are min-max scaled to the full 16-bit lane before
    interleaving: with asymmetric domains (say 2^24 part keys vs 2^10
    supplier keys) a raw interleave parks ALL of the narrow column's
    entropy in the key's low bits, so coarse curve ranges — which is
    what a file is — never constrain it.  Scaling costs one extra tiny
    job (a 1-row global min/max, broadcast back), the standard price of
    a layout pass.

    Range partitioning then assigns each output file a contiguous
    Morton range; the curve is locality-preserving, so every file
    covers a narrow rectangle in (x, y) — parquet footer min-max on
    BOTH raw columns lets the scan skip files for 2-D predicates.  One
    shuffle, sampled range bounds, no driver collect.
    """
    bounds = df.agg(
        F.min(x).alias("_xlo"),
        F.max(x).alias("_xhi"),
        F.min(y).alias("_ylo"),
        F.max(y).alias("_yhi"),
    )

    def scaled(col: str, lo: str, hi: str) -> Column:
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1)).cast("long")
        return (F.col(col).cast("long") - F.col(lo)) * 65535 / span

    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        morton_key(
            scaled(x, "_xlo", "_xhi").cast("long"),
            scaled(y, "_ylo", "_yhi").cast("long"),
        ),
    )
    return (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", "_xlo", "_xhi", "_ylo", "_yhi")
    )


# ---------------------------------------------------------------------------
# X3 — z-order cell audit: Morton-bucket lineitem on (partkey mod 2^16,
# suppkey mod 2^16), take the high bits (key >> 14) of the key as a coarse cell,
# and report per-cell row counts and per-dimension extents.  A correct
# curve gives every populated cell a partkey AND suppkey range that is
# a small fraction of the domain — the property file skipping rides on.
# Pure integer expressions; one shuffle whose key space is bounded by
# the cell granularity (32 − 14 = 18 bits → ≤262,144 cells, with
# map-side partial aggregation regardless of row count).
# ---------------------------------------------------------------------------
def x03_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    key = morton_key(F.col("l_partkey") % 65536, F.col("l_suppkey") % 65536)
    return (
        li.select(
            F.shiftrightunsigned(key, 14).alias("zcell"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("zcell")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy(F.desc("n_rows"), F.asc("zcell"))
        .limit(20)
    )


X03_SQL = f"""
WITH keyed AS (
  SELECT {duck_morton("l_partkey % 65536", "l_suppkey % 65536")} // 16384 AS zcell,
         l_partkey, l_suppkey
  FROM lineitem
)
SELECT zcell, count(*) AS n_rows,
       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
FROM keyed
GROUP BY zcell
ORDER BY n_rows DESC, zcell ASC
LIMIT 20
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "x03_zorder_cells": x03_zorder_cells,
}

ORACLE: dict[str, str] = {
    "x03_zorder_cells": X03_SQL,
}
