"""Z-order layout: Morton key correctness and real file-skipping stats."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aind_smartspim_data_transformation_spark.operators.layout import (
    morton_key,
    zorder_layout,
)
from aind_smartspim_data_transformation_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _py_morton(x: int, y: int) -> int:
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_bitwise_definition(spark):
    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(pts, "x int, y int").withColumn(
        "z", morton_key(F.col("x"), F.col("y"))
    )
    for x, y, z in df.collect():
        assert z == _py_morton(x, y), (x, y)


def _per_file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    ds = pq.ParquetDataset(path)
    out = []
    for frag in ds.fragments:
        md = frag.metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out


def _mean_range_fraction(path: str, col: str, domain: int) -> float:
    ranges = _per_file_ranges(path, col)
    assert ranges and all(r[0] is not None for r in ranges)
    return sum(hi - lo for lo, hi in ranges) / (len(ranges) * domain)


@pytest.mark.parametrize("num_files", [16])
def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path, num_files):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_suppkey")
    domain_part = li.agg(F.max("l_partkey")).collect()[0][0]
    domain_supp = li.agg(F.max("l_suppkey")).collect()[0][0]

    zpath = str(tmp_path / "zorder")
    zorder_layout(li, "l_partkey", "l_suppkey", num_files).write.parquet(zpath)

    spath = str(tmp_path / "single")
    li.repartitionByRange(num_files, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(spath)

    # Z-order: BOTH dimensions land in narrow per-file ranges.
    z_part = _mean_range_fraction(zpath, "l_partkey", domain_part)
    z_supp = _mean_range_fraction(zpath, "l_suppkey", domain_supp)
    assert z_part < 0.6, z_part
    assert z_supp < 0.6, z_supp

    # Single-column sort: perfect on the sort column, useless on the
    # other — the contrast z-order exists to fix.
    s_part = _mean_range_fraction(spath, "l_partkey", domain_part)
    s_supp = _mean_range_fraction(spath, "l_suppkey", domain_supp)
    assert s_part < 0.2, s_part
    assert s_supp > 0.9, s_supp

    # Layout must not change the data.
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0


def test_morton_key_is_injective_on_random_points(spark):
    """The interleave must be a bijection on 16-bit pairs — any
    collision corrupts range-partition locality silently."""
    import random

    rnd = random.Random(11)
    pts = list({(rnd.randrange(65536), rnd.randrange(65536)) for _ in range(500)})
    df = spark.createDataFrame(pts, "x int, y int").select(
        morton_key(F.col("x"), F.col("y")).alias("z")
    )
    keys = [r["z"] for r in df.collect()]
    assert len(set(keys)) == len(pts)
