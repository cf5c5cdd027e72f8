"""Late-registered (plans/extras.py) queries vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.plans import extras
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(extras.QUERIES))
def test_extras_vs_oracle(spark, sf_dir, name):
    df = extras.QUERIES[name](spark, sf_dir)
    compare(df, extras.ORACLE[name], sf_dir, name)


def test_hll_registers_merge_by_max(spark):
    """The HLL mergeability claim, directly: registers built from two
    disjoint halves of the corpus, merged by per-bucket max, must equal
    the whole-corpus registers (the property shard-parallel and
    streaming HLL rely on)."""
    from pyspark.sql import functions as F

    from aind_smartspim_data_transformation_spark.operators.dedup import (
        _shingle_rows_raw,
    )
    from aind_smartspim_data_transformation_spark.operators.sketch import HLL_M

    sf = "/root/testdata/sf0.001"
    sh = _shingle_rows_raw(spark, sf).select(F.col("sh").alias("token"), "doc_id")

    def regs(df):
        h = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
        hashed = df.select(
            (h % HLL_M).alias("bucket"),
            F.expr(
                f"CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)"
                f" div {HLL_M}"
            ).alias("v"),
        )
        out = (
            hashed.withColumn(
                "rho",
                F.when(F.col("v") == 0, F.lit(25)).otherwise(
                    F.lit(25) - F.length(F.bin("v"))
                ),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("r"))
        )
        return {r["bucket"]: r["r"] for r in out.collect()}

    whole = regs(sh)
    a = regs(sh.filter("doc_id % 2 = 0"))
    b = regs(sh.filter("doc_id % 2 = 1"))
    merged: dict = {}
    for part in (a, b):
        for k, v in part.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
