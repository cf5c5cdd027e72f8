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
    from aind_smartspim_data_transformation_spark.operators.sketch import (
        hll_registers,
    )
    from tests.conftest import SF_SMOKE

    sh = _shingle_rows_raw(spark, SF_SMOKE).select(
        F.col("sh").alias("token"), "doc_id"
    )

    def regs(df):
        # the PRODUCTION register pipeline — the property test must
        # exercise the real hash/bucket/rho formulas
        return {r["bucket"]: r["r"] for r in hll_registers(df).collect()}

    whole = regs(sh)
    a = regs(sh.filter("doc_id % 2 = 0"))
    b = regs(sh.filter("doc_id % 2 = 1"))
    merged: dict = {}
    for part in (a, b):
        for k, v in part.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == whole
