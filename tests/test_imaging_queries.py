"""Imaging-semantics queries vs the DuckDB oracle, and cross-check of
the relational windowed mean against the numpy kernel."""

from __future__ import annotations

import numpy as np
import pytest

from aind_smartspim_data_transformation_spark.imaging.pyramid import windowed_mean
from aind_smartspim_data_transformation_spark.plans import imaging_queries as iq
from tests.oracle import compare


@pytest.mark.parametrize("name", sorted(iq.QUERIES))
def test_imaging_queries_vs_oracle(spark, sf_dir, name):
    compare(iq.QUERIES[name](spark, sf_dir), iq.ORACLE[name], sf_dir, name)


def test_grid_query_matches_numpy_kernel(spark, sf_dir):
    """The relational expression and the mapInPandas kernel agree."""
    n = iq.GRID
    z, y, x = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    vol = ((z * 131 + y * 17 + x * 7) % 4096).astype(np.uint16)
    expect = windowed_mean(vol, (2, 2, 2))
    rows = iq.i01_windowed_mean_grid(spark, sf_dir).collect()
    got = np.zeros_like(expect)
    for r in rows:
        got[r["zz"], r["yy"], r["xx"]] = r["mean_v"]
    assert np.array_equal(got, expect)
