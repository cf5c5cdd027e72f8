"""Multimodal binary-column plumbing: codec stub, mapInPandas pipeline."""

from __future__ import annotations

import pytest

from aind_smartspim_data_transformation_spark.operators import multimodal as mm
from tests.oracle import compare


def test_fake_codec_roundtrip():
    img = mm.make_fake_image(b"abc", 8, 4)
    w, h, payload = mm.decode_image_bytes(img)
    assert (w, h) == (8, 4)
    assert len(payload) == 32


def test_decode_real_format_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image_bytes(b"\x89PNG\r\n\x1a\nxxxx")


def test_m01_vs_oracle(spark, sf_dir):
    compare(mm.m01_binary_stats(spark, sf_dir), mm.ORACLE["m01_binary_stats"], sf_dir, "m01")


def test_m02_pipeline_schema_and_values(spark, sf_dir):
    rows = mm.m02_image_features(spark, sf_dir).collect()
    assert len(rows) > 0
    r0 = rows[0]  # doc_id 0 → width 4, height 2
    assert (r0["width"], r0["height"]) == (4, 2)
    assert r0["n_bytes"] == 16 + r0["width"] * r0["height"]
    assert 0 <= r0["mean_intensity"] <= 255
