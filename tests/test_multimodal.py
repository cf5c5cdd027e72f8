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
    assert 0 <= r0["mean_milli"] <= 255_000


def test_m03_resize_golden(spark, sf_dir):
    """Nearest-neighbor resize to a fixed 8×4 grid; digest deterministic."""
    rows = mm.m03_image_resize(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all((r["width"], r["height"]) == (mm.RESIZE_W, mm.RESIZE_H) for r in rows)
    # deterministic: recompute doc 0's resize in plain python
    r0 = next(r for r in rows if r["doc_id"] == 0)
    import hashlib

    doc0_text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id = 0")
        .collect()[0]["text"]
    )
    img = mm.make_fake_image(b"", 1, 1)  # just to access format constants
    w, h = 4, 2  # doc_id 0 → width 4, height 2 (same formula as the table)
    payload = doc0_text.ljust(w * h, "x")[: w * h].encode("ISO-8859-1")
    expect = bytes(
        payload[(y * h // mm.RESIZE_H) * w + (x * w // mm.RESIZE_W)]
        for y in range(mm.RESIZE_H)
        for x in range(mm.RESIZE_W)
    )
    assert r0["resized_digest"] == hashlib.sha256(expect).hexdigest()


def test_m04_frame_sample_counts(spark, sf_dir):
    rows = mm.m04_frame_sample(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r["n_sampled"] == len(range(0, r["n_frames"], mm.FRAME_STRIDE))
