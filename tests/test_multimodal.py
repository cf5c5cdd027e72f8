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


def test_decode_real_png_and_tiff():
    """PNG and baseline TIFF decode for REAL via the repo's pure-numpy
    codecs — the stub boundary is only formats with no codec here."""
    import numpy as np

    from aind_smartspim_data_transformation_spark.sources.png_codec import (
        encode_png_gray,
    )
    from aind_smartspim_data_transformation_spark.sources.tiff_codec import (
        encode_tiff_gray,
    )

    src = np.arange(48, dtype=np.uint16).reshape(6, 8) * 1000
    assert np.array_equal(mm.decode_image_pixels(encode_png_gray(src)), src)
    assert np.array_equal(mm.decode_image_pixels(encode_tiff_gray(src)), src)


def test_decode_unknown_format_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image_pixels(b"\xff\xd8\xff\xe0JFIFxxxx")  # JPEG magic


def test_real_png_through_feature_resize_frame_pipelines(spark):
    """The full multimodal pipeline (features → resize → frame-sample)
    over REAL PNG payloads, verified against numpy on the driver."""
    import hashlib

    import numpy as np

    from aind_smartspim_data_transformation_spark.sources.png_codec import (
        encode_png_gray,
    )

    rng = np.random.default_rng(5)
    imgs = {
        i: rng.integers(0, 65535, size=(16, 12)).astype(np.uint16)
        for i in range(4)
    }
    df = spark.createDataFrame(
        [(i, bytearray(encode_png_gray(a))) for i, a in imgs.items()],
        "doc_id long, image binary",
    )
    feats = {r["doc_id"]: r for r in mm.extract_image_features(df).collect()}
    for i, a in imgs.items():
        assert (feats[i]["width"], feats[i]["height"]) == (12, 16)
        assert feats[i]["mean_milli"] == int(a.sum()) * 1000 // a.size

    res = {r["doc_id"]: r for r in mm.resize_images(df, 6, 4).collect()}
    for i, a in imgs.items():
        ys = [y * 16 // 4 for y in range(4)]
        xs = [x * 12 // 6 for x in range(6)]
        assert bytes(res[i]["resized"]) == np.ascontiguousarray(a[np.ix_(ys, xs)]).tobytes()

    frames = {r["doc_id"]: r for r in mm.sample_frames(df, 2).collect()}
    for i, a in imgs.items():
        assert frames[i]["n_sampled"] == 8
        assert frames[i]["sampled_digest"] == hashlib.sha256(
            np.ascontiguousarray(a[::2]).tobytes()
        ).hexdigest()


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


def test_tiff_byte_orders_decode_identically():
    """An MM (big-endian) TIFF and its II twin must yield the SAME
    native-order pixel buffer through the multimodal decode — digests
    downstream cannot depend on the container's byte order."""
    import struct

    import numpy as np

    from aind_smartspim_data_transformation_spark.sources.tiff_codec import (
        encode_tiff_gray,
    )

    src = np.arange(12, dtype=np.uint16).reshape(3, 4) * 999
    # hand-built MM twin (the encoder writes II only)
    payload = src.astype(">u2").tobytes()
    entries = [
        (256, 4, 1, 4), (257, 4, 1, 3), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 3),
        (279, 4, 1, len(payload)),
    ]
    mm_bytes = bytearray(b"MM" + struct.pack(">HI", 42, 8 + len(payload)))
    mm_bytes += payload + struct.pack(">H", len(entries))
    for tag, typ, count, value in entries:
        if typ == 3:
            mm_bytes += struct.pack(">HHIHH", tag, typ, count, value, 0)
        else:
            mm_bytes += struct.pack(">HHII", tag, typ, count, value)
    mm_bytes += struct.pack(">I", 0)

    for blob in (encode_tiff_gray(src), bytes(mm_bytes)):
        arr = mm.decode_image_pixels(blob)
        assert arr.dtype.byteorder in ("=", "<", "|")
        assert np.array_equal(arr, src)
        _w, _h, buf = mm.decode_image_bytes(blob)
        assert buf == src.astype("<u2").tobytes()
