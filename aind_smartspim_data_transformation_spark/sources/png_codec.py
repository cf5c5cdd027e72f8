"""Pure-python PNG codec for grayscale microscopy slices.

The reference reads 16-bit grayscale PNG/TIFF slices through pims/dask
(`/root/reference/src/aind_smartspim_data_transformation/io/readers.py:112-184`);
this container has no pillow/imagecodecs, so the decode UDF is backed by
this minimal codec built on ``zlib`` + ``numpy`` only (PNG is a public
spec: RFC 2083).  Supports what the imaging plane needs:

- decode: 8/16-bit grayscale (colortype 0), filters 0-4, no interlace;
- encode: 8/16-bit grayscale, filter 0 scanlines;
- header probe: width/height/bitdepth without decompressing (the
  reference's shape-sniff operator, SURVEY.md §2.1 S4).

16-bit samples are big-endian per the PNG spec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png_gray(arr: np.ndarray, compress_level: int = 1) -> bytes:
    """Encode a 2-D uint8/uint16 array as a grayscale PNG (filter 0)."""
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {arr.shape}")
    if arr.dtype == np.uint8:
        bitdepth, payload = 8, arr
    elif arr.dtype == np.uint16:
        bitdepth, payload = 16, arr.astype(">u2")
    else:
        raise ValueError(f"unsupported dtype {arr.dtype} (uint8/uint16 only)")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, 0, 0, 0, 0)
    raw = payload.tobytes()
    stride = w * (bitdepth // 8)
    # filter byte 0 prepended to every scanline
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filtered = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), lines], axis=1
    ).tobytes()
    idat = zlib.compress(filtered, compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def probe_png_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, bitdepth) from the IHDR without decompressing."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG file")
    w, h, bitdepth, colortype = struct.unpack(">IIBB", data[16:26])
    if colortype != 0:
        raise ValueError(f"only grayscale (colortype 0) supported, got {colortype}")
    return w, h, bitdepth


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray(data: bytes) -> np.ndarray:
    """Decode a grayscale PNG into a 2-D uint8/uint16 array."""
    w, h, bitdepth = probe_png_header(data)
    bpp = bitdepth // 8
    stride = w * bpp
    # gather IDAT payloads
    idat = bytearray()
    off = 8
    while off < len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        tag = data[off + 4 : off + 8]
        if tag == b"IDAT":
            idat += data[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    cur = rows[:, 1:].astype(np.int16)  # room for mod-256 arithmetic
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = cur[y].astype(np.int64)
        ft = ftypes[y]
        if ft == 0:
            rec = line
        elif ft == 2:  # up
            rec = (line + prev) & 0xFF
        elif ft == 1:  # sub
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ft == 3:  # average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) & 0xFF
        elif ft == 4:  # paeth
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
        prev = rec
    if bitdepth == 16:
        return out.reshape(h, w, 2).view(np.dtype(">u2")).reshape(h, w).astype(np.uint16)
    return out.reshape(h, w)
