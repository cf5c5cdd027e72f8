"""Pure-python baseline-TIFF codec for grayscale microscopy slices.

The reference reads PNG *and* TIFF stacks through pims
(`/root/reference/src/aind_smartspim_data_transformation/io/readers.py:112-184`;
`compress/png_to_zarr.py:459-500` builds a lazy per-file TIFF reader).
This container has no tifffile/pillow, so the decode UDF is backed by
this minimal codec built on ``struct`` + ``zlib`` + ``numpy`` only
(TIFF 6.0 is a public Adobe/ISO spec).  Supports what the imaging
plane needs:

- decode: single-IFD grayscale (PhotometricInterpretation 0/1),
  1 sample/pixel, 8/16-bit, strip-organized, compression none (1) or
  Deflate (8 / legacy 32946), optional horizontal-differencing
  predictor (tag 317 = 2), both byte orders (II/MM);
- encode: uint8/uint16 grayscale, uncompressed, single strip, II order
  (for fixtures and round-trip tests);
- header probe: width/height/bitdepth from the IFD without touching
  strip data (same contract as ``probe_png_header``).

Tiled TIFFs, palettes, multi-sample images, and LZW/JPEG compression
raise ``ValueError`` — loudly unsupported rather than silently wrong.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes) -> tuple[dict[int, list[int]], str]:
    """Parse the first IFD → ({tag: [values...]}, endian_prefix)."""
    if data[:2] == b"II":
        en = "<"
    elif data[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack(en + "H", data[2:4])
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic} (BigTIFF unsupported)")
    (ifd_off,) = struct.unpack(en + "I", data[4:8])
    (n_entries,) = struct.unpack(en + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(en + "HHI", data[off : off + 8])
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            payload = data[off + 8 : off + 8 + size]
        else:
            (val_off,) = struct.unpack(en + "I", data[off + 8 : off + 12])
            payload = data[val_off : val_off + size]
        if typ == 3:  # SHORT
            vals = list(struct.unpack(en + f"{count}H", payload))
        elif typ == 4:  # LONG
            vals = list(struct.unpack(en + f"{count}I", payload))
        elif typ == 1:  # BYTE
            vals = list(payload)
        else:  # rational/ascii/etc — not needed, keep raw length only
            vals = []
        tags[tag] = vals
    return tags, en


def probe_tiff_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, bitdepth) from the IFD without reading strips."""
    tags, _ = _read_ifd(data)
    try:
        w = tags[256][0]
        h = tags[257][0]
    except (KeyError, IndexError):
        raise ValueError("TIFF missing ImageWidth/ImageLength") from None
    bits = tags.get(258, [8])[0]
    spp = tags.get(277, [1])[0]
    photo = tags.get(262, [1])[0]
    if spp != 1 or photo not in (0, 1):
        raise ValueError(
            f"only 1-sample grayscale TIFF supported "
            f"(samples={spp}, photometric={photo})"
        )
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF unsupported (strip-organized only)")
    if bits not in (8, 16):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    return w, h, bits


def decode_tiff_gray(data: bytes) -> np.ndarray:
    """Decode a grayscale strip TIFF into a 2-D uint8/uint16 array."""
    w, h, bits = probe_tiff_header(data)
    tags, en = _read_ifd(data)
    compression = tags.get(259, [1])[0]
    predictor = tags.get(317, [1])[0]
    offsets = tags.get(273, [])
    counts = tags.get(279, [])
    if not offsets:
        raise ValueError("TIFF missing StripOffsets")
    if not counts:
        raise ValueError("TIFF missing StripByteCounts")
    if compression not in (1, 8, 32946):
        raise ValueError(
            f"unsupported TIFF compression {compression} (none/deflate only)"
        )
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        strip = data[off : off + cnt]
        raw += zlib.decompress(strip) if compression != 1 else strip
    dtype = np.dtype(en + ("u2" if bits == 16 else "u1"))
    arr = np.frombuffer(bytes(raw), dtype=dtype, count=h * w).reshape(h, w)
    if predictor == 2:  # horizontal differencing: cumsum per row
        native = arr.astype(np.int64)
        arr = (np.cumsum(native, axis=1) & ((1 << bits) - 1)).astype(dtype)
    return arr.astype(np.uint16 if bits == 16 else np.uint8)


def encode_tiff_gray(arr: np.ndarray, compression: int = 1) -> bytes:
    """Encode a 2-D uint8/uint16 array as a single-strip II TIFF.

    ``compression``: 1 (none) or 8 (Deflate).
    """
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {arr.shape}")
    if arr.dtype == np.uint8:
        bits = 8
    elif arr.dtype == np.uint16:
        bits = 16
    else:
        raise ValueError(f"unsupported dtype {arr.dtype} (uint8/uint16 only)")
    if compression not in (1, 8):
        raise ValueError(f"unsupported compression {compression}")
    h, w = arr.shape
    payload = np.ascontiguousarray(arr.astype("<u2" if bits == 16 else "u1")).tobytes()
    if compression == 8:
        payload = zlib.compress(payload, 1)
    # layout: header(8) | strip data | IFD
    strip_off = 8
    ifd_off = strip_off + len(payload)
    entries = [
        (256, 4, 1, w),  # ImageWidth
        (257, 4, 1, h),  # ImageLength
        (258, 3, 1, bits),  # BitsPerSample
        (259, 3, 1, compression),
        (262, 3, 1, 1),  # PhotometricInterpretation: BlackIsZero
        (273, 4, 1, strip_off),  # StripOffsets
        (277, 3, 1, 1),  # SamplesPerPixel
        (278, 4, 1, h),  # RowsPerStrip (single strip)
        (279, 4, 1, len(payload)),  # StripByteCounts
    ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += payload
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)  # next-IFD terminator
    return bytes(out)
