"""Pure-numpy PNG codec (decoder + minimal encoder).

The multimodal operators treat images as opaque binary columns and
need a real decode step for feature extraction, but this environment
ships no imaging library (PIL/imageio).  PNG is a small public
specification (RFC 2083 / W3C PNG) whose only compression is zlib —
available in the stdlib — so, like the NetCDF-3 and HDF5 codecs in
this package, we implement the container directly instead of gating
the operator behind a missing dependency.

Supported: 8-bit greyscale (color type 0), RGB (2), palette (3),
grey+alpha (4), RGBA (6); all five scanline filters; non-interlaced
only.  16-bit depths and Adam7 interlacing raise with a clear message
(install Pillow for those).  The encoder writes 8-bit grey/RGB/RGBA
with filter 0 — enough to round-trip fixtures and thumbnails.

Performance note: None/Sub/Up scanlines reconstruct vectorized;
Average/Paeth depend on the left-neighbor pixel, which is inherently
sequential along x, so those rows fall back to a per-byte Python loop
(~µs/px).  Thumbnails and fixture images decode in milliseconds; for
large libpng-encoded corpora (mostly Paeth rows) install Pillow —
``operators.multimodal.decode_image`` tries Pillow first for every
payload (C-speed for all formats, PNG included) and falls back to
this codec only when Pillow is absent, so installing it is the whole
fix when the per-image cost matters.

Dependency-free (numpy + stdlib) so it runs inside Spark executors
(mapInPandas over binary payloads) without shipping extra packages.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_MAGIC


def read_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte payload to a uint8 array (h, w) or (h, w, c)."""
    if not is_png(data):
        raise ValueError("not a PNG (magic mismatch)")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG without IHDR chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(
            f"png codec: bit depth {depth} not supported (8 only); "
            "install Pillow for full-format images"
        )
    if color not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError(
            "png codec: Adam7 interlacing not supported; install Pillow"
        )
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (stride + 1)}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row = lines[y, 1:].copy()
        f = int(filters[y])
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            rec = row.reshape(-1, ch).astype(np.int64)
            rec = (np.cumsum(rec, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = row + prev
        elif f == 3:  # Average (left is sequential: per-pixel along x)
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) % 256
        else:
            raise ValueError(f"invalid PNG filter type {f} on line {y}")
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = img[:, :, 0]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            rgba = np.concatenate([palette, alpha[:, None]], axis=1)
            return rgba[idx]
        return palette[idx]
    return img[:, :, 0] if ch == 1 else img


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def write_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — (h, w) grey, (h, w, 3) RGB or (h, w, 4)
    RGBA — as a PNG byte payload (filter 0, one IDAT)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        flat = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
        flat = a
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
        flat = a
    else:
        raise ValueError(f"unsupported array shape {a.shape} (grey/RGB/RGBA)")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), flat.reshape(h, w * ch)], axis=1
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )
