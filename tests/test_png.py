"""PNG codec (functions/png.py) + real image decode in the multimodal
operators.  The codec is pure numpy+zlib, so the real-decode path needs
no optional dependency for PNG payloads; Pillow remains the gated
fallback for other formats."""

import struct
import zlib

import numpy as np
import pytest

from emiproc_spark.functions.png import (
    PNG_MAGIC,
    _chunk,
    is_png,
    read_png,
    write_png,
)


def test_roundtrip_grey_rgb_rgba():
    rng = np.random.default_rng(3)
    for shape in [(5, 7), (4, 6, 3), (3, 5, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        back = read_png(write_png(img))
        assert back.shape == img.shape
        assert np.array_equal(back, img)


def test_all_scanline_filters_decode():
    """Hand-build IDAT scanlines with every filter type and check the
    reconstruction against a straight-line reference implementation."""
    rng = np.random.default_rng(11)
    w, h, ch = 6, 5, 3
    raw = rng.integers(0, 256, (h, w * ch), dtype=np.uint8)

    # reference reconstruction (per-pixel, straight from the spec)
    def filt(y, f, recon):
        prev = recon[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.uint8)
        line = np.zeros(w * ch, dtype=np.uint8)
        for x in range(w * ch):
            a = int(recon[y][x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(recon[y - 1][x - ch]) if (x >= ch and y > 0) else 0
            cur = int(recon[y][x])
            if f == 0:
                v = cur
            elif f == 1:
                v = (cur - a) % 256
            elif f == 2:
                v = (cur - b) % 256
            elif f == 3:
                v = (cur - (a + b) // 2) % 256
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (cur - pred) % 256
            line[x] = v
        return line

    filters = [0, 1, 2, 3, 4]
    scan = bytearray()
    for y in range(h):
        scan.append(filters[y])
        scan += filt(y, filters[y], raw).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(read_png(blob), raw.reshape(h, w, ch))


def test_palette_and_errors():
    # palette image: 3 colors, 2x3 indices
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    blob = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(read_png(blob), pal[idx])

    assert not is_png(b"CDF\x01junk")
    with pytest.raises(ValueError, match="magic"):
        read_png(b"nope")
    # 16-bit depth gated with a clear message
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    blob16 = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        read_png(blob16)


def test_extract_features_real_png_payloads(spark):
    """The multimodal feature extractor runs the REAL decode path
    (fake=False) on PNG payloads through Arrow-batched mapInPandas —
    checksum/mean reflect decoded pixels, not container bytes."""
    from emiproc_spark.operators.multimodal import decode_image, extract_features

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (4, 4, 3), dtype=np.uint8) for _ in range(3)]
    rows = [(i, write_png(img)) for i, img in enumerate(imgs)]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in extract_features(media, fake=False).collect()}
    assert len(out) == 3
    for i, img in enumerate(imgs):
        assert out[i]["checksum"] == int(img.astype(np.int64).sum() % 1_000_003)
        assert out[i]["mean_byte"] == pytest.approx(float(img.mean()))

    # non-PNG payload without Pillow: actionable error (or decodes if
    # Pillow happens to be installed)
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present: non-PNG path decodes")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def test_decode_image_sniffs_foreign_magic():
    """Non-PNG payloads name the sniffed format in the error so a user
    knows Pillow (not a different payload) is the fix."""
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: foreign formats decode for real")
    except ImportError:
        pass
    from emiproc_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16, fake=False)
    with pytest.raises(NotImplementedError, match="TIFF"):
        decode_image(b"II*\x00" + b"\x00" * 16, fake=False)
    with pytest.raises(NotImplementedError, match="unrecognized"):
        decode_image(b"\x01\x02\x03\x04", fake=False)
