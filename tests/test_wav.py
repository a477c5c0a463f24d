"""Pure-numpy WAV codec (functions/wav.py) + audio_features operator."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from emiproc_spark.functions.wav import decode_wav, encode_wav


def test_roundtrip_mono_16bit():
    s = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int16)
    rate, out = decode_wav(encode_wav(s, 22_050))
    assert rate == 22_050
    assert out.shape == (6, 1)
    assert np.array_equal(out[:, 0], s)


def test_roundtrip_stereo():
    s = np.arange(20, dtype=np.int16).reshape(10, 2)
    rate, out = decode_wav(encode_wav(s, 8000))
    assert out.shape == (10, 2)
    assert np.array_equal(out, s)


@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=30, deadline=None)
def test_roundtrip_property(samples, rate):
    s = np.array(samples, dtype=np.int16)
    r, out = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert np.array_equal(out[:, 0], s)


def test_decode_8bit_and_32bit():
    # hand-built 8-bit file: values come back zero-centred
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 3) + data + b"\x00"  # word pad
    rate, out = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert list(out[:, 0]) == [-128, 0, 127]
    # 32-bit
    raw = np.array([1 << 20, -(1 << 20)], dtype="<i4").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    rate, out = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert list(out[:, 0]) == [1 << 20, -(1 << 20)]


def test_unknown_chunks_skipped_and_order_free():
    s = np.array([7, -7], dtype=np.int16)
    good = encode_wav(s, 8000)
    # splice a junk chunk between WAVE and fmt
    junk = b"JUNK" + struct.pack("<I", 4) + b"abcd"
    spliced = good[:12] + junk + good[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, out = decode_wav(spliced)
    assert np.array_equal(out[:, 0], s)


def test_corrupt_payloads_raise():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    s = encode_wav(np.array([1, 2], dtype=np.int16))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(s[:30])
    # float format tag
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="format tag 3"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_audio_features_spark(spark):
    import pandas as pd

    from emiproc_spark.operators.multimodal import audio_features

    payloads = [
        (0, encode_wav(np.array([100, -100, 100, -100], dtype=np.int16), 8000)),
        (1, encode_wav(np.zeros((8, 2), dtype=np.int16), 16000)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(payloads, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert rows[0]["peak"] == 100
    assert rows[0]["sum_sq"] == 4 * 100 * 100
    assert rows[0]["zero_crossings"] == 3
    assert rows[0]["duration_s"] == pytest.approx(4 / 8000)
    assert rows[1]["channels"] == 2 and rows[1]["n_samples"] == 8
    assert rows[1]["peak"] == 0 and rows[1]["zero_crossings"] == 0
