"""Pure-numpy WAV (RIFF PCM) codec.

The multimodal operators treat audio as opaque binary columns and need
a real decode step for feature extraction, but this environment ships
no audio library.  Like the PNG/NetCDF-3/HDF5 codecs in this package,
the container is implemented directly from the public specification
(RIFF/WAVE, fmt + data chunks): PCM WAV is a fixed 44-ish-byte header
plus raw little-endian samples, so decode is a header parse and a
``np.frombuffer`` — no compression, executor-safe, dependency-free.

Supported: PCM (format tag 1) at 8-bit unsigned and 16/32-bit signed,
any channel count and sample rate; chunks in any order, unknown chunks
skipped.  Float/ADPCM/extensible formats raise with a clear message
(install soundfile/librosa for those).  The encoder writes 16-bit PCM.
"""

from __future__ import annotations

import struct

import numpy as np

_SAMPLE_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """16-bit PCM WAV from an int array shaped (n,) mono or
    (n, channels)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"encode_wav: samples must be 1-D or 2-D, got {arr.ndim}-D")
    channels = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    block = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, samples[n, channels]) from a PCM WAV payload.

    8-bit samples come back zero-centred int16 (value − 128); 16/32-bit
    come back at native width.  Raises ValueError on non-RIFF input and
    non-PCM encodings — a corrupt or unsupported payload must fail
    loudly, not produce silence.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE magic mismatch)")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"WAV chunk {cid!r} truncated ({len(body)} < {size})")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise ValueError(
            f"unsupported WAV format tag {tag} (only PCM=1; install an "
            "audio library for float/ADPCM/extensible)"
        )
    if bits not in _SAMPLE_DTYPES:
        raise ValueError(f"unsupported WAV bit depth {bits} (8/16/32 only)")
    if channels < 1:
        raise ValueError("WAV declares zero channels")
    width = bits // 8
    usable = len(data) - len(data) % (width * channels)
    arr = np.frombuffer(data[:usable], dtype=np.dtype(_SAMPLE_DTYPES[bits]).newbyteorder("<"))
    if bits == 8:
        arr = arr.astype(np.int16) - 128
    return rate, arr.reshape(-1, channels)
