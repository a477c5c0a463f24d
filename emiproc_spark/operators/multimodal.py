"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — binary columns, Arrow-batched
``mapInPandas`` feature extraction, schema/partitioning.  Decode is
real where a dependency-free codec exists: PNG (``functions.png``) and
PCM WAV (``functions.wav``) decode losslessly in-repo, Pillow handles
other image formats when importable, and ``decode_image(fake=True)``
remains the deterministic byte-statistics stand-in for formats this
container cannot decode (e.g. video codecs — ``frame_sample`` keeps
the partition-explosion shape real over opaque payloads).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, mean_byte double, feat0 double"
)


def attach_binary(docs: DataFrame, src_col: str = "text") -> DataFrame:
    """Model a media payload: cast a column to binary with metadata.
    In production this is the parquet/lance binary column itself."""
    return docs.select(
        "doc_id",
        F.encode(F.col(src_col), "utf-8").alias("payload"),
        F.octet_length(F.col(src_col)).alias("n_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a uint8 array.

    Real decode path: PNG through the built-in pure-numpy codec
    (``functions.png``, no dependency needed); any other format through
    Pillow when it is importable (optional dependency, gated like
    h5py/pyyaml elsewhere).  ``fake=True`` keeps the deterministic
    byte-statistics stand-in for oracle-stable fixtures."""
    if fake:
        arr = np.frombuffer(payload, dtype=np.uint8)
        # an empty payload is a 0x0 image: the old max(1, ...) floor
        # forced a 1x1 reshape of 0 elements — a raw numpy ValueError
        # on any empty document instead of a well-formed empty frame
        side = int(len(arr) ** 0.5)
        return arr[: side * side].reshape(side, side)

    try:  # optional dependency: C-speed decode for every format
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        pass

    from emiproc_spark.functions.png import is_png, read_png

    if is_png(payload):
        return read_png(payload)  # lossless: same pixels Pillow yields
    # sniff common magics so the error names the actual format instead
    # of a generic "not PNG"
    magics = (
        (b"\xff\xd8\xff", "JPEG"),
        (b"GIF8", "GIF"),
        (b"BM", "BMP"),
        (b"II*\x00", "TIFF"),
        (b"MM\x00*", "TIFF"),
        (b"RIFF", "WEBP/RIFF"),
    )
    kind = next(
        (name for magic, name in magics if payload[: len(magic)] == magic),
        "an unrecognized format",
    )
    raise NotImplementedError(
        f"image decode: payload is {kind}; the built-in codec handles "
        "PNG only — install Pillow to decode other formats"
    )


def extract_features(
    media: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The mapInPandas shape (iterator of batches → iterator of batches) is
    exactly what a real CLIP/whisper embedding step uses; the math inside
    is the deterministic stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                img = decode_image(bytes(payload), fake=fake)
                flat = img.astype(np.int64)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": len(payload),
                        "checksum": int(flat.sum() % 1_000_003),
                        "mean_byte": float(flat.mean()) if flat.size else 0.0,
                        "feat0": float(len(payload) % 7),
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "n_bytes", "checksum", "mean_byte", "feat0"])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video-frame-sampling analogue on opaque payloads: emit one row per
    sampled offset (posexplode over a computed offset array) — the
    partition-explosion pattern a real frame sampler uses.  An empty (or
    NULL) payload has no frames and emits no rows."""
    if every_n_bytes <= 0:
        raise ValueError(f"every_n_bytes must be positive, got {every_n_bytes}")
    offsets = F.when(
        F.octet_length("payload") > 0,
        F.sequence(
            F.lit(0),
            F.octet_length("payload") - 1,
            F.lit(every_n_bytes),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return media.select(
        "doc_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


def resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize with the exact integer index map
    ``src = (dst * src_len) // dst_len`` — pure integer arithmetic, so
    results are bit-reproducible across engines (no float rounding in
    the sampling grid).  Works on (H, W) grey and (H, W, C) arrays."""
    if h < 1 or w < 1:
        raise ValueError(f"resize_image: target must be >= 1x1, got {h}x{w}")
    if img.ndim not in (2, 3):
        raise ValueError(f"resize_image: expected 2-D or 3-D array, got {img.ndim}-D")
    src_h, src_w = img.shape[:2]
    rows = (np.arange(h, dtype=np.int64) * src_h) // h
    cols = (np.arange(w, dtype=np.int64) * src_w) // w
    return img[rows][:, cols]


RESIZE_SCHEMA = (
    "doc_id long, out_h int, out_w int, n_px long, checksum long, mean_byte double"
)


def resize_features(
    media: DataFrame, h: int, w: int, payload_col: str = "payload"
) -> DataFrame:
    """Decode → nearest-neighbor resize → exact integer stats, Arrow
    batched (the image counterpart of ``audio_features``): per doc the
    resized image's pixel count, sum-checksum and mean.  Integer
    checksum by design — engine-reproducible like the PNG/WAV cycles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                img = decode_image(bytes(payload))
                small = resize_image(img, h, w).astype(np.int64)
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "out_h": int(small.shape[0]),
                        "out_w": int(small.shape[1]),
                        "n_px": int(small.size),
                        "checksum": int(small.sum() % 1_000_003),
                        "mean_byte": float(small.sum()) / small.size,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "out_h", "out_w", "n_px", "checksum", "mean_byte",
                ],
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, channels int, "
    "duration_s double, peak int, sum_sq long, zero_crossings long"
)


def audio_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched audio feature extraction over PCM WAV payloads
    (functions/wav.py — real decode, no optional dependency): duration,
    peak amplitude, energy (Σ sample², exact int64) and zero-crossing
    count of the channel-mean signal.

    Integer outputs by design: peak/sum_sq/zero_crossings are exact, so
    results are engine-reproducible (no float summation order issues) —
    the same convention the PNG cycle query uses.  A corrupt payload
    fails loudly with the decoder's message naming the problem.
    """
    from emiproc_spark.functions.wav import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                rate, samples = decode_wav(bytes(payload))
                mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
                sgn = np.sign(mono[mono != 0])
                out.append({
                    "doc_id": int(doc_id),
                    "sample_rate": int(rate),
                    "n_samples": int(samples.shape[0]),
                    "channels": int(samples.shape[1]),
                    "duration_s": samples.shape[0] / rate if rate else 0.0,
                    "peak": int(np.abs(samples).max(initial=0)),
                    "sum_sq": int((samples.astype(np.int64) ** 2).sum()),
                    "zero_crossings": int((sgn[1:] != sgn[:-1]).sum()) if sgn.size else 0,
                })
            yield pd.DataFrame(
                out,
                columns=["doc_id", "sample_rate", "n_samples", "channels",
                         "duration_s", "peak", "sum_sq", "zero_crossings"],
            )

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
