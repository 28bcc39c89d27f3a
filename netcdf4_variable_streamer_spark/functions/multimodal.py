"""Multimodal decode / feature-extraction kernels (gated codec stubs).

The Spark-side plumbing (binary columns + typed metadata + Arrow-batched
`mapInPandas`, see operators/multimodal.py) is real and tested; the
actual codecs (Pillow/libav) are not installed in this environment, so
each decode kernel is import-gated: with the library present it decodes,
without it it raises NotImplementedError (clearly marked stub) — or, for
the `fake=True` test path, produces a deterministic synthetic decode so
the distributed plumbing can be exercised end to end.

Batch contract (all kernels): ``Iterator[pd.DataFrame] ->
Iterator[pd.DataFrame]`` for ``DataFrame.mapInPandas``; input column
``payload: binary`` plus passthrough keys; one output row per input row
(decode/resize) or one per sampled frame (frame_sample).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, mean_pixel double"
)
AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, rms double"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def _fake_pixels(payload: bytes, shape=(8, 8, 3)) -> np.ndarray:
    """Deterministic synthetic decode: bytes → tiled uint8 'pixels'."""
    buf = np.frombuffer(payload[: shape[0] * shape[1] * shape[2]], dtype=np.uint8)
    out = np.zeros(shape[0] * shape[1] * shape[2], dtype=np.uint8)
    out[: len(buf)] = buf
    return out.reshape(shape)


def decode_image_batches(
    batches: Iterator[pd.DataFrame], fake: bool = False
) -> Iterator[pd.DataFrame]:
    """payload(binary) → image features. Real path needs Pillow."""
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    for pdf in batches:
        if not have_pil and not fake:
            raise NotImplementedError(
                "STUB: image decode requires Pillow, which is not installed "
                "in this environment; pass fake=True for the deterministic "
                "synthetic decode used by the plumbing tests"
            )
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if have_pil and not fake:
                import io

                from PIL import Image

                img = np.asarray(Image.open(io.BytesIO(payload)))
            else:
                img = _fake_pixels(bytes(payload))
            h, w = img.shape[0], img.shape[1]
            c = img.shape[2] if img.ndim == 3 else 1
            rows.append((doc_id, w, h, c, round(float(img.mean()), 4)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "n_channels", "mean_pixel"]
        )


def decode_audio_batches(
    batches: Iterator[pd.DataFrame], fake: bool = False
) -> Iterator[pd.DataFrame]:
    """payload(binary) → audio features. Real path needs soundfile/libav."""
    for pdf in batches:
        if not fake:
            raise NotImplementedError(
                "STUB: audio decode requires soundfile/libav (not installed); "
                "pass fake=True for the synthetic decode"
            )
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                np.float64
            )
            rms = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
            rows.append((doc_id, len(samples), 16000, round(rms, 4)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_samples", "sample_rate", "rms"]
        )


def frame_sample_batches(
    batches: Iterator[pd.DataFrame], every_n_bytes: int = 64, fake: bool = False
) -> Iterator[pd.DataFrame]:
    """payload(binary) → sampled 'frames'. Real path needs libav/ffmpeg."""
    import hashlib

    for pdf in batches:
        if not fake:
            raise NotImplementedError(
                "STUB: video frame sampling requires libav/ffmpeg (not "
                "installed); pass fake=True for the synthetic sampler"
            )
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for i, off in enumerate(range(0, len(b), every_n_bytes)):
                rows.append(
                    (doc_id, i, hashlib.md5(b[off : off + every_n_bytes]).hexdigest())
                )
        yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])


RESIZED_IMAGE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, pixels binary"
)


def resize_image_batches(
    batches: Iterator[pd.DataFrame],
    target: tuple[int, int] = (4, 4),
    fake: bool = False,
) -> Iterator[pd.DataFrame]:
    """payload(binary) → decoded, resized pixel buffer (binary) + dims.

    Real path needs Pillow (`Image.resize`); the fake path decodes via
    `_fake_pixels` and resizes with exact block-mean pooling (NumPy only)
    so the distributed plumbing — binary in, binary out, constant output
    shape per row — is exercised end to end. Output `pixels` is the
    row-major uint8 buffer of the resized image; downstream operators
    treat it as an opaque payload again, which is the multimodal
    column contract (opaque binary + typed metadata)."""
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    th, tw = target
    for pdf in batches:
        if not have_pil and not fake:
            raise NotImplementedError(
                "STUB: image resize requires Pillow (not installed); pass "
                "fake=True for the deterministic NumPy block-mean resize"
            )
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if have_pil and not fake:
                import io

                from PIL import Image

                img = Image.open(io.BytesIO(payload)).resize((tw, th))
                arr = np.asarray(img, dtype=np.uint8)
            else:
                src = _fake_pixels(bytes(payload))  # (8, 8, 3)
                fh, fw = src.shape[0] // th, src.shape[1] // tw
                arr = (
                    src.reshape(th, fh, tw, fw, src.shape[2])
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
            c = arr.shape[2] if arr.ndim == 3 else 1
            rows.append((doc_id, tw, th, c, arr.tobytes()))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "n_channels", "pixels"]
        )
