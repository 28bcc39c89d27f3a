"""Multimodal decode / feature-extraction kernels.

The Spark-side plumbing (binary columns + typed metadata + Arrow-batched
`mapInPandas`, see operators/multimodal.py) is real and tested, and so
are the codecs: BMP, PPM, PNG, QOI, GIF, JPEG (baseline + progressive,
:mod:`functions.jpeg`), TIFF (:mod:`functions.tiff`), WAV-PCM16, G.711,
FLAC (:mod:`functions.flac`) and MJPEG-in-AVI video
(:mod:`functions.avi`) are all from-scratch pure-Python/NumPy
implementations of the public specs — no external imaging/audio
library. Formats beyond those (e.g. WEBP/AVIF/MP3) are import-gated:
with Pillow/libav present they decode, without it they raise
NotImplementedError (clearly marked stub) — or, for the `fake=True`
test path, produce a deterministic synthetic decode so the distributed
plumbing can be exercised end to end.

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


# ---------------------------------------------------------------------------
# REAL codecs, pure NumPy (no external libraries). This module hosts the
# simpler image formats (BMP, PPM, PNG, QOI, GIF) and audio (WAV, G.711);
# JPEG, TIFF, FLAC and AVI live in their own sibling modules. None are
# stubs — payloads a user writes with standard tools decode here, and the
# encoders produce files standard tools open.
# ---------------------------------------------------------------------------

import struct


def _codec_guard(fmt: str):
    """Normalize low-level parse failures on UNTRUSTED payload bytes
    into the codec family's defined ValueError refusal. A truncated
    header otherwise escapes as struct.error and a corrupt deflate
    stream as zlib.error (whole-payload corruption sweep, fuzz round
    8) — opaque task-killers inside the mapInPandas kernels instead
    of the documented corrupt-payload contract."""

    def deco(fn):
        import functools
        import zlib as _zlib

        @functools.wraps(fn)
        def wrapped(payload, *a, **kw):
            try:
                return fn(payload, *a, **kw)
            except (struct.error, _zlib.error) as e:
                raise ValueError(
                    f"truncated or corrupt {fmt} payload: {e}"
                ) from e

        return wrapped

    return deco


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BI_RGB BMP bytes
    (bottom-up rows, BGR channel order, rows padded to 4 bytes)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # flip+BGR
    data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


@_codec_guard("BMP")
def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB.
    Handles bottom-up (height > 0) and top-down (height < 0) row order
    and 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img if top_down else img[::-1]


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6, maxval 255) bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


@_codec_guard("PPM")
def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 RGB. Handles comment
    lines and arbitrary whitespace in the header per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"only maxval 255 supported ({maxval})")
    return np.frombuffer(
        payload, dtype=np.uint8, count=h * w * 3, offset=pos
    ).reshape(h, w, 3)


def decode_any(payload: bytes) -> np.ndarray | None:
    """Dispatch on magic bytes to a pure-NumPy decoder; None if the
    format needs an external codec."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"qoif":
        return decode_qoi(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)[0]  # first frame as the image
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        img = decode_png(payload)
        return img[:, :, None] if img.ndim == 2 else img
    if payload[:2] == b"\xff\xd8":
        from netcdf4_variable_streamer_spark.functions.jpeg import (
            decode_jpeg,
        )

        img = decode_jpeg(payload)
        return img[:, :, None] if img.ndim == 2 else img
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from netcdf4_variable_streamer_spark.functions.tiff import (
            decode_tiff,
        )

        img = decode_tiff(payload)
        return img[:, :, None] if img.ndim == 2 else img
    return None


def decode_audio_any(payload: bytes):
    """Dispatch on magic bytes to a pure-Python audio decoder:
    (samples, sample_rate) for RIFF/WAVE (PCM16 + G.711 + IMA ADPCM),
    FLAC and Ogg Vorbis (round 18); None if the format needs an
    external codec."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav_pcm16(payload)
    if payload[:4] == b"fLaC":
        from netcdf4_variable_streamer_spark.functions.flac import (
            decode_flac,
        )

        return decode_flac(payload)
    if payload[:4] == b"OggS":
        # Peek past the first Ogg page header for the \x01vorbis
        # identification packet before committing to the Vorbis decoder:
        # Ogg is a container, and non-Vorbis payloads (Opus, Speex,
        # Ogg-FLAC) honor the documented "None if the format needs an
        # external codec" contract instead of raising (r18 ADVICE #1).
        if len(payload) < 27:
            return None
        n_segs = payload[26]
        first_packet = 27 + n_segs
        if payload[first_packet : first_packet + 7] != b"\x01vorbis":
            return None
        from netcdf4_variable_streamer_spark.functions.vorbis import (
            decode_ogg_vorbis,
        )

        return decode_ogg_vorbis(payload)
    return None


def decode_image_batches(
    batches: Iterator[pd.DataFrame], fake: bool = False
) -> Iterator[pd.DataFrame]:
    """payload(binary) → image features.

    BMP (uncompressed 24-bit), PPM (P6), PNG (incl. palette,
    low-depth gray, Adam7 interlace),
    QOI, GIF, JPEG (baseline + progressive) and TIFF payloads decode
    through the pure-NumPy codecs (see also :mod:`functions.jpeg`,
    :mod:`functions.tiff`) — REAL paths with no
    external dependency. Other formats need Pillow; without it they
    raise the clearly-marked stub error (or use the `fake=True`
    synthetic decode in tests)."""
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if fake:
                img = _fake_pixels(b)
            else:
                img = decode_any(b)
                if img is None:
                    if not have_pil:
                        raise NotImplementedError(
                            "STUB: BMP/PPM/PNG/QOI/GIF/JPEG/TIFF decode "
                            "natively; other formats require Pillow "
                            "(not installed here). Pass fake=True for "
                            "the synthetic decode used by the "
                            "plumbing tests"
                        )
                    import io

                    from PIL import Image

                    img = np.asarray(Image.open(io.BytesIO(b)))
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
                "STUB: this kernel is the synthetic-plumbing path — "
                "pass fake=True; real WAV/G.711/FLAC audio decodes "
                "natively via decode_audio_any / decode_wav_pcm16 / "
                "functions.flac (other formats require soundfile/"
                "libav, not installed)"
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


# ---------------------------------------------------------------------------
# REAL audio codec, pure NumPy: canonical RIFF/WAVE PCM (16-bit mono).
# Like the BMP/PPM codecs above this is not a stub — files produced here
# open in any audio tool, and any standard PCM16 WAV decodes here.
# Compressed audio (MP3/AAC/...) still needs external libraries.
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D (mono) or (n, 2) (stereo, interleaved frames) int16 →
    canonical 44-byte-header PCM16 WAV."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("encode_wav_pcm16 expects 1-D or (n, 2) int16")
    if samples.ndim == 2 and samples.shape[1] != 2:
        raise ValueError("encode_wav_pcm16 stereo needs 2 channels")
    ch = 1 if samples.ndim == 1 else 2
    data = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH",
        16, 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16,
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


@_codec_guard("WAV")
def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → (1-D int16 samples, sample_rate). Walks the
    RIFF chunk list (fmt may be followed by LIST/fact/cue chunks before
    data in real files) instead of assuming a fixed 44-byte header."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels = 12, None, None, None
    fmt_tag = None
    block_align = spb = n_samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from(
                "<HHI", payload, body
            )
            block_align, bits = struct.unpack_from(
                "<HH", payload, body + 12
            )
            if fmt_tag == 0x11:
                if size < 20:
                    raise ValueError(
                        "IMA ADPCM fmt chunk lacks samplesPerBlock"
                    )
                (spb,) = struct.unpack_from("<H", payload, body + 18)
            elif fmt_tag not in (1, 6, 7):
                # 1 = PCM, 6/7 = G.711 A-/mu-law (round 15), 0x11 =
                # IMA ADPCM (round 17); anything else genuinely
                # needs external codecs
                raise NotImplementedError(
                    f"compressed WAV (fmt tag {fmt_tag}) needs external "
                    "codecs"
                )
        elif cid == b"fact" and size >= 4:
            (n_samples,) = struct.unpack_from("<I", payload, body)
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if fmt_tag == 0x11:
                return (
                    ima_adpcm_decode_wav(
                        payload, body, size, channels, bits,
                        block_align, spb, n_samples,
                    ),
                    rate,
                )
            if fmt_tag in (6, 7):
                if bits != 8 or channels != 1:
                    raise NotImplementedError(
                        f"{bits}-bit/{channels}-channel G.711 WAV "
                        "unsupported (8-bit mono only)"
                    )
                codes = np.frombuffer(
                    payload, np.uint8, size, body
                )
                dec = alaw_decode if fmt_tag == 6 else mulaw_decode
                return dec(codes), rate
            if bits != 16 or channels not in (1, 2):
                raise NotImplementedError(
                    f"{bits}-bit/{channels}-channel WAV unsupported "
                    "(PCM16 mono/stereo only)"
                )
            if body + size > len(payload):
                raise ValueError(
                    "WAV data chunk truncated (declares "
                    f"{size} bytes, {len(payload) - body} present)"
                )
            if channels == 2 and size % 4:
                raise ValueError(
                    f"stereo PCM16 data chunk of {size} bytes is "
                    "not whole frames"
                )
            raw = payload[body : body + size]
            mono = np.frombuffer(raw, dtype="<i2").astype(np.int16)
            if channels == 2:
                # interleaved L/R frames → (n, 2), the FLAC shape
                return mono.reshape(-1, 2), rate
            return mono, rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk found")


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (public ITU-T spec; the CCITT reference
# arithmetic): telephony WAV payloads (fmt tags 7 / 6) expand natively
# to int16 — no external codec. Both directions, fully vectorized; the
# VALUE-level idempotency decode(encode(decode(c))) == decode(c) over
# all 256 codewords is test-pinned — the strongest statement a lossy
# companding pair admits (both laws carry a duplicate zero codeword,
# so raw codeword identity deliberately is NOT claimed).
# ---------------------------------------------------------------------------


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codewords -> int16 linear (CCITT ulaw2linear)."""
    u = ~np.asarray(codes, dtype=np.uint8)
    t = ((u & 0x0F).astype(np.int32) << 3) + 0x84
    t <<= (u >> 4) & 0x07
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 mu-law codewords (CCITT linear2ulaw)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law codewords -> int16 linear (CCITT alaw2linear)."""
    a = np.asarray(codes, dtype=np.uint8) ^ 0x55
    seg = ((a >> 4) & 0x07).astype(np.int32)
    t = ((a & 0x0F).astype(np.int32) << 4) + 8
    t = np.where(seg > 0, (t + 0x100) << np.maximum(seg - 1, 0), t)
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear -> uint8 A-law codewords (CCITT linear2alaw)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    seg = (
        np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7
    ).clip(0, 7)
    small = mag < 256
    mant = np.where(small, mag >> 4, (mag >> (seg + 3)) & 0x0F)
    seg = np.where(small, 0, seg)
    return ((sign | (seg << 4) | mant) ^ 0x55).astype(np.uint8)


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11, public IMA "Recommended
# Practices" algorithm; round 17): the 4-bit differential coder that
# telephony archives, game assets and older web audio actually ship —
# a REAL compressed-audio decode at 4:1, and unlike the perceptual
# codecs (MP3/Vorbis) it is integer-exact end to end, so the whole
# sequential decode recursion mirrors into the DuckDB oracle as a
# recursive CTE with no fixture compromise. (MP3/MP2 remain loud
# refusals: their synthesis filterbank needs the 512-coefficient
# window of ISO 11172-3 Table 3-B.3, which cannot be transcribed
# reliably without the spec document in-sandbox — a mistyped table
# would round-trip self-consistently and hide, the exact failure mode
# the hand-derivation discipline exists to prevent.)
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _ima_step(pred: int, idx: int, n: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: (predictor, step index) + 4-bit
    nibble → next (predictor, step index). All-integer."""
    step = int(_IMA_STEPS[idx])
    diff = step >> 3
    if n & 4:
        diff += step
    if n & 2:
        diff += step >> 1
    if n & 1:
        diff += step >> 2
    pred = pred - diff if n & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_IMA_INDEX_ADJ[n & 7])))
    return pred, idx


def ima_adpcm_decode_block(
    block: bytes, samples_per_block: int
) -> np.ndarray:
    """One mono IMA ADPCM block (4-byte header + packed nibbles,
    low nibble first) → int16 samples. The header predictor IS the
    first output sample (the WAV convention)."""
    if len(block) < 4:
        raise ValueError("IMA ADPCM block shorter than its header")
    (pred,) = struct.unpack_from("<h", block, 0)
    idx = block[2]
    if idx > 88:
        raise ValueError(f"IMA ADPCM step index {idx} > 88")
    if block[3] != 0:
        raise ValueError("IMA ADPCM reserved header byte nonzero")
    avail = (len(block) - 4) * 2
    if samples_per_block - 1 > avail:
        raise ValueError(
            f"IMA ADPCM block carries {avail} nibbles for "
            f"{samples_per_block - 1} samples"
        )
    out = np.empty(samples_per_block, np.int16)
    out[0] = pred
    for t in range(samples_per_block - 1):
        byte = block[4 + (t >> 1)]
        n = (byte >> 4) & 0xF if t & 1 else byte & 0xF
        pred, idx = _ima_step(pred, idx, n)
        out[t + 1] = pred
    return out


def ima_adpcm_decode_block_stereo(
    block: bytes, samples_per_block: int
) -> np.ndarray:
    """One STEREO IMA ADPCM block → (samples_per_block, 2) int16.
    Layout per the IMA WAV convention: a 4-byte header per channel,
    then the data interleaved in 4-byte (8-nibble) groups per
    channel — both channels advance 8 samples per 8-byte pair."""
    if len(block) < 8:
        raise ValueError("IMA ADPCM stereo block shorter than headers")
    preds = []
    idxs = []
    for c in range(2):
        (p,) = struct.unpack_from("<h", block, 4 * c)
        i = block[4 * c + 2]
        if i > 88:
            raise ValueError(f"IMA ADPCM step index {i} > 88")
        if block[4 * c + 3] != 0:
            raise ValueError("IMA ADPCM reserved header byte nonzero")
        preds.append(p)
        idxs.append(i)
    out = np.empty((samples_per_block, 2), np.int16)
    out[0] = preds
    n_rem = samples_per_block - 1
    if n_rem > (len(block) - 8) // 8 * 8:
        raise ValueError(
            f"IMA ADPCM stereo block carries "
            f"{(len(block) - 8) // 8 * 8} sample slots for {n_rem}"
        )
    base = 1
    pos = 8
    while n_rem > 0:
        take = min(8, n_rem)
        for c in range(2):
            grp = block[pos + 4 * c : pos + 4 * c + 4]
            p, i = preds[c], idxs[c]
            for k in range(take):
                byte = grp[k >> 1]
                n = (byte >> 4) & 0xF if k & 1 else byte & 0xF
                p, i = _ima_step(p, i, n)
                out[base + k, c] = p
            preds[c], idxs[c] = p, i
        base += take
        n_rem -= take
        pos += 8
    return out


def _ima_quantize(s: int, pred: int, idx: int):
    """Search-free IMA quantizer for one sample: (nibble, next
    predictor, next step index) — the next-state comes from the
    DECODER recursion so encoder drift cannot accumulate."""
    step = int(_IMA_STEPS[idx])
    delta = s - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    pred, idx = _ima_step(pred, idx, n)
    return n, pred, idx


def ima_adpcm_encode(
    samples: np.ndarray, block_nibbles: int = 1010
) -> tuple[list[bytes], int]:
    """1-D int16 → (mono IMA ADPCM blocks, samples_per_block)."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("ima_adpcm_encode expects 1-D int16")
    if block_nibbles < 2 or block_nibbles % 2:
        raise ValueError("block_nibbles must be even and >= 2")
    spb = block_nibbles + 1
    blocks = []
    pos = 0
    idx = 0
    n_total = len(samples)
    while pos < n_total:
        chunk = samples[pos : pos + spb]
        pred = int(chunk[0])
        hdr = struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            n, pred, idx = _ima_quantize(int(s), pred, idx)
            nibbles.append(n)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble (decoder never reads it)
        body = bytes(
            nibbles[i] | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        blocks.append(hdr + body)
        pos += spb
    return blocks, spb


def ima_adpcm_encode_stereo(
    samples: np.ndarray, block_groups: int = 126
) -> tuple[list[bytes], int]:
    """(n, 2) int16 → (stereo IMA ADPCM blocks, samples_per_block).
    ``block_groups`` 8-byte data groups per channel per block →
    samples_per_block = 8*block_groups + 1."""
    if samples.ndim != 2 or samples.shape[1] != 2 or (
        samples.dtype != np.int16
    ):
        raise ValueError("ima_adpcm_encode_stereo expects (n, 2) int16")
    if block_groups < 1:
        raise ValueError("block_groups must be >= 1")
    spb = 8 * block_groups + 1
    blocks = []
    pos = 0
    idxs = [0, 0]
    n_total = len(samples)
    while pos < n_total:
        chunk = samples[pos : pos + spb]
        hdr = b""
        preds = []
        for c in range(2):
            p = int(chunk[0, c])
            hdr += struct.pack("<hBB", p, idxs[c], 0)
            preds.append(p)
        nibs = [[], []]
        for c in range(2):
            p, i = preds[c], idxs[c]
            for s in chunk[1:, c]:
                n, p, i = _ima_quantize(int(s), p, i)
                nibs[c].append(n)
            while len(nibs[c]) % 8:
                nibs[c].append(0)  # pad to a full group
            preds[c], idxs[c] = p, i
        body = bytearray()
        for g in range(len(nibs[0]) // 8):
            for c in range(2):
                part = nibs[c][8 * g : 8 * g + 8]
                body += bytes(
                    part[k] | (part[k + 1] << 4)
                    for k in range(0, 8, 2)
                )
        blocks.append(hdr + bytes(body))
        pos += spb
    return blocks, spb


def encode_wav_ima_adpcm(
    samples: np.ndarray,
    sample_rate: int = 8000,
    block_nibbles: int = 1010,
) -> bytes:
    """1-D (mono) or (n, 2) (stereo) int16 → IMA ADPCM WAV (fmt tag
    0x11, cbSize=2 with samplesPerBlock, fact chunk — the layout
    strict readers demand)."""
    if samples.ndim == 2:
        blocks, spb = ima_adpcm_encode_stereo(
            samples, max(1, block_nibbles // 8)
        )
        ch = 2
        block_align = 8 + (spb - 1)  # 8*groups data bytes + headers
    else:
        blocks, spb = ima_adpcm_encode(samples, block_nibbles)
        ch = 1
        block_align = 4 + block_nibbles // 2
    # the container strides the data chunk at blockAlign, so a short
    # final block pads to full size; the fact chunk stops the decoder
    data = b"".join(b.ljust(block_align, b"\0") for b in blocks)
    avg = (sample_rate * block_align + spb - 1) // spb
    hdr = b"RIFF" + struct.pack("<I", 52 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHHHH",
        20, 0x11, ch, sample_rate, avg, block_align, 4, 2, spb,
    )
    hdr += b"fact" + struct.pack("<II", 4, len(samples))
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def ima_adpcm_decode_wav(
    payload: bytes,
    body: int,
    size: int,
    channels: int,
    bits: int,
    block_align: int,
    samples_per_block: int,
    n_samples: int | None,
) -> np.ndarray:
    """The data-chunk half of IMA ADPCM WAV decode (called from the
    RIFF walker once fmt tag 0x11 is seen). Mono returns 1-D int16;
    stereo returns (n, 2) — the same shape convention as FLAC."""
    if bits != 4 or channels not in (1, 2):
        raise NotImplementedError(
            f"{bits}-bit/{channels}-channel IMA ADPCM WAV "
            "unsupported (4-bit mono/stereo only)"
        )
    hdr_bytes = 4 * channels
    if block_align < hdr_bytes + 1 or samples_per_block < 2:
        raise ValueError(
            f"IMA ADPCM block layout invalid (align {block_align}, "
            f"{samples_per_block} samples/block)"
        )
    if channels == 2:
        if (block_align - 8) % 8:
            raise ValueError(
                f"IMA ADPCM stereo blockAlign {block_align} is not "
                "headers + whole 8-byte channel groups"
            )
        capacity = (block_align - 8) // 8 * 8
    else:
        capacity = (block_align - 4) * 2
    if samples_per_block - 1 > capacity:
        raise ValueError(
            "IMA ADPCM samplesPerBlock exceeds block capacity"
        )
    if body + size > len(payload):
        raise ValueError("IMA ADPCM data chunk truncated")
    out = []
    left = n_samples
    for boff in range(0, size, block_align):
        block = payload[body + boff : body + min(boff + block_align, size)]
        spb = samples_per_block
        if left is not None:
            if left <= 0:
                break
            spb = min(spb, left)
        if channels == 2:
            dec = ima_adpcm_decode_block_stereo(block, spb)
        else:
            dec = ima_adpcm_decode_block(block, spb)
        out.append(dec)
        if left is not None:
            left -= len(dec)
    if not out:
        raise ValueError("IMA ADPCM data chunk carries no blocks")
    if left is not None and left > 0:
        decoded = n_samples - left
        raise ValueError(
            f"IMA ADPCM fact chunk declares {n_samples} samples but the "
            f"data chunk only decodes {decoded} — truncated stream"
        )
    return np.concatenate(out)


def encode_wav_g711(
    samples: np.ndarray, law: str, sample_rate: int = 8000
) -> bytes:
    """1-D int16 -> mono G.711 WAV bytes (fmt tag 6 for "alaw",
    7 for "mulaw") — the telephony container real ASR corpora ship."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav_g711 expects 1-D int16")
    if law == "mulaw":
        tag, data = 7, mulaw_encode(samples).tobytes()
    elif law == "alaw":
        tag, data = 6, alaw_encode(samples).tobytes()
    else:
        raise ValueError(f"law must be 'mulaw' or 'alaw', not {law!r}")
    # Non-PCM format tags require the 18-byte fmt chunk (cbSize=0) plus
    # a fact chunk carrying the per-channel sample count — strict
    # readers (libsndfile et al.) reject a bare 16-byte fmt for tag 6/7.
    hdr = b"RIFF" + struct.pack("<I", 50 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHHH", 18, tag, 1, sample_rate, sample_rate, 1, 8, 0
    )
    hdr += b"fact" + struct.pack("<II", 4, len(samples))
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


# ---------------------------------------------------------------------------
# REAL PNG codec, stdlib zlib + NumPy. zlib ships with CPython, so PNG
# needs no external library at all — the decoder handles 8-bit
# gray/RGB/RGBA plus (round 17) palette images (PLTE/tRNS, depths
# 1/2/4/8), (round 18) 16-bit samples as uint16,
# low-depth grayscale and Adam7 interlace (all five row
# filters everywhere); the encoder emits spec-conformant 8-bit
# non-interlaced files (Sub-filtered, CRC'd) that any tool opens.
# the encoder side stays 8-bit (fixtures build 16-bit files by hand).
# ---------------------------------------------------------------------------

import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


# ---------------------------------------------------------------------------
# GIF (GIF89a, public spec): the REAL multi-frame format — with it the
# video-frame-sampling story runs on actual bytes instead of synthetic
# frame splits. Decode implements full LZW (dictionary rebuild, code
# width growth, CLEAR/EOI), global + local color tables, interlace
# deinterlacing, draw-over composition and GCE transparency; the
# encoder emits literal LZW codes with periodic CLEAR resets (the
# classic "uncompressed GIF" construction — spec-valid output any
# standard decoder opens, no dictionary search needed). Refusals are
# loud and named: >256-color frames (encode), restore-to-previous
# disposal, truncated streams, LZW code references past the dictionary.
# ---------------------------------------------------------------------------


def encode_gif(frames, delay_cs: int = 10) -> bytes:
    """(n, h, w, 3) uint8 (or a single (h, w, 3) frame) → animated
    GIF89a bytes. All frames share one global palette built from the
    union of their colors; more than 256 distinct colors refuses
    (quantization needs a real imaging library)."""
    fr = np.asarray(frames)
    if fr.ndim == 3:
        fr = fr[None]
    if fr.ndim != 4 or fr.shape[3] != 3 or fr.dtype != np.uint8:
        raise ValueError("encode_gif expects (n, h, w, 3) uint8")
    n, h, w, _ = fr.shape
    flat = fr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise NotImplementedError(
            f"{colors.shape[0]} distinct colors need palette "
            "quantization (requires an imaging library)"
        )
    depth = max(2, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors
    idx = inverse.reshape(n, h, w).astype(np.uint16)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4)
                       | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop
    mcs = depth  # LZW minimum code size
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    for f in range(n):
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0, delay_cs, 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([mcs])
        # literal-code LZW: CLEAR, then raw indices at mcs+1 bits,
        # re-CLEARing before the decoder's dictionary would force a
        # code-width change — every emitted code stays mcs+1 bits
        bits = bytearray()
        codes = [clear]
        room = (1 << mcs) - 2
        row = idx[f].reshape(-1)
        for i, v in enumerate(row):
            if i and i % room == 0:
                codes.append(clear)
            codes.append(int(v))
        codes.append(eoi)
        acc = 0
        nacc = 0
        width = mcs + 1
        for c in codes:
            acc |= c << nacc
            nacc += width
            while nacc >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            bits.append(acc & 0xFF)
        for off in range(0, len(bits), 255):
            chunk = bits[off : off + 255]
            out += bytes([len(chunk)]) + bytes(chunk)
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


@_codec_guard("GIF")
def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a bytes → (n_frames, h, w, 3) uint8 composed frames
    (draw-over disposal; GCE-transparent pixels keep the canvas)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if w * h > 50_000_000:
        # resource guard: a 13-byte header can otherwise demand a
        # multi-GB canvas allocation before any data is validated
        raise ValueError(f"GIF dimensions implausible: {w}x{h}")
    pos = 13
    gpal = None
    if flags & 0x80:
        gn = 2 << (flags & 0x07)
        gpal = np.frombuffer(
            payload, np.uint8, gn * 3, pos
        ).reshape(gn, 3)
        pos += gn * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gpal is not None and bg < gpal.shape[0]:
        canvas[:] = gpal[bg]

    def at(p: int) -> int:
        # every single-byte read goes through this bound check: a
        # truncated stream must refuse, not escape as IndexError
        # (found immediately by this codec's corruption sweep)
        if p >= len(payload):
            raise ValueError(
                f"GIF stream truncated at byte {p} of {len(payload)}"
            )
        return payload[p]

    frames = []
    transparent = None
    while True:
        b0 = at(pos)
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = at(pos)
            pos += 1
            if label == 0xF9:  # graphic control
                sz = at(pos)
                if sz != 4:
                    # the GCE block size is fixed at 4 by the spec;
                    # the transparent-color byte sits at pos+sz only
                    # when that holds — anything else would silently
                    # misread which palette index is transparent
                    raise ValueError(
                        f"GIF graphic-control block size {sz} != 4"
                    )
                gflags = at(pos + 1)
                disposal = (gflags >> 2) & 0x07
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF restore-to-previous disposal unsupported"
                    )
                transparent = (
                    at(pos + sz) if gflags & 0x01 else None
                )
                pos += sz + 1
            while True:  # skip (or finish) sub-blocks
                sz = at(pos)
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if b0 != 0x2C:
            raise ValueError(
                f"unknown GIF block 0x{b0:02x} at byte {pos - 1}"
            )
        fx, fy, fw, fh, iflags = struct.unpack_from(
            "<HHHHB", payload, pos
        )
        pos += 9
        # frame must be non-empty and fit the logical screen — an
        # oversized or empty descriptor otherwise escapes later as
        # IndexError from the composition/deinterlace indexing
        # (round-15 self-review finding)
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError(
                f"GIF frame {fw}x{fh} at ({fx},{fy}) outside the "
                f"{w}x{h} logical screen"
            )
        pal = gpal
        if iflags & 0x80:
            ln = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload, np.uint8, ln * 3, pos
            ).reshape(ln, 3)
            pos += ln * 3
        if pal is None:
            raise ValueError("GIF image has no color table")
        mcs = at(pos)
        pos += 1
        data = bytearray()
        while True:
            sz = at(pos)
            pos += 1
            if sz == 0:
                break
            if pos + sz > len(payload):
                raise ValueError("GIF data sub-block truncated")
            data += payload[pos : pos + sz]
            pos += sz
        indices = _gif_lzw_decode(bytes(data), mcs, fw * fh)
        grid = np.asarray(indices, dtype=np.int32).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = []
            for start, step in _GIF_INTERLACE:
                rows.extend(range(start, fh, step))
            de = np.empty_like(grid)
            de[np.asarray(rows)] = grid
            grid = de
        if int(grid.max(initial=0)) >= pal.shape[0]:
            raise ValueError(
                "GIF pixel index outside the color table"
            )
        region = canvas[fy : fy + fh, fx : fx + fw]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = pal[grid[mask]]
        else:
            region[:] = pal[grid]
        frames.append(canvas.copy())
        if (len(frames) + 1) * w * h > 200_000_000:
            # amplification guard: every frame materializes a canvas
            # copy, so a small payload declaring many frames over a
            # large screen could demand unbounded memory
            raise ValueError(
                f"GIF output implausibly large: {len(frames)} frames "
                f"of {w}x{h}"
            )
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames)


def _gif_lzw_decode(
    data: bytes, mcs: int, n_pixels: int, _stats: dict | None = None
):
    """GIF-variant LZW: little-endian bit packing, code width grows
    after the dictionary reaches 2^width (capped at 12 bits), CLEAR
    resets, EOI terminates. The dictionary freezes at the spec's
    4096-entry maximum (codes stay ≤4095 at the 12-bit width cap, so
    entries past 4096 could never be referenced anyway — the freeze
    bounds memory on long deferred-clear streams to what a conformant
    decoder holds). ``_stats``, when given, records the peak table
    size so tests can pin the bound."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"GIF LZW minimum code size {mcs} invalid")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = 0
    nbits = 0
    pos = 0
    width = mcs + 1
    base = [(i,) for i in range(1 << mcs)] + [(), ()]
    table = list(base)
    prev = None
    out = []
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError(
                    "GIF LZW stream truncated mid-image"
                )
            bits |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bits & ((1 << width) - 1)
        bits >>= width
        nbits -= width
        if code == clear:
            if _stats is not None:
                _stats["max_table"] = max(
                    _stats.get("max_table", 0), len(table)
                )
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(
                    f"GIF LZW first code {code} not in dictionary"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                # dictionary freezes at the 12-bit cap; codes stay
                # ≤4095 so the frozen table remains fully addressable
                table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(
                f"GIF LZW code {code} references past the "
                f"{len(table)}-entry dictionary"
            )
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if _stats is not None:
        _stats["max_table"] = max(
            _stats.get("max_table", 0), len(table)
        )
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF LZW ended after {len(out)} of {n_pixels} pixels"
        )
    return out[:n_pixels]


# ---------------------------------------------------------------------------
# QOI ("Quite OK Image", qoiformat.org — public-domain one-page spec):
# a third REAL image codec alongside BMP/PPM/PNG. RGB and RGBA, the five
# chunk ops (INDEX/DIFF/LUMA/RUN/RGB[A]), wrapping byte arithmetic, the
# 64-entry hash index, and the 8-byte end marker — encode AND decode, so
# round-trips pin the bitstream without any external library. The codec
# is inherently per-pixel sequential (each op depends on the previous
# pixel and the running index), so both directions are plain loops —
# fine for the fixture-scale payload columns these kernels decode, and
# honest about it; a production hot path would sit behind mapInPandas
# exactly like the PNG codec, parallel across rows/batches.
# ---------------------------------------------------------------------------


def encode_qoi(arr: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 → QOI bytes (colorspace byte 0: sRGB)."""
    if arr.ndim != 3 or arr.shape[2] not in (3, 4) or arr.dtype != np.uint8:
        raise ValueError("encode_qoi expects (h, w, 3|4) uint8")
    h, w, c = arr.shape
    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", w, h, c, 0)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    px = arr.reshape(-1, c)
    run = 0
    for i in range(px.shape[0]):
        p = px[i]
        cur = (int(p[0]), int(p[1]), int(p[2]),
               int(p[3]) if c == 4 else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[hidx] == cur:
            out.append(hidx)
        else:
            index[hidx] = cur
            if cur[3] == prev[3]:
                dr = (cur[0] - prev[0]) % 256
                dg = (cur[1] - prev[1]) % 256
                db = (cur[2] - prev[2]) % 256
                sr = dr - 256 if dr > 127 else dr
                sg = dg - 256 if dg > 127 else dg
                sb = db - 256 if db > 127 else db
                if -2 <= sr <= 1 and -2 <= sg <= 1 and -2 <= sb <= 1:
                    out.append(
                        0x40 | ((sr + 2) << 4) | ((sg + 2) << 2)
                        | (sb + 2)
                    )
                elif (
                    -32 <= sg <= 31
                    and -8 <= sr - sg <= 7
                    and -8 <= sb - sg <= 7
                ):
                    out.append(0x80 | (sg + 32))
                    out.append(((sr - sg + 8) << 4) | (sb - sg + 8))
                else:
                    out.append(0xFE)
                    out += bytes(cur[:3])
            else:
                out.append(0xFF)
                out += bytes(cur)
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


@_codec_guard("QOI")
def decode_qoi(payload: bytes) -> np.ndarray:
    """QOI bytes → (h, w, 3|4) uint8. Refuses truncated streams, a
    pixel count that disagrees with the header, and a missing end
    marker — the silent-desync shapes of a run-length format."""
    if payload[:4] != b"qoif":
        raise ValueError("not a QOI payload")
    w, h, c, _cs = struct.unpack_from(">IIBB", payload, 4)
    if c not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {c}")
    n = w * h
    if n > 50_000_000:
        raise ValueError(f"QOI dimensions implausible: {w}x{h}")
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    pos, i, ln = 14, 0, len(payload)
    while i < n:
        if pos >= ln:
            raise ValueError("QOI stream truncated mid-image")
        b0 = payload[pos]
        pos += 1
        if b0 == 0xFE:  # RGB
            if pos + 3 > ln:
                raise ValueError("QOI stream truncated in RGB op")
            prev = (payload[pos], payload[pos + 1], payload[pos + 2],
                    prev[3])
            pos += 3
        elif b0 == 0xFF:  # RGBA
            if pos + 4 > ln:
                raise ValueError("QOI stream truncated in RGBA op")
            prev = (payload[pos], payload[pos + 1], payload[pos + 2],
                    payload[pos + 3])
            pos += 4
        elif b0 >> 6 == 0:  # INDEX
            prev = index[b0]
        elif b0 >> 6 == 1:  # DIFF
            prev = (
                (prev[0] + ((b0 >> 4) & 3) - 2) % 256,
                (prev[1] + ((b0 >> 2) & 3) - 2) % 256,
                (prev[2] + (b0 & 3) - 2) % 256,
                prev[3],
            )
        elif b0 >> 6 == 2:  # LUMA
            if pos >= ln:
                raise ValueError("QOI stream truncated in LUMA op")
            dg = (b0 & 0x3F) - 32
            b1 = payload[pos]
            pos += 1
            prev = (
                (prev[0] + dg + ((b1 >> 4) & 0x0F) - 8) % 256,
                (prev[1] + dg) % 256,
                (prev[2] + dg + (b1 & 0x0F) - 8) % 256,
                prev[3],
            )
        else:  # RUN
            run = (b0 & 0x3F) + 1
            if i + run > n:
                raise ValueError(
                    f"QOI run of {run} overruns the {w}x{h} image"
                )
            out[i : i + run] = prev
            i += run
            index[
                (prev[0] * 3 + prev[1] * 5 + prev[2] * 7
                 + prev[3] * 11) % 64
            ] = prev
            continue
        index[
            (prev[0] * 3 + prev[1] * 5 + prev[2] * 7 + prev[3] * 11)
            % 64
        ] = prev
        out[i] = prev
        i += 1
    if payload[pos : pos + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("QOI end marker missing or malformed")
    img = out.reshape(h, w, 4)
    return img if c == 4 else img[:, :, :3].copy()


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) | (h, w, 1|2|3|4) uint8 → non-interlaced 8-bit PNG bytes.
    Rows are Sub-filtered (type 1): cheap, vectorized, and it makes the
    decoder's unfilter path do real work in the round-trip tests."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = arr.reshape(h, w * c).astype(np.int16)
    sub = raw.copy()
    sub[:, c:] = (raw[:, c:] - raw[:, :-c]) % 256
    scan = np.concatenate(
        [np.full((h, 1), 1, dtype=np.uint8), sub.astype(np.uint8)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass. The seven
# passes PARTITION the pixel grid (test-pinned) — the canonical
# pattern matrix's row 0 is 1 6 4 6 2 6 4 6.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)
# samples per pixel by color type (3 = palette: one index sample)
_PNG_SPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_defilter(scan: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """(rows, 1+stride) filtered scanlines → (rows, stride) uint8.
    All five filters (None/Sub/Up/Average/Paeth); Sub and Up are
    vectorized, Average/Paeth fall back to the spec's per-byte
    recurrence. ``bpp`` is the left-neighbor distance in BYTES
    (1 for sub-byte depths, samples-per-pixel at 8 bits)."""
    nrows = scan.shape[0]
    filters, rows = scan[:, 0], scan[:, 1:].astype(np.int32)
    out = np.zeros((nrows, stride), dtype=np.int32)
    for y in range(nrows):
        f, row = int(filters[y]), rows[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub: cumulative sum per byte lane
            out[y] = (
                np.cumsum(row.reshape(-1, bpp), axis=0).reshape(stride)
                % 256
            )
        elif f == 2:  # Up
            out[y] = (row + prev) % 256
        elif f == 3:  # Average
            for i in range(stride):
                left = out[y, i - bpp] if i >= bpp else 0
                out[y, i] = (row[i] + (left + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            for i in range(stride):
                left = out[y, i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                out[y, i] = (
                    row[i] + _paeth(int(left), int(prev[i]), int(ul))
                ) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8)


def _png_unpack_samples(
    rows: np.ndarray, pw: int, spp: int, depth: int
) -> np.ndarray:
    """De-filtered scanline bytes → (rows, pw*spp) samples — identity
    at 8 bits, big-endian pair packing to uint16 at 16 bits (round
    18), MSB-first bit unpacking below 8."""
    if depth == 8:
        return rows[:, : pw * spp]
    if depth == 16:
        # big-endian byte pairs -> uint16 (round 18)
        pairs = rows[:, : pw * spp * 2].reshape(
            rows.shape[0], pw * spp, 2
        )
        return (pairs[:, :, 0].astype(np.uint16) << 8) | pairs[
            :, :, 1
        ]
    bits = np.unpackbits(rows, axis=1)[:, : pw * spp * depth]
    vals = bits.reshape(rows.shape[0], pw * spp, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2).astype(np.uint8)


@_codec_guard("PNG")
def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8. 8-bit gray/RGB/RGBA plus
    (round 17) PALETTE images (PLTE, optional tRNS alpha, depths
    1/2/4/8 — the ubiquitous web-icon class), low-depth GRAYSCALE
    (1/2/4-bit — scanned bilevel pages), and ADAM7 INTERLACE for all
    of those. All five row filters; 16-bit stays a loud refusal."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = len(_PNG_SIG), [], None
    plte = trns = None
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color not in _PNG_SPP:
                raise NotImplementedError(
                    f"PNG color type {color} unsupported"
                )
            ok_depth = (
                (1, 2, 4, 8, 16)
                if color == 0
                else (1, 2, 4, 8)
                if color == 3
                else (8, 16)
            )
            if depth not in ok_depth:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} unsupported "
                    "(8/16-bit samples; 1/2/4-bit and 16-bit gray, "
                    "1/2/4/8-bit palette)"
                )
            if interlace not in (0, 1):
                raise ValueError(
                    f"PNG interlace method {interlace} invalid"
                )
            if w * h > 50_000_000 or w == 0 or h == 0:
                raise ValueError(
                    f"PNG dimensions implausible: {w}x{h}"
                )
            meta = (w, h, depth, color, interlace)
        elif ctype == b"PLTE":
            if size % 3 or size == 0 or size > 768:
                raise ValueError(f"PNG PLTE size {size} invalid")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = bytes(body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if meta is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, color, interlace = meta
    spp = _PNG_SPP[color]
    if color == 3 and plte is None:
        raise ValueError("palette PNG without a PLTE chunk")

    def pass_stride(pw: int) -> int:
        return (pw * spp * depth + 7) // 8

    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    dims = []
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = max(0, -(-(w - x0) // dx))
        ph = max(0, -(-(h - y0) // dy))
        dims.append((pw, ph))
        if pw and ph:
            expected += ph * (1 + pass_stride(pw))
    # bounded decompression: zlib.decompress with no limit lets a
    # KB-sized payload expand to gigabytes (a classic decompression
    # bomb) before the reshape ever checks the size
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected)
    if d.unconsumed_tail or len(raw) != expected:
        raise ValueError(
            f"PNG pixel data is {len(raw)}{'+' if d.unconsumed_tail else ''} "
            f"bytes, header declares {expected}"
        )
    bpp = max(1, (spp * depth) // 8)
    samples = np.zeros(
        (h, w * spp), np.uint16 if depth == 16 else np.uint8
    )
    off = 0
    for (x0, y0, dx, dy), (pw, ph) in zip(passes, dims):
        if not (pw and ph):
            continue
        stride = pass_stride(pw)
        n = ph * (1 + stride)
        scan = np.frombuffer(
            raw[off : off + n], np.uint8
        ).reshape(ph, 1 + stride)
        off += n
        rows = _png_unpack_samples(
            _png_defilter(scan, stride, bpp), pw, spp, depth
        ).reshape(ph, pw, spp)
        grid = samples.reshape(h, w, spp)
        grid[y0:h:dy, x0:w:dx] = rows
    if color == 3:
        idx = samples.reshape(h, w)
        if int(idx.max()) >= len(plte):
            raise ValueError(
                f"PNG palette index {int(idx.max())} outside the "
                f"{len(plte)}-entry PLTE"
            )
        rgb = plte[idx]
        if trns is None:
            return rgb
        ta = np.frombuffer(trns, np.uint8)
        if len(ta) > len(plte):
            raise ValueError(
                f"PNG tRNS carries {len(ta)} entries but the PLTE has "
                f"only {len(plte)} — spec caps tRNS at palette size"
            )
        alpha = np.full(256, 255, np.uint8)
        alpha[: len(ta)] = ta
        return np.dstack([rgb, alpha[idx]])
    # tRNS on gray/RGB carries a big-endian 16-bit SAMPLE KEY per
    # channel, matched in the RAW (pre-scaling) sample domain; the
    # matching pixels become fully transparent (round-17 review: the
    # chunk used to parse and silently drop)
    akey = None
    if trns is not None and color in (0, 2):
        need = 2 if color == 0 else 6
        if len(trns) < need:
            raise ValueError(
                f"PNG tRNS for color type {color} needs {need} bytes"
            )
        keys = [
            (trns[2 * i] << 8) | trns[2 * i + 1]
            for i in range(need // 2)
        ]
        px = samples.reshape(h, w, spp).astype(np.int32)
        opaque = 65535 if depth == 16 else 255
        akey = np.full((h, w), opaque, samples.dtype)
        match = np.ones((h, w), bool)
        for ci, k in enumerate(keys):
            match &= px[:, :, ci] == k
        akey[match] = 0
    if depth < 8:  # low-depth gray: scale to full 8-bit range
        samples = (
            samples.astype(np.uint16) * (255 // ((1 << depth) - 1))
        ).astype(np.uint8)
    out = samples.reshape(h, w, spp)
    if akey is not None:
        return np.dstack([out, akey])
    return out
