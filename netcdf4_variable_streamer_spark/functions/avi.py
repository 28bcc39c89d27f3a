"""Minimal AVI (RIFF) container with MJPEG video — pure Python +
the in-repo JPEG codec, no external library.

Built from the public RIFF/AVI structure (the same chunk grammar the
WAV codec already parses) so the VIDEO story runs on a real container
with a real codec: MJPEG — each frame is a standalone baseline JPEG —
is what many surveillance/webcam corpora and legacy camera files
actually ship, and it composes directly with :mod:`functions.jpeg`.

- **decode**: RIFF 'AVI ' walk — LIST hdrl (avih main header: dims,
  frame count, validated), LIST movi ('00dc'/'00db' frame chunks,
  even-byte padding), idx1 ignored; every frame decodes through
  ``decode_jpeg`` and must match the declared dims.
- **encode**: spec-shaped writer (avih + one 'vids'/'MJPG' strl with
  BITMAPINFOHEADER + movi + idx1) whose frames are the in-repo JPEG
  encoder's output — a file any standard player recognizes as
  MJPEG-in-AVI.
- **refusals are loud and named**: non-AVI payloads, truncated
  chunks, frame/header disagreements, implausible dimensions.
"""

from __future__ import annotations

import struct

import numpy as np

from netcdf4_variable_streamer_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
)

_MAX_FRAMES = 100_000


def encode_avi_mjpeg(
    frames: np.ndarray, fps: int = 10, quality: int = 75
) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → MJPEG-in-AVI bytes."""
    fr = np.asarray(frames)
    if fr.ndim != 4 or fr.shape[3] != 3 or fr.dtype != np.uint8:
        raise ValueError("encode_avi_mjpeg expects (n, h, w, 3) uint8")
    if not 1 <= fps <= 1_000_000:
        raise ValueError(f"fps {fps} outside 1..1000000")
    n, h, w, _ = fr.shape
    payloads = [
        encode_jpeg(fr[i], quality=quality, subsampling="420")
        for i in range(n)
    ]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # microseconds per frame
        0, 0, 0x10,                # max bytes/s, padding, HASINDEX
        n, 0, 1, 0,                # frames, initial, streams, bufsize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to 'movi' fourcc)
    idx = bytearray()
    off = 4
    for p in payloads:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(p))
        off += 8 + len(p) + (len(p) % 2)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_mjpeg(payload: bytes) -> tuple[np.ndarray, int]:
    """MJPEG-in-AVI bytes → ((n, h, w, 3) uint8 frames, fps)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    dims = None
    n_declared = None
    usec = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int, depth: int = 0):
        nonlocal dims, n_declared, usec
        if depth > 16:
            # legal AVIs nest ~3 LISTs deep; a crafted payload of
            # nested LIST shells otherwise escapes as RecursionError
            # (round-16 review)
            raise ValueError("AVI LIST nesting implausibly deep")
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if body + size > end:
                raise ValueError(
                    f"AVI chunk {cid!r} at byte {pos} truncated"
                )
            if cid == b"LIST":
                walk(body + 4, body + size, depth + 1)
            elif cid == b"avih":
                if size < 56:
                    raise ValueError("AVI main header truncated")
                vals = struct.unpack_from("<14I", payload, body)
                usec = vals[0]
                n_declared = vals[4]
                w, h = vals[8], vals[9]
                if w == 0 or h == 0 or w * h > 50_000_000:
                    raise ValueError(
                        f"AVI dimensions implausible: {w}x{h}"
                    )
                if n_declared > _MAX_FRAMES:
                    raise ValueError(
                        f"AVI declares {n_declared} frames — "
                        "implausible"
                    )
                dims = (h, w)
            elif cid in (b"00dc", b"00db"):
                if dims is None:
                    raise ValueError("AVI frame chunk before header")
                if len(frames) >= _MAX_FRAMES:
                    raise ValueError("AVI frame count implausible")
                img = decode_jpeg(payload[body : body + size])
                if img.ndim != 3 or img.shape[:2] != dims:
                    raise ValueError(
                        f"AVI frame {len(frames)} is "
                        f"{img.shape[1]}x{img.shape[0]}, header "
                        f"declares {dims[1]}x{dims[0]}"
                    )
                frames.append(img)
            pos = body + size + (size & 1)

    walk(12, len(payload))
    if dims is None:
        raise ValueError("AVI carries no avih header")
    if not frames:
        raise ValueError("AVI carries no video frames")
    if n_declared is not None and n_declared != len(frames):
        raise ValueError(
            f"AVI header declares {n_declared} frames, movi carries "
            f"{len(frames)}"
        )
    fps = round(1_000_000 / usec) if usec else 0
    return np.stack(frames), fps
