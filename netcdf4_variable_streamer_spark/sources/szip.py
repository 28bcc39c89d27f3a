"""SZIP (HDF5 filter id 4) — extended-Rice entropy codec from the
public CCSDS 121.0-B-2 standard (the algorithm the szip library and
its BSD-licensed successor libaec implement; netcdf-c exposes it as
``nc_def_var_szip``). Original implementation from the spec — no szip
or libaec code is used or linked.

Format implemented (decode AND encode, so round-trip + golden-byte
tests can pin the bitstream without an external library):

- One continuous MSB-first bitstream per HDF5 chunk, prefixed by the
  4-byte little-endian original byte count (H5Zszip.c's framing).
- Samples are n-bit unsigned words (n = ``bits_per_pixel``; signed
  and float data ride as their two's-complement / IEEE bit patterns,
  exactly as the HDF5 filter treats them). ``H5_SZIP_LSB_OPTION``
  means little-endian sample bytes in the raw buffer, MSB big-endian.
- The stream is a sequence of reference sample intervals (szip
  scanlines, ``pixels_per_scanline`` samples) of whole blocks of
  ``pixels_per_block`` samples; the final interval may be short but
  must still be whole blocks (the writer guarantees it; a partial
  block refuses loudly).
- Per block, an ID field of F bits (F = 3 for n <= 8, 4 for n <= 16,
  5 for n <= 32) selects the coding option:
    * ID 0 + one bit 0 — ZERO-BLOCK: a fundamental-sequence codeword
      gives the run of all-zero blocks (FS value m: m <= 3 -> run
      m + 1; m = 4 -> remainder-of-segment, segments being 64 blocks
      from the interval start — the '00001' ROS codeword of the
      standard; m >= 5 -> run m).
    * ID 0 + one bit 1 — SECOND EXTENSION: consecutive sample pairs
      (d0, d1) coded as one FS codeword of
      gamma = (d0 + d1)(d0 + d1 + 1)/2 + d1.
    * ID i in 1..2^F-2 — SAMPLE SPLITTING with k = i - 1 (k = 0 is
      the pure fundamental sequence): the FS codewords of
      (sample >> k) for every sample in the block, then the k low
      bits of each sample, in order.
    * ID 2^F-1 — UNCOMPRESSED: n raw bits per sample.
- With nearest-neighbour preprocessing (``H5_SZIP_NN_OPTION``) the
  first sample of each interval is the REFERENCE, transmitted raw
  (n bits) immediately after the first block's ID field; that block
  then codes J-1 mapped differences. Every other sample is the
  standard CCSDS unit-delay mapped difference: with pred the previous
  sample and theta = min(pred, xmax - pred),
      d in [0, theta]   -> delta = 2d
      d in [-theta, 0)  -> delta = 2|d| - 1
      |d| > theta       -> delta = theta + |d|   (sign implied by the
                           roomier bound, recovered exactly).
  This writer never emits a low-entropy ID (zero-block / second
  extension) in a reference block; the reader refuses one loudly
  rather than guess at a convention it cannot verify without the
  external library (the documented interop caveat).

Scale note: szip decode is inherently bit-serial, so it runs in the
same per-chunk Python stage as the rest of this file's codecs —
chunks decode independently and in parallel across executor tasks,
and the NumPy unpackbits + ones-index FS scan keeps the constant
factor down. Encoding picks the cheapest option per block by exact
bit cost (ties to the smallest ID), which is deterministic — the
distributed two-phase compressed write stays reproducible.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["szip_h5_decode", "szip_h5_encode", "szip_decode", "szip_encode"]

# szlib.h option masks (public constants, mirrored by H5_SZIP_*)
SZ_ALLOW_K13 = 1
SZ_EC_OPTION = 4
SZ_LSB_OPTION = 8
SZ_MSB_OPTION = 16
SZ_NN_OPTION = 32
SZ_RAW_OPTION = 128

_SEGMENT_BLOCKS = 64
_ROS = 4  # FS value of the '00001' remainder-of-segment codeword


def _id_bits(nbits: int) -> int:
    return 3 if nbits <= 8 else 4 if nbits <= 16 else 5


class _BitReader:
    """MSB-first bit reader with an ones-index for O(log) FS scans."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError(
                f"szip stream truncated: {n} bits wanted at bit "
                f"{self.pos} of {len(self.bits)}"
            )
        v = 0
        for b in self.bits[self.pos : self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_fs(self) -> int:
        i = np.searchsorted(self.ones, self.pos)
        if i >= len(self.ones):
            raise ValueError(
                "szip stream truncated inside a fundamental-sequence "
                f"codeword at bit {self.pos}"
            )
        p = int(self.ones[i])
        v = p - self.pos
        self.pos = p + 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_fs(self, v: int) -> None:
        while v >= 32:
            self.write(0, 32)
            v -= 32
        self.write(1, v + 1)  # v zeros then the terminating 1

    def finish(self) -> bytes:
        if self.n:
            self.out.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0
        return bytes(self.out)


def _map_nn(x: list[int], nbits: int) -> tuple[int, list[int]]:
    """Reference sample + CCSDS unit-delay mapped differences."""
    xmax = (1 << nbits) - 1
    deltas = []
    for i in range(1, len(x)):
        pred = x[i - 1]
        d = x[i] - pred
        theta = min(pred, xmax - pred)
        if 0 <= d <= theta:
            deltas.append(2 * d)
        elif -theta <= d < 0:
            deltas.append(-2 * d - 1)
        else:
            deltas.append(theta + abs(d))
    return x[0], deltas


def _unmap_nn(ref: int, deltas: list[int], nbits: int) -> list[int]:
    xmax = (1 << nbits) - 1
    out = [ref]
    pred = ref
    for delta in deltas:
        theta = min(pred, xmax - pred)
        if delta <= 2 * theta:
            d = delta // 2 if delta % 2 == 0 else -((delta + 1) // 2)
        else:
            mag = delta - theta
            d = mag if pred <= xmax - pred else -mag
        pred = pred + d
        if not 0 <= pred <= xmax:
            raise ValueError(
                "szip nearest-neighbour unmap left the sample range "
                f"(got {pred} for {nbits}-bit data) — stream corrupt"
            )
        out.append(pred)
    return out


def _se_pairs(vals: list[int]) -> list[int]:
    gammas = []
    for i in range(0, len(vals), 2):
        t = vals[i] + vals[i + 1]
        gammas.append(t * (t + 1) // 2 + vals[i + 1])
    return gammas


def _se_unpair(gamma: int) -> tuple[int, int]:
    # largest t with t(t+1)/2 <= gamma
    t = int((2 * gamma) ** 0.5)
    while t * (t + 1) // 2 > gamma:
        t -= 1
    while (t + 1) * (t + 2) // 2 <= gamma:
        t += 1
    d1 = gamma - t * (t + 1) // 2
    return t - d1, d1


def _encode_block(
    w: _BitWriter,
    vals: list[int],
    nbits: int,
    F: int,
    allow_low: bool,
    ref: int | None = None,
) -> None:
    """Pick the cheapest option by exact bit cost (ties -> smallest
    ID; low-entropy only when ``allow_low``), then emit ID [+ raw
    reference sample] + payload."""
    uncmp = (1 << F) - 1
    cands: list[tuple[int, int]] = [(F + nbits * len(vals), uncmp)]
    se_gammas = None
    if allow_low and len(vals) % 2 == 0:
        se_gammas = _se_pairs(vals)
        cands.append((F + 1 + sum(se_gammas) + len(se_gammas), 0))
    kmax = min(uncmp - 2, nbits - 1)
    for k in range(kmax + 1):
        cands.append(
            (F + sum(v >> k for v in vals) + (k + 1) * len(vals), k + 1)
        )
    _cost, best_id = min(cands)
    w.write(best_id, F)
    if ref is not None:
        w.write(ref, nbits)
    if best_id == 0:
        w.write(1, 1)  # second-extension selector
        for g in se_gammas:
            w.write_fs(g)
    elif best_id == uncmp:
        for v in vals:
            w.write(v, nbits)
    else:
        k = best_id - 1
        for v in vals:
            w.write_fs(v >> k)
        if k:
            for v in vals:
                w.write(v, k)


def _rsi_layout(m: int, J: int, nn: bool) -> tuple[list[int], list[int]]:
    """(sizes, starts) of each block's CODED values for an interval
    of ``m`` samples (the reference block codes J-1 when ``nn``)."""
    nblocks = m // J
    sizes = [J - 1 if nn else J] + [J] * (nblocks - 1)
    starts = [0]
    for s in sizes[:-1]:
        starts.append(starts[-1] + s)
    return sizes, starts


def _encode_rsi(
    w: _BitWriter, samples: list[int], nbits: int, J: int, nn: bool
) -> None:
    F = _id_bits(nbits)
    if nn:
        ref, seq = _map_nn(samples, nbits)
    else:
        ref, seq = None, samples
    sizes, starts = _rsi_layout(len(samples), J, nn)
    nblocks = len(sizes)
    b = 0
    while b < nblocks:
        vals = seq[starts[b] : starts[b] + sizes[b]]
        is_ref = b == 0 and nn
        if not is_ref and not any(vals):
            # zero run over following all-zero blocks, never across a
            # 64-block segment boundary
            seg_end = min(
                nblocks, (b // _SEGMENT_BLOCKS + 1) * _SEGMENT_BLOCKS
            )
            run = 1
            while b + run < seg_end and not any(
                seq[starts[b + run] : starts[b + run] + sizes[b + run]]
            ):
                run += 1
            w.write(0, F)
            w.write(0, 1)  # zero-block selector
            if b + run == seg_end and run >= 5:
                w.write_fs(_ROS)
            else:
                w.write_fs(run - 1 if run <= 4 else run)
            b += run
            continue
        _encode_block(
            w, vals, nbits, F,
            allow_low=not is_ref,
            ref=ref if is_ref else None,
        )
        b += 1


def _decode_rsi(
    r: _BitReader, m: int, nbits: int, J: int, nn: bool
) -> list[int]:
    F = _id_bits(nbits)
    uncmp = (1 << F) - 1
    sizes, _starts = _rsi_layout(m, J, nn)
    nblocks = len(sizes)
    ref = None
    seq: list[int] = []
    b = 0
    while b < nblocks:
        bid = r.read(F)
        is_ref = b == 0 and nn
        if is_ref:
            if bid == 0:
                raise ValueError(
                    "szip: low-entropy option ID in a reference block "
                    "— this writer never emits it and the pairing "
                    "convention is ambiguous without the szip library"
                )
            ref = r.read(nbits)
        take = sizes[b]
        if bid == 0:
            if r.read(1):  # second extension
                vals: list[int] = []
                while len(vals) < take:
                    d0, d1 = _se_unpair(r.read_fs())
                    vals.extend((d0, d1))
                if len(vals) != take:
                    raise ValueError(
                        "szip: second-extension block decoded "
                        f"{len(vals)} samples where {take} fit"
                    )
                seq.extend(vals)
                b += 1
            else:  # zero-block run
                fsv = r.read_fs()
                seg_end = min(
                    nblocks,
                    (b // _SEGMENT_BLOCKS + 1) * _SEGMENT_BLOCKS,
                )
                if fsv <= 3:
                    run = fsv + 1
                elif fsv == _ROS:
                    run = seg_end - b
                else:
                    run = fsv
                if b + run > nblocks:
                    raise ValueError(
                        f"szip: zero-block run of {run} overruns the "
                        f"interval at block {b}/{nblocks}"
                    )
                seq.extend([0] * sum(sizes[b : b + run]))
                b += run
        elif bid == uncmp:
            seq.extend(r.read(nbits) for _ in range(take))
            b += 1
        else:
            k = bid - 1
            hi = [r.read_fs() for _ in range(take)]
            if k:
                seq.extend(
                    (h << k) | r.read(k) for h in hi
                )
            else:
                seq.extend(hi)
            b += 1
    return _unmap_nn(ref, seq, nbits) if nn else seq


def _validate(nbits: int, J: int, pps: int) -> None:
    if nbits not in (8, 16, 32):
        raise ValueError(
            f"szip: bits_per_pixel {nbits} unsupported (8/16/32 — "
            "the widths the HDF5 szip filter maps whole sample types "
            "to)"
        )
    if J < 2 or J > 32 or J % 2:
        raise ValueError(
            f"szip: pixels_per_block {J} out of range (even, 2..32)"
        )
    if pps < J or pps % J or pps // J > 128:
        raise ValueError(
            f"szip: pixels_per_scanline {pps} invalid for block size "
            f"{J} (must be a multiple, at most 128 blocks)"
        )


def szip_encode(
    samples: np.ndarray,
    *,
    nbits: int,
    pixels_per_block: int,
    pixels_per_scanline: int,
    nn: bool = True,
) -> bytes:
    """Encode a 1-D unsigned sample array to a CCSDS 121.0 bitstream
    (no HDF5 framing — see :func:`szip_h5_encode` for the filter)."""
    _validate(nbits, pixels_per_block, pixels_per_scanline)
    n = len(samples)
    if n % pixels_per_block:
        raise ValueError(
            f"szip: {n} samples is not whole {pixels_per_block}-"
            "sample blocks — the HDF5 filter always sees full chunks, "
            "so this writer refuses instead of guessing a padding rule"
        )
    ints = [int(v) for v in np.asarray(samples).reshape(-1)]
    w = _BitWriter()
    for off in range(0, n, pixels_per_scanline):
        _encode_rsi(
            w,
            ints[off : off + pixels_per_scanline],
            nbits,
            pixels_per_block,
            nn,
        )
    return w.finish()


def szip_decode(
    stream: bytes,
    n_samples: int,
    *,
    nbits: int,
    pixels_per_block: int,
    pixels_per_scanline: int,
    nn: bool = True,
) -> list[int]:
    """Decode ``n_samples`` unsigned samples from a CCSDS 121.0
    bitstream (inverse of :func:`szip_encode`)."""
    _validate(nbits, pixels_per_block, pixels_per_scanline)
    if n_samples % pixels_per_block:
        raise ValueError(
            f"szip: {n_samples} samples is not whole "
            f"{pixels_per_block}-sample blocks"
        )
    r = _BitReader(stream)
    out: list[int] = []
    remaining = n_samples
    while remaining:
        m = min(remaining, pixels_per_scanline)
        out.extend(_decode_rsi(r, m, nbits, pixels_per_block, nn))
        remaining -= m
    return out


def _sample_dtype(mask: int, nbits: int) -> np.dtype:
    order = ">" if mask & SZ_MSB_OPTION else "<"
    return np.dtype(f"{order}u{nbits // 8}")


def szip_h5_encode(raw: bytes, cd_values) -> bytes:
    """The HDF5 filter-4 encode direction: ``cd_values`` is the
    pipeline message's client data [options_mask, bits_per_pixel,
    pixels_per_block, pixels_per_scanline] (H5Zszip.c's layout); the
    output is the 4-byte LE original size + the bitstream."""
    mask, nbits, ppb, pps = (int(v) for v in cd_values[:4])
    samples = np.frombuffer(raw, dtype=_sample_dtype(mask, nbits))
    stream = szip_encode(
        samples,
        nbits=nbits,
        pixels_per_block=ppb,
        pixels_per_scanline=pps,
        nn=bool(mask & SZ_NN_OPTION),
    )
    return struct.pack("<I", len(raw)) + stream


def szip_h5_decode(payload: bytes, cd_values) -> bytes:
    """The HDF5 filter-4 decode direction (what ``_decode_chunk``
    calls): strip the 4-byte LE stored size, decode, and re-emit the
    samples in the byte order the options mask names."""
    if len(payload) < 4:
        raise ValueError(
            f"szip: {len(payload)}-byte chunk payload cannot hold the "
            "4-byte stored-size prefix"
        )
    mask, nbits, ppb, pps = (int(v) for v in cd_values[:4])
    if mask & SZ_RAW_OPTION:
        raise ValueError(
            "szip: raw-option stream (entropy coding bypassed) — "
            "never produced by this writer"
        )
    nbytes = struct.unpack_from("<I", payload, 0)[0]
    dt = _sample_dtype(mask, nbits)
    if nbytes % dt.itemsize:
        raise ValueError(
            f"szip: stored size {nbytes} is not whole "
            f"{dt.itemsize}-byte samples"
        )
    vals = szip_decode(
        bytes(payload[4:]),
        nbytes // dt.itemsize,
        nbits=nbits,
        pixels_per_block=ppb,
        pixels_per_scanline=pps,
        nn=bool(mask & SZ_NN_OPTION),
    )
    return np.asarray(vals, dtype="u8").astype(dt).tobytes()
