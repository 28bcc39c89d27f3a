"""FLAC codec, pure Python/NumPy + stdlib — no external audio
library.

Built from the public FLAC format specification (xiph.org / RFC 9639)
with the same discipline as the JPEG/PNG/GIF/QOI/G.711 codecs: FLAC
is the container speech-pretraining corpora actually ship
(LibriSpeech, MLS), and it is LOSSLESS — so unlike JPEG, round-trips
are bit-exact by nature and oracle keys need no fixture tricks.

- **decode**: fLaC marker + metadata blocks (STREAMINFO parsed,
  others skipped), frame headers (sync, block-size/sample-rate codes
  incl. the 8/16-bit escapes, UTF-8-coded frame number, CRC-8
  verified), all four subframe types (CONSTANT, VERBATIM, FIXED
  orders 0-4, LPC orders 1-32 with quantized-coefficient precision
  and shift), wasted-bits, rice-coded residual partitions (4- and
  5-bit parameters, escape-to-raw), stereo decorrelation
  (left/side, right/side, mid/side), frame CRC-16 verified.
- **encode**: 16-bit mono/stereo, fixed blocking, per-block best
  fixed predictor (order 0-2 by residual magnitude), rice parameter
  fit per block, correct CRC-8/CRC-16 and STREAMINFO — a
  spec-conformant stream any standard decoder opens.
- **refusals are loud and named**: non-FLAC payloads, reserved
  codes, CRC mismatches, truncated streams, >2^x allocations from
  corrupt headers.

The bit-serial loops are plain Python (the format's nature); decodes
parallelize across rows behind Arrow-batched ``mapInPandas`` exactly
like the image codecs.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_SAMPLES = 100_000_000  # allocation guard

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TABLE = {
    0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
    6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_TABLE = {0: None, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (
                crc << 1
            ) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader tracking its byte span (for frame CRCs)."""

    __slots__ = ("buf", "pos")  # pos in BITS

    def __init__(self, buf: bytes, bytepos: int = 0):
        self.buf = buf
        self.pos = bytepos * 8

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("FLAC stream truncated mid-field")
        v = 0
        pos = self.pos
        while n:
            byte = self.buf[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            v = (v << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            pos += take
            n -= take
        self.pos = pos
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while True:
            if self.pos >= len(self.buf) * 8:
                raise ValueError("FLAC stream truncated mid-unary")
            if self.read(1):
                return n
            n += 1
            if n > 1 << 20:
                raise ValueError("FLAC unary run implausibly long")

    def align(self):
        self.pos = (self.pos + 7) & ~7

    @property
    def bytepos(self) -> int:
        return self.pos >> 3


def _utf8_coded(bits: _Bits) -> int:
    """The UTF-8-style frame/sample number coding (up to 7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError(f"FLAC coded number lead byte {b0:#x} invalid")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC coded number continuation invalid")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(bits: _Bits, blocksize: int, order: int) -> list:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"FLAC residual method {method} reserved")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError(
            f"FLAC partition order {porder} does not divide block "
            f"size {blocksize}"
        )
    out = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC predictor order exceeds partition")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(n):
                out.append(bits.sread(raw) if raw else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                u = (q << param) | bits.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> list:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if bps <= 0 or bps > 33:
        raise ValueError(f"FLAC effective sample size {bps} invalid")
    if stype == 0:  # CONSTANT
        samples = [bits.sread(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.sread(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype & 0x07
        samples = [bits.sread(bps) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(
                c * samples[-1 - j] for j, c in enumerate(coefs)
            )
            val = pred + r
            if not -(1 << 40) < val < (1 << 40):
                # a crafted stream (valid CRCs, extreme coefficients)
                # can grow predictions geometrically; unbounded they
                # escape as OverflowError at the int64 conversion
                # instead of the named refusal (round-16 review)
                raise ValueError(
                    "FLAC decoded sample magnitude implausible"
                )
            samples.append(val)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 0x1F) + 1
        samples = [bits.sread(bps) for _ in range(order)]
        prec = bits.read(4)
        if prec == 0x0F:
            raise ValueError("FLAC LPC precision code 15 invalid")
        prec += 1
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift invalid")
        coefs = [bits.sread(prec) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            val = (acc >> shift) + r
            if not -(1 << 40) < val < (1 << 40):
                raise ValueError(
                    "FLAC decoded sample magnitude implausible"
                )
            samples.append(val)
    else:
        raise ValueError(f"FLAC subframe type {stype} reserved")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (samples, sample_rate). Samples are int32, shape
    (n,) for mono or (n, channels) otherwise."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        (length,) = struct.unpack(">I", b"\0" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("FLAC metadata block truncated")
        if hdr & 0x7F == 0:  # STREAMINFO
            if length != 34:
                raise ValueError(
                    f"FLAC STREAMINFO must be 34 bytes, got {length}"
                )
            b = _Bits(body)
            b.read(16)  # min block size
            b.read(16)  # max block size
            b.read(24)
            b.read(24)
            rate = b.read(20)
            nch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            info = {
                "rate": rate, "nch": nch, "bps": bps, "total": total
            }
        pos += 4 + length
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC stream carries no STREAMINFO")
    if info["rate"] == 0:
        raise ValueError("FLAC sample rate 0 invalid")
    if info["total"] > _MAX_SAMPLES:
        raise ValueError(
            f"FLAC declares {info['total']} samples — implausible"
        )
    nch = info["nch"]
    channels: list[list[int]] = [[] for _ in range(nch)]
    n_done = 0
    while pos < len(payload):
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(
                f"FLAC frame sync not found at byte {pos}"
            )
        if bits.read(1):
            raise ValueError("FLAC frame reserved bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        sz_code = bits.read(3)
        if bits.read(1):
            raise ValueError("FLAC frame reserved bit set")
        _utf8_coded(bits)
        if bs_code == 0:
            raise ValueError("FLAC block size code 0 reserved")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC sample rate code 15 invalid")
        if sz_code in (3,):
            raise ValueError("FLAC sample size code 3 reserved")
        bps = _SIZE_TABLE.get(sz_code) or info["bps"]
        hdr_end = bits.bytepos
        want_crc8 = bits.read(8)
        got_crc8 = _crc8(payload[frame_start:hdr_end])
        if want_crc8 != got_crc8:
            raise ValueError(
                f"FLAC frame header CRC-8 mismatch "
                f"({want_crc8:#x} != {got_crc8:#x})"
            )
        if n_done + blocksize > _MAX_SAMPLES:
            raise ValueError("FLAC output implausibly large")
        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError(
                    f"FLAC frame channels {ch_code + 1} != "
                    f"STREAMINFO {nch}"
                )
            subs = [
                _read_subframe(bits, blocksize, bps)
                for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError(
                    "FLAC stereo decorrelation in a non-stereo stream"
                )
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _read_subframe(bits, blocksize, bps)
                side = _read_subframe(bits, blocksize, bps + 1)
                right = [ls - s for ls, s in zip(left, side)]
                subs = [left, right]
            elif ch_code == 9:  # right/side
                side = _read_subframe(bits, blocksize, bps + 1)
                right = _read_subframe(bits, blocksize, bps)
                left = [r + s for r, s in zip(right, side)]
                subs = [left, right]
            else:  # mid/side
                mid = _read_subframe(bits, blocksize, bps)
                side = _read_subframe(bits, blocksize, bps + 1)
                subs_l, subs_r = [], []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs_l.append((m + s) >> 1)
                    subs_r.append((m - s) >> 1)
                subs = [subs_l, subs_r]
        else:
            raise ValueError(
                f"FLAC channel assignment {ch_code} reserved"
            )
        bits.align()
        crc_end = bits.bytepos
        want_crc16 = bits.read(16)
        got_crc16 = _crc16(payload[frame_start:crc_end])
        if want_crc16 != got_crc16:
            raise ValueError(
                f"FLAC frame CRC-16 mismatch "
                f"({want_crc16:#x} != {got_crc16:#x})"
            )
        for c in range(nch):
            channels[c].extend(subs[c])
        n_done += blocksize
        pos = bits.bytepos
        if info["total"] and n_done >= info["total"]:
            break
    if info["total"] and n_done > info["total"]:
        # the last block may be padded in exotic writers; ours never
        # does, and silently dropping samples would hide bugs
        raise ValueError(
            f"FLAC frames carry {n_done} samples, STREAMINFO "
            f"declares {info['total']}"
        )
    arr = np.asarray(channels, dtype=np.int64)
    lo, hi = -(1 << (info["bps"] - 1)), (1 << (info["bps"] - 1)) - 1
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise ValueError(
            f"FLAC decoded samples exceed the {info['bps']}-bit range"
        )
    out = arr.astype(np.int32).T
    return (out[:, 0] if nch == 1 else out), info["rate"]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitW:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | v
    return bytes([lead] + out[::-1])


def _rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) / len(resid) + 1
    p = max(0, int(mean).bit_length() - 1)
    return min(p, 14)


def _write_residual(bw: _BitW, resid: list[int]):
    bw.write(0, 2)  # 4-bit rice
    bw.write(0, 4)  # partition order 0
    param = _rice_param(resid)
    bw.write(param, 4)
    for r in resid:
        u = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        q = u >> param
        if q:
            bw.write(0, q)
        bw.write(1, 1)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def encode_flac(
    samples: np.ndarray, sample_rate: int = 16000, block: int = 4096
) -> bytes:
    """1-D (mono) or (n, 2) (stereo) int16 → FLAC bytes. Fixed
    blocking; per block, the best of fixed predictor orders 0-2 by
    residual magnitude; one rice partition per subframe."""
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("encode_flac expects 1-D or (n, 2) int16")
    if samples.ndim == 2 and samples.shape[1] != 2:
        raise ValueError("encode_flac stereo needs exactly 2 channels")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError(
            f"FLAC sample rate {sample_rate} outside the 20-bit range"
        )
    if not 16 <= block <= 65535:
        raise ValueError(
            f"FLAC block size {block} outside 16..65535"
        )
    # frame-header rate coding: 16-bit Hz (code 13) when it fits,
    # 16-bit daHz (code 14) for the high rates (96 kHz etc.)
    if sample_rate <= 0xFFFF:
        rate_code, rate_field = 13, sample_rate
    elif sample_rate % 10 == 0 and sample_rate // 10 <= 0xFFFF:
        rate_code, rate_field = 14, sample_rate // 10
    else:
        raise ValueError(
            f"FLAC sample rate {sample_rate} not representable in a "
            "frame header (needs 16-bit Hz or 16-bit daHz)"
        )
    chans = (
        [samples.astype(np.int64)]
        if samples.ndim == 1
        else [samples[:, 0].astype(np.int64), samples[:, 1].astype(np.int64)]
    )
    n = len(chans[0])
    nch = len(chans)
    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(15, 5)  # 16 bps - 1
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16  # md5 0 = unknown
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    frame_no = 0
    for start in range(0, max(n, 1), block):
        bs = min(block, n - start) if n else 0
        if bs <= 0:
            break
        hdr = _BitW()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocking
        # always the 16-bit explicit block size (code 7)
        hdr.write(7, 4)
        hdr.write(rate_code, 4)
        hdr.write(nch - 1, 4)  # independent channels
        hdr.write(4, 3)  # 16 bps
        hdr.write(0, 1)
        hdr.align()
        hdr_bytes = bytearray(hdr.out)
        hdr_bytes += _utf8_encode(frame_no)
        hdr_bytes += struct.pack(">H", bs - 1)
        hdr_bytes += struct.pack(">H", rate_field)
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))
        fw = _BitW()
        for ch in chans:
            blk = [int(v) for v in ch[start : start + bs]]
            # pick the fixed order 0-2 with the smallest |residual|
            best, best_resid, best_cost = 0, blk, sum(
                abs(v) for v in blk
            )
            for order in (1, 2):
                if bs <= order:
                    break
                coefs = _FIXED_COEFS[order]
                resid = [
                    blk[i]
                    - sum(c * blk[i - 1 - j] for j, c in enumerate(coefs))
                    for i in range(order, bs)
                ]
                cost = sum(abs(r) for r in resid)
                if cost < best_cost:
                    best, best_resid, best_cost = order, resid, cost
            fw.write(0, 1)
            fw.write(8 | best, 6)  # FIXED order
            fw.write(0, 1)  # no wasted bits
            for i in range(best):
                fw.write(blk[i] & 0xFFFF, 16)
            _write_residual(fw, best_resid)
        fw.align()
        frame = bytes(hdr_bytes) + bytes(fw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
