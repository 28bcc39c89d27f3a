"""JFIF (JPEG) codec — baseline AND progressive — pure NumPy +
stdlib, no external imaging library.

Built from the public ITU-T T.81 spec (the JPEG standard) and the JFIF
container note, with the same discipline as the PNG/GIF/QOI/G.711
codecs in :mod:`functions.multimodal`:

- **decode**: baseline sequential DCT (SOF0, and SOF1 when 8-bit) AND
  progressive DCT (SOF2, round 16) — marker parse (DQT 8/16-bit
  precision, DHT, DRI, APPn/COM skip), canonical Huffman entropy
  decode with byte-stuffing removal and restart-marker segmentation;
  for progressive frames, multi-scan coefficient accumulation with
  all four T.81 G.2 modes (DC/AC x first/refinement: spectral
  selection bands, EOB runs, successive-approximation correction
  bits, interleaved DC + non-interleaved AC geometry); then
  dequantize, inverse zigzag, vectorized 8x8 IDCT (orthonormal DCT-II
  basis matrix, einsum over all blocks), chroma upsampling for
  4:4:4 / 4:2:2 / 4:2:0, BT.601 YCbCr→RGB. Grayscale (1 component)
  and YCbCr (3 components).
- **encode**: grayscale or RGB at 4:4:4 / 4:2:0, Annex K quantization
  tables with the classic libjpeg-style quality scaling, Annex K
  Huffman tables, interleaved MCU scan, byte stuffing — a
  spec-conformant stream any standard decoder opens. With
  ``progressive=True``, a 4-phase SOF2 scan script (DC first at Al=1,
  per-component AC first, DC/AC refinement) that re-codes the same
  quantized coefficients losslessly — progressive output decodes
  pixel-identical to the baseline stream (test-pinned).
- **refusals are loud and named**: arithmetic coding, lossless,
  hierarchical, 12-bit precision, >2x2 sampling factors, illegal
  progressive scan headers, truncated streams, Huffman codes past
  the table, coefficient index overruns. Dimension/allocation guards
  fire before any large allocation (same posture as the GIF/PNG
  guards).

The per-symbol entropy loops are plain Python over small ints — the
format's sequential nature; decodes parallelize across rows/batches
behind Arrow-batched ``mapInPandas`` exactly like the other codecs,
so the engine hot path stays JVM/Arrow-side.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables (ITU-T T.81 Annex K — the spec's example tables,
# which are what virtually every baseline encoder ships).
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Natural (row-major) index of each zigzag position, generated
    rather than transcribed so a typo cannot corrupt the scan order."""
    out = []
    for s in range(15):
        pts = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            pts = pts[::-1]
        out += [r * 8 + c for r, c in pts]
    return np.asarray(out, dtype=np.int64)


ZIGZAG = _zigzag()
_UNZIGZAG = np.argsort(ZIGZAG)

# K.1 / K.2 quantization tables, natural order.
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# K.3–K.6 Huffman specs: (BITS counts for code lengths 1..16, HUFFVAL).
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal DCT-II basis: coeff = C @ (block-128) @ C.T, block =
# C.T @ coeff @ C. A matrix product keeps the whole transform
# vectorized over every block at once.
_k = np.arange(8)[:, None].astype(np.float64)
_n = np.arange(8)[None, :].astype(np.float64)
_DCT_C = np.sqrt(np.where(_k == 0, 1.0, 2.0) / 8.0) * np.cos(
    (2 * _n + 1) * _k * np.pi / 16.0
)

_MAX_PIXELS = 50_000_000  # same canvas guard as the GIF codec


def _canonical_codes(bits, huffval):
    """(BITS, HUFFVAL) → list of (length, code, symbol) in canonical
    order (T.81 Annex C code assignment)."""
    if sum(bits) != len(huffval):
        raise ValueError(
            f"JPEG Huffman table declares {sum(bits)} codes but "
            f"carries {len(huffval)} symbols"
        )
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError(
                    "JPEG Huffman table overflows its code space"
                )
            out.append((length, code, huffval[i]))
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits, huffval) -> dict:
    """Decoder lookup: (length, code) → symbol."""
    return {
        (length, code): sym
        for length, code, sym in _canonical_codes(bits, huffval)
    }


def _encode_table(bits, huffval) -> dict:
    """Encoder lookup: symbol → (code, length)."""
    return {
        sym: (code, length)
        for length, code, sym in _canonical_codes(bits, huffval)
    }


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over one destuffed entropy segment."""

    __slots__ = ("buf", "pos", "acc", "n")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, count: int) -> int:
        while self.n < count:
            if self.pos >= len(self.buf):
                raise ValueError(
                    "JPEG entropy-coded segment truncated mid-block"
                )
            self.acc = (self.acc << 8) | self.buf[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= count
        val = (self.acc >> self.n) & ((1 << count) - 1)
        # trim consumed bits: an ever-growing accumulator makes the
        # per-byte shift O(scan length) — quadratic on large scans
        self.acc &= (1 << self.n) - 1
        return val

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError(
            "JPEG Huffman code not in table after 16 bits"
        )


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, count: int):
        self.acc = (self.acc << count) | (val & ((1 << count) - 1))
        self.n += count
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to the signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit length of |v| (0 for 0) — the DC/AC magnitude category."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _need(seg: bytes, n: int, what: str):
    """Refuse (by name) a marker segment shorter than its own
    declared structure — corrupt length bytes must surface as the
    codec's ValueError, not IndexError/struct.error."""
    if len(seg) < n:
        raise ValueError(
            f"JPEG {what} segment truncated ({len(seg)} of {n} bytes)"
        )


def _split_scan(payload: bytes, pos: int):
    """Walk entropy-coded data from ``pos``: remove byte stuffing,
    split at restart markers. Returns (segments, pos_after_marker)
    where the terminating marker is left for the caller loop."""
    segs = [bytearray()]
    while True:
        if pos >= len(payload):
            raise ValueError("JPEG scan not terminated by a marker")
        b = payload[pos]
        if b != 0xFF:
            segs[-1].append(b)
            pos += 1
            continue
        if pos + 1 >= len(payload):
            raise ValueError("JPEG scan truncated at 0xFF")
        m = payload[pos + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytearray())
            pos += 2
        else:
            return [bytes(s) for s in segs], pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JFIF bytes → (h, w) uint8 grayscale or
    (h, w, 3) uint8 RGB. See the module docstring for the supported
    envelope; everything outside it refuses by name."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → table
    frame = None
    restart_interval = 0
    stores: dict[int, np.ndarray] = {}  # comp id → (by, bx, 64) zz coefs
    n_scans = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(
                f"JPEG marker expected at byte {pos}, got "
                f"0x{payload[pos]:02x}"
            )
        # T.81 B.1.1.2: markers may be preceded by any number of
        # 0xFF fill bytes — skip padding before reading the code
        # (code-review finding: real encoder output using fill-byte
        # padding mis-parsed the pad as a segment length)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1] if pos + 1 < len(payload) else None
        if marker is None:
            raise ValueError("JPEG stream truncated at 0xFF")
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless markers
        if pos + 2 > len(payload):
            raise ValueError("JPEG segment length truncated")
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        if seg_len < 2 or pos + seg_len > len(payload):
            raise ValueError(
                f"JPEG segment at byte {pos - 2} declares {seg_len} "
                "bytes past the payload end"
            )
        seg = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    _need(seg, p + 64, "DQT")
                    vals = np.frombuffer(
                        seg, np.uint8, 64, p
                    ).astype(np.int32)
                    p += 64
                elif pq == 1:
                    _need(seg, p + 128, "DQT")
                    vals = np.frombuffer(
                        seg, ">u2", 64, p
                    ).astype(np.int32)
                    p += 128
                else:
                    raise ValueError(f"JPEG DQT precision {pq} invalid")
                table = np.empty(64, np.int32)
                table[ZIGZAG] = vals  # stored in zigzag order
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                _need(seg, p + 16, "DHT")
                bits = list(seg[p : p + 16])
                p += 16
                nv = sum(bits)
                _need(seg, p + nv, "DHT")
                huffval = list(seg[p : p + nv])
                p += nv
                if tc > 1:
                    raise ValueError(f"JPEG DHT class {tc} invalid")
                huff[(tc, th)] = _decode_table(bits, huffval)
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            _need(seg, 6, "SOF")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG unsupported (8-bit only)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG unsupported (grayscale or "
                    "YCbCr only)"
                )
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                raise ValueError(f"JPEG dimensions implausible: {w}x{h}")
            comps = []
            _need(seg, 6 + 3 * nc, "SOF")
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {hi}x{vi} unsupported "
                        "(1x1..2x2 only)"
                    )
                if nc == 1 and (hi, vi) != (1, 1):
                    # a single-component scan is non-interleaved per
                    # T.81 (data units in plain block-row order, no
                    # MCU grouping) — the interleaved walk below would
                    # silently mis-order blocks, so refuse by name
                    raise NotImplementedError(
                        "grayscale JPEG with sampling factor "
                        f"{hi}x{vi} unsupported (1x1 only)"
                    )
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            frame["mcux"], frame["mcuy"] = mcux, mcuy
            for c in comps:
                stores[c["id"]] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} unsupported "
                "(baseline sequential only)"
            )
        elif marker == 0xDD:  # DRI
            _need(seg, 2, "DRI")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            _need(seg, 1, "SOS")
            ns = seg[0]
            _need(seg, 4 + 2 * ns, "SOS")
            sel = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                sel.append((cs, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al_ = ahal >> 4, ahal & 0x0F
            by_id = {c["id"]: c for c in frame["comps"]}
            scomps = []
            for cs, td, ta in sel:
                if cs not in by_id:
                    raise ValueError(
                        f"JPEG SOS names unknown component {cs}"
                    )
                scomps.append({**by_id[cs], "td": td, "ta": ta})
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise NotImplementedError(
                        "JPEG non-interleaved sequential scans "
                        "unsupported (single interleaved scan only)"
                    )
                if (ss, se, ahal) != (0, 63, 0):
                    raise ValueError(
                        "JPEG sequential scan header must be 0/63/0, "
                        f"got {ss}/{se}/{ahal}"
                    )
            else:
                if ss == 0:
                    if se != 0:
                        raise ValueError(
                            "JPEG progressive DC scan must have Se=0 "
                            f"(a {ss}..{se} band is not legal in a "
                            "progressive frame)"
                        )
                else:
                    if ns != 1:
                        raise ValueError(
                            "JPEG progressive AC scans must be "
                            f"single-component (got {ns})"
                        )
                    if not ss <= se <= 63:
                        raise ValueError(
                            f"JPEG spectral band {ss}..{se} invalid"
                        )
                if al_ > 13 or (ah != 0 and ah != al_ + 1):
                    raise ValueError(
                        f"JPEG successive approximation Ah={ah} "
                        f"Al={al_} invalid"
                    )
            segs, pos = _split_scan(payload, pos)
            _decode_scan_into(
                frame, scomps, ss, se, ah, al_, segs, huff,
                restart_interval, stores,
            )
            n_scans += 1
        # else: APPn / COM / DNL — skipped
    if frame is None or n_scans == 0:
        raise ValueError("JPEG stream carries no SOF/SOS")
    return _reconstruct(frame, qt, stores)


def _decode_scan_into(
    frame, scomps, ss, se, ah, al, segs, huff, restart_interval, stores
):
    """Entropy-decode ONE scan into the per-component coefficient
    stores (zigzag order). Handles all five modes: sequential full
    blocks, progressive DC/AC x first/refinement — the T.81 G.2
    algorithms (EOB runs, successive-approximation correction bits).
    Plain-Python Huffman walk; everything downstream is vectorized."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    interleaved = len(scomps) > 1
    full = not frame["progressive"]
    if interleaved or full:
        units = mcux * mcuy
    else:
        # non-interleaved geometry (T.81 A.2.2): blocks tile the
        # COMPONENT's own pixel dims, no MCU grouping
        c0 = scomps[0]
        comp_w = -(-(w * c0["h"]) // hmax)
        comp_h = -(-(h * c0["v"]) // vmax)
        cbw = -(-comp_w // 8)
        cbh = -(-comp_h // 8)
        units = cbw * cbh
    if restart_interval:
        expect = -(-units // restart_interval)
        if len(segs) != expect:
            raise ValueError(
                f"JPEG restart interval {restart_interval} implies "
                f"{expect} entropy segments, found {len(segs)}"
            )
    elif len(segs) != 1:
        raise ValueError(
            "JPEG restart markers present but no DRI interval set"
        )
    need_dc = ss == 0 and ah == 0
    need_ac = full or ss > 0
    for c in scomps:
        if need_dc and (0, c["td"]) not in huff:
            raise ValueError(
                f"JPEG DC Huffman table {c['td']} undefined"
            )
        if need_ac and (1, c["ta"]) not in huff:
            raise ValueError(
                f"JPEG AC Huffman table {c['ta']} undefined"
            )
    pred = {c["id"]: 0 for c in scomps}
    eobrun = 0
    reader = _BitReader(segs[0])
    seg_i = 0

    def block_full(c, coef):
        nonlocal pred
        dc_t = huff[(0, c["td"])]
        ac_t = huff[(1, c["ta"])]
        t = reader.read_symbol(dc_t)
        if t > 11:
            raise ValueError(f"JPEG DC category {t} invalid")
        diff = _extend(reader.bits(t), t) if t else 0
        pred[c["id"]] += diff
        coef[0] = pred[c["id"]]
        k = 1
        while k < 64:
            rs = reader.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run overflows the block")
            coef[k] = _extend(reader.bits(s), s)
            k += 1

    def block_dc_first(c, coef):
        t = reader.read_symbol(huff[(0, c["td"])])
        if t > 11:
            raise ValueError(f"JPEG DC category {t} invalid")
        diff = _extend(reader.bits(t), t) if t else 0
        pred[c["id"]] += diff
        coef[0] = pred[c["id"]] << al

    def block_dc_refine(c, coef):
        if reader.bits(1):
            coef[0] |= 1 << al

    def block_ac_first(c, coef):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        ac_t = huff[(1, c["ta"])]
        k = ss
        while k <= se:
            rs = reader.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.bits(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC run overflows the band")
            coef[k] = _extend(reader.bits(s), s) << al
            k += 1

    def block_ac_refine(c, coef):
        # T.81 G.2 / the classic successive-approximation refinement:
        # existing nonzero coefficients consume one correction bit
        # each; zero-history runs position newly-significant ±1<<Al
        # values; EOB runs cover whole blocks (whose nonzero history
        # still consumes correction bits)
        nonlocal eobrun
        p1, m1 = 1 << al, -(1 << al)
        ac_t = huff[(1, c["ta"])]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.read_symbol(ac_t)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.bits(r)
                        break
                    s_val = 0  # ZRL: 16 zero-history positions
                elif s == 1:
                    s_val = p1 if reader.bits(1) else m1
                else:
                    raise ValueError(
                        "JPEG AC refinement magnitude must be 1"
                    )
                while k <= se:
                    cv = int(coef[k])
                    if cv != 0:
                        if reader.bits(1) and (cv & p1) == 0:
                            coef[k] = cv + (p1 if cv > 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s_val and k <= se:
                    coef[k] = s_val
                k += 1
        if eobrun > 0:
            while k <= se:
                cv = int(coef[k])
                if cv != 0 and reader.bits(1) and (cv & p1) == 0:
                    coef[k] = cv + (p1 if cv > 0 else m1)
                k += 1
            eobrun -= 1

    if full:
        block_fn = block_full
    elif ss == 0:
        block_fn = block_dc_first if ah == 0 else block_dc_refine
    else:
        block_fn = block_ac_first if ah == 0 else block_ac_refine

    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            seg_i += 1
            reader = _BitReader(segs[seg_i])
            pred = {c["id"]: 0 for c in scomps}
            eobrun = 0
        if interleaved or full:
            my, mx = divmod(u, mcux)
            for c in scomps:
                st = stores[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block_fn(
                            c, st[my * c["v"] + by, mx * c["h"] + bx]
                        )
        else:
            by, bx = divmod(u, cbw)
            block_fn(scomps[0], stores[scomps[0]["id"]][by, bx])


def _reconstruct(frame, qt, stores):
    """Dequantize, inverse-zigzag, IDCT, upsample and color-convert
    the accumulated coefficient stores into the final image."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    planes = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise ValueError(f"JPEG quant table {c['tq']} undefined")
        blocks = stores[c["id"]]
        by, bx, _ = blocks.shape
        deq = (blocks * qt[c["tq"]][None, None, ZIGZAG]).astype(
            np.float64
        )
        blocks8 = np.zeros((by, bx, 64))
        blocks8[:, :, ZIGZAG] = deq  # inverse zigzag
        blocks8 = blocks8.reshape(by, bx, 8, 8)
        spatial = np.einsum(
            "ki,abkl,lj->abij", _DCT_C, blocks8, _DCT_C
        )
        plane = (
            spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
            + 128.0
        )
        # component resolution → full resolution (integer factors by
        # the 1..2 sampling constraint), then crop to the frame
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Classic libjpeg-style quality scaling of an Annex K table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality {quality} outside 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, coef_zz, pred, dc_t, ac_t):
    """Huffman-encode one quantized, zigzag-ordered block."""
    diff = int(coef_zz[0]) - pred
    t = _category(diff)
    code, length = dc_t[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(coef_zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_t[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_t[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_t[0x00]  # EOB
        bw.write(code, length)
    return int(coef_zz[0])


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Float plane (already level-shiftable 0..255, padded to 8-mult)
    → (by, bx, 64) quantized zigzag coefficient blocks."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        - 128.0
    )
    coefs = np.einsum("ik,abkl,jl->abij", _DCT_C, blocks, _DCT_C)
    flat = coefs.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]
    return np.round(flat / q[None, None, ZIGZAG]).astype(np.int32)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — the padding that
    minimizes block-boundary ringing, as real encoders do."""
    h, w = plane.shape
    return np.pad(
        plane,
        ((0, -h % mh), (0, -w % mw)),
        mode="edge",
    )


# Simple flat canonical tables for progressive scans: the Annex K AC
# tables carry no EOBn symbols (r >= 1) — progressive encoders ship
# their own tables, so ours do too: 12 DC categories at 4 bits, all
# 256 AC symbols at 9–10 bits (a DHT BITS count is one byte, so 255
# codes sit at length 9 and the last at 10; prefix-free by
# construction; size over speed is irrelevant for correctness).
HUFF_DC_FLAT = ([0, 0, 0, 12] + [0] * 12, list(range(12)))
HUFF_AC_FLAT = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 75,
    subsampling: str = "420",
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB → JFIF bytes.
    Baseline (Annex K tables, quality-scaled quantization; color
    streams are 4:2:0 by default or 4:4:4 with ``subsampling='444'``)
    or, with ``progressive=True``, a progressive (SOF2) stream whose
    scan script exercises every T.81 progressive mode: interleaved DC
    first at Al=1, per-component full-band AC first at Al=1
    (spectral selection + EOB runs), then DC and AC refinement scans
    (successive approximation, correction bits, buffered-bit EOB
    runs). ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that-many MCUs (baseline / interleaved scans) or
    blocks (non-interleaved progressive AC scans) — the resync
    markers real camera JPEGs carry."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects (h, w[, 3]) uint8")
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise ValueError("encode_jpeg expects 3 channels for color")
    if subsampling not in ("420", "422", "444"):
        raise ValueError(
            f"subsampling {subsampling!r} not in 420/422/444"
        )
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg got an empty image")
    q_lum = _quality_scale(QT_LUM, quality)
    q_chr = _quality_scale(QT_CHROM, quality)
    dc_l, ac_l = _encode_table(*HUFF_DC_LUM), _encode_table(*HUFF_AC_LUM)
    dc_c, ac_c = (
        _encode_table(*HUFF_DC_CHROM),
        _encode_table(*HUFF_AC_CHROM),
    )
    if color:
        rgb = arr.astype(np.float64)
        y = (
            0.299 * rgb[:, :, 0]
            + 0.587 * rgb[:, :, 1]
            + 0.114 * rgb[:, :, 2]
        )
        cb = (
            -0.168736 * rgb[:, :, 0]
            - 0.331264 * rgb[:, :, 1]
            + 0.5 * rgb[:, :, 2]
            + 128.0
        )
        cr = (
            0.5 * rgb[:, :, 0]
            - 0.418688 * rgb[:, :, 1]
            - 0.081312 * rgb[:, :, 2]
            + 128.0
        )
        if subsampling == "420":
            sy, sc = (2, 2), (1, 1)
            y = _pad_edge(y, 16, 16)
            cb = _pad_edge(cb, 16, 16)
            cr = _pad_edge(cr, 16, 16)
            # 2x2 box-filter chroma downsample
            cb = cb.reshape(
                cb.shape[0] // 2, 2, cb.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            cr = cr.reshape(
                cr.shape[0] // 2, 2, cr.shape[1] // 2, 2
            ).mean(axis=(1, 3))
        elif subsampling == "422":
            sy, sc = (2, 1), (1, 1)
            y = _pad_edge(y, 8, 16)
            cb = _pad_edge(cb, 8, 16)
            cr = _pad_edge(cr, 8, 16)
            # horizontal-only 1x2 box-filter chroma downsample
            cb = cb.reshape(
                cb.shape[0], cb.shape[1] // 2, 2
            ).mean(axis=2)
            cr = cr.reshape(
                cr.shape[0], cr.shape[1] // 2, 2
            ).mean(axis=2)
        else:
            sy, sc = (1, 1), (1, 1)
            y = _pad_edge(y, 8, 8)
            cb = _pad_edge(cb, 8, 8)
            cr = _pad_edge(cr, 8, 8)
        comps = [
            (1, sy, 0, _plane_blocks(y, q_lum), dc_l, ac_l),
            (2, sc, 1, _plane_blocks(cb, q_chr), dc_c, ac_c),
            (3, sc, 1, _plane_blocks(cr, q_chr), dc_c, ac_c),
        ]
    else:
        plane = _pad_edge(arr.astype(np.float64), 8, 8)
        comps = [(1, (1, 1), 0, _plane_blocks(plane, q_lum), dc_l, ac_l)]
    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(  # APP0 / JFIF 1.01
        ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
    )
    for tq, q in ((0, q_lum), (1, q_chr)) if color else ((0, q_lum),):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(v) for v in q[ZIGZAG])
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof_marker + struct.pack(
        ">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps)
    )
    for cid, (hi, vi), tq, _, _, _ in comps:
        out += bytes([cid, (hi << 4) | vi, tq])
    if progressive:
        huff_specs = [(0, 0, HUFF_DC_FLAT), (1, 0, HUFF_AC_FLAT)]
    else:
        huff_specs = [(0, 0, HUFF_DC_LUM), (1, 0, HUFF_AC_LUM)]
        if color:
            huff_specs += [
                (0, 1, HUFF_DC_CHROM),
                (1, 1, HUFF_AC_CHROM),
            ]
    for tc, th, (bits, huffval) in huff_specs:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(huffval), (tc << 4) | th
        )
        out += bytes(bits) + bytes(huffval)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        _emit_progressive_scans(
            out, comps, h, w, hmax, vmax, restart_interval
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, tq, _, _, _ in comps:
        out += bytes([cid, (tq << 4) | tq])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.out + bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            bw = _BitWriter()
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcux)
        for cid, (hi, vi), _, blocks, dc_t, ac_t in comps:
            for by in range(vi):
                for bx in range(hi):
                    pred[cid] = _encode_block(
                        bw,
                        blocks[my * vi + by, mx * hi + bx],
                        pred[cid],
                        dc_t,
                        ac_t,
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive scan emission (encoder side of the T.81 G.2 modes)
# ---------------------------------------------------------------------------

_PROG_AL = 1  # successive-approximation point transform of the first pass


def _sos_header(comps_sel, ss, se, ah, al) -> bytes:
    hdr = b"\xff\xda" + struct.pack(
        ">HB", 6 + 2 * len(comps_sel), len(comps_sel)
    )
    for cid, td, ta in comps_sel:
        hdr += bytes([cid, (td << 4) | ta])
    return hdr + bytes([ss, se, (ah << 4) | al])


class _ScanWriter:
    """A `_BitWriter` that byte-aligns and emits RSTn markers every
    ``ri`` units — the shared restart machinery of every scan type."""

    __slots__ = ("out", "bw", "ri", "rst", "on_restart")

    def __init__(self, out: bytearray, ri: int, on_restart=None):
        self.out = out
        self.bw = _BitWriter()
        self.ri = ri
        self.rst = 0
        self.on_restart = on_restart

    def unit_boundary(self, u: int):
        if self.ri and u and u % self.ri == 0:
            if self.on_restart is not None:
                self.on_restart()
            self.bw.flush()
            self.out += self.bw.out
            self.out += bytes([0xFF, 0xD0 + self.rst % 8])
            self.rst += 1
            self.bw = _BitWriter()

    def write(self, val: int, count: int):
        self.bw.write(val, count)

    def close(self):
        self.bw.flush()
        self.out += self.bw.out


def _emit_progressive_scans(out, comps, h, w, hmax, vmax, ri=0):
    """The four-phase scan script: DC first (interleaved, Al=1),
    per-component AC first (1..63, Al=1), DC refine, per-component
    AC refine — every progressive decode mode round-trips. ``ri``
    inserts RSTn markers every ri MCUs (DC scans) / blocks (AC
    scans)."""
    dc_t = _encode_table(*HUFF_DC_FLAT)
    ac_t = _encode_table(*HUFF_AC_FLAT)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    AL = _PROG_AL

    def comp_grid(hi, vi):
        return (
            -(-(-(-h * vi // vmax)) // 8),
            -(-(-(-w * hi // hmax)) // 8),
        )

    # scan 1: DC first, interleaved, Ah=0 Al=AL
    out += _sos_header([(cid, 0, 0) for cid, *_ in comps], 0, 0, 0, AL)
    pred = {cid: 0 for cid, *_ in comps}
    sw = _ScanWriter(
        out, ri, lambda: pred.update({cid: 0 for cid, *_ in comps})
    )
    for mcu in range(mcux * mcuy):
        sw.unit_boundary(mcu)
        my, mx = divmod(mcu, mcux)
        for cid, (hi, vi), _, blocks, _, _ in comps:
            for by in range(vi):
                for bx in range(hi):
                    v = int(blocks[my * vi + by, mx * hi + bx][0]) >> AL
                    diff = v - pred[cid]
                    pred[cid] = v
                    t = _category(diff)
                    code, length = dc_t[t]
                    sw.write(code, length)
                    if t:
                        sw.write(
                            diff if diff >= 0 else diff + (1 << t) - 1,
                            t,
                        )
    sw.close()
    # scans 2..: AC first per component, band 1..63, Ah=0 Al=AL
    for cid, (hi, vi), _, blocks, _, _ in comps:
        cbh, cbw = comp_grid(hi, vi)
        out += _sos_header([(cid, 0, 0)], 1, 63, 0, AL)
        _enc_ac_first(out, blocks, cbh, cbw, 1, 63, AL, ac_t, ri)
    # DC refinement: one bit per block, interleaved, Ah=AL Al=AL-1
    out += _sos_header(
        [(cid, 0, 0) for cid, *_ in comps], 0, 0, AL, AL - 1
    )
    sw = _ScanWriter(out, ri)
    for mcu in range(mcux * mcuy):
        sw.unit_boundary(mcu)
        my, mx = divmod(mcu, mcux)
        for cid, (hi, vi), _, blocks, _, _ in comps:
            for by in range(vi):
                for bx in range(hi):
                    dc = int(blocks[my * vi + by, mx * hi + bx][0])
                    sw.write((dc >> (AL - 1)) & 1, 1)
    sw.close()
    # AC refinement per component, Ah=AL Al=AL-1
    for cid, (hi, vi), _, blocks, _, _ in comps:
        cbh, cbw = comp_grid(hi, vi)
        out += _sos_header([(cid, 0, 0)], 1, 63, AL, AL - 1)
        _enc_ac_refine(out, blocks, cbh, cbw, 1, 63, AL - 1, ac_t, ri)


def _enc_ac_first(out, blocks, cbh, cbw, ss, se, al, ac_t, ri=0):
    """AC first pass: point-transformed band values with EOB runs."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_t[r << 4]
            bw.write(code, length)
            if r:
                bw.write(eobrun & ((1 << r) - 1), r)
            eobrun = 0

    bw = _ScanWriter(out, ri, flush)
    for u in range(cbh * cbw):
        bw.unit_boundary(u)
        by, bx = divmod(u, cbw)
        coef = blocks[by, bx]
        vals = []
        for k in range(ss, se + 1):
            cv = int(coef[k])
            v = abs(cv) >> al
            vals.append(-v if cv < 0 else v)
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, length = ac_t[0xF0]
                bw.write(code, length)
                r -= 16
            s = _category(v)
            code, length = ac_t[(r << 4) | s]
            bw.write(code, length)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if nz[-1] < len(vals) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()
    bw.close()


def _enc_ac_refine(out, blocks, cbh, cbw, ss, se, al, ac_t, ri=0):
    """AC refinement pass (the libjpeg encode_mcu_AC_refine shape):
    newly-significant coefficients emit (run, 1)+sign; prior nonzero
    coefficients emit correction bits, buffered so they land after
    the symbol (or EOBn) the decoder reads before consuming them."""
    eobrun = 0
    pending: list[int] = []  # correction bits riding the EOB run

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_t[r << 4]
            bw.write(code, length)
            if r:
                bw.write(eobrun & ((1 << r) - 1), r)
            eobrun = 0
        for b in pending:
            bw.write(b, 1)
        pending = []

    bw = _ScanWriter(out, ri, flush_eob)
    for u in range(cbh * cbw):
        bw.unit_boundary(u)
        by, bx = divmod(u, cbw)
        coef = blocks[by, bx]
        absv = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
        eob = -1
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        br: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush_eob()
                code, length = ac_t[0xF0]
                bw.write(code, length)
                r -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            code, length = ac_t[(r << 4) | 1]
            bw.write(code, length)
            bw.write(1 if int(coef[ss + i]) > 0 else 0, 1)
            for b in br:
                bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    bw.close()
