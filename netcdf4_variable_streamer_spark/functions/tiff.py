"""Baseline TIFF codec, pure NumPy + stdlib — no external imaging
library.

Built from the public TIFF 6.0 specification, with the same
discipline as the JPEG/PNG/GIF/QOI/FLAC codecs: TIFF is what
scanned-document / OCR training corpora ship.

- **decode**: both byte orders (II little-endian, MM big-endian),
  IFD walk with all the baseline tags (width/length, bits-per-sample,
  compression, photometric, strip offsets/byte-counts, rows-per-strip,
  samples-per-pixel, planar config, predictor), STRIP and (round 17)
  TILED layouts; compressions: none (1), CCITT RLE (2 — T.4 Modified
  Huffman 1-D, byte-aligned rows, round 18), CCITT Group 4 (4 —
  ITU-T T.6 2-D MMR, bilevel, round 17), LZW (5 — the TIFF variant:
  MSB-first packing, EARLY-CHANGE code-width bumps, 256/257
  clear/EOI, 4094-entry cap) and PackBits (32773); the horizontal-differencing
  predictor (tag 317 = 2, per tile in the tiled layout);
  photometrics: BlackIsZero, WhiteIsZero (inverted), RGB, RGBA via
  ExtraSamples, and (round 18) PALETTE-COLOR (photometric 3: 16-bit
  ColorMap high-byte lookup, 4-bit MSB-first-nibble or 8-bit
  indices, strips AND tiles, composing with every compression and
  FillOrder). 8-bit samples (1-bit for G4), chunky planar layout.
- **encode**: 8-bit gray/RGB/RGBA and bilevel G4, strips or tiles,
  uncompressed/PackBits/G4 — spec-conformant files any standard
  reader opens.
- **FillOrder 2** (round 18): LSB-first byte fill — the fax-derived
  scanned-archive convention — handled by bit-reversing raw
  strip/tile bytes before decompression for EVERY codec (the libtiff
  model: FillOrder describes the on-disk bit order of the compressed
  stream, so one uniform raw-byte reversal recovers the MSB-first
  stream each decoder expects); the encoder emits it on request for
  differential fixtures.
- **refusals are loud and named**: 16-bit samples, planar=2
  layouts, unknown compressions, truncated strips/tiles, LZW code
  overruns, G4 extension mode, nonzero T4Options (2-D G3/EOL
  variants), FillOrder values outside {1, 2}, missing/short
  ColorMaps, predictor-2 over palette or bilevel data.
  Dimension/grid/transition guards fire before allocation.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 50_000_000

# FillOrder 2 (tag 266): bytes.translate through this 256-entry table
# reverses the bits of every byte — the whole LSB-first story, applied
# once to raw strip/tile data before any decoder sees it.
_BITREV = bytes(
    int(f"{i:08b}"[::-1], 2) for i in range(256)
)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def _read_ifd(payload: bytes, off: int, bo: str) -> dict[int, list]:
    if off + 2 > len(payload):
        raise ValueError("TIFF IFD offset past the payload")
    (n,) = struct.unpack_from(bo + "H", payload, off)
    if off + 2 + 12 * n + 4 > len(payload):
        raise ValueError("TIFF IFD truncated")
    tags: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * count
        if total <= 4:
            src = base + 8
        else:
            (src,) = struct.unpack_from(bo + "I", payload, base + 8)
            if src + total > len(payload):
                raise ValueError(f"TIFF tag {tag} data past payload")
        fmts = {3: "H", 8: "h", 4: "I", 9: "i", 11: "f"}
        if typ in fmts:
            # each wire type decodes with ITS OWN format — unpacking
            # SLONG/FLOAT as unsigned LONG yields silently wrong
            # values (round-16 review); FLOAT values then refuse at
            # the integer-tag accessor rather than mis-parse
            vals = list(
                struct.unpack_from(
                    bo + f"{count}{fmts[typ]}", payload, src
                )
            )
        elif typ in (1, 2, 6, 7):
            vals = list(payload[src : src + count])
        else:  # rationals etc. — not needed, store raw
            vals = [payload[src : src + total]]
        tags[tag] = vals
    return tags


def _unpackbits(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expect:
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                raise ValueError("TIFF PackBits literal run truncated")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("TIFF PackBits repeat truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError(
            f"TIFF PackBits yielded {len(out)} of {expect} bytes"
        )
    return bytes(out[:expect])


def _tiff_lzw(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, Clear=256, EOI=257,
    first dictionary code 258, EARLY-CHANGE width bumps (the width
    grows one code earlier than GIF's), 4094-entry cap."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        # trim consumed bits — an ever-growing accumulator would make
        # each per-byte shift O(stream length) (quadratic decode)
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(
                    f"TIFF LZW first code {code} not in dictionary"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(
                f"TIFF LZW code {code} references past the "
                f"{len(table)}-entry dictionary"
            )
        out += entry
        prev = entry
        # EARLY CHANGE: bump when the NEXT code would not fit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError(
            f"TIFF LZW yielded {len(out)} of {expect} bytes"
        )
    return bytes(out[:expect])


# ---------------------------------------------------------------------------
# CCITT Group 4 (ITU-T T.6) two-dimensional MMR coding — the dominant
# compression in real scanned-document archives (round 17, VERDICT r16
# #3). Pure stdlib/NumPy from the public T.4/T.6 recommendations: the
# 2-D mode codes (pass/horizontal/vertical), the T.4 modified-Huffman
# run-length tables horizontal mode borrows (white + black terminating
# and make-up codes, shared extended make-ups to 2560), and both
# directions. No EOL codes exist in T.6; extension/uncompressed mode
# refuses by name.
# ---------------------------------------------------------------------------

# T.4 §2.4.1/§2.4.2 run-length code tables as (run, 'bits') — decode
# dicts key on (code_width, code_value), encode uses them directly.
_T4_WHITE = [
    (0, "00110101"), (1, "000111"), (2, "0111"), (3, "1000"),
    (4, "1011"), (5, "1100"), (6, "1110"), (7, "1111"),
    (8, "10011"), (9, "10100"), (10, "00111"), (11, "01000"),
    (12, "001000"), (13, "000011"), (14, "110100"), (15, "110101"),
    (16, "101010"), (17, "101011"), (18, "0100111"), (19, "0001100"),
    (20, "0001000"), (21, "0010111"), (22, "0000011"),
    (23, "0000100"), (24, "0101000"), (25, "0101011"),
    (26, "0010011"), (27, "0100100"), (28, "0011000"),
    (29, "00000010"), (30, "00000011"), (31, "00011010"),
    (32, "00011011"), (33, "00010010"), (34, "00010011"),
    (35, "00010100"), (36, "00010101"), (37, "00010110"),
    (38, "00010111"), (39, "00101000"), (40, "00101001"),
    (41, "00101010"), (42, "00101011"), (43, "00101100"),
    (44, "00101101"), (45, "00000100"), (46, "00000101"),
    (47, "00001010"), (48, "00001011"), (49, "01010010"),
    (50, "01010011"), (51, "01010100"), (52, "01010101"),
    (53, "00100100"), (54, "00100101"), (55, "01011000"),
    (56, "01011001"), (57, "01011010"), (58, "01011011"),
    (59, "01001010"), (60, "01001011"), (61, "00110010"),
    (62, "00110011"), (63, "00110100"),
    # make-up codes
    (64, "11011"), (128, "10010"), (192, "010111"),
    (256, "0110111"), (320, "00110110"), (384, "00110111"),
    (448, "01100100"), (512, "01100101"), (576, "01101000"),
    (640, "01100111"), (704, "011001100"), (768, "011001101"),
    (832, "011010010"), (896, "011010011"), (960, "011010100"),
    (1024, "011010101"), (1088, "011010110"), (1152, "011010111"),
    (1216, "011011000"), (1280, "011011001"), (1344, "011011010"),
    (1408, "011011011"), (1472, "010011000"), (1536, "010011001"),
    (1600, "010011010"), (1664, "011000"), (1728, "010011011"),
]

_T4_BLACK = [
    (0, "0000110111"), (1, "010"), (2, "11"), (3, "10"),
    (4, "011"), (5, "0011"), (6, "0010"), (7, "00011"),
    (8, "000101"), (9, "000100"), (10, "0000100"),
    (11, "0000101"), (12, "0000111"), (13, "00000100"),
    (14, "00000111"), (15, "000011000"), (16, "0000010111"),
    (17, "0000011000"), (18, "0000001000"), (19, "00001100111"),
    (20, "00001101000"), (21, "00001101100"), (22, "00000110111"),
    (23, "00000101000"), (24, "00000010111"), (25, "00000011000"),
    (26, "000011001010"), (27, "000011001011"), (28, "000011001100"),
    (29, "000011001101"), (30, "000001101000"), (31, "000001101001"),
    (32, "000001101010"), (33, "000001101011"), (34, "000011010010"),
    (35, "000011010011"), (36, "000011010100"), (37, "000011010101"),
    (38, "000011010110"), (39, "000011010111"), (40, "000001101100"),
    (41, "000001101101"), (42, "000011011010"), (43, "000011011011"),
    (44, "000001010100"), (45, "000001010101"), (46, "000001010110"),
    (47, "000001010111"), (48, "000001100100"), (49, "000001100101"),
    (50, "000001010010"), (51, "000001010011"), (52, "000000100100"),
    (53, "000000110111"), (54, "000000111000"), (55, "000000100111"),
    (56, "000000101000"), (57, "000001011000"), (58, "000001011001"),
    (59, "000000101011"), (60, "000000101100"), (61, "000001011010"),
    (62, "000001100110"), (63, "000001100111"),
    # make-up codes
    (64, "0000001111"), (128, "000011001000"), (192, "000011001001"),
    (256, "000001011011"), (320, "000000110011"),
    (384, "000000110100"), (448, "000000110101"),
    (512, "0000001101100"), (576, "0000001101101"),
    (640, "0000001001010"), (704, "0000001001011"),
    (768, "0000001001100"), (832, "0000001001101"),
    (896, "0000001110010"), (960, "0000001110011"),
    (1024, "0000001110100"), (1088, "0000001110101"),
    (1152, "0000001110110"), (1216, "0000001110111"),
    (1280, "0000001010010"), (1344, "0000001010011"),
    (1408, "0000001010100"), (1472, "0000001010101"),
    (1536, "0000001011010"), (1600, "0000001011011"),
    (1664, "0000001100100"), (1728, "0000001100101"),
]

# T.4 §2.4.3 extended make-up codes, shared by both colours
_T4_EXT = [
    (1792, "00000001000"), (1856, "00000001100"),
    (1920, "00000001101"), (1984, "000000010010"),
    (2048, "000000010011"), (2112, "000000010100"),
    (2176, "000000010101"), (2240, "000000010110"),
    (2304, "000000010111"), (2368, "000000011100"),
    (2432, "000000011101"), (2496, "000000011110"),
    (2560, "000000011111"),
]


def _mh_decode_table(pairs):
    return {
        (len(bits), int(bits, 2)): run for run, bits in pairs
    }


_MH_DEC = (
    _mh_decode_table(_T4_WHITE + _T4_EXT),  # colour 0 = white
    _mh_decode_table(_T4_BLACK + _T4_EXT),  # colour 1 = black
)
_MH_ENC = (
    {run: bits for run, bits in _T4_WHITE + _T4_EXT},
    {run: bits for run, bits in _T4_BLACK + _T4_EXT},
)
_MH_MAX_WIDTH = 14


class _BitReader:
    """MSB-first bit reader over one CCITT-coded strip (shared by the
    G4/T.6 and compression-2 MH/T.4 decoders, so messages say the
    neutral "CCITT" — r18 ADVICE #3)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("CCITT stream truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1


def _mh_run(rd: _BitReader, colour: int, w: int) -> int:
    """One T.4 run length for ``colour``: zero or more make-up codes
    (2560s chain for runs past the table) then a terminating code."""
    table = _MH_DEC[colour]
    total = 0
    while True:
        val = 0
        n = 0
        while True:
            val = (val << 1) | rd.bit()
            n += 1
            run = table.get((n, val))
            if run is not None:
                break
            if n > _MH_MAX_WIDTH:
                raise ValueError(
                    f"CCITT invalid run code for colour {colour}"
                )
        total += run
        if total > w:
            raise ValueError(
                f"CCITT run {total} exceeds row width {w}"
            )
        if run < 64:  # terminating code ends the run
            return total


def _ccitt_g4_decode(data: bytes, w: int, nrows: int) -> np.ndarray:
    """One G4-coded strip → (nrows, w) uint8 bit array (1 = black).
    Reference line starts imaginary all-white; no EOL codes exist in
    T.6 (EOFB after the last row is not required and not read)."""
    from bisect import bisect_right

    if w <= 0 or nrows <= 0:
        raise ValueError("CCITT G4 strip with empty dimensions")
    rd = _BitReader(data)
    out = np.zeros((nrows, w), np.uint8)
    ref: list[int] = [w, w]
    for y in range(nrows):
        cur: list[int] = []
        a0 = -1
        colour = 0
        while a0 < w:
            if len(cur) > w:
                # a legitimate row has at most w changing elements
                # (plus one terminal a1 == w); a crafted stream
                # repeating zero-advance vertical OR zero-length-run
                # horizontal codes could otherwise grow this list to
                # 8x the input size (fuzz round 10 + its review)
                raise ValueError(
                    f"CCITT G4 row carries more than {w} transitions"
                )
            # b1: first changing element of ref right of a0 whose
            # parity matches the current colour (transitions
            # alternate white->black at even indexes)
            i = bisect_right(ref, a0)
            if (i & 1) != colour:
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            # mode code
            if rd.bit():  # 1 -> V0
                a1 = b1
            else:
                if rd.bit():  # 01x
                    a1 = b1 + 1 if rd.bit() else b1 - 1
                elif rd.bit():  # 001 -> horizontal
                    base = a0 if a0 > 0 else 0
                    r1 = _mh_run(rd, colour, w)
                    r2 = _mh_run(rd, colour ^ 1, w)
                    a1 = base + r1
                    a2 = a1 + r2
                    if a2 > w or a1 > w:
                        raise ValueError(
                            "CCITT G4 horizontal runs overflow row"
                        )
                    cur += [a1, a2]
                    a0 = a2
                    continue
                elif rd.bit():  # 0001 -> pass
                    a0 = b2
                    continue
                elif rd.bit():  # 00001x
                    a1 = b1 + 2 if rd.bit() else b1 - 2
                elif rd.bit():  # 000001x
                    a1 = b1 + 3 if rd.bit() else b1 - 3
                elif rd.bit():  # 0000001 -> extension
                    raise NotImplementedError(
                        "CCITT G4 extension/uncompressed mode "
                        "unsupported"
                    )
                else:
                    raise ValueError(
                        "CCITT G4 invalid mode code (EOL/EOFB "
                        "inside a strip)"
                    )
            if a1 < 0 or a1 > w or (cur and a1 < cur[-1]):
                raise ValueError(
                    f"CCITT G4 transition {a1} out of order"
                )
            cur.append(a1)
            a0 = a1
            colour ^= 1
        # render: transitions alternate white->black
        for k in range(0, len(cur), 2):
            x0 = cur[k]
            x1 = cur[k + 1] if k + 1 < len(cur) else w
            out[y, x0:x1] = 1
        ref = (cur if cur else []) + [w, w]
    return out


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, bits: str):
        for b in bits:
            self.acc = (self.acc << 1) | (b == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _mh_emit(wr: _BitWriter, run: int, colour: int):
    enc = _MH_ENC[colour]
    while run >= 64:
        mk = min(run - run % 64, 2560)
        wr.write(enc[mk])
        run -= mk
    wr.write(enc[run])


def _transitions(row: np.ndarray) -> list[int]:
    """Changing-element positions of one 0/1 row (a leading black
    pixel is a change at 0; transitions then alternate colours)."""
    t = [0] if row[0] else []
    t += [
        int(x) + 1
        for x in np.flatnonzero(np.diff(row.astype(np.int8)))
    ]
    return t


def _ccitt_mh_decode(data: bytes, w: int, nrows: int) -> np.ndarray:
    """One CCITT-RLE strip (TIFF compression 2 — T.4 Modified
    Huffman, one-dimensional, round 18) → (nrows, w) uint8 bit array
    (1 = black): alternating white/black runs from the shared T.4
    tables, each ROW starting on a byte boundary (the compression-2
    rule; no EOL codes)."""
    if w <= 0 or nrows <= 0:
        raise ValueError("CCITT RLE strip with empty dimensions")
    rd = _BitReader(data)
    out = np.zeros((nrows, w), np.uint8)
    for y in range(nrows):
        rd.nbits = 0  # byte-align: discard the previous row's pad
        pos = 0
        colour = 0
        while pos < w:
            run = _mh_run(rd, colour, w - pos)
            if colour:
                out[y, pos : pos + run] = 1
            pos += run
            colour ^= 1
    return out


def _ccitt_mh_encode(bits: np.ndarray) -> bytes:
    """(h, w) 0/1 array (1 = black) → CCITT-RLE bytes: each row coded
    standalone as white-first alternating T.4 runs and padded to a
    byte boundary."""
    h, w = bits.shape
    out = bytearray()
    for y in range(h):
        wr = _BitWriter()
        prev = 0
        colour = 0
        for tr in _transitions(bits[y]) + [w]:
            _mh_emit(wr, tr - prev, colour)
            prev = tr
            colour ^= 1
            if prev >= w:
                break
        out += wr.done()
    return bytes(out)


def _ccitt_g4_encode(bits: np.ndarray) -> bytes:
    """(h, w) 0/1 array (1 = black) → one G4-coded strip (no EOFB —
    optional per T.6 and not emitted, matching the decoder)."""
    h, w = bits.shape
    from bisect import bisect_right

    wr = _BitWriter()
    ref: list[int] = [w, w]
    for y in range(h):
        cur = _transitions(bits[y]) + [w, w]
        a0 = -1
        colour = 0
        while a0 < w:
            i = bisect_right(ref, a0)
            if (i & 1) != colour:
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            j = bisect_right(cur, a0)
            if (j & 1) != colour:
                j += 1
            a1 = cur[j] if j < len(cur) else w
            if b2 < a1:
                wr.write("0001")  # pass
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                wr.write(
                    {0: "1", 1: "011", 2: "000011", 3: "0000011",
                     -1: "010", -2: "000010", -3: "0000010"}[d]
                )
                a0 = a1
                colour ^= 1
            else:
                a2 = cur[j + 1] if j + 1 < len(cur) else w
                base = a0 if a0 > 0 else 0
                wr.write("001")
                _mh_emit(wr, a1 - base, colour)
                _mh_emit(wr, a2 - a1, colour ^ 1)
                a0 = a2
        ref = cur
    return wr.done()


def _g4_gray(bits: np.ndarray, photo: int) -> np.ndarray:
    """G4 bit array (1 = black-coded run) → uint8 gray. The T.6
    coding produces SAMPLE 0 for white runs, so photo=0 (WhiteIsZero)
    displays white where bits are 0; photo=1 (BlackIsZero — legal but
    unusual for G4) displays the REVERSE, matching libtiff-family
    readers (round-17 review: both photometrics used to render
    identically)."""
    if photo == 1:
        return (bits * 255).astype(np.uint8)
    return ((1 - bits) * 255).astype(np.uint8)


def _decode_tiled(
    payload: bytes, tags, one, w, h, spp, comp, predictor, photo,
    fillorder=1, cmap=None, bps0=8,
) -> np.ndarray:
    """Tiled-layout decode (TIFF 6.0 §15, round 17): a ceil(w/tw) x
    ceil(h/tl) grid of INDEPENDENTLY-compressed tiles (each padded to
    full tile size at the image edges), reassembled and cropped.
    Tiles compress exactly like strips (none/LZW/PackBits/CCITT G4);
    the horizontal predictor applies WITHIN each tile's rows — a
    tile, not an image row, is the compression unit."""
    tw = one(322)
    tl = one(323)
    if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
        raise ValueError(
            f"TIFF tile dimensions {tw}x{tl} must be positive "
            "multiples of 16"
        )
    if 273 in tags or 278 in tags or 279 in tags:
        raise ValueError(
            "TIFF carries both strip and tile layout tags"
        )
    ta = -(-w // tw)
    td = -(-h // tl)
    if (ta * tw) * (td * tl) > 2 * _MAX_PIXELS:
        # edge padding can only double a legal image; a crafted tile
        # grid must not allocate past that
        raise ValueError(
            f"TIFF tile grid {ta}x{td} of {tw}x{tl} implausible"
        )
    offsets = tags.get(324)
    counts = tags.get(325)
    if (
        not offsets
        or not counts
        or len(offsets) != len(counts)
        or not all(isinstance(v, int) for v in offsets)
        or not all(isinstance(v, int) for v in counts)
    ):
        raise ValueError("TIFF tile offsets/byte-counts invalid")
    if len(offsets) != ta * td:
        raise ValueError(
            f"TIFF tile count {len(offsets)} != grid {ta}x{td}"
        )
    if comp in (2, 4) or photo == 3:
        canvas = np.zeros((td * tl, ta * tw), np.uint8)
    else:
        canvas = np.zeros((td * tl, ta * tw, spp), np.uint8)
    tile_row_bytes = (tw * spp * bps0 + 7) // 8
    expect = tl * tile_row_bytes
    for ti, (toff, tcnt) in enumerate(zip(offsets, counts)):
        if toff + tcnt > len(payload):
            raise ValueError(f"TIFF tile {ti} past the payload")
        blob = payload[toff : toff + tcnt]
        if fillorder == 2:
            blob = blob.translate(_BITREV)
        y0 = (ti // ta) * tl
        x0 = (ti % ta) * tw
        if comp in (2, 4):
            canvas[y0 : y0 + tl, x0 : x0 + tw] = (
                _ccitt_g4_decode(blob, tw, tl)
                if comp == 4
                else _ccitt_mh_decode(blob, tw, tl)
            )
            continue
        if comp == 1:
            if len(blob) < expect:
                raise ValueError(
                    f"TIFF tile {ti} carries {len(blob)} of "
                    f"{expect} bytes"
                )
            raw = bytes(blob[:expect])
        elif comp == 5:
            raw = _tiff_lzw(blob, expect)
        elif comp == 32773:
            raw = _unpackbits(blob, expect)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} unsupported "
                "(none/CCITT-G4/LZW/PackBits only)"
            )
        if photo == 3:
            canvas[y0 : y0 + tl, x0 : x0 + tw] = (
                _tiff_unpack_indices(
                    np.frombuffer(raw, np.uint8).reshape(
                        tl, tile_row_bytes
                    ),
                    tw,
                    bps0,
                )
            )
            continue
        tile = np.frombuffer(raw, np.uint8).reshape(tl, tw, spp)
        if predictor == 2:
            tile = np.cumsum(tile.astype(np.int64), axis=1).astype(
                np.uint8
            )
        canvas[y0 : y0 + tl, x0 : x0 + tw] = tile
    if comp in (2, 4):
        return _g4_gray(canvas[:h, :w], photo)
    if photo == 3:
        return _tiff_apply_colormap(canvas[:h, :w], cmap)
    img = canvas[:h, :w]
    if photo == 0:
        img = 255 - img
    return img[:, :, 0] if spp == 1 else img


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (h, w) uint8 gray or (h, w, C) uint8
    RGB/RGBA (first IFD only)."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(payload) < 8:
        raise ValueError("TIFF header truncated")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    tags = _read_ifd(payload, ifd_off, bo)

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:  # missing OR a corrupt count=0 entry
            if default is None:
                raise ValueError(f"TIFF required tag {tag} missing")
            return default
        if not isinstance(v[0], int):
            raise ValueError(
                f"TIFF tag {tag} has a non-integral type"
            )
        return v[0]

    tiled = 322 in tags or 323 in tags
    w = one(256)
    h = one(257)
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"TIFF dimensions implausible: {w}x{h}")
    spp = one(277, 1)
    if not 1 <= spp <= 4:
        # an unbounded samples-per-pixel would multiply into the
        # expected strip size BELOW the w*h pixel guard and let a
        # crafted PackBits/LZW strip decompress gigabytes
        # (round-16 review)
        raise NotImplementedError(
            f"{spp} samples per pixel unsupported (1..4 only)"
        )
    comp0 = one(259, 1)
    bps = tags.get(258, [8])
    photo = one(262)
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF photometric {photo} unsupported"
        )
    cmap = None
    if comp0 in (2, 4):
        if any(b != 1 for b in bps):
            raise NotImplementedError(
                f"{bps}-bit CCITT TIFF unsupported (bilevel only)"
            )
    elif photo == 3:
        # palette-color (round 18): ColorMap lookup, 4- or 8-bit
        # indices, one sample per pixel
        if bps not in ([4], [8]):
            raise NotImplementedError(
                f"{bps}-bit palette TIFF unsupported (4/8-bit only)"
            )
        if spp != 1:
            raise ValueError(
                f"palette TIFF with {spp} samples per pixel invalid"
            )
        cm = tags.get(320)
        if not cm or len(cm) != 3 * (1 << bps[0]) or not all(
            isinstance(v, int) for v in cm
        ):
            raise ValueError(
                "palette TIFF ColorMap missing or wrong size"
            )
        import numpy as _np

        cmap = _np.array(cm, _np.uint16).reshape(3, 1 << bps[0])
    elif any(b != 8 for b in bps):
        raise NotImplementedError(
            f"{bps}-bit TIFF unsupported (8-bit samples only)"
        )
    if one(284, 1) != 1:
        raise NotImplementedError(
            "planar TIFF (PlanarConfiguration=2) unsupported"
        )
    if photo == 2 and spp not in (3, 4):
        raise ValueError(
            f"RGB TIFF with {spp} samples per pixel invalid"
        )
    comp = comp0
    fillorder = one(266, 1)
    if fillorder not in (1, 2):
        raise ValueError(f"TIFF FillOrder {fillorder} invalid")
    predictor = one(317, 1)
    if predictor not in (1, 2) or (
        predictor == 2 and (comp in (2, 4) or photo == 3)
    ):
        # horizontal differencing is for continuous-tone data; over
        # palette indices or G4 bilevel it is spec-invalid
        raise NotImplementedError(
            f"TIFF predictor {predictor} unsupported"
        )
    if comp in (2, 4):
        # CCITT bilevel — G4 (T.6 2-D) or compression-2 RLE (T.4 1-D)
        if spp != 1:
            raise NotImplementedError(
                f"CCITT with {spp} samples per pixel unsupported"
            )
        if photo not in (0, 1):
            raise ValueError(
                f"CCITT photometric {photo} invalid (bilevel only)"
            )
        if comp == 4:
            t6opts = one(293, 0)
            if t6opts & ~2:
                raise ValueError(f"TIFF T6Options {t6opts} invalid")
        elif one(292, 0) != 0:
            raise NotImplementedError(
                "TIFF T4Options (2-D G3 / uncompressed / EOL fill) "
                "unsupported — compression-2 is 1-D MH only"
            )
    if tiled:
        return _decode_tiled(
            payload, tags, one, w, h, spp, comp, predictor, photo,
            fillorder, cmap, bps[0],
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if (
        not offsets
        or not counts
        or len(offsets) != len(counts)
        or not all(isinstance(v, int) for v in offsets)
        or not all(isinstance(v, int) for v in counts)
    ):
        raise ValueError("TIFF strip offsets/byte-counts invalid")
    rps = one(278, h)
    if comp in (2, 4):
        rows_g4 = []
        rows_left = h
        for si, (soff, scnt) in enumerate(zip(offsets, counts)):
            if soff + scnt > len(payload):
                raise ValueError(f"TIFF strip {si} past the payload")
            nrows = min(rps, rows_left)
            rows_left -= nrows
            sdat = payload[soff : soff + scnt]
            if fillorder == 2:
                sdat = sdat.translate(_BITREV)
            rows_g4.append(
                _ccitt_g4_decode(sdat, w, nrows)
                if comp == 4
                else _ccitt_mh_decode(sdat, w, nrows)
            )
        if rows_left:
            # every other decode path raises loudly on short data;
            # a short strip LIST must not return a short image
            # silently (round-17 review)
            raise ValueError(
                f"TIFF CCITT strips cover {h - rows_left} of {h} rows"
            )
        bits = np.concatenate(rows_g4, axis=0)
        return _g4_gray(bits, photo)
    raw = bytearray()
    rows_left = h
    # palette indices pack two-per-byte at 4 bits with byte-aligned
    # rows; everything else is one byte per sample
    row_bytes = (w * spp * bps[0] + 7) // 8
    for si, (soff, scnt) in enumerate(zip(offsets, counts)):
        if soff + scnt > len(payload):
            raise ValueError(f"TIFF strip {si} past the payload")
        nrows = min(rps, rows_left)
        rows_left -= nrows
        expect = nrows * row_bytes
        blob = payload[soff : soff + scnt]
        if fillorder == 2:
            blob = blob.translate(_BITREV)
        if comp == 1:
            if len(blob) < expect:
                raise ValueError(
                    f"TIFF strip {si} carries {len(blob)} of "
                    f"{expect} bytes"
                )
            strip = bytes(blob[:expect])
        elif comp == 5:
            strip = _tiff_lzw(blob, expect)
        elif comp == 32773:
            strip = _unpackbits(blob, expect)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} unsupported "
                "(none/CCITT-G4/LZW/PackBits only)"
            )
        raw += strip
    if photo == 3:
        idx = _tiff_unpack_indices(
            np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes),
            w,
            bps[0],
        )
        return _tiff_apply_colormap(idx, cmap)
    img = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(
            np.uint8
        )  # horizontal differencing: row-wise cumulative sum mod 256
    if photo == 0:  # WhiteIsZero
        img = 255 - img
    return img[:, :, 0] if spp == 1 else img


def _tiff_unpack_indices(
    rows: np.ndarray, w: int, depth: int
) -> np.ndarray:
    """(h, row_bytes) packed palette indices → (h, w): identity at 8
    bits, MSB-first nibble split at 4."""
    if depth == 8:
        return rows[:, :w]
    hi = rows >> 4
    lo = rows & 15
    out = np.empty((rows.shape[0], rows.shape[1] * 2), np.uint8)
    out[:, 0::2] = hi
    out[:, 1::2] = lo
    return out[:, :w]


def _tiff_apply_colormap(
    idx: np.ndarray, cmap: np.ndarray
) -> np.ndarray:
    """(h, w) indices + (3, 2^depth) 16-bit ColorMap → (h, w, 3)
    uint8 (high byte of each 16-bit component, the libtiff
    convention)."""
    rgb = (cmap[:, idx] >> 8).astype(np.uint8)
    return np.moveaxis(rgb, 0, 2)


def _packbits(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 126:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i = j + 1
        else:
            # literal stretch until the next run of >= 3
            j = i
            while (
                j + 1 < n
                and j - i < 127
                and not (
                    j + 2 < n
                    and row[j + 1] == row[j + 2]
                    and (j + 3 >= n or row[j + 3] == row[j + 1])
                )
            ):
                j += 1
            out += bytes([j - i]) + row[i : j + 1]
            i = j + 1
    return bytes(out)


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    rows_per_strip: int = 16,
    tile: tuple[int, int] | None = None,
    fill_order: int = 1,
) -> bytes:
    """(h, w) | (h, w, 3|4) uint8 → little-endian baseline TIFF
    (chunky strips; ``compression`` in {'none', 'packbits', 'g4',
    'g3'} — 'g4' is CCITT Group 4 for bilevel (h, w) input where
    pixel < 128 codes black, emitted as BitsPerSample=1 / WhiteIsZero.
    NOTE on 'g3': it writes TIFF compression tag **2** — CCITT
    Modified Huffman RLE, i.e. T.4 one-dimensional coding WITHOUT EOL
    codes — not tag 3 (true Group 3 fax with EOLs); the name is kept
    for call-site compatibility but means MH/RLE (r18 ADVICE #2)).
    ``tile=(tl, tw)`` (positive multiples of 16) switches to the
    TIFF 6.0 §15 tiled layout: each tile zero-padded to full size at
    the edges and compressed independently. ``fill_order=2`` stores
    every strip/tile bit-reversed with tag 266=2 — the fax-derived
    LSB-first convention (round 18)."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_tiff expects (h, w[, 3|4]) uint8")
    if arr.ndim == 3 and arr.shape[2] not in (3, 4):
        raise ValueError("encode_tiff expects 3 or 4 channels")
    if compression not in ("none", "packbits", "g4", "g3"):
        raise ValueError(f"compression {compression!r} unsupported")
    if compression in ("g4", "g3") and arr.ndim != 2:
        raise ValueError("CCITT TIFF is bilevel: (h, w) input only")
    if rows_per_strip < 1:
        raise ValueError(
            f"rows_per_strip {rows_per_strip} must be >= 1"
        )
    if fill_order not in (1, 2):
        raise ValueError(f"fill_order {fill_order} must be 1 or 2")
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]

    def pack(chunk):
        if compression == "packbits":
            # TIFF 6.0: each ROW must be PackBits-compressed
            # separately — runs must not cross row boundaries
            # (round-16 review; the in-repo decoder tolerated it but
            # strict readers mis-frame rows)
            return b"".join(
                _packbits(chunk[r].tobytes())
                for r in range(chunk.shape[0])
            )
        if compression == "g4":
            return _ccitt_g4_encode((chunk < 128).astype(np.uint8))
        if compression == "g3":
            return _ccitt_mh_encode((chunk < 128).astype(np.uint8))
        return chunk.tobytes()

    strips = []
    if tile is not None:
        tl, tw = tile
        if tl <= 0 or tw <= 0 or tl % 16 or tw % 16:
            raise ValueError(
                f"tile dimensions {tw}x{tl} must be positive "
                "multiples of 16"
            )
        grid = np.zeros(
            (-(-h // tl) * tl, -(-w // tw) * tw)
            + (() if arr.ndim == 2 else (spp,)),
            np.uint8,
        )
        if compression in ("g4", "g3"):
            grid[:h, :w] = arr
            grid[:h, w:] = 255  # pad white, not black
            grid[h:, :] = 255
        else:
            grid[:h, :w] = arr
        for y0 in range(0, grid.shape[0], tl):
            for x0 in range(0, grid.shape[1], tw):
                t = grid[y0 : y0 + tl, x0 : x0 + tw]
                strips.append(pack(t.reshape(tl, tw * spp)))
    else:
        flat = arr.reshape(h, w * spp)
        for r0 in range(0, h, rows_per_strip):
            strips.append(pack(flat[r0 : r0 + rows_per_strip]))
    if fill_order == 2:
        # LSB-first on disk: the stored bytes are the bit-reversal of
        # the MSB-first stream every decoder produces
        strips = [s.translate(_BITREV) for s in strips]
    n_strips = len(strips)
    photo = (
        0 if compression in ("g4", "g3") else 1 if spp == 1 else 2
    )
    comp = {"none": 1, "packbits": 32773, "g4": 4, "g3": 2}[
        compression
    ]
    entries = []  # (tag, type, count, packed-value-or-None, data)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals), vals, None))

    def long_(tag, *vals):
        entries.append((tag, 4, len(vals), vals, None))

    def dim(tag, val):
        # TIFF 6.0 allows SHORT or LONG for the dimension tags; use
        # LONG when the value outgrows a SHORT (code-review finding:
        # a 2x70000 image is valid but died in struct.pack)
        (short if val <= 0xFFFF else long_)(tag, val)

    dim(256, w)
    dim(257, h)
    short(258, *([1 if compression in ("g4", "g3") else 8] * spp))
    short(259, comp)
    short(262, photo)
    if fill_order == 2:
        short(266, 2)
    if tile is not None:
        short(277, spp)
        dim(322, tile[1])
        dim(323, tile[0])
        long_(324, None)  # tile offsets — resolved in the layout pass
        long_(325, *[len(s) for s in strips])
    else:
        long_(273, None)  # strip offsets — resolved in layout pass
        short(277, spp)
        dim(278, min(rows_per_strip, h))
        long_(279, *[len(s) for s in strips])
    if spp == 4:
        short(338, 2)  # unassociated alpha
    entries.sort(key=lambda e: e[0])
    # two-pass layout: sizes are all known up front, so out-of-line
    # tag data and strip offsets resolve before any bytes are emitted
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    oline_off = {}
    off_tag = 273 if tile is None else 324
    for tag, typ, count, vals, _ in entries:
        count = n_strips if tag == off_tag else count
        size = _TYPE_SIZE[typ] * count
        if size > 4:
            oline_off[tag] = data_off
            data_off += size
    strip_offs = []
    o = data_off
    for s in strips:
        strip_offs.append(o)
        o += len(s)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    blobs = bytearray()
    for tag, typ, count, vals, _ in entries:
        if tag == off_tag:
            vals, count = strip_offs, n_strips
        fmt = "H" if typ == 3 else "I"
        raw = struct.pack(f"<{count}{fmt}", *vals)
        out += struct.pack("<HHI", tag, typ, count)
        if len(raw) <= 4:
            out += raw.ljust(4, b"\0")
        else:
            out += struct.pack("<I", oline_off[tag])
            blobs += raw
    out += struct.pack("<I", 0)  # no next IFD
    out += blobs
    for s in strips:
        out += s
    return bytes(out)
