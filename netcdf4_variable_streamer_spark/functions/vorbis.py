"""REAL Vorbis-in-Ogg codec, pure stdlib/NumPy (round 18, VERDICT
r17 #3) — the perceptually-compressed-audio step MP3 could not honestly
take: unlike MP3 (whose synthesis window is a 512-coefficient ISO
table that cannot be transcribed reliably in-sandbox), EVERY numeric
constant Vorbis decode needs is either carried IN the stream (Huffman
codebooks, floor/residue/mapping configs all ride the setup header) or
is an analytic formula in the public Vorbis I specification:

- the window is sin(pi/2 * sin^2(pi * (n+0.5)/N)),
- floor1's inverse-dB amplitude map is 10^((v-255) * 7/256) (the
  closed form of the spec's 256-entry table: a geometric ramp covering
  exactly 140 dB in 256 steps),
- codebook float parameters use float32_unpack
  (mantissa * 2^(exponent-788)),
- the MDCT basis is cos(pi/(2n) * (2k+1+n/2) * (2j+1)).

What is implemented (decode side, generic over the bitstream — NOT
tied to what the in-repo encoder emits):
- Ogg page framing: capture, version-0 pages, continued/BOS/EOS flags,
  lacing-value packet segmentation (incl. packets spanning pages and
  nil-terminated ones), the Ogg CRC-32 (poly 0x04C11DB7, unreflected,
  init/xorout 0) verified per page.
- Vorbis LSB-first bitpacking, ilog, float32_unpack.
- The three header packets: identification (channels, rate, blocksize
  sanity), comment (skipped structurally), setup — full codebook parse
  (ordered AND unordered length lists, sparse flag, lookup types 0/1/2
  with integer-root lookup_values, canonical codeword assignment with
  over/underspecified-tree refusal), time transforms, floor type 1
  configs (classes, subclasses, master/subclass books, X-list), residue
  types 0/1/2 configs (cascade bitmaps, per-pass books), mapping type 0
  (submaps, magnitude/angle coupling, mux), modes.
- Audio packet decode: mode/window flags, floor1 curve (nonzero flag,
  partition-class codeword walk, the spec's exact integer
  low/high-neighbor + render_point prediction with step2 flags, and
  render_line's integer Bresenham), residue decode for formats 0/1/2
  (classword radix decode, per-pass partition accumulation, VQ vector
  lookup types 1/2 with sequence_p), square-polar channel coupling
  inverse, floor-times-residue synthesis, IMDCT, windowing and
  overlap-add lapping (equal AND unequal blocksizes via the spec's
  left/right window-slope offsets).

Refusals are loud and named: floor type 0 (LSP — deprecated, never
emitted by modern encoders), non-zero time transforms, mapping types
!= 0, codebook trees that over/underspecify, lookup-type-0 books used
in a VQ context, end-of-packet truncation mid-codeword.

The in-repo encoder (`encode_ogg_vorbis`) builds spec-conformant
streams from chosen integer residue/floor values — the
exact-by-construction fixture recipe the JPEG key proved: because the
encoder picks the codebooks AND the exact codewords, the integer
observables (floor Y values, residue integers, packet/sample counts)
round-trip bit-exactly through the generic decoder, while the float
synthesis tail (inverse-dB map, IMDCT, window) is pinned by analytic
properties in pytest (COLA unity, per-frame energy, sinusoid
round-trip SNR).

Reference parity: david-salac/NetCDF4-variable-streamer has no audio
surface (the checkout is empty; SURVEY §2 reconstructs a chunked-I/O
wrapper) — this module serves the brief's multimodal training-data
mandate, like functions/flac.py and the ADPCM/G.711 WAV paths before
it.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Ogg CRC-32: polynomial 0x04C11DB7, UNREFLECTED, init 0, xorout 0 —
# the one CRC variant RFC 3533 specifies for page checksums.
_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if (_r & 0x80000000) else (_r << 1)
    _OGG_CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ b
        ]
    return crc


def ogg_pages(
    packets: list[bytes],
    serial: int,
    granules: list[int],
    max_body: int = 4096,
    flush_after: frozenset = frozenset(),
) -> bytes:
    """Frame ``packets`` into version-0 Ogg pages (one logical
    stream): BOS on the first page, EOS on the last, ``granules[i]``
    stamped on the page where packet i COMPLETES (RFC 3533 §6), -1 on
    pages that complete no packet. Packets larger than ``max_body``
    span pages with the continued-packet flag. ``flush_after`` forces
    a page boundary after the named packet indexes — the Vorbis
    embedding rules (spec A.2) require the identification header
    ALONE on the BOS page and audio starting on a fresh page after
    the setup header, so the encoders pass {0, 2}."""
    if len(packets) != len(granules):
        raise ValueError("one granule per packet required")
    # split every packet into lacing segments (255-terminated)
    segs: list[tuple[bytes, bool, int]] = []  # (seg, ends_packet, pkt)
    for pi, p in enumerate(packets):
        n = len(p)
        off = 0
        while True:
            take = min(255, n - off)
            seg = p[off : off + take]
            off += take
            done = off >= n and take < 255
            segs.append((seg, done, pi))
            if off >= n:
                if take == 255:
                    segs.append((b"", True, pi))  # nil terminator
                break
    out = bytearray()
    page_seq = 0
    i = 0
    continued = False
    while i < len(segs):
        body = bytearray()
        lacing = []
        last_done_pkt = -1
        while i < len(segs) and len(lacing) < 255:
            seg, done, pi = segs[i]
            if len(body) + len(seg) > max_body and lacing:
                break
            body += seg
            lacing.append(len(seg))
            if done:
                last_done_pkt = pi
            i += 1
            if done and pi in flush_after:
                break
        is_first = page_seq == 0
        is_last = i >= len(segs)
        # continued flag: this page starts mid-packet
        flags = (
            (0x01 if continued else 0)
            | (0x02 if is_first else 0)
            | (0x04 if is_last else 0)
        )
        granule = (
            granules[last_done_pkt] if last_done_pkt >= 0 else -1
        )
        hdr = bytearray(b"OggS\x00")
        hdr.append(flags)
        hdr += struct.pack("<q", granule)
        hdr += struct.pack("<I", serial & 0xFFFFFFFF)
        hdr += struct.pack("<I", page_seq)
        hdr += b"\x00\x00\x00\x00"  # CRC placeholder
        hdr.append(len(lacing))
        hdr += bytes(lacing)
        page = bytes(hdr) + bytes(body)
        crc = ogg_crc(page)
        page = page[:22] + struct.pack("<I", crc) + page[26:]
        out += page
        page_seq += 1
        # next page continues a packet iff the last segment taken did
        # not end its packet
        continued = not segs[i - 1][1]
    return bytes(out)


def ogg_depage(payload: bytes) -> tuple[list[bytes], list[int], int]:
    """(packets, per-packet completion granules, serial): walk every
    page of the FIRST logical stream, verify structure and CRC, and
    reassemble lacing segments into packets."""
    packets: list[bytes] = []
    pkt_granule: list[int] = []
    cur = bytearray()
    pos = 0
    serial = None
    expect_seq = 0
    saw_eos = False
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(
                f"Ogg capture pattern missing at offset {pos}"
            )
        if pos + 27 > n:
            raise ValueError("Ogg page header truncated")
        version = payload[pos + 4]
        if version != 0:
            raise ValueError(f"Ogg stream structure version {version}")
        flags = payload[pos + 5]
        (granule,) = struct.unpack_from("<q", payload, pos + 6)
        (pserial,) = struct.unpack_from("<I", payload, pos + 14)
        (pseq,) = struct.unpack_from("<I", payload, pos + 18)
        (crc,) = struct.unpack_from("<I", payload, pos + 22)
        nsegs = payload[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > n:
            raise ValueError("Ogg lacing table truncated")
        lacing = payload[pos + 27 : lace_end]
        body_len = sum(lacing)
        page_end = lace_end + body_len
        if page_end > n:
            raise ValueError("Ogg page body truncated")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page {pseq} CRC mismatch")
        if serial is None:
            serial = pserial
            if not flags & 0x02:
                raise ValueError("first Ogg page is not BOS")
        elif pserial != serial:
            raise NotImplementedError(
                "multiplexed Ogg (second serial) unsupported"
            )
        if pseq != expect_seq:
            raise ValueError(
                f"Ogg page sequence gap: {pseq} != {expect_seq}"
            )
        expect_seq += 1
        if saw_eos:
            raise ValueError("Ogg page after EOS")
        if flags & 0x04:
            saw_eos = True
        if (flags & 0x01) and not cur:
            raise ValueError(
                "Ogg continued-packet flag with no packet in flight"
            )
        if not (flags & 0x01) and cur and pseq > 0:
            raise ValueError(
                "Ogg packet left open but page is not continued"
            )
        boff = lace_end
        for si, seg in enumerate(lacing):
            cur += payload[boff : boff + seg]
            boff += seg
            if seg < 255:
                packets.append(bytes(cur))
                pkt_granule.append(granule)
                cur = bytearray()
        pos = page_end
    if cur:
        raise ValueError("Ogg stream ends mid-packet")
    if not saw_eos:
        raise ValueError("Ogg stream missing EOS page")
    if serial is None:
        raise ValueError("empty Ogg stream")
    return packets, pkt_granule, serial


# ---------------------------------------------------------------------------
# Vorbis LSB-first bitpacking


class BitReader:
    """Vorbis bitpacker convention: bits fill each byte LSB-first."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError(
                "Vorbis packet ends mid-field (end-of-packet)"
            )
        v = 0
        p = self.pos
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError(
                "Vorbis packet ends mid-field (end-of-packet)"
            )
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class BitWriter:
    __slots__ = ("buf", "bit")

    def __init__(self):
        self.buf = bytearray()
        self.bit = 0

    def write(self, v: int, n: int):
        for i in range(n):
            if self.bit == 0:
                self.buf.append(0)
            if (v >> i) & 1:
                self.buf[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def bytes(self) -> bytes:
        return bytes(self.buf)


def ilog(x: int) -> int:
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def float32_unpack(x: int) -> float:
    mantissa = x & 0x1FFFFF
    exponent = (x & 0x7FE00000) >> 21
    if x & 0x80000000:
        mantissa = -mantissa
    return float(mantissa) * 2.0 ** (exponent - 788)


def float32_pack(v: float) -> int:
    """Inverse of float32_unpack for the integer-valued parameters the
    in-repo encoder uses (exact when |v| < 2^21 is an integer)."""
    sign = 0x80000000 if v < 0 else 0
    m = abs(v)
    exponent = 788
    if m != 0:
        while m >= 0x200000:
            m /= 2.0
            exponent += 1
        while m < 0x100000 and m != int(m):
            m *= 2.0
            exponent -= 1
    if m != int(m):
        raise ValueError(f"float32_pack cannot represent {v} exactly")
    return sign | (exponent << 21) | int(m)


# ---------------------------------------------------------------------------
# Codebooks


def assign_codewords(lengths: list[int | None]) -> dict[int, tuple]:
    """Canonical Vorbis codeword assignment: entry order, lowest
    available codeword per length. Returns {entry: (code, len)} with
    ``code`` accumulated MSB-first (first bit read = highest bit).
    Raises on over- or underspecified trees."""
    used = [(e, ln) for e, ln in enumerate(lengths) if ln]
    if not used:
        raise ValueError("Vorbis codebook has no used entries")
    if len(used) == 1:
        # single-entry codebooks are a historic special case the
        # in-repo encoder never emits; refusing keeps decode honest
        raise NotImplementedError(
            "single-entry Vorbis codebook unsupported"
        )
    out: dict[int, tuple] = {}
    available = [0] * 33
    first_entry, first_len = used[0]
    out[first_entry] = (0, first_len)
    for j in range(1, first_len + 1):
        available[j] = 1 << (32 - j)
    for e, ln in used[1:]:
        z = ln
        while z > 0 and not available[z]:
            z -= 1
        if z == 0:
            raise ValueError("Vorbis codebook tree overspecified")
        res = available[z]
        available[z] = 0
        out[e] = (res >> (32 - ln), ln)
        for y in range(ln, z, -1):
            available[y] = res + (1 << (32 - y))
    if any(available[1:]):
        raise ValueError("Vorbis codebook tree underspecified")
    return out


class Codebook:
    __slots__ = (
        "dimensions",
        "entries",
        "decode_map",
        "max_len",
        "lookup_type",
        "minimum",
        "delta",
        "sequence_p",
        "lookup_values",
        "multiplicands",
        "codewords",
    )

    def decode_scalar(self, br: BitReader) -> int:
        # leading-1 sentinel mirrors the (1 << len) | code map keys,
        # so equal code values of different lengths never collide
        code = 1
        for _ in range(self.max_len):
            code = (code << 1) | br.read_bit()
            e = self.decode_map.get(code)
            if e is not None:
                return e
        raise ValueError("Vorbis codeword does not resolve")

    def decode_vector(self, br: BitReader) -> list[float]:
        if self.lookup_type == 0:
            raise ValueError(
                "Vorbis lookup-type-0 codebook used in a VQ context"
            )
        entry = self.decode_scalar(br)
        last = 0.0
        out = []
        if self.lookup_type == 1:
            idx_div = 1
            for _ in range(self.dimensions):
                off = (entry // idx_div) % self.lookup_values
                v = (
                    self.multiplicands[off] * self.delta
                    + self.minimum
                    + last
                )
                if self.sequence_p:
                    last = v
                out.append(v)
                idx_div *= self.lookup_values
        else:
            base = entry * self.dimensions
            for i in range(self.dimensions):
                v = (
                    self.multiplicands[base + i] * self.delta
                    + self.minimum
                    + last
                )
                if self.sequence_p:
                    last = v
                out.append(v)
        return out


def parse_codebook(br: BitReader) -> Codebook:
    if br.read(24) != 0x564342:
        raise ValueError("Vorbis codebook sync pattern missing")
    cb = Codebook()
    cb.dimensions = br.read(16)
    cb.entries = br.read(24)
    if cb.dimensions == 0 or cb.entries == 0:
        raise ValueError("Vorbis codebook with zero dims/entries")
    if cb.entries > (1 << 20) or cb.dimensions > 4096:
        # a crafted 24-bit entry count must not allocate gigabytes of
        # length/codeword tables before the Huffman validation runs
        raise ValueError(
            f"Vorbis codebook implausible "
            f"({cb.entries} entries x {cb.dimensions} dims)"
        )
    ordered = br.read_bit()
    lengths: list[int | None] = []
    if not ordered:
        sparse = br.read_bit()
        for _ in range(cb.entries):
            if sparse:
                lengths.append(br.read(5) + 1 if br.read_bit() else None)
            else:
                lengths.append(br.read(5) + 1)
    else:
        cur_len = br.read(5) + 1
        cur = 0
        while cur < cb.entries:
            num = br.read(ilog(cb.entries - cur))
            if cur + num > cb.entries:
                raise ValueError(
                    "Vorbis ordered codebook overruns entries"
                )
            lengths.extend([cur_len] * num)
            cur += num
            cur_len += 1
            if cur_len > 32 and cur < cb.entries:
                raise ValueError(
                    "Vorbis ordered codebook length > 32"
                )
    cw = assign_codewords(lengths)
    cb.codewords = cw
    # decode map keyed by (1 << len) | code so equal-valued codes of
    # different lengths never collide
    cb.decode_map = {}
    cb.max_len = 0
    for e, (code, ln) in cw.items():
        cb.decode_map[(1 << ln) | code] = e
        cb.max_len = max(cb.max_len, ln)
    cb.lookup_type = br.read(4)
    if cb.lookup_type not in (0, 1, 2):
        raise NotImplementedError(
            f"Vorbis codebook lookup type {cb.lookup_type}"
        )
    if cb.lookup_type:
        cb.minimum = float32_unpack(br.read(32))
        cb.delta = float32_unpack(br.read(32))
        value_bits = br.read(4) + 1
        cb.sequence_p = br.read_bit()
        if cb.lookup_type == 1:
            lv = 0
            while (lv + 1) ** cb.dimensions <= cb.entries:
                lv += 1
            cb.lookup_values = lv
        else:
            cb.lookup_values = cb.entries * cb.dimensions
        if cb.lookup_values > (1 << 22):
            raise ValueError(
                f"Vorbis codebook lookup table implausible "
                f"({cb.lookup_values} multiplicands)"
            )
        cb.multiplicands = [
            br.read(value_bits) for _ in range(cb.lookup_values)
        ]
    else:
        cb.minimum = cb.delta = 0.0
        cb.sequence_p = 0
        cb.lookup_values = 0
        cb.multiplicands = []
    return cb


# ---------------------------------------------------------------------------
# Setup-header component configs


class Floor1:
    __slots__ = (
        "partition_classes",
        "class_dims",
        "class_subclass_bits",
        "class_masterbooks",
        "subclass_books",
        "multiplier",
        "x_list",
        "rangebits",
    )


_FLOOR1_RANGES = (256, 128, 86, 64)


def parse_floor1(br: BitReader) -> Floor1:
    fl = Floor1()
    n_part = br.read(5)
    fl.partition_classes = [br.read(4) for _ in range(n_part)]
    n_classes = (max(fl.partition_classes) + 1) if n_part else 0
    fl.class_dims = []
    fl.class_subclass_bits = []
    fl.class_masterbooks = []
    fl.subclass_books = []
    for _ in range(n_classes):
        dim = br.read(3) + 1
        sub = br.read(2)
        fl.class_dims.append(dim)
        fl.class_subclass_bits.append(sub)
        fl.class_masterbooks.append(br.read(8) if sub else None)
        fl.subclass_books.append(
            [br.read(8) - 1 for _ in range(1 << sub)]
        )
    fl.multiplier = br.read(2) + 1
    fl.rangebits = br.read(4)
    fl.x_list = [0, 1 << fl.rangebits]
    for i in range(n_part):
        cls = fl.partition_classes[i]
        for _ in range(fl.class_dims[cls]):
            fl.x_list.append(br.read(fl.rangebits))
    if len(fl.x_list) > 65:
        raise ValueError("Vorbis floor1 X list longer than 65")
    if len(set(fl.x_list)) != len(fl.x_list):
        raise ValueError("Vorbis floor1 X list has duplicate values")
    return fl


class Residue:
    __slots__ = (
        "rtype",
        "begin",
        "end",
        "partition_size",
        "classifications",
        "classbook",
        "cascade",
        "books",
    )


def parse_residue(br: BitReader, rtype: int) -> Residue:
    r = Residue()
    r.rtype = rtype
    r.begin = br.read(24)
    r.end = br.read(24)
    r.partition_size = br.read(24) + 1
    r.classifications = br.read(6) + 1
    r.classbook = br.read(8)
    if r.end < r.begin:
        raise ValueError("Vorbis residue end before begin")
    r.cascade = []
    for _ in range(r.classifications):
        low = br.read(3)
        high = br.read(5) if br.read_bit() else 0
        r.cascade.append((high << 3) | low)
    r.books = []
    for c in range(r.classifications):
        row = []
        for p in range(8):
            row.append(br.read(8) if (r.cascade[c] >> p) & 1 else None)
        r.books.append(row)
    return r


class Mapping:
    __slots__ = (
        "submaps",
        "coupling",
        "mux",
        "submap_floor",
        "submap_residue",
    )


def parse_mapping(br: BitReader, channels: int) -> Mapping:
    mtype = br.read(16)
    if mtype != 0:
        raise NotImplementedError(f"Vorbis mapping type {mtype}")
    m = Mapping()
    m.submaps = br.read(4) + 1 if br.read_bit() else 1
    m.coupling = []
    if br.read_bit():
        steps = br.read(8) + 1
        bits = ilog(channels - 1)
        for _ in range(steps):
            mag = br.read(bits)
            ang = br.read(bits)
            if mag == ang or mag >= channels or ang >= channels:
                raise ValueError(
                    "Vorbis coupling channels invalid"
                )
            m.coupling.append((mag, ang))
    if br.read(2):
        raise ValueError("Vorbis mapping reserved bits set")
    if m.submaps > 1:
        m.mux = [br.read(4) for _ in range(channels)]
        if any(x >= m.submaps for x in m.mux):
            raise ValueError("Vorbis mapping mux out of range")
    else:
        m.mux = [0] * channels
    m.submap_floor = []
    m.submap_residue = []
    for _ in range(m.submaps):
        br.read(8)  # unused time configuration placeholder
        m.submap_floor.append(br.read(8))
        m.submap_residue.append(br.read(8))
    return m


class Mode:
    __slots__ = ("blockflag", "mapping")


class VorbisSetup:
    __slots__ = (
        "channels",
        "sample_rate",
        "blocksize0",
        "blocksize1",
        "codebooks",
        "floors",
        "residues",
        "mappings",
        "modes",
    )


def parse_headers(packets: list[bytes]) -> VorbisSetup:
    """Parse the three mandatory header packets (identification,
    comment, setup) into a :class:`VorbisSetup`."""
    if len(packets) < 3:
        raise ValueError("Vorbis stream needs 3 header packets")
    ident, comment, setup = packets[0], packets[1], packets[2]
    if ident[:7] != b"\x01vorbis":
        raise ValueError("Vorbis identification header missing")
    br = BitReader(ident[7:])
    version = br.read(32)
    if version != 0:
        raise ValueError(f"Vorbis version {version}")
    vs = VorbisSetup()
    vs.channels = br.read(8)
    vs.sample_rate = br.read(32)
    br.read(32)  # bitrate_maximum
    br.read(32)  # bitrate_nominal
    br.read(32)  # bitrate_minimum
    bs0 = br.read(4)
    bs1 = br.read(4)
    vs.blocksize0 = 1 << bs0
    vs.blocksize1 = 1 << bs1
    if (
        vs.channels == 0
        or vs.sample_rate == 0
        or not 6 <= bs0 <= 13
        or not 6 <= bs1 <= 13
        or vs.blocksize0 > vs.blocksize1
    ):
        raise ValueError("Vorbis identification header invalid")
    if not br.read_bit():
        raise ValueError("Vorbis identification framing bit unset")
    if comment[:7] != b"\x03vorbis":
        raise ValueError("Vorbis comment header missing")
    cbr = BitReader(comment[7:])
    vlen = cbr.read(32)
    for _ in range(vlen):
        cbr.read(8)
    for _ in range(cbr.read(32)):
        ln = cbr.read(32)
        if 8 * ln > cbr.nbits - cbr.pos:
            raise ValueError("Vorbis comment list overruns packet")
        for _ in range(ln):
            cbr.read(8)
    if not cbr.read_bit():
        raise ValueError("Vorbis comment framing bit unset")
    if setup[:7] != b"\x05vorbis":
        raise ValueError("Vorbis setup header missing")
    sbr = BitReader(setup[7:])
    n_books = sbr.read(8) + 1
    vs.codebooks = [parse_codebook(sbr) for _ in range(n_books)]
    for _ in range(sbr.read(6) + 1):  # time transforms (placeholder)
        if sbr.read(16) != 0:
            raise ValueError("Vorbis time transform nonzero")
    vs.floors = []
    for _ in range(sbr.read(6) + 1):
        ftype = sbr.read(16)
        if ftype == 0:
            raise NotImplementedError(
                "Vorbis floor type 0 (LSP) unsupported"
            )
        if ftype != 1:
            raise ValueError(f"Vorbis floor type {ftype}")
        vs.floors.append(parse_floor1(sbr))
    vs.residues = []
    for _ in range(sbr.read(6) + 1):
        rtype = sbr.read(16)
        if rtype not in (0, 1, 2):
            raise ValueError(f"Vorbis residue type {rtype}")
        vs.residues.append(parse_residue(sbr, rtype))
    vs.mappings = []
    for _ in range(sbr.read(6) + 1):
        vs.mappings.append(parse_mapping(sbr, vs.channels))
    vs.modes = []
    for _ in range(sbr.read(6) + 1):
        md = Mode()
        md.blockflag = sbr.read_bit()
        if sbr.read(16) != 0:
            raise ValueError("Vorbis mode window type nonzero")
        if sbr.read(16) != 0:
            raise ValueError("Vorbis mode transform type nonzero")
        md.mapping = sbr.read(8)
        if md.mapping >= len(vs.mappings):
            raise ValueError("Vorbis mode mapping out of range")
        vs.modes.append(md)
    if not sbr.read_bit():
        raise ValueError("Vorbis setup framing bit unset")
    # cross-validate book/floor/residue references
    nb = len(vs.codebooks)
    for fl in vs.floors:
        for b in fl.class_masterbooks:
            if b is not None and b >= nb:
                raise ValueError("Vorbis floor masterbook out of range")
        for row in fl.subclass_books:
            for b in row:
                if b >= nb:
                    raise ValueError(
                        "Vorbis floor subclass book out of range"
                    )
    for r in vs.residues:
        if r.classbook >= nb:
            raise ValueError("Vorbis residue classbook out of range")
        for row in r.books:
            for b in row:
                if b is not None and b >= nb:
                    raise ValueError(
                        "Vorbis residue book out of range"
                    )
    for m in vs.mappings:
        for f in m.submap_floor:
            if f >= len(vs.floors):
                raise ValueError("Vorbis submap floor out of range")
        for rr in m.submap_residue:
            if rr >= len(vs.residues):
                raise ValueError("Vorbis submap residue out of range")
    return vs


# ---------------------------------------------------------------------------
# Floor1 packet decode + curve synthesis (Vorbis I spec §7.2.3-7.2.4,
# all-integer until the final inverse-dB map)


def _low_neighbor(v: list[int], x: int) -> int:
    best, bi = None, -1
    for i in range(x):
        if v[i] < v[x] and (best is None or v[i] > best):
            best, bi = v[i], i
    return bi


def _high_neighbor(v: list[int], x: int) -> int:
    best, bi = None, -1
    for i in range(x):
        if v[i] > v[x] and (best is None or v[i] < best):
            best, bi = v[i], i
    return bi


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0, y0, x1, y1, v, n):
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = abs(dy) // adx * (1 if dy >= 0 else -1)
    x = x0
    y = y0
    err = 0
    sy = base + 1 if dy >= 0 else base - 1
    ady -= abs(base) * adx
    if x0 < n:
        v[x0] = y
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


def decode_floor1_yvals(
    br: BitReader, fl: Floor1, books: list[Codebook]
) -> list[int] | None:
    """The packet half of floor1: None when the nonzero flag is unset
    (silent channel), else the final Y values per X-list point."""
    if not br.read_bit():
        return None
    rng = _FLOOR1_RANGES[fl.multiplier - 1]
    ybits = ilog(rng - 1)
    y = [br.read(ybits), br.read(ybits)]
    for cls in fl.partition_classes:
        cdim = fl.class_dims[cls]
        cbits = fl.class_subclass_bits[cls]
        csub = (1 << cbits) - 1
        cval = 0
        if cbits:
            cval = books[fl.class_masterbooks[cls]].decode_scalar(br)
        for _ in range(cdim):
            book = fl.subclass_books[cls][cval & csub]
            cval >>= cbits
            y.append(
                books[book].decode_scalar(br) if book >= 0 else 0
            )
    return y


def floor1_curve(fl: Floor1, yvals: list[int], n: int) -> np.ndarray:
    """Amplitude curve over n spectral bins from decoded Y values:
    step-2 prediction/unwrap, sorted-segment render_line in the dB
    domain, then the analytic inverse-dB map 10^((v-255)*7/256)."""
    rng = _FLOOR1_RANGES[fl.multiplier - 1]
    xs = fl.x_list
    np_pts = len(xs)
    step2 = [False] * np_pts
    final_y = [0] * np_pts
    final_y[0] = yvals[0]
    final_y[1] = yvals[1]
    step2[0] = step2[1] = True
    for i in range(2, np_pts):
        lo = _low_neighbor(xs, i)
        hi = _high_neighbor(xs, i)
        pred = _render_point(
            xs[lo], final_y[lo], xs[hi], final_y[hi], xs[i]
        )
        val = yvals[i]
        high_room = rng - pred
        low_room = pred
        room = 2 * min(high_room, low_room)
        if val:
            step2[lo] = True
            step2[hi] = True
            step2[i] = True
            if val >= room:
                final_y[i] = (
                    pred + (val - room + low_room)
                    if high_room > low_room
                    else pred - (val - room + high_room) - 1
                )
            elif val & 1:
                final_y[i] = pred - ((val + 1) // 2)
            else:
                final_y[i] = pred + val // 2
        else:
            step2[i] = False
            final_y[i] = pred
    # clamp into range, sort by x, render
    order = sorted(range(np_pts), key=lambda i: xs[i])
    v = [0] * n
    hx = 0
    hy = 0
    lx = 0
    ly = min(max(final_y[order[0]], 0), rng - 1) * fl.multiplier
    for i in order[1:]:
        if not step2[i]:
            continue
        hx = xs[i]
        hy = min(max(final_y[i], 0), rng - 1) * fl.multiplier
        if lx < n:
            _render_line(lx, ly, hx, hy, v, n)
        lx, ly = hx, hy
    if hx < n:
        _render_line(hx, hy, n, hy, v, n)
    amp = np.array(v[:n], np.float64)
    np.minimum(amp, 255.0, out=amp)
    return np.power(10.0, (amp - 255.0) * (7.0 / 256.0))


# ---------------------------------------------------------------------------
# Residue packet decode (Vorbis I spec §8.6)


def decode_residue(
    br: BitReader,
    r: Residue,
    books: list[Codebook],
    ch: int,
    n2: int,
    do_not_decode: list[bool],
) -> list[np.ndarray]:
    """Decode one residue application over ``ch`` channel vectors of
    length ``n2`` (half-blocksize). Types 0/1 decode channels
    independently; type 2 interleaves all channels into one long
    vector first (§8.6.4)."""
    if r.rtype == 2:
        if all(do_not_decode):
            return [np.zeros(n2) for _ in range(ch)]
        inter = _residue_core(
            br, r, books, 1, n2 * ch, [False]
        )[0]
        return [inter[j::ch].copy() for j in range(ch)]
    return _residue_core(br, r, books, ch, n2, do_not_decode)


def _residue_core(br, r, books, ch, n, do_not_decode):
    out = [np.zeros(n) for _ in range(ch)]
    begin = min(r.begin, n)
    end = min(r.end, n)
    size = end - begin
    if size <= 0:
        return out
    if size % r.partition_size:
        raise ValueError(
            "Vorbis residue span is not whole partitions"
        )
    parts = size // r.partition_size
    classbook = books[r.classbook]
    classwords = classbook.dimensions
    classifs = [[0] * (parts + classwords) for _ in range(ch)]
    for p in range(8):
        pcount = 0
        while pcount < parts:
            if p == 0:
                for j in range(ch):
                    if do_not_decode[j]:
                        continue
                    temp = classbook.decode_scalar(br)
                    for i in range(classwords - 1, -1, -1):
                        classifs[j][pcount + i] = (
                            temp % r.classifications
                        )
                        temp //= r.classifications
            for _ in range(classwords):
                if pcount >= parts:
                    break
                for j in range(ch):
                    if do_not_decode[j]:
                        continue
                    vq = classifs[j][pcount]
                    book_i = r.books[vq][p]
                    if book_i is None:
                        continue
                    book = books[book_i]
                    off = begin + pcount * r.partition_size
                    if r.rtype == 0:
                        step = r.partition_size // book.dimensions
                        for s in range(step):
                            vec = book.decode_vector(br)
                            for d in range(book.dimensions):
                                out[j][off + s + d * step] += vec[d]
                    else:
                        i = 0
                        while i < r.partition_size:
                            vec = book.decode_vector(br)
                            for d in range(book.dimensions):
                                out[j][off + i] += vec[d]
                                i += 1
                pcount += 1
    return out


# ---------------------------------------------------------------------------
# Synthesis: IMDCT + window + lapping


_WIN_CACHE: dict[int, np.ndarray] = {}


def _imdct(spec: np.ndarray) -> np.ndarray:
    """Inverse MDCT, out[k] = sum_j X[j] cos(pi/(2n)(2k+1+n/2)(2j+1)),
    computed via one length-4n FFT instead of a dense (n x n/2) basis
    matrix (round-18 review: the matrix form cached ~268 MB forever
    for a hostile-or-real blocksize-8192 stream and cost O(n^2) per
    packet; this is O(n log n) with O(n) transient allocation).
    Derivation: split the phase (2k+1+n/2)(2j+1) = 2k(2j+1) +
    (1+n/2)(2j+1); the first factor makes Re[IDFT] of a length-4n
    spectrum carrying the pre-twiddled coefficients at odd bins."""
    m = len(spec)
    n = 2 * m
    j = np.arange(m)
    theta = np.pi / (2 * n)
    c = spec * np.exp(1j * theta * (1 + n / 2) * (2 * j + 1))
    big = np.zeros(2 * n, complex)
    big[2 * j + 1] = c
    return (np.fft.ifft(big)[:n] * (2 * n)).real


def _vorbis_window(n: int) -> np.ndarray:
    w = _WIN_CACHE.get(n)
    if w is None:
        k = np.arange(n)
        # sin(pi/2 * sin^2(pi (k+0.5)/n)): the inner HALF-period
        # sweep makes the two window halves complementary, which is
        # exactly the Princen-Bradley condition w^2[k]+w^2[k+n/2]=1
        w = np.sin(
            0.5 * np.pi * np.sin((k + 0.5) / n * np.pi) ** 2
        )
        _WIN_CACHE[n] = w
    return w


def _window_block(n: int, left_n: int, right_n: int) -> np.ndarray:
    """Window for a block of size n whose left slope spans the first
    half of a ``left_n``-lapped transition and right slope the second
    half of a ``right_n`` one (Vorbis I §4.3.1: slopes sit centered
    in each half of the long block when lapping a short one)."""
    w = np.zeros(n)
    half = n // 2
    ls = half // 2 - left_n // 2
    rs = half + (half // 2 - right_n // 2)
    w[ls : ls + left_n] = _vorbis_window(2 * left_n)[:left_n]
    w[ls + left_n : rs] = 1.0
    w[rs : rs + right_n] = _vorbis_window(2 * right_n)[right_n:]
    return w


class VorbisDecoder:
    """Stateful packet-at-a-time decoder with integer observables
    (floor Y checksums, rounded-residue checksums) exposed for the
    oracle-backed registry key."""

    def __init__(self, setup: VorbisSetup):
        self.s = setup
        self.prev_right: np.ndarray | None = None
        self.prev_right_n = 0
        self.floor_checksum = 0
        self.residue_checksum = 0
        self.n_packets = 0

    def decode_packet(self, packet: bytes) -> np.ndarray:
        """One audio packet → (samples, channels) float64 block (may
        be empty for the first packet)."""
        s = self.s
        br = BitReader(packet)
        if br.read_bit() != 0:
            raise ValueError("Vorbis audio packet with type bit set")
        mode_i = br.read(ilog(len(s.modes) - 1))
        if mode_i >= len(s.modes):
            raise ValueError("Vorbis mode number out of range")
        mode = s.modes[mode_i]
        n = s.blocksize1 if mode.blockflag else s.blocksize0
        long_block = bool(mode.blockflag)
        prev_flag = next_flag = True
        if long_block and s.blocksize0 != s.blocksize1:
            prev_flag = bool(br.read_bit())
            next_flag = bool(br.read_bit())
        elif long_block:
            br.read(2)  # flags present but both sizes equal
        mapping = s.mappings[mode.mapping]
        ch = s.channels
        n2 = n // 2
        # floor decode per channel
        floor_y: list[list[int] | None] = []
        for j in range(ch):
            fl = s.floors[mapping.submap_floor[mapping.mux[j]]]
            y = decode_floor1_yvals(br, fl, s.codebooks)
            floor_y.append(y)
            if y is not None:
                self.floor_checksum += sum(y)
        no_residue = [y is None for y in floor_y]
        # coupling: if either side of a coupled pair has a floor, both
        # carry residue (§4.3.4)
        for mag, ang in mapping.coupling:
            if not (no_residue[mag] and no_residue[ang]):
                no_residue[mag] = no_residue[ang] = False
        # residue decode per submap
        resid: list[np.ndarray | None] = [None] * ch
        for sm in range(mapping.submaps):
            chans = [j for j in range(ch) if mapping.mux[j] == sm]
            dnd = [no_residue[j] for j in chans]
            r = s.residues[mapping.submap_residue[sm]]
            vecs = decode_residue(
                br, r, s.codebooks, len(chans), n2, dnd
            )
            for j, v in zip(chans, vecs):
                resid[j] = v
                self.residue_checksum += int(
                    np.rint(v).astype(np.int64).sum()
                )
        # inverse coupling (square polar, §4.3.5): per element,
        #   M>0, A>0 -> (M,     M - A)     M>0, A<=0 -> (M + A, M)
        #   M<=0,A>0 -> (M,     M + A)     M<=0,A<=0 -> (M - A, M)
        for mag, ang in reversed(mapping.coupling):
            m = resid[mag]
            a = resid[ang]
            new_m = np.where(
                a > 0, m, np.where(m > 0, m + a, m - a)
            )
            new_a = np.where(
                a > 0, np.where(m > 0, m - a, m + a), m
            )
            resid[mag], resid[ang] = new_m, new_a
        # floor curve * residue, IMDCT, window
        pcm = np.zeros((n, ch))
        left_n = (
            s.blocksize0 // 2
            if (long_block and not prev_flag)
            else n // 2
        )
        right_n = (
            s.blocksize0 // 2
            if (long_block and not next_flag)
            else n // 2
        )
        win = _window_block(n, left_n, right_n)
        for j in range(ch):
            if floor_y[j] is None:
                continue
            fl = s.floors[mapping.submap_floor[mapping.mux[j]]]
            curve = floor1_curve(fl, floor_y[j], n2)
            spec = curve * resid[j]
            pcm[:, j] = _imdct(spec) * win
        # overlap-add lapping: returned data spans from the center of
        # the previous window to the center of this one
        self.n_packets += 1
        half = n // 2
        cur_left = pcm[:half]
        cur_right = pcm[half:]
        if self.prev_right is None:
            self.prev_right = cur_right
            self.prev_right_n = n
            return np.zeros((0, ch))
        pn = self.prev_right_n
        # returned data spans center-of-previous to center-of-current:
        # pn/4 + n/4 samples (Vorbis I §1.3.2). The previous right
        # half is zero past its window slope, so clipping it to the
        # return length drops only zeros; the current left half may
        # START before the return region (long block lapping a short
        # one) — that prefix is under the zero part of its window.
        out_len = pn // 4 + n // 4
        out = np.zeros((out_len, ch))
        prev = self.prev_right
        m = min(pn // 2, out_len)
        out[:m] += prev[:m]
        start = pn // 4 - n // 4  # current half's offset, may be < 0
        a = max(start, 0)
        out[a:out_len] += cur_left[a - start : out_len - start]
        self.prev_right = cur_right
        self.prev_right_n = n
        return out


def decode_ogg_vorbis(payload: bytes) -> tuple[np.ndarray, int]:
    """Ogg Vorbis bytes → (samples, sample_rate); mono returns 1-D
    int16, stereo (n, 2) — the FLAC/WAV shape convention. The final
    page's granule position trims the tail per the Ogg mapping."""
    samples, stats = _decode_ogg_vorbis_full(payload)
    return samples, stats["sample_rate"]


def vorbis_stream_stats(payload: bytes) -> dict:
    """Integer observables of a full decode — the oracle-facing
    surface: packet/sample counts plus bit-exact checksums of the
    decoded floor Y values and rounded residue integers."""
    _, stats = _decode_ogg_vorbis_full(payload)
    return stats


def _decode_ogg_vorbis_full(payload: bytes):
    packets, granules, _serial = ogg_depage(payload)
    setup = parse_headers(packets)
    dec = VorbisDecoder(setup)
    blocks = []
    for p in packets[3:]:
        blocks.append(dec.decode_packet(p))
    if not blocks:
        raise ValueError("Ogg Vorbis stream carries no audio packets")
    pcm = np.concatenate(blocks, axis=0)
    final_granule = granules[-1]
    if 0 <= final_granule < len(pcm):
        pcm = pcm[:final_granule]
    out = np.clip(np.rint(pcm * 32767.0), -32768, 32767).astype(
        np.int16
    )
    if setup.channels == 1:
        out = out[:, 0]
    stats = {
        "channels": setup.channels,
        "sample_rate": setup.sample_rate,
        "n_packets": dec.n_packets,
        "n_samples": len(out),
        "floor_checksum": dec.floor_checksum,
        "residue_checksum": dec.residue_checksum,
    }
    return out, stats


# ---------------------------------------------------------------------------
# Encoder — exact-by-construction fixture streams. The encoder shares
# assign_codewords with the decoder, so codeword bit patterns are
# consistent by construction, and every numeric parameter is written
# through the same float32 packing the decoder unpacks.


class BookSpec:
    """Encoder-side codebook: writes its setup-header form and encodes
    entries/vectors with the canonical codewords."""

    def __init__(
        self,
        entries: int,
        dim: int,
        lengths: list[int],
        lookup_type: int = 0,
        minimum: float = 0.0,
        delta: float = 1.0,
        value_bits: int = 5,
        multiplicands: list[int] | None = None,
    ):
        self.entries = entries
        self.dim = dim
        self.lengths = lengths
        self.lookup_type = lookup_type
        self.minimum = minimum
        self.delta = delta
        self.value_bits = value_bits
        self.multiplicands = multiplicands or []
        self.codewords = assign_codewords(list(lengths))
        self.vec_map: dict[tuple, int] = {}
        if lookup_type == 1:
            lv = 0
            while (lv + 1) ** dim <= entries:
                lv += 1
            for e in range(entries):
                vec = []
                idx_div = 1
                for _ in range(dim):
                    off = (e // idx_div) % lv
                    vec.append(
                        self.multiplicands[off] * delta + minimum
                    )
                    idx_div *= lv
                self.vec_map[tuple(vec)] = e
        elif lookup_type == 2:
            for e in range(entries):
                vec = tuple(
                    self.multiplicands[e * dim + i] * delta + minimum
                    for i in range(dim)
                )
                self.vec_map[vec] = e

    def write_setup(self, bw: BitWriter):
        bw.write(0x564342, 24)
        bw.write(self.dim, 16)
        bw.write(self.entries, 24)
        bw.write(0, 1)  # unordered
        bw.write(0, 1)  # not sparse
        for ln in self.lengths:
            bw.write(ln - 1, 5)
        bw.write(self.lookup_type, 4)
        if self.lookup_type:
            bw.write(float32_pack(self.minimum), 32)
            bw.write(float32_pack(self.delta), 32)
            bw.write(self.value_bits - 1, 4)
            bw.write(0, 1)  # sequence_p
            for m in self.multiplicands:
                bw.write(m, self.value_bits)

    def put(self, bw: BitWriter, entry: int):
        code, ln = self.codewords[entry]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)

    def put_vec(self, bw: BitWriter, vec: tuple):
        self.put(bw, self.vec_map[vec])


def _vorbis_headers(
    channels: int,
    sample_rate: int,
    bs0: int,
    bs1: int,
    books: list[BookSpec],
    write_floors,
    write_residues,
    write_mappings,
    modes: list[int],
) -> list[bytes]:
    """The three header packets; the floor/residue/mapping sections
    are caller-provided writers over the shared BitWriter."""
    bw = BitWriter()
    for b in b"\x01vorbis":
        bw.write(b, 8)
    bw.write(0, 32)
    bw.write(channels, 8)
    bw.write(sample_rate, 32)
    bw.write(0, 32)
    bw.write(0, 32)
    bw.write(0, 32)
    bw.write(bs0.bit_length() - 1, 4)
    bw.write(bs1.bit_length() - 1, 4)
    bw.write(1, 1)
    ident = bw.bytes()
    bw = BitWriter()
    for b in b"\x03vorbis":
        bw.write(b, 8)
    vendor = b"netcdf4-variable-streamer-spark fixture encoder"
    bw.write(len(vendor), 32)
    for b in vendor:
        bw.write(b, 8)
    bw.write(0, 32)  # no user comments
    bw.write(1, 1)
    comment = bw.bytes()
    bw = BitWriter()
    for b in b"\x05vorbis":
        bw.write(b, 8)
    bw.write(len(books) - 1, 8)
    for bk in books:
        bk.write_setup(bw)
    bw.write(0, 6)  # one time transform
    bw.write(0, 16)
    write_floors(bw)
    write_residues(bw)
    write_mappings(bw)
    bw.write(len(modes) - 1, 6)
    for blockflag in modes:
        bw.write(blockflag, 1)
        bw.write(0, 16)
        bw.write(0, 16)
        bw.write(0, 8)  # mapping 0
    bw.write(1, 1)
    return [ident, comment, bw.bytes()]


def encode_ogg_vorbis_mono(
    frames: list[tuple[tuple[int, int], list[int], list[int]]],
    sample_rate: int = 8000,
    serial: int = 0xBEEF,
) -> bytes:
    """Variant-A fixture stream: mono, blocksize 128, floor1 with zero
    partitions (two raw Y values), residue type 1 with a 2-class
    classbook (class 0 = silent partition, class 1 = one pass of a
    32-entry lookup-1 scalar book covering [-15, 16]).

    ``frames``: per audio packet ((y0, y1), classes[8],
    residue_ints[64]) — residue ints MUST be 0 where the partition
    class is 0 and in [-8, 8] elsewhere."""
    n2 = 64
    # 32 entries keep the Huffman tree Kraft-complete (17 x 5-bit
    # would underspecify); values cover [-15, 16], fixtures use [-8, 8]
    vbook = BookSpec(
        32, 1, [5] * 32, lookup_type=1, minimum=-15.0, delta=1.0,
        value_bits=5, multiplicands=list(range(32)),
    )
    cbook = BookSpec(4, 2, [2, 2, 2, 2])

    def floors(bw: BitWriter):
        bw.write(0, 6)  # one floor
        bw.write(1, 16)  # type 1
        bw.write(0, 5)  # zero partitions
        bw.write(0, 2)  # multiplier 1 -> range 256
        bw.write(6, 4)  # rangebits: X list [0, 64]

    def residues(bw: BitWriter):
        bw.write(0, 6)  # one residue
        bw.write(1, 16)  # type 1
        bw.write(0, 24)  # begin
        bw.write(64, 24)  # end
        bw.write(7, 24)  # partition size 8
        bw.write(1, 6)  # 2 classifications
        bw.write(1, 8)  # classbook = book 1
        # class 0: no passes; class 1: pass 0 only
        bw.write(0, 3)
        bw.write(0, 1)
        bw.write(1, 3)
        bw.write(0, 1)
        bw.write(0, 8)  # class 1 pass 0 -> book 0

    def mappings(bw: BitWriter):
        bw.write(0, 6)  # one mapping
        bw.write(0, 16)  # type 0
        bw.write(0, 1)  # one submap
        bw.write(0, 1)  # no coupling
        bw.write(0, 2)  # reserved
        bw.write(0, 8)  # time placeholder
        bw.write(0, 8)  # floor 0
        bw.write(0, 8)  # residue 0

    headers = _vorbis_headers(
        1, sample_rate, 128, 128, [vbook, cbook],
        floors, residues, mappings, modes=[0],
    )
    packets = list(headers)
    granules = [0, 0, 0]
    for fi, ((y0, y1), classes, rvals) in enumerate(frames):
        if len(classes) != 8 or len(rvals) != 64:
            raise ValueError("frame needs 8 classes and 64 residues")
        bw = BitWriter()
        bw.write(0, 1)  # audio packet
        # one mode -> zero mode bits; blockflag 0 -> no window flags
        bw.write(1, 1)  # floor nonzero
        bw.write(y0, 8)
        bw.write(y1, 8)
        # residue pass 0: classwords of 2, then partitions
        p = 0
        while p < 8:
            cbook.put(bw, classes[p] * 2 + classes[p + 1])
            for q in (p, p + 1):
                if classes[q]:
                    for i in range(8):
                        v = rvals[q * 8 + i]
                        vbook.put_vec(bw, (float(v),))
                elif any(rvals[q * 8 : q * 8 + 8]):
                    raise ValueError(
                        f"partition {q} is class 0 but has residue"
                    )
            p += 2
        packets.append(bw.bytes())
        granules.append(fi * n2)
    return ogg_pages(
        packets, serial, granules, flush_after=frozenset({0, 2})
    )


def encode_ogg_vorbis_stereo(
    frames: list[tuple],
    sample_rate: int = 16000,
    serial: int = 0xFACE,
) -> bytes:
    """Variant-B fixture stream exercising every remaining decode
    path: stereo with one magnitude/angle coupling step, TWO block
    sizes (64/256) with truthful prev/next window flags, floor1 WITH
    a partition (one 3-point class through a subclass book), residue
    type 2 (channel-interleaved) with a two-pass cascade (pass 0 = a
    lookup-type-2 dim-4 book, pass 1 = the lookup-type-1 scalar
    book).

    ``frames``: per audio packet
    (blockflag, (y0..y4) per channel tuple-of-2, classes, p0_entries,
    p1_vals) where classes has n_parts entries (8 short / 32 long over
    the interleaved vector), p0_entries has 2 dbook entries per
    class-1 partition, p1_vals 8 ints in [-15, 16] per class-1
    partition."""
    vbook = BookSpec(
        32, 1, [5] * 32, lookup_type=1, minimum=-15.0, delta=1.0,
        value_bits=5, multiplicands=list(range(32)),
    )
    cbook = BookSpec(4, 2, [2, 2, 2, 2])
    fbook = BookSpec(16, 1, [4] * 16)
    dmults = []
    for e in range(8):
        for i in range(4):
            dmults.append((e >> i) & 1 if i < 3 else (e & 3))
    dbook = BookSpec(
        8, 4, [3] * 8, lookup_type=2, minimum=-2.0, delta=1.0,
        value_bits=2, multiplicands=dmults,
    )

    def floors(bw: BitWriter):
        bw.write(0, 6)
        bw.write(1, 16)
        bw.write(1, 5)  # one partition
        bw.write(0, 4)  # its class: 0
        bw.write(2, 3)  # class 0 dim 3
        bw.write(0, 2)  # subclass bits 0
        # subclass book numbers are stored PLUS ONE (0 = unused)
        bw.write(2 + 1, 8)  # subclass book: book 2 (fbook)
        bw.write(1, 2)  # multiplier 2 -> range 128
        bw.write(5, 4)  # rangebits -> X list [0, 32, ...]
        for x in (8, 16, 24):
            bw.write(x, 5)

    def residues(bw: BitWriter):
        bw.write(0, 6)
        bw.write(2, 16)  # type 2
        bw.write(0, 24)
        bw.write(256, 24)
        bw.write(7, 24)  # partition size 8
        bw.write(1, 6)  # 2 classifications
        bw.write(1, 8)  # classbook: book 1
        bw.write(0, 3)
        bw.write(0, 1)  # class 0: silent
        bw.write(3, 3)
        bw.write(0, 1)  # class 1: passes 0 and 1
        bw.write(3, 8)  # pass 0 -> book 3 (dbook)
        bw.write(0, 8)  # pass 1 -> book 0 (vbook)

    def mappings(bw: BitWriter):
        bw.write(0, 6)
        bw.write(0, 16)
        bw.write(0, 1)  # one submap
        bw.write(1, 1)  # coupling present
        bw.write(0, 8)  # one step
        bw.write(0, 1)  # magnitude channel 0 (ilog(1)=1 bit)
        bw.write(1, 1)  # angle channel 1
        bw.write(0, 2)
        bw.write(0, 8)
        bw.write(0, 8)  # floor 0
        bw.write(0, 8)  # residue 0

    headers = _vorbis_headers(
        2, sample_rate, 64, 256, [vbook, cbook, fbook, dbook],
        floors, residues, mappings, modes=[0, 1],
    )
    packets = list(headers)
    granules = [0, 0, 0]
    total = 0
    prev_n = None
    for fi, (bf, ys, classes, p0, p1) in enumerate(frames):
        n = 256 if bf else 64
        parts = (n // 2 * 2) // 8  # interleaved vector / psize
        if len(classes) != parts:
            raise ValueError(
                f"frame {fi}: {len(classes)} classes != {parts}"
            )
        bw = BitWriter()
        bw.write(0, 1)
        bw.write(bf, 1)  # mode number (2 modes -> 1 bit)
        if bf:
            prev_long = frames[fi - 1][0] if fi > 0 else 0
            next_long = (
                frames[fi + 1][0] if fi + 1 < len(frames) else 0
            )
            bw.write(prev_long, 1)
            bw.write(next_long, 1)
        for ch in range(2):
            y0, y1, y2, y3, y4 = ys[ch]
            bw.write(1, 1)  # nonzero
            bw.write(y0, 7)
            bw.write(y1, 7)
            for y in (y2, y3, y4):
                fbook.put(bw, y)
        # residue type 2, two passes over the interleaved vector
        k0 = iter(p0)
        k1 = iter(p1)
        for b in range(0, parts, 2):
            cbook.put(bw, classes[b] * 2 + classes[b + 1])
            for q in (b, b + 1):
                if q < parts and classes[q]:
                    dbook.put(bw, next(k0))
                    dbook.put(bw, next(k0))
        for q in range(parts):
            if classes[q]:
                for _ in range(8):
                    vbook.put_vec(bw, (float(next(k1)),))
        packets.append(bw.bytes())
        if prev_n is not None:
            total += prev_n // 4 + n // 4
        prev_n = n
        granules.append(total)
    return ogg_pages(
        packets, serial, granules, flush_after=frozenset({0, 2})
    )
