"""Baseline TIFF codec, pure NumPy + stdlib — no external imaging
library.

Built from the public TIFF 6.0 specification, with the same
discipline as the JPEG/PNG/GIF/QOI/FLAC codecs: TIFF is what
scanned-document / OCR training corpora ship.

- **decode**: both byte orders (II little-endian, MM big-endian),
  IFD walk with all the baseline tags (width/length, bits-per-sample,
  compression, photometric, strip offsets/byte-counts, rows-per-strip,
  samples-per-pixel, planar config, predictor), strip assembly;
  compressions: none (1), LZW (5 — the TIFF variant: MSB-first
  packing, EARLY-CHANGE code-width bumps, 256/257 clear/EOI,
  4094-entry cap) and PackBits (32773); the horizontal-differencing
  predictor (tag 317 = 2); photometrics: BlackIsZero, WhiteIsZero
  (inverted), RGB, and RGBA via ExtraSamples. 8-bit samples, chunky
  planar layout.
- **encode**: 8-bit gray/RGB/RGBA, chunky strips, uncompressed or
  PackBits — spec-conformant files any standard reader opens.
- **refusals are loud and named**: tiled TIFFs, 16-bit/palette/
  planar=2 layouts, unknown compressions, truncated strips, LZW
  code overruns. Dimension guards fire before allocation.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 50_000_000

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

    if 322 in tags or 323 in tags:
        raise NotImplementedError(
            "tiled TIFF unsupported (strip layout only)"
        )
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
    bps = tags.get(258, [8])
    if any(b != 8 for b in bps):
        raise NotImplementedError(
            f"{bps}-bit TIFF unsupported (8-bit samples only)"
        )
    if one(284, 1) != 1:
        raise NotImplementedError(
            "planar TIFF (PlanarConfiguration=2) unsupported"
        )
    photo = one(262)
    if photo == 3:
        raise NotImplementedError("palette TIFF unsupported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photo} unsupported"
        )
    if photo == 2 and spp not in (3, 4):
        raise ValueError(
            f"RGB TIFF with {spp} samples per pixel invalid"
        )
    comp = one(259, 1)
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} unsupported"
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
    raw = bytearray()
    rows_left = h
    for si, (soff, scnt) in enumerate(zip(offsets, counts)):
        if soff + scnt > len(payload):
            raise ValueError(f"TIFF strip {si} past the payload")
        nrows = min(rps, rows_left)
        rows_left -= nrows
        expect = nrows * w * spp
        blob = payload[soff : soff + scnt]
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
                "(none/LZW/PackBits only)"
            )
        raw += strip
    img = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(
            np.uint8
        )  # horizontal differencing: row-wise cumulative sum mod 256
    if photo == 0:  # WhiteIsZero
        img = 255 - img
    return img[:, :, 0] if spp == 1 else img


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
    arr: np.ndarray, compression: str = "none", rows_per_strip: int = 16
) -> bytes:
    """(h, w) | (h, w, 3|4) uint8 → little-endian baseline TIFF
    (chunky strips; ``compression`` in {'none', 'packbits'})."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_tiff expects (h, w[, 3|4]) uint8")
    if arr.ndim == 3 and arr.shape[2] not in (3, 4):
        raise ValueError("encode_tiff expects 3 or 4 channels")
    if compression not in ("none", "packbits"):
        raise ValueError(f"compression {compression!r} unsupported")
    if rows_per_strip < 1:
        raise ValueError(
            f"rows_per_strip {rows_per_strip} must be >= 1"
        )
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * spp)
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = flat[r0 : r0 + rows_per_strip]
        if compression == "packbits":
            # TIFF 6.0: each ROW must be PackBits-compressed
            # separately — runs must not cross row boundaries
            # (round-16 review; the in-repo decoder tolerated it but
            # strict readers mis-frame rows)
            block = b"".join(
                _packbits(rows[r].tobytes())
                for r in range(rows.shape[0])
            )
        else:
            block = rows.tobytes()
        strips.append(block)
    n_strips = len(strips)
    photo = 1 if spp == 1 else 2
    comp = 1 if compression == "none" else 32773
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
    short(258, *([8] * spp))
    short(259, comp)
    short(262, photo)
    long_(273, None)  # strip offsets — resolved in the layout pass
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
    for tag, typ, count, vals, _ in entries:
        count = n_strips if tag == 273 else count
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
        if tag == 273:
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
