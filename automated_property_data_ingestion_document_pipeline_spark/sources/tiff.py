"""Pure-stdlib TIFF codec (r06): baseline TIFF 6.0 decode for the
multimodal operators. Domain fit: the reference ingests PROPERTY
DOCUMENTS (reference S5 binary blobs; crs `reports/` dir) and scanned
deeds/assessor records ship as TIFF — the one still-image container the
PNG/JPEG/GIF/BMP set didn't cover.

Scope: both byte orders (II/MM), a single primary IFD, 8-bit
grayscale (PhotometricInterpretation 1) and RGB (2), multiple strips
via StripOffsets/StripByteCounts/RowsPerStrip, and three compressions —
1 (none), 32773 (PackBits RLE), and 5 (TIFF-LZW: MSB-first bit packing
with the spec's EARLY-CHANGE width bump, the opposite conventions of
GIF's LZW on both axes). Everything else — tiles, planar config 2,
predictors, other bit depths, palette TIFFs, other compressions —
raises :class:`TiffUnsupported`, the same typed-error contract as the
other codecs. The encoder builds fixtures for all variant axes and
round-trip-tests the decoder; LZW/PackBits decoder compliance is
additionally pinned by hand-packed vectors in tests/test_tiff.py.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64 * 1024 * 1024


class TiffUnsupported(ValueError):
    """Payload is not a TIFF this codec handles."""


# --------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# --------------------------------------------------------------------------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise TiffUnsupported("PackBits stream exhausted")
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            lit = data[pos : pos + n + 1]
            if len(lit) != n + 1:
                raise TiffUnsupported("PackBits literal truncated")
            out += lit
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise TiffUnsupported("PackBits repeat truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op per spec
    if len(out) != expected:
        raise TiffUnsupported("PackBits over-run")
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


# --------------------------------------------------------------------------
# TIFF-LZW (TIFF 6.0 §13): MSB-first codes, 9→12 bit width with the
# spec's early change (bump one code sooner than the table strictly
# requires), clear=256 / EOI=257, first table slot 258.
# --------------------------------------------------------------------------


class _MsbBitReader:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def read(self, nbits: int) -> int:
        end = self._pos + nbits
        if end > len(self._data) * 8:
            raise TiffUnsupported("LZW stream exhausted mid-code")
        out = 0
        pos = self._pos
        got = 0
        while got < nbits:
            byte = self._data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits - got)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            got += take
            pos += take
        self._pos = pos
        return out


class _MsbBitWriter:
    def __init__(self):
        self._bytes = bytearray()
        self._cur = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._cur = (self._cur << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._bytes.append((self._cur >> (self._nbits - 8)) & 0xFF)
            self._nbits -= 8
        self._cur &= (1 << self._nbits) - 1

    def finish(self) -> bytes:
        if self._nbits:
            self._bytes.append((self._cur << (8 - self._nbits)) & 0xFF)
            self._cur = 0
            self._nbits = 0
        return bytes(self._bytes)


_CLEAR, _EOI = 256, 257


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    r = _MsbBitReader(data)
    out = bytearray()
    prefix = np.empty(4096, dtype=np.int32)
    suffix = np.empty(4096, dtype=np.uint8)
    next_code = 258
    width = 9
    prev = -1
    scratch = bytearray(4096)

    def expand(code: int) -> bytes:
        n = 0
        c = code
        while c >= 256:
            if n >= 4096:
                raise TiffUnsupported("LZW chain loop")
            scratch[n] = suffix[c]
            n += 1
            c = prefix[c]
        scratch[n] = c
        n += 1
        return bytes(scratch[:n][::-1])

    while len(out) < expected:
        code = r.read(width)
        if code == _CLEAR:
            next_code = 258
            width = 9
            prev = -1
            continue
        if code == _EOI:
            break
        if prev < 0:
            if code >= 256:
                raise TiffUnsupported("first LZW code after clear not a literal")
            entry = bytes([code])
        elif code < next_code and code not in (_CLEAR, _EOI):
            entry = expand(code)
        elif code == next_code and next_code < 4096:
            entry = expand(prev) + expand(prev)[:1]  # KwKwK
        else:
            raise TiffUnsupported(f"LZW code {code} beyond table ({next_code})")
        out += entry
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = entry[0]
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1  # EARLY change (TIFF 6.0 §13 quirk)
        prev = code
    if len(out) < expected:
        raise TiffUnsupported(f"LZW ended early ({len(out)}/{expected} bytes)")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    w = _MsbBitWriter()
    width = 9
    w.write(_CLEAR, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    cur = b""
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        if next_code < 4094:
            table[cand] = next_code
            next_code += 1
            # decoder's mirror add lands one code later, and it bumps
            # EARLY (at 2^w - 1): encoder switches at next_code == 2^w
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            w.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        w.write(table[cur], width)
    w.write(_EOI, width)
    return w.finish()


# --------------------------------------------------------------------------
# IFD walk
# --------------------------------------------------------------------------

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_tag_values(data: bytes, endian: str, ttype: int, count: int, raw: bytes):
    if ttype not in _TYPE_SIZES:
        raise TiffUnsupported(f"tag type {ttype} unsupported")
    total = _TYPE_SIZES[ttype] * count
    if total <= 4:
        payload = raw[:total]
    else:
        (offset,) = struct.unpack(endian + "I", raw)
        payload = data[offset : offset + total]
        if len(payload) != total:
            raise TiffUnsupported("tag payload out of bounds")
    if ttype == 3:
        return list(struct.unpack(f"{endian}{count}H", payload))
    if ttype == 4:
        return list(struct.unpack(f"{endian}{count}I", payload))
    if ttype == 1:
        return list(payload)
    return [payload]  # ASCII / RATIONAL: opaque, unused here


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (H, W, C) uint8 (C = 1 gray or 3 RGB). Raises
    :class:`TiffUnsupported` on any malformation or unsupported
    variant."""
    data = bytes(data)
    if len(data) < 8:
        raise TiffUnsupported("truncated header")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise TiffUnsupported("not a TIFF byte-order mark")
    magic, ifd_off = struct.unpack(endian + "HI", data[2:8])
    if magic != 42:
        raise TiffUnsupported(f"bad magic {magic}")
    if ifd_off + 2 > len(data):
        raise TiffUnsupported("IFD offset out of bounds")
    (n_tags,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    if n_tags == 0 or n_tags > 512:
        raise TiffUnsupported(f"implausible tag count {n_tags}")
    tags: dict[int, list] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        ent = data[off : off + 12]
        if len(ent) != 12:
            raise TiffUnsupported("truncated IFD entry")
        tag, ttype, count = struct.unpack(endian + "HHI", ent[:8])
        if count > 1 << 20:
            raise TiffUnsupported(f"implausible tag count for {tag}")
        tags[tag] = _read_tag_values(data, endian, ttype, count, ent[8:12])

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffUnsupported(f"missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    if width == 0 or height == 0:
        raise TiffUnsupported("zero dimension")
    if width * height > _MAX_PIXELS:
        raise TiffUnsupported(f"{width}x{height} exceeds {_MAX_PIXELS} px cap")
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise TiffUnsupported(f"bits per sample {bits} unsupported")
    if one(284, 1) != 1:
        raise TiffUnsupported("planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise TiffUnsupported("tiled TIFF unsupported")
    if 317 in tags and one(317) != 1:
        raise TiffUnsupported("LZW predictor unsupported")
    if photometric == 1 and spp == 1:
        nch = 1
    elif photometric == 2 and spp == 3:
        nch = 3
    else:
        raise TiffUnsupported(
            f"photometric {photometric} / {spp} samples unsupported"
        )
    if compression not in (1, 5, 32773):
        raise TiffUnsupported(f"compression {compression} unsupported")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffUnsupported("malformed strip layout")
    rows_per_strip = one(278, height)
    if rows_per_strip == 0:
        raise TiffUnsupported("zero RowsPerStrip")
    n_strips = (height + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != n_strips:
        raise TiffUnsupported(
            f"{len(offsets)} strips but {n_strips} expected for {height} rows"
        )
    row_bytes = width * nch
    out = bytearray()
    for s, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        if len(strip) != cnt:
            raise TiffUnsupported("strip out of bounds")
        rows = min(rows_per_strip, height - s * rows_per_strip)
        expected = rows * row_bytes
        if compression == 1:
            if len(strip) != expected:
                raise TiffUnsupported("uncompressed strip size mismatch")
            out += strip
        elif compression == 32773:
            out += _packbits_decode(strip, expected)
        else:
            out += _tiff_lzw_decode(strip, expected)
    px = np.frombuffer(bytes(out), dtype=np.uint8).reshape(height, width, nch)
    return px.copy()


def encode_tiff(
    pixels: np.ndarray,
    compression: int = 1,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline TIFF with the
    requested compression (1 / 5 / 32773), byte order, and strip
    height; fixture builder + round-trip partner for the decoder."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    if nch not in (1, 3):
        raise ValueError("1 or 3 channels only")
    endian = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = px[y0 : y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        elif compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        else:
            raise ValueError(f"compression {compression}")
    photometric = 1 if nch == 1 else 2

    # layout: header(8) | IFD | bits-array (if RGB) | strip offset/count
    # arrays (if >1 strip) | strip data
    tag_list = [256, 257, 258, 259, 262, 273, 277, 278, 279, 284]
    n_tags = len(tag_list)
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n_tags + 4
    extra = bytearray()

    def alloc(payload: bytes) -> int:
        off = after_ifd + len(extra)
        extra.extend(payload)
        if len(extra) & 1:
            extra.append(0)
        return off

    if nch == 3:
        bits_off = alloc(struct.pack(endian + "3H", 8, 8, 8))
    n_strips = len(strips)
    if n_strips > 1:
        counts_off = alloc(struct.pack(f"{endian}{n_strips}I", *map(len, strips)))

    # reserve space for offsets array if needed, then strip data
    if n_strips > 1:
        offsets_off = after_ifd + len(extra)
        extra.extend(b"\x00" * (4 * n_strips))
        if len(extra) & 1:
            extra.append(0)
    data_start = after_ifd + len(extra)
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s) + (len(s) & 1)
    if n_strips > 1:
        packed = struct.pack(f"{endian}{n_strips}I", *strip_offsets)
        extra[offsets_off - after_ifd : offsets_off - after_ifd + len(packed)] = packed

    def entry(tag: int, ttype: int, count: int, value: int) -> bytes:
        raw = struct.pack(endian + "I", value)
        if ttype == 3 and count == 1:
            raw = struct.pack(endian + "HH", value, 0)
        return struct.pack(endian + "HHI", tag, ttype, count) + raw

    entries = {
        256: entry(256, 3, 1, w),
        257: entry(257, 3, 1, h),
        258: entry(258, 3, 3, bits_off) if nch == 3 else entry(258, 3, 1, 8),
        259: entry(259, 3, 1, compression),
        262: entry(262, 3, 1, photometric),
        273: entry(273, 4, n_strips, strip_offsets[0] if n_strips == 1 else offsets_off),
        277: entry(277, 3, 1, nch),
        278: entry(278, 3, 1, rows_per_strip),
        279: entry(279, 4, n_strips, len(strips[0]) if n_strips == 1 else counts_off),
        284: entry(284, 3, 1, 1),
    }
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(endian + "HI", 42, ifd_off)
    out += struct.pack(endian + "H", n_tags)
    for t in tag_list:
        out += entries[t]
    out += struct.pack(endian + "I", 0)  # next-IFD pointer
    out += extra
    for s in strips:
        out += s
        if len(s) & 1:
            out += b"\x00"
    return bytes(out)
