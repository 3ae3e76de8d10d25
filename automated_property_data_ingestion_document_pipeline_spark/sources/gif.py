"""Pure-stdlib GIF codec (r06 stretch): GIF87a/89a decode for the
multimodal operators — the remaining *lossless* still-image format a
crawl corpus contains in volume (reference S5 binary blobs,
reference/crs scraper's image assets; cf. App.js:252 upload surface).

Scope: full LZW decode (variable code width 3..12 bits, clear/EOI,
KwKwK case, deferred-clear at dictionary-full), global and local color
tables, interlaced images (4-pass row reorder), 89a extension blocks
(graphic control / comment / plain text / application) skipped via the
sub-block walk, and multi-frame animations composited with disposal
methods 0/1 (keep) and 2 (restore-to-background) plus GCE transparency.
Everything else — malformed signature, truncated sub-blocks, an image
descriptor escaping the logical screen, disposal 3 (restore-previous),
out-of-range LZW codes — raises :class:`GifUnsupported`, the same
typed-error contract as sources/png.py / sources/jpeg.py, so
``resize_image``'s pass-through gate stays typed under fuzz.

The encoder is a REAL dictionary LZW compressor (emits a clear code and
resets when the table reaches 4096), used to build fixtures and to
round-trip-test the decoder; decoder spec-compliance is additionally
pinned by hand-packed byte fixtures derived from the GIF89a spec's
Appendix-F coding rules in tests/test_gif.py (independent of this
encoder).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64 * 1024 * 1024  # same 64 MP cap as the JPEG codec
_MAX_FRAMES = 4096


class GifUnsupported(ValueError):
    """Payload is not a GIF this codec handles (bad signature, truncated
    stream, malformed LZW, disposal 3, ...)."""


# --------------------------------------------------------------------------
# bit-level helpers (LZW codes are packed LSB-first per GIF89a App. F)
# --------------------------------------------------------------------------


class _LsbBitReader:
    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        end = self._pos + nbits
        if end > len(self._data) * 8:
            raise GifUnsupported("LZW stream exhausted mid-code")
        out = 0
        got = 0
        pos = self._pos
        while got < nbits:
            byte = self._data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits - got)
            out |= ((byte >> (pos & 7)) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self._pos = pos
        return out


class _LsbBitWriter:
    def __init__(self):
        self._bytes = bytearray()
        self._cur = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._cur |= value << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._bytes.append(self._cur & 0xFF)
            self._cur >>= 8
            self._nbits -= 8

    def finish(self) -> bytes:
        if self._nbits:
            self._bytes.append(self._cur & 0xFF)
            self._cur = 0
            self._nbits = 0
        return bytes(self._bytes)


# --------------------------------------------------------------------------
# LZW
# --------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """GIF-variant LZW → ``expected`` color indices (uint8).

    Width grows when the next assignable slot reaches ``2**width``
    (checked after each dictionary add, capped at 12 bits); a full
    table (4096) stops growing until a clear code — the "deferred
    clear" behavior real encoders rely on.
    """
    if not 2 <= min_code_size <= 8:
        raise GifUnsupported(f"LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LsbBitReader(data)
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0

    # dictionary as (prefix_code, suffix_byte); roots are implicit
    prefix = np.empty(4096, dtype=np.int32)
    suffix = np.empty(4096, dtype=np.uint8)
    next_code = clear + 2
    width = min_code_size + 1
    prev = -1
    scratch = bytearray(4096)

    def expand(code: int) -> bytes:
        n = 0
        c = code
        while c >= clear:
            if n >= 4096:
                raise GifUnsupported("LZW chain loop")
            scratch[n] = suffix[c]
            n += 1
            c = prefix[c]
        scratch[n] = c
        n += 1
        return bytes(scratch[:n][::-1])

    while n_out < expected:
        code = r.read(width)
        if code == clear:
            next_code = clear + 2
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            # first code after a clear must be a literal root
            if code >= clear:
                raise GifUnsupported("first LZW code after clear not a root")
            entry = bytes([code])
        elif code < next_code:
            entry = expand(code)
        elif code == next_code and next_code < 4096:
            first = expand(prev)[:1]
            entry = expand(prev) + first  # KwKwK
        else:
            raise GifUnsupported(f"LZW code {code} beyond dictionary ({next_code})")
        take = min(len(entry), expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = entry[0]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < expected:
        raise GifUnsupported(f"LZW ended early ({n_out}/{expected} pixels)")
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real dictionary LZW (the encoder half of GIF89a App. F): emits an
    initial clear, resets at table-full, and grows the code width in
    lockstep with the decoder (width covers codes up to ``next_code``,
    the slot the decoder will have assigned before reading our next
    emission)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LsbBitWriter()
    width = min_code_size + 1
    w.write(clear, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    cur = b""
    for px in indices.astype(np.uint8).tobytes():
        cand = cur + bytes([px])
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # decoder bumps width when ITS next slot hits 2**width after
            # the add that mirrors this one
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        cur = bytes([px])
    if cur:
        w.write(table[cur], width)
    w.write(eoi, width)
    return w.finish()


# --------------------------------------------------------------------------
# container walk
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    parts = []
    while True:
        if pos >= len(data):
            raise GifUnsupported("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        block = data[pos : pos + n]
        if len(block) != n:
            raise GifUnsupported("truncated sub-block")
        parts.append(block)
        pos += n


def _color_table(data: bytes, pos: int, size_bits: int) -> tuple[np.ndarray, int]:
    n = 2 << size_bits  # 2**(size_bits+1) entries
    raw = data[pos : pos + 3 * n]
    if len(raw) != 3 * n:
        raise GifUnsupported("truncated color table")
    return np.frombuffer(raw, dtype=np.uint8).reshape(n, 3).copy(), pos + 3 * n


def decode_gif_frames(data: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """GIF bytes → list of composited RGB canvases (H, W, 3) uint8, one
    per image block, honoring frame offsets, local color tables,
    interlace, GCE transparency, and disposal none/keep (0/1) and
    restore-to-background (2). Raises :class:`GifUnsupported` on any
    malformation."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifUnsupported("not a GIF signature")
    if len(data) < 13:
        raise GifUnsupported("truncated logical screen descriptor")
    sw, sh, packed, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise GifUnsupported("zero logical screen dimension")
    if sw * sh > _MAX_PIXELS:
        raise GifUnsupported(f"logical screen {sw}x{sh} exceeds {_MAX_PIXELS} px cap")
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _color_table(data, pos, packed & 0x07)

    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()

    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while True:
        if pos >= len(data):
            raise GifUnsupported("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifUnsupported("truncated extension")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(payload) != 4:
                    raise GifUnsupported("malformed graphic control extension")
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                if disposal >= 3:
                    raise GifUnsupported(f"disposal method {disposal} unsupported")
                transparent = payload[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise GifUnsupported(f"unknown block introducer 0x{block:02x}")
        if max_frames is not None and len(frames) >= max_frames:
            # Caller asked for a prefix (e.g. decode_gif's first frame):
            # stop parsing and return what we have — an animated GIF is
            # valid input, not a malformation (r06 advice).
            return frames
        if len(frames) >= _MAX_FRAMES:
            raise GifUnsupported("frame count cap exceeded")
        if pos + 9 > len(data):
            raise GifUnsupported("truncated image descriptor")
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iw == 0 or ih == 0:
            raise GifUnsupported("zero image dimension")
        if ix + iw > sw or iy + ih > sh:
            raise GifUnsupported("image escapes logical screen")
        lct = None
        if ipacked & 0x80:
            lct, pos = _color_table(data, pos, ipacked & 0x07)
        palette = lct if lct is not None else gct
        if palette is None:
            raise GifUnsupported("image with no color table")
        if pos >= len(data):
            raise GifUnsupported("missing LZW min code size")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(min_code, lzw, iw * ih).reshape(ih, iw)
        if idx.max(initial=0) >= len(palette):
            raise GifUnsupported("color index beyond palette")
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        rgb = palette[idx]  # (ih, iw, 3)
        region = canvas[iy : iy + ih, ix : ix + iw]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        transparent = -1
        disposal = 0
    if not frames:
        raise GifUnsupported("GIF contains no image block")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as (H, W, 3) uint8 RGB."""
    return decode_gif_frames(data, max_frames=1)[0]


# --------------------------------------------------------------------------
# encoder (fixtures + round-trip tests)
# --------------------------------------------------------------------------


def _write_sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    frames: list[np.ndarray] | None = None,
    transparent: int | None = None,
) -> bytes:
    """Index array (H, W) + palette (N, 3) → GIF89a bytes via the real
    LZW compressor. ``frames`` appends extra full-frame image blocks
    (each preceded by a graphic-control extension when ``transparent``
    is set), producing a minimal animation."""
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    if n < 2 or n > 256 or (n & (n - 1)):
        raise ValueError("palette size must be a power of two in [2, 256]")
    size_bits = n.bit_length() - 2  # log2(n) - 1
    all_frames = [np.asarray(indices, dtype=np.uint8)] + [
        np.asarray(f, dtype=np.uint8) for f in (frames or [])
    ]
    h, w = all_frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
    out += palette.tobytes()
    min_code = max(2, (n - 1).bit_length())
    for fi, fr in enumerate(all_frames):
        if fr.shape != (h, w):
            raise ValueError("all frames must share the logical screen size")
        if fr.max(initial=0) >= n:
            raise ValueError("index beyond palette")
        if transparent is not None and fi > 0:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent & 0xFF, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        rows = fr
        if interlace:
            order = [
                y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
            ]
            rows = fr[order]
        out.append(min_code)
        out += _write_sub_blocks(_lzw_encode(min_code, rows.reshape(-1)))
    out.append(0x3B)
    return bytes(out)
