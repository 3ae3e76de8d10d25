"""Pure-stdlib PNG codec (VERDICT r03 #5): one REAL executable pixel
path for the multimodal operators — no PIL/ffmpeg in this container, but
PNG is just zlib + per-scanline filters (RFC 2083), both stdlib-doable.

Scope, kept deliberately tight: 8-bit depth, color types 0 (gray),
2 (RGB), 6 (RGBA); no interlacing, no palette. Everything else raises
``PngUnsupported`` so callers fall through to the existing
``DecodeUnavailable`` gate. The decoder is the operator-facing surface
(``decode_png`` → numpy HxWxC); the encoder exists to build fixtures and
to round-trip-test the decoder, and can emit any filter type per row so
the Sub/Up/Average/Paeth unfilter paths are all exercised.

Used by :func:`sources.binary.resize_image` (nearest-neighbor resize on
REAL pixels when the payload is a supported PNG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


class PngUnsupported(ValueError):
    """Payload is not a PNG this codec handles (wrong signature, palette,
    16-bit, interlaced, ...)."""


def _chunks(data: bytes):
    if data[:8] != _SIGNATURE:
        raise PngUnsupported("not a PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngUnsupported("truncated chunk")
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            raise PngUnsupported("truncated chunk CRC")
        (crc,) = struct.unpack(">I", crc_bytes)
        if crc != zlib.crc32(ctype + body):
            raise PngUnsupported(f"bad CRC in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngUnsupported("missing IEND")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → ``uint8`` array of shape (H, W, channels). Supports
    8-bit gray/RGB/RGBA, non-interlaced; raises :class:`PngUnsupported`
    otherwise. Filters are undone per scanline; Sub/Average/Paeth need
    the previous PIXEL so those rows run a short per-pixel loop, while
    None/Up rows (what most encoders emit for synthetic data) stay
    vectorized."""
    width = height = None
    color_type = None
    idat = bytearray()
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            if len(body) != 13:
                raise PngUnsupported("malformed IHDR")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngUnsupported(f"bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngUnsupported(f"color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngUnsupported("nonstandard compression/filter method")
            if interlace != 0:
                raise PngUnsupported("interlaced")
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise PngUnsupported("missing IHDR")
    ch = _CHANNELS[color_type]
    stride = width * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # corrupt deflate stream that slipped past the per-chunk CRCs
        # (e.g. bytes inserted at a chunk boundary): keep the decode
        # contract typed so pipeline gates pass through instead of
        # killing the task (same fuzz discipline as decode_jpeg).
        raise PngUnsupported(f"corrupt deflate stream: {e}") from e
    if len(raw) != height * (stride + 1):
        raise PngUnsupported("decompressed size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        cur = rows[y]
        up = out[y - 1] if y else zero_row
        if f == 0:  # None
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + up  # uint8 wraps = mod 256, per spec
        elif f in (1, 3, 4):  # Sub / Average / Paeth: need prior pixel
            line = out[y]
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                if f == 1:
                    line[x] = (int(cur[x]) + int(left)) & 0xFF
                elif f == 3:
                    line[x] = (int(cur[x]) + ((int(left) + int(up[x])) >> 1)) & 0xFF
                else:
                    ul = int(out[y - 1][x - ch]) if (x >= ch and y) else 0
                    p = int(left) + int(up[x]) - ul
                    pa, pb, pc = abs(p - int(left)), abs(p - int(up[x])), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up[x] if pb <= pc else ul)
                    line[x] = (int(cur[x]) + int(pred)) & 0xFF
        else:
            raise PngUnsupported(f"filter {f}")
    return out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """``uint8`` (H, W, C) array → PNG bytes, C ∈ {1, 3, 4}. One filter
    type for every scanline (0/1/2/3/4) — not an optimizing encoder, a
    correctness tool: emitting each filter lets the decoder's unfilter
    paths be tested against independently-constructed input."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise PngUnsupported(f"{ch} channels")
    px = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(h, w * ch)
    lines = bytearray()
    zero_row = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = px[y]
        up = px[y - 1] if y else zero_row
        left = np.concatenate((np.zeros(ch, np.uint8), cur[:-ch])) if w * ch > ch else np.zeros(w * ch, np.uint8)
        ul = (
            np.concatenate((np.zeros(ch, np.uint8), up[:-ch]))
            if w * ch > ch
            else np.zeros(w * ch, np.uint8)
        )
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = cur - left
        elif filter_type == 2:
            enc = cur - up
        elif filter_type == 3:
            enc = cur - ((left.astype(np.uint16) + up.astype(np.uint16)) >> 1).astype(
                np.uint8
            )
        elif filter_type == 4:
            enc = cur - _paeth(left, up, ul)
        else:
            raise PngUnsupported(f"filter {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, target_h: int, target_w: int) -> np.ndarray:
    """Nearest-neighbor resize on a decoded (H, W, C) array — real pixel
    math with no deps; the standard cheap pre-filter for vision-model
    ingest (bilinear/bicubic belong to the model-side preprocessors)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return pixels[ys][:, xs]
