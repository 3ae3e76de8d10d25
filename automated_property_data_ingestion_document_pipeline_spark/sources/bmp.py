"""Pure-stdlib BMP codec (r06): BITMAPINFOHEADER decode for the
multimodal operators — with PNG/JPEG/GIF this completes the
still-image formats a crawl corpus contains in volume (reference S5
binary blobs; App.js:252 upload surface).

Scope: uncompressed BI_RGB with 8-bpp (paletted), 24-bpp (BGR), and
32-bpp (BGRX) pixels, bottom-up and top-down row order, 4-byte row
padding, clrUsed-sized palettes. Anything else — RLE/bitfields
compression, 1/4/16-bpp, core/V4/V5 headers with non-40 sizes,
truncations, palette-escaping indices — raises :class:`BmpUnsupported`,
the same typed-error contract as the PNG/JPEG/GIF codecs. The encoder
builds fixtures and round-trip-tests both pixel formats.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64 * 1024 * 1024


class BmpUnsupported(ValueError):
    """Payload is not a BMP this codec handles."""


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3) uint8 RGB. Raises :class:`BmpUnsupported`
    on any malformation or unsupported variant."""
    data = bytes(data)
    if len(data) < 54:
        raise BmpUnsupported("truncated header")
    if data[:2] != b"BM":
        raise BmpUnsupported("not a BMP signature")
    (px_offset,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size != 40:
        raise BmpUnsupported(f"unsupported DIB header size {hdr_size}")
    width, height, planes, bpp, compression, _img_size, _xp, _yp, clr_used, _clr_imp = (
        struct.unpack("<iiHHIIiiII", data[18:54])
    )
    if planes != 1:
        raise BmpUnsupported(f"planes={planes}")
    if compression != 0:
        raise BmpUnsupported(f"compression {compression} unsupported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise BmpUnsupported(f"{bpp}-bpp unsupported")
    top_down = height < 0
    h = -height if top_down else height
    if width <= 0 or h == 0:
        raise BmpUnsupported("non-positive dimensions")
    if width * h > _MAX_PIXELS:
        raise BmpUnsupported(f"{width}x{h} exceeds {_MAX_PIXELS} px cap")

    palette = None
    if bpp == 8:
        n = clr_used or 256
        if not 1 <= n <= 256:
            raise BmpUnsupported(f"palette size {n}")
        raw = data[54 : 54 + 4 * n]
        if len(raw) != 4 * n:
            raise BmpUnsupported("truncated palette")
        quads = np.frombuffer(raw, dtype=np.uint8).reshape(n, 4)
        palette = quads[:, [2, 1, 0]].copy()  # BGRX → RGB

    row_bytes = (width * bpp // 8 + 3) & ~3
    need = row_bytes * h
    body = data[px_offset : px_offset + need]
    if px_offset < 54 or len(body) != need:
        raise BmpUnsupported("truncated pixel array")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, row_bytes)
    if bpp == 8:
        idx = rows[:, :width]
        if idx.max(initial=0) >= len(palette):
            raise BmpUnsupported("color index beyond palette")
        out = palette[idx]
    else:
        nch = bpp // 8
        px = rows[:, : width * nch].reshape(h, width, nch)
        out = px[:, :, [2, 1, 0]].copy()  # BGR(X) → RGB
    if not top_down:
        out = out[::-1]
    return np.ascontiguousarray(out)


def encode_bmp(
    pixels: np.ndarray | None = None,
    indices: np.ndarray | None = None,
    palette: np.ndarray | None = None,
    top_down: bool = False,
) -> bytes:
    """RGB (H, W, 3) → 24-bpp BMP, or indices (H, W) + palette (N, 3)
    → 8-bpp paletted BMP; bottom-up unless ``top_down``."""
    if (pixels is None) == (indices is None):
        raise ValueError("exactly one of pixels / indices required")
    if pixels is not None:
        px = np.asarray(pixels, dtype=np.uint8)
        h, w, _ = px.shape
        bpp, n_pal = 24, 0
        body_rows = px[:, :, [2, 1, 0]].reshape(h, w * 3)
        pal_bytes = b""
    else:
        idx = np.asarray(indices, dtype=np.uint8)
        pal = np.asarray(palette, dtype=np.uint8)
        h, w = idx.shape
        bpp, n_pal = 8, len(pal)
        body_rows = idx
        quads = np.zeros((n_pal, 4), dtype=np.uint8)
        quads[:, [2, 1, 0]] = pal
        pal_bytes = quads.tobytes()
    row_bytes = (w * bpp // 8 + 3) & ~3
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : body_rows.shape[1]] = body_rows
    if not top_down:
        padded = padded[::-1]
    px_offset = 14 + 40 + len(pal_bytes)
    body = padded.tobytes()
    header = b"BM" + struct.pack("<IHHI", px_offset + len(body), 0, 0, px_offset)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        0,
        len(body),
        2835,
        2835,
        n_pal,
        0,
    )
    return header + dib + pal_bytes + body
