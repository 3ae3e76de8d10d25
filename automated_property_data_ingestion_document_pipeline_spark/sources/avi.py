"""Pure-stdlib AVI (RIFF) container parser for MJPEG video — the video
half of the multimodal decode story (r06): an MJPEG AVI is a RIFF tree
whose movi chunks are ordinary baseline JPEGs, so frame extraction is a
container walk and per-frame decode reuses sources/jpeg.py.  With this,
``sample_frames(fake=False)`` does REAL keyframe extraction and the
``DecodeUnavailable`` gate shrinks to lossy codecs (MP3/AAC/H.264...)
— formats that genuinely need external decoders.

Scope:
- RIFF/'AVI ' with LIST hdrl (avih parsed for dims/frame count, strh
  validated as a 'vids'/'MJPG' stream) and LIST movi whose '..dc' /
  '..db' chunks carry the frame payloads (word-aligned, idx1 and all
  other chunks skipped);
- anything else (DV/XviD/H.264 handlers, missing lists, truncated
  chunks) → ``AviUnsupported``.

Contract matches the sibling codecs: ANY malformed payload raises
``AviUnsupported``, never a bare struct.error; a frame-count/dimension
cap guards allocation before the movi walk.
"""

from __future__ import annotations

import struct

_MAX_FRAMES = 1 << 20
_MJPEG_HANDLERS = (b"MJPG", b"mjpg", b"MJPA", b"dmb1")


class AviUnsupported(ValueError):
    """Payload is not an MJPEG AVI this parser handles."""


def avi_mjpeg_frames(data: bytes) -> tuple[list[bytes], int, int]:
    """Parse an MJPEG AVI; returns ``(frames, width, height)`` where
    ``frames`` are the raw JPEG payloads in stream order (decode each
    with sources/jpeg.decode_jpeg)."""
    try:
        return _parse_avi(data)
    except AviUnsupported:
        raise
    except (struct.error, ValueError, IndexError) as e:
        raise AviUnsupported(f"malformed stream: {e}") from e


def _parse_avi(data: bytes) -> tuple[list[bytes], int, int]:
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviUnsupported("not a RIFF/AVI stream")
    width = height = total_frames = None
    handler_ok = False
    frames: list[bytes] = []

    def walk(pos: int, end: int, depth: int) -> None:
        nonlocal width, height, total_frames, handler_ok
        if depth > 8:
            raise AviUnsupported("RIFF nesting too deep")
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > end:
                raise AviUnsupported("truncated chunk")
            if cid == b"LIST":
                ltype = data[body_start : body_start + 4]
                walk(body_start + 4, body_start + size, depth + 1)
                del ltype
            elif cid == b"avih":
                if size < 40:
                    raise AviUnsupported("short avih header")
                fields = struct.unpack("<10I", data[body_start : body_start + 40])
                total_frames = fields[4]
                width, height = fields[8], fields[9]
                if total_frames > _MAX_FRAMES:
                    raise AviUnsupported("frame count exceeds cap")
            elif cid == b"strh":
                if size < 8:
                    raise AviUnsupported("short strh header")
                fcc_type = data[body_start : body_start + 4]
                fcc_handler = data[body_start + 4 : body_start + 8]
                if fcc_type == b"vids":
                    if fcc_handler not in _MJPEG_HANDLERS:
                        raise AviUnsupported(
                            f"video handler {fcc_handler!r} is not MJPEG"
                        )
                    handler_ok = True
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append(data[body_start : body_start + size])
                if len(frames) > _MAX_FRAMES:
                    raise AviUnsupported("frame count exceeds cap")
            pos = body_start + size + (size & 1)  # word alignment

    walk(12, len(data), 0)
    if width is None:
        raise AviUnsupported("missing avih header")
    if not handler_ok:
        raise AviUnsupported("no MJPEG video stream declared")
    if total_frames is not None and total_frames and len(frames) != total_frames:
        raise AviUnsupported("movi frame count disagrees with avih")
    return frames, width, height


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Fixture writer: wrap pre-encoded JPEG payloads in a minimal but
    spec-shaped MJPEG AVI (RIFF → hdrl[avih, strl[strh, strf]] →
    movi['00dc' ...])."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us_per_frame = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<10I", us_per_frame, max_bytes * fps, 0, 0x10, len(frames), 0, 1,
        max_bytes, width, height,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                        len(frames), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
