"""Pure-stdlib RIFF/WAVE (WAV) codec — the audio-container twin of
sources/png.py and sources/jpeg.py (r06): narrows the multimodal
``DecodeUnavailable`` gate to genuinely compressed codecs (FLAC/MP3/
video containers).  The reference pipeline has no audio surface
(its binary artifacts are DOCX/PDF, report_generator.py:64-65); this
exists for the training-data-pipeline lane (SURVEY §2.9 X7), where ASR
corpora arrive as WAV shards.

Scope:
- RIFF/WAVE with ``fmt `` + ``data`` chunks in any order, unknown
  chunks skipped, odd-sized chunks word-aligned per the RIFF spec;
- PCM (format 1) at 8 (unsigned), 16, 24, 32-bit signed little-endian,
  and IEEE float (format 3) at 32/64-bit, any channel count;
- WAVE_FORMAT_EXTENSIBLE, ADPCM, mu-law and every compressed format →
  ``WavUnsupported``.

Contract: ANY malformed/unsupported payload raises ``WavUnsupported``
— never a bare struct.error/ValueError — so pipeline pass-through
gates stay typed (same fuzz methodology as the image codecs).
Determinism: integer PCM decodes to exact int32 (8-bit is re-centered
by -128, 24-bit sign-extended); no float rounding anywhere on the
integer paths, so energy/statistics aggregates are arithmetic-oracle
verifiable.
"""

from __future__ import annotations

import struct

import numpy as np

# Refuse data chunks claiming more than this many bytes of samples
# before any allocation (the image codecs' _MAX_PIXELS analogue).
_MAX_DATA_BYTES = 1 << 28  # 256 MB ≈ 25 min of 48 kHz stereo s16


class WavUnsupported(ValueError):
    """Payload is not a WAV this codec handles (compressed format,
    truncated chunk, malformed header, ...)."""


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to ``(samples, sample_rate)`` where
    ``samples`` is ``(n_frames, channels)`` — int32 for PCM (8-bit
    re-centered to signed, 24-bit sign-extended), float64 for IEEE
    float streams."""
    try:
        return _decode_wav_impl(data)
    except WavUnsupported:
        raise
    except (struct.error, ValueError, IndexError, ZeroDivisionError) as e:
        raise WavUnsupported(f"malformed stream: {e}") from e


def wav_pcm_info(data: bytes) -> tuple[bytes, int, int]:
    """Container-level parse for the chunking path: ``(pcm_bytes,
    sample_rate, block_align)`` with the same typed-error contract and
    format validation as :func:`decode_wav`, but the data chunk stays
    raw bytes (chunk boundaries must slice the stored stream, not a
    widened sample array)."""
    try:
        fmt, pcm = _parse_wav(data)
    except WavUnsupported:
        raise
    except (struct.error, ValueError, IndexError, ZeroDivisionError) as e:
        raise WavUnsupported(f"malformed stream: {e}") from e
    _, _, rate, _, block_align, _ = fmt
    return pcm[: len(pcm) // block_align * block_align], rate, block_align


def _parse_wav(data: bytes) -> tuple[tuple, bytes]:
    """RIFF walk + format validation; returns (fmt tuple, data bytes)."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavUnsupported("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise WavUnsupported("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise WavUnsupported("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data" and pcm is None:
            if size > _MAX_DATA_BYTES:
                raise WavUnsupported("data chunk exceeds byte cap")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavUnsupported("missing fmt chunk")
    if pcm is None:
        raise WavUnsupported("missing data chunk")
    audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt
    if channels < 1 or rate < 1:
        raise WavUnsupported("invalid channel count or sample rate")
    if audio_fmt == 1:  # integer PCM
        if bits not in (8, 16, 24, 32):
            raise WavUnsupported(f"{bits}-bit PCM")
    elif audio_fmt == 3:  # IEEE float
        if bits not in (32, 64):
            raise WavUnsupported(f"{bits}-bit float")
    else:
        raise WavUnsupported(f"compressed/extensible format {audio_fmt}")
    if block_align != channels * (bits // 8):
        raise WavUnsupported("block align disagrees with channels*width")
    return fmt, pcm


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    fmt, pcm = _parse_wav(data)
    audio_fmt, channels, rate, _byte_rate, block_align, bits = fmt
    n_frames = len(pcm) // block_align
    pcm = pcm[: n_frames * block_align]
    if audio_fmt == 3:
        samples = np.frombuffer(pcm, dtype="<f4" if bits == 32 else "<f8").astype(
            np.float64
        )
    elif bits == 8:
        samples = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 24:
        b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = np.where(v >= 1 << 23, v - (1 << 24), v)
    else:
        samples = np.frombuffer(pcm, dtype="<i2" if bits == 16 else "<i4").astype(
            np.int32
        )
    return samples.reshape(n_frames, channels), rate


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16, audio_fmt: int = 1
) -> bytes:
    """Fixture writer: ``(n_frames, channels)`` samples (signed values
    for PCM — 8-bit is stored unsigned per the spec; floats for format
    3) to a canonical RIFF/WAVE byte stream."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    width = bits // 8
    if audio_fmt == 1:
        if bits == 8:
            raw = (samples.astype(np.int64) + 128).astype(np.uint8).tobytes()
        elif bits == 24:
            v = samples.astype(np.int64)
            v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
            b = np.zeros((v.size, 3), dtype=np.uint8)
            flat = v.reshape(-1)
            b[:, 0] = flat & 0xFF
            b[:, 1] = (flat >> 8) & 0xFF
            b[:, 2] = (flat >> 16) & 0xFF
            raw = b.tobytes()
        else:
            raw = samples.astype("<i2" if bits == 16 else "<i4").tobytes()
    elif audio_fmt == 3:
        raw = samples.astype("<f4" if bits == 32 else "<f8").tobytes()
    else:
        raise ValueError("audio_fmt must be 1 (PCM) or 3 (IEEE float)")
    block_align = channels * width
    fmt = struct.pack(
        "<HHIIHH", audio_fmt, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        chunks += b"\x00"  # word alignment pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
