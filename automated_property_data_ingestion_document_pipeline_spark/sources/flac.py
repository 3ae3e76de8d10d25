"""Pure-stdlib FLAC (subset) codec — the compressed-audio follow-up to
sources/wav.py (r06): narrows the multimodal ``DecodeUnavailable`` gate
further, to lossy codecs (MP3/AAC) and video containers.  Same
methodology as the PNG/JPEG/WAV lanes: the decoder is the operator
surface, the encoder exists to build fixtures whose decode must
reproduce hand-chosen sample arrays EXACTLY (FLAC is lossless — any
bit error in the rice/prediction machinery flips a sample).

Scope (everything else raises ``FlacUnsupported``):
- native FLAC streams: "fLaC" magic, STREAMINFO + skipped metadata
  blocks, fixed-blocksize frames with UTF-8 frame numbers and CRC-8 /
  CRC-16 verification (a failed CRC is a typed error, never garbage
  samples);
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 with rice-coded
  residuals (4- and 5-bit parameter variants, partition orders 0-15,
  escape partitions with raw-bit residuals), wasted-bits shift;
- stereo decorrelation: independent, left/side, side/right, mid/side;
- LPC subframes (types 32-63), variable blocking strategy, and
  sample sizes other than 8/16/24 bits are out of scope → typed error
  (libFLAC's default encodes use LPC; this decoder targets the
  fixed-predictor subset the fixture encoder and many capture
  pipelines emit).

Determinism: everything is integer arithmetic end-to-end; decode
returns int32 ``(n_frames, channels)`` exactly equal to what the
encoder packed, so energy/statistics aggregates are arithmetic-oracle
verifiable like q_wav_energy.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_TOTAL_SAMPLES = 1 << 26  # ~64M samples/channel cap before allocation


class FlacUnsupported(ValueError):
    """Payload is not a FLAC stream this codec handles (LPC, lossy-era
    extensions, malformed/corrupt data, CRC mismatch, ...)."""


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over a byte buffer with position tracking
    (FLAC's entropy layer has no byte stuffing, unlike JPEG's)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise FlacUnsupported("truncated frame data")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise FlacUnsupported("runaway unary code")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's extended UTF-8 coded frame number (up to 36 bits)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise FlacUnsupported("invalid UTF-8 frame number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise FlacUnsupported("invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_SIZE_CODE = {1: 8, 4: 16, 6: 24}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a (subset) FLAC payload to ``(samples, sample_rate)``
    with ``samples`` int32 of shape ``(n_frames, channels)``."""
    try:
        return _decode_flac_impl(data)
    except FlacUnsupported:
        raise
    except (struct.error, ValueError, IndexError, ZeroDivisionError) as e:
        raise FlacUnsupported(f"malformed stream: {e}") from e


def _decode_flac_impl(data: bytes) -> tuple[np.ndarray, int]:
    if len(data) < 4 or data[:4] != b"fLaC":
        raise FlacUnsupported("not a FLAC stream")
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise FlacUnsupported("truncated metadata header")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise FlacUnsupported("truncated metadata block")
        if btype == 0:
            if blen < 34:
                raise FlacUnsupported("short STREAMINFO")
            streaminfo = body
        pos += 4 + blen
    if streaminfo is None:
        raise FlacUnsupported("missing STREAMINFO")
    si = _Bits(streaminfo)
    min_bs = si.read(16)
    max_bs = si.read(16)
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    if rate < 1:
        raise FlacUnsupported("invalid sample rate")
    if bps not in (8, 16, 24):
        raise FlacUnsupported(f"{bps}-bit samples")
    if min_bs != max_bs:
        raise FlacUnsupported("variable blocksize streams")
    if total * channels > _MAX_TOTAL_SAMPLES:
        raise FlacUnsupported("stream exceeds sample cap")
    out = np.zeros((total, channels), dtype=np.int32)
    got = 0
    while pos < len(data):
        if got >= total:
            break
        pos, block = _decode_frame(data, pos, channels, bps)
        n = block.shape[0]
        if got + n > total:
            raise FlacUnsupported("frames exceed STREAMINFO total")
        out[got : got + n] = block
        got += n
    if got != total:
        raise FlacUnsupported("stream ends before STREAMINFO total")
    return out, rate


def _decode_frame(data: bytes, pos: int, channels: int, bps: int):
    start = pos
    bits = _Bits(data, pos)
    sync = bits.read(14)
    if sync != 0x3FFE:
        raise FlacUnsupported("bad frame sync")
    if bits.read(1):
        raise FlacUnsupported("reserved bit set")
    if bits.read(1):
        raise FlacUnsupported("variable blocking strategy")
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise FlacUnsupported("reserved frame bit set")
    _read_utf8_number(bits)
    if bs_code == 0:
        raise FlacUnsupported("reserved blocksize code")
    if bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODE[bs_code]
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    elif sr_code == 15:
        raise FlacUnsupported("invalid sample rate code")
    if ss_code in _SAMPLE_SIZE_CODE:
        if _SAMPLE_SIZE_CODE[ss_code] != bps:
            raise FlacUnsupported("frame sample size disagrees with STREAMINFO")
    elif ss_code != 0:
        raise FlacUnsupported("unsupported sample size code")
    # CRC-8 covers the header bytes up to (not including) the CRC byte
    bits.align()
    hdr_end = bits.byte
    if _crc8(data[start:hdr_end]) != bits.read(8):
        raise FlacUnsupported("frame header CRC mismatch")
    if ch_code < 8:
        if ch_code + 1 != channels:
            raise FlacUnsupported("frame channel count disagrees")
        chans = [_decode_subframe(bits, blocksize, bps) for _ in range(channels)]
        block = np.column_stack(chans)
    elif ch_code in (8, 9, 10):
        if channels != 2:
            raise FlacUnsupported("stereo decorrelation in non-stereo stream")
        extra = (0, 1) if ch_code == 8 else ((1, 0) if ch_code == 9 else (0, 1))
        a = _decode_subframe(bits, blocksize, bps + extra[0])
        b = _decode_subframe(bits, blocksize, bps + extra[1])
        if ch_code == 8:  # left/side: right = left - side
            left, side = a, b
            right = left - side
        elif ch_code == 9:  # side/right: left = right + side
            side, right = a, b
            left = right + side
        else:  # mid/side
            mid, side = a, b
            left = mid + ((side + (side & 1)) >> 1)
            right = left - side
        block = np.column_stack([left, right])
    else:
        raise FlacUnsupported(f"reserved channel assignment {ch_code}")
    bits.align()
    if _crc16(data[start : bits.byte]) != bits.read(16):
        raise FlacUnsupported("frame CRC-16 mismatch")
    return bits.byte, block.astype(np.int32)


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise FlacUnsupported("subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
        if bps < 1:
            raise FlacUnsupported("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = bits.read_signed(bps)
        samples = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        samples = np.array(
            [bits.read_signed(bps) for _ in range(blocksize)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise FlacUnsupported("predictor order exceeds blocksize")
        warm = [bits.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        samples = np.empty(blocksize, dtype=np.int64)
        samples[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, blocksize):
            p = 0
            for j, c in enumerate(coeffs):
                p += c * samples[i - 1 - j]
            samples[i] = resid[i - order] + p
    elif stype >= 32:
        raise FlacUnsupported("LPC subframes out of scope")
    else:
        raise FlacUnsupported(f"reserved subframe type {stype}")
    if wasted:
        samples = samples << wasted
    return samples


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise FlacUnsupported("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise FlacUnsupported("partition order does not divide blocksize")
    out: list[int] = []
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise FlacUnsupported("predictor order exceeds first partition")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            out.extend(bits.read_signed(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # unzigzag
    return out


# --- fixture encoder ---------------------------------------------------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes) & 0xFF) | (n >> (6 * (nbytes - 1)))
    out.append(lead & 0xFF)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _encode_residual(w: _BitW, resid: list[int], blocksize: int, order: int,
                     porder: int, param: int | None, escape_raw: int | None) -> None:
    """Rice-code `resid` with a single parameter per partition; if
    ``escape_raw`` is set, every partition uses the escape (raw bits).
    ``param=None`` auto-selects ≈log2(mean zigzag) so the unary
    quotients stay O(1) bits regardless of residual magnitude."""
    if param is None:
        mean_zz = (2 * sum(abs(v) for v in resid) // max(len(resid), 1)) or 1
        param = min(int(mean_zz).bit_length() - 1, 30)
    method = 1 if param >= 15 else 0
    w.write(method, 2)
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    w.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if escape_raw is not None:
            w.write(escape, plen)
            w.write(escape_raw, 5)
            for _ in range(n):
                v = resid[idx]
                if escape_raw == 0 and v != 0 or escape_raw and not (
                    -(1 << (escape_raw - 1)) <= v < 1 << (escape_raw - 1)
                ):
                    raise ValueError(
                        f"residual {v} does not fit {escape_raw} raw bits"
                    )
                w.write_signed(v, escape_raw)
                idx += 1
        else:
            w.write(param, plen)
            for _ in range(n):
                v = resid[idx]
                idx += 1
                zz = ((-v << 1) - 1) if v < 0 else (v << 1)  # zigzag
                w.unary(zz >> param)
                if param:
                    w.write(zz & ((1 << param) - 1), param)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bps: int = 16,
    blocksize: int = 256,
    subframe: str = "fixed2",
    stereo_mode: str = "independent",
    rice_param: int | None = None,
    partition_order: int = 0,
    escape_raw: int | None = None,
    wasted: int = 0,
) -> bytes:
    """Fixture writer: pack exact samples into a decodable FLAC stream.
    ``subframe``: constant|verbatim|fixed0..fixed4 (constant requires
    genuinely constant input per block/channel). ``stereo_mode``:
    independent|left_side|side_right|mid_side (2 channels only).
    ``wasted`` shifts samples right by k bits on encode (caller must
    pass samples whose low k bits are zero)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    total, channels = samples.shape
    w_hdr = _BitW()
    w_hdr.write(blocksize, 16)
    w_hdr.write(blocksize, 16)
    w_hdr.write(0, 24)
    w_hdr.write(0, 24)
    w_hdr.write(sample_rate, 20)
    w_hdr.write(channels - 1, 3)
    w_hdr.write(bps - 1, 5)
    w_hdr.write(total, 36)
    w_hdr.align()
    streaminfo = bytes(w_hdr.out) + b"\x00" * 16  # md5 unset (all zero)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    order = {"constant": 0, "verbatim": 0}.get(subframe)
    if order is None:
        if not subframe.startswith("fixed"):
            raise ValueError("subframe must be constant|verbatim|fixedN")
        order = int(subframe[5:])

    def write_subframe(w: _BitW, chan: np.ndarray, eff_bps: int) -> None:
        vals = chan.astype(np.int64)
        if wasted:
            if ((vals & ((1 << wasted) - 1)) != 0).any():
                raise ValueError("wasted bits require zero low bits")
            vals = vals >> wasted
        w.write(0, 1)  # padding
        if subframe == "constant":
            if not (vals == vals[0]).all():
                raise ValueError("constant subframe needs constant samples")
            w.write(0, 6)
            _write_wasted(w)
            w.write_signed(int(vals[0]), eff_bps - wasted)
        elif subframe == "verbatim":
            w.write(1, 6)
            _write_wasted(w)
            for v in vals:
                w.write_signed(int(v), eff_bps - wasted)
        else:
            w.write(8 + order, 6)
            _write_wasted(w)
            for v in vals[:order]:
                w.write_signed(int(v), eff_bps - wasted)
            coeffs = _FIXED_COEFFS[order]
            resid = []
            for i in range(order, len(vals)):
                p = sum(c * int(vals[i - 1 - j]) for j, c in enumerate(coeffs))
                resid.append(int(vals[i]) - p)
            _encode_residual(
                w, resid, len(vals), order, partition_order, rice_param, escape_raw
            )

    def _write_wasted(w: _BitW) -> None:
        if wasted:
            w.write(1, 1)
            w.unary(wasted - 1)
        else:
            w.write(0, 1)

    nblocks = -(-total // blocksize) if total else 0
    for f in range(nblocks):
        chunk = samples[f * blocksize : (f + 1) * blocksize]
        bs = chunk.shape[0]
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # blocksize: 16-bit field
        w.write(0, 4)  # sample rate: from STREAMINFO
        if stereo_mode == "independent" or channels != 2:
            w.write(channels - 1, 4)
        else:
            w.write({"left_side": 8, "side_right": 9, "mid_side": 10}[stereo_mode], 4)
        w.write({8: 1, 16: 4, 24: 6}[bps], 3)
        w.write(0, 1)
        # frame number (UTF-8) — write via bytes into the bitstream
        for b in _utf8_number(f):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.align()
        w.out.append(_crc8(bytes(w.out)))
        if stereo_mode == "independent" or channels != 2:
            for c in range(channels):
                write_subframe(w, chunk[:, c], bps)
        else:
            left = chunk[:, 0].astype(np.int64)
            right = chunk[:, 1].astype(np.int64)
            side = left - right
            if stereo_mode == "left_side":
                a, abits = left, bps
                b_, bbits = side, bps + 1
            elif stereo_mode == "side_right":
                a, abits = side, bps + 1
                b_, bbits = right, bps
            else:
                mid = (left + right) >> 1
                a, abits = mid, bps
                b_, bbits = side, bps + 1
            write_subframe(w, a, abits)
            write_subframe(w, b_, bbits)
        w.align()
        crc = _crc16(bytes(w.out))
        w.out += crc.to_bytes(2, "big")
        out += w.out
    return bytes(out)
