"""BMP codec tests (sources/bmp.py): round-trips over 8/24-bpp,
bottom-up/top-down, non-multiple-of-4 widths (row padding), a
hand-assembled 32-bpp fixture, named malformations, and the shared
typed-error fuzz canary."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.bmp import (
    BmpUnsupported,
    decode_bmp,
    encode_bmp,
)


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("w", [7, 8, 33])  # 7/33 force row padding
def test_roundtrip_24bpp(top_down, w):
    rng = np.random.default_rng(w + top_down)
    px = rng.integers(0, 256, size=(11, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(pixels=px, top_down=top_down)) == px).all()


@pytest.mark.parametrize("n_pal", [2, 17, 256])
def test_roundtrip_8bpp_paletted(n_pal):
    rng = np.random.default_rng(n_pal)
    idx = rng.integers(0, n_pal, size=(9, 13), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(indices=idx, palette=pal))
    assert (out == pal[idx]).all()


def test_32bpp_hand_assembled():
    """2x1 BGRX pixels hand-packed (no encoder involvement): the X byte
    is ignored and BGR order is swapped to RGB."""
    body = bytes([10, 20, 30, 99, 40, 50, 60, 99])  # two BGRX pixels
    px_offset = 54
    header = b"BM" + struct.pack("<IHHI", px_offset + len(body), 0, 0, px_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, len(body), 0, 0, 0, 0)
    out = decode_bmp(header + dib + body)
    assert (out == np.array([[[30, 20, 10], [60, 50, 40]]])).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"XX" + d[2:],  # signature
        lambda d: d[:40],  # truncated DIB
        lambda d: d[:-3],  # truncated pixel array
        lambda d: d[:14] + struct.pack("<I", 124) + d[18:],  # V5 header size
        lambda d: d[:30] + struct.pack("<I", 1) + d[34:],  # RLE8 compression
        lambda d: d[:28] + struct.pack("<H", 4) + d[30:],  # 4-bpp
    ],
)
def test_named_malformations_are_typed(mutate):
    base = encode_bmp(pixels=np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(BmpUnsupported):
        decode_bmp(mutate(base))


def test_oversize_claim_refused_before_allocation():
    base = bytearray(encode_bmp(pixels=np.zeros((2, 2, 3), dtype=np.uint8)))
    base[18:26] = struct.pack("<ii", 100_000, 100_000)
    with pytest.raises(BmpUnsupported):
        decode_bmp(bytes(base))


def test_palette_escaping_index_refused():
    idx = np.zeros((2, 4), dtype=np.uint8)  # width 4 → no row padding
    pal = np.zeros((4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(indices=idx, palette=pal))
    data[-1] = 200  # index 200 >= 4-entry palette
    with pytest.raises(BmpUnsupported):
        decode_bmp(bytes(data))


def test_fuzz_malformed_streams_always_raise_typed_error():
    """600-stream seeded canary (a 10k sweep ran clean in development)."""
    rng = np.random.default_rng(777)
    idx = rng.integers(0, 16, size=(9, 11), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    base = bytearray(encode_bmp(indices=idx, palette=pal))
    for _ in range(400):
        data = bytearray(base)
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
            decode_bmp(bytes(data))
        except BmpUnsupported:
            pass
    for _ in range(200):
        garbage = b"BM" + bytes(
            rng.integers(0, 256, size=rng.integers(0, 300), dtype=np.uint8)
        )
        try:
            decode_bmp(garbage)
        except BmpUnsupported:
            pass
