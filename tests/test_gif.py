"""GIF codec tests (sources/gif.py): spec-derived hand-packed decoder
fixtures (independent of the module's own encoder), LZW round-trips
across palette sizes / interlace / dictionary overflow, animation
compositing with disposal + transparency, and the typed-error fuzz
canary shared with the PNG/JPEG codecs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.gif import (
    GifUnsupported,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _wrap_single(
    w: int,
    h: int,
    palette: bytes,
    size_bits: int,
    min_code: int,
    lzw: bytes,
    interlace: bool = False,
) -> bytes:
    """Hand-assemble a single-frame GIF around pre-packed LZW bytes."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
    out += palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    out += bytes([len(lzw)]) + lzw + b"\x00"
    out.append(0x3B)
    return bytes(out)


_PAL4 = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])  # K R G B


def test_hand_packed_kwkwk_stream():
    """Pixels [1,1,1] with min code size 2 → codes 4(clear),1,6,5(EOI)
    at width 3, where 6 is the KwKwK case (code == next slot). Packed
    LSB-first by hand: bits 001|100|011|101 → bytes 0x8C 0x0B."""
    data = _wrap_single(3, 1, _PAL4, 1, 2, bytes([0x8C, 0x0B]))
    px = decode_gif(data)
    assert px.shape == (1, 3, 3)
    assert (px == np.array([[255, 0, 0]] * 3)).all()


def test_hand_packed_literal_stream():
    """Pixels [0,1,2,3]: codes 4,0,1,2 at width 3; reading '2' adds
    slot 7 bringing next_code to 8 = 2^3, so '3' and EOI=5 are read at
    width 4. Hand-packed LSB-first: 001|000|100|010|1100|1010 →
    bytes 0x44 0x34 0x05."""
    data = _wrap_single(4, 1, _PAL4, 1, 2, bytes([0x44, 0x34, 0x05]))
    px = decode_gif(data)
    assert (
        px == np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]])
    ).all()


def test_hand_packed_width_growth():
    """Hand-packed code stream 4,0,1,2 @3 bits then 3,6,8,5 @4 bits for
    pixels [0,1,2,3,0,1,2,3]. Dictionary adds while decoding: read 1 →
    slot 6='01'; read 2 → slot 7='12' (next=8=2^3 → width→4); read 3 @4
    → slot 8='23'; read 6 ('01') → slot 9='30'; read 8 ('23') → slot
    10='012'. Decoding code 8 therefore requires BOTH the post-add
    width bump (else '3' is misread) and prefix-chain expansion of a
    two-deep entry — packed by hand, independent of the encoder."""
    bits = [0,0,1, 0,0,0, 1,0,0, 0,1,0, 1,1,0,0, 0,1,1,0, 0,0,0,1, 1,0,1,0]
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        by.append(b)
    data = _wrap_single(8, 1, _PAL4, 1, 2, bytes(by))
    px = decode_gif(data)
    expect_idx = [0, 1, 2, 3, 0, 1, 2, 3]
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]])
    assert (px == pal[expect_idx]).all()


@pytest.mark.parametrize("ncolors", [2, 4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_sizes_and_interlace(ncolors, interlace):
    rng = np.random.default_rng(ncolors * 2 + interlace)
    h, w = 13, 17
    idx = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    data = encode_gif(idx, pal, interlace=interlace)
    px = decode_gif(data)
    assert (px == pal[idx]).all()


def test_roundtrip_dictionary_overflow_and_deferred_clear():
    """Enough high-entropy pixels to blow past 4096 dictionary slots →
    the encoder's clear-and-reset path and the decoder's 12-bit width
    handling both run."""
    rng = np.random.default_rng(7)
    h, w = 120, 120  # 14.4k pixels of 256-color noise ≫ 4096 slots
    idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)
    px = decode_gif(encode_gif(idx, pal))
    assert (px == pal[idx]).all()


def test_roundtrip_flat_image_best_compression():
    idx = np.zeros((64, 64), dtype=np.uint8)
    pal = np.array([[9, 8, 7], [1, 2, 3]], dtype=np.uint8)
    data = encode_gif(idx, pal)
    assert len(data) < 200  # LZW actually compresses the flat run
    assert (decode_gif(data) == np.array([9, 8, 7])).all()


def test_animation_composite_transparency():
    """Frame 2 overwrites only non-transparent pixels over frame 1's
    canvas (disposal keep)."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [7, 7, 7]], dtype=np.uint8
    )
    f0 = np.full((4, 4), 1, dtype=np.uint8)
    f1 = np.full((4, 4), 3, dtype=np.uint8)  # 3 = transparent
    f1[1, 1] = 2
    data = encode_gif(f0, pal, frames=[f1], transparent=3)
    frames = decode_gif_frames(data)
    assert len(frames) == 2
    assert (frames[0] == [255, 0, 0]).all()
    expect = np.tile(np.array([255, 0, 0], np.uint8), (4, 4, 1))
    expect[1, 1] = [0, 255, 0]
    assert (frames[1] == expect).all()


def test_extensions_skipped():
    """Comment + application extensions before the image are walked via
    sub-blocks and ignored."""
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    data = bytearray(encode_gif(idx, pal))
    ext = bytes([0x21, 0xFE, 5]) + b"hello" + b"\x00"  # comment
    app = bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0" + bytes([3, 1, 0, 0, 0])
    insert_at = 13 + 6  # after LSD + 2-entry GCT
    data[insert_at:insert_at] = ext + app
    px = decode_gif(bytes(data))
    assert (px == pal[idx]).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"JIF" + d[3:],  # signature
        lambda d: d[:10],  # truncated LSD
        lambda d: d[:-1],  # missing trailer
        lambda d: d[:-2] + b"\x00",  # LZW chain cut + fake trailer
    ],
)
def test_named_malformations_are_typed(mutate):
    idx = np.arange(16, dtype=np.uint8).reshape(4, 4)
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    with pytest.raises(GifUnsupported):
        decode_gif(mutate(encode_gif(idx, pal)))


def test_oversize_claim_refused_before_allocation():
    data = bytearray(encode_gif(np.zeros((2, 2), np.uint8), np.zeros((2, 3), np.uint8)))
    data[6:10] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(GifUnsupported):
        decode_gif(bytes(data))


def test_image_escaping_screen_refused():
    data = bytearray(encode_gif(np.zeros((4, 4), np.uint8), np.zeros((2, 3), np.uint8)))
    # image descriptor starts after 6+7 header + 6 GCT; patch left=3
    desc = 13 + 6
    assert data[desc] == 0x2C
    data[desc + 1 : desc + 3] = struct.pack("<H", 3)
    with pytest.raises(GifUnsupported):
        decode_gif(bytes(data))


def test_fuzz_malformed_streams_always_raise_typed_error():
    """600-stream seeded canary (10k sweep ran clean in development):
    byte flips, truncations, insertions, and GIF-signature garbage must
    only ever raise GifUnsupported."""
    rng = np.random.default_rng(321)
    idx = rng.integers(0, 8, size=(9, 11), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    base = bytearray(encode_gif(idx, pal, interlace=True))
    for _ in range(400):
        data = bytearray(base)
        for _m in range(rng.integers(1, 8)):
            op = rng.integers(0, 3)
            if op == 0 and len(data) > 7:
                data[rng.integers(6, len(data))] = rng.integers(0, 256)
            elif op == 1 and len(data) > 10:
                data = data[: rng.integers(6, len(data))]
            else:
                at = int(rng.integers(6, max(len(data), 7)))
                data.insert(min(at, len(data)), int(rng.integers(0, 256)))
        try:
            decode_gif(bytes(data))
        except GifUnsupported:
            pass
    for _ in range(200):
        garbage = b"GIF89a" + bytes(
            rng.integers(0, 256, size=rng.integers(0, 300), dtype=np.uint8)
        )
        try:
            decode_gif(garbage)
        except GifUnsupported:
            pass


def test_resize_image_routes_gif_and_bmp_payloads(spark):
    """Spark-side routing (r06): GIF, BMP, and TIFF payloads decode through
    their codecs inside resize_image (decoded=true, 3 channels, real
    pixels), while undecodable bytes still pass through typed."""
    from automated_property_data_ingestion_document_pipeline_spark.sources.binary import (
        resize_image,
    )
    from automated_property_data_ingestion_document_pipeline_spark.sources.bmp import (
        encode_bmp,
    )
    from automated_property_data_ingestion_document_pipeline_spark.sources.png import (
        decode_png,
        resize_nearest,
    )

    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, size=(12, 10), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    gif_payload = encode_gif(idx, pal, interlace=True)
    bmp_payload = encode_bmp(pixels=pal[idx])
    from automated_property_data_ingestion_document_pipeline_spark.sources.tiff import (
        encode_tiff,
    )
    tiff_payload = encode_tiff(pal[idx], compression=5, big_endian=True)
    rows = [
        (1, gif_payload),
        (2, bmp_payload),
        (3, tiff_payload),
        (99, b"none of the formats"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r["doc_id"]: r for r in resize_image(df, target_h=6, target_w=5).collect()}
    expect = resize_nearest(pal[idx], 6, 5)
    for did in (1, 2, 3):
        r = got[did]
        assert r["decoded"] and (r["height"], r["width"], r["channels"]) == (6, 5, 3)
        assert np.array_equal(decode_png(bytes(r["content"])), expect)
    assert not got[99]["decoded"]


def test_animated_gif_first_frame_prefix_not_refused():
    """r06 advice: decode_gif (max_frames=1) must return the first
    composited frame of an animated GIF, not raise 'frame count cap
    exceeded' — an animation is valid input, not a malformation."""
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [7, 7, 7]], np.uint8)
    f0 = np.full((4, 4), 1, dtype=np.uint8)
    f1 = np.full((4, 4), 2, dtype=np.uint8)
    data = encode_gif(f0, pal, frames=[f1, f1])
    px = decode_gif(data)  # previously raised GifUnsupported
    assert (px == [255, 0, 0]).all()
    assert len(decode_gif_frames(data, max_frames=2)) == 2
    assert len(decode_gif_frames(data)) == 3  # full animation still decodes


def test_animated_gif_hard_frame_cap_still_typed():
    """The _MAX_FRAMES bomb guard survives the max_frames prefix fix."""
    from automated_property_data_ingestion_document_pipeline_spark.sources import gif as gif_mod

    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    f = np.zeros((1, 1), dtype=np.uint8)
    data = encode_gif(f, pal, frames=[f] * 20)
    old = gif_mod._MAX_FRAMES
    gif_mod._MAX_FRAMES = 8
    try:
        with pytest.raises(GifUnsupported, match="frame count cap"):
            decode_gif_frames(data)
        # a prefix request below the cap still succeeds
        assert len(decode_gif_frames(data, max_frames=3)) == 3
    finally:
        gif_mod._MAX_FRAMES = old


def test_resize_image_routes_animated_gif(spark):
    """resize_image must decode (not pass through) animated GIFs now
    that decode_gif takes the first frame."""
    from automated_property_data_ingestion_document_pipeline_spark.sources.binary import resize_image
    from automated_property_data_ingestion_document_pipeline_spark.sources.png import decode_png, resize_nearest

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
    idx = np.indices((4, 4)).sum(axis=0).astype(np.uint8) % 4
    f1 = (idx + 1) % 4
    payload = encode_gif(idx, pal, frames=[f1])
    df = spark.createDataFrame([(1, payload)], "doc_id bigint, content binary")
    r = resize_image(df, target_h=6, target_w=5).collect()[0]
    assert r["decoded"] and (r["height"], r["width"], r["channels"]) == (6, 5, 3)
    assert np.array_equal(decode_png(bytes(r["content"])), resize_nearest(pal[idx], 6, 5))
