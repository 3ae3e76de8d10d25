"""Exact tests for the pure-stdlib FLAC subset codec (sources/flac.py,
r06). Oracle methodology: FLAC is lossless, so decode(encode(samples))
must reproduce the hand-chosen arrays EXACTLY — any bit error in the
rice coding, fixed prediction, stereo decorrelation, or CRC machinery
flips a sample or raises."""

from __future__ import annotations

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.flac import (
    FlacUnsupported,
    decode_flac,
    encode_flac,
)


def _rt(s, **kw):
    s = np.asarray(s, dtype=np.int64)
    out, rate = decode_flac(encode_flac(s, 16000, **kw))
    assert rate == 16000
    assert np.array_equal(out, s.reshape(out.shape)), kw
    return out


@pytest.mark.parametrize("bps", [8, 16, 24])
@pytest.mark.parametrize(
    "subframe", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4"]
)
def test_subframe_roundtrips_exact(bps, subframe):
    lim = {8: 120, 16: 30000, 24: 8_000_000}[bps]
    rng = np.random.default_rng(bps + len(subframe))
    _rt(rng.integers(-lim, lim, size=(600, 1)), bps=bps, blocksize=256,
        subframe=subframe)


def test_constant_subframe():
    _rt(np.full((512, 1), -37), bps=16, blocksize=256, subframe="constant")


@pytest.mark.parametrize("mode", ["independent", "left_side", "side_right", "mid_side"])
def test_stereo_decorrelation_exact(mode):
    rng = np.random.default_rng(42)
    _rt(rng.integers(-20000, 20000, size=(700, 2)), bps=16, blocksize=256,
        subframe="fixed2", stereo_mode=mode)


def test_mid_side_odd_sums_and_negatives():
    # mid stores floor((l+r)/2): the lost bit rides in the side channel
    s = np.array([[5, 2], [-5, -2], [2, 5], [-2, 7], [1, 0], [0, -1]], dtype=np.int64)
    _rt(s, bps=16, blocksize=6, subframe="verbatim", stereo_mode="mid_side")


@pytest.mark.parametrize("porder", [0, 1, 2, 4])
def test_rice_partition_orders(porder):
    rng = np.random.default_rng(porder)
    _rt(rng.integers(-1000, 1000, size=(512, 1)), bps=16, blocksize=256,
        subframe="fixed1", partition_order=porder, rice_param=6)


def test_rice_5bit_parameter_variant():
    rng = np.random.default_rng(3)
    _rt(rng.integers(-30000, 30000, size=(512, 1)), bps=16, blocksize=256,
        subframe="fixed0", rice_param=17)


def test_escape_partitions_raw_bits():
    rng = np.random.default_rng(4)
    _rt(rng.integers(-30000, 30000, size=(512, 1)), bps=16, blocksize=256,
        subframe="fixed2", escape_raw=19)
    _rt(np.zeros((512, 1)), bps=16, blocksize=256, subframe="fixed0", escape_raw=0)


def test_escape_width_validated_at_encode():
    rng = np.random.default_rng(5)
    with pytest.raises(ValueError, match="does not fit"):
        encode_flac(rng.integers(-30000, 30000, size=(512, 1)).astype(np.int64),
                    16000, bps=16, subframe="fixed2", escape_raw=8)


def test_wasted_bits_shift():
    rng = np.random.default_rng(6)
    s = rng.integers(-2000, 2000, size=(512, 1)) << 3
    _rt(s, bps=16, blocksize=256, subframe="fixed2", wasted=3)


def test_short_last_block_and_many_frames():
    rng = np.random.default_rng(7)
    _rt(rng.integers(-500, 500, size=(601, 1)), bps=16, blocksize=256,
        subframe="fixed2")
    # 188 frames → exercises multi-byte UTF-8 frame numbers
    _rt(rng.integers(-99, 99, size=(3000, 1)), bps=16, blocksize=16,
        subframe="fixed1")


def test_three_channels_independent():
    rng = np.random.default_rng(8)
    _rt(rng.integers(-500, 500, size=(300, 3)), bps=16, blocksize=128,
        subframe="fixed1")


def test_crc16_rejects_frame_data_corruption():
    rng = np.random.default_rng(9)
    data = bytearray(encode_flac(
        rng.integers(-20000, 20000, size=(700, 2)).astype(np.int64),
        16000, bps=16, blocksize=256, subframe="fixed2", stereo_mode="mid_side",
    ))
    data[len(data) // 2] ^= 0x10
    with pytest.raises(FlacUnsupported, match="CRC"):
        decode_flac(bytes(data))


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"fLaX" + d[4:], "not a FLAC"),
        (lambda d: d[:20], "truncated"),
    ],
)
def test_unsupported_and_malformed_typed(mutate, msg):
    rng = np.random.default_rng(10)
    data = encode_flac(rng.integers(-100, 100, size=(64, 1)).astype(np.int64),
                       16000, bps=16, blocksize=64, subframe="verbatim")
    with pytest.raises(FlacUnsupported, match=msg):
        decode_flac(mutate(data))


def test_lpc_subframe_typed_refusal():
    """Patch the first subframe header's type bits to LPC (32): the
    refusal must fire during subframe decode, before any samples are
    produced. Subframe header layout: pad(1) type(6) wasted(1) — the
    byte sits right after the 8-byte frame header (sync..CRC-8)."""
    rng = np.random.default_rng(10)
    data = bytearray(
        encode_flac(rng.integers(-100, 100, size=(64, 1)).astype(np.int64),
                    16000, bps=16, blocksize=64, subframe="verbatim")
    )
    frame_start = bytes(data).find(b"\xff\xf8")  # sync 11111111 11111000
    assert frame_start > 0
    sub_hdr = frame_start + 8  # sync..reserved(4) + utf8(1) + bs-1(2) + crc8(1)
    assert data[sub_hdr] == 0x02  # verbatim: 0b0_000001_0
    data[sub_hdr] = 0x40  # LPC order 1: 0b0_100000_0
    with pytest.raises(FlacUnsupported, match="LPC"):
        decode_flac(bytes(data))


def test_sample_cap_refused_before_allocation():
    # STREAMINFO claiming 2^35 samples over a tiny stream
    rng = np.random.default_rng(11)
    data = bytearray(encode_flac(rng.integers(-9, 9, size=(16, 1)).astype(np.int64),
                                 16000, bps=16, blocksize=16, subframe="verbatim"))
    # total_samples is the last 36 bits before the md5: bytes 21..25 of
    # STREAMINFO (which starts at offset 8); set them high
    si = 8
    data[si + 17] |= 0xF0  # blow up the 36-bit total
    with pytest.raises(FlacUnsupported, match="cap|total|CRC|truncated"):
        decode_flac(bytes(data))


def test_fuzz_flac_streams_stay_typed():
    """600-stream seeded canary (full 12k sweep ran clean during
    development): FlacUnsupported is the only permitted failure."""
    rng = np.random.default_rng(271)
    base = bytearray(encode_flac(
        rng.integers(-20000, 20000, size=(700, 2)).astype(np.int64),
        16000, bps=16, blocksize=256, subframe="fixed2", stereo_mode="mid_side",
    ))
    for _ in range(500):
        data = bytearray(base)
        for _m in range(rng.integers(1, 6)):
            op = rng.integers(0, 3)
            if op == 0:
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            elif op == 1 and len(data) > 8:
                data = data[: rng.integers(1, len(data))]
            else:
                data.insert(int(rng.integers(0, len(data))), int(rng.integers(0, 256)))
        try:
            decode_flac(bytes(data))
        except FlacUnsupported:
            pass
    for _ in range(100):
        g = b"fLaC" + bytes(
            rng.integers(0, 256, size=rng.integers(0, 300), dtype=np.uint8)
        )
        try:
            decode_flac(g)
        except FlacUnsupported:
            pass
