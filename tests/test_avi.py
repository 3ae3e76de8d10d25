"""Tests for the MJPEG AVI container parser (sources/avi.py, r06):
frames round-trip byte-exactly through the RIFF tree, the Spark-side
sample_frames(fake=False) path extracts real evenly-spaced frames, and
malformed/non-MJPEG payloads stay typed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.avi import (
    AviUnsupported,
    avi_mjpeg_frames,
    encode_avi_mjpeg,
)
from automated_property_data_ingestion_document_pipeline_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg_from_coeffs,
)


def _frame(rng) -> bytes:
    c = np.zeros((8, 8), dtype=np.int64)
    c[0, 0] = int(rng.integers(-40, 40))
    for _ in range(6):
        u, v = int(rng.integers(0, 8)), int(rng.integers(0, 8))
        c[u, v] = int(rng.integers(-20, 20))
    return encode_jpeg_from_coeffs(8, 8, [[c]])


def _avi(n=5, seed=1):
    rng = np.random.default_rng(seed)
    frames = [_frame(rng) for _ in range(n)]
    return frames, encode_avi_mjpeg(frames, 8, 8, fps=10)


def test_frames_roundtrip_byte_exact():
    frames, avi = _avi(7)
    got, w, h = avi_mjpeg_frames(avi)
    assert (w, h) == (8, 8)
    assert got == frames
    for fr in got:  # every payload is a decodable baseline JPEG
        assert decode_jpeg(fr).shape == (8, 8, 1)


def test_odd_sized_frames_word_aligned():
    rng = np.random.default_rng(2)
    frames = [_frame(rng)]
    if len(frames[0]) % 2 == 0:
        frames[0] += b""  # ensure we at least run the path
    odd = frames[0][:-1] if len(frames[0]) % 2 == 0 else frames[0]
    avi = encode_avi_mjpeg([odd, odd], 8, 8)
    got, _, _ = avi_mjpeg_frames(avi)
    assert got == [odd, odd]


def test_empty_stream_zero_frames():
    avi = encode_avi_mjpeg([], 8, 8)
    got, w, h = avi_mjpeg_frames(avi)
    assert got == [] and (w, h) == (8, 8)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"RIFX" + d[4:], "not a RIFF/AVI"),
        (lambda d: d.replace(b"AVI ", b"WAVE", 1), "not a RIFF/AVI"),
        (lambda d: d.replace(b"MJPG", b"H264", 2), "not MJPEG"),
        (lambda d: d.replace(b"avih", b"avxh", 1), "missing avih"),
        (lambda d: d[: len(d) - 7], "truncated"),
    ],
)
def test_malformed_and_non_mjpeg_typed(mutate, msg):
    _, avi = _avi(3)
    with pytest.raises(AviUnsupported, match=msg):
        avi_mjpeg_frames(mutate(avi))


def test_frame_count_disagreement_typed():
    frames, avi = _avi(3)
    # avih total_frames is the 5th u32 of the avih body; bump it
    i = avi.find(b"avih") + 8 + 16
    bad = avi[:i] + struct.pack("<I", 9) + avi[i + 4 :]
    with pytest.raises(AviUnsupported, match="disagrees"):
        avi_mjpeg_frames(bad)


def test_fuzz_avi_streams_stay_typed():
    rng = np.random.default_rng(53)
    _, avi = _avi(4, seed=53)
    base = bytearray(avi)
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
            avi_mjpeg_frames(bytes(data))
        except AviUnsupported:
            pass
    for _ in range(100):
        g = b"RIFF" + bytes(
            rng.integers(0, 256, size=rng.integers(0, 200), dtype=np.uint8)
        )
        try:
            avi_mjpeg_frames(g)
        except AviUnsupported:
            pass


def test_sample_frames_real_extraction(spark):
    """fake=False: evenly-spaced REAL frames out of the container, each
    a decodable JPEG; codec video stays behind DecodeUnavailable."""
    from automated_property_data_ingestion_document_pipeline_spark.sources.binary import (
        sample_frames,
    )

    frames, avi = _avi(10, seed=11)
    df = spark.createDataFrame([(3, avi)], "doc_id bigint, content binary")
    rows = sorted(
        sample_frames(df, n_frames=4, fake=False).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    # picks are frames 0, 2, 5, 7 of 10 (i*len//take)
    expect = [frames[(i * 10) // 4] for i in range(4)]
    assert [bytes(r["frame_bytes"]) for r in rows] == expect
    for r in rows:
        assert decode_jpeg(bytes(r["frame_bytes"])).shape == (8, 8, 1)


def test_sample_frames_codec_video_gated(spark):
    from automated_property_data_ingestion_document_pipeline_spark.sources.binary import (
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, b"\x00\x00\x00 ftypisom" + b"\x00" * 64)],  # MP4-ish
        "doc_id bigint, content binary",
    )
    with pytest.raises(Exception) as e:
        sample_frames(df, fake=False).collect()
    assert "codec-compressed video" in str(e.value)
