"""Exact tests for the pure-stdlib RIFF/WAVE codec (sources/wav.py,
r06) — the audio-container twin of the PNG/JPEG lanes, same
arithmetic-oracle methodology: fixtures are hand-chosen sample arrays
written by ``encode_wav`` and every decode must reproduce them EXACTLY
(integer PCM has no rounding anywhere)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.wav import (
    WavUnsupported,
    decode_wav,
    encode_wav,
    wav_pcm_info,
)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2, 3])
def test_pcm_roundtrip_exact(bits, channels):
    lim = {8: 127, 16: 32000, 24: 8_000_000, 32: 2_000_000_000}[bits]
    rng = np.random.default_rng(bits * 10 + channels)
    s = rng.integers(-lim, lim + 1, size=(173, channels)).astype(np.int64)
    out, rate = decode_wav(encode_wav(s, 22050, bits=bits))
    assert rate == 22050
    assert out.shape == (173, channels)
    assert np.array_equal(out, s)


def test_pcm_24bit_sign_extension_boundaries():
    s = np.array([[-(1 << 23)], [(1 << 23) - 1], [-1], [0], [1]], dtype=np.int64)
    out, _ = decode_wav(encode_wav(s, 8000, bits=24))
    assert np.array_equal(out, s)


def test_pcm_8bit_recentering():
    s = np.array([[-128], [-1], [0], [1], [127]], dtype=np.int64)
    out, _ = decode_wav(encode_wav(s, 8000, bits=8))
    assert np.array_equal(out, s)


@pytest.mark.parametrize("bits", [32, 64])
def test_float_roundtrip_exact(bits):
    rng = np.random.default_rng(bits)
    s = rng.standard_normal((64, 2))
    if bits == 32:
        s = s.astype(np.float32).astype(np.float64)
    out, _ = decode_wav(encode_wav(s, 8000, bits=bits, audio_fmt=3))
    assert out.dtype == np.float64
    assert np.array_equal(out, s)


def test_unknown_chunks_skipped_and_odd_size_word_aligned():
    s = np.arange(-10, 10).reshape(-1, 1)
    data = encode_wav(s, 16000, bits=16)
    # splice an odd-sized LIST chunk between header and fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"hello" + b"\x00"  # pad byte
    spliced = data[:12] + extra + data[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    out, rate = decode_wav(spliced)
    assert rate == 16000 and np.array_equal(out, s)


def test_trailing_partial_frame_truncated():
    s = np.arange(-10, 10).reshape(-1, 1)
    data = bytearray(encode_wav(s, 16000, bits=16))
    i = bytes(data).find(b"data")
    # claim one extra byte in the data chunk and append it (word-pad too)
    (size,) = struct.unpack("<I", data[i + 4 : i + 8])
    data[i + 4 : i + 8] = struct.pack("<I", size + 1)
    data += b"\xab\x00"
    out, _ = decode_wav(bytes(data))
    assert np.array_equal(out, s)  # partial frame dropped


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"X" + d[1:], "RIFF"),
        (lambda d: d.replace(b"WAVE", b"AVI ", 1), "RIFF"),
        (lambda d: d.replace(b"fmt ", b"fmtX", 1), "missing fmt"),
        (lambda d: d.replace(b"data", b"dat2", 1), "missing data"),
        (lambda d: d[: len(d) - 5], "truncated chunk"),
        # format 2 = ADPCM (compressed)
        (lambda d: d[: d.find(b"fmt ") + 8] + b"\x02" + d[d.find(b"fmt ") + 9 :],
         "compressed"),
    ],
)
def test_malformed_and_unsupported_raise_typed(mutate, msg):
    data = encode_wav(np.arange(100).reshape(-1, 1), 16000, bits=16)
    with pytest.raises(WavUnsupported, match=msg):
        decode_wav(mutate(data))


def test_data_chunk_byte_cap():
    # header claims a 256 MB+ data chunk over a tiny stream
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    data = (
        b"RIFF" + struct.pack("<I", 0xFFFFFF) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", (1 << 28) + 2)
    )
    with pytest.raises(WavUnsupported):
        decode_wav(data)


def test_fuzz_wav_streams_stay_typed():
    """600-stream seeded canary (the full 12k sweep ran clean during
    development): WavUnsupported is the only permitted failure type."""
    rng = np.random.default_rng(97)
    base = bytearray(
        encode_wav(
            rng.integers(-1000, 1000, size=(50, 2)).astype(np.int64), 16000
        )
    )
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
            decode_wav(bytes(data))
        except WavUnsupported:
            pass
    for _ in range(100):
        g = b"RIFF" + bytes(
            rng.integers(0, 256, size=rng.integers(0, 200), dtype=np.uint8)
        )
        try:
            decode_wav(g)
        except WavUnsupported:
            pass


def test_chunk_audio_real_wav_container(spark):
    """chunk_audio(fake=False): boundaries come from the WAV header's
    actual rate/block-align (not the declared defaults), chunks slice
    the stored data chunk, and reassembly is exact."""
    from automated_property_data_ingestion_document_pipeline_spark.sources.binary import (
        chunk_audio,
    )

    rng = np.random.default_rng(31)
    # 2.5 s of 8 kHz mono s16 → with chunk_seconds=1.0: 3 chunks
    s = rng.integers(-3000, 3000, size=(20000, 1)).astype(np.int64)
    payload = encode_wav(s, 8000, bits=16)
    pcm, rate, ba = wav_pcm_info(payload)
    df = spark.createDataFrame([(7, payload)], "doc_id bigint, content binary")
    rows = sorted(
        chunk_audio(df, sample_rate=999, bytes_per_sample=7,  # decoys: must be ignored
                    chunk_seconds=1.0, fake=False).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["start_ms"] == 0 and rows[0]["end_ms"] == 1000
    assert rows[2]["end_ms"] == 2500
    assert b"".join(bytes(r["chunk_bytes"]) for r in rows) == pcm
    assert all(len(bytes(r["chunk_bytes"])) == 16000 for r in rows[:2])


def test_chunk_audio_compressed_codec_stays_gated(spark):
    from automated_property_data_ingestion_document_pipeline_spark.sources.binary import (
        chunk_audio,
    )

    df = spark.createDataFrame(
        [(1, b"fLaC" + b"\x00" * 64)], "doc_id bigint, content binary"
    )
    with pytest.raises(Exception) as e:
        chunk_audio(df, fake=False).collect()
    assert "compressed audio codec" in str(e.value)
