"""dHash perceptual-hash canaries (r13): determinism through the real
codec path, the locality property that makes dHash a NEAR-dup hash
(small pixel edits move the hash a bounded number of bits), and the
banded Hamming join contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from automated_property_data_ingestion_document_pipeline_spark.operators.imagehash import (
    GRID_H,
    GRID_W,
    box_downsample_sums,
    dhash63,
    hamming_pairs,
)
from automated_property_data_ingestion_document_pipeline_spark.sources.png import (
    decode_png,
    encode_png,
)


def _rand_img(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(16, 18), dtype=np.uint8)


def _hash_of(img: np.ndarray, filter_type: int = 0) -> int:
    decoded = decode_png(encode_png(img, filter_type=filter_type))[:, :, 0]
    return dhash63(box_downsample_sums(decoded.astype(np.int64), 2, 2))


def test_dhash_sign_bit_never_set():
    """63-bit contract: bit 63 unused so band-slice shifts are portable
    across engines regardless of signedness."""
    all_desc = np.arange(GRID_H * GRID_W, 0, -1).reshape(GRID_H, GRID_W)
    h = dhash63(all_desc)  # every comparison true -> all 63 bits set
    assert h == (1 << 63) - 1


def test_dhash_shape_contract():
    with pytest.raises(ValueError):
        dhash63(np.zeros((4, 4), dtype=np.int64))


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 4))
def test_codec_roundtrip_is_hash_identity(seed, filt):
    """encode -> decode never perturbs the hash: PNG is lossless, so
    the hash through the real codec equals the hash of raw pixels."""
    img = _rand_img(seed)
    direct = dhash63(box_downsample_sums(img.astype(np.int64), 2, 2))
    assert _hash_of(img, filter_type=filt) == direct


@settings(max_examples=100, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.integers(0, 15),
    st.integers(0, 17),
    st.integers(0, 255),
)
def test_single_pixel_edit_moves_hash_at_most_two_bits(seed, py, px_, val):
    """The dHash locality fuzz canary: ONE source-pixel change lands in
    ONE grid cell, which participates in at most TWO adjacent
    comparisons — so the hash moves <= 2 bits. This is the property
    that makes Hamming-<=t a near-dup acceptance test instead of an
    exact-dup one."""
    img = _rand_img(seed)
    edited = img.copy()
    edited[py, px_] = val
    h0 = _hash_of(img)
    h1 = _hash_of(edited)
    assert bin(h0 ^ h1).count("1") <= 2


def test_hamming_pairs_bands_and_verifies(spark):
    """The banded join finds a planted near-dup pair (one band slice
    intact), rejects a far pair, and respects doc_a < doc_b."""
    base = 0b0101_1010_1111_0000_1100_0011_1010_0101 << 16
    near = base ^ 0b111  # hamming 3, slices 1..3 identical
    far = base ^ ((1 << 60) - 1)  # wrecks every slice
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, dhash long"
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_pairs(df, max_hamming=6).collect()
    }
    assert rows == {(1, 2): 3}


def test_hamming_pairs_threshold_gate(spark):
    """A candidate that band-collides but exceeds max_hamming is
    verified OUT (banding generates, the exact integer check gates)."""
    a = 0
    b = (1 << 40) - 1 & ~0xFFFF  # low 16-bit slice matches a's, 24 bits set
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, dhash long")
    assert hamming_pairs(df, max_hamming=6).count() == 0
    assert hamming_pairs(df, max_hamming=30).count() == 1
