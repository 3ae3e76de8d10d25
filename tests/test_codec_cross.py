"""Cross-codec consistency + property round-trips (r06): the four
lossless still-image codecs are independent implementations with
different bit orders, row orders, and channel orders — encoding the
SAME pixel array through all of them and demanding identical decodes
catches exactly the class of bug (BGR swap, bottom-up flip, interlace
off-by-one) that each codec's own round-trip test is structurally
blind to. Hypothesis drives shapes/palettes/variants."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from automated_property_data_ingestion_document_pipeline_spark.sources.bmp import (
    decode_bmp,
    encode_bmp,
)
from automated_property_data_ingestion_document_pipeline_spark.sources.gif import (
    decode_gif,
    encode_gif,
)
from automated_property_data_ingestion_document_pipeline_spark.sources.png import (
    decode_png,
    encode_png,
)
from automated_property_data_ingestion_document_pipeline_spark.sources.tiff import (
    decode_tiff,
    encode_tiff,
)


def _random_paletted(rng: np.random.Generator, h: int, w: int, ncolors: int):
    idx = rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    return idx, pal


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_same_pixels_through_all_four_codecs(seed):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(2, 40)), int(rng.integers(2, 40))
    ncolors = int(2 ** rng.integers(1, 9))
    idx, pal = _random_paletted(rng, h, w, ncolors)
    rgb = pal[idx]  # (h, w, 3) ground truth

    via_png = decode_png(encode_png(rgb))
    via_gif = decode_gif(encode_gif(idx, pal, interlace=bool(seed % 2)))
    via_bmp = decode_bmp(encode_bmp(pixels=rgb, top_down=bool(seed % 2)))
    via_tiff = decode_tiff(
        encode_tiff(rgb, compression=(1, 5, 32773)[seed % 3],
                    big_endian=bool(seed % 2))
    )
    for name, got in [
        ("png", via_png),
        ("gif", via_gif),
        ("bmp", via_bmp),
        ("tiff", via_tiff),
    ]:
        assert got.shape == (h, w, 3), name
        assert (got == rgb).all(), name
    # paletted BMP path too
    via_bmp8 = decode_bmp(encode_bmp(indices=idx, palette=pal))
    assert (via_bmp8 == rgb).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    nbits=st.integers(1, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, nbits, interlace, seed):
    rng = np.random.default_rng(seed)
    idx, pal = _random_paletted(rng, h, w, 2**nbits)
    assert (decode_gif(encode_gif(idx, pal, interlace=interlace)) == pal[idx]).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    compression=st.sampled_from([1, 5, 32773]),
    big_endian=st.booleans(),
    rows_per_strip=st.integers(1, 25),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_property(h, w, compression, big_endian, rows_per_strip, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = decode_tiff(
        encode_tiff(px, compression=compression, big_endian=big_endian,
                    rows_per_strip=min(rows_per_strip, h))
    )
    assert (got == px).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    top_down=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, top_down, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(pixels=px, top_down=top_down)) == px).all()


@settings(max_examples=30, deadline=None)
@given(
    n_members=st.integers(1, 6),
    fmt=st.sampled_from(["zip", "zip_stored", "tar", "tar_gz"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_archive_roundtrip_property(n_members, fmt, seed):
    from automated_property_data_ingestion_document_pipeline_spark.sources.archive import (
        build_tar,
        build_zip,
        iter_tar_members,
        iter_zip_members,
    )

    rng = np.random.default_rng(seed)
    members = [
        (
            f"m{i}.bin",
            bytes(rng.integers(0, 256, size=rng.integers(0, 500), dtype=np.uint8)),
        )
        for i in range(n_members)
    ]
    if fmt == "zip":
        got = list(iter_zip_members(build_zip(members, deflate=True)))
    elif fmt == "zip_stored":
        got = list(iter_zip_members(build_zip(members, deflate=False)))
    elif fmt == "tar":
        got = list(iter_tar_members(build_tar(members, gz=False)))
    else:
        got = list(iter_tar_members(build_tar(members, gz=True)))
    assert got == members
