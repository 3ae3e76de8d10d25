"""Archive source tests (sources/archive.py): ZIP/TAR member walks,
format sniffing, bomb-cap refusals, the typed-error contract under
fuzz, and the Spark-side fan-out shape of unpack_archive."""

from __future__ import annotations

import io
import struct
import zipfile

import numpy as np
import pytest

from automated_property_data_ingestion_document_pipeline_spark.sources.archive import (
    ArchiveUnsupported,
    build_tar,
    build_zip,
    iter_tar_members,
    iter_zip_members,
    unpack_archive,
)

_MEMBERS = [("a.txt", b"hello property"), ("sub/b.bin", bytes(range(200)))]


@pytest.mark.parametrize("deflate", [True, False])
def test_zip_roundtrip(deflate):
    got = list(iter_zip_members(build_zip(_MEMBERS, deflate=deflate)))
    assert got == _MEMBERS


@pytest.mark.parametrize("gz", [True, False])
def test_tar_roundtrip(gz):
    got = list(iter_tar_members(build_tar(_MEMBERS, gz=gz)))
    assert got == _MEMBERS


def test_zip_directories_skipped():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("dir/", b"")
        zf.writestr("dir/f.txt", b"x")
    assert list(iter_zip_members(buf.getvalue())) == [("dir/f.txt", b"x")]


def test_zip_bomb_claim_refused_before_extraction():
    """A crafted central directory claiming a >cap expansion is refused
    from the CLAIMED sizes, without decompressing anything."""
    blob = build_zip([("big.bin", b"\x00" * 100)])
    # patch the central-directory uncompressed-size field to 1 GiB + 1
    cd = blob.rindex(b"PK\x01\x02")
    patched = bytearray(blob)
    patched[cd + 24 : cd + 28] = struct.pack("<I", 1024 * 1024 * 1024 + 1)
    with pytest.raises(ArchiveUnsupported):
        list(iter_zip_members(bytes(patched)))


def test_corrupt_zip_member_is_typed():
    blob = bytearray(build_zip([("f.bin", bytes(range(256)) * 4)]))
    blob[60] ^= 0xFF  # flip a byte inside the deflate stream
    with pytest.raises(ArchiveUnsupported):
        list(iter_zip_members(bytes(blob)))


def test_truncated_tar_is_typed():
    """Cut mid-way through the second member's data block: tarfile
    silently short-reads, so the walker's size check must fire."""
    blob = build_tar(_MEMBERS)[:1700]
    with pytest.raises(ArchiveUnsupported):
        list(iter_tar_members(blob))


def test_fuzz_malformed_archives_always_raise_typed_error():
    """600-stream seeded canary (a 10k sweep ran clean in development)."""
    rng = np.random.default_rng(606)
    bases = [
        bytearray(build_zip(_MEMBERS, deflate=True)),
        bytearray(build_zip(_MEMBERS, deflate=False)),
        bytearray(build_tar(_MEMBERS, gz=False)),
        bytearray(build_tar(_MEMBERS, gz=True)),
    ]
    walkers = [iter_zip_members, iter_zip_members, iter_tar_members, iter_tar_members]
    for rep in range(400):
        data = bytearray(bases[rep % 4])
        for _m in range(rng.integers(1, 8)):
            op = rng.integers(0, 3)
            if op == 0 and len(data) > 1:
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            elif op == 1 and len(data) > 4:
                data = data[: rng.integers(1, len(data))]
            else:
                at = int(rng.integers(0, max(len(data), 1)))
                data.insert(min(at, len(data)), int(rng.integers(0, 256)))
        try:
            list(walkers[rep % 4](bytes(data)))
        except ArchiveUnsupported:
            pass
    for _ in range(200):
        garbage = b"PK\x03\x04" + bytes(
            rng.integers(0, 256, size=rng.integers(0, 300), dtype=np.uint8)
        )
        try:
            list(iter_zip_members(garbage))
        except ArchiveUnsupported:
            pass


def test_unpack_archive_fan_out_shape(spark):
    """Spark-side: one archive row → one row per member, sniffed format,
    NULL payloads dropped, bytes intact."""
    rows = [
        (1, build_zip(_MEMBERS)),
        (2, build_tar(_MEMBERS, gz=True)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = unpack_archive(df).collect()
    assert len(got) == 4
    by_key = {(r["doc_id"], r["member_name"]): r for r in got}
    for did in (1, 2):
        for name, blob in _MEMBERS:
            r = by_key[(did, name)]
            assert bytes(r["member_bytes"]) == blob
            assert r["n_bytes"] == len(blob)
