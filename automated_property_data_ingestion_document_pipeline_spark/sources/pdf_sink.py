"""Minimal PDF render sink (SURVEY §2.1 S8).

The reference converts each rendered DOCX to PDF by shelling out to
LibreOffice (report_generator.py:92-103) — a per-record subprocess the
driver babysits under a 120 s budget (App.js:444). Spark-first
re-expression: render the letter lines *directly* to PDF bytes
executor-side with a self-contained writer for the public PDF 1.4
format (ISO 32000-1) — no subprocess, no external binary, bytes
produced inside the partition. The soffice path remains available as
``doc_sink.soffice_convert_partition`` for environments that have it;
this module is the container-independent default, so S8 actually
executes instead of being dead code behind a missing binary.

The document model matches the DOCX sink: one line per paragraph,
Helvetica 11pt, new page every ``LINES_PER_PAGE`` lines. Deterministic:
identical lines → identical bytes (idempotent-by-content, same property
as doc_sink.docx_bytes_from_lines).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame

PDF_MEDIA_TYPE = "application/pdf"

FONT_SIZE = 11
LEADING = 14  # line spacing in points
PAGE_W, PAGE_H = 612, 792  # US Letter
MARGIN = 72
LINES_PER_PAGE = (PAGE_H - 2 * MARGIN) // LEADING  # 46


def _pdf_escape(text: str) -> bytes:
    """Escape a text line for a PDF literal string. PDF literal strings
    are byte strings; standard Type1 Helvetica addresses WinAnsi/Latin-1,
    so characters outside latin-1 degrade to '?' (the same lossy contract
    soffice applies for glyphs missing from the substituted font)."""
    raw = text.encode("latin-1", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(lines: list[str]) -> bytes:
    """One page's content: a text object positioning each line with the
    TL/T* leading machinery (PDF 1.4 §5.3)."""
    out = [
        b"BT",
        b"/F1 %d Tf" % FONT_SIZE,
        b"%d TL" % LEADING,
        b"%d %d Td" % (MARGIN, PAGE_H - MARGIN),
    ]
    for ln in lines:
        out.append(b"(" + _pdf_escape(ln) + b") Tj T*")
    out.append(b"ET")
    return b"\n".join(out)


def pdf_bytes_from_lines(lines: list[str], compress: bool = False) -> bytes:
    """Serialize paragraphs into a valid single-font PDF 1.4 file:
    catalog → page tree → N pages, each with its own content stream, one
    shared Helvetica font object, correct xref offsets, trailer. Pure
    function of ``lines`` (fixed object numbering, no timestamps;
    zlib level is pinned so ``compress=True`` stays deterministic too).
    ``compress=True`` FlateDecode-encodes each content stream — the
    layout real-world writers emit, and the fixture path for
    :func:`extract_pdf_text`'s inflate branch."""
    pages = [lines[i : i + LINES_PER_PAGE] for i in range(0, len(lines), LINES_PER_PAGE)]
    if not pages:
        pages = [[]]
    n_pages = len(pages)

    # object numbering: 1 catalog, 2 pages-tree, 3 font,
    # then per page i: 4+2i page, 5+2i content
    objects: list[bytes] = []
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids.encode(), n_pages)
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    )
    for i, page_lines in enumerate(pages):
        stream = _content_stream(page_lines)
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, 5 + 2 * i)
        )
        if compress:
            import zlib

            flate = zlib.compress(stream, 6)
            objects.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(flate), flate)
            )
        else:
            objects.append(
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
            )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (num, body)
    xref_at = len(buf)
    n_obj = len(objects) + 1
    buf += b"xref\n0 %d\n" % n_obj
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_obj, xref_at)
    )
    return bytes(buf)


class PdfUnsupported(ValueError):
    """Payload is not a PDF this extractor handles (bad header, broken
    FlateDecode stream, unsupported stream filter, ...)."""


_MAX_STREAM_BYTES = 1 << 28  # 256 MB per content stream, matching wav._MAX_DATA_BYTES


def _stream_length(dct: bytes, payload: bytes) -> int:
    """Resolve a stream dictionary's /Length to an int. Direct integers
    are the common case (and what pdf_bytes_from_lines emits); an
    indirect ``N G R`` reference is resolved by locating object N's body
    (a bare integer). Anything else is a typed refusal."""
    import re

    lm = re.search(rb"/Length\s+(\d+)(?:\s+(\d+)\s+R)?", dct)
    if lm is None:
        raise PdfUnsupported("stream dictionary without direct /Length")
    if lm.group(2) is None:
        return int(lm.group(1))
    obj_num = int(lm.group(1))
    om = re.search(
        rb"(?:^|[\r\n])%d\s+\d+\s+obj\s*(\d+)\s*endobj" % obj_num, payload
    )
    if om is None:
        raise PdfUnsupported(f"unresolvable indirect /Length object {obj_num}")
    return int(om.group(1))


def extract_pdf_text(payload: bytes) -> list[str]:
    """Reparse the text lines out of a PDF whose content streams use
    literal-string ``Tj`` show operators — plain or FlateDecode-encoded
    (r06: the extractor graduated from test helper to source operator;
    the reference's domain artifacts ARE PDFs, report_generator.py:92).
    Each ``stream`` object is located with its preceding dictionary and
    sliced to exactly its declared ``/Length`` bytes (r06 advice: the
    old 'scan to endstream' regex truncated ~1/256 valid compressed
    streams whose deflate bytes end in 0x0D, and any stream containing
    an embedded '\\nendstream'); the slice must land on the real
    ``endstream`` keyword or the payload is refused. A ``/FlateDecode``
    filter is inflated through a capped ``decompressobj`` (256 MB
    ceiling — flate-bomb guard, r06 advice; the wav/image/archive bomb
    caps applied to this family), any other filter raises
    :class:`PdfUnsupported`, and corrupt deflate data raises the same
    typed error instead of ``zlib.error`` — the codec modules'
    contract, so executor tasks quarantine rather than die."""
    import re
    import zlib

    payload = bytes(payload)
    if not payload.startswith(b"%PDF-"):
        raise PdfUnsupported("not a PDF header")
    lines: list[str] = []
    consumed_to = 0  # skip false 'stream' matches inside a prior stream's binary body
    for m in re.finditer(
        rb"<<((?:[^<>]|<<[^<>]*>>)*)>>\s*stream\r?\n", payload
    ):
        if m.start() < consumed_to:
            continue
        dct = m.group(1)
        length = _stream_length(dct, payload)
        if length > _MAX_STREAM_BYTES:
            raise PdfUnsupported(f"stream /Length {length} exceeds cap")
        start = m.end()
        stream = payload[start : start + length]
        if len(stream) != length or not re.match(
            rb"(?:\r\n|\r|\n)?endstream", payload[start + length : start + length + 11]
        ):
            raise PdfUnsupported("stream /Length does not land on endstream")
        consumed_to = start + length
        if b"/Filter" in dct:
            if b"/FlateDecode" not in dct:
                raise PdfUnsupported(f"unsupported stream filter in {dct[:80]!r}")
            d = zlib.decompressobj()
            try:
                inflated = d.decompress(stream, _MAX_STREAM_BYTES + 1)
            except zlib.error as e:
                raise PdfUnsupported(f"broken FlateDecode stream: {e}") from e
            if len(inflated) > _MAX_STREAM_BYTES:
                raise PdfUnsupported("FlateDecode expansion exceeds 256 MB cap")
            if not d.eof:
                raise PdfUnsupported("broken FlateDecode stream: truncated deflate data")
            stream = inflated
        # Escape-aware: consume escaped pairs (\\ \( \)) atomically so a
        # line ending in ')' — written as '\) Tj' — isn't cut at the
        # first literal ') Tj' with a stray trailing backslash (r02
        # advice). Single-pass unescape for the same reason: sequential
        # replace() would re-interpret the backslash of '\\('.
        for m in re.findall(rb"\(((?:[^\\)]|\\.)*)\) Tj", stream, re.S):
            lines.append(re.sub(rb"\\(.)", rb"\1", m).decode("latin-1"))
    return lines


def render_letters_pdf(letters: DataFrame, out_dir: str) -> DataFrame:
    """Render one real .pdf artifact per row (letter_text lines → PDF
    paragraphs) and return the same manifest shape as
    doc_sink.render_letters: (client_key, filename, n_bytes, media_type,
    status). Executor-side via mapInPandas — the reference's
    one-subprocess-per-record soffice loop (report_generator.py:92-103)
    becomes an embarrassingly parallel pure-Python map."""

    def _render(batches: Iterator) -> Iterator:
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)
        for pdf_batch in batches:
            rows = []
            for client_key, text in zip(
                pdf_batch["client_key"].to_numpy(),
                pdf_batch["letter_text"].to_numpy(),
            ):
                # NULL key/text → manifest-only skip, never a 'None'
                # artifact (r02 advice; mirrors doc_sink.render_letters)
                if pd.isna(client_key) or pd.isna(text):
                    rows.append((client_key, None, 0, PDF_MEDIA_TYPE, "skipped_null"))
                    continue
                filename = f"Engagement_Letter_{client_key}.pdf"
                payload = pdf_bytes_from_lines(str(text).split("\n"))
                with open(os.path.join(out_dir, filename), "wb") as f:
                    f.write(payload)
                rows.append((client_key, filename, len(payload), PDF_MEDIA_TYPE, "ok"))
            yield pd.DataFrame(
                rows,
                columns=["client_key", "filename", "n_bytes", "media_type", "status"],
            )

    return letters.mapInPandas(
        _render,
        "client_key string, filename string, n_bytes bigint, media_type string, "
        "status string",
    )
