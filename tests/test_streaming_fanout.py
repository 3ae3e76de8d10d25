"""§3.3 fan-out dataflow as a real stream: one input, two sinks via
foreachBatch (partitioned archive + best-effort email stub), driven with
availableNow — the streaming twin of the /send_email endpoint."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.streaming import sessions as ss
from automated_property_data_ingestion_document_pipeline_spark.streaming import sinks

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def test_foreach_batch_fanout(spark, sf_dir):
    out = os.path.join(SCRATCH, "fanout")
    shutil.rmtree(out, ignore_errors=True)

    stream = ss.read_events_stream(spark, sf_dir)
    letters = stream.select(
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("client_key"),
        F.concat(F.col("user_id").cast("string"), F.lit("@example.com")).alias("customer_email"),
        F.concat(F.lit("Letter for event "), F.col("event_id").cast("string")).alias("letter_text"),
    )

    def fanout(batch_df, batch_id):
        sinks.archive_batch(batch_df, out, batch_id)   # sink 1: partitioned archive
        sinks.email_foreach_batch(batch_df, batch_id)  # sink 2: email (skips, no config)

    q = (
        letters.writeStream.foreachBatch(fanout)
        .option("checkpointLocation", os.path.join(out, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = spark.read.parquet(os.path.join(out, "archive"))
    from automated_property_data_ingestion_document_pipeline_spark import catalog

    assert back.count() == catalog.load(spark, sf_dir, "events").count()
    # partitioned by client_key → pruned read touches one user's files
    one = back.filter(F.col("client_key") == "user_0")
    assert one.count() > 0
