"""Structured Streaming surface (SURVEY §2.7): the reference's
event-driven semantics — keyed wizard sessions, timeouts, late/duplicate
discard, fan-out sinks — as readStream→transform→writeStream pipelines."""

from automated_property_data_ingestion_document_pipeline_spark.streaming import (  # noqa: F401
    sessions,
    sinks,
)
