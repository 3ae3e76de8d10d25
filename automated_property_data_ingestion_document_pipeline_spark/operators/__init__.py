"""Relational + extension operators (SURVEY §2.4-2.6, §2.9): reusable
DataFrame→DataFrame transformations. Everything is declarative DataFrame
API so Catalyst picks physical strategy; the only imperative pieces are
Arrow-batched pandas paths explicitly marked as such."""

from automated_property_data_ingestion_document_pipeline_spark.operators import (  # noqa: F401
    dedup,
    joins,
    ranking,
    sessionize,
    similarity,
    validate,
)
