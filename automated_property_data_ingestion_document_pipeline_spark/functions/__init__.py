"""Scalar expression library (SURVEY §2.2-2.3): pure Column→Column
compositions of built-in ``pyspark.sql.functions`` — JVM-side, codegen'd,
zero Python in the hot path."""

from automated_property_data_ingestion_document_pipeline_spark.functions import (  # noqa: F401
    formatters,
    text,
    vectors,
)
