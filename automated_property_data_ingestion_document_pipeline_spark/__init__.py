"""PySpark-native analytics engine with the capabilities of the reference
``Ram-j-code/Automated-Property-Data-Ingestion-Document-Pipeline`` pipeline
(surveyed in SURVEY.md), rebuilt Spark-first: every per-record Python/JS
function of the reference becomes a vectorized DataFrame expression, every
dict lookup a broadcast join, the event-driven wizard a Structured-Streaming
session, and the document sinks ``mapInPandas`` / ``foreachPartition``
writers — generalized with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) and designed for 100 TB scale.

Layout:
  session.py    SparkSession tuning (Arrow, AQE, shuffle sizing)
  catalog.py    corpus schemas + loaders (TESTDATA.md tables)
  functions/    scalar expression library (SURVEY §2.2-2.3)
  operators/    relational + extension operators (§2.4-2.6, §2.9)
  sources/      connectors & sinks (§2.1)
  plans/        the q_* query registry consumed by __spark_entry__
  streaming/    Structured Streaming surface (§2.7)
"""

from automated_property_data_ingestion_document_pipeline_spark.session import get_spark, tune

__all__ = ["get_spark", "tune"]
