"""Schema-on-read JSON ingest (SURVEY §2.1 S1): the reference reads every
request body as ``request.json or {}`` and plucks optional fields
(app.py:26-28, 46-49, 70-81) — i.e. permissive parse, null defaults,
never raise. Spark twin: ``from_json`` with an explicit StructType in
PERMISSIVE mode over a string column, or ``spark.read.json`` for files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Bronze schema of the engagement record (FIXTURES.md §B1; App.js:255-265
# + app.py:72-81): all-string, all-nullable — typing happens downstream
# with try_cast (null-on-failure, matching the reference formatters).
ENGAGEMENT_SCHEMA = (
    "name STRING, customer_email STRING, address STRING, state_code STRING, "
    "county STRING, property_under_appraisal STRING, parcel_id STRING, "
    "fee STRING, due_signing STRING, due_completion STRING, report_date STRING"
)


def parse_json_col(col: Column, schema: str | StructType) -> Column:
    """Permissive JSON parse: bad documents → null struct, bad fields →
    null fields; never errors (the reference's ``.get()`` contract)."""
    return F.from_json(col, schema, {"mode": "PERMISSIVE"})


def ingest_request_bodies(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Explode a JSON request-body column into the engagement record
    columns (bronze boundary)."""
    parsed = parse_json_col(F.col(json_col), ENGAGEMENT_SCHEMA)
    return df.withColumn("_req", parsed).select("*", "_req.*").drop("_req")
