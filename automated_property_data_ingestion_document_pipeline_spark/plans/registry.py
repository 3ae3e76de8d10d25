"""Decorator-based registry for driver-visible queries + DuckDB oracles.

Every operator claimed in SURVEY §2 registers here with a key; the driver
consumes the dicts through ``__spark_entry__.queries()`` /
``oracle_sql()``. A key registered without ``oracle`` is rows-only (the
driver records the weaker check) — reserved for genuinely
non-SQL-expressible ops (streaming state, LSH approximations, binary
sinks).

Contract reminders (driver compare):
- columns are sorted by NAME then value-hashed → alias every computed
  column identically in the DataFrame code and the SQL;
- the hash is order-insensitive → no ORDER BY needed for correctness,
  but ties in top-k/limit queries MUST be broken deterministically;
- double aggregates are rounded on BOTH sides so float-summation order
  (Spark partial aggs vs DuckDB sequential) can't flip a bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automated_property_data_ingestion_document_pipeline_spark.session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``key``.

    Wraps the fn so the session is tuned (UTC timezone, AQE, Arrow)
    before the plan is built — the driver hands us its own session.
    """

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from automated_property_data_ingestion_document_pipeline_spark.catalog import corpus_bytes

            # finding 93 rule 2 as code (r10): shuffle partitions are
            # sized from the corpus' on-disk bytes, not a constant —
            # host-pinned settings are respected inside tune().
            tune(spark, input_bytes=corpus_bytes(sf_dir))
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLES[key] = oracle
        return wrapped

    return deco
