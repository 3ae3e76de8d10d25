"""Bucketed tables: pre-shuffled storage for co-located joins
(SURVEY §2.4 scale posture).

At 100 TB the dominant join cost is shuffling the fact side. Bucketing
pays that shuffle ONCE at write time: ``bucketBy(n, key)`` persists each
table hash-partitioned (and ``sortBy`` pre-sorted) on the join key, so a
join of two tables bucketed the same way compiles to a SortMergeJoin
with NO Exchange on either side — every executor merges its own bucket
pair. This is the storage-level analog of what `repartition` does per
query, amortized across every downstream join/aggregation on that key.

Works on Spark's built-in catalog (no Hive metastore needed); the
warehouse location is set at session build (session.py). Bucket count
rules of thumb: target bucket files of 100-500 MB at full scale, and
keep producer/consumer bucket counts equal (or integer multiples, which
AQE can exploit) so co-location holds.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: "str | list[str]",
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    managed table on ``key`` (a column name or a composite key list —
    e.g. the LSH band index ``(band, bh)``). Idempotent across
    sessions: the in-memory catalog forgets managed tables when a
    session ends but their warehouse directories persist, so any
    orphaned location is cleared before the write
    (LOCATION_ALREADY_EXISTS otherwise)."""
    keys = [key] if isinstance(key, str) else list(key)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, keys[0], *keys[1:]
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: "str | list[str]"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key(s). The
    ``MERGE`` hint pins SortMergeJoin (a broadcast would hide the
    co-location being demonstrated); with matching bucket specs the
    physical plan carries no Exchange."""
    keys = [key] if isinstance(key, str) else list(key)
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, keys)


def shuffle_exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan (broadcast
    exchanges excluded) — the assertion surface for co-location tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )
