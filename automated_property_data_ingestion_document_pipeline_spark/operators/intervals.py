"""Interval-algebra operators: merge-overlaps (gaps-and-islands) over
keyed interval sets.

The registered keys (plans/queries_intervals.py) apply these to the
events corpus; the operator itself is generic: any (key, start, end)
integer-interval relation. One shuffle on the key; the flag and cumsum
windows share the same (start, tiebreak) total order, which is what
makes the island assignment well-defined under start-value ties (a tied
interval can never open a new island — it overlaps its tie peer's start
point by definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    tiebreak: str,
) -> DataFrame:
    """Merge overlapping/touching-at-a-point-overlapping intervals per
    key: returns one row per island with (key, island, island_start,
    island_end). An interval starts a new island iff it begins STRICTLY
    after the running max end of every interval before it in
    (start, tiebreak) order — [1,2] and [2,3] therefore merge (closed
    ends), matching the SQL-standard gaps-and-islands reading.
    ``tiebreak`` must make (start, tiebreak) unique per key so the
    cumulative sum is deterministic."""
    w = Window.partitionBy(key).orderBy(start, tiebreak)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "_is_new",
        F.when(prev_max_end.isNull() | (F.col(start) > prev_max_end), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("_is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return islands.groupBy(key, "island").agg(
        F.min(start).alias("island_start"),
        F.max(end).alias("island_end"),
    )


def coverage_summary(merged: DataFrame, key: str) -> DataFrame:
    """Per-key coverage rollup of :func:`merge_intervals` output:
    (key, n_islands, covered) where covered sums the island spans."""
    return merged.groupBy(key).agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered"),
    )
