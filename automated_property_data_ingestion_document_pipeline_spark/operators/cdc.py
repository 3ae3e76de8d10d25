"""Change-data-capture operators: MERGE-style upsert and ordered
change-log application — the write-side verbs of a lakehouse table.

The reference's ingestion loop is upsert-by-key over a JSON store
(app.py:46-58: read dict, overwrite key, write back — a single-process
MERGE). At 100 TB the same contract is a set-based merge:

- ``merge_upsert``: one FULL OUTER equi-join between target and source
  on the key — matched rows take source values, unmatched target rows
  pass through, unmatched source rows insert. ONE shuffle on the key
  (or zero if both sides are bucketed on it); no per-row lookups.
- ``apply_changes``: a CDC log (op ∈ I/U/D, monotone sequence column)
  first collapses to the LATEST op per key (ranking window — the same
  last-write-wins contract as operators/dedup.last_write_wins, with a
  total tiebreak order so replays are deterministic), then merges into
  the base: D deletes, I/U upsert. Collapse-then-merge touches the
  base ONCE regardless of log depth — the property that matters when
  the log is billions of rows.

Both return plain DataFrames: writers compose them with
streaming/sinks.py's idempotent versioned publish for exactly-once
table maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    value_cols: list[str],
) -> DataFrame:
    """MERGE INTO target USING source ON key: WHEN MATCHED update
    ``value_cols`` from source, WHEN NOT MATCHED insert. Requires both
    frames to carry ``key`` + ``value_cols``; key must be unique per
    side (enforce upstream with last_write_wins)."""
    t = target.select(key, *[F.col(c).alias(f"_t_{c}") for c in value_cols])
    s = source.select(key, *[F.col(c).alias(f"_s_{c}") for c in value_cols])
    merged = t.join(s, key, "full_outer")
    return merged.select(
        key,
        *[
            F.coalesce(F.col(f"_s_{c}"), F.col(f"_t_{c}")).alias(c)
            for c in value_cols
        ],
    )


def latest_changes(
    changes: DataFrame, key: str, seq_cols: list[str], cols: list[str]
) -> DataFrame:
    """Collapse a CDC log to the newest change per key. ``seq_cols``
    must totally order changes within a key (e.g. [ts, change_id]) so
    the winner is replay-deterministic."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changes.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(key, *cols)
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_cols: list[str],
    op_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Apply a CDC log onto a base snapshot: collapse to latest per key,
    then D → delete, I/U → upsert. Keys present only in the log with a
    final D are no-ops; base keys untouched by the log pass through."""
    last = latest_changes(changes, key, seq_cols, [op_col, *value_cols])
    b = base.select(key, *[F.col(c).alias(f"_b_{c}") for c in value_cols])
    merged = b.join(last, key, "full_outer")
    survives = F.col(op_col).isNull() | (F.col(op_col) != F.lit("D"))
    return merged.filter(survives).select(
        key,
        *[
            F.coalesce(F.col(c), F.col(f"_b_{c}")).alias(c)
            for c in value_cols
        ],
    )


def delta_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Incremental maintenance of an inner-join view: given insert-only
    deltas ΔA, ΔB on top of previously-joined A₀, B₀, the new result
    rows are exactly

        Δ(A ⋈ B) = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (the textbook delta-rule; Materialize/DBSP compute joins this way
    continuously). The caller unions this onto the previously
    materialized A₀ ⋈ B₀ — at 100 TB that turns an |A|×|B| recompute
    into three joins whose cost tracks |Δ|, and the three delta joins
    share one partitioning on the join key so AQE coalesces them into
    a single stage pipeline.
    """
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )
