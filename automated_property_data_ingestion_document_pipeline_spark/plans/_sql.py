"""Shared Spark/DuckDB-parity helpers for registered queries.

Float-determinism policy (why every oracle matches bit-for-bit):
- Row-local arithmetic (a/b*c, lag deltas) is IEEE-754-identical in both
  engines → emitted raw, no rounding.
- Multi-row double sums are order-dependent (Spark partial aggs shuffle
  in nondeterministic order) → money-style sums go through EXACT decimal
  accumulation: per-row ``round(x, 2)`` → ``DECIMAL(18,2)`` → SUM (exact,
  associative) → final cast to double. Identical on both engines by
  construction, and the right 100 TB design anyway (money is decimal,
  SURVEY §1.1).
- Sequential array folds (norms, dots) are rounded to 6 dp on both sides
  before any ranking, and ranks break ties on ids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column, scale: int = 2) -> Column:
    """Exact, order-independent sum of a money-valued double column.

    ``scale`` must match the column's true decimal scale (2 for raw
    prices, 4 for price×rate products): rounding AT the value's own
    scale never lands on a rounding midpoint, so Spark (rounds the
    shortest-decimal repr) and DuckDB (rounds the binary value) agree on
    every row; rounding BELOW it (e.g. a 4-decimal product to cents)
    hits real midpoints where the engines disagree.
    """
    return F.sum(F.round(col, scale).cast(f"decimal(18,{scale})")).cast("double")


def money_sum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`money_sum`."""
    return f"CAST(SUM(CAST(round({expr}, {scale}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
