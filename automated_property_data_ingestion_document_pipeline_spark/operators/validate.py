"""Validation gates as quarantine-style operators (SURVEY §2.3).

The reference rejects with HTTP codes (app.py:51-52, 56-57) and boolean
step gates (App.js:386-396); here every reject branch becomes a
``_reject_reason`` column so bad rows are *routed*, not dropped — at
100 TB you quarantine and continue, you don't 400.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def non_blank(col: Column) -> Column:
    """Reference truthiness for required strings (app.py:51: ``not
    full_address``): non-null and non-empty after trim."""
    return col.isNotNull() & (F.trim(col) != "")


def with_reject_reason(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Attach ``_reject_reason``: first failing rule name, else null.

    ``rules`` maps reason-label → pass-predicate, evaluated in insertion
    order (mirrors the reference's short-circuit validation order,
    App.js:410-421).
    """
    reason = F.lit(None).cast("string")
    for label, passes in reversed(list(rules.items())):
        reason = F.when(~F.coalesce(passes, F.lit(False)), F.lit(label)).otherwise(reason)
    return df.withColumn("_reject_reason", reason)


def step_gates(fee: Column, due_signing: Column, due_completion: Column) -> Column:
    """Wizard step-3 gate (App.js:388-394): fee numeric & >0; both
    percents numeric, >=0, summing to exactly 100."""
    f = fee.try_cast("double")
    s = due_signing.try_cast("double")
    c = due_completion.try_cast("double")
    return (
        f.isNotNull() & (f > 0)
        & s.isNotNull() & (s >= 0)
        & c.isNotNull() & (c >= 0)
        & (s + c == 100)
    )
