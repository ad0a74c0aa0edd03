"""Exact-decimal money/value aggregation (the registry hash rule).

Double accumulation is partition-order dependent: a grouped sum of
non-integer-valued doubles can land either side of a 2dp rounding boundary
depending on which partition's partials merge first, flipping the driver's
exact value hash between engines. The rule (registry.py docstring): grouped
money/value sums accumulate in DECIMAL(18,6) — exact, order-free — round,
then cast back to DOUBLE. The matching oracle fragment is
``CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)``.

Integer-valued doubles (quantities) are exempt — integer sums are exact in
double up to 2^53 — as are running sums over a pinned window frame order
(both engines accumulate in the same sequence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, scale: int = 2) -> Column:
    """``round(sum(CAST(col AS DECIMAL(18,6))), scale)`` as DOUBLE — the
    Spark half of the registry's decimal-before-round rule. Alias it at
    the call site."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast("decimal(18,6)")), scale).cast("double")
