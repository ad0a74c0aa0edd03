"""Cross-engine-stable rounding of DOUBLE expressions.

``round(double, n)`` is implemented differently per engine: Spark rounds
the double's SHORTEST DECIMAL RENDERING (BigDecimal.valueOf → HALF_UP)
while DuckDB rounds the exact binary value (C nearbyint, half-even, sign
preserved) — so any value at or near an n-dp midpoint can round apart,
and DuckDB can emit -0.0 where Spark never does. This is not just a
measure-zero hazard: ratios of integers/decimals land on EXACT dyadic or
decimal-terminating midpoints (1/32 = 0.03125 is a 4dp midpoint; the
mean of 2 documents' 4dp qualities is a 4dp midpoint whenever the sum's
last digit is odd), which a regenerated or decimated dataset can hit.
Found live in q_bm25 (round-5 advice); this module is the general fix.

``stable_round`` replaces it with ``floor(x * 10^n + 0.5) / 10^n``:
multiply, add, floor, divide are all exactly specified IEEE-754 ops, so
both engines produce the IDENTICAL double for identical input — the
actual driver-hash requirement. Semantics: half-up toward +inf on the
binary value (differs from decimal-string HALF_UP only where round()
itself was cross-engine-divergent). The floor form also never yields
-0.0 in either engine (floor of a value in [0, 1) is +0 / 0L).

Use it for any emitted double that divides, differences, or otherwise
derives from exact operands; plain round() stays correct for DECIMAL
inputs (both engines round decimals half-away-from-zero exactly) and
for values pinned to a coarser grid than the rounding digit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, n: int) -> Column:
    """Engine-identical half-up rounding of a double to n decimals."""
    scale = F.lit(float(10**n))
    return F.floor(col * scale + F.lit(0.5)) / scale


def stable_round_sql(expr: str, n: int) -> str:
    """The DuckDB-side twin of stable_round (same IEEE op sequence)."""
    scale = float(10**n)
    return f"floor(({expr}) * {scale:.1f} + 0.5) / {scale:.1f}"
