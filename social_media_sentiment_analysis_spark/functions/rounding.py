"""Engine-exact rounding and aggregation helpers for oracle-checked doubles.

Two distinct failure modes make plain ``round(double, n)`` fragile across
engines, both observed at sf0.1 (value-hash mismatches in the last digit):

1. **Rounding implementation.** Spark's ``round`` converts the double to an
   exact BigDecimal and applies HALF_UP; DuckDB rounds numerically
   (``round(x*10^n)/10^n``-style). A double whose exact value sits a few
   ulps below ``…5`` rounds DOWN in Spark and UP in DuckDB (e.g.
   0.59824999999… → 0.5982 vs 0.5983). Fix: ``round_half_up`` /
   ``sql_round_half_up`` — ``floor(x·10^n + 0.5)/10^n`` — the SAME IEEE
   op sequence on both engines, so identical inputs give identical output
   bits (for negative x this rounds half toward +inf on both sides —
   consistency, not a specific tie convention, is what parity needs).

2. **Accumulation order.** SUM/AVG over doubles is order-dependent;
   Spark's partial/final tree and DuckDB's sequential loop produce sums a
   few ulps apart, which (1) then amplifies at a rounding boundary. Fix:
   ``decimal_sum`` / ``sql_decimal_sum`` — cast each value to DECIMAL
   before summing. Decimal addition is exact, so both engines compute THE
   SAME sum regardless of order; cast back to double for derived math.
   (Per-row double→decimal conversion is deterministic per value — no
   accumulation — so the boundary exposure collapses from per-group to
   per-row-representation, i.e. effectively zero for arbitrary doubles.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, digits: int = 4) -> Column:
    """floor(x·10^d + 0.5)/10^d — engine-exact rounding (see module doc)."""
    scale = float(10 ** digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_round_half_up(expr: str, digits: int = 4) -> str:
    scale = 10 ** digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def decimal_sum(col: Column, precision: int = 26, scale: int = 6) -> Column:
    """Order-independent SUM of a double column via exact decimal
    accumulation; returns double."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def sql_decimal_sum(expr: str, precision: int = 26, scale: int = 6) -> str:
    return (f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) "
            f"AS DOUBLE)")
