"""Numeric parity helpers (SURVEY.md §2.8 X8/X9, §2.10 UD4).

Two concerns, both correctness-critical (SURVEY.md §4 "needs custom work"):

1. **Half-up rounding.** The reference ships an explicit Oracle-parity shim
   because Python ``round()`` is banker's rounding
   (``src/weekly/processors/shipment.py:24-33``). Spark's ``F.round`` is
   already HALF_UP on the decimal representation, so we standardize on it —
   ``round_half_up`` exists to make the intent explicit at call sites.

2. **Order-independent aggregation.** Floating-point sums depend on partition
   order, which differs between engines and between runs at different
   parallelism. Every *reported* sum/avg goes through an exact
   ``DecimalType`` intermediate so Spark and the DuckDB oracle produce
   bit-identical doubles. This is also the right call at 100 TB: decimal
   sums are associative, so map-side partial aggregation stays exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale used for per-row products before the exact sum. 6 fractional digits
# comfortably covers the test data's 2-decimal money values and their
# products with 2-decimal rates.
DEFAULT_SCALE = 6
# 18 digits of precision keeps the per-row cast cheap (fits a long) while the
# sum result widens automatically.
_PRECISION = 18


def round_half_up(col: Column, scale: int = 1) -> Column:
    """Oracle-style ROUND (half away from zero) — Spark F.round semantics."""
    return F.round(col, scale)


def dec_sum(col: Column, scale: int = DEFAULT_SCALE) -> Column:
    """Exact (order-independent) sum of a numeric column, returned as double.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(18,scale))) AS DOUBLE)``.
    """
    return F.sum(col.cast(f"decimal({_PRECISION},{scale})")).cast("double")


def dec_avg(col: Column, scale: int = DEFAULT_SCALE, out_scale: int = 6) -> Column:
    """Order-independent average: exact decimal sum / count, rounded.

    DuckDB-oracle equivalent:
    ``ROUND(CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x), out_scale)``.
    """
    total = F.sum(col.cast(f"decimal({_PRECISION},{scale})")).cast("double")
    return F.round(total / F.count(col), out_scale)


def sql_dec_sum(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The DuckDB SQL string mirroring :func:`dec_sum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"


def sql_dec_avg(expr: str, scale: int = DEFAULT_SCALE, out_scale: int = 6) -> str:
    """The DuckDB SQL string mirroring :func:`dec_avg`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL({_PRECISION},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}), {out_scale})"
    )
