"""Time-series gap handling: spine densification + linear interpolation.

The reference's weather pipeline zero-fills missing report slots against a
calendar spine (J10) and carries observations forward implicitly through
MERGE precedence; a real hypertable engine also needs VALUE interpolation
for sensor gaps. This module provides it as pure window expressions:

- :func:`with_neighbors` annotates every (possibly-NULL) sample with the
  previous and next non-NULL observation and their positions — two
  partitioned windows (one ascending, one descending), ``last_value``
  with ``ignoreNulls`` so runs of gaps all see the same anchors.
- :func:`linear_interpolate` fills each gap by the straight line between
  its anchors; a leading gap back-fills from the next observation, a
  trailing gap forward-fills from the previous (pandas ``interpolate`` +
  ``bfill``/``ffill`` edge semantics).

Scale: both windows partition by the series key and sort by the (bounded
per-partition) time axis — no global window, no self-join per gap, state
bounded by a partition. The arithmetic is plain double IEEE ops in a fixed
shape, so a SQL oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_neighbors(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Annotate rows with (prev_val, prev_t, next_val, next_t) — the nearest
    non-NULL observation on each side (the row's own value when present)."""
    asc = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    desc = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col)
    t_if_obs = F.when(v.isNotNull(), F.col(time_col))
    return (
        df.withColumn("__prev_val", F.last(v, ignorenulls=True).over(asc))
        .withColumn("__prev_t", F.last(t_if_obs, ignorenulls=True).over(asc))
        .withColumn("__next_val", F.last(v, ignorenulls=True).over(desc))
        .withColumn("__next_t", F.last(t_if_obs, ignorenulls=True).over(desc))
    )


def linear_interpolate(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_col: str,
    out_col: str = "value_filled",
) -> DataFrame:
    """Fill NULL samples on the line between their non-NULL neighbors.

    Gap value = prev + (next - prev) * (t - prev_t) / (next_t - prev_t);
    leading gaps take the next observation, trailing gaps the previous.
    An all-NULL series stays NULL. Observed rows pass through untouched.

    Duplicate-timestamp rows (an observed and a NULL row sharing ``time_col``
    within a key) make both anchors resolve to the same instant; the fill
    degenerates to that observation's value (guarded — the unguarded ratio
    would be 0/0, a DIVIDE_BY_ZERO crash under Spark 4's default ANSI
    mode). For fully deterministic anchor choice keep ``time_col`` unique
    per key — multiple OBSERVED rows on one timestamp have no defined
    winner in either engine.
    """
    ann = with_neighbors(df, keys, time_col, value_col)
    t = F.col(time_col).cast("double")
    pv, pt = F.col("__prev_val"), F.col("__prev_t").cast("double")
    nv, nt = F.col("__next_val"), F.col("__next_t").cast("double")
    frac = (t - pt) / (nt - pt)
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(pv.isNull(), nv)  # leading gap: back-fill
        .when(nv.isNull(), pv)  # trailing gap: forward-fill
        .when(nt == pt, pv)  # duplicate-timestamp anchors: 0/0 guard
        .otherwise(pv + (nv - pv) * frac)
    )
    return ann.withColumn(out_col, filled).drop(
        "__prev_val", "__prev_t", "__next_val", "__next_t"
    )


def sql_linear_interpolate(
    keys: str, time_col: str, value_col: str
) -> tuple[str, str]:
    """DuckDB twins of the two window annotations + the fill expression.

    Returns (window_select_fragment, fill_expression) to splice into a
    query: the fragment computes __prev/__next anchors with IGNORE NULLS
    frames identical to :func:`with_neighbors`.
    """
    anchors = f"""
         LAST_VALUE({value_col} IGNORE NULLS) OVER (
           PARTITION BY {keys} ORDER BY {time_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __prev_val,
         LAST_VALUE(CASE WHEN {value_col} IS NOT NULL THEN {time_col} END IGNORE NULLS) OVER (
           PARTITION BY {keys} ORDER BY {time_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __prev_t,
         LAST_VALUE({value_col} IGNORE NULLS) OVER (
           PARTITION BY {keys} ORDER BY {time_col} DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __next_val,
         LAST_VALUE(CASE WHEN {value_col} IS NOT NULL THEN {time_col} END IGNORE NULLS) OVER (
           PARTITION BY {keys} ORDER BY {time_col} DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __next_t"""
    # The fraction divides BEFORE multiplying (extra parens), matching the
    # Python side's `pv + (nv - pv) * frac` — the other association differs
    # in the last ulp and fails the bit-exact gate.
    fill = f"""
       CASE WHEN {value_col} IS NOT NULL THEN {value_col}
            WHEN __prev_val IS NULL THEN __next_val
            WHEN __next_val IS NULL THEN __prev_val
            WHEN CAST(__next_t AS DOUBLE) = CAST(__prev_t AS DOUBLE) THEN __prev_val
            ELSE __prev_val + (__next_val - __prev_val)
                 * ((CAST({time_col} AS DOUBLE) - CAST(__prev_t AS DOUBLE))
                    / (CAST(__next_t AS DOUBLE) - CAST(__prev_t AS DOUBLE)))
       END"""
    return anchors, fill
