"""Pivot / crosstab / wide-row operators (SURVEY.md §2.4 A4/A15, §2.6 T4).

The reference pivots three ways:

- ``pivot_data(data, row_key, col_key, value, agg)`` — the base-class
  utility every processor can call
  (``/root/reference/src/weekly/processors/base.py:421-453``).
- parity x status crosstab with a zero-filled row spine and fixed sort —
  the heart of the herd report
  (``/root/reference/src/weekly/processors/modon.py:150-243``).
- chunked pagination into wide rows, 15 items per row into ``STR_1..15`` /
  ``CNT_1..15`` (``/root/reference/src/weekly/processors/culling.py:264-312``).

Scale notes: ``pivot`` is always called with an EXPLICIT values list — an
implicit pivot runs a distinct-collect job over the column first (an extra
full pass at 100 TB) and makes the output schema data-dependent. The chunked
emitter shuffles once on the chunk id; chunk ids are dense integers, so the
shuffle is balanced by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_counts(
    df: DataFrame,
    row_key: str | Column,
    col_key: str,
    col_values: Sequence[str],
    prefix: str = "",
) -> DataFrame:
    """Crosstab: one row per row_key, one count column per col value.

    Mirrors ``pivot_data(..., agg='count')``; explicit ``col_values`` keeps
    the plan single-pass and the schema static.
    """
    out = df.groupBy(row_key).pivot(col_key, list(col_values)).count()
    for v in col_values:
        out = out.withColumnRenamed(str(v), f"{prefix}{v}")
    return out


def pivot_agg(
    df: DataFrame,
    row_keys: Sequence[str],
    col_key: str,
    col_values: Sequence[str],
    value_col: str,
    agg: str = "max",
    rename: Sequence[str] | None = None,
) -> DataFrame:
    """Value pivot: one row per row-key tuple, one aggregated value column
    per ``col_values`` entry (``pivot_data(..., agg=<fn>)`` with a value
    column; the productivity collector's STATCD→C### reshape,
    ``/root/reference/src/collectors/productivity.py:337-372``).

    ``col_values`` is explicit for the same single-pass/static-schema
    reasons as :func:`pivot_counts`; ``rename`` (parallel to
    ``col_values``) sets the output column names.
    """
    out = df.groupBy(*row_keys).pivot(col_key, list(col_values)).agg(
        getattr(F, agg)(value_col)
    )
    for v, name in zip(col_values, rename or col_values):
        out = out.withColumnRenamed(str(v), str(name))
    return out


def zero_fill(
    pivoted: DataFrame,
    spine: DataFrame,
    on: str,
    fill_cols: Sequence[str],
    fill_value: int = 0,
) -> DataFrame:
    """Left-join a static spine so empty rows/cells appear as zeros.

    The reference emits every parity row even when the farm has no sows in
    it (``modon.py:222-243``); spine left join + coalesce is the Spark form.
    """
    joined = spine.join(pivoted, on, "left")
    return joined.select(
        *[c for c in spine.columns],
        *[
            F.coalesce(F.col(c), F.lit(fill_value)).alias(c)
            for c in fill_cols
        ],
    )


def chunked_wide_rows(
    df: DataFrame,
    order_by: Sequence[Column],
    name_col: str,
    value_col: str,
    per_row: int = 15,
    name_prefix: str = "str_",
    value_prefix: str = "cnt_",
) -> DataFrame:
    """Paginate an ordered list into wide rows of ``per_row`` items.

    ``row_number`` over the given total order → chunk = (rn-1) / per_row →
    pivot position (rn-1) % per_row into ``str_i`` / ``cnt_i`` columns.
    Exactly the reference's 15-per-row output format (``culling.py:264-312``)
    as one window + one pivot.

    The window is GLOBAL (single-partition) by design: the input must
    already be an aggregated, bounded list (report rows), never a fact
    table — same invariant the reference's in-memory chunker assumes.
    """
    from pyspark.sql import Window

    w = Window.orderBy(*order_by)
    numbered = df.withColumn("__rn", F.row_number().over(w))
    keyed = numbered.select(
        F.floor((F.col("__rn") - 1) / per_row).cast("int").alias("chunk_no"),
        (((F.col("__rn") - 1) % per_row) + 1).cast("int").alias("__pos"),
        F.col(name_col).alias("__nm"),
        F.col(value_col).alias("__val"),
    )
    pivoted = (
        keyed.groupBy("chunk_no")
        .pivot("__pos", list(range(1, per_row + 1)))
        .agg(F.first("__nm").alias("nm"), F.first("__val").alias("val"))
    )
    cols = [F.col("chunk_no")]
    for i in range(1, per_row + 1):
        cols.append(F.col(f"{i}_nm").alias(f"{name_prefix}{i}"))
        cols.append(F.col(f"{i}_val").alias(f"{value_prefix}{i}"))
    return pivoted.select(*cols)
