"""Event-log window kernel (SURVEY.md §2.3 J1/J2/J4, §2.5 W1-W5).

The reference's analytical core is an append-only sow work-history table
(``TB_MODON_WK``) consumed through four idioms, each re-expressed here as a
single declarative window so Catalyst plans one shuffle per partitioning and
whole-stage-codegens the rest:

- latest event per entity   (``src/weekly/data_loader.py:232-271`` — Oracle
  ROW_NUMBER dedup-join, J1/W1)
- prev/next event           (``data_loader.py:299-327`` — a SEQ±1 *self-join*
  in Oracle; lag/lead here avoids the join entirely, J2/W2)
- as-of join                (``src/weekly/processors/accident.py:130-173`` —
  per-row backwards scan in Python; here a union + running last_value, J4)
- next-event-after          (``src/weekly/processors/weaning.py:145-162`` —
  forward-looking min, W5)

All helpers take explicit key/order columns so they work on any event table
(the test suite drives them with the synthetic ``events`` stream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[str | Column], desc: bool) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if desc else cols


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    keep: int = 1,
) -> DataFrame:
    """Keep the last `keep` rows per key by `order_by` (descending).

    One shuffle on ``keys``; at scale prefer keys with high cardinality
    (entity ids) so the shuffle is well balanced.
    """
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, desc=True))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )


def with_prev_next(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    cols: Sequence[str],
    prefix_prev: str = "prev_",
    prefix_next: str = "next_",
) -> DataFrame:
    """Attach prev_*/next_* columns via lag/lead over one window.

    Replaces the reference's SEQ-1/SEQ+1 self-joins: same result, no join,
    no second shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, desc=False))
    out = df
    for c in cols:
        out = out.withColumn(prefix_prev + c, F.lag(c).over(w))
        out = out.withColumn(prefix_next + c, F.lead(c).over(w))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    strict: bool = True,
    suffix: str = "_asof",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts < left_ts`` (``<=`` when strict=False) within the same keys.

    Implemented as the sort-merge idiom — union both sides tagged, take a
    running ``last(value, ignorenulls=True)`` over event time, then keep the
    left rows. One shuffle on ``keys``, no range-explosion, no per-row scan
    (the reference walks each sow's mating list backwards in Python,
    ``accident.py:130-173``).

    Ties (equal timestamps) resolve with the right row visible to the left
    row only when strict=False, matching ``gb_dt < sago_dt`` semantics.
    """
    out_names = {f"{v}{suffix}" for v in right_vals}
    clashes = (set(right_vals) | out_names | {"__t", "__is_left"}) & set(left.columns)
    if clashes:
        raise ValueError(
            f"asof_join: left columns {sorted(clashes)} collide with right_vals/"
            "internal names; rename them (the tagged union would silently merge "
            "colliding columns and the final drop would discard left-side data)"
        )
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    rt_extra = [c for c in tiebreak if c not in keys and c not in right_vals]
    rt = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        *[F.col(v) for v in right_vals],
        *[F.col(c) for c in rt_extra],
    ).withColumn("__is_left", F.lit(0))

    merged = lt.unionByName(rt, allowMissingColumns=True)
    # Order so that at equal timestamps the right row sorts after (strict)
    # or before (inclusive) the left row; `tiebreak` columns (shared by both
    # sides, e.g. an event id) make ordering among equal-timestamp rows of the
    # same side deterministic.
    tie = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    order = [F.col("__t").asc(), tie, *[F.col(c).asc() for c in tiebreak]]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_incl = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = merged
    for v in right_vals:
        carried = F.when(F.col("__is_left") == 0, F.col(v))
        frame = w if strict else w_incl
        out = out.withColumn(v + suffix, F.last(carried, ignorenulls=True).over(frame))
    return (
        out.filter(F.col("__is_left") == 1)
        .drop("__t", "__is_left", *right_vals)
    )


def asof_value_single_scan(
    df: DataFrame,
    keys: Sequence[str],
    ts: str | Column,
    is_left: Column,
    right_val: Column,
    tiebreak: Sequence[str] = (),
    strict: bool = True,
    out: str = "asof_value",
) -> DataFrame:
    """As-of join where both sides are row-subsets of the SAME DataFrame.

    ``asof_join`` takes two arbitrary inputs and unions them — correct, but
    when left and right are filters of one source the union plans TWO scans
    of it. Here the tagged union is expressed as a projection over a single
    pass: rows where ``is_left`` holds are the probe side, all other rows
    carry ``right_val``, and one running ``last(ignorenulls)`` window per
    ``keys`` attaches the latest strictly-earlier (``strict=True``) or
    not-later value as ``out``. One scan, one shuffle — at 100 TB this
    halves the IO of the union idiom. Returns only the left rows.

    Same semantics as ``asof_join`` (ref ``accident.py:130-173``): at equal
    timestamps the right row is visible to the left row only when
    strict=False; ``tiebreak`` columns order equal-timestamp same-side rows
    deterministically.
    """
    clashes = {"__is_left", "__rv", out} & set(df.columns)
    if clashes:
        raise ValueError(
            f"asof_value_single_scan: input columns {sorted(clashes)} collide "
            "with the tag/output columns (withColumn would silently replace "
            "them and the final drop would discard caller data)"
        )
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    tagged = df.withColumn("__is_left", is_left.cast("int")).withColumn(
        "__rv", F.when(F.col("__is_left") == 0, right_val)
    )
    tie = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    order = [ts_col.asc(), tie, *[F.col(c).asc() for c in tiebreak]]
    end = -1 if strict else 0
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    return (
        tagged.withColumn(out, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .drop("__is_left", "__rv")
    )


def next_event_after(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    cols: Sequence[str],
    prefix: str = "next_",
) -> DataFrame:
    """Earliest following event's attributes, atomically (W5/A9).

    ``min(struct(order, cols...))`` over the forward frame mirrors Oracle's
    ``MIN ... KEEP (DENSE_RANK FIRST ORDER BY ...)`` without a self-join.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*_order_cols(order_by, desc=False))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    order_expr = [F.col(c) if isinstance(c, str) else c for c in order_by]
    packed = F.min(F.struct(*order_expr, *[F.col(c) for c in cols])).over(w)
    out = df.withColumn("__next", packed)
    for c in cols:
        out = out.withColumn(prefix + c, F.col("__next")[c])
    return out.drop("__next")
