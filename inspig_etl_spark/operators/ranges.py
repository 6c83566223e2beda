"""Range/band join operator (SURVEY.md §2.3 J9).

The reference's bucket assignment (``src/weekly/processors/alert.py:188-204``)
joins each delay row to a 4-row period table on ``delay BETWEEN min AND max``.
For STATIC non-overlapping buckets the preferred plan is a ``F.when`` chain +
groupBy (see ``queries/joins.py:order_value_band_join``); this operator is the
genuine theta-join form for the cases a when-chain can't express: overlapping
bands, or a bands table only known at runtime.

Scale note: the bands side must be small (it is broadcast); the fact side
streams through a BroadcastNestedLoopJoin evaluating |bands| predicates per
row. Never use this with a large bands side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value: str | Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to every band with ``lo <= value < hi``.

    ``bands`` is hard-broadcast (it is a spine of a few dozen rows at most);
    ``how='right'`` from the facts side keeps empty bands for zero-fill.
    """
    v = F.col(value) if isinstance(value, str) else value
    cond = (v >= bands[lo]) & (v < bands[hi])
    # Broadcast the small bands side; with how='right' the preserved side is
    # the broadcast one, which Spark supports (unlike broadcasting the
    # preserved side of a left join, where the hint would be ignored).
    return facts.join(F.broadcast(bands), cond, how)
