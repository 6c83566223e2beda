"""Pivot-family queries (SURVEY.md §2.4 A4/A15, §2.6 T4/T5).

Models the reference's herd crosstab (``modon.py:150-243``) and 15-per-row
wide output (``culling.py:264-312``) on the synthetic star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.operators.pivots import chunked_wide_rows, pivot_counts, zero_fill
from inspig_etl_spark.queries import register

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY", "NO_SEGMENT")
_STATUSES = ("O", "F", "P")


@register(
    "pivot_crosstab_zero_fill",
    operators="A4,A15,T5 (pivot + zero-filled spine + fixed sort; ref base.py:421-453, modon.py:150-243)",
    oracle=f"""
WITH spine(sort_no, c_mktsegment) AS (
  VALUES {", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(_SEGMENTS))}
),
x AS (
  SELECT c_mktsegment,
         {", ".join(f"COUNT(CASE WHEN o_orderstatus = '{st}' THEN 1 END) AS status_{st}" for st in _STATUSES)},
         COUNT(*) AS total_cnt
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_mktsegment
)
SELECT sort_no, spine.c_mktsegment AS segment,
       {", ".join(f"COALESCE(status_{st}, 0) AS status_{st}" for st in _STATUSES)},
       COALESCE(total_cnt, 0) AS total_cnt
FROM spine LEFT JOIN x USING (c_mktsegment)
""",
)
def pivot_crosstab_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment x order-status crosstab; the spine carries a segment absent
    from the data (NO_SEGMENT) so the zero-fill path is actually exercised,
    plus an explicit sort_no column (T5 deterministic output ordering)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    pivoted = pivot_counts(
        joined, "c_mktsegment", "o_orderstatus", _STATUSES, prefix="status_"
    )
    # total as a separate grouped count joined on — keeps the pivot single
    # purpose; Catalyst reuses the shuffle.
    totals = joined.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("total_cnt"))
    pivoted = pivoted.join(totals, "c_mktsegment", "left")
    spine = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(_SEGMENTS)], "sort_no INT, c_mktsegment STRING"
    )
    filled = zero_fill(
        pivoted, spine, "c_mktsegment", [f"status_{s}" for s in _STATUSES] + ["total_cnt"]
    )
    return filled.select(
        "sort_no",
        F.col("c_mktsegment").alias("segment"),
        *[f"status_{s}" for s in _STATUSES],
        "total_cnt",
    )


_PER_ROW = 15


@register(
    "chunked_wide_rows",
    operators="T4,T1 (chunked pagination into 15-per-row wide rows; ref culling.py:264-312)",
    oracle=f"""
WITH reasons AS (
  SELECT p_type AS nm, COUNT(*) AS cnt
  FROM part GROUP BY p_type
),
numbered AS (
  SELECT nm, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, nm) AS rn
  FROM reasons
),
keyed AS (
  SELECT CAST(FLOOR((rn - 1) / {_PER_ROW}) AS INT) AS chunk_no,
         CAST((rn - 1) % {_PER_ROW} + 1 AS INT) AS pos, nm, cnt
  FROM numbered
)
SELECT chunk_no,
       {", ".join(f"MIN(CASE WHEN pos = {i} THEN nm END) AS str_{i}, MIN(CASE WHEN pos = {i} THEN cnt END) AS cnt_{i}" for i in range(1, _PER_ROW + 1))}
FROM keyed
GROUP BY chunk_no
""",
)
def chunked_wide_rows_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-type frequency list paginated 15-per-row, reference output shape:
    one row per chunk with str_1..15 / cnt_1..15 (NULL-padded tail)."""
    part = table(spark, sf_dir, "part")
    reasons = part.groupBy(F.col("p_type").alias("nm")).agg(F.count(F.lit(1)).alias("cnt"))
    return chunked_wide_rows(
        reasons,
        order_by=[F.col("cnt").desc(), F.col("nm")],
        name_col="nm",
        value_col="cnt",
        per_row=_PER_ROW,
    )
