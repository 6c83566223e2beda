"""Composed productivity collector flow (SURVEY.md §7; A4 + S10 in one
pipeline, the way ``ProductivityCollector`` runs —
``/root/reference/src/collectors/productivity.py:337-451``):

1. stat items arrive as (6-char STATCD, value); ``PCODE = STATCD[:3]``
   picks the row, ``'C' + STATCD[3:]`` the column (``:337-372``);
2. pivot to wide rows keyed (farm, pcode, year, period, period_no), one
   ``C###`` column per suffix, missing cells NULL;
3. DELETE existing rows by each new row's UK, then bulk INSERT
   (``save()``, ``:375-451``) — rows of other periods survive.

Inputs are synthesized deterministically from ``orders`` (items) and a
``range`` spine (the pre-existing TS_PRODUCTIVITY state), same formulas in
both engines, so the whole composition is hash-checked.

Scale: the pivot is a single groupBy with an EXPLICIT column list (no
distinct-collect pre-pass); the replace is one anti-join shuffle on the
UK. Nothing is quadratic, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.operators.pivots import pivot_agg
from inspig_etl_spark.queries import register
from inspig_etl_spark.sources.sinks import replace_by_key

STAT_YEAR = 2024
PERIOD = "W"
PERIOD_NO = 3

_C_VALUES = ("C001", "C002", "C003", "C004")
_C_NAMES = ("c001", "c002", "c003", "c004")

_SQL = f"""
WITH items AS (
  SELECT o_custkey % 10 AS farm_no,
         '03' || CAST(1 + o_orderkey % 3 AS VARCHAR) AS pcode,
         'C00' || CAST(1 + o_orderkey % 4 AS VARCHAR) AS col_name,
         CAST(o_orderkey % 1000 AS INT) AS val
  FROM orders
),
wide AS (
  SELECT farm_no, pcode,
         {STAT_YEAR} AS stat_year, '{PERIOD}' AS period, {PERIOD_NO} AS period_no,
         {", ".join(f"MAX(CASE WHEN col_name = '{v}' THEN val END) AS {n}" for v, n in zip(_C_VALUES, _C_NAMES))}
  FROM items GROUP BY farm_no, pcode
),
target AS (
  SELECT r.range AS farm_no, '031' AS pcode,
         {STAT_YEAR} AS stat_year, '{PERIOD}' AS period, pn.period_no,
         {", ".join(f"CAST(r.range * 10 + {k} AS INT) AS {n}" for k, n in enumerate(_C_NAMES, start=1))}
  FROM range(10) r CROSS JOIN (VALUES (2), ({PERIOD_NO})) pn(period_no)
)
SELECT * FROM target t
WHERE NOT EXISTS (
  SELECT 1 FROM wide w
  WHERE w.farm_no = t.farm_no AND w.pcode = t.pcode
    AND w.stat_year = t.stat_year AND w.period = t.period
    AND w.period_no = t.period_no
)
UNION ALL
SELECT * FROM wide
"""

_UK = ["farm_no", "pcode", "stat_year", "period", "period_no"]


@register(
    "productivity_pivot_save",
    operators="A4,S10,T5 (composed collector: STATCD split -> dynamic C### pivot -> delete-by-UK-then-insert; ref productivity.py:337-451)",
    oracle=_SQL,
)
def productivity_pivot_save(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    items = o.select(
        (F.col("o_custkey") % 10).alias("farm_no"),
        F.concat(F.lit("03"), (1 + F.col("o_orderkey") % 3).cast("string")).alias("pcode"),
        F.concat(F.lit("C00"), (1 + F.col("o_orderkey") % 4).cast("string")).alias("col_name"),
        (F.col("o_orderkey") % 1000).cast("int").alias("val"),
    )
    wide = pivot_agg(
        items,
        row_keys=["farm_no", "pcode"],
        col_key="col_name",
        col_values=_C_VALUES,
        value_col="val",
        agg="max",
        rename=_C_NAMES,
    ).select(
        "farm_no",
        "pcode",
        F.lit(STAT_YEAR).alias("stat_year"),
        F.lit(PERIOD).alias("period"),
        F.lit(PERIOD_NO).alias("period_no"),
        *_C_NAMES,
    )

    target = spark.range(10).select(
        F.col("id").alias("farm_no"),
        F.explode(F.array(F.lit(2), F.lit(PERIOD_NO))).alias("period_no"),
    ).select(
        "farm_no",
        F.lit("031").alias("pcode"),
        F.lit(STAT_YEAR).alias("stat_year"),
        F.lit(PERIOD).alias("period"),
        "period_no",
        *[
            (F.col("farm_no") * 10 + k).cast("int").alias(n)
            for k, n in enumerate(_C_NAMES, start=1)
        ],
    )
    return replace_by_key(target, wide, keys=_UK)
