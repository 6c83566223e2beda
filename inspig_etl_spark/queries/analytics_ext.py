"""OLAP analytics extensions beyond the reference's report surface:
ROLLUP/grouping-sets subtotals and exact percentile distributions — the
two aggregate shapes an analytics engine is expected to carry that the
reference's fixed report sections never needed (its subtotal rows are
hand-unioned per section, ``src/weekly/processors/*``; a rollup computes
the same lattice in one pass).

Cross-engine notes: Spark ``grouping_id()`` and DuckDB ``GROUPING(a, b)``
agree bit-for-bit on the subtotal lattice ids; Spark's exact
``percentile`` and DuckDB's ``quantile_cont`` share the same linear
interpolation on doubles (probed identical at the ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.rounding import dec_sum, sql_dec_sum
from inspig_etl_spark.operators.timeseries import sql_linear_interpolate
from inspig_etl_spark.queries import register


@register(
    "orders_priority_rollup",
    operators="A2,A16-ext (ROLLUP subtotal lattice: per-(priority,status) totals, per-priority subtotals, grand total, one pass with grouping ids)",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS order_cnt,
       {sql_dec_sum('o_totalprice', 2)} AS total,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
-- exact mirror of Spark's empty-input behavior: standard-SQL ROLLUP emits
-- a COUNT=0 grand-total row over ZERO input rows (the () grouping set),
-- Spark's rollup() emits nothing; on any non-empty input every grouping-
-- set row aggregates >= 1 row, so this HAVING is a no-op there
HAVING COUNT(*) > 0
""",
)
def orders_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal lattice in ONE aggregation: Spark expands the rollup into
    grouping sets and still plans partial (map-side) aggregation per set —
    at 100 TB this is one shuffle, not one scan per subtotal level like the
    reference's hand-unioned section totals."""
    orders = table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        dec_sum(F.col("o_totalprice"), 2).alias("total"),
        F.grouping_id().cast("bigint").alias("gid"),
    )


@register(
    "order_value_percentiles",
    operators="A-ext (exact percentile distribution per bounded group; linear interpolation parity with quantile_cont)",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9) AS p90,
       quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99) AS p99,
       MIN(o_totalprice) AS min_total,
       MAX(o_totalprice) AS max_total
FROM orders
GROUP BY o_orderpriority
""",
)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per priority (5 bounded groups). Exact percentile
    sorts within the group — correct here because group count is fixed and
    small; at 100 TB with high-cardinality groups the scale path is
    ``percentile_approx`` (KLL-sketch-backed, mergeable map-side), which is
    deliberately NOT oracle-gated: approximate sketches are not
    bit-comparable across engines."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        F.min("o_totalprice").alias("min_total"),
        F.max("o_totalprice").alias("max_total"),
    )


@register(
    "order_value_percentiles_approx",
    operators="A-ext scale path (percentile_approx: mergeable quantile sketch, map-side combinable — the 100 TB form of order_value_percentiles)",
    oracle=None,  # approximate sketches are not bit-comparable across engines
)
def order_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path documented on :func:`order_value_percentiles`, as a
    first-class query: ``percentile_approx`` builds a bounded-size quantile
    sketch per map partition and MERGES sketches at the reducer — no
    per-group sort, memory O(accuracy) instead of O(group size), exactly
    what exact percentile cannot do at 100 TB group cardinalities.

    Deliberately registered WITHOUT an oracle (rows-only driver check): the
    sketch's answers are rank-error-bounded, not bit-reproducible across
    engines. The unit-level guarantee (approx within the exact p50/p99
    envelope at accuracy 10k) is pinned by ``test_properties``'s sibling
    test instead.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(10000)).alias("p90"),
        F.percentile_approx("o_totalprice", F.lit(0.99), F.lit(10000)).alias("p99"),
        F.min("o_totalprice").alias("min_total"),
        F.max("o_totalprice").alias("max_total"),
    )


@register(
    "hourly_gap_interpolation",
    operators="W-ext (time-series gap fill: per-series linear interpolation between nearest observations, IGNORE NULLS window anchors, bfill/ffill edges; operators/timeseries.py)",
    oracle=f"""
WITH grids AS (SELECT DISTINCT CAST(p_partkey % 12 AS INT) AS g FROM part),
sp AS (SELECT g, unnest(range(0, 24)) AS h0 FROM grids),
d AS (
  SELECT g, CAST(h0 AS INT) AS h,
         CASE WHEN (g * 7 + h0) % 3 = 0 OR (g + h0) % 11 = 0 THEN NULL
              ELSE CAST((g * 13 + h0 * 5) % 40 - 10 AS DOUBLE) + 0.5 END AS temp
  FROM sp
),
a AS (
  SELECT g, h, temp,{sql_linear_interpolate('g', 'h', 'temp')[0]}
  FROM d
)
SELECT g, h, temp,{sql_linear_interpolate('g', 'h', 'temp')[1]} AS temp_filled
FROM a
""",
)
def hourly_gap_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A gappy 24-hour temperature series per grid cell (one third of the
    slots NULL, including leading/trailing runs) filled by the window-based
    linear interpolator — the hypertable gap-fill the reference's zero-fill
    spine cannot express."""
    from inspig_etl_spark.operators.timeseries import linear_interpolate

    part = table(spark, sf_dir, "part")
    grids = part.select((F.col("p_partkey") % 12).cast("int").alias("g")).distinct()
    sp = grids.select("g", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"))
    g, h = F.col("g"), F.col("h")
    temp = F.when(
        ((g * 7 + h) % 3 == 0) | ((g + h) % 11 == 0), F.lit(None).cast("double")
    ).otherwise(((g * 13 + h * 5) % 40 - 10).cast("double") + 0.5)
    d = sp.select("g", h.cast("int").alias("h"), temp.alias("temp"))
    return linear_interpolate(d, ["g"], "h", "temp", out_col="temp_filled")
