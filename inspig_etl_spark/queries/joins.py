"""Join-operator queries (SURVEY.md §2.3).

Each query exercises one join idiom the reference uses, re-expressed so
Catalyst picks the physical join (broadcast where a side is small) and the
dedup/anti/semi semantics are declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.dates import date_spine
from inspig_etl_spark.functions.rounding import dec_sum, sql_dec_sum
from inspig_etl_spark.operators.events import latest_per_key
from inspig_etl_spark.queries import register


@register(
    "latest_order_per_customer",
    operators="J1,W1 (latest-event dedup-join; ref src/weekly/data_loader.py:232-271)",
    oracle="""
WITH latest AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_order_date,
         o_orderstatus, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT c_custkey, c_name, o_orderkey AS last_orderkey, last_order_date,
       o_orderstatus AS last_status, o_totalprice AS last_totalprice
FROM customer LEFT JOIN latest ON c_custkey = o_custkey AND rn = 1
""",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    last = latest_per_key(orders, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"])
    last = last.select(
        "o_custkey",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").cast("date").alias("last_order_date"),
        F.col("o_orderstatus").alias("last_status"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
    return cust.join(last, cust.c_custkey == last.o_custkey, "left").select(
        "c_custkey", "c_name", "last_orderkey", "last_order_date", "last_status", "last_totalprice"
    )


@register(
    "customers_inactive_anti_join",
    operators="J7 (anti-join; ref src/weekly/processors/alert.py:108-118)",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c.c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01'
)
""",
)
def customers_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "customers_urgent_semi_join",
    operators="J8 (semi-join; ref src/weekly/processors/schedule.py:428-431)",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
)
""",
)
def customers_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "order_value_band_join",
    operators="J9,A10 (band/theta join to bucket spine + zero-fill; ref alert.py:188-204)",
    oracle="""
WITH buckets(bucket_id, bucket_nm, lo, hi) AS (
  VALUES (1, 'lt_50k',    0.0,     50000.0),
         (2, '50k_150k',  50000.0, 150000.0),
         (3, '150k_300k', 150000.0, 300000.0),
         (4, 'ge_300k',   300000.0, 1000000000.0)
)
SELECT bucket_id, bucket_nm,
       COUNT(o_orderkey) AS order_cnt,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_value
FROM buckets LEFT JOIN orders
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY bucket_id, bucket_nm
""",
)
def order_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    buckets = spark.createDataFrame(
        [
            (1, "lt_50k", 0.0, 50_000.0),
            (2, "50k_150k", 50_000.0, 150_000.0),
            (3, "150k_300k", 150_000.0, 300_000.0),
            (4, "ge_300k", 300_000.0, 1_000_000_000.0),
        ],
        "bucket_id INT, bucket_nm STRING, lo DOUBLE, hi DOUBLE",
    )
    # Static, non-overlapping buckets: the scalable plan is a when-chain
    # bucket expression + groupBy (whole-stage-codegen, map-side partials),
    # NOT a nested-loop range join that evaluates 4 predicates per fact row.
    # The spine left join only restores empty buckets (zero-fill). The
    # genuine range-join form stays available as operators.ranges.range_join
    # for overlapping/dynamic bands.
    bucket_id = (
        F.when(F.col("o_totalprice") < 50_000.0, 1)
        .when(F.col("o_totalprice") < 150_000.0, 2)
        .when(F.col("o_totalprice") < 300_000.0, 3)
        .otherwise(4)
    )
    # Match the band table's [lo, hi) domain EXACTLY: the oracle's range
    # join silently excludes NULL, negative, and >= 1e9 totals (they match
    # no band), so the when-chain must not sweep them into buckets 1/4 —
    # divergence invisible on current data, real after a data regen.
    in_domain = (F.col("o_totalprice") >= 0.0) & (F.col("o_totalprice") < 1_000_000_000.0)
    per_bucket = orders.filter(in_domain).groupBy(bucket_id.alias("bucket_id")).agg(
        F.count("o_orderkey").alias("order_cnt"),
        dec_sum(F.col("o_totalprice"), 2).alias("total_value"),
    )
    return buckets.select("bucket_id", "bucket_nm").join(per_bucket, "bucket_id", "left").select(
        "bucket_id",
        "bucket_nm",
        F.coalesce(F.col("order_cnt"), F.lit(0)).alias("order_cnt"),
        F.coalesce(F.col("total_value"), F.lit(0.0)).alias("total_value"),
    )


@register(
    "daily_orders_calendar_spine",
    operators="J10 (dense date spine left join, missing days kept; ref data_loader.py:500-536)",
    oracle=f"""
WITH spine AS (
  SELECT CAST(d AS DATE) AS order_day
  FROM generate_series(DATE '1997-01-01', DATE '1997-01-31', INTERVAL 1 DAY) AS t(d)
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_day,
         COUNT(*) AS order_cnt,
         {sql_dec_sum('o_totalprice', 2)} AS day_value
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
  GROUP BY 1
)
SELECT spine.order_day, COALESCE(order_cnt, 0) AS order_cnt, day_value
FROM spine LEFT JOIN daily USING (order_day)
""",
)
def daily_orders_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = date_spine(spark, "1997-01-01", "1997-01-31", "order_day")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("order_day")).agg(
        F.count(F.lit(1)).alias("order_cnt"),
        dec_sum(F.col("o_totalprice"), 2).alias("day_value"),
    )
    # NULL day_value (no orders) is kept — the reference's chart semantics
    # distinguish empty days (NULL) from zero-valued days.
    return (
        spine.join(daily, "order_day", "left")
        .select(
            "order_day",
            F.coalesce(F.col("order_cnt"), F.lit(0)).alias("order_cnt"),
            "day_value",
        )
    )


@register(
    "full_outer_diff_report",
    operators="J13 (differential full-outer compare; ref final_compare_45_51.py:38-162)",
    oracle="""
WITH a AS (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey
),
b AS (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY o_custkey
)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       COALESCE(a.cnt, 0) AS cnt_before,
       COALESCE(b.cnt, 0) AS cnt_after,
       COALESCE(b.cnt, 0) - COALESCE(a.cnt, 0) AS cnt_diff,
       CASE WHEN a.o_custkey IS NULL THEN 'ONLY_AFTER'
            WHEN b.o_custkey IS NULL THEN 'ONLY_BEFORE'
            WHEN a.cnt = b.cnt THEN 'MATCH' ELSE 'DIFF' END AS diff_status
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
""",
)
def full_outer_diff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    a = orders.filter(F.col("o_orderdate") < cutoff).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    b = orders.filter(F.col("o_orderdate") >= cutoff).groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a = a.select(F.col("o_custkey").alias("a_key"), F.col("cnt").alias("a_cnt"))
    b = b.select(F.col("o_custkey").alias("b_key"), F.col("cnt").alias("b_cnt"))
    joined = a.join(b, a.a_key == b.b_key, "full_outer")
    return joined.select(
        F.coalesce(F.col("a_key"), F.col("b_key")).alias("custkey"),
        F.coalesce(F.col("a_cnt"), F.lit(0)).alias("cnt_before"),
        F.coalesce(F.col("b_cnt"), F.lit(0)).alias("cnt_after"),
        (F.coalesce(F.col("b_cnt"), F.lit(0)) - F.coalesce(F.col("a_cnt"), F.lit(0))).alias(
            "cnt_diff"
        ),
        F.when(F.col("a_key").isNull(), "ONLY_AFTER")
        .when(F.col("b_key").isNull(), "ONLY_BEFORE")
        .when(F.col("a_cnt") == F.col("b_cnt"), "MATCH")
        .otherwise("DIFF")
        .alias("diff_status"),
    )
