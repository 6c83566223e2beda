"""Aggregation-operator queries (SURVEY.md §2.4, §2.6, §2.7, §2.8).

Conditional aggregation, weighted averages, histogram buckets with zero-fill,
2-D scatter, YTD windows, week-over-week deltas, distinct, top-N with pinned
tail, listagg — the reference's reporting arithmetic, as single declarative
aggregates with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.dates import iso_week, iso_year, us_to_day
from inspig_etl_spark.functions.rounding import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum
from inspig_etl_spark.queries import register


@register(
    "weighted_avg_price",
    operators="A6 (weighted average; ref orchestrator.py:678-692, shipment.py:101-115)",
    oracle=f"""
SELECT l_returnflag,
       ROUND({sql_dec_sum('l_extendedprice * l_quantity', 4)}
             / NULLIF({sql_dec_sum('l_quantity', 2)}, 0), 4) AS weighted_avg_price,
       {sql_dec_avg('l_extendedprice', 2)} AS plain_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            dec_sum(F.col("l_extendedprice") * F.col("l_quantity"), 4)
            / F.nullif(dec_sum(F.col("l_quantity"), 2), F.lit(0.0)),
            4,
        ).alias("weighted_avg_price"),
        dec_avg(F.col("l_extendedprice"), 2).alias("plain_avg_price"),
    )


@register(
    "conditional_agg_by_day",
    operators="A5,A13 (SUM(CASE WHEN) family + daily rollup; ref data_loader.py:520-534, weather.py:1770-1809)",
    oracle=f"""
SELECT CAST(ts AS DATE) AS event_day,
       COUNT(*) AS total_cnt,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_cnt,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_cnt,
       {sql_dec_sum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END", 6)} AS purchase_value,
       ROUND(CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS min_value,
       ROUND(CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS max_value,
       {sql_dec_avg('value', 6)} AS avg_value
FROM events
GROUP BY 1
""",
)
def conditional_agg_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    val_dec = F.col("value").cast("decimal(18,6)")
    return ev.groupBy(us_to_day(F.col("ts_us")).alias("event_day")).agg(
        F.count(F.lit(1)).alias("total_cnt"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase_cnt"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("error_cnt"),
        dec_sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0)), 6
        ).alias("purchase_value"),
        F.round(F.min(val_dec).cast("double"), 6).alias("min_value"),
        F.round(F.max(val_dec).cast("double"), 6).alias("max_value"),
        dec_avg(F.col("value"), 6).alias("avg_value"),
    )


@register(
    "avg_over_valid_only",
    operators="A7 (AVG(CASE WHEN x>0 THEN x END) — nulls skipped; ref data_loader.py:524-525)",
    oracle=f"""
SELECT o_orderstatus,
       {sql_dec_avg("CASE WHEN o_totalprice > 100000 THEN o_totalprice END", 2)} AS avg_large_price,
       COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS large_cnt,
       COUNT(*) AS total_cnt
FROM orders
GROUP BY o_orderstatus
""",
)
def avg_over_valid_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    valid = F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
    return orders.groupBy("o_orderstatus").agg(
        dec_avg(valid, 2).alias("avg_large_price"),
        F.count(valid).alias("large_cnt"),
        F.count(F.lit(1)).alias("total_cnt"),
    )


@register(
    "two_stage_avg_of_daily_avgs",
    operators="A8 (avg-of-daily-averages vs global weighted avg, both; ref shipment.py:101-115,490-512)",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS event_day, user_id,
         {sql_dec_avg('value', 6)} AS day_avg,
         {sql_dec_sum('value', 6)} AS day_sum,
         COUNT(*) AS day_cnt
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT user_id,
       {sql_dec_avg('day_avg', 6)} AS avg_of_daily_avgs,
       ROUND({sql_dec_sum('day_sum', 6)} / SUM(day_cnt), 6) AS global_weighted_avg
FROM daily
GROUP BY user_id
""",
)
def two_stage_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(us_to_day(F.col("ts_us")).alias("event_day"), "user_id").agg(
        dec_avg(F.col("value"), 6).alias("day_avg"),
        dec_sum(F.col("value"), 6).alias("day_sum"),
        F.count(F.lit(1)).alias("day_cnt"),
    )
    return daily.groupBy("user_id").agg(
        dec_avg(F.col("day_avg"), 6).alias("avg_of_daily_avgs"),
        F.round(dec_sum(F.col("day_sum"), 6) / F.sum("day_cnt"), 6).alias("global_weighted_avg"),
    )


@register(
    "scatter_2d_qty_discount",
    operators="A11 (2-D scatter GROUP BY ROUND,ROUND; ref shipment.py:293-354)",
    oracle="""
SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qty_bin,
       CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct_bin,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY 1, 2
""",
)
def scatter_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.round(F.col("l_quantity")).cast("bigint").alias("qty_bin"),
            F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct_bin"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "histogram_zero_fill",
    operators="A10 (histogram buckets incl. empty, static spine; ref mating.py:240-430, accident.py:291-371)",
    oracle="""
WITH spine(bucket_no, bucket_nm) AS (
  VALUES (1,'q_01_10'),(2,'q_11_20'),(3,'q_21_30'),(4,'q_31_40'),(5,'q_41_50'),(6,'q_over_50')
),
h AS (
  SELECT CASE WHEN l_quantity <= 10 THEN 1 WHEN l_quantity <= 20 THEN 2
              WHEN l_quantity <= 30 THEN 3 WHEN l_quantity <= 40 THEN 4
              WHEN l_quantity <= 50 THEN 5 ELSE 6 END AS bucket_no,
         COUNT(*) AS cnt
  FROM lineitem WHERE l_returnflag = 'R'
  GROUP BY 1
)
SELECT spine.bucket_no, bucket_nm, COALESCE(cnt, 0) AS cnt
FROM spine LEFT JOIN h USING (bucket_no)
""",
)
def histogram_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    bucket = (
        F.when(F.col("l_quantity") <= 10, 1)
        .when(F.col("l_quantity") <= 20, 2)
        .when(F.col("l_quantity") <= 30, 3)
        .when(F.col("l_quantity") <= 40, 4)
        .when(F.col("l_quantity") <= 50, 5)
        .otherwise(6)
    )
    h = li.groupBy(bucket.alias("bucket_no")).agg(F.count(F.lit(1)).alias("cnt"))
    spine = spark.createDataFrame(
        [(1, "q_01_10"), (2, "q_11_20"), (3, "q_21_30"), (4, "q_31_40"), (5, "q_41_50"), (6, "q_over_50")],
        "bucket_no INT, bucket_nm STRING",
    )
    return spine.join(h, "bucket_no", "left").select(
        "bucket_no", "bucket_nm", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )


@register(
    "ytd_accumulation",
    operators="A14,F1 (year-to-date filtered aggregates; ref mating.py:98-117 etc.)",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS ytd_cnt,
       {sql_dec_sum('o_totalprice', 2)} AS ytd_value
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate <= TIMESTAMP '1998-06-30 23:59:59'
GROUP BY o_orderstatus
""",
)
def ytd_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") <= F.lit("1998-06-30 23:59:59").cast("timestamp_ntz"))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("ytd_cnt"),
            dec_sum(F.col("o_totalprice"), 2).alias("ytd_value"),
        )
    )


@register(
    "weekly_delta_wow",
    operators="A17,X3 (week-over-week delta + ISO week/year; ref modon.py:267-371, orchestrator.py:162-164)",
    oracle="""
WITH weekly AS (
  SELECT CAST(isoyear(o_orderdate) AS INT) AS iso_yr,
         CAST(weekofyear(o_orderdate) AS INT) AS iso_wk,
         COUNT(*) AS order_cnt
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-15'
  GROUP BY 1, 2
)
SELECT iso_yr, iso_wk, order_cnt,
       order_cnt - LAG(order_cnt) OVER (ORDER BY iso_yr, iso_wk) AS wow_delta
FROM weekly
""",
)
def weekly_delta_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-15").cast("timestamp_ntz"))
    )
    d = F.col("o_orderdate").cast("date")
    weekly = orders.groupBy(
        iso_year(d).alias("iso_yr"), iso_week(d).alias("iso_wk")
    ).agg(F.count(F.lit(1)).alias("order_cnt"))
    # Global (un-partitioned) window is safe ONLY because the input here is
    # already the weekly aggregate: <= #ISO-weeks rows (~55), never the fact
    # table. Do not copy this pattern onto row-scale inputs.
    w = Window.orderBy("iso_yr", "iso_wk")
    return weekly.withColumn("wow_delta", F.col("order_cnt") - F.lag("order_cnt").over(w))


@register(
    "distinct_nation_segment",
    operators="A19 (SELECT DISTINCT; ref weather.py:1239-1252)",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "sorted_pinned_tail_topk",
    operators="T3,T2 (multi-key sort with pinned tail value last; ref culling.py:258-262)",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS cnt
FROM orders
GROUP BY o_orderpriority
ORDER BY CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END,
         cnt DESC, o_orderpriority
""",
)
def sorted_pinned_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    return agg.orderBy(
        F.when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 1).otherwise(0),
        F.col("cnt").desc(),
        F.col("o_orderpriority"),
    )


@register(
    "union_all_branches",
    operators="U1,A3 (UNION ALL of typed branches + count/sum-by-code; ref alert.py:181-187)",
    oracle=f"""
WITH branches AS (
  SELECT 'big_order' AS alert_type, o_custkey AS entity_id, o_totalprice AS metric
  FROM orders WHERE o_totalprice > 400000
  UNION ALL
  SELECT 'urgent_open', o_custkey, o_totalprice
  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O'
  UNION ALL
  SELECT 'neg_balance', c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
)
SELECT alert_type, COUNT(*) AS alert_cnt, {sql_dec_sum('metric', 2)} AS metric_sum
FROM branches
GROUP BY alert_type
""",
)
def union_all_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    b1 = orders.filter(F.col("o_totalprice") > 400000).select(
        F.lit("big_order").alias("alert_type"),
        F.col("o_custkey").alias("entity_id"),
        F.col("o_totalprice").alias("metric"),
    )
    b2 = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    ).select(
        F.lit("urgent_open").alias("alert_type"),
        F.col("o_custkey").alias("entity_id"),
        F.col("o_totalprice").alias("metric"),
    )
    b3 = cust.filter(F.col("c_acctbal") < 0).select(
        F.lit("neg_balance").alias("alert_type"),
        F.col("c_custkey").alias("entity_id"),
        F.col("c_acctbal").alias("metric"),
    )
    return (
        b1.unionByName(b2)
        .unionByName(b3)
        .groupBy("alert_type")
        .agg(
            F.count(F.lit(1)).alias("alert_cnt"),
            dec_sum(F.col("metric"), 2).alias("metric_sum"),
        )
    )


@register(
    "listagg_parts_by_brand",
    operators="X10 (LISTAGG WITHIN GROUP; ref schedule.py:1081-1110)",
    oracle="""
SELECT p_brand,
       COUNT(*) AS part_cnt,
       -- COALESCE: an all-NULL group (possible after a data regen) is ''
       -- like Spark's concat_ws over the NULL-dropping collect_list, not
       -- string_agg's NULL
       COALESCE(string_agg(p_type, ',' ORDER BY p_type), '') AS type_list
FROM (SELECT DISTINCT p_brand, p_type FROM part)
GROUP BY p_brand
""",
)
def listagg_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select("p_brand", "p_type").distinct()
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("part_cnt"),
        F.concat_ws(",", F.sort_array(F.collect_list("p_type"))).alias("type_list"),
    )
