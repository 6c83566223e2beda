"""Headline analytical queries (bench set).

TPC-H-shaped queries over the synthetic star schema. These exercise the
scan→filter→join→agg spine the reference's weekly report is built from
(SURVEY.md §2.1 S1, §2.2 F1/F2, §2.3 J3, §2.4 A1/A5/A6) with the physical
plan we want at 100 TB: filters pushed to the parquet scan, dimensions
broadcast, aggregation partial map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.rounding import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum
from inspig_etl_spark.queries import register


@register(
    "tpch_q1_pricing_summary",
    operators="S1,F1,A1,A5 (scan+filter+grouped agg; ref src/weekly/processors/base.py:319-374)",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dec_sum('l_quantity', 2)} AS sum_qty,
       {sql_dec_sum('l_extendedprice', 2)} AS sum_base_price,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
       {sql_dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {sql_dec_avg('l_quantity', 2)} AS avg_qty,
       {sql_dec_avg('l_extendedprice', 2)} AS avg_price,
       {sql_dec_avg('l_discount', 4)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            dec_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dec_sum(disc_price, 6).alias("sum_disc_price"),
            dec_sum(charge, 6).alias("sum_charge"),
            dec_avg(F.col("l_quantity"), 2).alias("avg_qty"),
            dec_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
            dec_avg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    operators="J3,T2 (multi-join + top-N; ref src/weekly/processors/weaning.py:124-233, base.py:468-481)",
    oracle=f"""
SELECT l_orderkey,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    # customer scales with SF (tens of GB at the 100x target), so no forced
    # broadcast hint: AQE's threshold-guarded choice broadcasts it while it
    # fits and falls back to a bounded shuffle join on custkey when it doesn't.
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).join(
        li, li.l_orderkey == orders.o_orderkey
    )
    return (
        joined.groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    operators="J3,F2 (snowflake join through 2 dims; broadcast dims)",
    oracle=f"""
SELECT n_name,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        # customer and supplier both scale with SF — leave them unhinted so
        # AQE picks broadcast only while they fit the 64 MB threshold; nation
        # and region are bounded (25/5 rows) and always broadcast-safe.
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"), orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
    )


@register(
    "top_customers_by_spend",
    operators="T2,A1 (top-N with deterministic tiebreak; ref base.py:468-481)",
    oracle=f"""
SELECT c_custkey, c_name,
       {sql_dec_sum('o_totalprice', 2)} AS total_spend,
       COUNT(*) AS order_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 10
""",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    # Aggregate the fact table down to <=|customers| rows BEFORE the join so
    # the join input is already reduced; no broadcast hint on customer (it
    # scales with SF) — AQE decides.
    spend = orders.groupBy("o_custkey").agg(
        dec_sum(F.col("o_totalprice"), 2).alias("total_spend"),
        F.count(F.lit(1)).alias("order_cnt"),
    )
    return (
        spend.join(cust, spend.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "total_spend", "order_cnt")
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(10)
    )


@register(
    "tpch_q6_forecast_revenue",
    operators="S1,F1,A1 (pure pushdown showcase: 3-predicate scan + single agg; ref src/weekly/processors/base.py:319-374 period filters)",
    oracle=f"""
SELECT {sql_dec_sum('l_extendedprice * l_discount', 4)} AS revenue,
       COUNT(*) AS line_cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate is scan-pushable (shipdate range,
    discount band, quantity bound) so the physical plan is a parquet scan
    with PushedFilters + a single partial-then-final agg — zero shuffles of
    row data, one exchange of a single partial-agg row. The plan to want at
    100 TB: row-group statistics skip most of the table before decode."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("line_cnt"),
    )


@register(
    "tpch_q14_promo_revenue",
    operators="J3,A5 (fact-dim join + conditional agg ratio; ref base.py:374-420 share-of-total sections)",
    oracle=f"""
SELECT {sql_dec_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
         AS promo_revenue,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)} AS total_revenue,
       CAST(FLOOR(
         {sql_dec_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
         * 1000000
         / NULLIF({sql_dec_sum('l_extendedprice * (1 - l_discount)', 6)}, 0)
       ) AS BIGINT) AS promo_share_e6
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: one-month lineitem slice joined to ``part`` for the
    promo flag, then a conditional-aggregate share-of-total. The share is
    reported in exact integer parts-per-million (FLOOR of an IEEE division
    of two order-independent decimal sums) so both engines emit the same
    bits — same convention as the llm_text quality scores. ``part`` scales
    with SF, so no forced broadcast: AQE broadcasts while it fits and falls
    back to a shuffle join on partkey; the month filter is pushed to the
    lineitem scan so the join input is already pruned."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0))
    agg = li.join(part, li.l_partkey == part.p_partkey).agg(
        dec_sum(promo, 6).alias("promo_revenue"),
        dec_sum(disc_price, 6).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        # nullif zero-guard: on a regenerated corpus where the month slice
        # is non-empty but disc_price sums to 0, Spark-ANSI would throw
        # DIVIDE_BY_ZERO while DuckDB yields NULL — same guard as the other
        # ratio queries.
        F.floor(
            F.col("promo_revenue")
            * 1000000
            / F.nullif(F.col("total_revenue"), F.lit(0))
        )
        .cast("bigint")
        .alias("promo_share_e6"),
    )
