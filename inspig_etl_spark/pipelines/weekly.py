"""Weekly report pipeline — the reference's analytical core, composed.

The reference processes farms ONE AT A TIME in a 4-thread pool, each farm
running 10 sequential processors that INSERT wide rows
(``TS_INS_WEEK_SUB``: GUBUN/SUB_GUBUN/SORT_NO + CODE_1..2 / CNT_1..15 /
VAL_1..15 / STR_1..15) and UPDATE a per-farm summary row (``TS_INS_WEEK``)
(``/root/reference/src/weekly/async_processor.py:103-224``,
``docs/db/ins/02_TABLE.md:301-459``).

Here every section is computed for ALL farms in one DataFrame plan —
``groupBy(farm_no)`` replaces the thread pool, so 4-way driver parallelism
becomes cluster-wide task parallelism, and the idempotent re-run is a
partition overwrite of the (master_seq, farm_no) slice instead of
DELETE+INSERT.

Synthetic mapping: the events stream is the work history; ``farm_no =
user_id % 10`` partitions users into farms; the UD1 status table and the
purchase stream drive a herd section (gubun='MD') and a shipment-chart
section (gubun='SH').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.functions.dates import date_spine, to_yyyymmdd, us_to_day
from inspig_etl_spark.functions.rounding import dec_sum
from inspig_etl_spark.operators.status import (
    STATUS_ABORTED,
    STATUS_CANDIDATE,
    STATUS_NURSING,
    STATUS_NURSING_SURROGATE,
    STATUS_PREGNANT,
    STATUS_RECURRED,
    STATUS_WEANED,
)

# The full reference output width. Sections fill what they use; the rest
# pads with typed NULLs so every section unions into one sink schema.
N_WIDE = 15
STATUS_SPINE = (
    STATUS_CANDIDATE,
    STATUS_PREGNANT,
    STATUS_NURSING,
    STATUS_NURSING_SURROGATE,
    STATUS_WEANED,
    STATUS_RECURRED,
    STATUS_ABORTED,
)

WEEK_FROM = "2024-01-18"
WEEK_TO = "2024-01-24"


def wide_row_columns() -> list[str]:
    cols = ["master_seq", "farm_no", "gubun", "sub_gubun", "sort_no", "code_1", "code_2"]
    cols += [f"cnt_{i}" for i in range(1, N_WIDE + 1)]
    cols += [f"val_{i}" for i in range(1, N_WIDE + 1)]
    cols += [f"str_{i}" for i in range(1, N_WIDE + 1)]
    return cols


def to_wide_rows(section: DataFrame, master_seq: int, gubun: str, sub_gubun: str) -> DataFrame:
    """Pad a section's used columns out to the full wide-row schema.

    ``section`` must carry farm_no + sort_no and any of code_1/2, cnt_i,
    val_i, str_i it fills; everything absent becomes a typed NULL.
    """
    have = set(section.columns)
    out = [
        F.lit(master_seq).cast("bigint").alias("master_seq"),
        F.col("farm_no").cast("bigint"),
        F.lit(gubun).alias("gubun"),
        F.lit(sub_gubun).alias("sub_gubun"),
        F.col("sort_no").cast("int"),
    ]
    for c in ["code_1", "code_2"]:
        out.append(
            F.col(c).cast("string").alias(c) if c in have else F.lit(None).cast("string").alias(c)
        )
    for i in range(1, N_WIDE + 1):
        c = f"cnt_{i}"
        out.append(
            F.col(c).cast("bigint").alias(c) if c in have else F.lit(None).cast("bigint").alias(c)
        )
    for i in range(1, N_WIDE + 1):
        c = f"val_{i}"
        out.append(
            F.col(c).cast("double").alias(c) if c in have else F.lit(None).cast("double").alias(c)
        )
    for i in range(1, N_WIDE + 1):
        c = f"str_{i}"
        out.append(
            F.col(c).cast("string").alias(c) if c in have else F.lit(None).cast("string").alias(c)
        )
    return section.select(*out)


def _farm(col: F.Column) -> F.Column:
    return (col % 10).cast("bigint")


def herd_status_section(last_events_status: DataFrame) -> DataFrame:
    """gubun='MD': per farm, zero-filled status crosstab rows (A15 shape).

    Input: (user_id, status_cd) — the UD1 output. One row per (farm,
    status) with a fixed sort order, zeros kept (``modon.py:222-243``).
    """
    counts = (
        last_events_status.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", "status_cd")
        .agg(F.count(F.lit(1)).alias("cnt_1"))
    )
    farms = last_events_status.select(
        _farm(F.col("user_id")).alias("farm_no")
    ).distinct()
    spine_rows = [(i + 1, s) for i, s in enumerate(STATUS_SPINE)]
    spine = farms.sparkSession.createDataFrame(spine_rows, "sort_no INT, status_cd STRING")
    full = farms.crossJoin(F.broadcast(spine))
    return (
        full.join(counts, ["farm_no", "status_cd"], "left")
        .select(
            "farm_no",
            "sort_no",
            F.col("status_cd").alias("code_1"),
            F.coalesce(F.col("cnt_1"), F.lit(0)).alias("cnt_1"),
        )
    )


def shipment_chart_section(
    events: DataFrame, dt_from: str = WEEK_FROM, dt_to: str = WEEK_TO
) -> DataFrame:
    """gubun='SH': per farm, per-day calendar chart rows over the report
    period (J10 shape; defaults to the module's fixed test week).

    Missing days KEPT as NULL rows — the reference's charts distinguish
    no-data days from zero days (``shipment.py:241-291``).
    """
    spark = events.sparkSession
    purchases = events.filter(
        (F.col("event_type") == "purchase")
        & (us_to_day(F.col("ts_us")) >= F.lit(dt_from).cast("date"))
        & (us_to_day(F.col("ts_us")) <= F.lit(dt_to).cast("date"))
    )
    daily = (
        purchases.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", us_to_day(F.col("ts_us")).alias("d"))
        .agg(
            F.count(F.lit(1)).alias("cnt_1"),
            F.round(dec_sum(F.col("value"), 6), 6).alias("val_1"),
        )
    )
    farms = events.select(_farm(F.col("user_id")).alias("farm_no")).distinct()
    days = date_spine(spark, dt_from, dt_to, "d").withColumn(
        "sort_no", F.date_diff(F.col("d"), F.lit(dt_from).cast("date")) + 1
    )
    full = farms.crossJoin(F.broadcast(days))
    return full.join(daily, ["farm_no", "d"], "left").select(
        "farm_no",
        "sort_no",
        to_yyyymmdd(F.col("d")).alias("str_1"),
        "cnt_1",
        "val_1",
    )


def farm_summary(
    last_events_status: DataFrame,
    events: DataFrame,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
) -> DataFrame:
    """The TS_INS_WEEK-like one-row-per-farm summary: herd totals + week
    shipment totals, assembled by joins instead of in-place UPDATEs."""
    herd = (
        last_events_status.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no")
        .agg(
            F.count(F.lit(1)).alias("total_users"),
            F.count(F.when(F.col("status_cd") == STATUS_PREGNANT, 1)).alias("pregnant_cnt"),
            F.count(
                F.when(
                    F.col("status_cd").isin(STATUS_NURSING, STATUS_NURSING_SURROGATE), 1
                )
            ).alias("nursing_cnt"),
        )
    )
    week = (
        events.filter(
            (F.col("event_type") == "purchase")
            & (us_to_day(F.col("ts_us")) >= F.lit(dt_from).cast("date"))
            & (us_to_day(F.col("ts_us")) <= F.lit(dt_to).cast("date"))
        )
        .withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no")
        .agg(
            F.count(F.lit(1)).alias("week_purchase_cnt"),
            F.round(dec_sum(F.col("value"), 6), 6).alias("week_purchase_value"),
        )
    )
    return herd.join(week, "farm_no", "left").select(
        "farm_no",
        "total_users",
        "pregnant_cnt",
        "nursing_cnt",
        F.coalesce(F.col("week_purchase_cnt"), F.lit(0)).alias("week_purchase_cnt"),
        # NVL(SUM(...), 0) like the reference (shipment.py:397): a farm with
        # no purchases reports value 0.0, not NULL — cnt and value must
        # agree about the same fact in one summary row.
        F.coalesce(F.col("week_purchase_value"), F.lit(0.0)).alias("week_purchase_value"),
    )


def build_weekly_report(
    spark: SparkSession,
    sf_dir: str,
    master_seq: int = 1,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
) -> tuple[DataFrame, DataFrame]:
    """(wide_rows, summary) for every farm in one pair of plans.

    ``dt_from``/``dt_to`` (YYYY-MM-DD) scope the period-dependent sections
    (shipment chart, week purchase totals) — callers that resolve a real
    period (the CLI runner, the on-demand endpoint) MUST pass it, or every
    master_seq would silently report the same fixed test week; the module
    defaults exist for the oracled registry queries, whose DuckDB oracles
    encode the same constants. Herd-status sections aggregate the latest
    state and are period-independent, as in the reference."""
    from inspig_etl_spark.catalog import table
    from inspig_etl_spark.queries.status_schedule import _last_events

    events = table(spark, sf_dir, "events")
    status = _last_events(spark, sf_dir).select(
        "user_id",
        F.col("wk_gubun"),
        F.col("sago_gubun_cd"),
        F.col("daeri_yn"),
    )
    from inspig_etl_spark.operators.status import status_from_last_event

    status = status.select(
        "user_id",
        status_from_last_event(
            F.col("wk_gubun"), F.col("sago_gubun_cd"), F.col("daeri_yn"), F.lit(None)
        ).alias("status_cd"),
    )
    md = to_wide_rows(herd_status_section(status), master_seq, "MD", "STAT")
    sh = to_wide_rows(
        shipment_chart_section(events, dt_from, dt_to), master_seq, "SH", "CHART"
    )
    return md.unionByName(sh), farm_summary(status, events, dt_from, dt_to)
