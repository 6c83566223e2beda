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
    status_from_last_event,
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

# GB histogram buckets: floor(value/100) clamped into [0, 4] (A10 zero-fill
# spine; the reference's mating histogram is parity-bucketed the same way,
# mating.py buckets).
GB_BUCKETS = tuple(f"V{i}" for i in range(5))
# EU next-event spine: every event type the stream can produce.
EU_NEXT_TYPES = ("click", "error", "purchase", "signup", "view")
# SG elapsed-day bands after the as-of join (accident.py elapsed buckets).
SG_BANDS = ("D0_1", "D2_3", "D4_7", "D8P", "NONE")
# ALERT delay bands over days-since-last-work (J9 band dim; alert.py rules).
ALERT_BANDS = (
    (1, "OK", 0, 7),
    (2, "WATCH", 8, 14),
    (3, "DELAY", 15, 30),
    (4, "CRITICAL", 31, 100000),
)
DOPE_PER_ROW = 3  # culling page width (reference uses 15; 3 exercises paging)
CONFIG_WEEKS = 3  # trailing full weeks feeding the config ratio mean


def _shift(day: str, days: int) -> str:
    """YYYY-MM-DD ± days (driver-side window arithmetic)."""
    from datetime import date, timedelta

    return (date.fromisoformat(day) + timedelta(days=days)).isoformat()


def wide_row_columns() -> list[str]:
    cols = ["master_seq", "farm_no", "gubun", "sub_gubun", "sort_no", "code_1", "code_2"]
    cols += [f"cnt_{i}" for i in range(1, N_WIDE + 1)]
    cols += [f"val_{i}" for i in range(1, N_WIDE + 1)]
    cols += [f"str_{i}" for i in range(1, N_WIDE + 1)]
    return cols


def to_wide_rows(
    section: DataFrame,
    master_seq: int,
    gubun: str,
    sub_gubun: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Pad a section's used columns out to the wide-row schema.

    ``section`` must carry farm_no + sort_no and any of code_1/2, cnt_i,
    val_i, str_i it fills; everything absent becomes a typed NULL.

    ``columns`` (optional) restricts the output to a subset of
    :func:`wide_row_columns` IN THAT CANONICAL ORDER — callers that only
    consume part of the width (the sections query reads 17 of the 52
    columns) should pass it: 10 union branches x 35 dead NULL projections
    is pure Catalyst-analysis weight on every plan build (r16; the values
    of the kept columns are identical either way).
    """
    have = set(section.columns)
    keep = set(columns) if columns is not None else None
    out = []

    def _add(name: str, expr: F.Column) -> None:
        if keep is None or name in keep:
            out.append(expr)

    _add("master_seq", F.lit(master_seq).cast("bigint").alias("master_seq"))
    _add("farm_no", F.col("farm_no").cast("bigint"))
    _add("gubun", F.lit(gubun).alias("gubun"))
    _add("sub_gubun", F.lit(sub_gubun).alias("sub_gubun"))
    _add("sort_no", F.col("sort_no").cast("int"))
    for c in ["code_1", "code_2"]:
        _add(
            c,
            F.col(c).cast("string").alias(c) if c in have else F.lit(None).cast("string").alias(c),
        )
    for i in range(1, N_WIDE + 1):
        c = f"cnt_{i}"
        _add(
            c,
            F.col(c).cast("bigint").alias(c) if c in have else F.lit(None).cast("bigint").alias(c),
        )
    for i in range(1, N_WIDE + 1):
        c = f"val_{i}"
        _add(
            c,
            F.col(c).cast("double").alias(c) if c in have else F.lit(None).cast("double").alias(c),
        )
    for i in range(1, N_WIDE + 1):
        c = f"str_{i}"
        _add(
            c,
            F.col(c).cast("string").alias(c) if c in have else F.lit(None).cast("string").alias(c),
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


def _farm_spine(events: DataFrame) -> DataFrame:
    """Every farm present in the stream — the zero-fill left side shared by
    all per-farm sections (one distinct over a 10-value derived key)."""
    return events.select(_farm(F.col("user_id")).alias("farm_no")).distinct()


def _zero_filled_counts(
    counted: DataFrame, farms: DataFrame, spine_rows: list[tuple[int, str]]
) -> DataFrame:
    """farms × literal code spine, left-joined to (farm_no, code_1, cnt_1)
    counts with COALESCE 0 — the A10/A15 zero-fill shape every STAT section
    shares. ``spine_rows`` = [(sort_no, code_1), ...]."""
    spine = farms.sparkSession.createDataFrame(
        spine_rows, "sort_no INT, code_1 STRING"
    )
    full = farms.crossJoin(F.broadcast(spine))
    return full.join(counted, ["farm_no", "code_1"], "left").select(
        "farm_no",
        "sort_no",
        "code_1",
        F.coalesce(F.col("cnt_1"), F.lit(0)).alias("cnt_1"),
    )


def _week(events: DataFrame, dt_from: str, dt_to: str) -> DataFrame:
    d = us_to_day(F.col("ts_us"))
    return events.filter(
        (d >= F.lit(dt_from).cast("date")) & (d <= F.lit(dt_to).cast("date"))
    )


def mating_histogram_section(
    events: DataFrame,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
    farms: DataFrame | None = None,
) -> DataFrame:
    """gubun='GB': last week's mating (purchase, wk 'G') value histogram —
    floor(value/100) clamped to [0,4], zero-filled per farm (A10; reference
    ``mating.py`` parity histogram)."""
    g = _week(events, dt_from, dt_to).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    bucket = F.concat(
        F.lit("V"),
        F.greatest(
            F.least(F.floor(F.col("value") / 100), F.lit(4)), F.lit(0)
        ).cast("int").cast("string"),
    )
    counts = (
        g.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", bucket.alias("code_1"))
        .agg(F.count(F.lit(1)).alias("cnt_1"))
    )
    spine = [(i + 1, b) for i, b in enumerate(GB_BUCKETS)]
    if farms is None:
        farms = _farm_spine(events)
    return _zero_filled_counts(counts, farms, spine)


def farrowing_wow_section(
    events: DataFrame,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
    farms: DataFrame | None = None,
) -> DataFrame:
    """gubun='BM': farrowing (view, wk 'B') week-over-week — last week's
    count, the prior week's, and the delta, one row per farm (A17)."""
    prior_from, prior_to = _shift(dt_from, -7), _shift(dt_from, -1)
    b = events.filter(F.col("event_type") == "view")
    d = us_to_day(F.col("ts_us"))
    counts = (
        b.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no")
        .agg(
            F.count(
                F.when(
                    (d >= F.lit(dt_from).cast("date"))
                    & (d <= F.lit(dt_to).cast("date")),
                    1,
                )
            ).alias("cnt_1"),
            F.count(
                F.when(
                    (d >= F.lit(prior_from).cast("date"))
                    & (d <= F.lit(prior_to).cast("date")),
                    1,
                )
            ).alias("cnt_2"),
        )
    )
    if farms is None:
        farms = _farm_spine(events)
    return (
        farms
        .join(counts, "farm_no", "left")
        .select(
            "farm_no",
            F.lit(1).alias("sort_no"),
            F.coalesce(F.col("cnt_1"), F.lit(0)).alias("cnt_1"),
            F.coalesce(F.col("cnt_2"), F.lit(0)).alias("cnt_2"),
            (F.coalesce(F.col("cnt_1"), F.lit(0)) - F.coalesce(F.col("cnt_2"), F.lit(0))).alias("cnt_3"),
        )
    )


def weaning_next_event_section(
    events: DataFrame,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
    farms: DataFrame | None = None,
) -> DataFrame:
    """gubun='EU': what follows a weaning — per user, the event right after
    their FIRST wean (signup, wk 'E') inside the week; counted per farm by
    next-event type, zero-filled over the type spine (W5/A9; reference
    ``weaning.py`` next-work rollup)."""
    from pyspark.sql import Window

    wk = _week(events, dt_from, dt_to)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # Both windows share the user_id shuffle; the (user, type) partition is
    # a sub-partition of it, so no second exchange is planned.
    seq = wk.withColumn("next_type", F.lead("event_type").over(w)).withColumn(
        "srn",
        F.row_number().over(
            Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
        ),
    )
    first_wean_next = seq.filter(
        (F.col("event_type") == "signup")
        & (F.col("srn") == 1)
        & F.col("next_type").isNotNull()
    )
    counts = (
        first_wean_next.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", F.col("next_type").alias("code_1"))
        .agg(F.count(F.lit(1)).alias("cnt_1"))
    )
    spine = [(i + 1, t) for i, t in enumerate(EU_NEXT_TYPES)]
    if farms is None:
        farms = _farm_spine(events)
    return _zero_filled_counts(counts, farms, spine)


def accident_elapsed_section(
    events: DataFrame,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
    farms: DataFrame | None = None,
) -> DataFrame:
    """gubun='SG': accidents (error, wk 'F') in the week, bucketed by days
    elapsed since the sow's last mating (purchase) — as-of join (J4, single
    scan) then banded counts with zero-fill (A10; reference ``accident.py``
    elapsed/gyungil buckets)."""
    from inspig_etl_spark.operators.events import asof_value_single_scan

    ev = events.filter(F.col("event_type").isin("error", "purchase"))
    joined = asof_value_single_scan(
        ev,
        keys=["user_id"],
        ts="ts_us",
        is_left=F.col("event_type") == "error",
        right_val=us_to_day(F.col("ts_us")),
        tiebreak=["event_id"],
        strict=True,
        out="last_mate_day",
    )
    d = us_to_day(F.col("ts_us"))
    errs = joined.filter(
        (d >= F.lit(dt_from).cast("date")) & (d <= F.lit(dt_to).cast("date"))
    )
    gap = F.date_diff(d, F.col("last_mate_day"))
    band = (
        F.when(F.col("last_mate_day").isNull(), "NONE")
        .when(gap <= 1, "D0_1")
        .when(gap <= 3, "D2_3")
        .when(gap <= 7, "D4_7")
        .otherwise("D8P")
    )
    counts = (
        errs.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", band.alias("code_1"))
        .agg(F.count(F.lit(1)).alias("cnt_1"))
    )
    spine = [(i + 1, b) for i, b in enumerate(SG_BANDS)]
    if farms is None:
        farms = _farm_spine(events)
    return _zero_filled_counts(counts, farms, spine)


def culling_pages_section(
    events: DataFrame, dt_from: str = WEEK_FROM, dt_to: str = WEEK_TO
) -> DataFrame:
    """gubun='DOPE': last week's culls (click, wk 'Z') per user, ordered by
    count desc with the farm total PINNED last (T3), paginated into
    ``DOPE_PER_ROW``-wide rows per farm (T4; reference ``culling.py:264-312``
    15-per-row pages)."""
    from pyspark.sql import Window

    culls = _week(events, dt_from, dt_to).filter(F.col("event_type") == "click")
    per_user = (
        culls.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    items = per_user.select(
        "farm_no",
        F.lit(0).alias("is_total"),
        F.col("user_id").cast("bigint").alias("uid"),
        F.col("user_id").cast("string").alias("label"),
        "cnt",
    )
    totals = per_user.groupBy("farm_no").agg(F.sum("cnt").alias("cnt")).select(
        "farm_no",
        F.lit(1).alias("is_total"),
        F.lit(-1).cast("bigint").alias("uid"),
        F.lit("ALL").alias("label"),
        "cnt",
    )
    # Pinned-tail total order: items by cnt desc then uid, the 'ALL' row
    # always last. Window is PARTITIONED by farm (lints clean) and its input
    # is the per-user aggregate — bounded like every report section.
    w = Window.partitionBy("farm_no").orderBy(
        "is_total", F.col("cnt").desc(), "uid"
    )
    numbered = items.unionByName(totals).withColumn(
        "rn", F.row_number().over(w)
    )
    keyed = numbered.select(
        "farm_no",
        (F.floor((F.col("rn") - 1) / DOPE_PER_ROW) + 1).cast("int").alias("sort_no"),
        (((F.col("rn") - 1) % DOPE_PER_ROW) + 1).cast("int").alias("pos"),
        "label",
        "cnt",
    )
    aggs = []
    for i in range(1, DOPE_PER_ROW + 1):
        aggs.append(F.max(F.when(F.col("pos") == i, F.col("label"))).alias(f"str_{i}"))
        aggs.append(F.max(F.when(F.col("pos") == i, F.col("cnt"))).alias(f"cnt_{i}"))
    return keyed.groupBy("farm_no", "sort_no").agg(*aggs)


def alert_band_section(
    last_events: DataFrame, base_date: str, farms: DataFrame | None = None
) -> DataFrame:
    """gubun='ALERT': days since each sow's last work event, banded by the
    ALERT_BANDS dim (J9 band join against a broadcast literal), counted per
    farm with zero-fill (reference ``alert.py`` delayed-sow rules)."""
    spark = last_events.sparkSession
    bands = spark.createDataFrame(
        list(ALERT_BANDS), "sort_no INT, code_1 STRING, lo INT, hi INT"
    )
    d = F.date_diff(F.lit(base_date).cast("date"), F.col("event_day"))
    banded = last_events.withColumn("delay_d", d).join(
        F.broadcast(bands),
        (F.col("delay_d") >= F.col("lo")) & (F.col("delay_d") <= F.col("hi")),
    )
    counts = (
        banded.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", "code_1")
        .agg(F.count(F.lit(1)).alias("cnt_1"))
    )
    if farms is None:
        farms = last_events.select(
            _farm(F.col("user_id")).alias("farm_no")
        ).distinct()
    spine = [(s, c) for s, c, _lo, _hi in ALERT_BANDS]
    return _zero_filled_counts(counts, farms, spine)


def schedule_crosstab_section(
    last_events: DataFrame, this_from: str, this_to: str
) -> DataFrame:
    """gubun='SCHEDULE': plan-rule expansion over the COMING week (UD2) then
    a per-farm day crosstab — task rows with d1..d7 counts + total (J12;
    reference ``schedule.py`` calendar)."""
    from inspig_etl_spark.operators.schedule import expand_schedule, rules_df

    expanded = expand_schedule(
        last_events,
        rules_df(last_events.sparkSession),
        "event_day",
        this_from,
        this_to,
    )
    day_no = F.date_diff(F.col("pass_dt"), F.lit(this_from).cast("date")) + 1
    aggs = [
        F.count(F.when(day_no == i, 1)).alias(f"cnt_{i}") for i in range(1, 8)
    ]
    return (
        expanded.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy(
            "farm_no",
            F.col("task_seq").alias("sort_no"),
            F.col("wk_nm").alias("code_1"),
            F.col("std_cd").alias("str_1"),
        )
        .agg(*aggs, F.count(F.lit(1)).alias("cnt_8"))
    )


def config_ratio_section(
    events: DataFrame, dt_to: str = WEEK_TO, farms: DataFrame | None = None
) -> DataFrame:
    """gubun='CONFIG': per farm, mating share of work per trailing week —
    ratio_e4 per week, then the integer mean of the weekly ratios (A18
    two-stage ratio→mean; reference ``config.py`` per-farm parameter
    derivation). Integer math end to end: ratios and their mean are exact
    BIGINTs on both engines (non-negative, so // truncation == floor)."""
    start = _shift(dt_to, -(7 * CONFIG_WEEKS - 1))
    d = us_to_day(F.col("ts_us"))
    wk_no = F.floor(F.date_diff(d, F.lit(start).cast("date")) / 7)
    weekly = (
        events.filter(
            (d >= F.lit(start).cast("date")) & (d <= F.lit(dt_to).cast("date"))
        )
        .withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no", wk_no.alias("wk_no"))
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("gb"),
            F.count(F.lit(1)).alias("all_cnt"),
        )
        .select(
            "farm_no",
            "wk_no",
            F.expr("gb * 10000 DIV all_cnt").alias("ratio_e4"),
        )
    )
    per_farm = weekly.groupBy("farm_no").agg(
        F.count(F.lit(1)).alias("cnt_1"),
        F.expr("sum(ratio_e4) DIV count(1)").alias("cnt_2"),
    )
    if farms is None:
        farms = _farm_spine(events)
    return (
        farms
        .join(per_farm, "farm_no", "left")
        .select(
            "farm_no",
            F.lit(1).alias("sort_no"),
            F.coalesce(F.col("cnt_1"), F.lit(0)).alias("cnt_1"),
            F.col("cnt_2"),
        )
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


def farm_summary_full(
    last_events: DataFrame,
    events: DataFrame,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
) -> DataFrame:
    """The grown TS_INS_WEEK row: herd/shipment base (:func:`farm_summary`)
    plus the per-section weekly counters the reference UPDATEs in place —
    LAST_GB/BM/EU/SG/CL counts, WoW farrowing delta, accident match rate,
    alert total, the coming week's scheduled-task sums by family, and the
    input-delay KPI (``docs/db/ins/02_TABLE.md:301-459``; processors fill
    their columns in ``async_processor.py:150-192``). Assembled by LEFT
    joins on farm_no from the SAME aggregates the wide sections use — each
    input is a ≤|farms|-row frame, so the join fan is broadcast-cheap."""
    status = last_events.select(
        "user_id",
        status_from_last_event(
            F.col("wk_gubun"), F.col("sago_gubun_cd"), F.col("daeri_yn"), F.lit(None)
        ).alias("status_cd"),
    )
    base = farm_summary(status, events, dt_from, dt_to)

    d = us_to_day(F.col("ts_us"))
    wk_counts = (
        _week(events, dt_from, dt_to)
        .withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("last_gb_cnt"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("last_bm_cnt"),
            F.count(F.when(F.col("event_type") == "signup", 1)).alias("last_eu_cnt"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("last_sg_cnt"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("last_cl_cnt"),
        )
    )
    prior_from, prior_to = _shift(dt_from, -7), _shift(dt_from, -1)
    prior_bm = (
        events.filter(
            (F.col("event_type") == "view")
            & (d >= F.lit(prior_from).cast("date"))
            & (d <= F.lit(prior_to).cast("date"))
        )
        .withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no")
        .agg(F.count(F.lit(1)).alias("prior_bm_cnt"))
    )
    sg_matched = (
        accident_elapsed_section(events, dt_from, dt_to)
        .filter(F.col("code_1") != "NONE")
        .groupBy("farm_no")
        .agg(F.sum("cnt_1").alias("last_sg_matched_cnt"))
    )
    alerts = (
        alert_band_section(last_events, _shift(dt_to, 1))
        .filter(F.col("sort_no") >= 3)  # DELAY + CRITICAL
        .groupBy("farm_no")
        .agg(F.sum("cnt_1").alias("alert_total"))
    )
    sched = schedule_crosstab_section(last_events, _shift(dt_to, 1), _shift(dt_to, 7))
    sched_rules = {"preg_check_1": "g", "preg_check_2": "g", "pre_farrow_move": "g",
                   "piglet_care": "b", "wean_plan": "b",
                   "remate_check": "ef", "recheck": "ef"}
    fam = F.create_map(*[F.lit(x) for kv in sched_rules.items() for x in kv])
    this_week = (
        sched.withColumn("fam", fam[F.col("code_1")])
        .groupBy("farm_no")
        .agg(
            F.sum(F.when(F.col("fam") == "g", F.col("cnt_8"))).alias("this_gb_sum"),
            F.sum(F.when(F.col("fam") == "b", F.col("cnt_8"))).alias("this_bm_sum"),
            F.sum(F.when(F.col("fam") == "ef", F.col("cnt_8"))).alias("this_eu_sum"),
            F.sum("cnt_8").alias("this_total_sum"),
        )
    )
    delay = (
        last_events.withColumn("farm_no", _farm(F.col("user_id")))
        .groupBy("farm_no")
        .agg(
            F.date_diff(
                F.lit(_shift(dt_to, 1)).cast("date"), F.max("event_day")
            ).alias("kpi_delay_day")
        )
    )

    out = base
    for piece in (wk_counts, prior_bm, sg_matched, alerts, this_week, delay):
        out = out.join(piece, "farm_no", "left")
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)  # noqa: E731
    return out.select(
        "farm_no",
        "total_users",
        "pregnant_cnt",
        "nursing_cnt",
        "week_purchase_cnt",
        "week_purchase_value",
        zero("last_gb_cnt"),
        zero("last_bm_cnt"),
        zero("last_eu_cnt"),
        zero("last_sg_cnt"),
        zero("last_cl_cnt"),
        zero("prior_bm_cnt"),
        (
            F.coalesce(F.col("last_bm_cnt"), F.lit(0))
            - F.coalesce(F.col("prior_bm_cnt"), F.lit(0))
        ).alias("bm_wow_delta"),
        zero("last_sg_matched_cnt"),
        zero("alert_total"),
        zero("this_gb_sum"),
        zero("this_bm_sum"),
        zero("this_eu_sum"),
        zero("this_total_sum"),
        F.col("kpi_delay_day"),
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
    state and are period-independent, as in the reference.

    Callers that consume only ONE side should call
    :func:`build_weekly_wide` / :func:`build_weekly_summary` directly
    (r16): building the 10-section union AND the 7-join summary costs
    seconds of plan construction/analysis per call, and the oracled
    registry queries each read a single side.
    """
    return (
        build_weekly_wide(spark, sf_dir, master_seq, dt_from, dt_to),
        build_weekly_summary(spark, sf_dir, dt_from, dt_to),
    )


def build_weekly_wide(
    spark: SparkSession,
    sf_dir: str,
    master_seq: int = 1,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
    columns: list[str] | None = None,
) -> DataFrame:
    """The TS_INS_WEEK_SUB wide-row union alone (see
    :func:`build_weekly_report`); ``columns`` optionally narrows the padded
    width (see :func:`to_wide_rows`)."""
    from inspig_etl_spark.catalog import table
    from inspig_etl_spark.queries.status_schedule import _last_events

    events = table(spark, sf_dir, "events")
    # The ten sections share the farm spine frame. Measured A/B at sf0.1
    # (interleaved, same session): persist()ing the shared spine/last frames
    # is a net LOSS (~+15%) — the cache materializes every column of the
    # wide latest-event row and union branches race to populate it, while
    # the uncached branches recompute in parallel on idle cores for free.
    # So the frames are shared for plan clarity, not cached.
    farms = _farm_spine(events)
    last = _last_events(spark, sf_dir)
    status = last.select(
        "user_id",
        status_from_last_event(
            F.col("wk_gubun"), F.col("sago_gubun_cd"), F.col("daeri_yn"), F.lit(None)
        ).alias("status_cd"),
    )
    this_from, this_to = _shift(dt_to, 1), _shift(dt_to, 7)
    sections = [
        to_wide_rows(herd_status_section(status), master_seq, "MD", "STAT", columns),
        to_wide_rows(
            alert_band_section(last, this_from, farms=farms),
            master_seq,
            "ALERT",
            "STAT",
            columns,
        ),
        to_wide_rows(
            mating_histogram_section(events, dt_from, dt_to, farms=farms),
            master_seq,
            "GB",
            "STAT",
            columns,
        ),
        to_wide_rows(
            farrowing_wow_section(events, dt_from, dt_to, farms=farms),
            master_seq,
            "BM",
            "STAT",
            columns,
        ),
        to_wide_rows(
            weaning_next_event_section(events, dt_from, dt_to, farms=farms),
            master_seq,
            "EU",
            "STAT",
            columns,
        ),
        to_wide_rows(
            accident_elapsed_section(events, dt_from, dt_to, farms=farms),
            master_seq,
            "SG",
            "STAT",
            columns,
        ),
        to_wide_rows(
            culling_pages_section(events, dt_from, dt_to),
            master_seq,
            "DOPE",
            "LIST",
            columns,
        ),
        to_wide_rows(
            shipment_chart_section(events, dt_from, dt_to),
            master_seq,
            "SH",
            "CHART",
            columns,
        ),
        to_wide_rows(
            schedule_crosstab_section(last, this_from, this_to),
            master_seq,
            "SCHEDULE",
            "ROW",
            columns,
        ),
        to_wide_rows(
            config_ratio_section(events, dt_to, farms=farms),
            master_seq,
            "CONFIG",
            "STAT",
            columns,
        ),
    ]
    wide = sections[0]
    for s in sections[1:]:
        wide = wide.unionByName(s)
    return wide


def build_weekly_summary(
    spark: SparkSession,
    sf_dir: str,
    dt_from: str = WEEK_FROM,
    dt_to: str = WEEK_TO,
) -> DataFrame:
    """The grown TS_INS_WEEK summary row alone (see
    :func:`build_weekly_report`)."""
    from inspig_etl_spark.catalog import table
    from inspig_etl_spark.queries.status_schedule import _last_events

    events = table(spark, sf_dir, "events")
    last = _last_events(spark, sf_dir)
    return farm_summary_full(last, events, dt_from, dt_to)
