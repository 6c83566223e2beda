"""Date/period helpers (SURVEY.md §2.8 X1-X6, §4 item 2).

The reference leans on Python ``%G/%V`` for ISO week/year
(``src/weekly/orchestrator.py:162-164``) and pure-Python week-boundary math
(``:148-160``). Here the same semantics are Spark expressions so they run
distributed; the week-boundary helper stays driver-side (it computes two
scalars per run, exactly like the reference).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def iso_week(col: Column) -> Column:
    """ISO-8601 week number. Spark's weekofyear is already ISO."""
    return F.weekofyear(col)


def iso_year(col: Column) -> Column:
    """ISO-8601 week-numbering year (the %G the reference uses).

    The ISO year of a date is the calendar year of the Thursday of its week:
    shift to Thursday with ``date_add(d, 4 - iso_dow)`` then take the year.
    Tested around year boundaries (2024-12-30 → 2025).
    """
    return F.year(F.date_add(col, 4 - F.dayofweek(F.date_add(col, -1))))


SQL_ISO_YEAR = "CAST(isoyear({col}) AS INT)"
SQL_ISO_WEEK = "CAST(weekofyear({col}) AS INT)"


def report_week_bounds(base_date: dt.date) -> tuple[dt.date, dt.date]:
    """X4: last full Mon..Sun week before ``base_date``.

    Mirrors the reference's ``days_to_last_sunday = (weekday+1) % 7 or 7``
    (``src/weekly/orchestrator.py:148-160``): from any base date, back up to
    the most recent Sunday (strictly before base when base is Sunday), then
    the report week is the Monday..Sunday ending there.
    """
    days_to_last_sunday = (base_date.weekday() + 1) % 7 or 7
    sunday = base_date - dt.timedelta(days=days_to_last_sunday)
    monday = sunday - dt.timedelta(days=6)
    return monday, sunday


def report_week_end_col(col: Column) -> Column:
    """X4 as a column: the Sunday ending the last full Mon..Sun week strictly
    before ``col`` (Sunday input backs up a full 7 days, like the driver-side
    ``report_week_bounds``). ``dayofweek`` is Sun=1..Sat=7, so the step back
    is Sun→7, Mon→1, ... Sat→6 = ((dow+5) % 7) + 1."""
    return F.date_sub(col, ((F.dayofweek(col) + 5) % 7) + 1)


def report_week_start_col(col: Column) -> Column:
    """X4: the Monday opening that same report week."""
    return F.date_sub(report_week_end_col(col), 6)


# DuckDB dayofweek is Sun=0..Sat=6 → step back = dow==0 ? 7 : dow.
# DATE - INTEGER stays DATE (to_days/INTERVAL would widen to TIMESTAMP).
SQL_REPORT_WEEK_END = (
    "({col} - CASE WHEN dayofweek({col}) = 0 THEN 7 ELSE dayofweek({col}) END)"
)
SQL_REPORT_WEEK_START = f"({SQL_REPORT_WEEK_END} - 6)"


# --- yyyymmdd string-date kernel (X1/X2/X5, F4/F5) ------------------------
#
# The reference stores most business dates as VARCHAR2(8) 'YYYYMMDD' and
# compares them LEXICOGRAPHICALLY (safe: lexicographic == chronological for
# fixed-width yyyymmdd), with the sentinel '99991231' meaning "still alive"
# (``src/weekly/data_loader.py:834-863``). We keep the same convention: stay
# string-typed for filters, convert only where real date arithmetic happens.

ALIVE_SENTINEL = "99991231"


def to_yyyymmdd(col: Column) -> Column:
    """DATE/TIMESTAMP → 'yyyyMMdd' string (X5). DuckDB: strftime(d, '%Y%m%d')."""
    return F.date_format(col, "yyyyMMdd")


def from_yyyymmdd(col: Column) -> Column:
    """'yyyyMMdd' string → DATE. DuckDB: strptime(s, '%Y%m%d')::DATE."""
    return F.to_date(col, "yyyyMMdd")


def parse_date_tolerant(col: Column) -> Column:
    """X1's tolerant parser: accepts 'yyyyMMdd' OR 'yyyy-MM-dd', NULL for
    junk (the reference returns 0 from its diff on bad input — callers
    coalesce). The reference mixes both formats across tables
    (``TM_LPD_DATA.DOCHUK_DT`` vs everything else)."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyyMMdd")).cast("date"),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")).cast("date"),
    )


def date_diff_tolerant(d1: Column, d2: Column) -> Column:
    """Days between two string dates in either format; 0 on bad input (X1,
    ref ``base.py:376-398``)."""
    return F.coalesce(
        F.date_diff(parse_date_tolerant(d2), parse_date_tolerant(d1)), F.lit(0)
    )


def add_days_str(col: Column, n: int | Column) -> Column:
    """'yyyyMMdd' + n days → 'yyyyMMdd' (X2, ref ``base.py:400-419``)."""
    return to_yyyymmdd(F.date_add(from_yyyymmdd(col), n))


def is_alive(out_dt: Column, base_yyyymmdd: str) -> Column:
    """F4: alive-entity predicate — sentinel date or outs after base.
    Pure string comparison, exactly the reference's
    ``OUT_DT == '99991231' or OUT_DT > base_date``."""
    return (out_dt == ALIVE_SENTINEL) | (out_dt > base_yyyymmdd)


def is_culled(out_dt: Column, base_yyyymmdd: str) -> Column:
    """F5: culled-entity predicate — left before/on the base date."""
    return (out_dt != ALIVE_SENTINEL) & (out_dt <= base_yyyymmdd)


# --- KST business clock (X19) ---------------------------------------------
# The reference pins business time to UTC+9 regardless of server timezone
# (``src/common/timezone.py:14-29``). Driver-side helpers — the Spark
# session zone stays UTC for deterministic distributed date math, and these
# provide the wall-clock the orchestration layer reasons in.

KST = dt.timezone(dt.timedelta(hours=9), name="Asia/Seoul")


def kst_now() -> dt.datetime:
    return dt.datetime.now(KST)


def kst_today() -> dt.date:
    return kst_now().date()


US_PER_SEC = 1_000_000
US_PER_DAY = 86_400 * US_PER_SEC

# --- UD3: UTC → locale view time ------------------------------------------
# The reference stores UTC and converts for display/comparison with
# ``SF_GET_LOCALE_VW_DATE_2022(LOCALE, SYSDATE)`` — KOR +09:00, VNM +07:00
# (``/root/reference/docs/db/ins/02_TABLE.md:94-99``). Fixed offsets (no
# DST in either zone), so the conversion is pure integer µs arithmetic —
# session-timezone-proof, unlike from_utc_timestamp which renders through
# the JVM zone rules.

LOCALE_OFFSET_HOURS = {"KOR": 9, "VNM": 7}


def locale_offset_us(locale: Column) -> Column:
    """Per-row UTC offset in microseconds for a locale code column.

    Unknown locales fall back to 0 (UTC) — the reference function raises for
    unknown codes, but a distributed filter should degrade, not abort.
    """
    expr = F.lit(0)
    for code, hours in LOCALE_OFFSET_HOURS.items():
        expr = F.when(locale == code, F.lit(hours * 3600 * 1_000_000)).otherwise(expr)
    return expr


def to_locale_us(ts_us: Column, locale: Column) -> Column:
    """Epoch-µs UTC → epoch-µs shifted to the locale's wall clock (UD3)."""
    return ts_us + locale_offset_us(locale)


def us_to_sec(col: Column) -> Column:
    """Epoch-microseconds → whole epoch seconds (flooring).

    DuckDB oracle equivalent: ``CAST(FLOOR(epoch_us(ts) / 1000000.0) AS
    BIGINT)`` — NOT integer ``//``, which in DuckDB truncates toward zero
    (probed: ``-1 // 1000000 = 0``) and would diverge from this floor for
    pre-1970 timestamps.

    The double division is safe here: with integer-µs inputs the fractional
    part is ≤ 1−1e-6 while the rounding error bound at ~1.7e9 s is ~2e-7,
    so flooring can never flip to the next second.
    """
    return F.floor(col / US_PER_SEC).cast("long")


def us_to_day(col: Column) -> Column:
    """Epoch-microseconds → naive UTC date, as pure integer arithmetic.

    Timezone-proof: never goes through a timestamp cast, so the result is
    identical regardless of the session timezone the harness runs us with.
    DuckDB oracle equivalent on its TIMESTAMP view: ``CAST(ts AS DATE)``.

    Goes via whole seconds first — dividing raw µs by 86.4e9 in double can
    round up for timestamps within ~190 µs of midnight; seconds/86400 has a
    comfortable safety margin.
    """
    days = F.floor(us_to_sec(col) / 86_400).cast("int")
    return F.date_add(F.lit("1970-01-01").cast("date"), days)


def date_spine(spark: SparkSession, start: str, end: str, col_name: str = "d") -> DataFrame:
    """Dense daily date spine [start, end] (operator J10 — the reference's
    ``CONNECT BY LEVEL <= 7`` calendar, ``src/weekly/data_loader.py:500-536``).

    Built with sequence+explode so it is a single-task generated relation —
    no driver-side loop, broadcastable into calendar left joins.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
        ).alias(col_name)
    )
