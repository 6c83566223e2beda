"""Entity-status truth table (SURVEY.md §2.10 UD1/UD4 —
``SF_GET_MODONGB_STATUS`` and its client-side Python fallback).

The reference derives each sow's status from her LAST work-history event via
an Oracle server-side UDF, documented as an 8-state truth table at
``/root/reference/src/weekly/data_loader.py:28-46`` and consumed at
``data_loader.py:243-253``, ``modon.py:185-195``, ``culling.py:41-43``:

    last event G (mate)                       → 010002 (pregnant)
    last event B (farrow), DAERI_YN != 'Y'    → 010003 (nursing)
    last event B (farrow), DAERI_YN  = 'Y'    → 010004 (surrogate nursing)
    last event E (wean)                       → 010005 (weaned / open)
    last event F (accident), recurrence code  → 010006 (recurred)
    last event F (accident), abortion code    → 010007 (aborted)
    last event F (accident), other            → entry status
    no event                                  → entry status, else 010001

No UDF needed in Spark: a single ``F.when`` chain over the last-event
columns (the latest-per-key window from operators/events supplies them),
whole-stage-codegen'd. SURVEY §7.2 calls this the unlock for 7 of 10 report
sections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# STATUS_CD codes, verbatim from ``data_loader.py:28-35``.
STATUS_CANDIDATE = "010001"  # 후보 (gilt / candidate)
STATUS_PREGNANT = "010002"
STATUS_NURSING = "010003"
STATUS_NURSING_SURROGATE = "010004"
STATUS_WEANED = "010005"
STATUS_RECURRED = "010006"
STATUS_ABORTED = "010007"

# SAGO_GUBUN_CD accident codes: the live domain is the 8-code 050xxx set
# documented at ``/root/reference/src/weekly/processors/accident.py:20-37``
# (재발/recurrence=050008, 유산/abortion=050002, 도태/culling=050003, ...).
# NOTE: ``data_loader.py:45-46`` declares SAGO_JAEBAL='020001'/
# SAGO_YUSAN='020002' for the same concepts, but those constants are never
# consumed anywhere in the reference — the processors all match on 050xxx.
ACCIDENT_RECURRENCE = "050008"  # 재발
ACCIDENT_ABORTION = "050002"  # 유산
ACCIDENT_CULLING = "050003"  # 도태 (neither recurred nor aborted → entry status)


def status_from_last_event(
    wk_gubun: Column,
    sago_gubun_cd: Column,
    daeri_yn: Column,
    entry_status_cd: Column,
) -> Column:
    """The UD1 truth table as one when-chain (unit-tested row by row)."""
    entry = F.coalesce(entry_status_cd, F.lit(STATUS_CANDIDATE))
    return (
        F.when(wk_gubun == "G", STATUS_PREGNANT)
        .when((wk_gubun == "B") & (daeri_yn == "Y"), STATUS_NURSING_SURROGATE)
        .when(wk_gubun == "B", STATUS_NURSING)
        .when(wk_gubun == "E", STATUS_WEANED)
        .when((wk_gubun == "F") & (sago_gubun_cd == ACCIDENT_RECURRENCE), STATUS_RECURRED)
        .when((wk_gubun == "F") & (sago_gubun_cd == ACCIDENT_ABORTION), STATUS_ABORTED)
        .when(wk_gubun == "F", entry)
        .otherwise(entry)
    )


def sql_status_from_last_event(
    wk_gubun: str, sago_gubun_cd: str, daeri_yn: str, entry_status_cd: str
) -> str:
    """DuckDB CASE mirror of :func:`status_from_last_event`."""
    entry = f"COALESCE({entry_status_cd}, '{STATUS_CANDIDATE}')"
    return f"""CASE
      WHEN {wk_gubun} = 'G' THEN '{STATUS_PREGNANT}'
      WHEN {wk_gubun} = 'B' AND {daeri_yn} = 'Y' THEN '{STATUS_NURSING_SURROGATE}'
      WHEN {wk_gubun} = 'B' THEN '{STATUS_NURSING}'
      WHEN {wk_gubun} = 'E' THEN '{STATUS_WEANED}'
      WHEN {wk_gubun} = 'F' AND {sago_gubun_cd} = '{ACCIDENT_RECURRENCE}' THEN '{STATUS_RECURRED}'
      WHEN {wk_gubun} = 'F' AND {sago_gubun_cd} = '{ACCIDENT_ABORTION}' THEN '{STATUS_ABORTED}'
      WHEN {wk_gubun} = 'F' THEN {entry}
      ELSE {entry}
    END"""


# Mapping from the synthetic events table's event_type domain onto the
# reference's single-letter work codes, so the truth table can be exercised
# on the shipped test data (queries/status_schedule.py).
EVENT_TYPE_TO_WK = {
    "purchase": "G",
    "view": "B",
    "signup": "E",
    "error": "F",
    "click": "Z",  # excluded event type, like the reference's 'Z' (cull)
}


def wk_gubun_from_event_type(event_type: Column) -> Column:
    expr = None
    for et, wk in EVENT_TYPE_TO_WK.items():
        expr = F.when(event_type == et, wk) if expr is None else expr.when(event_type == et, wk)
    return expr


def sql_wk_gubun_from_event_type(event_type: str) -> str:
    whens = " ".join(
        f"WHEN {event_type} = '{et}' THEN '{wk}'" for et, wk in EVENT_TYPE_TO_WK.items()
    )
    return f"CASE {whens} END"
