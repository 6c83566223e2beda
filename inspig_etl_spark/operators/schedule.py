"""Schedule expansion (SURVEY.md §2.10 UD2 — ``FN_MD_SCHEDULE_BSE_2020``).

The reference's Oracle table-function expands per-sow planned tasks: take
each sow's base event, join the plan rules for that event type, offset by
each rule's ``PASS_DAY``, and keep rows inside the report window. Its
semantics are re-derived from the reference's own plain-SQL/Python
re-implementations (``/root/reference/src/weekly/processors/schedule.py:409-552``,
``src/weekly/data_loader.py:704-798``), including the task-SEQ filter
protocol (``schedule.py:186-207``): ``None`` → all tasks, a list → only
those SEQs, empty list → none.

Spark shape: last-event-per-entity (one window shuffle) ⋈ broadcast rules
(a few dozen rows) → ``date_add`` → range filter. Row growth is bounded by
|rules-per-event-type| — no explosion, no UDTF needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Farm-default plan rules, modeled after the reference's JOB-DAJANG default
# schedule (base event code → named task at +PASS_DAY). (task_seq, wk_gubun,
# wk_nm, std_cd, pass_day).
DEFAULT_RULES: tuple[tuple[int, str, str, str, int], ...] = (
    (1, "G", "preg_check_1", "150001", 21),
    (2, "G", "preg_check_2", "150001", 42),
    (3, "G", "pre_farrow_move", "150002", 110),
    (4, "B", "piglet_care", "150003", 3),
    (5, "B", "wean_plan", "150004", 25),
    (6, "E", "remate_check", "150005", 7),
    (7, "F", "recheck", "150005", 10),
)

RULES_SCHEMA = "task_seq INT, wk_gubun STRING, wk_nm STRING, std_cd STRING, pass_day INT"


def rules_df(spark: SparkSession, rules: Sequence[tuple] = DEFAULT_RULES) -> DataFrame:
    return spark.createDataFrame(list(rules), RULES_SCHEMA)


def sql_rules_values(rules: Sequence[tuple] = DEFAULT_RULES) -> str:
    """The same rules as a DuckDB VALUES list (oracle-side twin)."""
    rows = ", ".join(
        f"({seq}, '{g}', '{nm}', '{std}', {pd})" for seq, g, nm, std, pd in rules
    )
    return f"(VALUES {rows}) AS rules(task_seq, wk_gubun, wk_nm, std_cd, pass_day)"


def parse_seq_filter(spec: str | None) -> list[int] | None:
    """The reference's TB_PLAN_MODON.SEQ filter string protocol
    (``schedule.py:186-207,332-350``):

    - ``'-1'`` (or None) → all tasks (farm mode / no restriction);
    - ``''`` → no tasks selected (the reference skips the count entirely —
      zero rows);
    - ``'1,2,3'`` → exactly those task SEQs.
    """
    if spec is None or spec == "-1":
        return None
    if spec == "":
        return []
    return [int(t) for t in spec.split(",") if t.strip()]


def expand_schedule(
    last_events: DataFrame,
    rules: DataFrame,
    base_day: str | Column,
    dt_from: str,
    dt_to: str,
    wk_gubun_col: str = "wk_gubun",
    seq_filter: str | Sequence[int] | None = None,
) -> DataFrame:
    """Expand base events into dated task rows within [dt_from, dt_to].

    ``seq_filter`` accepts the reference's string protocol (``'-1'`` all /
    ``''`` none / ``'1,2,3'`` subset — see :func:`parse_seq_filter`) or an
    explicit list of task SEQs; None keeps every task.
    """
    if isinstance(seq_filter, str):
        seq_filter = parse_seq_filter(seq_filter)
    if seq_filter is not None:
        rules = rules.filter(F.col("task_seq").isin(list(seq_filter)))
    base = F.col(base_day) if isinstance(base_day, str) else base_day
    expanded = last_events.join(F.broadcast(rules), wk_gubun_col).withColumn(
        "pass_dt", F.date_add(base, F.col("pass_day"))
    )
    return expanded.filter(
        (F.col("pass_dt") >= F.lit(dt_from).cast("date"))
        & (F.col("pass_dt") <= F.lit(dt_to).cast("date"))
    )


def farm_default_schedule(
    last_events: DataFrame,
    dt_from: str,
    dt_to: str,
    base_day: str = "event_day",
    wk_gubun_col: str = "wk_gubun",
    daeri_col: str = "daeri_yn",
    avg_return_day: int = 7,
    preg_period: int = 115,
    wean_period: int = 21,
) -> DataFrame:
    """The farm-default schedule variant (``schedule.py:388-552``,
    ``_count_schedule_by_farm``): when a farm has no per-task plan rules,
    expected dates come from the farm config periods applied to the last
    work event —

    - mating: last wean (E, not surrogate) + ``avg_return_day``; last
      accident (F) + 1 day (immediately re-matable);
    - farrowing: last mate (G) + ``preg_period``;
    - weaning: last farrow (B) + ``wean_period``.

    Window semantics mirror the reference: farrowing/weaning are strict
    BETWEEN; mating has no lower bound — earlier-than-window dates count
    into the FIRST day (``add_early_to_first``, ``schedule.py:374-380,508``),
    so the mating pass_dt is clamped up to ``dt_from``.

    One scan, when-chain expressions, no join — whole-stage-codegen'd.

    NULL-semantics fidelity: the wean→mating rule requires ``daeri_yn ==
    'N'`` EXACTLY, so a NULL daeri_yn drops the row — mirroring the
    reference's ``AND WK.DAERI_YN = 'N'`` (schedule.py:446, Oracle
    three-valued logic). The status truth table (status.py) instead treats
    anything ≠ 'Y' as non-surrogate; that asymmetry between the two passes
    exists in the reference itself and is preserved deliberately.
    """
    wk = F.col(wk_gubun_col)
    base = F.col(base_day)
    stype = (
        F.when((wk == "E") & (F.col(daeri_col) == "N"), "mating")
        .when(wk == "F", "mating")
        .when(wk == "G", "farrowing")
        .when(wk == "B", "weaning")
    )
    offset = (
        F.when((wk == "E") & (F.col(daeri_col) == "N"), avg_return_day)
        .when(wk == "F", 1)
        .when(wk == "G", preg_period)
        .when(wk == "B", wean_period)
    )
    lo, hi = F.lit(dt_from).cast("date"), F.lit(dt_to).cast("date")
    raw = F.date_add(base, offset)
    clamped = F.when(stype == "mating", F.greatest(raw, lo)).otherwise(raw)
    return (
        last_events.withColumn("schedule_type", stype)
        .filter(F.col("schedule_type").isNotNull())
        .withColumn("pass_dt", clamped)
        .filter((F.col("pass_dt") >= lo) & (F.col("pass_dt") <= hi))
    )


def day_crosstab(
    expanded: DataFrame,
    dt_from: str,
    days: int = 7,
    key: str = "wk_nm",
    pass_dt: str = "pass_dt",
) -> DataFrame:
    """J12: per-task counts pivoted into D1..D7 day columns over the window.

    Conditional aggregation (``sum(when(day==i))``) instead of ``pivot`` —
    the column set is static, so the plan is one groupBy with map-side
    partials and a fixed schema.
    """
    day_no = F.date_diff(F.col(pass_dt), F.lit(dt_from).cast("date")) + 1
    tagged = expanded.withColumn("__day_no", day_no)
    aggs = [
        F.count(F.when(F.col("__day_no") == i, 1)).alias(f"d{i}")
        for i in range(1, days + 1)
    ]
    return tagged.groupBy(key).agg(*aggs, F.count(F.lit(1)).alias("total_cnt"))
