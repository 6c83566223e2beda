"""Gap-based sessionization — the custom stateful streaming operator.

Two implementations with identical semantics:

- :func:`sessionize_batch` — pure window functions (lag → gap flag →
  running sum), used BOTH as a registered oracle-checked query and as the
  correctness baseline for the stateful path.
- :func:`sessionize_stream` — ``applyInPandasWithState`` keeping per-user
  (last_ts, session_no) state with an event-time timeout; the pattern the
  brief names for "custom stateful operators" that built-in streaming
  aggregations can't express.

A session breaks when the gap since the user's previous event exceeds
``gap``. Session ids are 1-based per user in event order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800  # 30 minutes

SESSION_OUTPUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, ts_sec BIGINT, session_no INT"
)
SESSION_STATE_SCHEMA = "last_ts BIGINT, session_no INT"

_OUT_COLS = ["user_id", "event_id", "ts_sec", "session_no"]


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_sec_col: str = "ts_sec",
    id_col: str = "event_id",
    gap: int = GAP_SECONDS,
) -> DataFrame:
    """Window-function sessionization: one shuffle on the user key."""
    w = Window.partitionBy(user_col).orderBy(ts_sec_col, id_col)
    gap_flag = F.when(
        F.col(ts_sec_col) - F.lag(ts_sec_col).over(w) > gap, 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_sec_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__brk", gap_flag).withColumn(
        "session_no", (F.sum("__brk").over(run) + 1).cast("int")
    ).drop("__brk")


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "event_id": pd.Series([], dtype="int64"),
            "ts_sec": pd.Series([], dtype="int64"),
            "session_no": pd.Series([], dtype="int32"),
        }
    )


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user state function: carries (last_ts, session_no) across
    micro-batches; events within a batch are sorted by (ts, id).

    Timed-out invocation (watermark passed last_ts + gap): every row that
    could still extend the session is now below the watermark, so the state
    is dropped. Rows were already emitted eagerly — nothing to flush.

    Late-data semantics (cross-batch): an event older than the frontier but
    above the watermark joins the CURRENT session and must never move
    ``last_ts`` backwards — a regressed frontier would spuriously break the
    session on the next in-order event. This is the standard streaming
    approximation (bounded by the watermark delay): already-emitted rows
    cannot be retracted, so a late event cannot retroactively split history
    the way the batch oracle would; it is folded forward instead.
    """
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield _empty_out()
        return
    if state.exists:
        last_ts, session_no = state.get
    else:
        last_ts, session_no = None, 1
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_sec", "event_id"])
        for _, row in pdf.iterrows():
            ts = int(row["ts_sec"])
            if last_ts is not None and ts - last_ts > GAP_SECONDS:
                session_no += 1
            last_ts = ts if last_ts is None else max(last_ts, ts)
            out_rows.append((user_id, int(row["event_id"]), ts, session_no))
    state.update((last_ts, session_no))
    # Expire the state once no in-order event can continue this session.
    # Spark requires the timeout timestamp to be ahead of the watermark.
    timeout_at_ms = (int(last_ts) + GAP_SECONDS) * 1000
    state.setTimeoutTimestamp(max(timeout_at_ms, state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(out_rows, columns=_OUT_COLS) if out_rows else _empty_out()


def sessionize_stream(events: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """Stateful streaming sessionization over (user_id, event_id, ts_sec).

    EventTimeTimeout + a watermark on the event time bound per-user state for
    always-on streams: a user's state is dropped once the watermark passes
    ``last_ts + gap`` (no in-order event can extend the session after that) —
    measured over a 24-batch long replay by ``tools/state_curve_probe.py``
    (SCALE.md "Long-replay state curves": numRowsTotal plateaus at 3 active
    cohort widths while users-ever grows linearly).
    If the user later returns, their session numbering restarts at 1 — pair
    session_no with its first ts_sec when a globally unique session identity
    is needed across expiry.
    """
    from inspig_etl_spark.pyfiles import ensure_shipped

    ensure_shipped(events.sparkSession)
    watermarked = events.withColumn(
        "__event_time", F.timestamp_seconds(F.col("ts_sec"))
    ).withWatermark("__event_time", watermark_delay)
    return watermarked.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
