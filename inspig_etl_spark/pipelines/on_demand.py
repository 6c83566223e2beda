"""On-demand single-farm report runner (SURVEY.md §3.3 — the reference's
FastAPI run-farm endpoint, ``/root/reference/src/api/server.py:140-206``,
delegating to ``orchestrator.run_single_farm``,
``src/weekly/orchestrator.py:1244-1420``).

The web shell (FastAPI routing, auth, JSON models) is deliberately NOT part
of the engine; what the engine owns — and what this module provides — is
everything the endpoint computes:

- the period contract: ins_date → last week's Monday..Sunday and the ISO
  year/week of that Sunday (``orchestrator.py:1276-1289``);
- the farm-scoped report build: the all-farms weekly plan filtered to one
  ``farm_no`` — Catalyst pushes the literal predicate into every scan, so
  the on-demand path reads one farm's slice, not the fleet (the batch path
  keeps the groupBy-all-farms plan);
- the share token (deterministic SHA-256 core, ``farm_processor.py:204-227``
  convention shared with the ``sha2_share_token`` query);
- the result contract: status / period / token dict mirroring
  ``RunFarmResponse``, with an error status for an unknown farm and for
  the not-yet-implemented MONTH/QUARTER report kinds
  (``server.py:163-171``).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.pipelines.weekly import build_weekly_report

SUPPORTED_DAY_GB = ("WEEK",)


def last_week_period(ins_date: str) -> dict:
    """Last week's Mon..Sun relative to ``ins_date`` (YYYYMMDD), plus the
    ISO year/week of that Sunday (``orchestrator.py:1276-1289``).

    A Sunday base date reports the PREVIOUS full week (7 days back), never
    the week ending today — the ``or 7`` in the reference.
    """
    base = datetime.strptime(ins_date, "%Y%m%d")
    days_to_last_sunday = (base.weekday() + 1) % 7 or 7
    last_sunday = base - timedelta(days=days_to_last_sunday)
    last_monday = last_sunday - timedelta(days=6)
    iso = last_sunday.isocalendar()
    return {
        "ins_date": ins_date,
        "dt_from": last_monday.strftime("%Y%m%d"),
        "dt_to": last_sunday.strftime("%Y%m%d"),
        "year": iso.year,
        "week_no": iso.week,
    }


def share_token(farm_no: int, year: int, week_no: int, dt_to: str) -> str:
    """Deterministic SHA-256 share-token core (the reference appends a
    random hex salt driver-side — randomness is not an engine concern)."""
    return hashlib.sha256(f"{farm_no}-{year}-{week_no}-{dt_to}".encode()).hexdigest()


def _dashed(yyyymmdd: str) -> str:
    """20240115 -> 2024-01-15 (the pipeline takes ISO dates)."""
    return f"{yyyymmdd[:4]}-{yyyymmdd[4:6]}-{yyyymmdd[6:]}"


def run_single_farm(
    spark: SparkSession,
    sf_dir: str,
    farm_no: int,
    ins_date: str,
    day_gb: str = "WEEK",
    master_seq: int | None = None,
    cache_results: bool = True,
) -> dict:
    """The run-farm endpoint's engine half: build last week's report for ONE
    farm and return the response contract.

    ``master_seq`` defaults to the period's ``year*100 + week_no`` — the
    same sequence the summary sink keys on — so the wide rows stamped by
    :func:`to_wide_rows` land under the REAL week slice and a later week
    can never replace an earlier one through the (master_seq, farm_no,
    gubun) S12 key. Pass it explicitly only to mirror a pre-allocated
    reference TS_INS_WEEK.MASTER_SEQ.

    Returns a dict with ``status`` ('success'/'error'), the period fields,
    ``share_token``, and the two farm-scoped DataFrames (``wide_rows``,
    ``summary``) for the caller to collect or land through the §S6-S10
    sinks — both are the PERSISTED handles, so ``.unpersist()`` on them
    actually frees the cache. Like the reference, an unsupported
    ``day_gb`` and an unknown farm are ERROR results, not exceptions.
    """
    if day_gb not in SUPPORTED_DAY_GB:
        return {
            "status": "error",
            "farm_no": farm_no,
            "day_gb": day_gb,
            "error": f"{day_gb} report kind not implemented",
            "message": "only WEEK is supported",
        }
    period = last_week_period(ins_date)
    if master_seq is None:
        master_seq = period["year"] * 100 + period["week_no"]
    token = share_token(farm_no, period["year"], period["week_no"], period["dt_to"])

    wide, summary = build_weekly_report(
        spark,
        sf_dir,
        master_seq=master_seq,
        dt_from=_dashed(period["dt_from"]),
        dt_to=_dashed(period["dt_to"]),
    )
    # persist(): the existence probe below and the caller's collect/land of
    # wide_rows + summary would otherwise each re-execute the farm-scoped
    # report plan (2-3 full runs per on-demand request — ADVICE r5). Both
    # frames are one farm's slice, so the cache is bounded; callers that
    # keep the session hot can `.unpersist()` them after landing. The
    # share-token column is attached BEFORE the persist so the returned
    # ``summary`` is the cached frame itself, not a derived child whose
    # unpersist would be a no-op. ``cache_results=False`` skips the persist
    # entirely for one-shot callers that execute the result exactly once
    # (the oracle query, scale probes) — otherwise every invocation in a
    # long-lived session accumulates two cached farm slices (ADVICE r9).
    wide_farm = wide.filter(F.col("farm_no") == farm_no)
    summary_farm = (
        summary.filter(F.col("farm_no") == farm_no)
        .withColumn("share_token", F.lit(token))
    )
    if cache_results:
        wide_farm = wide_farm.persist()
        summary_farm = summary_farm.persist()

    # Existence gate (the reference 404s an unknown farm): a limit-1 probe
    # on the pushed-down farm predicate, not a full count.
    if not summary_farm.limit(1).count():
        if cache_results:
            wide_farm.unpersist()
            summary_farm.unpersist()
        return {
            "status": "error",
            "farm_no": farm_no,
            "day_gb": day_gb,
            "error": f"farm {farm_no} not found",
            **period,
        }

    return {
        "status": "success",
        "farm_no": farm_no,
        "day_gb": day_gb,
        "master_seq": master_seq,
        "share_token": token,
        **period,
        "wide_rows": wide_farm,
        "summary": summary_farm,
    }
