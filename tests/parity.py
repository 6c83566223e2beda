"""Shared differential-test harness: run a registry query in Spark and its
oracle SQL in DuckDB on the same parquet tables, then compare like the driver
does — row count, column names, and order-insensitive values.

Comparison is STRICT (bit-exact for floats after both sides round-trip
through Python): queries are designed to be order-independent via exact
decimal intermediates, so any drift is a real bug, not noise.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from inspig_etl_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def canon(cols, rows):
    """Sort columns by name and rows by string repr — order-insensitive form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple(repr(c) for c in r))
    return [cols[i] for i in order], out


def sweep(spark, data_dir: str, names: list[str], workers: int = 8) -> list[str]:
    """Run every (query, oracle) pair against ``data_dir`` from a small
    thread pool (guide §2.6: actions are only sequential because the
    caller makes them so — Spark's scheduler happily overlaps independent
    jobs, and each thread opens its own DuckDB connection). One sequential
    sweep is ~170 driver-bound plan builds back to back; overlapping them
    cuts a sweep from tens of minutes to a few (r17: the driver's pytest
    window expired at ~41% of the r16 suite, so wall time IS coverage).
    Returns per-query failure strings so a red sweep names every diverging
    pair, like a parametrized form would."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from inspig_etl_spark import queries as reg

    reg._load()
    failures: list[str] = []
    lock = threading.Lock()

    def one(name: str) -> None:
        q = reg.REGISTRY[name]
        try:
            compare(q.name, q.fn(spark, data_dir), *run_oracle(q.oracle, data_dir))
        except Exception as e:  # noqa: BLE001 - collected and re-raised in bulk
            with lock:
                failures.append(f"{name}: {e}")

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(one, names))
    spark.catalog.clearCache()
    return sorted(failures)


def compare(name, spark_df, oracle_cols, oracle_rows):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    sc, sr = canon(s_cols, s_rows)
    oc, orows = canon(oracle_cols, oracle_rows)
    assert sc == oc, f"{name}: column mismatch spark={sc} oracle={oc}"
    assert len(sr) == len(orows), f"{name}: row count spark={len(sr)} oracle={len(orows)}"
    mismatches = []
    for i, (a, b) in enumerate(zip(sr, orows)):
        if a != b:
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"
