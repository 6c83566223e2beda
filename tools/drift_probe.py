"""Isolated min-of-3 drift triage (the repo's measurement protocol).

Re-times a small set of queries in a fresh session, interleaving TWO
independent controls between each subject so host-condition drift is
visible in the same run: if the subjects return to their earlier levels
while the controls also move, the cross-round delta was host drift, not a
plan regression.

Two controls, not one (VERDICT r10 item 5b): tpch_q1 is itself a real
multi-agg plan that has drifted on hot hosts (1.38x in r10), so a second,
trivial-scan control — count over one lineitem column, no shuffle, no agg
fan-out — gives a reference point that cannot hide a plan regression of
its own. Host heat moves BOTH controls; a q1 plan regression moves only
q1 against a flat trivial-scan line.

Usage: python tools/drift_probe.py [sf_dir] [name ...]
Defaults to the r6->r5 top movers at /root/testdata/sf0.1.
"""
import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SUBJECTS = sys.argv[2:] or [
    "nearest_station_haversine",
    "merge_upsert_partial",
    "weekly_report_sections",
    "salted_brand_volume",
]
CONTROL = "tpch_q1_pricing_summary"
SCAN_CONTROL = "__trivial_scan__"  # count(l_quantity) over lineitem


def main() -> None:
    from inspig_etl_spark import queries as reg
    from inspig_etl_spark.session import get_spark

    spark = get_spark("drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qmap = reg.queries()

    lineitem = os.path.join(SF_DIR, "lineitem.parquet")

    def trivial_scan(sp, _sf):
        # One-column parquet scan + count. groupBy().count() still does a
        # one-row partial-count exchange, so this is scan + local partials
        # + a single-row shuffle — the floor of what ANY query pays.
        # Moves only with host conditions / IO, never a plan.
        return sp.read.parquet(lineitem).select("l_quantity").groupBy().count()

    qmap = dict(qmap)
    qmap[SCAN_CONTROL] = trivial_scan

    def run(name: str) -> float:
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(min(times[1:]), 3)  # first pass warms; min of the rest

    # Committed bounds for context in the printout: the min floor flags
    # drift, the median (r15) is the 2x adjudication bound on sub-second
    # queries — an isolated reading near the MEDIAN is normal, not drift.
    floors: dict[str, float] = {}
    medians: dict[str, float] = {}
    base_path = Path(_REPO) / "BENCH_BASELINE.json"
    if base_path.exists():
        base = json.loads(base_path.read_text())
        # Numeric SF compare (ADVICE r15): bench.py's _sf_from_dir parses
        # the dir tail to a float, so "sf0.10" or "sf1" still matches a
        # baseline minted at 0.1/1.0 — string-formatting the baseline SF
        # silently skipped the bounds columns on such spellings.
        tail = os.path.basename(SF_DIR.rstrip("/"))
        try:
            dir_sf = float(tail[2:]) if tail.startswith("sf") else None
        except ValueError:
            dir_sf = None
        if dir_sf is not None and base.get("sf") == dir_sf:
            floors = base.get("queries", {})
            medians = base.get("queries_median", {})

    out = {}
    controls = []
    scan_controls = []
    for n in SUBJECTS:
        controls.append(run(CONTROL))
        scan_controls.append(run(SCAN_CONTROL))
        out[n] = run(n)
        bounds = ""
        if n in floors:
            bounds = f", floor {floors[n]:.3f}s"
            if n in medians:
                bounds += f", median {medians[n]:.3f}s"
        print(
            f"{n:32s} {out[n]:7.3f}s   "
            f"(control {controls[-1]:.3f}s, scan {scan_controls[-1]:.3f}s"
            f"{bounds})"
        )
    controls.append(run(CONTROL))
    scan_controls.append(run(SCAN_CONTROL))
    rec = {"sf_dir": SF_DIR, "control": CONTROL, "control_runs": controls,
           "scan_control": SCAN_CONTROL, "scan_control_runs": scan_controls,
           "subjects": out}
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
