"""r16 optimization-round profiler: split each headline query's wall time
into BUILD (Python plan construction + any eager sizing jobs) and EXEC
(noop-sink execution), and dump the formatted physical plan.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python tools/profile_r16.py [--plans-dir plans/r16 --tag before] name...

With no names, profiles the full bench HEADLINE list. Each run mirrors
bench.py's run_once exactly (fresh build + noop write + clearCache), but
times the build and the write separately. Writes
``<plans-dir>/<name>_<tag>.txt`` (explain formatted) when --plans-dir is
given, and prints one line per query: name, build_s (min), exec_s (min),
jobs triggered during the first measured build.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _next_job_id(sc) -> int:
    """The DAGScheduler's next job id — py4j may hand back the AtomicInteger
    or (Spark 4.1) an already-unboxed int, so accept both."""
    v = sc._jsc.sc().dagScheduler().nextJobId()
    return v if isinstance(v, int) else v.get()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from bench import HEADLINE
    from inspig_etl_spark import queries as reg
    from inspig_etl_spark.session import get_spark

    spark = get_spark("inspig-etl-profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = reg.queries()
    names = args.names or [n for n in HEADLINE if n in qmap]

    # Warm up JVM / codegen / parquet footers, same as bench.py.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).limit(1).count()

    plans_dir = Path(args.plans_dir) if args.plans_dir else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    sc = spark.sparkContext
    print(f"{'query':42s} {'build_s':>8s} {'exec_s':>8s} {'bjobs':>5s}")
    for name in names:
        if name not in qmap:
            print(f"{name:42s}  -- not registered --")
            continue
        sc.setJobDescription(f"profile:{name}")
        # warm pass (codegen settle), mirrors bench methodology
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

        builds, execs, bjobs = [], [], 0
        plan_txt = None
        for i in range(args.runs):
            j0 = _next_job_id(sc)
            t0 = time.perf_counter()
            df = qmap[name](spark, SF_DIR)
            builds.append(time.perf_counter() - t0)
            if i == 0:
                bjobs = _next_job_id(sc) - j0
                plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        if plans_dir and plan_txt is not None:
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan_txt)
        print(
            f"{name:42s} {min(builds):8.3f} {min(execs):8.3f} {bjobs:5d}",
            flush=True,
        )
        sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
