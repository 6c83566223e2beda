"""Ledger-growth curve for the at-ingest curation funnel (VERDICT r12
item 6): unlike the watermark-evicted dedup state (which PLATEAUS —
SCALE.md "Long-replay state curves"), the exact-fp/near-dup ingest ledger
legitimately grows with DISTINCT content. This probe measures exactly how,
and what compaction buys back, so the deployment policy is written from a
curve, not an assertion.

Replay layout: N batches through the REAL per-trigger function
(``_ingest_apply`` — the same code the stream's foreachBatch calls), each
batch carrying FRESH new docs, DUP exact repeats of batch b-1's fresh docs
(same fingerprint), and NEAR near-duplicates of batch b-1's fresh docs
(19 of 20 shingles shared, Jaccard ~0.905 >= 0.5 — real banded matches).

Per batch we record, from the sinks themselves:

- ``log_rows``: the ingest log (every row ever ingested — what the
  out-of-order repair needs to recount any batch's funnel row);
- ``distinct_fp``: the exact ledger (one per distinct fingerprint);
- ``canon_rows``: what COMPACTION retains — measured by running the real
  ``streaming.incremental.compact_ingest_ledger`` operator over the log
  with everything frozen (the near-dup band index + exact-fp probe set
  are both derivable from canonicals alone, so once a batch is past the
  out-of-order repair window its non-canonical rows can be dropped and
  its funnel row frozen); derived independently of ``distinct_fp`` so
  the two columns can disagree if canonical election breaks;
- ``log_bytes``: parquet bytes of the log dir;
- ``trigger_s``: wall time of the trigger (the local staged-parquet
  re-read grows with the log; at 100 TB the band index and fp ledger are
  persisted keyed tables, so the probe shuffles only the batch side).

Usage: python tools/ledger_growth_probe.py [n_batches]  (default 12)
Prints one markdown table + a JSON line for SCALE.md.
"""
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 12
FRESH, DUP, NEAR = 1000, 500, 500
SH_PER_DOC = 20  # shingles per synthetic doc; NEAR shares 19 of them


def _dir_bytes(path: str) -> int:
    p = Path(path)
    if not p.exists():
        return 0
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def main() -> None:
    from pyspark.sql import functions as F

    from inspig_etl_spark.functions.text import md5_long
    from inspig_etl_spark.operators.dedup import minhash_signature
    from inspig_etl_spark.queries.st_manifest import (
        _ING_FUNNEL_SCHEMA,
        _ING_LOG_SCHEMA,
        _ingest_apply,
    )
    from inspig_etl_spark.session import get_spark
    from inspig_etl_spark.sources.sinks import read_or_empty
    from inspig_etl_spark.streaming.incremental import compact_ingest_ledger

    spark = get_spark("ledger-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    b = F.col("batch")
    i = F.col("id")

    from inspig_etl_spark.functions.text import HASH_P

    def shingles(key: F.Column, drop_first: bool = False):
        """SH_PER_DOC content-derived shingle hashes for a doc key; the
        NEAR variant drops one and adds one, sharing 19 of 20. Hashes are
        reduced mod HASH_P like the real shingle pipeline's — a raw
        60-bit md5_long overflows int64 inside the MinHash permutation
        multiply (the memory-listed gotcha)."""
        idxs = list(range(1, SH_PER_DOC)) if drop_first else list(
            range(SH_PER_DOC)
        )
        arr = F.array(
            *[md5_long(F.concat(F.lit(f"s{j}:"), key)) % HASH_P for j in idxs]
        )
        if drop_first:
            arr = F.concat(
                arr, F.array(md5_long(F.concat(F.lit("alt:"), key)) % HASH_P)
            )
        return arr

    def rows(frame, key: F.Column, doc_off: int, near: bool = False):
        sh = shingles(key, drop_first=near)
        fp = F.md5(F.concat(F.lit("near:" if near else "doc:"), key))
        return frame.select(
            (b * 10_000 + i + doc_off).cast("bigint").alias("doc_id"),
            b.cast("bigint").alias("batch"),
            fp.alias("fp"),
            sh.alias("sh"),
            minhash_signature(sh).alias("sig"),
            # alternate the quality verdict so both gate paths stay live
            F.when(i % 4 == 0, F.lit(-1)).otherwise(F.lit(1))
            .cast("bigint")
            .alias("logit_e4"),
            F.lit(False).alias("contam"),
        )

    batches = spark.range(1, N_BATCHES + 1).withColumnRenamed("id", "batch")
    fresh_key = F.concat(F.lit("k"), (b * FRESH + i).cast("string"))
    prev_key = F.concat(F.lit("k"), ((b - 1) * FRESH + i).cast("string"))
    fresh = rows(spark.range(FRESH).crossJoin(batches), fresh_key, 0)
    dup = rows(
        spark.range(DUP).crossJoin(batches.filter(b >= 2)), prev_key, 3000
    )
    near = rows(
        spark.range(NEAR).crossJoin(batches.filter(b >= 2)),
        prev_key,
        6000,
        near=True,
    )
    staged = fresh.unionByName(dup).unionByName(near).persist()
    staged.count()

    tmpdir = tempfile.mkdtemp(prefix="ledger_growth_")
    log_path = f"{tmpdir}/log"
    funnel_path = f"{tmpdir}/funnel"
    curve = []
    try:
        for bb in range(1, N_BATCHES + 1):
            t0 = time.perf_counter()
            _ingest_apply(
                staged.filter(F.col("batch") == bb), log_path, funnel_path
            )
            el = round(time.perf_counter() - t0, 2)
            log = read_or_empty(spark, log_path, _ING_LOG_SCHEMA)
            agg = log.agg(
                F.count(F.lit(1)).alias("log_rows"),
                F.countDistinct("fp").alias("distinct_fp"),
            ).collect()[0]
            # canon_rows is measured INDEPENDENTLY through the real
            # compaction operator (freeze everything seen so far), not
            # copied from distinct_fp — so this column can actually
            # disagree with the exact-ledger column if the rank-1
            # canonical election ever breaks (ADVICE r13).
            canon_rows = compact_ingest_ledger(log, bb).count()
            curve.append(
                {
                    "batch": bb,
                    "log_rows": agg.log_rows,
                    "distinct_fp": agg.distinct_fp,
                    "canon_rows": canon_rows,
                    "log_bytes": _dir_bytes(log_path),
                    "trigger_s": el,
                }
            )
        funnel = read_or_empty(spark, funnel_path, _ING_FUNNEL_SCHEMA)
        fr = {r.batch: r.asDict() for r in funnel.collect()}
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)

    print("\n### ingest ledger growth per batch\n")
    print("| batch | log rows | distinct fp (exact ledger) |"
          " canon rows (measured via compact_ingest_ledger) |"
          " log MiB | trigger s | n_exact_dup | n_neardup |")
    print("|---|---|---|---|---|---|---|---|")
    for c in curve:
        f = fr.get(c["batch"], {})
        print(
            f"| {c['batch']} | {c['log_rows']} | {c['distinct_fp']} |"
            f" {c['canon_rows']} |"
            f" {c['log_bytes'] / 1048576:.1f} | {c['trigger_s']} |"
            f" {f.get('n_exact_dup', '-')} | {f.get('n_neardup', '-')} |"
        )
    print(json.dumps({"n_batches": N_BATCHES, "curve": curve,
                      "funnel": fr}))
    spark.stop()


if __name__ == "__main__":
    main()
