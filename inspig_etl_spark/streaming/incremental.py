"""Incremental ingestion kernel (ST1-ST4, ST6).

Mapping from the reference's batch-incremental semantics:

- **ST1 hourly micro-batch upsert** — ``foreach_batch_upsert`` merges every
  micro-batch into a keyed parquet sink through the same
  ``sources.sinks.merge_upsert`` kernel the batch path uses (on Delta this
  becomes MERGE INTO; nothing else changes).
- **ST2 late/corrected data** — the upsert is keyed, so a re-read of a
  trailing window simply overwrites the stale rows; with true streams,
  ``windowed_counts`` bounds state with a watermark instead.
- **ST3 all-or-nothing commit** — each micro-batch write goes through
  ``staged_overwrite`` (atomic swap): a failed batch leaves the sink
  untouched, exactly like the reference refusing partial weather saves
  (``/root/reference/src/collectors/weather.py:1646-1660``).
- **ST4 forecast layering** — ``layered_merge`` applies ordered passes:
  upsert (short-term) → overwrite (observed) → insert-if-absent (mid-term)
  (``weather.py:1697-1732,1879-1918,2406-2443``).
- **ST6 run manifest** — ``RunManifest`` mirrors the master/job-log rows
  (RUNNING → COMPLETE/ERROR with counts and elapsed ms,
  ``orchestrator.py:946-990``).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from inspig_etl_spark.sources.sinks import (
    insert_if_absent,
    merge_upsert,
    merge_upsert_scoped,
    merge_upsert_versioned,
    overwrite_partitions,
    partition_predicate,
    read_or_empty,
    staged_overwrite,
)


def stream_parquet(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source stream over a parquet directory (schema required — a
    streaming source must never infer)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the late-data-safe rollup.

    The watermark bounds state: events later than it are dropped, which is
    the streaming analogue of the reference's bounded 7-day ASOS re-read
    window (beyond it, corrections are not applied).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("event_cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "event_cnt",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    delay: str = "6 hours",
) -> DataFrame:
    """Streaming dedup with WATERMARK-EVICTED state — the bounded-memory
    form of at-ingest dedup (``dropDuplicatesWithinWatermark``): a key's
    state lives only ``delay`` past its event time, so the operator's
    memory tracks the event-time window, not the corpus. A duplicate
    arriving while the key's state is live is dropped (and does NOT extend
    the state's life — measured, see stream_dedup_watermark_evict); one
    arriving after eviction is re-admitted, which is the contract's price
    for bounded state.
    """
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def foreach_batch_upsert(
    sink_path: str,
    keys: Sequence[str],
    schema: str,
    partial: bool | Sequence[str] = False,
    partition_by: Sequence[str] | None = None,
    version_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """ForeachBatch hook: MERGE each micro-batch into a keyed parquet sink.

    Deduplicates the batch per key first, then merges and writes. WITHOUT
    ``version_col`` the within-batch winner is ARBITRARY (dropDuplicates —
    a micro-batch is an unordered set, there is no "last" to prefer); when
    several versions of a key can share one batch, pass ``version_col`` so
    the greatest version deterministically wins both within the batch and
    against the sink.

    ``version_col`` names a monotonic column carried IN the rows (a batch
    number, an event version): the merge then keeps the greatest version
    per key (:func:`merge_upsert_versioned`), so the final sink state is
    independent of the order micro-batches replay in — the robust choice
    whenever the source's file ordering is environmental (coarse mtimes,
    directory re-listing). Without it, arrival order decides (plain MERGE).

    ``partition_by`` (must be ⊆ keys) selects the SCALE path: the merge
    joins only the sink partitions present in the batch
    (:func:`merge_upsert_scoped`) and the write dynamically overwrites only
    those partitions — per-batch work is O(touched partitions), never
    O(|sink|). Without it, the whole sink is re-merged and atomically
    swapped each batch — correct, but only acceptable for small dimension
    sinks. On Delta/Iceberg both paths collapse into ``MERGE INTO``.
    """
    keys = list(keys)
    if version_col is not None and partition_by:
        raise ValueError(
            "foreach_batch_upsert: version_col with partition_by is not "
            "implemented (the scoped merge would need the versioned rule too)"
        )

    def apply(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        spark = batch.sparkSession
        if version_col is not None:
            # The batch itself can hold several versions of a key (one
            # availableNow trigger may drain many source files into ONE
            # micro-batch): keep the greatest version per key — a plain
            # dropDuplicates keeps an ARBITRARY row and could silently
            # discard the newest version before the versioned merge ever
            # sees it, re-introducing the order-dependence version_col
            # exists to eliminate.
            # Tiebreak on a full-row hash so two rows carrying the SAME key
            # and SAME version still elect a deterministic winner (row_number
            # over version alone would pick whichever row the shuffle
            # delivered first — replay-order dependence through the back
            # door). Any stable total order works; xxhash64 over every
            # column is content-derived, so reruns agree.
            w = Window.partitionBy(*keys).orderBy(
                F.col(version_col).desc(),
                F.xxhash64(*[F.col(c) for c in batch.columns]).desc(),
            )
            deduped = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            deduped = batch.dropDuplicates(keys)
        state = read_or_empty(spark, sink_path, schema)
        if partition_by:
            merged = merge_upsert_scoped(
                state, deduped, keys, partition_by, partial=partial
            )
            overwrite_partitions(merged, sink_path, partition_by)
        elif version_col is not None:
            merged = merge_upsert_versioned(state, deduped, keys, version_col)
            staged_overwrite(spark, merged, sink_path)
        else:
            merged = merge_upsert(state, deduped, keys, partial=partial)
            staged_overwrite(spark, merged, sink_path)

    return apply


def start_upsert_stream(
    events: DataFrame,
    sink_path: str,
    keys: Sequence[str],
    schema: str,
    checkpoint: str,
    available_now: bool = True,
    partition_by: Sequence[str] | None = None,
    version_col: str | None = None,
    partial: bool | Sequence[str] = False,
) -> DataStreamWriter:
    """Wire a stream into the upsert sink (availableNow drains the backlog
    then stops — the cron-batch execution mode the reference uses).
    ``partition_by`` selects the partition-scoped merge path,
    ``version_col`` the order-independent versioned merge, and ``partial``
    the NVL(:new, old) column semantics (a NULL in a late correction keeps
    the sink's value — the S6-S8 weather contract) — all forwarded to
    :func:`foreach_batch_upsert`."""
    writer = (
        events.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            foreach_batch_upsert(
                sink_path,
                keys,
                schema,
                partial=partial,
                partition_by=partition_by,
                version_col=version_col,
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def layered_merge(
    target: DataFrame,
    short_term: DataFrame | None,
    observed: DataFrame | None,
    mid_term: DataFrame | None,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """ST4 precedence: short-term upsert, then observed overwrite (wins over
    forecasts), then mid-term fills only absent keys.

    ``partition_by`` (must be ⊆ keys — same staleness argument as
    :func:`~inspig_etl_spark.sources.sinks.merge_upsert_scoped`) selects the
    100 TB path: the target is pruned ONCE to the union of partitions
    present in ANY layer before the three passes, so each weather layer
    joins one day of the sink instead of re-joining the full table. The
    returned frame is then the merged content of those partitions alone —
    pair with :func:`~inspig_etl_spark.sources.sinks.overwrite_partitions`,
    exactly like :func:`foreach_batch_upsert` does. With every layer empty
    the scoped form returns an empty frame (no partitions touched).
    """
    layers = [x for x in (short_term, observed, mid_term) if x is not None]
    out = target
    if partition_by is not None:
        partition_by = list(partition_by)
        missing = [p for p in partition_by if p not in keys]
        if missing:
            raise ValueError(
                f"layered_merge: partition columns {missing} must be part of "
                f"the merge keys, else rows could move partitions and go stale"
            )
        preds = [
            p
            for p in (partition_predicate(layer, partition_by) for layer in layers)
            if p is not None
        ]
        if not preds:
            return target.filter(F.lit(False))
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
        out = target.filter(pred)
    if short_term is not None:
        out = merge_upsert(out, short_term, keys)
    if observed is not None:
        out = merge_upsert(out, observed, keys)
    if mid_term is not None:
        out = insert_if_absent(out, mid_term, keys)
    return out


def compact_ingest_ledger(log: DataFrame, frozen_max_batch: int) -> DataFrame:
    """Compact an at-ingest ledger past the out-of-order repair window
    (SCALE.md "Ledger growth & compaction" — the policy, now an operator).

    Batches ``<= frozen_max_batch`` are FINAL: their funnel rows are
    immutable (the ingest queue's lateness bound has passed — the same
    role a watermark plays for streaming state), so the only future value
    their log rows carry is what later batches' stage probes join
    against. Those probes consume exactly two views of the frozen slice
    (``queries.st_manifest._ingest_funnel_rows``):

    - the exact-dup probe: ``prior.select(fp).distinct()``;
    - the near-dup band index: the CANONICAL row per fingerprint — the
      first ``(batch, doc_id)`` — band-keyed by its MinHash signature.

    Both are functions of the canonical rows alone, so compaction keeps
    ONE canonical row per fingerprint from the frozen slice (the row the
    rank-1 window elects — kept even when its shingle set is empty, so a
    later non-empty duplicate can never be promoted into the band index
    and change a verdict) and every live row verbatim. Recounting any
    live batch from the compacted ledger is therefore EQUAL to recounting
    it from the full log — pinned by
    ``tests/test_streaming.py::test_ledger_compaction_preserves_live_funnel_rows``
    — while the frozen batches' recount ability is what is traded away.

    Scale shape: one row_number window keyed on fp over the FROZEN slice
    only (the live slice never shuffles); at 100 TB the ledger is a
    parquet table partitioned by fp bucket, so the window is
    partition-local. Reference analog: the delete-then-insert idempotent
    saver that retires superseded rows once a section is final,
    /root/reference/src/collectors/productivity.py:375-451.
    """
    from pyspark.sql.window import Window

    frozen = log.filter(F.col("batch") <= frozen_max_batch)
    live = log.filter(F.col("batch") > frozen_max_batch)
    w = Window.partitionBy("fp").orderBy("batch", "doc_id")
    canon = (
        frozen.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return canon.unionByName(live)


@dataclass
class RunManifest:
    """Master/job-log bookkeeping (ST6): one manifest per run, one entry per
    step, written as a JSON file next to the sink."""

    run_id: str
    path: str
    status: str = "RUNNING"
    started_at: float = field(default_factory=time.time)
    steps: list[dict] = field(default_factory=list)

    def record_step(self, name: str, status: str, rows: int, elapsed_ms: int) -> None:
        self.steps.append(
            {"step": name, "status": status, "rows": rows, "elapsed_ms": elapsed_ms}
        )

    def finish(self, status: str = "COMPLETE") -> None:
        self.status = status
        payload = {
            "run_id": self.run_id,
            "status": self.status,
            "elapsed_sec": round(time.time() - self.started_at, 3),
            "steps": self.steps,
        }
        d = os.path.dirname(self.path)
        if d:  # a bare relative filename has no dir to create
            os.makedirs(d, exist_ok=True)
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.path)  # atomic, like the master-row final update
