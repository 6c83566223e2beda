"""Structured-Streaming layer (SURVEY.md §2.9 ST1-ST6).

The reference's weather pipeline is batch-cron but carries streaming
semantics: idempotent keyed upserts per micro-batch, late-data re-reads,
all-or-nothing commits, layered forecast precedence, and run manifests.
Here they are real Structured Streaming building blocks:

- incremental.py — readStream sources, watermarked windowed aggregation,
  foreachBatch MERGE into a parquet sink, layered-precedence merges, run
  manifests.
- sessionize.py — gap-based sessionization: the custom stateful operator
  (applyInPandasWithState) with a batch window-function equivalent used as
  its correctness oracle.
"""
