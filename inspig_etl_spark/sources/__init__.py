"""Source/sink layer: MERGE-style upserts and idempotent parquet writes
(SURVEY.md §2.1 S6-S14, §2.9 ST3)."""
