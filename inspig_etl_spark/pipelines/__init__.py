"""Composed report pipelines: the reference's per-farm processor fan-out
re-expressed as single all-farms DataFrame plans (SURVEY.md §3.1, §7.1)."""
