"""Physical-plan linter: mechanical checks for 100 TB anti-patterns.

Correctness gates prove a query RIGHT at sf0.01; this gate proves the PLAN
survives a 1000x scale-up. ``lint_plan`` inspects the optimized/physical
plan strings Spark already exposes and flags:

- ``cartesian``        CartesianProduct — all-pairs blowup.
- ``nested-loop``      BroadcastNestedLoopJoin — per-row predicate scan; only
                       acceptable when one side is provably tiny AND the
                       query declares it (allowlist).
- ``python-udf``       row-at-a-time Python UDF (BatchEvalPython) in the hot
                       path; Arrow-batched pandas UDFs (ArrowEvalPython) pass.
- ``global-window``    a window function with an empty partition spec — every
                       row funnels through ONE task at any scale.
- ``single-partition`` an Exchange SinglePartition feeding anything but a
                       final global scalar aggregate (HashAggregate /
                       SortAggregate / ObjectHashAggregate over partial-agg
                       input) or a bounded top-k parent
                       (TakeOrderedAndProject / GlobalLimit).
- ``collect-limit``    a CollectLimit whose row bound exceeds
                       ``collect_limit_bound`` — limit() funnels the kept
                       rows through ONE task, so a "bounded" result that is
                       really table-sized is a single-task bottleneck (and a
                       driver OOM when collected) at any scale.

Every query in the registry runs through this in tests/test_plan_lint.py;
intentional exceptions must be declared per-query with a reason, so a new
anti-pattern can never land silently.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    code: str
    detail: str

    def __str__(self) -> str:  # pragma: no cover - repr convenience
        return f"[{self.code}] {self.detail}"


def _plan_strings(df: DataFrame) -> tuple[str, str]:
    qe = df._jdf.queryExecution()
    return str(qe.optimizedPlan()), str(qe.executedPlan())


_COLLECT_LIMIT = re.compile(r"CollectLimit (\d+)")

# Default CollectLimit bound: generous enough for every legitimate report
# slice in the registry (the largest is chunked pagination over a few
# hundred report rows), far below anything table-sized. A query that
# genuinely needs a bigger bounded head declares it in the lint test's
# ALLOWED map like every other exception.
COLLECT_LIMIT_BOUND = 100_000


def lint_plan(
    df: DataFrame, collect_limit_bound: int = COLLECT_LIMIT_BOUND
) -> list[Finding]:
    """Return scale-safety findings for a DataFrame's query plan."""
    optimized, physical = _plan_strings(df)
    findings: list[Finding] = []

    # limit(n) plans as CollectLimit: the kept rows funnel through one
    # task. Small report heads are fine; a "limit" sized like the table
    # is a hidden single-task bottleneck (VERDICT r15 item 7c).
    for m in _COLLECT_LIMIT.finditer(physical):
        n = int(m.group(1))
        if n > collect_limit_bound:
            findings.append(
                Finding(
                    "collect-limit",
                    f"CollectLimit {n} exceeds bound {collect_limit_bound}",
                )
            )

    if "CartesianProduct" in physical:
        findings.append(Finding("cartesian", "CartesianProduct in physical plan"))

    if "BroadcastNestedLoopJoin" in physical:
        findings.append(
            Finding("nested-loop", "BroadcastNestedLoopJoin in physical plan")
        )

    # Row-at-a-time Python UDF. Arrow-batched variants show as
    # ArrowEvalPython / FlatMapGroupsInPandas etc. and are acceptable.
    if "BatchEvalPython" in physical:
        findings.append(
            Finding("python-udf", "row-at-a-time Python UDF (BatchEvalPython)")
        )

    # Window with empty partition spec renders in the optimized plan with
    # fewer bracket groups: full form is `Window [exprs], [partition],
    # [order]`. Two groups is AMBIGUOUS — partition-only (`[exprs], [part]`,
    # scale-safe) and order-only (`[exprs], [order]`, global) both render
    # that way — so disambiguate by the sort-direction markers only an
    # ordering spec carries.
    _ORDER_MARK = re.compile(r"\b(?:ASC|DESC) NULLS (?:FIRST|LAST)\b")
    for line in optimized.splitlines():
        s = line.strip()
        if s.startswith("Window "):
            groups = re.findall(r"\[[^\[\]]*\]", s)
            if len(groups) == 1 or (
                len(groups) == 2 and _ORDER_MARK.search(groups[1])
            ):
                findings.append(
                    Finding("global-window", f"window with no PARTITION BY: {s[:120]}")
                )

    # A SinglePartition exchange pins the job on one task — EXCEPT when its
    # parent is the final step of a global scalar aggregate: partial
    # aggregation upstream means the exchange carries one row per partition,
    # bounded at any data size. Walk the plan tree by indentation to find
    # each exchange's parent operator.
    lines = physical.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        depth = len(line) - len(line.lstrip(" +-:"))
        parent = ""
        for j in range(i - 1, -1, -1):
            pdepth = len(lines[j]) - len(lines[j].lstrip(" +-:"))
            if pdepth < depth:
                parent = lines[j].strip(" +-:")
                break
        if any(a in parent for a in ("HashAggregate", "SortAggregate", "ObjectHashAggregate")):
            continue  # global scalar agg: input already partial-aggregated
        if "TakeOrderedAndProject" in parent or "GlobalLimit" in parent:
            continue  # bounded top-k
        findings.append(
            Finding(
                "single-partition",
                f"Exchange SinglePartition feeding {parent[:80] or 'root'}",
            )
        )

    return findings
