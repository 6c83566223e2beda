"""Probe-coverage accounting gate (VERDICT r15 item 3).

Every registered query must be measured or deliberately not measured:
either a bench headline row (in-session baseline comparison), a 10x
scale-probe row (paired small/big ratio), or a NAMED exclusion in
tools/scale_probe.py:EXCLUDED whose reason follows the documented grammar
and whose referenced sibling/baseline row is itself measured. A new
registration without one of the three fails here until it is probed or
explicitly excluded — "covered everything" can no longer silently mean
"forgot to measure it".
"""

import importlib.util
import os
import re
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _load(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_probe(monkeypatch):
    # The probe module applies SPARK_GRAFT_PROBE_ONLY at import; the gate
    # is defined over the FULL table.
    monkeypatch.delenv("SPARK_GRAFT_PROBE_ONLY", raising=False)
    return _load(_REPO / "tools" / "scale_probe.py", "scale_probe_gate")


def test_every_registered_query_is_benched_probed_or_excluded(monkeypatch):
    from inspig_etl_spark import queries as reg

    bench = _load(_REPO / "bench.py", "bench_gate")
    probe = _load_probe(monkeypatch)
    reg._load()

    registered = set(reg.REGISTRY)
    covered = set(bench.HEADLINE) | set(probe.NAMES)
    excluded = set(probe.EXCLUDED)

    uncovered = registered - covered - excluded
    assert not uncovered, (
        "registered queries with neither a bench row, a probe row, nor a "
        f"named exclusion: {sorted(uncovered)}"
    )

    # An exclusion for a measured (or unregistered) name is stale noise.
    assert not (excluded & covered), sorted(excluded & covered)
    assert excluded <= registered, sorted(excluded - registered)


def test_exclusion_reasons_follow_the_grammar_and_point_at_measured_rows(
    monkeypatch,
):
    from inspig_etl_spark import queries as reg

    bench = _load(_REPO / "bench.py", "bench_gate2")
    probe = _load_probe(monkeypatch)
    reg._load()

    covered = set(bench.HEADLINE) | set(probe.NAMES)
    grammar = re.compile(
        r"^(sibling:[a-z0-9_]+|subset:[a-z0-9_]+|expr-only|bounded-input"
        r"|stream-lifecycle|declared-baseline:[a-z0-9_]+)$"
    )
    for name, reason in probe.EXCLUDED.items():
        assert grammar.match(reason), f"{name}: unparseable reason {reason!r}"
        if ":" in reason:
            kind, target = reason.split(":", 1)
            if kind in ("sibling", "subset"):
                # The covering row must itself be measured, or the
                # exclusion is circular.
                assert target in covered, f"{name} -> unmeasured {target}"
            else:  # declared-baseline: the scale path must be registered
                assert target in reg.REGISTRY, f"{name} -> unknown {target}"


def test_probe_names_and_headline_are_registered(monkeypatch):
    """A renamed/retired query must leave the measurement lists too —
    otherwise the probe silently skips it (run() guards `n not in qmap`)
    and the accounting above counts a ghost as covered."""
    from inspig_etl_spark import queries as reg

    bench = _load(_REPO / "bench.py", "bench_gate3")
    probe = _load_probe(monkeypatch)
    reg._load()

    registered = set(reg.REGISTRY)
    assert set(probe.NAMES) <= registered, sorted(set(probe.NAMES) - registered)
    assert set(bench.HEADLINE) <= registered, sorted(
        set(bench.HEADLINE) - registered
    )
