"""Cross-engine OUTPUT-TYPE gate for every oracled registry query.

Why this exists: the driver's correctness gate hashes VALUES after each
engine materializes its result (Spark collect vs DuckDB arrow). Python-level
equality (`12 == Decimal('12') == 12.0`) can mask a type split that the
driver's stringification does NOT mask — r7's only two hash-red queries
(weekly_report_sections/_summary) were exactly this: DuckDB promotes
SUM(<integer>) to HUGEINT, which reaches arrow as decimal128(38,0) while
Spark returns bigint, and a single HUGEINT union branch promotes the whole
column. The local parity harness compared equal; the driver hashed red.

The invariant enforced here is the one every driver-green query satisfies
(verified by a full sweep at r8): for each output column, the Spark type and
the DuckDB arrow type fall in the SAME family, where decimals must also
agree on scale. int width (int32 vs int64) is allowed to differ — both
stringify identically.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from inspig_etl_spark import queries as reg
from inspig_etl_spark.catalog import TABLES
from tests.conftest import SF_SMOKE


def duck_family(t) -> str:
    s = str(t)
    if s.startswith(("int", "uint")):
        return "int"
    if s in ("float", "double", "halffloat"):
        return "float"
    m = re.match(r"decimal\d*\((\d+), (\d+)\)", s)
    if m:
        return f"decimal.{m.group(2)}"
    if "string" in s:
        return "str"
    if s.startswith("date"):
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    if s == "bool":
        return "bool"
    if s.startswith(("list", "large_list", "fixed_size_list")):
        return "list"
    if s.startswith("struct"):
        return "struct"
    if s.startswith("binary") or s == "large_binary":
        return "bin"
    return s


def spark_family(s: str) -> str:
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    m = re.match(r"decimal\((\d+),(\d+)\)", s)
    if m:
        return f"decimal.{m.group(2)}"
    if s == "string":
        return "str"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    if s == "boolean":
        return "bool"
    if s.startswith("array"):
        return "list"
    if s.startswith("struct"):
        return "struct"
    if s == "binary":
        return "bin"
    return s


reg._load()
_ORACLED = sorted(n for n, q in reg.REGISTRY.items() if q.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_output_types_align_across_engines(spark, duck, name):
    q = reg.REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    sp = {f.name: spark_family(f.dataType.simpleString()) for f in df.schema.fields}
    tbl = duck.execute(q.oracle).arrow()
    du = {f.name: duck_family(f.type) for f in tbl.schema}
    assert set(sp) == set(du), f"{name}: column sets differ {sp.keys()} vs {du.keys()}"
    diffs = {c: (sp[c], du[c]) for c in sp if sp[c] != du[c]}
    assert not diffs, (
        f"{name}: output type families diverge (spark, duck): {diffs} — "
        "the driver's value hash will NOT mask this even when Python "
        "equality does (e.g. wrap integer SUMs in CAST(... AS BIGINT))"
    )
