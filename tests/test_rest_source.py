"""ST5/S3-S5 tests: key rotation semantics and the fetch loop, with a fake
transport (no network).
"""

from __future__ import annotations

import pytest

from inspig_etl_spark.sources.rest import (
    ApiKeyManager,
    ApiKeysExhausted,
    RestSource,
    to_dataframe,
)


def test_key_manager_least_used_first():
    km = ApiKeyManager(keys=["a", "b", "c"])
    assert km.acquire() == "a"
    assert km.acquire() == "b"
    assert km.acquire() == "c"
    assert km.acquire() == "a"  # wraps to least-used again
    assert km.req_cnt == {"a": 2, "b": 1, "c": 1}


def test_key_manager_exhaustion_signals():
    km = ApiKeyManager(keys=["a", "b"])
    assert km.report("a", 429) is True  # rate limit exhausts
    assert km.report("b", 200, provider_code="22") is True  # provider code
    with pytest.raises(ApiKeysExhausted):
        km.acquire()


def test_rest_source_rotates_on_auth_failure():
    km = ApiKeyManager(keys=["dead", "live"])
    calls = []

    def transport(url, params):
        calls.append(params["serviceKey"])
        if params["serviceKey"] == "dead":
            return 403, {}
        return 200, {
            "response": {"body": {"items": {"item": [{"nx": 1, "ny": 2, "t1h": "3.5"}]}}}
        }

    src = RestSource("http://api.example/forecast", km, transport)
    records = src.fetch({"base_date": "20240101"})
    assert calls == ["dead", "live"]
    assert records == [{"nx": 1, "ny": 2, "t1h": "3.5"}]
    assert "dead" in km.exhausted


def test_rest_source_raises_when_pool_dies():
    km = ApiKeyManager(keys=["k1", "k2"])
    src = RestSource("http://api.example", km, lambda u, p: (401, {}))
    with pytest.raises(ApiKeysExhausted):
        src.fetch({})


def test_rest_source_single_item_envelope_and_landing(spark):
    km = ApiKeyManager(keys=["k"])
    src = RestSource(
        "http://api.example",
        km,
        lambda u, p: (200, {"response": {"body": {"items": {"item": {"nx": 9, "ny": 8, "t1h": "x"}}}}}),
    )
    records = src.fetch({})
    df = to_dataframe(spark, records, "nx INT, ny INT, t1h STRING")
    rows = df.collect()
    assert [(r.nx, r.ny, r.t1h) for r in rows] == [(9, 8, "x")]


def test_to_dataframe_handles_comma_bearing_ddl_types(spark):
    """Column names must come from a real DDL parse — DECIMAL(10,2) and map
    types contain commas that a split(',') mangles into bogus columns."""
    from decimal import Decimal

    records = [{"id": 1, "amount": Decimal("12.34"), "tags": {"a": 1}}]
    df = to_dataframe(
        spark, records, "id INT, amount DECIMAL(10,2), tags MAP<STRING,INT>"
    )
    assert df.columns == ["id", "amount", "tags"]
    r = df.collect()[0]
    assert (r.id, r.amount, dict(r.tags)) == (1, Decimal("12.34"), {"a": 1})
