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


def test_exhaustion_code_read_from_kma_header_envelope():
    """Regression: a rate-limited KMA key answers HTTP 200 with resultCode
    22/99 nested in response.header — reading only the top level never
    exhausted the key, which then kept winning least-used selection."""
    from inspig_etl_spark.sources.rest import ApiKeyManager, RestSource

    dead_body = {"response": {"header": {"resultCode": "22"}, "body": {}}}
    live_body = {"response": {"header": {"resultCode": "00"},
                              "body": {"items": {"item": [{"v": 1}]}}}}

    def transport(url, params):
        return 200, (dead_body if params["serviceKey"] == "k1" else live_body)

    mgr = ApiKeyManager(keys=["k1", "k2"])
    src = RestSource(base_url="http://x", key_manager=mgr, transport=transport)
    assert src.fetch({}) == [{"v": 1}]
    assert "k1" in mgr.exhausted


def test_rotation_on_exhaustion_does_not_burn_retry_budget():
    """Regression: with a pool larger than max_attempts, rotating past dead
    keys consumed the retry budget and raised while live keys were never
    tried."""
    from inspig_etl_spark.sources.rest import ApiKeyManager, RestSource

    dead = {"response": {"header": {"resultCode": "99"}, "body": {}}}
    live = {"response": {"body": {"items": {"item": [{"v": 7}]}}}}
    calls = []

    def transport(url, params):
        calls.append(params["serviceKey"])
        return 200, (live if params["serviceKey"] == "k5" else dead)

    mgr = ApiKeyManager(keys=[f"k{i}" for i in range(1, 6)])
    src = RestSource(base_url="http://x", key_manager=mgr, transport=transport,
                     max_attempts=2)
    assert src.fetch({}) == [{"v": 7}]  # k1-k4 rotate free, k5 answers
    assert calls == ["k1", "k2", "k3", "k4", "k5"]


def test_key_manager_is_thread_safe_under_concurrent_acquire():
    import threading

    from inspig_etl_spark.sources.rest import ApiKeyManager

    mgr = ApiKeyManager(keys=["a", "b", "c", "d"])

    def worker():
        for _ in range(250):
            mgr.acquire()

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # No lost increments: counts must sum exactly, spread evenly (least-used).
    assert sum(mgr.req_cnt.values()) == 8 * 250
    assert all(v == 500 for v in mgr.req_cnt.values())
