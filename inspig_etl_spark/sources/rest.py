"""REST ingestion skeleton (SURVEY.md §2.1 S3/S4/S5, §2.9 ST5).

The reference's collectors pull KMA weather and a legacy stats API over
HTTP with a rotating API-key pool, then land rows through the MERGE sinks.
Ingestion is DRIVER-side work (HTTP is not a distributed expression); what
belongs to the engine — and is implemented and tested here, with the
transport injected so no network is required — is:

- :class:`ApiKeyManager` — ST5 verbatim semantics: pick the least-used
  live key, count requests, mark keys exhausted on auth/rate-limit
  signals (HTTP 401/403/429 or provider codes 22/99), raise when the pool
  is dry (``/root/reference/src/common/api_key_manager.py:36-196``).
- :class:`RestSource` — the fetch loop shared by all five collectors
  (``src/collectors/weather.py:666-739`` etc.): key rotation with retry,
  page-size parameter, JSON envelope unwrapping, error-code detection.
- :func:`to_dataframe` — land parsed records as an explicit-schema
  DataFrame ready for the §S6-S10 sinks.

A production deployment points ``transport`` at ``requests.get``; tests
point it at a fake. Collector parallelism (the reference's 4-thread pool)
maps to a plain thread pool over grid cells — still driver-side, unchanged.
"""

from __future__ import annotations

import threading
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType, _parse_datatype_string

# Signals that exhaust a key (reference: HTTP statuses + provider codes).
EXHAUST_HTTP = frozenset({401, 403, 429})
EXHAUST_CODES = frozenset({"22", "99"})


class ApiKeysExhausted(RuntimeError):
    pass


@dataclass
class ApiKeyManager:
    """Least-used-first key pool with exhaustion tracking (ST5)."""

    keys: Sequence[str]
    req_cnt: dict[str, int] = field(default_factory=dict)
    exhausted: set[str] = field(default_factory=set)
    # The reference shares one pool across a 4-thread collector pool; the
    # lock keeps the least-used invariant and the request counts exact
    # under that documented concurrency (a lost += or a double-picked key
    # otherwise slips in silently).
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def __post_init__(self) -> None:
        for k in self.keys:
            self.req_cnt.setdefault(k, 0)

    def acquire(self) -> str:
        with self._lock:
            live = [k for k in self.keys if k not in self.exhausted]
            if not live:
                raise ApiKeysExhausted(f"all {len(self.keys)} API keys exhausted")
            key = min(live, key=lambda k: (self.req_cnt[k], self.keys.index(k)))
            self.req_cnt[key] += 1
            return key

    def mark_exhausted(self, key: str) -> None:
        with self._lock:
            self.exhausted.add(key)

    def report(self, key: str, http_status: int, provider_code: str | None = None) -> bool:
        """Record a response; returns True if the key was exhausted by it."""
        if http_status in EXHAUST_HTTP or (provider_code in EXHAUST_CODES):
            self.mark_exhausted(key)
            return True
        return False


Transport = Callable[[str, dict], tuple[int, dict]]
"""(url, params) -> (http_status, json_body)."""


@dataclass
class RestSource:
    """Key-rotating fetch loop with bounded retries (S3/S4/S5 shape)."""

    base_url: str
    key_manager: ApiKeyManager
    transport: Transport
    page_size: int = 1000
    max_attempts: int = 4

    def fetch(self, params: dict) -> list[dict]:
        """Fetch one logical page-set; rotate keys on exhaustion signals.

        Raises ApiKeysExhausted when every key dies, re-raises the last
        non-auth error after max_attempts (transient failures are the
        caller's retry/cron concern, like the reference's tolerated step
        errors).
        """
        last_err: Exception | None = None
        attempts = 0
        while attempts < self.max_attempts:
            key = self.key_manager.acquire()  # raises once the pool is dry
            status, body = self.transport(
                self.base_url, {**params, "serviceKey": key, "numOfRows": self.page_size}
            )
            if self.key_manager.report(key, status, self._result_code(body)):
                # Rotation after an exhaustion signal is FREE: it is bounded
                # by the pool size through acquire(), so it must not consume
                # the transient-retry budget — else a pool larger than
                # max_attempts would raise while live keys were never tried.
                continue
            if status != 200:
                attempts += 1
                last_err = RuntimeError(f"HTTP {status} from {self.base_url}")
                continue
            return self._unwrap(body)
        if last_err is not None:
            raise last_err
        raise ApiKeysExhausted("no usable key produced a response")

    @staticmethod
    def _result_code(body: object) -> str:
        """Provider result code — top-level, or the KMA envelope's
        ``response.header.resultCode`` (the same envelope ``_unwrap`` reads:
        a rate-limited key answers HTTP 200 with code 22/99 in the HEADER,
        so reading only the top level would never exhaust a dead key)."""
        if not isinstance(body, dict):
            return "00"
        if "resultCode" in body:
            return str(body["resultCode"])
        header = body.get("response", {}).get("header", {})
        return str(header.get("resultCode", "00"))

    @staticmethod
    def _unwrap(body: dict) -> list[dict]:
        """KMA-style envelope: response.body.items.item -> list of records."""
        items = (
            body.get("response", {}).get("body", {}).get("items", {}).get("item", [])
        )
        if isinstance(items, dict):
            items = [items]
        return list(items)


def to_dataframe(
    spark: SparkSession, records: list[dict], schema: str | StructType
) -> DataFrame:
    """Land parsed records with an EXPLICIT schema (never inference — the
    API's stringly-typed payloads go through X18 try-casts downstream).

    The DDL string is parsed properly (not comma-split), so types whose
    spelling contains commas — ``DECIMAL(10,2)``, ``MAP<STRING,INT>``,
    nested structs — yield the right column names.
    """
    struct = _parse_datatype_string(schema) if isinstance(schema, str) else schema
    rows = [tuple(r.get(f.name) for f in struct.fields) for r in records]
    return spark.createDataFrame(rows, struct)
