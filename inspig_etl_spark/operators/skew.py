"""Skew-mitigation kernels: salted joins and two-stage distinct aggregation.

At 100 TB a handful of hot keys (one viral document, one mega-farm) can put
an entire join or distinct-aggregate on a single reducer. AQE's skew-join
split handles sort-merge spills at runtime; these kernels handle the cases
AQE can't:

- :func:`salted_join` — explicit salt-replication for a hot equi-join: the
  big side gets a deterministic salt in [0, n), the small side is replicated
  n-fold with every salt value, and the join runs on (key, salt). One hot
  key's rows now land on n reducers instead of one. Result set is IDENTICAL
  to the plain join (salt is internal), so the oracle gate can check it.
- :func:`two_stage_count_distinct` — COUNT(DISTINCT x) per key without
  funneling each key's values through one reducer: stage 1 dedups on
  (key, x) — Spark partial-aggregates this map-side, so the shuffle carries
  unique pairs only — stage 2 counts rows per key. The classic skew-proof
  distinct; semantically exact, not a sketch.

The reference never needs these (single Oracle instance, ~10M-row tables,
``docs/db/ins/02_TABLE.md:704-712``), which is precisely the point: they are
what changes when the same queries must run on a 1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key rows of ``big`` spread over ``n_salts``
    reducers.

    The salt must be deterministic (a rerun must produce the same partition
    assignment for AQE retry correctness) but uncorrelated with the join
    key — we hash the big side's WHOLE ROW. The small side is exploded
    n_salts-fold, so keep it to the dimension side: the cost is
    |small| * n_salts rows shuffled, the win is no reducer ever sees more
    than ~1/n_salts of a hot key.

    Only inner/left joins are safe here (each big-side row still matches
    exactly the rows it matched before salting); right/full would multiply
    unmatched small-side rows and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    big_salted = big.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_replicated = small.withColumn(SALT, F.explode(salts))
    return big_salted.join(small_replicated, on + [SALT], how).drop(SALT)


def two_stage_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str | Column,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col), skew-proof.

    Stage 1 (dedup on key+value) partial-aggregates map-side, so a key with
    10^9 occurrences of 10^3 distinct values ships ~10^3 rows per mapper,
    not 10^9 rows to one reducer. Stage 2 is a plain count over unique rows.

    NULL-exact: the (key, NULL) row survives ``.distinct()``, but stage 2
    counts the value column itself — ``count(col)`` skips NULLs — so NULL is
    never counted as a distinct value (COUNT(DISTINCT) semantics) while a key
    whose values are ALL NULL still appears with count 0 (GROUP BY semantics;
    a NULL pre-filter would silently drop that key).
    """
    keys = list(keys)
    col = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    uniq = df.select(*keys, col.alias("__v")).distinct()
    return uniq.groupBy(*keys).agg(F.count(F.col("__v")).alias(alias))
