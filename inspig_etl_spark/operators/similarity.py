"""Vector similarity search over an embedding column (array<float>).

Two strategies over ``embeddings(vec_id, embedding, ...)``:

- **Brute-force cosine top-k** — the correctness baseline. The (small) query
  set is broadcast against the corpus; the dot product is a per-row
  ``zip_with``/``aggregate`` fold (sequential, hence bit-deterministic and
  oracle-matchable), and top-k is a window over the query id. Cost is
  O(|queries| x |corpus| x dim) — fine for a probe set, NOT the scale path.

- **LSH-bucketed ANN** — the 100 TB path. Random-hyperplane signs are
  deterministic md5-derived +-1 literals (generated driver-side, embedded in
  both the Spark plan and the oracle SQL), so each vector gets a stable
  bucket id; candidates only form inside a bucket via an ordinary equi-join.
  Shuffle is O(|corpus|), never O(|corpus|^2). Recall is tunable with
  ``planes`` (fewer planes → bigger buckets → higher recall, more work).

No Python UDFs: the fold runs in whole-stage codegen. For very high dims a
vectorized Pandas-UDF dot product can win — measure before switching.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hyperplane_signs(planes: int, dim: int) -> list[list[int]]:
    """Deterministic +-1 hyperplane matrix from md5(plane_dim) parity.

    Pure data (not engine code): the same literals are embedded in the Spark
    expression and the DuckDB oracle, so bucket ids agree bit-for-bit.
    """
    return [
        [
            1 if int(hashlib.md5(f"p{p}_d{d}".encode()).hexdigest()[:15], 16) % 2 else -1
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def dot(a: Column, b: Column) -> Column:
    """Sequential double fold — deterministic, matches DuckDB list_reduce."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def lsh_bucket(vec: Column, signs: list[list[int]]) -> Column:
    """Sign-bit bucket id: bit p set iff dot(vec, plane_p) > 0."""
    out = F.lit(0).cast("bigint")
    for p, plane in enumerate(signs):
        lit = F.array(*[F.lit(float(s)) for s in plane])
        out = out + F.when(dot(vec, lit) > 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def sql_lsh_bucket(vec: str, signs: list[list[int]]) -> str:
    terms = []
    for p, plane in enumerate(signs):
        lit = "[" + ", ".join(f"{float(s)}" for s in plane) + "]"
        terms.append(f"(CASE WHEN {sql_dot(vec, lit)} > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    vec_q: str = "q_vec",
    vec_c: str = "c_vec",
    join_on: list[str] | None = None,
    sim_scale: int = 6,
) -> DataFrame:
    """Top-k cosine neighbors per query (self-match excluded).

    ``join_on`` restricts the pairing (e.g. a shared LSH bucket column) —
    None means brute force with the query side broadcast.
    """
    # Precompute each side's norm ONCE (O(n x dim)) instead of per pair
    # (O(n^2 x dim)) — at 100 TB this is the difference between one corpus
    # pass and re-folding every vector |queries| times.
    queries = queries.withColumn("__qn", norm(F.col(vec_q)))
    corpus = corpus.withColumn("__cn", norm(F.col(vec_c)))
    if join_on:
        paired = queries.join(corpus, join_on)
    else:
        paired = F.broadcast(queries).crossJoin(corpus)
    paired = paired.filter(F.col(query_id) != F.col(corpus_id))
    sim = dot(F.col(vec_q), F.col(vec_c)) / (F.col("__qn") * F.col("__cn"))
    scored = paired.withColumn("__sim", sim)
    # Rank on the unrounded (bit-deterministic) sim; id tiebreak makes the
    # ordering total. Window partitions by query id — bounded groups.
    w = Window.partitionBy(query_id).orderBy(F.col("__sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            "rank",
            F.round(F.col("__sim"), sim_scale).alias("cosine_sim"),
        )
    )
