"""Vector similarity search over an embedding column (array<float>).

Three strategies over ``embeddings(vec_id, embedding, ...)``:

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

- **IVF-partitioned ANN** — the other classic scale path (inverted-file
  index): a fixed coarse quantizer of deterministic unit centroids assigns
  every vector to its argmax-cosine cell; queries probe only their own cell
  via an equi-join on the cell id. At 100 TB the corpus would additionally
  be WRITTEN partitioned by cell (partition pruning turns a probe into a
  single-partition scan); recall is tuned by probing the top-P cells
  instead of 1 (union of P equi-joins, still O(P x |corpus|/cells)).

No Python UDFs: the fold runs in whole-stage codegen. For very high dims a
vectorized Pandas-UDF dot product can win — measure before switching.
"""

from __future__ import annotations

import hashlib
import math

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


def ivf_centroids(cells: int, dim: int, seed: str = "c") -> list[list[float]]:
    """Deterministic unit-norm centroids from md5(cell_dim) draws in [-1, 1].

    A real deployment would k-means these on a sample; for an
    oracle-checkable IVF the coarse quantizer just has to be a FIXED set of
    unit vectors shared by both engines, so they are derived (like the LSH
    hyperplanes) from md5 parity and embedded as literals on both sides.
    ``seed`` namespaces independent banks (the two-level SemDeDup quantizer
    needs a fine bank decorrelated from the coarse one).
    """
    cents = []
    for c in range(cells):
        raw = [
            (int(hashlib.md5(f"{seed}{c}_d{d}".encode()).hexdigest()[:15], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dim)
        ]
        nrm = math.sqrt(sum(x * x for x in raw))
        cents.append([x / nrm for x in raw])
    return cents


def pq_codebooks(m: int, k: int, dsub: int, seed: str = "pq") -> list[list[list[int]]]:
    """Deterministic integer PQ codebooks: ``m`` subspace books of ``k``
    centroids over ``dsub`` dims, entries md5-drawn in [-127, 127] — the
    same value space as SQ8-quantized vectors, so encode distances and ADC
    lookup scores are exact BIGINT arithmetic on both engines.

    Like :func:`ivf_centroids`, this is pure shared data: a production
    deployment trains each book with the adjacent Lloyd kernel
    (``operators/clustering.py``) on a corpus sample; the oracle contract
    only needs a FIXED codebook embedded as literals on both sides.
    """
    return [
        [
            [
                int(hashlib.md5(f"{seed}{mm}_{kk}_{dd}".encode()).hexdigest()[:15], 16)
                % 255
                - 127
                for dd in range(dsub)
            ]
            for kk in range(k)
        ]
        for mm in range(m)
    ]


def with_ivf_cell(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    out_col: str = "cell",
) -> DataFrame:
    """Add the coarse-quantizer cell id: argmax dot(vec, unit centroid).

    Centroids are unit vectors, so argmax dot == argmax cosine (the vector's
    own norm is a common positive factor); ties break to the lowest index
    (``array_position`` returns the FIRST index of the max).

    The per-centroid score array is computed by the Arrow-batched kernel
    (``operators/vector_kernels.with_vector_features`` — bit-identical
    sequential-in-dimension numpy fold, r16 optimization round): the prior
    JVM form — one nested array<array<double>> literal folded by a
    ``transform`` — carried |cells| x dim literal nodes through Catalyst
    analysis on EVERY consumer branch (measured 2–12 s of driver time per
    query build) and executed the fold on the interpreted expression path.
    The argmax/tie/NULL semantics stay in the JVM expressions below,
    unchanged.
    """
    from inspig_etl_spark.operators.vector_kernels import with_vector_features

    df = with_vector_features(df, vec_col, banks={"__ivf_scores": centroids})
    return df.withColumn(
        out_col,
        (
            F.array_position(F.col("__ivf_scores"), F.array_max(F.col("__ivf_scores")))
            - 1
        ).cast("int"),
    ).drop("__ivf_scores")


def sql_centroid(cent: list[float]) -> str:
    """DuckDB list literal for one centroid, full-precision floats."""
    return "[" + ", ".join(repr(x) for x in cent) + "]"


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

    The pair dot stays the HOF ``dot`` fold: a statically unrolled
    ``vector_kernels.dot_unrolled`` form was TRIED in the r16 optimization
    round and measured ~30% slower on the IVF cell join (64 per-pair F.get
    extractions with bounds/null checks lose to the fold's single array
    traversal; OPTIMIZATION_r16.md).
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
    # nullif zero-norm guard: an all-zeros embedding (failed/padded encode)
    # has norm 0, and under Spark 4's default ANSI mode a plain division
    # would throw DIVIDE_BY_ZERO and kill the job — same guard shape as
    # jaccard_verify's nullif(union, 0). NULL sim ranks last (desc order).
    sim = dot(F.col(vec_q), F.col(vec_c)) / F.nullif(
        F.col("__qn") * F.col("__cn"), F.lit(0.0)
    )
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
