"""Distributed k-means (Lloyd) over an embedding column — the clustering
kernel behind semantic dedup / corpus bucketing in an LLM data pipeline
(SemDeDup, Abbas et al. 2023 prunes within k-means cells; MLlib's KMeans is
the classic Spark shape: per-iteration the corpus is scanned once, partial
sums reduce map-side, and only the k x dim centroid table ever reaches the
driver).

Why this is oracle-checkable (bit-exact vs DuckDB) when float k-means never
is: every data-dependent quantity is forced through EXACT integer
arithmetic —

- vectors are clamped to [-1000, 1000] and quantized to integer MICRO units
  (``floor(x * 1e6)`` as BIGINT), so per-cell sums are exact, overflow-safe
  and order-independent under ANY partitioning/shuffle order;
- the centroid update is integer floor-division of those sums (driver-side
  ``s // n``; in SQL ``(s - ((s % n) + n) % n) // n`` — the same floor for
  negative sums, since both engines' ``%`` truncates toward zero);
- the assignment score ``2e6 * dot(v, m) - |m|^2`` (argmax == argmin
  Euclidean distance, with the vector's own norm dropped as a common term)
  is a sequential double fold over those exact integers, so both engines
  execute the identical IEEE op sequence; ties break to the lowest cell id.

Scale shape (100 TB): each iteration is ONE corpus scan + ONE partially
aggregated groupBy(cell) producing <= k rows of dim sums — the shuffle
carries k x dim integers per map task, the driver holds k x dim ints
(MLlib's exact contract), and the assignment expression is whole-stage
codegen over broadcast literal centroids. Empty cells die (the standard
Lloyd variant that needs no re-seeding RNG).

Reference parity note: the reference has no clustering engine — this is
part of the brief-mandated LLM-pipeline extension (dedup/similarity
family, alongside operators/dedup.py and operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inspig_etl_spark.operators.similarity import dot

MICRO = 1_000_000
CLAMP = 1000.0


def quantize_micro(x: Column) -> Column:
    """Exact micro-unit quantization: clamp to +-CLAMP then floor(x * 1e6).

    The clamp bounds per-cell BIGINT sums (|q| <= 1e9, so ~9e9 rows per cell
    before overflow) and maps NaN to +CLAMP identically on both engines
    (greatest/least treat NaN as the largest double in Spark AND DuckDB).
    """
    d = x.cast("double")
    clamped = F.least(F.greatest(d, F.lit(-CLAMP)), F.lit(CLAMP))
    return F.floor(clamped * F.lit(float(MICRO))).cast("bigint")


def sql_quantize_micro(expr: str) -> str:
    return (
        f"CAST(FLOOR(LEAST(GREATEST(CAST({expr} AS DOUBLE), -{CLAMP}), {CLAMP})"
        f" * {float(MICRO)}) AS BIGINT)"
    )


def seed_micro_centroids(unit_centroids: list[list[float]]) -> list[list[int]]:
    """Quantize float seed centroids into the micro-integer domain the loop
    runs in (Python floor matches the SQL/Spark floor for these literals)."""
    import math

    return [
        [int(math.floor(max(-CLAMP, min(CLAMP, x)) * MICRO)) for x in c]
        for c in unit_centroids
    ]


def _score_structs(cents: list[tuple[int, list[int]]]) -> Column:
    """array<struct<cell, m, n2>> literal — ONE expression node regardless of
    k (the per-column form triggers the Catalyst re-analysis blowup noted on
    with_ivf_cell)."""
    return F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(float(v)) for v in m]).alias("m"),
                F.lit(float(sum(v * v for v in m))).alias("n2"),
            )
            for cell, m in cents
        ]
    )


def assign_cells(
    df: DataFrame, vec_col: str, cents: list[tuple[int, list[int]]], out_col: str = "cell"
) -> DataFrame:
    """Nearest-centroid assignment against micro-integer centroid literals.

    score_c = 2e6 * dot(v, m_c) - |m_c|^2  (== -1e12 * squared distance up to
    the common |v|^2 term); argmax, first-max tie-break == (score DESC,
    cell ASC) rank 1, which is exactly the oracle's window formulation.
    """
    structs = _score_structs(cents)
    scores = F.transform(
        structs, lambda s: F.lit(2.0 * MICRO) * dot(F.col(vec_col), s["m"]) - s["n2"]
    )
    cells = F.array(*[F.lit(cell) for cell, _ in cents])
    df = df.withColumn("__km_scores", scores)
    return (
        df.withColumn(
            out_col,
            F.element_at(
                cells,
                F.array_position(
                    F.col("__km_scores"), F.array_max(F.col("__km_scores"))
                ).cast("int"),
            ),
        )
        .withColumn("__km_best", F.array_max(F.col("__km_scores")))
        .drop("__km_scores")
    )


def lloyd_update(
    df: DataFrame, vec_col: str, dim: int, cents: list[tuple[int, list[int]]]
) -> list[tuple[int, list[int]]]:
    """One Lloyd step: assign, then reduce per-cell integer dim-sums.

    The groupBy(cell) partial-aggregates map-side; only <= k rows of
    (count, dim sums) are collected — the bounded driver-side footprint
    MLlib's KMeans also accepts. Centroid update is exact integer floor
    division; empty cells drop out.
    """
    assigned = assign_cells(df, vec_col, cents)
    # The loop input carries __km_qv (the micro-quantized vector, computed
    # ONCE before the loop — r16): summing its elements directly keeps the
    # clamp/floor work out of every round's 'dim' aggregate expressions
    # (one quantization pass total instead of one per Lloyd round, and a
    # much smaller per-round plan for Catalyst to analyze).
    qv = "__km_qv" in df.columns
    sums = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            (
                F.sum(F.col("__km_qv").getItem(d))
                if qv
                else F.sum(quantize_micro(F.col(vec_col).getItem(d)))
            ).alias(f"s{d}")
            for d in range(dim)
        ],
    )
    rows = sums.collect()  # bounded by k (cluster count), never by |corpus|
    new: list[tuple[int, list[int]]] = []
    for r in sorted(rows, key=lambda r: r["cell"]):
        n = r["n"]
        new.append((r["cell"], [r[f"s{d}"] // n for d in range(dim)]))
    return new


def kmeans_fit_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    seeds: list[list[int]],
    updates: int,
) -> DataFrame:
    """Run ``updates`` Lloyd steps from integer seed centroids, then emit the
    final assignment: (id, cluster, cluster_size, score_e6).

    score_e6 = floor(best_score / 1e6) — fixed-point, not ROUND(double): a
    per-row double ROUND is the known Spark-HALF_UP vs DuckDB-HALF_EVEN
    divergence (see docs_token_stats), while FLOOR of the identical fold is
    bit-stable.

    The (id, vector) projection is persisted across the loop (r16): every
    Lloyd step re-scans the input — ``updates`` eager reduce jobs plus the
    final assignment — and caching the two needed columns turns those into
    memory reads (MLlib's KMeans caches its input the same way; default
    MEMORY_AND_DISK spills gracefully when a 100 TB corpus outgrows RAM).
    clearCache() after the action is the session-level unpersist.
    """
    df = (
        df.select(id_col, vec_col)
        .withColumn("__km_qv", F.transform(F.col(vec_col), quantize_micro))
        .persist()
    )
    cents = [(i, m) for i, m in enumerate(seeds)]
    # Pin the loop confs the way connected_components does (r16): each
    # Lloyd round is ONE fixed-shape partial-aggregated reduce whose output
    # is <= k rows, so AQE's per-stage re-planning jobs buy nothing, and
    # the session's corpus-sized shuffle partitioning is pure scheduling
    # overhead for a <= k-row exchange (the map-side combine already
    # collapses every partition to <= k rows, so a handful of reduce
    # partitions is safe at ANY corpus size — MLlib's reduce is the same
    # shape). Saved/restored around the loop; the FINAL assignment plan is
    # built after restore, so the returned frame plans under session confs.
    spark = df.sparkSession
    aqe_key = "spark.sql.adaptive.enabled"
    shuf_key = "spark.sql.shuffle.partitions"
    from inspig_etl_spark.operators.dedup import _CC_CONF_LOCK

    _CC_CONF_LOCK.acquire()
    aqe_was = spark.conf.get(aqe_key, "true")
    shuf_was = int(spark.conf.get(shuf_key, "200"))
    spark.conf.set(aqe_key, "false")
    spark.conf.set(shuf_key, str(max(1, min(shuf_was, len(seeds)))))
    try:
        for _ in range(updates):
            cents = lloyd_update(df, vec_col, dim, cents)
            if not cents:
                break
    finally:
        spark.conf.set(aqe_key, aqe_was)
        spark.conf.set(shuf_key, str(shuf_was))
        _CC_CONF_LOCK.release()
    if not cents:  # empty corpus: every cell died
        return (
            df.filter(F.lit(False))
            .select(
                F.col(id_col),
                F.lit(0).alias("cluster"),
                F.lit(0).cast("bigint").alias("cluster_size"),
                F.lit(0).cast("bigint").alias("score_e6"),
            )
        )
    out = assign_cells(df, vec_col, cents, out_col="cluster")
    w = Window.partitionBy("cluster")
    return out.select(
        id_col,
        "cluster",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        F.floor(F.col("__km_best") / F.lit(float(MICRO))).cast("bigint").alias(
            "score_e6"
        ),
    )


# ---------------------------------------------------------------------------
# Oracle-SQL twin (DuckDB). Same arithmetic, different formulation: the
# centroid tables are data-dependent, so each iteration is an unrolled CTE
# pair (assignment via CROSS JOIN + rank-1 window; update via per-dim exact
# integer sums and floor division).
# ---------------------------------------------------------------------------

_SQL_QDOT = (
    "list_reduce(list_transform(list_zip({v}, {m}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
)
_SQL_N2 = "CAST(list_reduce(list_transform({m}, x -> x * x), (acc, x) -> acc + x) AS DOUBLE)"


def _sql_score(v: str, m: str) -> str:
    return (
        f"{2.0 * MICRO} * {_SQL_QDOT.format(v=v, m=m)} - {_SQL_N2.format(m=m)}"
    )


def sql_kmeans_assign_cte(
    vectors_cte: str, seeds: list[list[int]], dim: int, updates: int
) -> str:
    """Generate the full unrolled Lloyd CTE chain.

    ``vectors_cte`` must be a CTE named ``v`` exposing (vec_id, embedding).
    Produces a final CTE ``afinal`` with (vec_id, cell, sc).
    """
    seed_rows = ",\n  ".join(
        f"({i}, CAST([{', '.join(str(x) for x in m)}] AS BIGINT[]))"
        for i, m in enumerate(seeds)
    )
    parts = [
        vectors_cte,
        f"m0(cell, m) AS (VALUES\n  {seed_rows}\n)",
    ]
    prev = "m0"
    for it in range(1, updates + 1):
        sums = ",\n         ".join(
            f"SUM({sql_quantize_micro(f'v.embedding[{d + 1}]')}) AS s{d}"
            for d in range(dim)
        )
        mlist = ", ".join(
            f"(s{d} - (((s{d} % n) + n) % n)) // n" for d in range(dim)
        )
        parts.append(
            f"""s{it} AS (
  SELECT v.vec_id, {prev}.cell, {_sql_score('v.embedding', f'{prev}.m')} AS sc
  FROM v CROSS JOIN {prev}
)"""
        )
        parts.append(
            f"""a{it} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cell) AS rn
    FROM s{it}
  ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""g{it} AS (
  SELECT a{it}.cell, COUNT(*) AS n,
         {sums}
  FROM a{it} JOIN v USING (vec_id) GROUP BY a{it}.cell
)"""
        )
        parts.append(
            f"""m{it} AS (
  SELECT cell, CAST([{mlist}] AS BIGINT[]) AS m FROM g{it}
)"""
        )
        prev = f"m{it}"
    parts.append(
        f"""sfinal AS (
  SELECT v.vec_id, {prev}.cell, {_sql_score('v.embedding', f'{prev}.m')} AS sc
  FROM v CROSS JOIN {prev}
)"""
    )
    parts.append(
        """afinal AS (
  SELECT vec_id, cell, sc FROM (
    SELECT vec_id, cell, sc,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sc DESC, cell) AS rn
    FROM sfinal
  ) WHERE rn = 1
)"""
    )
    return "WITH " + ",\n".join(parts)
