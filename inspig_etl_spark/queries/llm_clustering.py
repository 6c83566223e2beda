"""Embedding-clustering queries (LLM-data-pipeline surface): distributed
k-means and SemDeDup-style semantic dedup over ``embeddings``.

Both are brief-mandated extensions (the reference has no vector engine):

- ``embeddings_kmeans_lloyd`` — Lloyd's k-means, the corpus-bucketing /
  quantizer-training kernel (MLlib-shaped: per-iteration one scan + one
  partial-agg groupBy; only k x dim centroid integers reach the driver).
  Oracle-checkable because every update runs in exact integer micro-units
  (see operators/clustering.py).
- ``embeddings_semdedup_prune`` — SemDeDup (Abbas et al. 2023): assign each
  vector to a quantizer cell, rank within the cell by similarity to the
  cell centroid, and prune any vector that is >= tau cosine-similar to a
  higher-ranked (more central) vector in the SAME cell. Candidate pairs
  form only inside a cell equi-join — O(sum cell^2) work, never all-pairs
  over the corpus; at 100 TB cells are written ``partitionBy(cell)`` and
  the prune is per-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.operators.clustering import (
    kmeans_fit_assign,
    seed_micro_centroids,
    sql_kmeans_assign_cte,
)
from inspig_etl_spark.operators.similarity import (
    dot,
    ivf_centroids,
    norm,
    sql_centroid,
    sql_dot,
    sql_norm,
)
from inspig_etl_spark.queries import register

DIM = 64
KMEANS_K = 6
KMEANS_UPDATES = 2
SEMDEDUP_CELLS = 8  # coarse quantizer bank
SEMDEDUP_FINE_MAX = 8  # fine bank size; active count scales with corpus
SEMDEDUP_TARGET_CELL = 250  # target vectors per composed cell
SEMDEDUP_TAU = 0.45

_KM_SEEDS = seed_micro_centroids(ivf_centroids(KMEANS_K, DIM))
_SD_CENTROIDS = ivf_centroids(SEMDEDUP_CELLS, DIM)
_SD_FINE = ivf_centroids(SEMDEDUP_FINE_MAX, DIM, seed="f")

# k-means needs vectors of EXACTLY the quantizer dimension: a short/padded
# vector would zip-pad to NULL scores, where Spark's argmax yields a NULL
# cell but a rank-1 window still picks the first cell — so the guard (same
# on both engines) excludes them outright. The plain >0 guard (shared with
# llm_similarity) is enough for the NULL-propagating semdedup kernel.
_SQL_VECTORS_DIM = (
    "v AS (SELECT vec_id, embedding FROM embeddings "
    f"WHERE embedding IS NOT NULL AND len(embedding) = {DIM})"
)
_SQL_VECTORS = (
    "(SELECT * FROM embeddings "
    "WHERE embedding IS NOT NULL AND len(embedding) > 0) embeddings"
)


def _vectors_exact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"))
    return emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") == DIM))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(table(spark, sf_dir, "embeddings"))
    return emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") > 0))


@register(
    "embeddings_kmeans_lloyd",
    operators="LLM-cluster-kmeans (iterative Lloyd k-means over embeddings, integer-exact updates; brief: LLM-pipeline clustering/quantizer training — the trained coarse quantizer the IVF scale path assumes)",
    oracle=f"""
{sql_kmeans_assign_cte(_SQL_VECTORS_DIM, _KM_SEEDS, DIM, KMEANS_UPDATES)}
SELECT vec_id,
       cell AS cluster,
       COUNT(*) OVER (PARTITION BY cell) AS cluster_size,
       CAST(FLOOR(sc / 1000000.0) AS BIGINT) AS score_e6
FROM afinal
""",
)
def embeddings_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd updates from deterministic md5 seeds, then the final
    assignment with per-cluster sizes. Building this DataFrame runs the
    (bounded, k x dim) centroid reductions — the same driver-side contract
    as MLlib KMeans; the returned plan is the pure assignment expression
    over broadcast literal centroids.
    """
    vecs = _vectors_exact_dim(spark, sf_dir)
    return kmeans_fit_assign(
        vecs, "embedding", "vec_id", DIM, _KM_SEEDS, KMEANS_UPDATES
    )


_SQL_SD_SCORES = ",\n         ".join(
    f"{sql_dot('embedding', sql_centroid(c))} AS s{i}"
    for i, c in enumerate(_SD_CENTROIDS)
)
_SQL_SD_BEST = "GREATEST(" + ", ".join(f"s{i}" for i in range(SEMDEDUP_CELLS)) + ")"
_SQL_SD_CASE = (
    "(CASE "
    + " ".join(f"WHEN s{i} = best THEN {i}" for i in range(SEMDEDUP_CELLS))
    + " END)"
)
_SQL_SD_FS = (
    "[" + ", ".join(sql_dot("embedding", sql_centroid(c)) for c in _SD_FINE) + "]"
)


def semdedup_oracle_sql(target_cell: int = SEMDEDUP_TARGET_CELL) -> str:
    """The SemDeDup oracle with the per-cell sizing target as a parameter —
    the registered query uses the production SEMDEDUP_TARGET_CELL (f=1 at
    test SFs), and the f>1 parity test shrinks it so the SAME corpus forces
    the two-level path on both engines (ADVICE r9: the f>1 branch was never
    hash-verified because the driver's corpus sizes to f=1)."""
    return f"""
WITH nf AS (
  SELECT GREATEST(1, LEAST({SEMDEDUP_FINE_MAX},
         CAST(CEIL(COUNT(*) / {SEMDEDUP_CELLS * target_cell}.0) AS INT))) AS f
  FROM {_SQL_VECTORS}
),
sc AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
         {_SQL_SD_SCORES},
         {_SQL_SD_FS} AS fs
  FROM {_SQL_VECTORS}
),
cl AS (
  SELECT vec_id, embedding, nrm,
         {_SQL_SD_CASE} * (SELECT f FROM nf)
           + (list_position(fs[1:(SELECT f FROM nf)],
                list_aggregate(fs[1:(SELECT f FROM nf)], 'max')) - 1) AS cell,
         best / NULLIF(nrm, 0) AS csim
  FROM (SELECT *, {_SQL_SD_BEST} AS best FROM sc)
),
r AS (
  SELECT vec_id, embedding, nrm, cell, csim,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY csim DESC NULLS LAST, vec_id) AS rnk
  FROM cl
),
p AS (
  SELECT DISTINCT b.vec_id AS pruned_id
  FROM r a JOIN r b ON a.cell = b.cell AND a.rnk < b.rnk
  WHERE {sql_dot('a.embedding', 'b.embedding')} / NULLIF(a.nrm * b.nrm, 0)
        >= {SEMDEDUP_TAU}
)
SELECT r.vec_id, r.cell,
       CAST(FLOOR(r.csim * 1000000.0) AS BIGINT) AS centroid_sim_e6,
       CAST(p.pruned_id IS NULL AS INT) AS keep
FROM r LEFT JOIN p ON r.vec_id = p.pruned_id
"""


@register(
    "embeddings_semdedup_prune",
    operators="LLM-dedup-semantic (SemDeDup: within-cell centroid-ranked cosine prune under a corpus-scaled two-level quantizer; brief: 'embedding-cosine near-dup' — the cluster-scoped production form)",
    oracle=semdedup_oracle_sql(),
)
def embeddings_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semdedup_prune_frame(spark, sf_dir)


def semdedup_prune_frame(
    spark: SparkSession, sf_dir: str, target_cell: int = SEMDEDUP_TARGET_CELL
) -> DataFrame:
    """SemDeDup: within each quantizer cell, rank by centroid similarity
    (most-central first) and prune any vector >= tau-similar to a
    higher-ranked one. The pair join is cell-local (equi-join on cell id),
    the rank window is cell-partitioned, and the prune verdict is a
    left-anti-shaped join against the (small) pruned-id set.

    The within-cell pair join is n²/k work, so k MUST grow with the corpus
    (the r9 10x probe measured the fixed-k=8 version at 23.9x on 10x rows —
    quadratic). The quantizer is therefore TWO-LEVEL: 8 coarse cells times
    an ACTIVE fine-cell count f = clamp(ceil(n / (8*250)), 1, 8) derived
    from the measured corpus size, composing cell = coarse*f + fine —
    pairs-per-cell stays ~TARGET² and total pair work grows linearly until
    the 64-cell bank saturates. At sf<=0.1 f=1 and the result is
    bit-identical to the single-level form; production swaps the md5 banks
    for ``embeddings_kmeans_lloyd``-trained codebooks sized to the corpus
    (SemDeDup paper: k grows with n, cells stay ~constant-size).

    The corpus size is read with ONE O(1)-result count job and f becomes a
    plan-time constant — the same runtime-sizing contract as the kmeans
    kernel's bounded driver reduce (and AQE's runtime re-plan): the scan
    count is metadata-cheap, and baking f into the plan lets the f=1 case
    (any corpus under cells*target vectors) skip the fine-level scoring
    and the 1-row broadcast join entirely instead of paying them per row.

    r16 optimization: the per-centroid scores and the norm come from ONE
    Arrow kernel pass (bit-identical sequential folds — see
    operators/vector_kernels), and the ranked frame is persisted (it feeds
    both pair-join sides and the final verdict join). The pair-join cosine
    stays the HOF ``dot`` fold: the statically unrolled form was TRIED and
    measured ~1.8x SLOWER on the 252k-pair join (6.4 s vs 3.5 s exec at
    sf0.1 — 64 per-pair F.get extractions with bounds/null checks beat the
    fold's single array traversal; see OPTIMIZATION_r16.md).
    """
    from inspig_etl_spark.operators.vector_kernels import with_vector_features

    emb = _vectors(spark, sf_dir).select("vec_id", "embedding")
    n = emb.count()  # single scalar to the driver — quantizer sizing only
    # Integer ceil: matches the oracle's CEIL(n / (cells*target).0) exactly.
    target = SEMDEDUP_CELLS * target_cell
    f = max(1, min(SEMDEDUP_FINE_MAX, (n + target - 1) // target))
    banks = {"__s": _SD_CENTROIDS}
    if f > 1:
        # Only the f ACTIVE fine centroids are scored (the oracle slices
        # fs[1:f] of the full bank — same argmax, fewer dot products).
        banks["__fs"] = _SD_FINE[:f]
    scored = with_vector_features(emb, "embedding", banks=banks, norm_col="nrm")
    cl = scored.withColumn("best", F.array_max("__s")).withColumn(
        "ccell",
        (F.array_position(F.col("__s"), F.col("best")) - 1).cast("int"),
    )
    if f > 1:
        cl = (
            cl.withColumn("fbest", F.array_max("__fs"))
            .withColumn(
                "fcell",
                (F.array_position(F.col("__fs"), F.col("fbest")) - 1).cast("int"),
            )
            .withColumn("cell", (F.col("ccell") * f + F.col("fcell")).cast("int"))
        )
    else:
        # f = 1: fcell is identically 0 and cell = ccell * 1 + 0.
        cl = cl.withColumn("cell", F.col("ccell"))
    cl = cl.withColumn(
        "csim", F.col("best") / F.nullif(F.col("nrm"), F.lit(0.0))
    ).select("vec_id", "embedding", "nrm", "cell", "csim")
    w = Window.partitionBy("cell").orderBy(
        F.col("csim").desc_nulls_last(), F.col("vec_id")
    )
    # persist(): r feeds BOTH sides of the within-cell pair join and the
    # final verdict join — without materialization the kernel + window
    # subtree executes three times. Bounded frame; clearCache() after the
    # action is the session-level unpersist (ADVICE r10).
    r = cl.withColumn("rnk", F.row_number().over(w)).persist()
    a = r.select(
        F.col("cell").alias("a_cell"),
        F.col("rnk").alias("a_rnk"),
        F.col("embedding").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    b = r.select(
        F.col("cell").alias("b_cell"),
        F.col("rnk").alias("b_rnk"),
        F.col("vec_id").alias("pruned_id"),
        F.col("embedding").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    sim = dot(F.col("a_vec"), F.col("b_vec")) / F.nullif(
        F.col("a_nrm") * F.col("b_nrm"), F.lit(0.0)
    )
    pruned = (
        a.join(
            b,
            (F.col("a_cell") == F.col("b_cell")) & (F.col("a_rnk") < F.col("b_rnk")),
        )
        .filter(sim >= SEMDEDUP_TAU)
        .select("pruned_id")
        .distinct()
    )
    return r.join(pruned, r.vec_id == pruned.pruned_id, "left").select(
        "vec_id",
        "cell",
        F.floor(F.col("csim") * F.lit(1000000.0)).cast("bigint").alias(
            "centroid_sim_e6"
        ),
        F.col("pruned_id").isNull().cast("int").alias("keep"),
    )
