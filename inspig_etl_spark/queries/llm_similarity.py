"""Similarity-search queries over ``embeddings`` (LLM-data-pipeline).

- ``embeddings_knn_bruteforce``: cosine top-k for a probe query set against
  the full corpus — the correctness baseline (broadcast queries, per-row
  fold, window top-k).
- ``embeddings_knn_bucketed``: the scale path — deterministic random-
  hyperplane LSH buckets; candidates only within a bucket.
- ``embeddings_knn_ivf``: the other scale path — IVF coarse quantizer
  (deterministic unit centroids), candidates only within a cell.
- ``embeddings_cosine_neardup_pairs``: threshold pairs (embedding-cosine
  near-dup dedup from the brief).

The dot-product fold is sequential in both engines (Spark ``aggregate`` ≡
DuckDB ``list_reduce``), so doubles match bit-for-bit and even the LSH
bucket ids are oracle-checkable. The synthetic embeddings are near-uniform
(max pairwise cosine ≈ 0.51 at sf0.01), so the near-dup threshold is set at
0.45 to exercise the operator with nonzero output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.operators.similarity import (
    cosine_topk,
    hyperplane_signs,
    ivf_centroids,
    lsh_bucket,
    pq_codebooks,
    sql_centroid,
    sql_dot,
    sql_lsh_bucket,
    sql_norm,
    with_ivf_cell,
)
from inspig_etl_spark.queries import register

DIM = 64
TOP_K = 5
QUERY_MOD = 50  # vec_id % 50 == 0 -> 1/50th of the corpus is the probe set
NEARDUP_COS = 0.45
LSH_PLANES = 4
IVF_CELLS = 8

# The ORACLE twin of _vectors() below — ONE derivation site for the
# valid-vector guard on each side (f-strings interpolate this into
# every oracle).
_SQL_VECTORS = (
    "(SELECT * FROM embeddings "
    "WHERE embedding IS NOT NULL AND len(embedding) > 0) embeddings"
)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table restricted to VALID vectors: NULL or empty
    embeddings (failed/padded encodes after a data regen) cannot
    participate in any similarity kernel — DuckDB's list folds even error
    on empty lists — so every query and every oracle reads through the
    same guard."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    return emb.filter(F.col("embedding").isNotNull() & (F.size("embedding") > 0))


_SIGNS = hyperplane_signs(LSH_PLANES, DIM)
_CENTROIDS = ivf_centroids(IVF_CELLS, DIM)

_SQL_COSINE = f"{sql_dot('q.qv', 'c.cv')} / (q.qn * c.cn)"


@register(
    "embeddings_cosine_neardup_bucketed",
    operators="LLM-dedup-cosine-lsh (bucket-local embedding near-dup pair scan — the 100TB form of embeddings_cosine_neardup_pairs; brief: 'embedding-cosine near-dup' + 'LSH-bucketed variant as the scale path')",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
         {sql_lsh_bucket('embedding', _SIGNS)} AS bucket
  FROM {_SQL_VECTORS}
),
s AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         {sql_dot('a.embedding', 'b2.embedding')} / (a.nrm * b2.nrm) AS sim
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
)
SELECT id_a, id_b, ROUND(sim, 6) AS cosine_sim
FROM s WHERE sim >= {NEARDUP_COS}
""",
)
def embeddings_cosine_neardup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair detection with candidates formed ONLY inside an LSH
    bucket: an ordinary equi-join on the hyperplane-sign bucket id, so the
    shuffle is O(|corpus|) and pair work is Σ|bucket|² — never all-pairs.
    This is the scale path for the pair detector itself (the theta-join
    query below remains the documented exhaustive baseline); like any
    single-table LSH it trades recall for cost — cross-bucket pairs are
    missed, tunable via ``LSH_PLANES`` or OR-ed band tables.
    """
    from inspig_etl_spark.operators.similarity import dot, norm

    emb = _vectors(spark, sf_dir).withColumn(
        "bucket", lsh_bucket(F.col("embedding"), _SIGNS)
    )
    n = emb.select("bucket", "vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    a = n.select(
        "bucket",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        "bucket",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # nullif: a zero-norm vector would throw DIVIDE_BY_ZERO under Spark 4's
    # default ANSI mode; DuckDB's x/0 is already NULL, and NULL sim fails
    # the >= threshold filter identically on both engines.
    sim = dot(F.col("va"), F.col("vb")) / F.nullif(
        F.col("na") * F.col("nb"), F.lit(0.0)
    )
    pairs = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= NEARDUP_COS)
        .select("id_a", "id_b", F.round(F.col("sim"), 6).alias("cosine_sim"))
    )


@register(
    "embeddings_knn_bruteforce",
    operators="LLM-ann-bruteforce (cosine top-k baseline; brief: 'brute-force cosine top-k')",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, {sql_norm('embedding')} AS qn
  FROM {_SQL_VECTORS} WHERE vec_id % {QUERY_MOD} = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, {sql_norm('embedding')} AS cn
  FROM {_SQL_VECTORS}
),
s AS (
  SELECT query_id, neighbor_id, {_SQL_COSINE} AS sim
  FROM q JOIN c ON query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank,
         ROUND(sim, 6) AS cosine_sim
  FROM s
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM r WHERE rank <= {TOP_K}
""",
)
def embeddings_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _vectors(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    return cosine_topk(queries, corpus, TOP_K)


@register(
    "embeddings_knn_bucketed",
    operators="LLM-ann-lsh (random-hyperplane bucketed ANN, the 100TB path; brief: 'an IVF or LSH-bucketed variant as the scale path')",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
         {sql_lsh_bucket('embedding', _SIGNS)} AS bucket
  FROM {_SQL_VECTORS}
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, bucket
  FROM b WHERE vec_id % {QUERY_MOD} = 0
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn, bucket FROM b),
s AS (
  SELECT query_id, neighbor_id, {_SQL_COSINE} AS sim
  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank,
         ROUND(sim, 6) AS cosine_sim
  FROM s
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM r WHERE rank <= {TOP_K}
""",
)
def embeddings_knn_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _vectors(spark, sf_dir).withColumn(
        "bucket", lsh_bucket(F.col("embedding"), _SIGNS)
    )
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"), "bucket"
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"), "bucket"
    )
    return cosine_topk(queries, corpus, TOP_K, join_on=["bucket"])


_SQL_IVF_SCORES = ",\n         ".join(
    f"{sql_dot('embedding', sql_centroid(c))} AS s{i}"
    for i, c in enumerate(_CENTROIDS)
)
_SQL_IVF_BEST = "greatest(" + ", ".join(f"s{i}" for i in range(IVF_CELLS)) + ")"
_SQL_IVF_CASE = (
    "(CASE "
    + " ".join(f"WHEN s{i} = best THEN {i}" for i in range(IVF_CELLS))
    + " END)"
)


@register(
    "embeddings_knn_ivf",
    operators="LLM-ann-ivf (inverted-file partitioned ANN, nprobe=1; brief: 'an IVF or LSH-bucketed variant as the scale path')",
    oracle=f"""
WITH sc AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS}
),
cl AS (
  SELECT vec_id, embedding, nrm, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, cell
  FROM cl WHERE vec_id % {QUERY_MOD} = 0
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn, cell FROM cl),
s AS (
  SELECT query_id, neighbor_id, {_SQL_COSINE} AS sim
  FROM q JOIN c USING (cell) WHERE query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank,
         ROUND(sim, 6) AS cosine_sim
  FROM s
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM r WHERE rank <= {TOP_K}
""",
)
def embeddings_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: fixed coarse quantizer -> cell equi-join -> per-query top-k.

    The scale story vs LSH bucketing: cells come from a trained/derived
    quantizer (here deterministic unit centroids, md5-seeded) rather than
    hyperplane sign bits, so cell population tracks the data distribution.
    At 100 TB the corpus is written ``partitionBy(cell)`` and a probe prunes
    to one partition; here both sides compute the cell inline and the join
    shuffles O(|corpus|) rows on the cell key — never all-pairs.
    """
    # select first: mapInArrow ships every input column (guide §4.1) — the
    # unused `label` must not cross the Python boundary.
    emb = with_ivf_cell(
        _vectors(spark, sf_dir).select("vec_id", "embedding"),
        "embedding",
        _CENTROIDS,
    )
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"), "cell"
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"), "cell"
    )
    return cosine_topk(queries, corpus, TOP_K, join_on=["cell"])


@register(
    "embeddings_cosine_neardup_pairs",
    operators="LLM-dedup-cosine (embedding-cosine near-dup pairs; brief: 'embedding-cosine near-dup')",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm FROM {_SQL_VECTORS}
),
s AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS sim
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(sim, 6) AS cosine_sim
FROM s WHERE sim >= {NEARDUP_COS}
""",
)
def embeddings_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _vectors(spark, sf_dir)
    from inspig_etl_spark.operators.similarity import dot, norm

    n = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    a = n.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    # nullif: a zero-norm vector would throw DIVIDE_BY_ZERO under Spark 4's
    # default ANSI mode; DuckDB's x/0 is already NULL, and NULL sim fails
    # the >= threshold filter identically on both engines.
    sim = dot(F.col("va"), F.col("vb")) / F.nullif(
        F.col("na") * F.col("nb"), F.lit(0.0)
    )
    # All-pairs is intentional here (it IS the baseline definition); the
    # bucketed detector above is the scale path. a.vec_id < b.vec_id halves
    # the work; the smaller side is broadcast by AQE.
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).withColumn("sim", sim)
    return pairs.filter(F.col("sim") >= NEARDUP_COS).select(
        "id_a", "id_b", F.round(F.col("sim"), 6).alias("cosine_sim")
    )


P_PROBE = 2  # IVF nprobe: rank-1 cell (the assignment) + 1 spillover cell

_SQL_IVF_STRUCTS = ", ".join(
    f"{{'cell': {i}, 's': s{i}}}" for i in range(IVF_CELLS)
)


@register(
    "embeddings_knn_ivf_multiprobe",
    operators="LLM-ann-ivf-multiprobe (IVF with nprobe=2 recall path; brief: 'recall is tuned by probing top-P cells' — operators/similarity.py's documented upgrade, now implemented)",
    oracle=f"""
WITH sc AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS}
),
r AS (
  SELECT vec_id, embedding, nrm, x.cell AS cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY x.s DESC, x.cell) AS rn
  FROM sc, UNNEST([{_SQL_IVF_STRUCTS}]) AS t(x)
  WHERE x.s IS NOT NULL
),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn, cell FROM r WHERE rn = 1),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, cell
  FROM r WHERE rn <= {P_PROBE} AND vec_id % {QUERY_MOD} = 0
),
s AS (
  SELECT query_id, neighbor_id, {_SQL_COSINE} AS sim
  FROM q JOIN c USING (cell) WHERE query_id <> neighbor_id
),
rk AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank,
         ROUND(sim, 6) AS cosine_sim
  FROM s
)
SELECT query_id, neighbor_id, rank, cosine_sim FROM rk WHERE rank <= {TOP_K}
""",
)
def embeddings_knn_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2: each query probes its own cell PLUS the
    next-best quantizer cell — the standard recall knob over single-probe
    IVF (a vector near a cell boundary finds neighbors that quantized to
    the adjacent cell).

    Scale shape: the probe set explodes only the QUERY side (x nprobe);
    the corpus keeps exactly one row per vector, so the equi-join on the
    cell id shuffles O(|corpus| + nprobe x |queries|). Each corpus vector
    has one cell, so a (query, neighbor) pair can form through at most one
    probed cell — no dedup pass needed. At 100 TB with the corpus written
    ``partitionBy(cell)``, nprobe=P reads exactly P pruned partitions.
    """
    queries, corpus = _ivf_probe_sides(spark, sf_dir, P_PROBE)
    return cosine_topk(
        queries.drop("probe_rank"), corpus, TOP_K, join_on=["cell"]
    )


def _ivf_probe_sides(
    spark: SparkSession, sf_dir: str, nprobe: int
) -> tuple[DataFrame, DataFrame]:
    """(queries, corpus) sides of the IVF candidate join at a given nprobe.

    The query side carries one row per (query, probed cell) for its top-
    ``nprobe`` quantizer cells plus a 1-based ``probe_rank`` column, so a
    sweep over nprobe values filters ONE frame instead of re-deriving the
    quantizer scores per setting (the recall-report path); the corpus side
    keeps exactly one row per vector. Shared by
    ``embeddings_knn_ivf_multiprobe`` and ``embeddings_ann_recall_report``.
    """
    from inspig_etl_spark.operators.vector_kernels import with_vector_features

    # select first: mapInArrow ships every input column (guide §4.1).
    emb = _vectors(spark, sf_dir).select("vec_id", "embedding")
    corpus = with_ivf_cell(emb, "embedding", _CENTROIDS).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"), "cell"
    )
    # (-score, cell) structs sort lexicographically ascending == score DESC
    # with first-cell tie-break — the oracle's rank order; NULL scores
    # (dimension-mismatched vectors) are filtered, matching the oracle's
    # WHERE x.s IS NOT NULL (such vectors also get a NULL corpus cell on
    # both sides and drop out of the equi-join). The per-centroid scores
    # come from the Arrow kernel (bit-identical fold; r16) — the transform
    # below only re-shapes the 8-element score COLUMN into sortable structs.
    scored = F.transform(
        F.col("__ivf_scores"),
        lambda s, i: F.struct((-s).alias("sneg"), i.cast("int").alias("cell")),
    )
    probes = F.slice(
        F.array_sort(F.filter(scored, lambda p: p["sneg"].isNotNull())),
        1,
        nprobe,
    )
    queries = (
        with_vector_features(
            emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
                "vec_id", "embedding"
            ),
            "embedding",
            banks={"__ivf_scores": _CENTROIDS},
        )
        .select("vec_id", "embedding", F.posexplode(probes).alias("pos", "p"))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"),
            F.col("p.cell").alias("cell"),
            (F.col("pos") + 1).cast("int").alias("probe_rank"),
        )
    )
    return queries, corpus


SQ8_SCALE = 127  # int8 symmetric quantization: clamp to [-1, 1], floor * 127


def _sq8(vec) -> F.Column:
    """int8 scalar quantization of a float vector — the ANN compression
    path (4x smaller than float32, integer-only distance kernels). Exact
    integer math, so the whole ADC pipeline is oracle-checkable."""
    return F.transform(
        vec,
        lambda x: F.floor(
            F.least(F.greatest(x.cast("double"), F.lit(-1.0)), F.lit(1.0))
            * F.lit(float(SQ8_SCALE))
        ).cast("bigint"),
    )


def _sql_sq8(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> CAST(FLOOR(LEAST(GREATEST("
        f"CAST(x AS DOUBLE), -1.0), 1.0) * {SQ8_SCALE}) AS BIGINT))"
    )


@register(
    "embeddings_sq8_adc_knn",
    operators=(
        "LLM-ann-sq8 (int8 scalar-quantized inner-product top-k — the ANN "
        "memory-compression path: 4x smaller vectors, integer-only "
        "asymmetric-distance-style scoring; brief: 'similarity search ... "
        "scale path')"
    ),
    oracle=f"""
WITH z AS (
  SELECT vec_id, {_sql_sq8('embedding')} AS qz FROM {_SQL_VECTORS}
),
q AS (SELECT vec_id AS query_id, qz AS qv FROM z WHERE vec_id % {QUERY_MOD} = 0),
c AS (SELECT vec_id AS neighbor_id, qz AS cv FROM z),
s AS (
  SELECT query_id, neighbor_id,
         CAST(list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
              AS BIGINT) AS score_q
  FROM q JOIN c ON query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, score_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_q DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank, score_q FROM r WHERE rank <= {TOP_K}
""",
)
def embeddings_sq8_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized top-k: SQ8 (int8 per dimension) vectors, exact integer
    inner-product scores, window top-k per probe query.

    This is the memory story for ANN at 100 TB: the corpus is stored and
    shuffled at 1/4 the float32 width (here bigint arrays for oracle
    exactness; a production sink packs them to a 64-byte binary column),
    and the scoring kernel never touches a float — |score| <= dim * 127^2
    fits a BIGINT with 40+ bits of headroom, so partial aggregation order
    is irrelevant and the result is bit-stable under any partitioning.
    Pairs with the IVF cell join (embeddings_knn_ivf*) for the full
    IVF+SQ compression stack.

    Scale shape: probe set is |corpus|/50 and broadcast; the corpus is
    scanned once, quantized in-expression (whole-stage codegen), and the
    only shuffle is the per-query top-k window over candidate rows.
    """
    emb = _vectors(spark, sf_dir)
    z = emb.select("vec_id", _sq8(F.col("embedding")).alias("qz"))
    q = z.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qz").alias("qv")
    )
    c = z.select(F.col("vec_id").alias("neighbor_id"), F.col("qz").alias("cv"))
    s = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("score_q"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("neighbor_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "score_q")
    )


# --- IVF-PQ: product-quantized ADC scoring inside IVF cells -----------------
#
# The full compression stack a 100 TB ANN deployment actually runs
# (Jegou et al. 2011, "Product Quantization for Nearest Neighbor Search";
# the FAISS IVFPQ index): the coarse quantizer prunes the corpus to one
# cell per query (the IVF equi-join above), and within the cell every
# corpus vector is stored as M sub-space code ids — here 8 codes over
# 8-dim sub-spaces, 16 centroids per book — instead of 64 floats. The
# query precomputes a per-book lookup table of inner products against all
# centroids once, and each candidate scores as M table lookups (ADC:
# asymmetric distance computation) — no per-pair vector fold at all.
PQ_M = 8  # sub-spaces
PQ_DSUB = DIM // PQ_M  # dims per sub-space
PQ_K = 16  # centroids per book -> a 4-bit code per sub-space

_PQ_BOOKS = pq_codebooks(PQ_M, PQ_K, PQ_DSUB)

# Exact-dimension guard: PQ slices assume DIM dims (a short vector would
# encode garbage sub-spaces); both sides read through len == DIM.
_SQL_VECTORS_D64 = (
    "(SELECT * FROM embeddings "
    f"WHERE embedding IS NOT NULL AND len(embedding) = {DIM}) embeddings"
)


def _pq_cb() -> F.Column:
    """The M x K x dsub codebook as ONE nested literal (see with_ivf_cell's
    note on why per-column forms blow up Catalyst analysis)."""
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(int(v)).cast("bigint") for v in cent])
                    for cent in book
                ]
            )
            for book in _PQ_BOOKS
        ]
    )


def _fold_i(pairs: F.Column) -> F.Column:
    return F.aggregate(
        pairs, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def _pq_sub(m: int | F.Column) -> F.Column:
    """The m-th PQ sub-vector slice of the SQ8-quantized column ``qz``
    (``m`` may be a Python int or the Column index a transform lambda
    passes — the ONE slice definition both the encoder and the LUT use,
    so the sub-space layout cannot diverge between them)."""
    return F.slice(F.col("qz"), m * PQ_DSUB + F.lit(1), F.lit(PQ_DSUB))


def _pq_codes_col() -> F.Column:
    """PQ encode: per sub-space, the 4-bit id of the nearest codebook
    centroid by exact integer L2 (argmin via array_min over (dist, k)
    structs — ties break to the lowest code, matching the oracle's
    first-position-of-min). Reads column ``qz``."""
    return F.transform(
        _pq_cb(),
        lambda book, m: F.array_min(
            F.transform(
                book,
                lambda cent, k: F.struct(
                    _fold_i(
                        F.zip_with(
                            _pq_sub(m),
                            cent,
                            lambda x, y: (x - y) * (x - y),
                        )
                    ).alias("d"),
                    k.cast("int").alias("k"),
                ),
            )
        )["k"],
    )


def _pq_lut_col() -> F.Column:
    """Per-query ADC lookup table: the query's exact integer inner product
    against every codebook centroid, M books x K entries. Reads ``qz``."""
    return F.transform(
        _pq_cb(),
        lambda book, m: F.transform(
            book,
            lambda cent: _fold_i(
                F.zip_with(
                    _pq_sub(m),
                    cent,
                    lambda x, y: x * y,
                )
            ),
        ),
    )


def _ivfpq_cl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared IVF-PQ base frame (vec_id, qz, codes, lut, cell) in ONE
    Arrow kernel pass (r16): coarse-quantizer scores, SQ8 quantization, PQ
    encode and the probe-side ADC LUT all come from
    ``with_vector_features`` (bit-identical numpy twins of the expression
    forms), and only the argmax -> cell derivation stays a JVM expression.
    The prior per-branch literal trees (64x64 centroid bank + 8x16x8
    codebook, duplicated across the enc/q sides) cost ~12 s of Catalyst
    analysis per build and interpreted per-row folds per execution.
    ``lut`` is computed ONLY for probe-query rows (vec_id % QUERY_MOD);
    consumers must filter to those rows before reading it."""
    from inspig_etl_spark.operators.vector_kernels import with_vector_features

    emb = (
        _vectors(spark, sf_dir)
        .filter(F.size("embedding") == DIM)
        .select("vec_id", "embedding")
    )
    feat = with_vector_features(
        emb,
        "embedding",
        banks={"__ivf_scores": _CENTROIDS},
        sq8_col="qz",
        pq_books=_PQ_BOOKS,
        pq_codes_col="codes",
        pq_lut_col="lut",
        pq_lut_mod=QUERY_MOD,
    )
    return feat.withColumn(
        "cell",
        (
            F.array_position(F.col("__ivf_scores"), F.array_max(F.col("__ivf_scores")))
            - 1
        ).cast("int"),
    ).drop("__ivf_scores", "embedding")


def _ivfpq_adc_scores(cl: DataFrame) -> DataFrame:
    """ADC candidate scores inside the coarse cell: equi-join the encoded
    corpus side against the probe queries' LUTs on the cell id and score
    each pair as M integer table lookups. ``cl`` is the ``_ivfpq_cl``
    frame (vec_id, cell, codes, lut); returns (query_id, neighbor_id,
    score_adc). Shared by the IVF-PQ ADC / refine queries and the recall
    report. The M-lookup fold is statically unrolled (integer sum —
    order-free; ``F.get`` is NULL-safe like the element_at fold) so it
    runs in whole-stage codegen instead of the interpreted HOF path."""
    enc = cl.select(F.col("vec_id").alias("neighbor_id"), "cell", "codes")
    q = cl.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "cell", "lut"
    )
    adc = F.lit(0).cast("bigint")
    for m in range(PQ_M):
        adc = adc + F.get(F.get(F.col("lut"), F.lit(m)), F.get(F.col("codes"), F.lit(m)))
    return (
        enc.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("score_adc"))
    )


def _exact_rerank(cl: DataFrame, cand: DataFrame, k: int) -> DataFrame:
    """Refine stage: fetch both vectors of each shortlisted (query,
    neighbor) id pair by equi-join and re-rank by the exact int8 inner
    product; returns (query_id, neighbor_id, rank, score_q) with
    rank <= k. Shared by the refine query and the recall report."""
    zq = cl.select(F.col("vec_id").alias("query_id"), F.col("qz").alias("qv"))
    zc = cl.select(F.col("vec_id").alias("neighbor_id"), F.col("qz").alias("cv"))
    exact = _fold_i(F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y))
    rf = (
        cand.join(zq, "query_id")
        .join(zc, "neighbor_id")
        .select("query_id", "neighbor_id", exact.alias("score_q"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("neighbor_id")
    )
    return rf.withColumn("rank", F.row_number().over(wr)).filter(F.col("rank") <= k)


def _sql_book(book: list[list[int]]) -> str:
    return "[" + ", ".join("[" + ", ".join(str(v) for v in c) + "]" for c in book) + "]"


def _sql_pq_dists(m: int, col: str = "qz") -> str:
    sub = f"list_slice({col}, {m * PQ_DSUB + 1}, {m * PQ_DSUB + PQ_DSUB})"
    return (
        f"list_transform({_sql_book(_PQ_BOOKS[m])}, cent -> "
        f"list_reduce(list_transform(list_zip({sub}, cent), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])), (a, x) -> a + x))"
    )


def _sql_pq_codes(col: str = "qz") -> str:
    return (
        "["
        + ", ".join(
            f"(list_position({_sql_pq_dists(m, col)}, "
            f"list_min({_sql_pq_dists(m, col)})) - 1)"
            for m in range(PQ_M)
        )
        + "]"
    )


_SQL_PQ_CODES = _sql_pq_codes()


def _sql_pq_lut(m: int) -> str:
    sub = f"list_slice(qz, {m * PQ_DSUB + 1}, {m * PQ_DSUB + PQ_DSUB})"
    return (
        f"list_transform({_sql_book(_PQ_BOOKS[m])}, cent -> "
        f"list_reduce(list_transform(list_zip({sub}, cent), "
        f"p -> p[1] * p[2]), (a, x) -> a + x))"
    )


_SQL_PQ_LUT = "[" + ", ".join(_sql_pq_lut(m) for m in range(PQ_M)) + "]"


@register(
    "embeddings_ivfpq_adc_knn",
    operators=(
        "LLM-ann-ivfpq (IVF-PQ: coarse-quantizer cell equi-join + product-"
        "quantized codes + ADC lookup-table scoring — the FAISS-style "
        "compression stack for ANN at 100 TB; brief: 'an IVF or LSH-"
        "bucketed variant as the scale path')"
    ),
    oracle=f"""
WITH sc AS (
  SELECT vec_id, {_sql_sq8('embedding')} AS qz,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
cl AS (
  SELECT vec_id, qz, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
enc AS (
  SELECT vec_id AS neighbor_id, cell, {_SQL_PQ_CODES} AS codes FROM cl
),
q AS (
  SELECT vec_id AS query_id, cell, {_SQL_PQ_LUT} AS lut
  FROM cl WHERE vec_id % {QUERY_MOD} = 0
),
s AS (
  SELECT query_id, neighbor_id,
         CAST(list_reduce(list_transform(list_zip(lut, codes),
                                         p -> p[1][p[2] + 1]),
                          (a, x) -> a + x) AS BIGINT) AS score_q
  FROM q JOIN enc USING (cell) WHERE query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, score_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_q DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank, score_q FROM r WHERE rank <= {TOP_K}
""",
)
def embeddings_ivfpq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with ADC scoring — the composed ANN compression stack.

    Three stages, all whole-stage-codegen expressions:

    - **coarse quantize**: every vector gets its IVF cell (argmax-cosine
      against the shared unit centroids — same quantizer as
      ``embeddings_knn_ivf``);
    - **encode**: the SQ8-quantized vector is split into ``PQ_M`` 8-dim
      sub-spaces, each mapped to its nearest codebook centroid by exact
      integer L2 (argmin via array_min over (dist, k) structs — ties break
      to the lowest code, matching the oracle's first-position-of-min);
      the corpus row shrinks to (cell, 8 x 4-bit codes) — a 32x storage
      and shuffle compression over float32;
    - **score (ADC)**: each probe query folds its own sub-vectors against
      every centroid ONCE into an M x K lookup table, and every candidate
      in its cell scores as M integer table lookups — O(M) per pair
      instead of O(DIM).

    Scale shape: the equi-join on the cell id shuffles O(|corpus|) rows of
    codes (not vectors); the LUT travels only with the |corpus|/50 query
    side. |score| <= M * dsub * 127^2 ~ 1e6 — BIGINT-exact under any
    partial-aggregation order, so the whole stack is oracle-checkable. At
    100 TB the enc table is the persisted index (written partitionBy(cell),
    8 bytes/vector); re-encoding is a one-pass scan. Codebooks here are
    fixed md5-derived literals (pure shared data); production trains them
    per sub-space with the adjacent Lloyd kernel (operators/clustering.py).
    """
    # persist(): the kernel frame feeds both the enc and q sides of the ADC
    # join — bounded (vec_id, cell, codes, per-query lut) rows; clearCache()
    # after the action is the session-level unpersist (ADVICE r10).
    cl = _ivfpq_cl(spark, sf_dir).persist()
    s = _ivfpq_adc_scores(cl).withColumnRenamed("score_adc", "score_q")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("neighbor_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "score_q")
    )


REFINE_C = 25  # ADC candidates per query fed to the exact re-rank stage


@register(
    "embeddings_ivfpq_refined_knn",
    operators=(
        "LLM-ann-ivfpq-refine (two-stage retrieval: IVF-PQ ADC shortlist "
        "-> exact int8 inner-product re-rank of the top-C candidates, with "
        "a brute-force recall witness riding along per row — the standard "
        "FAISS refine/rerank production stack)"
    ),
    oracle=f"""
WITH sc AS (
  SELECT vec_id, {_sql_sq8('embedding')} AS qz,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
cl AS (
  SELECT vec_id, qz, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
enc AS (
  SELECT vec_id AS neighbor_id, cell, {_SQL_PQ_CODES} AS codes FROM cl
),
q AS (
  SELECT vec_id AS query_id, cell, {_SQL_PQ_LUT} AS lut
  FROM cl WHERE vec_id % {QUERY_MOD} = 0
),
s AS (
  SELECT query_id, neighbor_id,
         CAST(list_reduce(list_transform(list_zip(lut, codes),
                                         p -> p[1][p[2] + 1]),
                          (a, x) -> a + x) AS BIGINT) AS score_adc
  FROM q JOIN enc USING (cell) WHERE query_id <> neighbor_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score_adc DESC, neighbor_id) AS adc_rank
    FROM s
  ) WHERE adc_rank <= {REFINE_C}
),
rf AS (
  SELECT cand.query_id, cand.neighbor_id,
         CAST(list_sum(list_transform(list_zip(a.qz, b.qz), p -> p[1] * p[2]))
              AS BIGINT) AS score_q
  FROM cand JOIN cl a ON cand.query_id = a.vec_id
            JOIN cl b ON cand.neighbor_id = b.vec_id
),
rr AS (
  SELECT query_id, neighbor_id, score_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_q DESC, neighbor_id) AS rank
  FROM rf
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_sum(list_transform(list_zip(a.qz, b.qz),
                                              p -> p[1] * p[2])) DESC,
                      b.vec_id) AS bf_rank
    FROM cl a JOIN cl b ON a.vec_id % {QUERY_MOD} = 0 AND a.vec_id <> b.vec_id
  ) WHERE bf_rank <= {TOP_K}
)
SELECT rr.query_id, rr.neighbor_id, rr.rank, rr.score_q,
       CAST(bf.neighbor_id IS NOT NULL AS INT) AS in_brute_topk
FROM rr LEFT JOIN bf
  ON rr.query_id = bf.query_id AND rr.neighbor_id = bf.neighbor_id
WHERE rr.rank <= {TOP_K}
""",
)
def embeddings_ivfpq_refined_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN retrieval — the production FAISS pattern on top of
    ``embeddings_ivfpq_adc_knn``:

    - **stage 1 (shortlist)**: ADC lookup-table scores inside the coarse
      cell, per-query top-``REFINE_C`` window — candidate (query, neighbor)
      ID PAIRS only, no vectors;
    - **stage 2 (refine)**: the shortlist joins BACK to the vector store by
      id and re-ranks by the exact int8 inner product (the
      ``embeddings_sq8_adc_knn`` kernel) — O(DIM) work for C rows per
      query instead of the whole cell, fixing the PQ approximation error
      at the top of the list;
    - **witness**: each returned row carries ``in_brute_topk`` — whether
      the refined neighbor is in the query's exact whole-corpus top-k — so
      recall is measured IN the result (the CMS exact-witness pattern),
      not asserted.

    Scale shape: stage 1 shuffles only 4-bit codes (the persisted index);
    the refine vector fetch is two id equi-joins sized C x |queries|, the
    production-shaped alternative to carrying vectors through the cell
    join. The brute-force witness is the one deliberately quadratic term
    (declared, same exception as the SQ8 baseline) — a deployment drops
    it; at 100 TB the first two stages shuffle O(codes) + O(C x queries).
    """
    # persist(): cl feeds the encode side, the query side, two refine
    # vector fetches, and both brute-force witness sides. The frame is
    # bounded — (vec_id, cell, int8 codes), a few KB per thousand vectors —
    # and deliberately left cached for the duration of the query: callers
    # that run many queries in one session (bench.py run_once, the driver
    # harness) call spark.catalog.clearCache() after each action, which is
    # the session-level unpersist for every lazily-returned query frame
    # (ADVICE r10).
    cl = _ivfpq_cl(spark, sf_dir).persist()
    s = _ivfpq_adc_scores(cl)
    wc = Window.partitionBy("query_id").orderBy(
        F.col("score_adc").desc(), F.col("neighbor_id")
    )
    cand = (
        s.withColumn("adc_rank", F.row_number().over(wc))
        .filter(F.col("adc_rank") <= REFINE_C)
        .select("query_id", "neighbor_id")
    )
    refined = _exact_rerank(cl, cand, TOP_K)
    # Brute-force recall witness (declared quadratic — the SQ8 baseline
    # exception): exact top-k over the whole d64 corpus per probe query.
    exact = _fold_i(F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y))
    bq = cl.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qz").alias("qv")
    )
    bs = (
        cl.select(F.col("vec_id").alias("neighbor_id"), F.col("qz").alias("cv"))
        .join(F.broadcast(bq), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", exact.alias("bf_score"))
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("bf_score").desc(), F.col("neighbor_id")
    )
    bf = (
        bs.withColumn("bf_rank", F.row_number().over(wb))
        .filter(F.col("bf_rank") <= TOP_K)
        .select("query_id", F.col("neighbor_id").alias("bf_neighbor"))
    )
    return refined.join(
        bf,
        (refined.query_id == bf.query_id)
        & (refined.neighbor_id == bf.bf_neighbor),
        "left",
    ).select(
        refined.query_id,
        refined.neighbor_id,
        "rank",
        "score_q",
        F.col("bf_neighbor").isNotNull().cast("int").alias("in_brute_topk"),
    )


# SQ8-quantized coarse centroids, computed ONCE in Python and embedded as
# integer literals on BOTH engines (the residual and the q-centroid dot
# term must agree bit-for-bit, so neither engine re-derives them).
import math as _math

_SQ8_CENTROIDS = [
    [int(_math.floor(max(-1.0, min(1.0, x)) * SQ8_SCALE)) for x in c]
    for c in _CENTROIDS
]
_SQL_CZL = _sql_book(_SQ8_CENTROIDS)


@register(
    "embeddings_ivfpq_residual_knn",
    operators=(
        "LLM-ann-ivfpq-residual (true FAISS IVFPQ: product-quantize the "
        "RESIDUAL vector minus its coarse centroid, score as exact "
        "q-dot-centroid + residual ADC lookups — the encoding that makes "
        "PQ codes spend their bits on within-cell variation)"
    ),
    oracle=f"""
WITH sc AS (
  SELECT vec_id, {_sql_sq8('embedding')} AS qz,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
cl AS (
  SELECT vec_id, qz, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
rv AS (
  SELECT vec_id, qz, cell,
         list_transform(list_zip(qz, {_SQL_CZL}[cell + 1]),
                        p -> p[1] - p[2]) AS rz
  FROM cl
),
enc AS (
  SELECT vec_id AS neighbor_id, cell, {_sql_pq_codes('rz')} AS codes FROM rv
),
q AS (
  SELECT vec_id AS query_id, cell, {_SQL_PQ_LUT} AS lut,
         CAST(list_sum(list_transform(list_zip(qz, {_SQL_CZL}[cell + 1]),
                                      p -> p[1] * p[2])) AS BIGINT) AS qcz
  FROM cl WHERE vec_id % {QUERY_MOD} = 0
),
s AS (
  SELECT query_id, neighbor_id,
         qcz + CAST(list_reduce(list_transform(list_zip(lut, codes),
                                               p -> p[1][p[2] + 1]),
                                (a, x) -> a + x) AS BIGINT) AS score_q
  FROM q JOIN enc USING (cell) WHERE query_id <> neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, score_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_q DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank, score_q FROM r WHERE rank <= {TOP_K}
""",
)
def embeddings_ivfpq_residual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoded IVF-PQ — the encoding FAISS's IVFPQ actually uses:
    each vector's PQ codes quantize ``x - centroid(cell)`` instead of
    ``x``, so the 4-bit budget describes within-cell variation rather than
    re-describing the cell itself, and the ADC score adds back the exact
    integer ``q · centroid(cell)`` term (constant within a cell, so it
    never reorders a cell's candidates — it exists so scores stay
    comparable ACROSS cells in multi-probe compositions). The quantized
    centroids are Python-computed integer literals shared verbatim by
    both engines.

    Scale shape: identical to ``embeddings_ivfpq_adc_knn`` — the cell
    equi-join shuffles codes, the LUT travels with the probe side; the
    residual subtraction is one per-row zip over a broadcast literal.
    Recall vs the flat encoding is pinned (>=) by an invariant test, the
    standard justification for residual coding.
    """
    # select first: mapInArrow ships every input column (guide §4.1).
    emb = (
        _vectors(spark, sf_dir)
        .filter(F.size("embedding") == DIM)
        .select("vec_id", "embedding")
    )
    cl = with_ivf_cell(emb, "embedding", _CENTROIDS).select(
        "vec_id", "cell", _sq8(F.col("embedding")).alias("qz")
    )
    cz_arr = F.array(
        *[F.array(*[F.lit(v).cast("bigint") for v in c]) for c in _SQ8_CENTROIDS]
    )
    cz = F.element_at(cz_arr, F.col("cell") + 1)
    rv = cl.withColumn("rz", F.zip_with(F.col("qz"), cz, lambda x, y: x - y))
    cb = _pq_cb()

    def sub(col, m):
        return F.slice(F.col(col), m * PQ_DSUB + 1, PQ_DSUB)

    codes = F.transform(
        cb,
        lambda book, m: F.array_min(
            F.transform(
                book,
                lambda cent, k: F.struct(
                    _fold_i(
                        F.zip_with(sub("rz", m), cent, lambda x, y: (x - y) * (x - y))
                    ).alias("d"),
                    k.cast("int").alias("k"),
                ),
            )
        )["k"],
    )
    lut = F.transform(
        cb,
        lambda book, m: F.transform(
            book,
            lambda cent: _fold_i(F.zip_with(sub("qz", m), cent, lambda x, y: x * y)),
        ),
    )
    qcz = _fold_i(F.zip_with(F.col("qz"), cz, lambda x, y: x * y))
    enc = rv.select(F.col("vec_id").alias("neighbor_id"), "cell", codes.alias("codes"))
    q = cl.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "cell", lut.alias("lut"), qcz.alias("qcz")
    )
    s = (
        enc.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("qcz")
                + _fold_i(
                    F.zip_with(
                        F.col("lut"),
                        F.col("codes"),
                        lambda l, c: F.element_at(l, c + F.lit(1)),
                    )
                )
            ).alias("score_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("neighbor_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "score_q")
    )


@register(
    "embeddings_ivfpq_multiprobe_knn",
    operators=(
        "LLM-ann-ivfpq-multiprobe (the assembled production ANN: residual "
        "PQ codes + nprobe=2 cell probing, scores comparable across cells "
        "through the exact q-dot-centroid term — the recall knob composed "
        "with the compression stack)"
    ),
    oracle=f"""
WITH sc AS (
  SELECT vec_id, embedding, {_sql_sq8('embedding')} AS qz,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
r AS (
  SELECT vec_id, qz, x.cell AS cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY x.s DESC, x.cell) AS rn
  FROM sc, UNNEST([{_SQL_IVF_STRUCTS}]) AS t(x)
  WHERE x.s IS NOT NULL
),
rv AS (
  SELECT vec_id, qz, cell,
         list_transform(list_zip(qz, {_SQL_CZL}[cell + 1]),
                        p -> p[1] - p[2]) AS rz
  FROM r WHERE rn = 1
),
enc AS (
  SELECT vec_id AS neighbor_id, cell, {_sql_pq_codes('rz')} AS codes FROM rv
),
q AS (
  SELECT vec_id AS query_id, cell, {_SQL_PQ_LUT} AS lut,
         CAST(list_sum(list_transform(list_zip(qz, {_SQL_CZL}[cell + 1]),
                                      p -> p[1] * p[2])) AS BIGINT) AS qcz
  FROM r WHERE rn <= {P_PROBE} AND vec_id % {QUERY_MOD} = 0
),
s AS (
  SELECT query_id, neighbor_id,
         qcz + CAST(list_reduce(list_transform(list_zip(lut, codes),
                                               p -> p[1][p[2] + 1]),
                                (a, x) -> a + x) AS BIGINT) AS score_q
  FROM q JOIN enc USING (cell) WHERE query_id <> neighbor_id
),
rk AS (
  SELECT query_id, neighbor_id, score_q,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_q DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, rank, score_q FROM rk WHERE rank <= {TOP_K}
""",
)
def embeddings_ivfpq_multiprobe_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled production retrieval stack: residual PQ codes in the
    corpus index, nprobe=2 on the query side, and — the detail that makes
    the composition CORRECT rather than merely plausible — the exact
    integer ``q · centroid(cell)`` term added per probed cell, so ADC
    scores from DIFFERENT cells are mutually comparable in one top-k
    window (pure-residual scores are only rank-stable within a cell; a
    multi-probe union of them would be an apples-to-oranges sort).

    Scale shape: corpus side unchanged (one (cell, codes) row per vector,
    the persisted index); the probe explode multiplies only the
    |corpus|/50 query side by nprobe; a corpus vector lives in exactly
    one cell so no candidate dedup is needed. ``partitionBy(cell)``
    pruning reads exactly nprobe partitions per query at 100 TB.
    """
    from inspig_etl_spark.operators.similarity import dot

    # select first: mapInArrow ships every input column (guide §4.1).
    emb = (
        _vectors(spark, sf_dir)
        .filter(F.size("embedding") == DIM)
        .select("vec_id", "embedding")
    )
    cl = with_ivf_cell(emb, "embedding", _CENTROIDS).select(
        "vec_id", "cell", _sq8(F.col("embedding")).alias("qz")
    )
    cz_arr = F.array(
        *[F.array(*[F.lit(v).cast("bigint") for v in c]) for c in _SQ8_CENTROIDS]
    )
    cz = F.element_at(cz_arr, F.col("cell") + 1)
    rv = cl.withColumn("rz", F.zip_with(F.col("qz"), cz, lambda x, y: x - y))
    cb = _pq_cb()

    def sub(col, m):
        return F.slice(F.col(col), m * PQ_DSUB + 1, PQ_DSUB)

    codes = F.transform(
        cb,
        lambda book, m: F.array_min(
            F.transform(
                book,
                lambda cent, k: F.struct(
                    _fold_i(
                        F.zip_with(sub("rz", m), cent, lambda x, y: (x - y) * (x - y))
                    ).alias("d"),
                    k.cast("int").alias("k"),
                ),
            )
        )["k"],
    )
    enc = rv.select(F.col("vec_id").alias("neighbor_id"), "cell", codes.alias("codes"))

    cents = F.array(*[F.array(*[F.lit(x) for x in c]) for c in _CENTROIDS])
    scored = F.transform(
        cents,
        lambda c, i: F.struct(
            (-dot(F.col("embedding"), c)).alias("sneg"), i.cast("int").alias("cell")
        ),
    )
    probes = F.slice(
        F.array_sort(F.filter(scored, lambda p: p["sneg"].isNotNull())),
        1,
        P_PROBE,
    )
    lut = F.transform(
        cb,
        lambda book, m: F.transform(
            book,
            lambda cent: _fold_i(F.zip_with(sub("qz", m), cent, lambda x, y: x * y)),
        ),
    )
    q = (
        emb.filter(F.col("vec_id") % QUERY_MOD == 0)
        .withColumn("p", F.explode(probes))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("p.cell").alias("cell"),
            _sq8(F.col("embedding")).alias("qz"),
        )
        .select(
            "query_id",
            "cell",
            lut.alias("lut"),
            _fold_i(
                F.zip_with(
                    F.col("qz"),
                    F.element_at(cz_arr, F.col("cell") + 1),
                    lambda x, y: x * y,
                )
            ).alias("qcz"),
        )
    )
    s = (
        enc.join(q, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.col("qcz")
                + _fold_i(
                    F.zip_with(
                        F.col("lut"),
                        F.col("codes"),
                        lambda l, c: F.element_at(l, c + F.lit(1)),
                    )
                )
            ).alias("score_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("neighbor_id")
    )
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "score_q")
    )


# --- ANN recall-sweep tuning report ------------------------------------------
#
# The artifact an index operator reads BEFORE a 100 TB build: one table of
# recall@k vs candidate-scoring cost per (index, nprobe, shortlist C)
# configuration, every number an exact integer derived by joining each
# retrieval stage's top-k against the float-cosine brute-force ground truth.
# Composes the existing kernels (the reference's own pattern of
# run-observability tables — /root/reference/src/weekly/farm_processor.py's
# job-log/master-count reports): the IVF probe sides come from
# _ivf_probe_sides (shared with embeddings_knn_ivf_multiprobe), the ADC
# shortlist from _ivfpq_adc_scores and the re-rank from _exact_rerank
# (shared with embeddings_ivfpq_adc_knn / _refined_knn) — the witness math
# lives once.

REPORT_NPROBES = (1, 2, 4)
REPORT_CS = (10, 25)

_RPT_SIM = f"{sql_dot('q.qv', 'c.cv')} / (q.qn * c.cn)"


def _rpt_top_sql(from_clause: str, extra_where: str = "") -> str:
    """Per-query float-cosine top-k over aliased (q, c) candidate sides."""
    return f"""SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_RPT_SIM} DESC, c.neighbor_id) AS rk
    FROM {from_clause}
    WHERE q.query_id <> c.neighbor_id{extra_where}
  ) WHERE rk <= {TOP_K}"""


def _rpt_rf_sql(c: int) -> str:
    """Exact int8 re-rank of the ADC top-``c`` shortlist (oracle twin of
    _exact_rerank over _ivfpq_adc_scores' ranked output)."""
    return f"""SELECT query_id, neighbor_id FROM (
    SELECT cand.query_id, cand.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY cand.query_id
             ORDER BY CAST(list_sum(list_transform(list_zip(a.qz, b.qz),
                                                   p -> p[1] * p[2]))
                           AS BIGINT) DESC,
                      cand.neighbor_id) AS rk
    FROM (SELECT query_id, neighbor_id FROM adcr WHERE rk <= {c}) cand
    JOIN cld a ON cand.query_id = a.vec_id
    JOIN cld b ON cand.neighbor_id = b.vec_id
  ) WHERE rk <= {TOP_K}"""


def _rpt_row_sql(name: str, nprobe: int, c: int, top: str, scored: str) -> str:
    """One report row: exact integer recall + scored-candidate counts for a
    variant whose top-k CTE is ``top`` and whose candidate-count expression
    is ``scored``. recall_ppm and mean_scored_milli use integer division
    (DuckDB ``//`` == Spark ``div`` on the non-negative counts here). The
    counts are scalar subqueries, which DuckDB cannot lateral-reference by
    alias, so the derived ratios live in an outer SELECT."""
    return f"""SELECT index_name, nprobe, shortlist_c, queries, hits, possible,
       CAST(hits * 1000000 // NULLIF(possible, 0) AS BIGINT) AS recall_ppm,
       scored_pairs,
       CAST(scored_pairs * 1000 // NULLIF(queries, 0) AS BIGINT)
         AS mean_scored_milli
FROM (
  SELECT '{name}' AS index_name, CAST({nprobe} AS INT) AS nprobe,
       CAST({c} AS INT) AS shortlist_c,
       (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM {top}) AS queries,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {top} t JOIN gt g
          ON t.query_id = g.query_id AND t.neighbor_id = g.neighbor_id) AS hits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM gt
          WHERE query_id IN (SELECT query_id FROM {top})) AS possible,
       CAST(({scored}) AS BIGINT) AS scored_pairs
)"""


_RPT_SCORED_FLAT = (
    f"(SELECT CAST(COUNT(*) AS BIGINT) FROM base WHERE vec_id % {QUERY_MOD} = 0)"
    " * ((SELECT CAST(COUNT(*) AS BIGINT) FROM base) - 1)"
)
_RPT_SCORED_LSH = (
    "SELECT COUNT(*) FROM lb q JOIN lb c ON q.bucket = c.bucket"
    f" AND q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> c.vec_id"
)


def _rpt_scored_ivf(p: int) -> str:
    return (
        "SELECT COUNT(*) FROM qpr q JOIN corp c USING (cell)"
        f" WHERE q.rn <= {p} AND q.query_id <> c.neighbor_id"
    )


_RPT_SCORED_PQ = (
    "SELECT COUNT(*) FROM cld a JOIN cld b ON a.cell = b.cell"
    f" AND a.vec_id % {QUERY_MOD} = 0 AND a.vec_id <> b.vec_id"
)


def _rpt_scored_rf(c: int) -> str:
    return (
        f"({_RPT_SCORED_PQ}) + (SELECT COUNT(*) FROM adcr WHERE rk <= {c})"
    )


_RPT_ROWS_SQL = "\nUNION ALL\n".join(
    [
        _rpt_row_sql("flat", 1, 0, "gt", _RPT_SCORED_FLAT),
        _rpt_row_sql("lsh", 1, 0, "lsh_top", f"({_RPT_SCORED_LSH})"),
    ]
    + [
        _rpt_row_sql("ivf", p, 0, f"ivf{p}_top", f"({_rpt_scored_ivf(p)})")
        for p in REPORT_NPROBES
    ]
    + [_rpt_row_sql("ivfpq_adc", 1, 0, "pq_top", f"({_RPT_SCORED_PQ})")]
    + [
        _rpt_row_sql("ivfpq_refine", 1, c, f"rf{c}_top", _rpt_scored_rf(c))
        for c in REPORT_CS
    ]
)


@register(
    "embeddings_ann_recall_report",
    operators=(
        "LLM-ann-recall-report (the index tuning table: recall@k vs exact "
        "float brute-force ground truth + scored-candidate cost per "
        "(index in {flat, lsh, ivf, ivfpq_adc, ivfpq_refine}, "
        "nprobe in {1,2,4}, shortlist C in {10,25}) — exact integer "
        "counts, composed from the existing ANN kernels' shared stages; "
        "reference analog: the run-observability tables of "
        "src/weekly/farm_processor.py:245-316)"
    ),
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm FROM {_SQL_VECTORS}
),
gt AS (
  {_rpt_top_sql(
      "(SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM base"
      f" WHERE vec_id % {QUERY_MOD} = 0) q,"
      " (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn FROM base) c"
  )}
),
lb AS (
  SELECT vec_id, embedding, nrm,
         {sql_lsh_bucket('embedding', _SIGNS)} AS bucket
  FROM base
),
lsh_top AS (
  {_rpt_top_sql(
      "(SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, bucket FROM lb"
      f" WHERE vec_id % {QUERY_MOD} = 0) q"
      " JOIN (SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn,"
      " bucket FROM lb) c USING (bucket)"
  )}
),
sc AS (SELECT vec_id, embedding, nrm, {_SQL_IVF_SCORES} FROM base),
pr AS (
  SELECT vec_id, embedding, nrm, x.cell AS cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY x.s DESC, x.cell) AS rn
  FROM sc, UNNEST([{_SQL_IVF_STRUCTS}]) AS t(x)
  WHERE x.s IS NOT NULL
),
corp AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, nrm AS cn, cell
  FROM pr WHERE rn = 1
),
qpr AS (
  SELECT vec_id AS query_id, embedding AS qv, nrm AS qn, cell, rn
  FROM pr WHERE vec_id % {QUERY_MOD} = 0
),
{", ".join(
    f'''ivf{p}_top AS (
  {_rpt_top_sql("qpr q JOIN corp c USING (cell)", f" AND q.rn <= {p}")}
)'''
    for p in REPORT_NPROBES
)},
scd AS (
  SELECT vec_id, {_sql_sq8('embedding')} AS qz, {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
cld AS (
  SELECT vec_id, qz, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM scd)
),
encd AS (SELECT vec_id AS neighbor_id, cell, {_SQL_PQ_CODES} AS codes FROM cld),
qd AS (
  SELECT vec_id AS query_id, cell, {_SQL_PQ_LUT} AS lut
  FROM cld WHERE vec_id % {QUERY_MOD} = 0
),
adc AS (
  SELECT query_id, neighbor_id,
         CAST(list_reduce(list_transform(list_zip(lut, codes),
                                         p -> p[1][p[2] + 1]),
                          (a, x) -> a + x) AS BIGINT) AS score_adc
  FROM qd JOIN encd USING (cell) WHERE query_id <> neighbor_id
),
adcr AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_adc DESC, neighbor_id) AS rk
  FROM adc
),
pq_top AS (SELECT query_id, neighbor_id FROM adcr WHERE rk <= {TOP_K}),
{", ".join(f"rf{c}_top AS ({_rpt_rf_sql(c)})" for c in REPORT_CS)}
{_RPT_ROWS_SQL}
""",
)
def embeddings_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN index tuning table: for every retrieval configuration, exact
    integer recall@k (``TOP_K``) against the float-cosine brute-force ground
    truth, plus the configuration's candidate-scoring cost — the two axes
    that decide (index, nprobe, C) before committing a 100 TB index build.

    Output (one row per configuration, 8 rows):

    - ``queries``: probe queries the configuration returned neighbors for;
    - ``hits`` / ``possible``: ground-truth top-k pairs retrieved vs
      retrievable for those queries — ``recall_ppm`` is their exact
      integer ppm ratio;
    - ``scored_pairs`` / ``mean_scored_milli``: candidate pairs the
      configuration scores (the cost axis; for two-stage refine, ADC pairs
      + exact re-rank fetches).

    Everything is composed from the kernels' own shared stages
    (``_ivf_probe_sides``, ``_ivfpq_adc_scores``, ``_exact_rerank``), so
    this table and the production queries can never disagree about what a
    configuration computes.

    Scale shape: the ground truth is the ONE deliberately quadratic term
    (the declared brute-force witness exception — a deployment runs the
    sweep on a sampled query set); every variant's own stages inherit the
    production kernels' bucketed/cell-join shapes, the per-variant
    reductions are global scalar aggregates over id-only frames (no
    vectors travel), and the result is 8 rows joined by 1-row broadcast
    crossJoins.
    """
    gt = (
        embeddings_knn_bruteforce(spark, sf_dir)
        .select("query_id", "neighbor_id")
        # Bounded: queries x TOP_K id pairs. Reused by every variant's
        # hits/possible joins; multi-query sessions clearCache() after the
        # action (the repo-wide policy for lazily-returned query frames).
        .persist()
    )

    def metrics(name: str, nprobe: int, c: int, top: DataFrame,
                scored: DataFrame) -> DataFrame:
        top = top.select("query_id", "neighbor_id").persist()  # <= q x k ids
        served = top.select("query_id").distinct()
        queries = served.agg(F.count(F.lit(1)).cast("bigint").alias("queries"))
        hits = top.join(gt, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).cast("bigint").alias("hits")
        )
        possible = gt.join(served, "query_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("possible")
        )
        return (
            queries.crossJoin(hits)
            .crossJoin(possible)
            .crossJoin(scored)
            .select(
                F.lit(name).alias("index_name"),
                F.lit(nprobe).cast("int").alias("nprobe"),
                F.lit(c).cast("int").alias("shortlist_c"),
                "queries",
                "hits",
                "possible",
                F.expr("hits * 1000000 div nullif(possible, 0)")
                .cast("bigint")
                .alias("recall_ppm"),
                F.col("scored_pairs").cast("bigint").alias("scored_pairs"),
                F.expr("scored_pairs * 1000 div nullif(queries, 0)")
                .cast("bigint")
                .alias("mean_scored_milli"),
            )
        )

    def count1(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("scored_pairs"))

    rows = []

    # flat: ground truth vs itself — recall 1.0 by construction; the cost
    # is the full cross scan, computed arithmetically (no second join).
    base = _vectors(spark, sf_dir)
    nq = base.filter(F.col("vec_id") % QUERY_MOD == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("nq")
    )
    nn = base.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    flat_scored = nq.crossJoin(nn).select(
        (F.col("nq") * (F.col("nn") - 1)).cast("bigint").alias("scored_pairs")
    )
    rows.append(metrics("flat", 1, 0, gt, flat_scored))

    # lsh: hyperplane-bucketed candidates (embeddings_knn_bucketed's stage).
    lb = base.withColumn("bucket", lsh_bucket(F.col("embedding"), _SIGNS))
    lq = lb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    lc = lb.select(F.col("vec_id").alias("neighbor_id"), "bucket")
    lsh_scored = count1(
        lq.join(lc, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    )
    rows.append(
        metrics("lsh", 1, 0, embeddings_knn_bucketed(spark, sf_dir), lsh_scored)
    )

    # ivf nprobe sweep: ONE probe-ranked query side (shared helper),
    # filtered per nprobe setting.
    q4, corp = _ivf_probe_sides(spark, sf_dir, max(REPORT_NPROBES))
    for p in REPORT_NPROBES:
        qp = q4.filter(F.col("probe_rank") <= p)
        top_p = cosine_topk(
            qp.drop("probe_rank"), corp, TOP_K, join_on=["cell"]
        )
        scored_p = count1(
            qp.select("query_id", "cell")
            .join(corp.select("neighbor_id", "cell"), "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        rows.append(metrics("ivf", p, 0, top_p, scored_p))

    # ivfpq: ADC shortlist + exact re-rank at each C (shared stages).
    cl = _ivfpq_cl(spark, sf_dir).persist()  # bounded codes frame; clearCache() policy as above
    wc = Window.partitionBy("query_id").orderBy(
        F.col("score_adc").desc(), F.col("neighbor_id")
    )
    cand_max = (
        _ivfpq_adc_scores(cl)
        .withColumn("adc_rank", F.row_number().over(wc))
        .filter(F.col("adc_rank") <= max(REPORT_CS))
        .select("query_id", "neighbor_id", "adc_rank")
        .persist()  # <= q x max(C) id rows; one ADC pass serves every C
    )
    cq = cl.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    cc = cl.select(F.col("vec_id").alias("neighbor_id"), "cell")
    pq_scored = count1(
        cq.join(cc, "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    )
    rows.append(
        metrics(
            "ivfpq_adc",
            1,
            0,
            cand_max.filter(F.col("adc_rank") <= TOP_K),
            pq_scored,
        )
    )
    for c in REPORT_CS:
        cand_c = cand_max.filter(F.col("adc_rank") <= c).select(
            "query_id", "neighbor_id"
        )
        rf_scored = pq_scored.crossJoin(
            count1(cand_c).withColumnRenamed("scored_pairs", "rf_pairs")
        ).select(
            (F.col("scored_pairs") + F.col("rf_pairs"))
            .cast("bigint")
            .alias("scored_pairs")
        )
        rows.append(
            metrics("ivfpq_refine", 1, c, _exact_rerank(cl, cand_c, TOP_K),
                    rf_scored)
        )

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- MMR-diversified retrieval ----------------------------------------------

MMR_C = 10  # exact-scored shortlist per query feeding the diversifier
MMR_K = 5  # diversified picks per query
# integer MMR objective: 2*relevance - max-sim-to-selected (the lambda=2/3
# point of lambda*rel - (1-lambda)*sim, scaled to stay in exact BIGINTs)
_MMR_KEY_SCALE = 1_000_000_000  # key = mmr*SCALE - neighbor_id: unique + orderable


def _sql_dot(a: str, b: str) -> str:
    return (
        f"CAST(list_reduce(list_transform(list_zip({a}, {b}),"
        f" p -> p[1] * p[2]), (acc, x) -> acc + x) AS BIGINT)"
    )


_MMR_NEXT = f"""list_position(
  list_transform(range(0, len(ids)), p -> CASE
    WHEN list_contains(sel, p) THEN NULL
    ELSE (2 * rels[p + 1]
          - COALESCE(list_max(list_transform(sel, s2 -> m[p + 1][s2 + 1])), 0))
         * {_MMR_KEY_SCALE} - ids[p + 1] END),
  list_max(
  list_transform(range(0, len(ids)), p -> CASE
    WHEN list_contains(sel, p) THEN NULL
    ELSE (2 * rels[p + 1]
          - COALESCE(list_max(list_transform(sel, s2 -> m[p + 1][s2 + 1])), 0))
         * {_MMR_KEY_SCALE} - ids[p + 1] END))) - 1"""


@register(
    "embeddings_knn_mmr_diversified",
    operators=(
        "LLM-ann-mmr (diversified retrieval: IVF-cell exact-int8 shortlist "
        "-> greedy maximal-marginal-relevance selection, integer 2:1 "
        "relevance:diversity objective folded as a pure expression over "
        "the per-query candidate matrix — the de-duplicating re-rank a "
        "RAG / retrieval pipeline runs after ANN)"
    ),
    oracle=f"""
WITH RECURSIVE sc AS (
  SELECT vec_id, {_sql_sq8('embedding')} AS qz,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
cl AS (
  SELECT vec_id, qz, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.qz AS cv,
         {_sql_dot('q.qz', 'c.qz')} AS rel
  FROM cl q JOIN cl c ON q.cell = c.cell
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
),
cand AS (
  SELECT * FROM (
    SELECT query_id, neighbor_id, cv, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, neighbor_id) AS rank
    FROM s
  ) WHERE rank <= {MMR_C}
),
pr AS (
  SELECT a.query_id, a.rank - 1 AS i, b.rank - 1 AS j,
         {_sql_dot('a.cv', 'b.cv')} AS sim
  FROM cand a JOIN cand b ON a.query_id = b.query_id
),
simrow AS (
  SELECT query_id, i, list(sim ORDER BY j) AS srow FROM pr GROUP BY query_id, i
),
mat AS (SELECT query_id, list(srow ORDER BY i) AS m FROM simrow GROUP BY query_id),
ca AS (
  SELECT query_id,
         list(neighbor_id ORDER BY rank) AS ids,
         list(rel ORDER BY rank) AS rels
  FROM cand GROUP BY query_id
),
pq AS (SELECT ca.query_id, ids, rels, m FROM ca JOIN mat USING (query_id)),
rec AS (
  SELECT query_id, ids, rels, m, 0 AS step, CAST([] AS BIGINT[]) AS sel
  FROM pq
  UNION ALL
  SELECT query_id, ids, rels, m, step + 1,
         CASE WHEN len(sel) >= len(ids) THEN sel
              ELSE list_append(sel, CAST(({_MMR_NEXT}) AS BIGINT)) END
  FROM rec WHERE step < {MMR_K}
),
fin AS (SELECT query_id, ids, rels, sel FROM rec WHERE step = {MMR_K}),
ex AS (
  SELECT query_id, ids, rels,
         UNNEST(range(1, len(sel) + 1)) AS mmr_rank,
         UNNEST(sel) AS p
  FROM fin
)
SELECT query_id, CAST(mmr_rank AS BIGINT) AS mmr_rank,
       ids[CAST(p AS INT) + 1] AS neighbor_id,
       rels[CAST(p AS INT) + 1] AS score_q
FROM ex
""",
)
def embeddings_knn_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k retrieval: the greedy maximal-marginal-relevance
    re-rank a retrieval/RAG pipeline runs AFTER ANN so the k results are
    not k near-duplicates of each other. Per query, the IVF cell's exact
    int8 shortlist (top-``MMR_C`` by relevance) is diversified by picking
    ``MMR_K`` results greedily under the integer objective
    ``2*rel(c) - max_sim(c, selected)`` (the lambda=2/3 MMR point; ties to
    the lowest neighbor id via the single orderable key
    ``mmr*1e9 - id``) — pick 1 is always the plain argmax-relevance, later
    picks trade relevance against similarity to what is already shown.

    The selection loop is NOT a driver loop and not a UDF: candidates fold
    per query into (ids, rels, C x C sim matrix) arrays — C is a constant,
    so the row is bounded — and the greedy recurrence runs as ONE
    ``F.aggregate`` expression over ``sequence(1, MMR_K)`` inside codegen
    (the oracle mirrors it with a recursive CTE, the
    docs_curated_shard_manifest discipline). All scores are exact int8
    inner products — BIGINT-exact cross-engine.

    Scale shape: one cell equi-join for the shortlist (the knn_ivf shape),
    one rank window bounded by cell occupancy, a candidate self-join
    bounded by C^2 = 100 rows per query, two (query, i)-keyed
    fold aggs, then a pure expression — no stage grows faster than
    queries x C^2 at any corpus size.
    """
    # select first: mapInArrow ships every input column (guide §4.1).
    emb = (
        _vectors(spark, sf_dir)
        .filter(F.size("embedding") == DIM)
        .select("vec_id", "embedding")
    )
    cl = with_ivf_cell(emb, "embedding", _CENTROIDS).select(
        "vec_id", "cell", _sq8(F.col("embedding")).alias("qz")
    )
    qs = cl.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "cell", F.col("qz").alias("qv")
    )
    cs = cl.select(F.col("vec_id").alias("neighbor_id"), "cell", F.col("qz").alias("cv"))
    rel = _fold_i(F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y))
    s = (
        qs.join(cs, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "cv", rel.alias("rel"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), "neighbor_id")
    cand = s.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= MMR_C
    )
    a = cand.select("query_id", (F.col("rank") - 1).alias("i"), F.col("cv").alias("av"))
    b = cand.select("query_id", (F.col("rank") - 1).alias("j"), F.col("cv").alias("bv"))
    pr = a.join(b, "query_id").select(
        "query_id",
        "i",
        "j",
        _fold_i(F.zip_with(F.col("av"), F.col("bv"), lambda x, y: x * y)).alias("sim"),
    )
    simrow = pr.groupBy("query_id", "i").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "sim"))),
            lambda x: x.getField("sim"),
        ).alias("srow")
    )
    mat = simrow.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "srow"))),
            lambda x: x.getField("srow"),
        ).alias("m")
    )
    ca = cand.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "neighbor_id"))),
            lambda x: x.getField("neighbor_id"),
        ).alias("ids"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "rel"))),
            lambda x: x.getField("rel"),
        ).alias("rels"),
    )
    pq = ca.join(mat, "query_id")

    def _keys(acc: F.Column) -> F.Column:
        return F.transform(
            F.sequence(F.lit(0), F.size(F.col("ids")) - 1),
            lambda p: F.when(
                F.array_contains(acc, p.cast("bigint")),
                F.lit(None).cast("bigint"),
            ).otherwise(
                (
                    2 * F.element_at(F.col("rels"), p + 1)
                    - F.coalesce(
                        F.array_max(
                            F.transform(
                                acc,
                                lambda s2: F.element_at(
                                    F.element_at(F.col("m"), p + 1),
                                    s2.cast("int") + 1,
                                ),
                            )
                        ),
                        F.lit(0),
                    )
                )
                * _MMR_KEY_SCALE
                - F.element_at(F.col("ids"), p + 1)
            ),
        )

    sel = F.aggregate(
        F.sequence(F.lit(1), F.lit(MMR_K)),
        F.expr("cast(array() as array<bigint>)"),
        lambda acc, _: F.when(F.size(acc) >= F.size(F.col("ids")), acc).otherwise(
            F.concat(
                acc,
                F.array(
                    (
                        F.array_position(_keys(acc), F.array_max(_keys(acc))) - 1
                    ).cast("bigint")
                ),
            )
        ),
    )
    return (
        pq.withColumn("sel", sel)
        .select("query_id", "ids", "rels", F.posexplode("sel").alias("r0", "p"))
        .select(
            "query_id",
            (F.col("r0") + 1).cast("bigint").alias("mmr_rank"),
            F.element_at(F.col("ids"), F.col("p").cast("int") + 1).alias(
                "neighbor_id"
            ),
            F.element_at(F.col("rels"), F.col("p").cast("int") + 1).alias("score_q"),
        )
    )


# --- incremental IVF index maintenance ---------------------------------------

IVF_INCR_MOD = 3  # vec_id % 3 == 1 plays the arriving batch (rest = ledger)
IVF_DRIFT_MAX_PPM = 20_000  # a cell's corpus share moving >= 2pp flags retrain


@register(
    "embeddings_ivf_incremental_drift",
    operators=(
        "LLM-ann-ivf-incremental (index maintenance AT INGEST: the arriving "
        "embedding batch is assigned to the EXISTING coarse cells — one "
        "scan of the batch, ledger untouched — and the per-cell occupancy "
        "report compares corpus shares before/after with an integer-ppm "
        "drift gate that flags when the quantizer needs retraining; the "
        "incremental-ingest pattern (docs_minhash_incremental_neardup) "
        "applied to the ANN index)"
    ),
    oracle=f"""
WITH sc AS (
  SELECT vec_id,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
cl AS (
  SELECT vec_id, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
agg AS (
  SELECT cell,
         CAST(COUNT(CASE WHEN vec_id % {IVF_INCR_MOD} <> 1 THEN 1 END) AS BIGINT)
           AS ledger_cnt,
         CAST(COUNT(CASE WHEN vec_id % {IVF_INCR_MOD} = 1 THEN 1 END) AS BIGINT)
           AS batch_cnt
  FROM cl GROUP BY cell
),
sp AS (
  SELECT CAST(c AS INT) AS cell,
         COALESCE(a.ledger_cnt, 0) AS ledger_cnt,
         COALESCE(a.batch_cnt, 0) AS batch_cnt
  FROM range({IVF_CELLS}) r(c) LEFT JOIN agg a ON a.cell = r.c
),
tot AS (
  SELECT CAST(SUM(ledger_cnt) AS BIGINT) AS ledger_tot,
         CAST(SUM(ledger_cnt + batch_cnt) AS BIGINT) AS grand_tot
  FROM sp
),
s AS (
  SELECT cell, ledger_cnt, batch_cnt,
         CAST(ledger_cnt * 1000000 // NULLIF(ledger_tot, 0) AS BIGINT)
           AS before_ppm,
         CAST((ledger_cnt + batch_cnt) * 1000000 // NULLIF(grand_tot, 0)
              AS BIGINT) AS after_ppm
  FROM sp CROSS JOIN tot
)
SELECT cell, ledger_cnt, batch_cnt, before_ppm, after_ppm,
       CAST(abs(after_ppm - before_ppm) AS BIGINT) AS drift_ppm,
       abs(after_ppm - before_ppm) >= {IVF_DRIFT_MAX_PPM} AS retrain
FROM s
""",
)
def embeddings_ivf_incremental_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance at ingest: an arriving embedding batch
    (``vec_id % IVF_INCR_MOD == 1`` plays the new data) is assigned to
    the EXISTING coarse-quantizer cells — the production move, since
    re-clustering the corpus per ingest is impossible — and the per-cell
    occupancy report answers the one question an index operator asks:
    did the data distribution drift enough that the quantizer needs
    retraining? Per cell (zero-filled over the full 8-cell ``IVF_CELLS``
    bank): ledger/batch counts, integer-ppm corpus share before vs after
    the ingest, absolute drift, and the retrain flag at
    ``IVF_DRIFT_MAX_PPM`` = 20,000 ppm (2 pp). When the flag fires, the Lloyd
    kernel (operators/clustering.py) retrains and the codes re-encode in
    one scan (the embeddings_ivfpq_adc_knn docstring's index lifecycle).

    Scale shape: ONE scan assigning cells (the shared ``with_ivf_cell``
    argmax expression — at ingest only the batch is scanned; here both
    sides are derived from one table so the split is by id), a
    partial-aggregated groupBy onto the cell-bank-row space, the
    literal cell spine zero-fill, and the 1-row broadcast totals — no
    stage beyond the scan exceeds cell-bank cardinality.
    """
    # select first: mapInArrow ships every input column (guide §4.1).
    emb = (
        _vectors(spark, sf_dir)
        .filter(F.size("embedding") == DIM)
        .select("vec_id", "embedding")
    )
    cl = with_ivf_cell(emb, "embedding", _CENTROIDS).select("vec_id", "cell")
    agg = cl.groupBy("cell").agg(
        F.count(F.when(F.col("vec_id") % IVF_INCR_MOD != 1, 1))
        .cast("bigint")
        .alias("ledger_cnt"),
        F.count(F.when(F.col("vec_id") % IVF_INCR_MOD == 1, 1))
        .cast("bigint")
        .alias("batch_cnt"),
    )
    spine = spark.range(IVF_CELLS).select(F.col("id").cast("int").alias("cell"))
    sp = spine.join(agg, "cell", "left").select(
        "cell",
        F.coalesce(F.col("ledger_cnt"), F.lit(0)).cast("bigint").alias("ledger_cnt"),
        F.coalesce(F.col("batch_cnt"), F.lit(0)).cast("bigint").alias("batch_cnt"),
    )
    tot = sp.agg(
        F.sum("ledger_cnt").cast("bigint").alias("ledger_tot"),
        F.sum(F.col("ledger_cnt") + F.col("batch_cnt"))
        .cast("bigint")
        .alias("grand_tot"),
    )
    s = sp.crossJoin(F.broadcast(tot)).select(
        "cell",
        "ledger_cnt",
        "batch_cnt",
        F.expr("cast(ledger_cnt * 1000000 div nullif(ledger_tot, 0) as bigint)")
        .alias("before_ppm"),
        F.expr(
            "cast((ledger_cnt + batch_cnt) * 1000000 div nullif(grand_tot, 0)"
            " as bigint)"
        ).alias("after_ppm"),
    )
    return s.select(
        "cell",
        "ledger_cnt",
        "batch_cnt",
        "before_ppm",
        "after_ppm",
        F.abs(F.col("after_ppm") - F.col("before_ppm"))
        .cast("bigint")
        .alias("drift_ppm"),
        (
            F.abs(F.col("after_ppm") - F.col("before_ppm")) >= IVF_DRIFT_MAX_PPM
        ).alias("retrain"),
    )
