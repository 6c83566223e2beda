"""Deterministic sampling operators for LLM training-data pipelines.

Real pipelines sample constantly — per-source mixing ratios, fixed-size
dev/eval splits, downsampling over-represented crawls. ``df.sample()`` is
non-reproducible across runs/partitionings, so the scale-correct tool is
HASH-GATED sampling: a per-row md5-derived uniform compared against a
rate. Properties that matter at 100 TB:

- **Reproducible**: the kept set is a pure function of the data, not of
  partitioning, task retries, or cluster size (idempotent re-runs — same
  property the reference gets from keyed MERGE idempotency, S6-S10).
- **Expression-only**: the gate is a codegen'd filter on the scan — no
  shuffle, no UDF; predicate pushdown and column pruning survive.
- **Stratified for free**: the rate is any per-row expression, so
  per-source / per-language / per-quality-band rates need no extra pass.

The fixed-size variant (``docs_reservoir_per_source``) is the reservoir-k
equivalent: rank by the same hash within each stratum and keep the first
k — deterministic "uniform without replacement". One partitioned window;
at extreme per-stratum skew swap in the two-stage top-k
(operators/skew.py) — same semantics, pre-aggregated shuffle.

No reference parity (the reference has no sampling surface); this is the
brief-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.functions.text import md5_long, sql_md5_long
from inspig_etl_spark.queries import register

PPM = 1_000_000
# Per-source target rates (ppm): derived from the source name so the
# stratification is visibly non-uniform — src0..src4 ~20%, src15+ ~65%.
# TRY_CAST + COALESCE: source names are data, not schema — a regenerated
# corpus with names not shaped 'src<digits>' ('web', 'wiki') must degrade
# to the length-derived rate, not abort both engines with a cast error
# (the repo's X18 junk->NULL convention).
_SQL_RATE = (
    "(200000 + (LENGTH(source) % 3) * 150000"
    " + (COALESCE(TRY_CAST(SUBSTRING(source, 4, 2) AS INT), 0) % 5) * 30000)"
)
_SQL_GATE_HASH = sql_md5_long("'smp' || CAST(doc_id AS VARCHAR)") + f" % {PPM}"


def _rate_col() -> F.Column:
    return (
        200000
        + (F.length("source") % 3) * 150000
        + (F.coalesce(F.substring("source", 4, 2).try_cast("int"), F.lit(0)) % 5)
        * 30000
    )


def _gate_hash() -> F.Column:
    return md5_long(F.concat(F.lit("smp"), F.col("doc_id").cast("string"))) % PPM


@register(
    "docs_stratified_hash_sample",
    operators="LLM-sample-stratified (deterministic per-source rate sampling: md5-uniform gate vs per-stratum ppm rate, reproducible under any partitioning; brief: training-data pipeline ops)",
    oracle=f"""
SELECT doc_id, source,
       {_SQL_RATE} AS rate_ppm
FROM documents
WHERE {_SQL_GATE_HASH} < {_SQL_RATE}
""",
)
def docs_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.where(_gate_hash() < _rate_col()).select(
        "doc_id", "source", _rate_col().alias("rate_ppm")
    )


RESERVOIR_K = 5


@register(
    "docs_reservoir_per_source",
    operators="LLM-sample-reservoir (fixed-k per-stratum sample: rank by md5-uniform inside each source, keep first k — deterministic reservoir equivalent; brief: training-data pipeline ops)",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {sql_md5_long("'rsv' || CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS pick_no
  FROM documents
)
SELECT doc_id, source, CAST(pick_no AS INT) AS pick_no
FROM ranked WHERE pick_no <= {RESERVOIR_K}
""",
)
def docs_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("rsv"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("int").alias("pick_no"))
        .where(F.col("pick_no") <= RESERVOIR_K)
    )


# Per-source mixing weight in ppm (1.0x..3.25x): integer end-to-end.
_SQL_W_PPM = "(1000000 + (LENGTH(source) % 4) * 750000)"


@register(
    "docs_mix_weighted_epochs",
    operators="LLM-sample-mix (weighted data mixing with fractional epochs: full repeats via explode(sequence), fractional remainder via the hash gate; brief: training-data pipeline ops)",
    oracle=f"""
WITH w AS (
  SELECT doc_id, source,
         CAST(FLOOR({_SQL_W_PPM} / 1000000.0) AS INT)
         + CASE WHEN {sql_md5_long("'mix' || CAST(doc_id AS VARCHAR)")} % {PPM}
                     < {_SQL_W_PPM} % {PPM}
                THEN 1 ELSE 0 END AS epochs
  FROM documents
)
SELECT doc_id, source, CAST(unnest(generate_series(1, epochs)) AS INT) AS epoch_no
FROM w
""",
)
def docs_mix_weighted_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: each source gets a fractional repetition factor (e.g.
    2.5 epochs = every doc twice, a deterministic hash-picked half a third
    time) — how curated corpora up-weight high-quality sources without a
    random sampler. Weights are integer ppm end-to-end; the repeat is
    ``explode(sequence(1, epochs))`` — per-row generation, no join, no
    shuffle, and the output row count is exactly ``sum(epochs)``.
    """
    docs = table(spark, sf_dir, "documents")
    w_ppm = 1000000 + (F.length("source") % 4) * 750000
    gate = md5_long(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))) % PPM
    epochs = (
        F.floor(w_ppm / F.lit(1000000.0)).cast("int")
        + F.when(gate < w_ppm % PPM, 1).otherwise(0)
    )
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), epochs)).alias("epoch_no"),
    )


N_SHARDS = 8


@register(
    "docs_shard_assignment",
    operators=(
        "LLM-shard-shuffle (deterministic hash-based global shuffle into "
        "training shards: shard id + within-shard position are pure "
        "functions of the data — the last step of every pretraining "
        "pipeline before the tokenizer/packer reads shards sequentially)"
    ),
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         {sql_md5_long("'shard' || CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard,
         {sql_md5_long("'ord' || CAST(doc_id AS VARCHAR)")} AS ord_h
  FROM documents
)
SELECT doc_id, CAST(shard AS INT) AS shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_h, doc_id) AS pos
FROM s
""",
)
def docs_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into N training shards.

    ``shard`` and the within-shard ``pos`` are md5-derived pure functions
    of doc_id — re-running on a different cluster, partitioning, or retry
    yields byte-identical shards (the property ``df.orderBy(rand())``
    famously lacks). Two INDEPENDENT hashes (domain-separated 'shard'/'ord'
    prefixes): with a single hash, position within a shard would be ordered
    by the same residue classes that chose the shard — correlated, not
    uniform.

    Scale shape: one shuffle on ``shard`` for the position window. At
    100 TB with millions of rows per shard, swap the global per-shard
    row_number for (shard, hash-range bucket) composite positions written
    via ``repartitionByRange(shard, ord_h).sortWithinPartitions`` — same
    determinism, no single-reducer-per-shard window; kept as the window
    form here because N_SHARDS bounds the reducer count, not the data.
    """
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        (md5_long(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))) % N_SHARDS)
        .cast("int")
        .alias("shard"),
        md5_long(F.concat(F.lit("ord"), F.col("doc_id").cast("string"))).alias("ord_h"),
    )
    w = Window.partitionBy("shard").orderBy("ord_h", "doc_id")
    return s.select("doc_id", "shard", F.row_number().over(w).alias("pos"))
