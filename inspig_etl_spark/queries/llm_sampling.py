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

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.functions.text import (
    md5_long,
    sql_md5_long,
    sql_token_hashes,
    sql_token_ngram_hashes_positional,
    sql_tokens,
    token_hashes,
    token_ngram_hashes_positional,
    tokens,
)
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


# DSIR hashed-bigram feature space. Production uses ~10k buckets (Xie et
# al. 2023 use 10^4 hashed unigram+bigram features); 256 keeps the sf0.01
# bucket table readable while exercising the identical plan shape.
DSIR_B = 256


@register(
    "docs_dsir_importance_sample",
    operators=(
        "LLM-sample-dsir (DSIR-style data selection: hashed-bigram "
        "importance ratios target/raw per feature bucket, per-doc mean "
        "ratio, importance-proportional deterministic hash gate — the "
        "distribution-matching selection step between quality filtering "
        "and mixing; integer fixed-point end-to-end)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, COALESCE(lang = 'en', FALSE) AS is_t,
         {sql_tokens('text')} AS toks
  FROM documents
),
h AS (
  SELECT doc_id, source, is_t, {sql_token_hashes('toks')} AS hs FROM t
),
g AS (
  SELECT doc_id, source, is_t,
         list_transform({sql_token_ngram_hashes_positional('hs', 2)},
                        x -> x % {DSIR_B}) AS bs
  FROM h
),
e AS (SELECT doc_id, is_t, unnest(bs) AS b FROM g),
bt AS (
  SELECT b,
         (COUNT(*) FILTER (WHERE is_t) + 1) * {PPM} // (COUNT(*) + 1)
           AS ratio_e6
  FROM e GROUP BY b
),
ds AS (
  SELECT e.doc_id, COUNT(*) AS n_grams,
         SUM(ratio_e6) // COUNT(*) AS avg_ratio_e6
  FROM e JOIN bt USING (b) GROUP BY e.doc_id
),
base AS (
  SELECT g.doc_id, g.source,
         CAST(COALESCE(ds.n_grams, 0) AS BIGINT) AS n_grams,
         CAST(COALESCE(ds.avg_ratio_e6, 0) AS BIGINT) AS avg_ratio_e6
  FROM g LEFT JOIN ds USING (doc_id)
),
m AS (
  SELECT CAST(SUM(avg_ratio_e6) // COUNT(*) AS BIGINT) AS mean_e6 FROM base
)
SELECT doc_id, source, n_grams, avg_ratio_e6,
       CAST(CASE WHEN {sql_md5_long("'dsir' || CAST(doc_id AS VARCHAR)")}
                      % NULLIF(2 * mean_e6, 0) < avg_ratio_e6
                 THEN 1 ELSE 0 END AS INT) AS kept
FROM base CROSS JOIN m
""",
)
def docs_dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw doc by
    how target-like its hashed-bigram distribution is, then keep docs with
    probability proportional to that importance — matching the selected
    corpus to the target distribution instead of hard-filtering.

    Deterministic integer re-expression of the paper's estimator:

    - features: positional hashed bigrams mod ``DSIR_B`` buckets (the
      paper's hashed n-gram generative model);
    - per-bucket importance ratio with add-one smoothing,
      ``(cnt_target+1) * 1e6 div (cnt_raw+1)`` — the target here is the
      ``lang='en'`` slice (production points this at the curated corpus);
      Laplace smoothing keeps unseen buckets finite, exactly the paper's
      smoothed bag-of-hashed-ngrams;
    - per-doc weight: integer mean bucket ratio over the doc's bigrams
      (the log-sum becomes a ratio-mean — same ordering for docs of equal
      length, and bit-stable across engines where float log is not);
    - selection: md5 gate modulo twice the corpus-mean weight — keep
      probability ``min(1, w/(2*mean))``, importance-proportional and
      reproducible under any partitioning/retry (Gumbel-top-k in the paper,
      the repo's standard hash gate here).

    Scale shape: two linear shuffles over the exploded bigrams (bucket agg,
    doc re-agg) + one doc-level left join; the 256-row bucket table and the
    1-row corpus mean attach as broadcasts (the declared 1-row-scalar
    crossJoin pattern). BIGINT headroom: per-bucket counts would overflow
    the e6 product only past ~9e12 bigrams PER BUCKET — at 100 TB with the
    production 10k-bucket space that is ~1e17 tokens of corpus, far beyond
    the data; the bucket table stays broadcast-sized at any corpus.
    """
    docs = spread(table(spark, sf_dir, "documents"))
    # persist(): g (scan + tokenize + per-token md5 + bigram hashing) feeds
    # THREE consumers — the bucket-ratio agg, the per-doc re-agg, and the
    # doc-universe left join — and without materialization each one re-runs
    # the whole tokenize pipeline (3 full passes in the executed plan,
    # measured; the same rationale as _lex_frames' persisted postings).
    # clearCache() after the action is the session-level unpersist.
    g = (
        docs.select(
            "doc_id",
            "source",
            F.coalesce(F.col("lang") == "en", F.lit(False)).alias("is_t"),
            tokens(F.col("text")).alias("toks"),
        )
        .withColumn("hs", token_hashes(F.col("toks")))
        .select(
            "doc_id",
            "source",
            "is_t",
            F.transform(
                token_ngram_hashes_positional(F.col("hs"), 2),
                lambda x: x % DSIR_B,
            ).alias("bs"),
        )
        .persist()
    )
    e = g.select("doc_id", "is_t", F.explode("bs").alias("b"))
    bt = e.groupBy("b").agg(
        F.expr(f"(count_if(is_t) + 1) * {PPM} div (count(*) + 1)").alias("ratio_e6")
    )
    ds = (
        e.join(F.broadcast(bt), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.expr("sum(ratio_e6) div count(*)").alias("avg_ratio_e6"),
        )
    )
    base = (
        g.select("doc_id", "source")
        .join(ds, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("avg_ratio_e6"), F.lit(0))
            .cast("bigint")
            .alias("avg_ratio_e6"),
        )
    )
    m = base.agg(
        F.expr("cast(sum(avg_ratio_e6) div count(*) as bigint)").alias("mean_e6")
    )
    gate = md5_long(F.concat(F.lit("dsir"), F.col("doc_id").cast("string")))
    return base.crossJoin(F.broadcast(m)).select(
        "doc_id",
        "source",
        "n_grams",
        "avg_ratio_e6",
        F.when(
            gate % F.nullif(F.lit(2) * F.col("mean_e6"), F.lit(0))
            < F.col("avg_ratio_e6"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("kept"),
    )


@register(
    "docs_training_mix_report",
    operators=(
        "LLM-mix-report (training-mixture accounting: per source x language "
        "doc/token counts and ppm token shares — the table every mixing- "
        "weight decision reads; integer shares via the 1-row broadcast "
        "total)"
    ),
    oracle=f"""
WITH t AS (
  SELECT source, COALESCE(lang, '??') AS lang,
         COALESCE(len({sql_tokens('text')}), 0) AS n_toks
  FROM documents
),
agg AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
  FROM t GROUP BY source, lang
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM agg)
SELECT source, lang, n_docs, n_tokens,
       CAST(n_tokens * {PPM} // NULLIF(tot_tokens, 0) AS BIGINT) AS share_ppm
FROM agg CROSS JOIN tot
""",
)
def docs_training_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix accounting: per (source, language) doc and token counts
    plus each cell's ppm share of all tokens — the observability table a
    pipeline reads before setting the mixing weights that
    ``docs_mix_weighted_epochs`` then applies.

    Scale shape: one partial-aggregated groupBy to source x lang cells (a
    bounded-cardinality frame at any corpus size), then the corpus total
    attaches as the declared 1-row broadcast scalar; shares are integer ppm
    (bit-stable; NULLIF-guarded for the empty corpus).
    """
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.coalesce(F.col("lang"), F.lit("??")).alias("lang"),
        F.coalesce(F.size(tokens(F.col("text"))), F.lit(0)).alias("n_toks"),
    )
    agg = t.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
    )
    tot = agg.agg(F.sum("n_tokens").cast("bigint").alias("tot_tokens"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.expr(f"cast(n_tokens * {PPM} div nullif(tot_tokens, 0) as bigint)").alias(
            "share_ppm"
        ),
    )


PRIORITY_K = 25


@register(
    "docs_weighted_priority_sample",
    operators=(
        "LLM-sample-weighted (size-weighted priority sample: each doc draws "
        "a deterministic md5 uniform and races at speed proportional to its "
        "char count — one global top-k, no shuffle of the corpus; brief: "
        "training-data pipeline ops)"
    ),
    oracle=f"""
WITH w AS (
  SELECT doc_id, source,
         GREATEST(COALESCE(n_chars, 1), 1) AS weight,
         {sql_md5_long("'wps' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
SELECT doc_id, source, weight, h // weight AS priority
FROM w
ORDER BY priority, doc_id
LIMIT {PRIORITY_K}
""",
)
def docs_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k sample where longer documents are proportionally likelier —
    the curation pass that oversamples substantive pages without a
    per-stratum rate table.

    Policy: doc i draws the 60-bit md5 uniform ``h_i`` and gets priority
    ``h_i div w_i`` (w = char count, floored at 1); the k smallest
    priorities win. This is a deterministic uniform race — selection odds
    rise monotonically with weight, and the kept set is a pure function of
    the data (same reproducibility contract as the hash-gate samplers
    above). The float-exact Efraimidis-Spirakis scheme replaces h with
    -ln(h); it needs ln() so it cannot be bit-gated cross-engine — the
    integer race is the oracle-checkable analogue with the same one-pass
    plan.

    Scale shape: priority is a scan-time expression and the global top-k
    compiles to TakeOrderedAndProject (per-partition heaps, k rows to the
    driver) — no corpus shuffle at any size. DuckDB ``//`` and Spark
    ``div`` agree on the non-negative operands here.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(1)), F.lit(1))
        .cast("bigint")
        .alias("weight"),
        md5_long(F.concat(F.lit("wps"), F.col("doc_id").cast("string"))).alias("h"),
    ).withColumn("priority", F.expr("h div weight"))
    return (
        d.orderBy("priority", "doc_id")
        .limit(PRIORITY_K)
        .select("doc_id", "source", "weight", "priority")
    )


# --- curriculum ordering ----------------------------------------------------
#
# A pretraining run does not read shards in doc_id order: curriculum
# schedules feed cleaner text first and shuffle deterministically inside
# each difficulty stage (otherwise a restart replays a different corpus).
# The ORDER itself is the artifact — a manifest column consumers sort by —
# and materializing an integer position for every doc is where naive plans
# die at 100 TB: ``ROW_NUMBER() OVER (ORDER BY ...)`` with no partition
# spec is a single-partition sort of the whole corpus.
#
# This kernel materializes the exact same positions with the two-phase
# distributed ranking used by every at-scale sorter (count per sort-key
# range bucket -> tiny cumulative-offset table -> broadcast back -> rank
# inside the bucket and add the offset): the only unpartitioned work is a
# window over CUR_B rows per stage.
CUR_KEY_MOD = 1_000_000  # intra-stage shuffle key domain (md5-derived)
CUR_B = 8  # sort-key range buckets per stage — the parallelism knob
_CUR_BUCKET_W = CUR_KEY_MOD // CUR_B


def _curriculum_oracle() -> str:
    from inspig_etl_spark.queries.llm_text import (
        _QBS_HEAD,
        _QBS_TAIL,
        _SQL_CLS_FEATURES,
        _SQL_CLS_LOGIT,
        _SQL_TOKS,
    )

    return f"""
WITH t AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
),
s AS (
  SELECT doc_id, source, {_SQL_CLS_LOGIT} AS logit_e4 FROM f
),
k AS (
  SELECT doc_id, source, logit_e4,
         CAST(CASE WHEN logit_e4 >= {_QBS_HEAD} THEN 1
                   WHEN logit_e4 >= {_QBS_TAIL} THEN 2
                   ELSE 3 END AS BIGINT) AS stage,
         {sql_md5_long("'cur' || CAST(doc_id AS VARCHAR)")} % {CUR_KEY_MOD}
           AS sort_key
  FROM s
)
SELECT doc_id, source, logit_e4, stage, sort_key,
       CAST(ROW_NUMBER() OVER (PARTITION BY stage
                               ORDER BY sort_key, doc_id) AS BIGINT)
         AS stage_pos
FROM k
"""


@register(
    "docs_curriculum_order",
    operators=(
        "LLM-curriculum-order (deterministic training-order manifest: "
        "classifier-logit difficulty stages consumed clean-first, md5 "
        "intra-stage shuffle key, and an EXACT per-stage position "
        "materialized by two-phase distributed ranking — per-range-bucket "
        "counts, a broadcast cumulative-offset table, then rank-in-bucket "
        "+ offset — never a global single-partition window)"
    ),
    oracle=_curriculum_oracle(),
)
def docs_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training-order manifest with exact integer positions.

    Semantics (the oracle states them directly): stage 1 = classifier
    logit >= head threshold (cleanest text, consumed first), stage 2 =
    middle, stage 3 = tail; within a stage the order is a deterministic
    md5 shuffle key (restart-stable, partitioning-independent), and
    ``stage_pos`` is the doc's 1-based position in that order.

    The Spark plan is the 100 TB shape, NOT the oracle's global window:

    1. per-row stage / sort_key expressions on the scan;
    2. ``bucket = sort_key div bucket_width`` — monotone in sort_key, so
       bucket boundaries respect the order (md5 keys are uniform, so the
       CUR_B buckets balance; raise CUR_B with corpus size);
    3. count per (stage, bucket) -> cumulative offsets via a window over
       <= CUR_B rows per stage (the only unpartitioned-ish work, bounded
       by a constant) -> broadcast join back;
    4. ``row_number`` partitioned by (stage, bucket) — each partition is
       ~|stage|/CUR_B rows — plus the bucket's offset.

    Equality with the oracle's single ROW_NUMBER is the correctness gate
    for the offset composition (an off-by-one anywhere shifts every
    position after it).
    """
    from inspig_etl_spark.queries.llm_text import (
        _QBS_HEAD,
        _QBS_TAIL,
        _cls_logit_frame,
    )

    scored = _cls_logit_frame(spark, sf_dir).select("doc_id", "source", "logit_e4")
    stage = (
        F.when(F.col("logit_e4") >= _QBS_HEAD, 1)
        .when(F.col("logit_e4") >= _QBS_TAIL, 2)
        .otherwise(3)
        .cast("bigint")
    )
    sort_key = (
        md5_long(F.concat(F.lit("cur"), F.col("doc_id").cast("string"))) % CUR_KEY_MOD
    )
    # persist(): two-phase ranking inherently reads the corpus twice (pass
    # 1 counts buckets, pass 2 ranks inside them) — materializing the
    # NARROW projection (ids + stage/key, no text) makes the second pass
    # read 5 small columns instead of re-running tokenization + classifier
    # features over the raw text (the .explain audit showed two full
    # feature scans otherwise). Multi-query sessions clearCache() after.
    base = (
        scored.select(
            "doc_id",
            "source",
            "logit_e4",
            stage.alias("stage"),
            sort_key.alias("sort_key"),
        )
        .withColumn("bucket", F.expr(f"sort_key div {_CUR_BUCKET_W}"))
        .persist()
    )
    counts = base.groupBy("stage", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cum = Window.partitionBy("stage").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "stage",
        "bucket",
        F.coalesce(F.sum("n").over(cum), F.lit(0).cast("bigint")).alias("offset"),
    )
    ranked = base.join(F.broadcast(offsets), ["stage", "bucket"])
    in_bucket = Window.partitionBy("stage", "bucket").orderBy("sort_key", "doc_id")
    return ranked.select(
        "doc_id",
        "source",
        "logit_e4",
        "stage",
        "sort_key",
        (F.col("offset") + F.row_number().over(in_bucket))
        .cast("bigint")
        .alias("stage_pos"),
    )
