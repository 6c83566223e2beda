"""Near-duplicate detection queries over ``documents`` (LLM-data-pipeline).

Three detectors, all bucketed — candidate pairs only ever form inside a
hash bucket, never via an all-pairs join — then exactly verified:

- ``docs_ngram_jaccard_pairs``: shared-shingle blocking + exact Jaccard.
- ``docs_minhash_neardup_pairs``: MinHash(16) → LSH 4x4 banding → Jaccard.
- ``docs_simhash_neardup_pairs``: 32-bit SimHash → byte banding → Hamming.

Because every hash is md5-derived (functions/text.md5_long), even the LSH
internals are bit-reproducible in DuckDB — each query carries a full oracle,
stronger than the usual rows-only check for sketch-based operators.

Scale: shuffle is O(bands x |docs|) for banding and O(|candidates|) for
verification. The shared-shingle blocker is the recall=1 baseline (its
candidate count grows with shingle collisions); MinHash banding is the
100 TB default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.functions.text import (
    sql_md5_long,
    sql_token_hashes,
    sql_token_ngram_hashes_from,
    sql_token_ngram_hashes_positional,
    sql_tokens,
    token_hashes,
    token_ngram_hashes_from,
    token_ngram_hashes_positional,
    tokens,
)
from inspig_etl_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_ROWS,
    SHINGLE_N,
    SQL_JACCARD,
    jaccard_verify,
    lsh_band_keys,
    lsh_candidate_pairs,
    minhash_signature,
    simhash32,
    simhash_band_keys,
    sql_minhash_sig,
)
from inspig_etl_spark.queries import register

HAMMING_MAX = 6

# Shared oracle CTEs: per-token hashes, then distinct hashed 3-token
# shingles (array<bigint> — the same arithmetic combination Spark uses).
_SQL_DOCS_SHINGLED = (
    f"th AS (SELECT doc_id, {sql_token_hashes(sql_tokens('text'))} AS hs FROM documents),\n"
    f"t AS (SELECT doc_id, {sql_token_ngram_hashes_from('hs', SHINGLE_N)} AS sh FROM th)"
)

# Exact Jaccard between two shingle-set columns (a.sh, b.sh), both distinct.
# (Defined in operators/dedup.py so other query modules' oracles can share
# it without importing this registering module.)
_SQL_JACCARD = SQL_JACCARD


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # persist(): the shingle/signature subtrees feed SELF-JOINS — without
    # materialization Spark recomputes the md5-heavy pipeline once per join
    # branch (measured 10x slower at sf0.1). Same load-once-process-many
    # pattern as the reference's per-farm cache (data_loader.py:93-100).
    # Two projections: token hashes bound as a column FIRST, shingles
    # derived from it — one md5 pass per token total.
    hashed_toks = spread(docs).select(
        "doc_id", token_hashes(tokens(F.col("text"))).alias("hs")
    )
    return hashed_toks.select(
        "doc_id", token_ngram_hashes_from(F.col("hs"), SHINGLE_N).alias("sh")
    ).persist()


@register(
    "docs_ngram_jaccard_pairs",
    operators="LLM-dedup-jaccard (shared-shingle blocking + exact n-gram Jaccard; brief: 'n-gram Jaccard')",
    oracle=f"""
WITH {_SQL_DOCS_SHINGLED},
x AS (SELECT doc_id, unnest(sh) AS s FROM t),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM x l JOIN x r ON l.s = r.s AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, {_SQL_JACCARD} AS jaccard
FROM cand JOIN t a ON cand.id_a = a.doc_id JOIN t b ON cand.id_b = b.doc_id
WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
""",
)
def docs_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingled(spark, sf_dir)
    x = sh.select("doc_id", F.explode("sh").alias("s"))
    left = x.select(F.col("doc_id").alias("id_a"), "s")
    right = x.select(F.col("doc_id").alias("id_b"), "s")
    cand = (
        left.join(right, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_verify(cand, sh, "doc_id", "sh", JACCARD_THRESHOLD)


# DuckDB expression list for the 16 signature minima over `sh` — shared
# from operators/dedup.py (see _SQL_JACCARD note).
_sql_minhash_sig = sql_minhash_sig


@register(
    "docs_minhash_neardup_pairs",
    operators="LLM-dedup-minhash (MinHash sigs + LSH banding + Jaccard verify; brief: 'MinHash+LSH (shingle->minhash->band->bucket-join)')",
    oracle=f"""
WITH {_SQL_DOCS_SHINGLED},
-- zero-shingle docs share the sentinel signature [P]*k: at scale they
-- would all land in ONE band bucket and the bucket self-join would
-- degenerate to all-pairs; they can never verify (union 0), so they
-- are excluded from banding (mirrored in the Spark plan)
sig AS (SELECT doc_id, sh, {_sql_minhash_sig()} AS sig FROM t WHERE len(sh) > 0),
band AS (
  SELECT doc_id, band_no,
         CAST(('0x' || substr(md5(array_to_string(sig[band_no * {MINHASH_ROWS} + 1 : band_no * {MINHASH_ROWS} + {MINHASH_ROWS}], '_')), 1, 15)) AS BIGINT) AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band_no)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM band l JOIN band r
    ON l.band_no = r.band_no AND l.band_key = r.band_key AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, {_SQL_JACCARD} AS jaccard
FROM cand JOIN t a ON cand.id_a = a.doc_id JOIN t b ON cand.id_b = b.doc_id
WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
""",
)
def docs_minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingled(spark, sf_dir)
    # Zero-shingle docs are excluded from banding: they share the sentinel
    # signature, so at scale they would pile into ONE band bucket whose
    # self-join degenerates to the all-pairs comparison banding exists to
    # avoid — and they can never pass Jaccard verification anyway.
    signed = sh.filter(F.size("sh") > 0).withColumn(
        "sig", minhash_signature(F.col("sh"))
    )
    banded = signed.withColumn(
        "band_keys", lsh_band_keys(F.col("sig"), MINHASH_BANDS, MINHASH_ROWS)
    ).persist()  # consumed twice by the candidate self-join
    cand = lsh_candidate_pairs(banded, "doc_id", "band_keys", MINHASH_BANDS)
    return jaccard_verify(cand, sh, "doc_id", "sh", JACCARD_THRESHOLD)


# The "arriving batch" slice for the incremental detector: every third doc
# plays the new micro-batch, the rest play the already-indexed ledger (the
# same deterministic split stream_incremental_dedup uses for its batches).
INCR_BATCH_MOD = 3


@register(
    "docs_minhash_incremental_neardup",
    operators=(
        "LLM-dedup-minhash-incremental (near-dup detection AT INGEST: the "
        "arriving batch's LSH bands probe the persisted band index of the "
        "ledger — candidate pairs only ever form batch-vs-ledger inside a "
        "band bucket, so the incremental cost is O(batch), not O(corpus); "
        "the streaming-corpus form of docs_minhash_neardup_pairs)"
    ),
    oracle=f"""
WITH {_SQL_DOCS_SHINGLED},
sig AS (SELECT doc_id, sh, {_sql_minhash_sig()} AS sig FROM t WHERE len(sh) > 0),
band AS (
  SELECT doc_id, band_no,
         CAST(('0x' || substr(md5(array_to_string(sig[band_no * {MINHASH_ROWS} + 1 : band_no * {MINHASH_ROWS} + {MINHASH_ROWS}], '_')), 1, 15)) AS BIGINT) AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band_no)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM band l JOIN band r
    ON l.band_no = r.band_no AND l.band_key = r.band_key
   AND l.doc_id % {INCR_BATCH_MOD} = 0 AND r.doc_id % {INCR_BATCH_MOD} <> 0
)
SELECT id_a AS new_id, id_b AS ledger_id, {_SQL_JACCARD} AS jaccard
FROM cand JOIN t a ON cand.id_a = a.doc_id JOIN t b ON cand.id_b = b.doc_id
WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
""",
)
def docs_minhash_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection for an ARRIVING batch against the indexed corpus.

    A continuously-fed pipeline cannot re-run all-pairs (or even
    all-bands-self-join) LSH per ingest; it keeps the corpus's banded
    signatures as a persisted index and probes it with only the new
    batch's bands. Here every third doc plays the arriving batch and the
    rest the ledger: both are banded with the shared MinHash(16)/4x4
    machinery, candidates form ONLY where a batch band key equals a
    ledger band key, and survivors are exactly Jaccard-verified — same
    guarantees as the batch detector, per-ingest cost proportional to the
    batch.

    Scale shape: at 100 TB the ledger band table is written once,
    partitioned/bucketed by band_key (8-byte keys — see lsh_band_keys),
    so the probe equi-join shuffles ONLY the batch side; after
    verification the batch's own bands append to the index, keeping it
    current without recomputation. Ref pattern: the same probe-then-merge
    contract as sources/sinks.py merge_upsert, applied to a sketch index.
    """
    sh = _shingled(spark, sf_dir)
    signed = sh.filter(F.size("sh") > 0).withColumn(
        "sig", minhash_signature(F.col("sh"))
    )
    keyed = signed.select(
        "doc_id",
        F.posexplode(lsh_band_keys(F.col("sig"), MINHASH_BANDS, MINHASH_ROWS)).alias(
            "band_no", "band_key"
        ),
    )
    batch = keyed.filter(F.col("doc_id") % INCR_BATCH_MOD == 0).select(
        F.col("doc_id").alias("id_a"), "band_no", "band_key"
    )
    ledger = keyed.filter(F.col("doc_id") % INCR_BATCH_MOD != 0).select(
        F.col("doc_id").alias("id_b"), "band_no", "band_key"
    )
    cand = (
        batch.join(ledger, ["band_no", "band_key"])
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_verify(cand, sh, "doc_id", "sh", JACCARD_THRESHOLD).select(
        F.col("id_a").alias("new_id"),
        F.col("id_b").alias("ledger_id"),
        "jaccard",
    )


_SQL_TOKS = sql_tokens("text")

# 32-bit SimHash in DuckDB: per-bit +-1 sums over token hashes, sign -> bit.
_SQL_SIMHASH = f"""list_sum(list_transform(generate_series(0, 31), b ->
  CASE WHEN list_sum(list_transform(toks,
    t -> (({sql_md5_long('t')} >> b) & 1) * 2 - 1)) > 0
  THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END))"""


@register(
    "docs_simhash_neardup_pairs",
    operators="LLM-dedup-simhash (SimHash sketch + byte banding + Hamming verify; brief: 'SimHash')",
    oracle=f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
-- token-less docs (emoji/punct-only text) all sketch to simhash 0: every
-- pair of them is Hamming-0 "identical" despite sharing no content, so
-- they are excluded from candidacy (mirrored in the Spark plan)
s AS (SELECT doc_id, {_SQL_SIMHASH} AS simhash FROM t WHERE len(toks) > 0),
band AS (
  SELECT doc_id, simhash, band_no,
         CAST((simhash >> (8 * band_no)) & 255 AS VARCHAR) AS band_key
  FROM s, (SELECT unnest(generate_series(0, 3)) AS band_no)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.simhash AS sim_a, r.simhash AS sim_b
  FROM band l JOIN band r
    ON l.band_no = r.band_no AND l.band_key = r.band_key AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= {HAMMING_MAX}
""",
)
def docs_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # persist(): the simhash sketch feeds a self-join (see _shingled note).
    # Token-less docs are excluded BEFORE sketching: they all hash to
    # simhash 0, so every pair of them verifies as Hamming-0 "near-dups"
    # despite sharing no content (and at scale they would also pile into
    # one degenerate band bucket). Mirrored in the oracle.
    s = (
        spread(docs)
        .withColumn("toks", tokens(F.col("text")))
        .filter(F.size("toks") > 0)
        .select("doc_id", simhash32(F.col("toks")).alias("simhash"))
        .persist()
    )
    banded = s.withColumn("band_keys", simhash_band_keys(F.col("simhash")))
    keyed = banded.select(
        "doc_id", "simhash", F.posexplode("band_keys").alias("band_no", "band_key")
    )
    left = keyed.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"), "band_no", "band_key"
    )
    right = keyed.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"), "band_no", "band_key"
    )
    cand = (
        left.join(right, ["band_no", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("id_a", "id_b", "hamming")
    )


# Shared by the propagation- and star-path cluster queries: both compute
# the same fixpoint (component-minimum label), so one recursive-CTE
# oracle hash-checks either kernel.
_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_SQL_DOCS_SHINGLED},
-- zero-shingle docs share the sentinel signature [P]*k: at scale they
-- would all land in ONE band bucket and the bucket self-join would
-- degenerate to all-pairs; they can never verify (union 0), so they
-- are excluded from banding (mirrored in the Spark plan)
sig AS (SELECT doc_id, sh, {{SIG}} AS sig FROM t WHERE len(sh) > 0),
band AS (
  SELECT doc_id, band_no,
         CAST(('0x' || substr(md5(array_to_string(sig[band_no * {MINHASH_ROWS} + 1 : band_no * {MINHASH_ROWS} + {MINHASH_ROWS}], '_')), 1, 15)) AS BIGINT) AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band_no)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM band l JOIN band r
    ON l.band_no = r.band_no AND l.band_key = r.band_key AND l.doc_id < r.doc_id
),
pairs AS (
  SELECT id_a, id_b
  FROM cand JOIN t a ON cand.id_a = a.doc_id JOIN t b ON cand.id_b = b.doc_id
  WHERE {_SQL_JACCARD} >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, MIN(label) AS cluster_id,
       CAST(MIN(label) = id AS INT) AS is_canonical
FROM reach GROUP BY id
""".replace("{SIG}", _sql_minhash_sig())


@register(
    "docs_neardup_clusters",
    operators="LLM-dedup-cluster (transitive closure over MinHash near-dup pairs: Pregel-style min-label propagation -> per-doc canonical cluster id; brief: dedup family)",
    oracle=_CLUSTERS_ORACLE,
)
def docs_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse transitive near-duplicate chains (A~B, B~C => {A,B,C})
    to one canonical doc per cluster — the step after pair detection in a
    real dedup pipeline (pairs alone under-delete chained rewrites).

    Spark side: the verified MinHash pairs feed
    :func:`operators.dedup.connected_components` (min-label propagation,
    one distributed join round per component-diameter step); the oracle
    computes the same fixpoint with a recursive CTE.
    """
    return _clusters(spark, sf_dir, algorithm="auto")


@register(
    "docs_neardup_clusters_star",
    operators="LLM-dedup-cluster, star kernel (same transitive closure computed by alternating large-star/small-star contraction from round one — the adversarial-skew path, O(log^2 n) rounds on any topology; hash-checked against the same recursive-CTE oracle as the propagation path)",
    oracle=_CLUSTERS_ORACLE,
)
def docs_neardup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star-contraction clustering kernel, driver-checked end to end.

    Both algorithms converge to the component-minimum label, so this query
    must be bit-identical to ``docs_neardup_clusters`` — registering it
    separately puts the skew-path kernel itself under the driver's
    hash-compare gate instead of only under unit tests.
    """
    return _clusters(spark, sf_dir, algorithm="star")


def _clusters(spark: SparkSession, sf_dir: str, algorithm: str) -> DataFrame:
    from inspig_etl_spark.operators.dedup import connected_components

    pairs = docs_minhash_neardup_pairs(spark, sf_dir).select("id_a", "id_b")
    # Node universe from a fresh single-column documents scan: reading
    # doc_id through parquet column pruning measured FASTER than routing it
    # through the cached shingle frame (whose in-memory batches carry the
    # wide shingle arrays).
    docs = table(spark, sf_dir, "documents")
    cc = connected_components(pairs, docs, "doc_id", algorithm=algorithm)
    return cc.withColumn(
        "is_canonical", (F.col("cluster_id") == F.col("doc_id")).cast("int")
    )


def _keep_best_oracle() -> str:
    """Composed oracle: near-dup clusters (recursive-CTE fixpoint, scoped
    inside a derived table so its th/t CTEs cannot collide with the
    classifier's) joined to the linear quality logit; the cluster winner is
    (logit DESC, doc_id)."""
    from inspig_etl_spark.queries.llm_text import (
        _SQL_CLS_FEATURES,
        _SQL_CLS_LOGIT,
        _SQL_TOKS,
    )

    return f"""
WITH cc AS (SELECT doc_id, cluster_id FROM ({_CLUSTERS_ORACLE}) cx),
t AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
),
l AS (SELECT doc_id, {_SQL_CLS_LOGIT} AS logit_e4 FROM f),
j AS (
  SELECT cc.doc_id, cc.cluster_id, l.logit_e4 FROM cc JOIN l USING (doc_id)
),
r AS (
  SELECT doc_id, cluster_id, logit_e4,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY logit_e4 DESC, doc_id) AS rn
  FROM j
)
SELECT doc_id, cluster_id, logit_e4, CAST(rn = 1 AS INT) AS kept FROM r
"""


@register(
    "docs_neardup_keep_best",
    operators=(
        "LLM-dedup-keep-best (quality-aware survivor selection: per near-dup "
        "cluster keep the HIGHEST-quality-logit doc, not the min-id — the "
        "duplicate-resolution policy production pipelines actually run; "
        "composes the CC clusters with the linear quality classifier)"
    ),
    oracle=_keep_best_oracle(),
)
def docs_neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Choose WHICH duplicate survives: min-id canonicalization (the
    ``is_canonical`` flag above) is arbitrary; a curation pipeline keeps
    the best-written copy. Per transitive near-dup cluster, rank members
    by the linear quality logit (``docs_quality_classifier``'s model) and
    keep the top one (doc_id tiebreak).

    Scale shape: the cluster map is the CC output (one bigint pair per
    doc), the logit is a zero-shuffle scan-time expression, and survivor
    election is one window over cluster_id — bounded groups (cluster
    sizes), one extra shuffle on top of the CC the pipeline already ran.
    """
    from inspig_etl_spark.queries.llm_text import _cls_logit_frame

    cc = _clusters(spark, sf_dir, algorithm="auto").select("doc_id", "cluster_id")
    logit = _cls_logit_frame(spark, sf_dir).select("doc_id", "logit_e4")
    j = cc.join(logit, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.col("logit_e4").desc(), "doc_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "logit_e4",
            (F.col("rn") == 1).cast("int").alias("kept"),
        )
    )


EVAL_MOD = 20  # doc_id % 20 == 0 -> the held-out eval set (5% of docs)
CONTAM_MIN_SHARED = 2  # >= 2 shared shingles flags a training doc


# Reused by the curation funnel's decontamination stage (stage 4) — the CTE
# body minus the WITH, so it wraps as a derived table there.
_DECON_ORACLE = f"""
WITH {_SQL_DOCS_SHINGLED},
ev AS (SELECT DISTINCT unnest(sh) AS s FROM t WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT doc_id, sh FROM t WHERE doc_id % {EVAL_MOD} <> 0),
hits AS (
  SELECT x.doc_id, COUNT(*) AS shared_cnt
  FROM (SELECT doc_id, unnest(sh) AS s FROM tr) x JOIN ev USING (s)
  GROUP BY x.doc_id
)
SELECT tr.doc_id,
       -- COALESCE: a NULL-text doc has sh = [] on the Spark side
       -- (token_hashes folds through filtered arrays) but NULL here
       CAST(COALESCE(len(tr.sh), 0) AS BIGINT) AS shingle_cnt,
       COALESCE(hits.shared_cnt, 0) AS shared_cnt,
       COALESCE(hits.shared_cnt, 0) >= {CONTAM_MIN_SHARED} AS is_contaminated
FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id
"""


@register(
    "docs_decontaminate_eval_overlap",
    operators="LLM-decontamination (benchmark-overlap scrub: flag training docs sharing n-gram shingles with a held-out eval set; standard training-data hygiene alongside dedup)",
    oracle=_DECON_ORACLE,
)
def docs_decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: a training document is flagged when it
    shares >= CONTAM_MIN_SHARED distinct n-gram shingles with ANY eval-set
    document — the eval side collapses to a distinct shingle-hash set
    first, so the check is one equi-join on the shingle hash (O(shingles)
    shuffle) plus a per-doc count, never doc x doc. In production the eval
    shingle set is small enough to broadcast; here it scales with the
    synthetic corpus, so it stays a shuffle join.
    """
    sh = _shingled(spark, sf_dir)
    ev = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    hits = (
        tr.select("doc_id", F.explode("sh").alias("s"))
        .join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_cnt"))
    )
    shared = F.coalesce(F.col("shared_cnt"), F.lit(0))
    return (
        tr.select("doc_id", F.size("sh").cast("bigint").alias("shingle_cnt"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "shingle_cnt",
            shared.alias("shared_cnt"),
            (shared >= CONTAM_MIN_SHARED).alias("is_contaminated"),
        )
    )


@register(
    "docs_chunk_dedup",
    operators=(
        "LLM-dedup-chunk (C4-style sub-document exact dedup: explode fixed "
        "3-token chunks, keep the globally-first occurrence of each chunk "
        "(min doc_id, chunk_idx), report per-doc kept/removed counts)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
e AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(len(toks) // 3 AS BIGINT))) AS chunk_idx
  FROM t
),
c AS (
  SELECT doc_id, chunk_idx,
         array_to_string(toks[chunk_idx * 3 + 1 : chunk_idx * 3 + 3], ' ') AS chunk
  FROM e
),
w AS (
  SELECT doc_id, chunk_idx, chunk,
         ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
  FROM c
)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept_chunks,
       COUNT(CASE WHEN rn > 1 THEN 1 END) AS n_removed_chunks
FROM w
GROUP BY doc_id
""",
)
def docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup, the C4/RefinedWeb line-level pass.

    Real corpora dedup on lines/paragraphs; the synthetic corpus has no
    newlines, so the deterministic analog is fixed-size 3-token chunks —
    the kernel (explode → global first-occurrence window on the chunk key →
    per-doc re-aggregate) is identical either way.

    Scale shape: one shuffle on the chunk key (uniformly distributed —
    hash-like text keys, no skew), window state bounded by the largest
    duplicate group, then one shuffle back on doc_id for the re-aggregate.
    At 100 TB the chunk column would be replaced by ``xxhash64(chunk)`` to
    shrink shuffle width; kept as text here so the oracle is exact.
    """
    from pyspark.sql.window import Window

    docs = spread(table(spark, sf_dir, "documents"))
    d = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n_chunks = F.floor(F.size("toks") / 3).cast("int")
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idxs, lambda i: F.array_join(F.slice(F.col("toks"), i * 3 + 1, 3), " ")
    )
    e = d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
    w = Window.partitionBy("chunk").orderBy("doc_id", "chunk_idx")
    r = e.withColumn("rn", F.row_number().over(w))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept_chunks"),
        F.count(F.when(F.col("rn") > 1, 1)).alias("n_removed_chunks"),
    )


SPAN_N = 5  # tokens per span window (the synthetic docs are short; real
# ExactSubstr uses ~50 chars / 13 tokens — the kernel is length-agnostic)
SPAN_KEEP_MAX_E4 = 2500  # keep docs whose duplicated-span share is <= 25%


@register(
    "docs_dup_ngram_spans",
    operators=(
        "LLM-dedup-exactsubstr (positional duplicate n-gram span detection, "
        "Lee et al. 'Deduplicating Training Data Makes Language Models "
        "Better' ExactSubstr approximated at n-gram granularity: every "
        "5-token window occurring in >=2 distinct docs is a duplicated "
        "span; per-doc duplicated-position share gates the keep decision)"
    ),
    oracle=f"""
WITH th AS (
  SELECT doc_id, {sql_token_hashes(sql_tokens('text'))} AS hs FROM documents
),
sp AS (
  SELECT doc_id,
         unnest({sql_token_ngram_hashes_positional('hs', SPAN_N)}) AS h
  FROM th
),
dup AS (
  SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT sp.doc_id,
         COUNT(*) AS n_spans,
         COUNT(CASE WHEN dup.h IS NOT NULL THEN 1 END) AS dup_spans
  FROM sp LEFT JOIN dup ON sp.h = dup.h
  GROUP BY sp.doc_id
)
SELECT doc_id, n_spans, dup_spans,
       CAST(FLOOR(dup_spans * 10000 / CAST(n_spans AS DOUBLE)) AS BIGINT)
         AS dup_ratio_e4,
       dup_spans * 10000 <= {SPAN_KEEP_MAX_E4} * n_spans AS keep
FROM per_doc
""",
)
def docs_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicate-span detection at n-gram granularity.

    Every positional 5-token window (multiplicity preserved — a phrase
    repeated inside one doc that also appears elsewhere is duplicated text
    at EACH position) is hashed arithmetically; a span is duplicated when
    its hash occurs in >= 2 DISTINCT docs. Per doc: span count, duplicated
    count, fixed-point share, and the keep gate at 25%.

    Scale shape: one shuffle on the span hash (bigint, uniform) for the
    distinct-doc count, then a semi-join-shaped left join back and one
    shuffle on doc_id — the same two-exchange profile as docs_chunk_dedup.
    The keep gate is an integer cross-multiplication, not a float compare.
    At 100 TB the reference algorithm builds a suffix array; the n-gram
    approximation is the standard distributed substitute (same recall at
    window granularity, embarrassingly parallel).
    """
    docs = spread(table(spark, sf_dir, "documents"))
    # persist(): the exploded span-hash frame feeds the duplicate gate AND
    # the per-doc re-aggregate — two (doc_id, h) consumers that would each
    # re-run the scan + tokenize + per-token md5 pipeline otherwise (r16;
    # same rationale as _lex_frames' persisted postings). Two-long rows,
    # bounded by total span count; clearCache() unpersists after the action.
    d = docs.select(
        "doc_id", token_hashes(tokens(F.col("text"))).alias("hs")
    ).select(
        "doc_id",
        F.explode(token_ngram_hashes_positional(F.col("hs"), SPAN_N)).alias("h"),
    ).persist()
    dup = (
        d.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        d.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count(F.col("is_dup")).alias("dup_spans"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "dup_spans",
        F.floor(F.col("dup_spans") * 10000 / F.col("n_spans").cast("double"))
        .cast("bigint")
        .alias("dup_ratio_e4"),
        (F.col("dup_spans") * 10000 <= F.lit(SPAN_KEEP_MAX_E4) * F.col("n_spans")).alias(
            "keep"
        ),
    )


# Shared CTE chain for the ExactSubstr span-merge family: positional span
# hashes -> >=2-distinct-doc duplicate gate -> per-doc gaps-and-islands run
# ids. Both the runs report and the scrub reconstruction build on `rid`.
_SPAN_RID_CTES = f"""th AS (
  SELECT doc_id, {sql_token_ngram_hashes_positional(sql_token_hashes(sql_tokens('text')), SPAN_N)} AS hl
  FROM documents
),
sp AS (
  SELECT doc_id, s.pos, s.h FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(hl)),
                                 i -> {{'pos': i - 1, 'h': hl[i]}})) AS s
    FROM th)
),
dup AS (
  SELECT h FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
),
dp AS (
  SELECT sp.doc_id, CAST(sp.pos AS BIGINT) AS pos
  FROM sp JOIN dup ON sp.h = dup.h
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {SPAN_N} THEN 0 ELSE 1 END AS new_run
  FROM dp
),
rid AS (
  SELECT doc_id, pos,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run_seq
  FROM flagged
)"""


@register(
    "docs_dup_span_runs",
    operators=(
        "LLM-dedup-exactsubstr-runs (maximal duplicated-substring removal "
        "intervals: adjacent/overlapping duplicated 5-token windows per doc "
        "coalesce into runs — the span-merge step of Lee et al. ExactSubstr, "
        "which removes the LONGEST duplicated substring, not fixed windows)"
    ),
    oracle=f"""
WITH {_SPAN_RID_CTES}
SELECT doc_id,
       CAST(run_seq AS BIGINT) AS run_seq,
       MIN(pos) AS start_tok,
       MAX(pos) + {SPAN_N - 1} AS end_tok,
       MAX(pos) + {SPAN_N} - MIN(pos) AS run_len_toks,
       COUNT(*) AS n_windows
FROM rid
GROUP BY doc_id, run_seq
""",
)
def docs_dup_span_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-substring runs: the ExactSubstr span-merge step.

    ``docs_dup_ngram_spans`` flags each duplicated 5-token WINDOW; the
    reference algorithm (Lee et al., "Deduplicating Training Data Makes
    Language Models Better") removes the longest duplicated SUBSTRING, so
    consecutive flagged windows must coalesce. Two duplicated windows at
    token positions p < q merge into one run when their token intervals
    [p, p+4] and [q, q+4] overlap or touch (q - p <= 5); each maximal run
    is emitted as a per-doc removal interval [start_tok, end_tok] — what a
    downstream pass would cut from the training text.

    Scale shape: one shuffle on the span hash (bigint, uniform) for the
    >=2-distinct-docs gate, a hash join back on that key, then one shuffle
    onto doc_id for the run-merge window — whose state is bounded by a
    single document's duplicated positions, never the corpus. The gaps-and-
    islands merge itself is the lag + running-sum kernel already proven in
    operators/events.py (J2/W2); no UDF, no float, no collect.
    """
    return _span_runs_frame(spark, sf_dir)


def _span_runs_frame(
    spark: SparkSession, sf_dir: str, gate: str = "dup"
) -> DataFrame:
    """(doc_id, run_seq, start_tok, end_tok, run_len_toks, n_windows) — the
    maximal flagged-run intervals shared by the runs report and the scrub
    reconstructions (Spark twin of ``_SPAN_RID_CTES`` + the final per-run
    group). ``gate`` picks which windows are flagged: ``"dup"`` = occurs in
    >= 2 distinct docs (ExactSubstr), ``"eval"`` = occurs anywhere in the
    held-out eval split (surgical decontamination; training docs only)."""
    from pyspark.sql.window import Window

    docs = spread(table(spark, sf_dir, "documents"))
    sp = docs.select(
        "doc_id", token_hashes(tokens(F.col("text"))).alias("hs")
    ).select(
        "doc_id",
        F.posexplode(token_ngram_hashes_positional(F.col("hs"), SPAN_N)).alias(
            "pos", "h"
        ),
    )
    if gate == "dup":
        flagged_h = (
            sp.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("h")
        )
        base = sp
    else:
        flagged_h = (
            sp.filter(F.col("doc_id") % EVAL_MOD == 0).select("h").distinct()
        )
        base = sp.filter(F.col("doc_id") % EVAL_MOD != 0)
    dp = base.join(flagged_h, "h").select(
        "doc_id", F.col("pos").cast("bigint").alias("pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = dp.withColumn(
        "new_run",
        F.when(F.col("pos") - F.lag("pos").over(w) <= SPAN_N, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("run_seq", F.sum("new_run").over(run))
    return r.groupBy("doc_id", "run_seq").agg(
        F.min("pos").alias("start_tok"),
        (F.max("pos") + F.lit(SPAN_N - 1)).alias("end_tok"),
        (F.max("pos") + F.lit(SPAN_N) - F.min("pos")).alias("run_len_toks"),
        F.count(F.lit(1)).alias("n_windows"),
    )


_SCRUB_ORACLE = f"""
WITH {_SPAN_RID_CTES},
runs AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {SPAN_N - 1} AS e
  FROM rid GROUP BY doc_id, run_seq
),
iv AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM runs GROUP BY doc_id
),
tt AS (
  SELECT doc_id, {sql_tokens('text')} AS toks
  FROM documents WHERE text IS NOT NULL
),
k AS (
  SELECT tt.doc_id, len(tt.toks) AS n_toks,
         CASE WHEN iv.ivs IS NULL THEN tt.toks
              ELSE list_filter(tt.toks, (x, i) ->
                     len(list_filter(iv.ivs,
                         r -> i - 1 BETWEEN r.s AND r.e)) = 0)
         END AS kept
  FROM tt LEFT JOIN iv ON tt.doc_id = iv.doc_id
)
SELECT doc_id,
       CAST(n_toks AS BIGINT) AS n_toks,
       CAST(n_toks - len(kept) AS BIGINT) AS n_removed,
       COALESCE(array_to_string(kept, ' '), '') AS clean_text
FROM k
"""


@register(
    "docs_dup_span_scrub",
    operators=(
        "LLM-dedup-exactsubstr-scrub (the cut step of Lee et al. "
        "ExactSubstr: per doc, drop every token inside a maximal "
        "duplicated-run interval and re-emit the cleaned training text — "
        "the end product the span detection + run merge exist for)"
    ),
    oracle=_SCRUB_ORACLE,
)
def docs_dup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr's final act: CUT the duplicated runs out of the text.

    ``docs_dup_span_runs`` names the per-doc removal intervals; this
    kernel applies them — collect each doc's intervals into one array
    (bounded by the doc's own run count), left-join back to the corpus,
    and keep exactly the tokens whose position falls in no interval
    (docs with no duplicated runs pass through whole). The membership
    test is a positional array filter with an exists over the interval
    list — order-independent, so collect_list's nondeterministic order
    cannot affect the result.

    Scale shape: on top of the runs kernel's shuffles this adds ONE
    doc_id-keyed aggregation (intervals per doc) and ONE equi-join back
    to the corpus scan; the reconstruction itself is a per-row expression
    whose cost is tokens x runs-in-this-doc, never corpus-sized. Index
    conventions differ — Spark's filter lambda index is 0-based, DuckDB's
    is 1-based — both sides compare in 0-based span positions.
    """
    return _scrub_with_runs(spark, sf_dir, _span_runs_frame(spark, sf_dir))


def _scrub_with_runs(
    spark: SparkSession, sf_dir: str, runs: DataFrame, training_only: bool = False
) -> DataFrame:
    """Apply per-doc removal intervals to the corpus text — the cut stage
    shared by the ExactSubstr scrub and the surgical decontamination scrub
    (one interval-collect agg + one corpus equi-join + a positional array
    filter; see docs_dup_span_scrub's docstring for the full contract)."""
    iv = runs.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("start_tok").alias("s"), F.col("end_tok").alias("e")
            )
        ).alias("ivs")
    )
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    if training_only:
        docs = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    tt = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    j = tt.join(iv, "doc_id", "left")
    kept = F.when(F.col("ivs").isNull(), F.col("toks")).otherwise(
        F.filter(
            F.col("toks"),
            lambda x, i: ~F.exists(
                F.col("ivs"), lambda r: (i >= r["s"]) & (i <= r["e"])
            ),
        )
    )
    return j.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        (F.size("toks") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def _funnel_flags_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level funnel flags (doc_id, n_toks, n_removed, s1..s4) — the
    Spark twin of :func:`_funnel_flags_sql`, shared by the funnel report
    and the curated shard manifest."""
    from inspig_etl_spark.operators.dedup import canonicalize, with_content_hash
    from inspig_etl_spark.queries.llm_text import _cls_logit_frame

    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    canon = canonicalize(
        with_content_hash(docs, "text"), "doc_id", "content_hash"
    ).select("doc_id", "is_dup")
    kb = docs_neardup_keep_best(spark, sf_dir).select("doc_id", "kept")
    logit = _cls_logit_frame(spark, sf_dir).select("doc_id", "logit_e4")
    sc = docs_dup_span_scrub(spark, sf_dir).select("doc_id", "n_toks", "n_removed")
    dc = docs_decontaminate_eval_overlap(spark, sf_dir).select(
        "doc_id", "is_contaminated"
    )
    s1 = F.col("is_dup") == 0
    s2 = s1 & (F.col("kept").isNull() | (F.col("kept") == 1))
    s3 = s2 & (F.col("logit_e4") >= 0)
    # Eval-set docs are absent from dc (the held-out side): the NULL
    # comparison drops them here, same as the oracle's LEFT JOIN semantics.
    s4 = s3 & (F.col("is_contaminated") == F.lit(False))
    return (
        sc.join(canon, "doc_id")
        .join(kb, "doc_id", "left")
        .join(logit, "doc_id")
        .join(dc, "doc_id", "left")
        .select(
            "doc_id",
            "n_toks",
            "n_removed",
            s1.alias("s1"),
            s2.alias("s2"),
            s3.alias("s3"),
            s4.alias("s4"),
        )
    )


def _funnel_flags_sql() -> str:
    """The funnel's doc-level CTE chain (everything through ``flags``,
    WITHOUT the leading WITH): the classifier CTEs (t/f/l), the exact-dedup
    window, and the keep-best + scrub + decontamination oracles wrapped as
    derived tables so their internal CTE names cannot collide at this
    level. Shared by the funnel report and the curated shard manifest."""
    from inspig_etl_spark.queries.llm_text import (
        _SQL_CLS_FEATURES,
        _SQL_CLS_LOGIT,
        _SQL_TOKS,
    )

    return f"""t AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
),
l AS (SELECT doc_id, {_SQL_CLS_LOGIT} AS logit_e4 FROM f),
canon AS (
  SELECT doc_id,
         CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
  FROM documents WHERE text IS NOT NULL
),
kb AS (SELECT doc_id, kept FROM ({_keep_best_oracle()}) zkb),
sc AS (SELECT doc_id, n_toks, n_removed FROM ({_SCRUB_ORACLE}) zsc),
dc AS (SELECT doc_id, is_contaminated FROM ({_DECON_ORACLE}) zdc),
flags AS (
  SELECT sc.doc_id, sc.n_toks, sc.n_removed,
         (canon.is_dup = 0) AS s1,
         (canon.is_dup = 0 AND (kb.doc_id IS NULL OR kb.kept = 1)) AS s2,
         (canon.is_dup = 0 AND (kb.doc_id IS NULL OR kb.kept = 1)
          AND l.logit_e4 >= 0) AS s3,
         -- eval-set docs are ABSENT from dc (they are the held-out side),
         -- so NULL drops them here along with the contaminated ones.
         (canon.is_dup = 0 AND (kb.doc_id IS NULL OR kb.kept = 1)
          AND l.logit_e4 >= 0 AND dc.is_contaminated = FALSE) AS s4
  FROM sc
  JOIN canon USING (doc_id)
  LEFT JOIN kb USING (doc_id)
  JOIN l USING (doc_id)
  LEFT JOIN dc USING (doc_id)
)"""


def _funnel_oracle() -> str:
    """The funnel report: one conditional-sum aggregation over the shared
    flags chain, exploded to the 6 stage rows."""
    return f"""
WITH {_funnel_flags_sql()},
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS d0,
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS t0,
         CAST(COALESCE(SUM(CASE WHEN s1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d1,
         CAST(COALESCE(SUM(CASE WHEN s1 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t1,
         CAST(COALESCE(SUM(CASE WHEN s2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d2,
         CAST(COALESCE(SUM(CASE WHEN s2 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t2,
         CAST(COALESCE(SUM(CASE WHEN s3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d3,
         CAST(COALESCE(SUM(CASE WHEN s3 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t3,
         CAST(COALESCE(SUM(CASE WHEN s4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d4,
         CAST(COALESCE(SUM(CASE WHEN s4 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t4,
         CAST(COALESCE(SUM(CASE WHEN s4 THEN n_toks - n_removed ELSE 0 END), 0)
              AS BIGINT) AS t5
  FROM flags
)
SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name, d0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL SELECT CAST(1 AS BIGINT), 'exact_canonical', d1, t1 FROM agg
UNION ALL SELECT CAST(2 AS BIGINT), 'neardup_survivor', d2, t2 FROM agg
UNION ALL SELECT CAST(3 AS BIGINT), 'quality_pass', d3, t3 FROM agg
UNION ALL SELECT CAST(4 AS BIGINT), 'decontaminated', d4, t4 FROM agg
UNION ALL SELECT CAST(5 AS BIGINT), 'span_scrubbed', d4, t5 FROM agg
"""


@register(
    "docs_curation_funnel",
    operators=(
        "LLM-curation-funnel (end-to-end observability over the dedup/"
        "quality stack: raw -> exact-canonical -> near-dup survivor -> "
        "quality gate -> decontaminated -> span-scrubbed token budget, one "
        "doc/token row per stage — the report a pipeline owner reads "
        "before training)"
    ),
    oracle=_funnel_oracle(),
)
def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as one funnel report.

    Six stages, each a FILTER computed from the globally-materialized
    artifacts the individual kernels already produce (this is
    observability over the pipeline's outputs, not a per-stage
    re-derivation): exact canonicalization (md5 min-id), near-dup survivor
    election (CC clusters x quality logit — ``docs_neardup_keep_best``),
    the linear quality gate (logit >= 0), benchmark decontamination
    (``docs_decontaminate_eval_overlap`` — contaminated training docs AND
    the held-out eval docs themselves leave the corpus here), and the
    ExactSubstr span scrub's per-doc token removal. Emits (stage,
    stage_name, n_docs, n_tokens) — the tokens-surviving-by-stage curve
    that decides whether a corpus meets its training token budget.

    Scale shape: every input frame is a per-doc table keyed on doc_id, so
    the composition is four doc_id equi-joins over already-shuffled
    artifacts, ONE aggregation to a single row of conditional sums, and an
    explode to the 6 stage rows — no new quadratic term beyond what the
    underlying kernels already measured in SCALE.md; at 100 TB each input
    is a persisted table and this query is a cheap join-scan over them.
    """
    flags = _funnel_flags_frame(spark, sf_dir).drop("doc_id")

    def _cnt(flag):
        return F.coalesce(
            F.sum(F.when(flag, 1).otherwise(0)).cast("bigint"), F.lit(0)
        )

    def _tok(flag, col):
        return F.coalesce(
            F.sum(F.when(flag, col).otherwise(0)).cast("bigint"), F.lit(0)
        )

    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("d0"),
        F.coalesce(F.sum("n_toks").cast("bigint"), F.lit(0)).alias("t0"),
        _cnt(F.col("s1")).alias("d1"),
        _tok(F.col("s1"), F.col("n_toks")).alias("t1"),
        _cnt(F.col("s2")).alias("d2"),
        _tok(F.col("s2"), F.col("n_toks")).alias("t2"),
        _cnt(F.col("s3")).alias("d3"),
        _tok(F.col("s3"), F.col("n_toks")).alias("t3"),
        _cnt(F.col("s4")).alias("d4"),
        _tok(F.col("s4"), F.col("n_toks")).alias("t4"),
        _tok(F.col("s4"), F.col("n_toks") - F.col("n_removed")).alias("t5"),
    )

    def _stage(no, name, d, t):
        return F.struct(
            F.lit(no).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col(d).alias("n_docs"),
            F.col(t).alias("n_tokens"),
        )

    # explode, not UNION: a 6-way union would recompute the whole funnel
    # aggregation once per stage row.
    return agg.select(
        F.explode(
            F.array(
                _stage(0, "raw", "d0", "t0"),
                _stage(1, "exact_canonical", "d1", "t1"),
                _stage(2, "neardup_survivor", "d2", "t2"),
                _stage(3, "quality_pass", "d3", "t3"),
                _stage(4, "decontaminated", "d4", "t4"),
                _stage(5, "span_scrubbed", "d4", "t5"),
            )
        ).alias("s")
    ).select("s.*")


# --- curated shard manifest ------------------------------------------------

MANIFEST_CAPACITY = 256  # tokens per packed training sequence in the shards


def _manifest_oracle() -> str:
    """Funnel survivors -> deterministic shard assignment -> greedy per-shard
    packing, as one recursive-CTE oracle over the shared flags chain."""
    from inspig_etl_spark.functions.text import sql_md5_long
    from inspig_etl_spark.queries.llm_sampling import N_SHARDS

    c = MANIFEST_CAPACITY
    return f"""
WITH RECURSIVE {_funnel_flags_sql()},
surv AS (
  SELECT doc_id, n_toks - n_removed AS n FROM flags WHERE s4
),
sh AS (
  SELECT doc_id, n,
         CAST({sql_md5_long("'shard' || CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS INT) AS shard,
         {sql_md5_long("'ord' || CAST(doc_id AS VARCHAR)")} AS ord_h
  FROM surv
),
o AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_h, doc_id) AS rn
  FROM sh
),
rec AS (
  SELECT shard, rn, doc_id, n, ord_h, CAST(0 AS BIGINT) AS bin_no, n AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n, o.ord_h,
         CASE WHEN r.fill + o.n <= {c} THEN r.bin_no ELSE r.bin_no + 1 END,
         CASE WHEN r.fill + o.n <= {c} THEN r.fill + o.n ELSE o.n END
  FROM rec r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1
),
b AS (
  SELECT shard, bin_no,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY ord_h, doc_id) AS doc_ids,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS token_cnt
  FROM rec GROUP BY shard, bin_no
)
SELECT shard, bin_no, doc_ids, n_docs, token_cnt,
       CAST(SUM(token_cnt) OVER (PARTITION BY shard) AS BIGINT) AS shard_tokens
FROM b
"""


@register(
    "docs_curated_shard_manifest",
    operators=(
        "LLM-curated-shards (materialize-the-corpus composition: curation-"
        "funnel survivors -> deterministic md5 shard assignment -> greedy "
        "fixed-capacity sequence packing per shard -> (shard, bin, doc_ids, "
        "token_cnt) manifest with per-shard token totals — the 'write the "
        "training shards' step a pipeline owner actually runs)"
    ),
    oracle=_manifest_oracle(),
)
def docs_curated_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end 'write the training shards' query: every doc that
    survives all four curation gates (exact-canonical, near-dup survivor,
    quality, decontamination) is assigned a deterministic training shard
    (md5, domain-separated 'shard'/'ord' hashes — the same contract as
    ``docs_shard_assignment``), then greedily packed, in the deterministic
    within-shard shuffle order, into MANIFEST_CAPACITY-token sequences
    using the doc's SCRUBBED token count (n_toks - n_removed — the tokens
    that actually ship). Emits one manifest row per (shard, bin) with the
    ordered member doc_ids, the bin's doc/token counts, and the shard's
    token total — what a trainer's data loader reads to map shards to
    sequences.

    Scale shape: the funnel flags are doc_id equi-joins over materialized
    artifacts; shard+pack is ONE shuffle on the shard key followed by a
    partition-local sort and a streaming Arrow fold with two integers of
    state per shard (the ``docs_sequence_packing`` idiom — never
    ``groupBy().applyInPandas`` materializing a whole shard); the manifest
    agg shuffles on (shard, bin_no) and the per-shard total is a window
    over N_SHARDS-bounded partitions. At 100 TB, raise N_SHARDS so each
    shard stays executor-sized — every stage scales with rows/N_SHARDS.
    """
    import pandas as pd

    from inspig_etl_spark.functions.text import md5_long
    from inspig_etl_spark.queries.llm_sampling import N_SHARDS

    surv = (
        _funnel_flags_frame(spark, sf_dir)
        .filter(F.col("s4"))
        .select("doc_id", (F.col("n_toks") - F.col("n_removed")).alias("n"))
    )
    sh = surv.select(
        "doc_id",
        "n",
        (md5_long(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))) % N_SHARDS)
        .cast("int")
        .alias("shard"),
        md5_long(F.concat(F.lit("ord"), F.col("doc_id").cast("string"))).alias("ord_h"),
    )

    def pack(batches):
        state: dict = {}  # shard -> [bin_no, fill]
        for pdf in batches:
            bin_nos = []
            for shard, n in zip(pdf["shard"], pdf["n"]):
                n = int(n)
                st = state.get(shard)
                if st is None:
                    st = state[shard] = [0, n]
                elif st[1] + n <= MANIFEST_CAPACITY:
                    st[1] += n
                else:
                    st[0] += 1
                    st[1] = n
                bin_nos.append(st[0])
            out = pdf[["doc_id", "n", "shard", "ord_h"]].copy()
            out["bin_no"] = pd.Series(bin_nos, dtype="int64")
            yield out

    packed = (
        sh.repartition("shard")
        .sortWithinPartitions("shard", "ord_h", "doc_id")
        .mapInPandas(pack, "doc_id long, n long, shard int, ord_h long, bin_no long")
    )
    per_bin = packed.groupBy("shard", "bin_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord_h", "doc_id"))),
                lambda s: s.getField("doc_id").cast("string"),
            ),
            ",",
        ).alias("doc_ids"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("token_cnt"),
    )
    return per_bin.withColumn(
        "shard_tokens",
        F.sum("token_cnt").over(Window.partitionBy("shard")).cast("bigint"),
    )


# --- leakage-safe train/val split ------------------------------------------

VAL_PCT = 10  # target validation share, in percent of clusters


@register(
    "docs_leakage_safe_split",
    operators=(
        "LLM-split-leakage-safe (deterministic train/val split keyed on the "
        "NEAR-DUP CLUSTER label, not the doc id — every member of a "
        "transitive near-dup cluster lands on the same side, so a "
        "validation doc can never have a near-duplicate in train; the "
        "split-hygiene step after dedup in a real eval setup)"
    ),
    oracle=f"""
SELECT doc_id, cluster_id,
       CASE WHEN {sql_md5_long("'split' || CAST(cluster_id AS VARCHAR)")}
                 % 100 < {VAL_PCT}
            THEN 'val' ELSE 'train' END AS split
FROM ({_CLUSTERS_ORACLE}) z
""",
)
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split hygiene: hashing doc_id to pick validation docs leaks — a
    near-duplicate of a val doc lands in train and the eval measures
    memorization. The split key is therefore the CLUSTER label from the
    transitive near-dup closure (singletons label themselves), so whole
    clusters move together: md5('split' || cluster_id) % 100 < ``VAL_PCT``
    sends ~10% of clusters to val, deterministically across engines,
    partitionings and reruns.

    Scale shape: the CC labels are the materialized dedup artifact; the
    split itself is one per-row hash expression on top — no extra shuffle
    beyond what clustering already measured (SCALE.md 2.44x at 10x).
    """
    from inspig_etl_spark.functions.text import md5_long

    cc = _clusters(spark, sf_dir, algorithm="auto")
    side = F.when(
        md5_long(F.concat(F.lit("split"), F.col("cluster_id").cast("string"))) % 100
        < VAL_PCT,
        "val",
    ).otherwise("train")
    return cc.select("doc_id", "cluster_id", side.alias("split"))


def _funnel_by_source_oracle() -> str:
    return f"""
WITH {_funnel_flags_sql()},
src AS (
  SELECT doc_id, source FROM documents WHERE text IS NOT NULL
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS d0,
         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS t0,
         CAST(COALESCE(SUM(CASE WHEN s1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d1,
         CAST(COALESCE(SUM(CASE WHEN s1 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t1,
         CAST(COALESCE(SUM(CASE WHEN s2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d2,
         CAST(COALESCE(SUM(CASE WHEN s2 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t2,
         CAST(COALESCE(SUM(CASE WHEN s3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d3,
         CAST(COALESCE(SUM(CASE WHEN s3 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t3,
         CAST(COALESCE(SUM(CASE WHEN s4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS d4,
         CAST(COALESCE(SUM(CASE WHEN s4 THEN n_toks ELSE 0 END), 0) AS BIGINT) AS t4,
         CAST(COALESCE(SUM(CASE WHEN s4 THEN n_toks - n_removed ELSE 0 END), 0)
              AS BIGINT) AS t5
  FROM flags JOIN src USING (doc_id)
  GROUP BY source
)
SELECT source, CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
       d0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL SELECT source, CAST(1 AS BIGINT), 'exact_canonical', d1, t1 FROM agg
UNION ALL SELECT source, CAST(2 AS BIGINT), 'neardup_survivor', d2, t2 FROM agg
UNION ALL SELECT source, CAST(3 AS BIGINT), 'quality_pass', d3, t3 FROM agg
UNION ALL SELECT source, CAST(4 AS BIGINT), 'decontaminated', d4, t4 FROM agg
UNION ALL SELECT source, CAST(5 AS BIGINT), 'span_scrubbed', d4, t5 FROM agg
"""


@register(
    "docs_curation_funnel_by_source",
    operators=(
        "LLM-curation-funnel-by-source (the 6-stage curation funnel sliced "
        "per source — which crawls/dumps survive curation and at what "
        "token cost, the table that drives per-source mixing decisions)"
    ),
    oracle=_funnel_by_source_oracle(),
)
def docs_curation_funnel_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel grouped by ``source``: same six stage gates as
    ``docs_curation_funnel``, aggregated per source instead of globally —
    the observability slice a pipeline owner reads to see WHICH inputs
    lose docs/tokens at which gate (and the direct input to re-weighting
    a source mix after curation).

    Scale shape: the shared flags frame plus one doc_id equi-join to
    attach the source and ONE grouped conditional-sum aggregation
    (|sources| rows), exploded to 6 stage rows per source.
    """
    flags = _funnel_flags_frame(spark, sf_dir)
    src = (
        spread(table(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source")
    )
    j = flags.join(src, "doc_id")

    def _cnt(flag):
        return F.coalesce(
            F.sum(F.when(flag, 1).otherwise(0)).cast("bigint"), F.lit(0)
        )

    def _tok(flag, col):
        return F.coalesce(
            F.sum(F.when(flag, col).otherwise(0)).cast("bigint"), F.lit(0)
        )

    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("d0"),
        F.coalesce(F.sum("n_toks").cast("bigint"), F.lit(0)).alias("t0"),
        _cnt(F.col("s1")).alias("d1"),
        _tok(F.col("s1"), F.col("n_toks")).alias("t1"),
        _cnt(F.col("s2")).alias("d2"),
        _tok(F.col("s2"), F.col("n_toks")).alias("t2"),
        _cnt(F.col("s3")).alias("d3"),
        _tok(F.col("s3"), F.col("n_toks")).alias("t3"),
        _cnt(F.col("s4")).alias("d4"),
        _tok(F.col("s4"), F.col("n_toks")).alias("t4"),
        _tok(F.col("s4"), F.col("n_toks") - F.col("n_removed")).alias("t5"),
    )

    def _stage(no, name, d, t):
        return F.struct(
            F.lit(no).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.col(d).alias("n_docs"),
            F.col(t).alias("n_tokens"),
        )

    return agg.select(
        "source",
        F.explode(
            F.array(
                _stage(0, "raw", "d0", "t0"),
                _stage(1, "exact_canonical", "d1", "t1"),
                _stage(2, "neardup_survivor", "d2", "t2"),
                _stage(3, "quality_pass", "d3", "t3"),
                _stage(4, "decontaminated", "d4", "t4"),
                _stage(5, "span_scrubbed", "d4", "t5"),
            )
        ).alias("s"),
    ).select("source", "s.*")


# --- curated epoch mix -------------------------------------------------------

_PPM = 1_000_000
# Per-source epoch weight in ppm, on the NULL-coalesced source label —
# the same 1.0x..3.25x formula docs_mix_weighted_epochs applies to the raw
# corpus, so a doc's full/fractional epoch count is identical in both.
_SQL_SRC_C = "COALESCE(source, '??')"
_SQL_W_CUR = f"(1000000 + (LENGTH({_SQL_SRC_C}) % 4) * 750000)"


def _epoch_mix_oracle() -> str:
    """Funnel survivors -> per-source epoch weights -> mix manifest, over
    the shared funnel flags chain."""
    return f"""
WITH {_funnel_flags_sql()},
raw AS (
  SELECT {_SQL_SRC_C} AS source,
         CAST(COUNT(*) AS BIGINT) AS raw_docs,
         CAST(SUM(COALESCE(len({sql_tokens('text')}), 0)) AS BIGINT) AS raw_tokens
  FROM documents GROUP BY {_SQL_SRC_C}
),
surv AS (
  SELECT COALESCE(d.source, '??') AS source,
         fl.n_toks - fl.n_removed AS n,
         CAST(FLOOR((1000000 + (LENGTH(COALESCE(d.source, '??')) % 4) * 750000)
                    / 1000000.0) AS INT)
         + CASE WHEN {sql_md5_long("'mix' || CAST(fl.doc_id AS VARCHAR)")} % {_PPM}
                     < (1000000 + (LENGTH(COALESCE(d.source, '??')) % 4) * 750000)
                       % {_PPM}
                THEN 1 ELSE 0 END AS epochs
  FROM flags fl JOIN documents d ON d.doc_id = fl.doc_id
  WHERE fl.s4
),
cur AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(epochs AS BIGINT) * n) AS BIGINT) AS effective_tokens
  FROM surv GROUP BY source
),
tot AS (SELECT CAST(SUM(effective_tokens) AS BIGINT) AS tot_eff FROM cur)
SELECT r.source,
       CAST(COALESCE(c.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(c.n_tokens, 0) AS BIGINT) AS n_tokens,
       r.raw_docs, r.raw_tokens,
       CAST(COALESCE(c.n_tokens, 0) * {_PPM} // NULLIF(r.raw_tokens, 0) AS BIGINT)
         AS retained_ppm,
       CAST(1000000 + (LENGTH(r.source) % 4) * 750000 AS BIGINT) AS w_ppm,
       CAST(COALESCE(c.effective_tokens, 0) AS BIGINT) AS effective_tokens,
       CAST(COALESCE(c.effective_tokens, 0) * {_PPM} // NULLIF(tot_eff, 0) AS BIGINT)
         AS share_ppm
FROM raw r LEFT JOIN cur c USING (source) CROSS JOIN tot
"""


@register(
    "docs_curated_epoch_mix",
    operators=(
        "LLM-curated-mix (the mix manifest a pretraining run consumes: "
        "curation-funnel survivors -> per-source fractional epoch weights "
        "(same 'mix' hash gate as docs_mix_weighted_epochs) -> per-source "
        "curated/raw token accounting with retention and effective-token "
        "ppm shares of the training mix — closes the gap where the mixer "
        "sampled the RAW corpus while the funnel defined the curated one)"
    ),
    oracle=_epoch_mix_oracle(),
)
def docs_curated_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CURATED training mix: every doc surviving all four funnel gates
    (exact-canonical, near-dup survivor, quality, decontamination) carries
    its scrubbed token count into a per-source manifest row —
    (source, curated docs/tokens, raw docs/tokens, retained_ppm, the
    source's epoch weight, effective tokens after full+fractional epoch
    repeats, and the source's ppm share of all effective training tokens).
    This is the table a pretraining run actually consumes: epochs per doc
    use the SAME md5('mix'||doc_id) fractional gate as
    ``docs_mix_weighted_epochs``, so the curated mix is the raw mixer
    restricted to funnel survivors and weighted in scrubbed tokens; raw
    totals reconcile per-source with ``docs_training_mix_report`` and the
    curated doc/token totals with ``docs_curation_funnel`` stages 4/5
    (pinned in tests/test_llm_ops.py).

    Scale shape: the funnel flags are the doc_id equi-join chain the
    manifest already measured; on top sit two partial-aggregated groupBys
    to source cells (bounded cardinality at any corpus), a source-keyed
    left join of those cell tables, and the 1-row broadcast total —
    integer ppm end-to-end, NULLIF-guarded for empty/zero strata; NULL
    sources coalesce to '??' on both engines so no effective tokens can
    hide in an unjoinable NULL stratum.
    """
    from inspig_etl_spark.functions.text import md5_long

    docs = table(spark, sf_dir, "documents")
    src_c = F.coalesce(F.col("source"), F.lit("??"))
    raw = docs.groupBy(src_c.alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("raw_docs"),
        F.sum(F.coalesce(F.size(tokens(F.col("text"))), F.lit(0)))
        .cast("bigint")
        .alias("raw_tokens"),
    )
    w_ppm = F.lit(1000000) + (F.length("source") % 4) * 750000
    gate = md5_long(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))) % _PPM
    epochs = F.floor(w_ppm / F.lit(1000000.0)).cast("int") + F.when(
        gate < w_ppm % _PPM, 1
    ).otherwise(0)
    surv = (
        _funnel_flags_frame(spark, sf_dir)
        .filter(F.col("s4"))
        .select("doc_id", (F.col("n_toks") - F.col("n_removed")).alias("n"))
        .join(docs.select("doc_id", src_c.alias("source")), "doc_id")
        .select("source", "n", epochs.alias("epochs"))
    )
    cur = surv.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(F.col("epochs").cast("bigint") * F.col("n"))
        .cast("bigint")
        .alias("effective_tokens"),
    )
    tot = cur.agg(F.sum("effective_tokens").cast("bigint").alias("tot_eff"))
    return (
        raw.join(cur, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce(F.col("n_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            "raw_docs",
            "raw_tokens",
            F.expr(
                f"cast(coalesce(n_tokens, 0) * {_PPM} div nullif(raw_tokens, 0)"
                " as bigint)"
            ).alias("retained_ppm"),
            (F.lit(1000000) + (F.length("source") % 4) * 750000)
            .cast("bigint")
            .alias("w_ppm"),
            F.coalesce(F.col("effective_tokens"), F.lit(0))
            .cast("bigint")
            .alias("effective_tokens"),
            F.expr(
                f"cast(coalesce(effective_tokens, 0) * {_PPM}"
                " div nullif(tot_eff, 0) as bigint)"
            ).alias("share_ppm"),
        )
    )


# --- curation outcome by engagement cohort -----------------------------------

# Fixed engagement-band cuts on the author's event count (events median ~66
# at every sf — both bands stay populated under regen; data, not schema).
_BAND_HI, _BAND_MID = 70, 60
_WEEK_US = 604_800_000_000  # epoch-aligned weeks, same as event_log.WEEK_US


def _cohort_mix_oracle() -> str:
    """Funnel flags x the retention-cohort triangle, linked by the
    deterministic author attribution (md5 over the rank-indexed user
    universe)."""
    return f"""
WITH {_funnel_flags_sql()},
e AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE ts IS NOT NULL),
w AS (
  SELECT user_id, us - ((us % {_WEEK_US}) + {_WEEK_US}) % {_WEEK_US} AS wk
  FROM e
),
first AS (
  SELECT user_id, MIN(wk) AS cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_ev
  FROM w GROUP BY user_id
),
u AS (
  SELECT user_id, cohort_wk, n_ev,
         ROW_NUMBER() OVER (ORDER BY user_id) - 1 AS idx
  FROM first
),
nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM u),
att AS (
  SELECT fl.n_toks, fl.n_removed, fl.s4,
         {sql_md5_long("'author' || CAST(fl.doc_id AS VARCHAR)")}
           % NULLIF(n_users, 0) AS idx
  FROM flags fl CROSS JOIN nu
),
j AS (
  SELECT u.cohort_wk,
         CASE WHEN u.n_ev >= {_BAND_HI} THEN 'high'
              WHEN u.n_ev >= {_BAND_MID} THEN 'mid'
              ELSE 'low' END AS band,
         a.n_toks, a.n_removed, a.s4
  FROM att a JOIN u ON u.idx = a.idx
)
SELECT cohort_wk AS cohort_week_us, band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) * {_PPM} // COUNT(*) AS BIGINT)
         AS survival_ppm,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN s4 THEN n_toks - n_removed ELSE 0 END) AS BIGINT)
         AS curated_tokens
FROM j GROUP BY cohort_wk, band
"""


@register(
    "docs_curation_by_engagement_cohort",
    operators=(
        "LLM-curation x analytics-cohort composition (the two stacks "
        "joined: every document is deterministically attributed to an "
        "author from the event log's user universe, authors carry their "
        "first-activity-week cohort and an event-count engagement band, "
        "and the funnel's four survival gates aggregate per (cohort week, "
        "band) — answers 'how do the funnel's survivors differ by "
        "engagement cohort', which neither stack could alone)"
    ),
    oracle=_cohort_mix_oracle(),
)
def docs_curation_by_engagement_cohort(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composes the curation funnel with the event-analytics cohort
    triangle: docs are attributed to an author by
    ``md5('author'||doc_id) % |users|`` over the rank-indexed user universe
    (the UGC-authorship stand-in — the synthetic corpus carries no
    doc->user key, so the link is the repo's standard deterministic md5
    derivation: regen-proof, partitioning-proof, identical cross-engine);
    each author carries their first-activity epoch-week cohort (the
    ``event_weekly_cohort_retention`` anchor, NULL-ts filtered
    symmetrically) and a fixed-cut engagement band over their event count.
    Output: per (cohort_week_us, band) the attributed doc count, funnel-s4
    survivors, integer-ppm survival rate, and raw vs curated (scrubbed,
    survivors-only) token sums.

    Scale shape: the funnel flags chain is the measured doc_id equi-join
    stack; the cohort side is two partial-aggregated user-keyed groupBys
    (events -> user weeks -> first week + event count); the attribution
    join broadcasts the user dimension (|distinct users| rows — dimension-
    sized at any event volume) against the doc-level flags, and the final
    groupBy lands on (weeks x 3 bands) bounded cells. No event-x-doc
    blowup anywhere: docs join a USER-level aggregate, never the raw log.
    """
    from inspig_etl_spark.functions.text import md5_long

    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts_us").isNotNull())
        .select("user_id", "ts_us")
    )
    w = e.select(
        "user_id",
        F.expr(
            f"ts_us - ((ts_us % {_WEEK_US}) + {_WEEK_US}) % {_WEEK_US}"
        ).alias("wk"),
    )
    first = w.groupBy("user_id").agg(
        F.min("wk").alias("cohort_wk"),
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
    )
    u = first.select(
        "cohort_wk",
        "n_ev",
        (F.row_number().over(Window.orderBy("user_id")) - 1)
        .cast("bigint")
        .alias("idx"),
    )
    nu = u.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    att = (
        _funnel_flags_frame(spark, sf_dir)
        .select("doc_id", "n_toks", "n_removed", "s4")
        .crossJoin(F.broadcast(nu))
        .select(
            "n_toks",
            "n_removed",
            "s4",
            (
                md5_long(F.concat(F.lit("author"), F.col("doc_id").cast("string")))
                % F.nullif(F.col("n_users"), F.lit(0))
            ).alias("idx"),
        )
    )
    band = (
        F.when(F.col("n_ev") >= _BAND_HI, "high")
        .when(F.col("n_ev") >= _BAND_MID, "mid")
        .otherwise("low")
    )
    j = att.join(F.broadcast(u), "idx").select(
        "cohort_wk", band.alias("band"), "n_toks", "n_removed", "s4"
    )
    return j.groupBy(
        F.col("cohort_wk").alias("cohort_week_us"), "band"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("s4"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_survivors"),
        F.expr(f"cast(sum(case when s4 then 1 else 0 end) * {_PPM}"
               " div count(*) as bigint)").alias("survival_ppm"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("s4"), F.col("n_toks") - F.col("n_removed")).otherwise(0))
        .cast("bigint")
        .alias("curated_tokens"),
    )


# --- Bloom-filter decontamination -------------------------------------------

BLOOM_M = 1_048_576  # filter bits (2^20); production rule: >= ~16 bits/element
BLOOM_WORDS = BLOOM_M // 32  # packed 32-bits-per-BIGINT-word layout
BLOOM_K = 4  # hash functions

# 2^0..2^31 as a literal lookup (no shift operators — DuckDB << on BIGINT
# and Spark shiftleft disagree on column-typed shift amounts; an indexed
# power table is engine-neutral integer arithmetic).
_POW2 = [1 << j for j in range(32)]
_SQL_POW2 = "[" + ", ".join(str(v) for v in _POW2) + "]"


def _sql_bloom_member(s: str) -> str:
    """SQL membership test for shingle-hash expression ``s`` against the
    1-row ``words`` bitmap: all K domain-separated bit positions set."""
    terms = []
    for i in range(BLOOM_K):
        p = (
            sql_md5_long(f"'bloom{i}:' || CAST({s} AS VARCHAR)")
            + f" % {BLOOM_M}"
        )
        terms.append(
            f"(words[CAST(({p}) // 32 AS BIGINT) + 1]"
            f" & {_SQL_POW2}[CAST(({p}) % 32 AS INT) + 1]) <> 0"
        )
    return " AND ".join(terms)


# Bloom BUILD over an already-defined `ev(s)` CTE of distinct eval shingle
# hashes: K domain-separated bit positions -> packed 32-bit words -> ONE
# 1-row zero-filled word list. Shared by the bloom kernel's oracle and the
# at-ingest funnel oracle (queries/st_manifest.py) so the bitmap can never
# diverge between them.
_SQL_BLOOM_BUILD = f"""pos AS (
  SELECT DISTINCT
         ({sql_md5_long("'bloom' || CAST(i AS VARCHAR) || ':' || CAST(s AS VARCHAR)")})
           % {BLOOM_M} AS p
  FROM ev CROSS JOIN range({BLOOM_K}) r(i)
),
wd AS (
  -- distinct positions => distinct bits within a word, so SUM == bit-OR
  SELECT p // 32 AS w_idx,
         CAST(SUM({_SQL_POW2}[CAST(p % 32 AS INT) + 1]) AS BIGINT) AS word
  FROM pos GROUP BY p // 32
),
wl AS (
  SELECT list(COALESCE(wd.word, 0) ORDER BY sp.w_idx) AS words
  FROM range({BLOOM_WORDS}) sp(w_idx) LEFT JOIN wd ON wd.w_idx = sp.w_idx
)"""

_BLOOM_ORACLE = f"""
WITH {_SQL_DOCS_SHINGLED},
ev AS (SELECT DISTINCT unnest(sh) AS s FROM t WHERE doc_id % {EVAL_MOD} = 0),
{_SQL_BLOOM_BUILD},
tr AS (SELECT doc_id, sh FROM t WHERE doc_id % {EVAL_MOD} <> 0),
scored AS (
  SELECT tr.doc_id,
         CAST(COALESCE(len(tr.sh), 0) AS BIGINT) AS shingle_cnt,
         CAST(COALESCE(len(list_filter(tr.sh,
              s -> {_sql_bloom_member('s')})), 0) AS BIGINT) AS bloom_cnt
  FROM tr CROSS JOIN wl
)
SELECT doc_id, shingle_cnt, bloom_cnt,
       bloom_cnt >= {CONTAM_MIN_SHARED} AS is_flagged
FROM scored
"""


@register(
    "docs_decontaminate_bloom",
    operators=(
        "LLM-decontamination-bloom (the broadcast-sketch form of benchmark "
        "decontamination: the eval shingle set folds into a fixed "
        f"{BLOOM_M}-bit Bloom bitmap packed as {BLOOM_WORDS} integer words "
        "— ONE constant-size broadcast row — and the corpus probe is a "
        "pure per-row expression fold, zero corpus-side shuffle; no false "
        "negatives vs the exact-join kernel by construction, pinned in "
        "tests)"
    ),
    oracle=_BLOOM_ORACLE,
)
def docs_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the 100 TB shape of
    ``docs_decontaminate_eval_overlap``: instead of equi-joining every
    corpus shingle against the eval shingle ledger (a shuffle that scales
    with the corpus), the eval set is folded ONCE into a fixed-size bitmap
    (md5-derived, k=4 (``BLOOM_K``) domain-separated bit positions, 32 bits per
    BIGINT word so no shift overflow on either engine) that attaches to
    the corpus as a single broadcast row; the per-doc contamination count
    is then ``size(filter(sh, all-k-bits-set))`` — expression-only, inside
    codegen, no shuffle, no UDF. The price is one-sided error: false
    POSITIVES only (a ~7% per-gram FP rate at the 10x replica's ~190k
    eval shingles with m=2^20 — size m at >= ~16 bits/element in
    production), never false negatives — every exact-overlap doc is
    flagged here too (superset invariant pinned in tests/test_llm_ops.py).

    Scale shape: filter build is O(|eval shingles|) into a bounded
    ``BLOOM_WORDS``-row aggregate + one zero-filled spine join (both
    constant-size regardless of corpus); the corpus side adds ZERO
    exchanges on top of the shingle scan. Bit arithmetic is an indexed
    power-of-two table + integer AND — bit-identical cross-engine.
    """
    from inspig_etl_spark.functions.text import md5_long

    pow2 = F.array(*[F.lit(v).cast("bigint") for v in _POW2])
    sh = _shingled(spark, sf_dir)
    ev = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    pos = ev.select(
        F.explode(
            F.array(
                *[
                    md5_long(
                        F.concat(F.lit(f"bloom{i}:"), F.col("s").cast("string"))
                    )
                    % BLOOM_M
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("p")
    ).distinct()
    wd = pos.groupBy(F.expr("p div 32").alias("w_idx")).agg(
        F.sum(F.element_at(pow2, (F.col("p") % 32).cast("int") + 1))
        .cast("bigint")
        .alias("word")
    )
    spine = spark.range(BLOOM_WORDS).select(F.col("id").alias("w_idx"))
    wl = (
        spine.join(wd, "w_idx", "left")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("w_idx"),
                            F.coalesce(F.col("word"), F.lit(0)).alias("word"),
                        )
                    )
                ),
                lambda x: x.getField("word"),
            ).alias("words")
        )
    )

    def member(s: F.Column) -> F.Column:
        cond = F.lit(True)
        for i in range(BLOOM_K):
            p = (
                md5_long(F.concat(F.lit(f"bloom{i}:"), s.cast("string")))
                % BLOOM_M
            )
            # p div 32 without a shift/floordiv operator: p < 2^20 so the
            # double division is exact and the bigint cast truncates = floor
            word = F.element_at(
                F.col("words"), ((p - p % 32) / 32).cast("int") + 1
            )
            bit = word.bitwiseAND(F.element_at(pow2, (p % 32).cast("int") + 1))
            cond = cond & (bit != 0)
        return cond

    tr = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    scored = tr.crossJoin(F.broadcast(wl)).select(
        "doc_id",
        F.size("sh").cast("bigint").alias("shingle_cnt"),
        F.size(F.filter(F.col("sh"), member)).cast("bigint").alias("bloom_cnt"),
    )
    return scored.select(
        "doc_id",
        "shingle_cnt",
        "bloom_cnt",
        (F.col("bloom_cnt") >= CONTAM_MIN_SHARED).alias("is_flagged"),
    )


# --- surgical decontamination (span-level) -----------------------------------

_EVAL_SCRUB_ORACLE = f"""
WITH th AS (
  SELECT doc_id, {sql_token_ngram_hashes_positional(sql_token_hashes(sql_tokens('text')), SPAN_N)} AS hl
  FROM documents
),
sp AS (
  SELECT doc_id, s.pos, s.h FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(hl)),
                                 i -> {{'pos': i - 1, 'h': hl[i]}})) AS s
    FROM th)
),
ev AS (SELECT DISTINCT h FROM sp WHERE doc_id % {EVAL_MOD} = 0),
dp AS (
  SELECT sp.doc_id, CAST(sp.pos AS BIGINT) AS pos
  FROM sp JOIN ev ON sp.h = ev.h
  WHERE sp.doc_id % {EVAL_MOD} <> 0
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {SPAN_N} THEN 0 ELSE 1 END AS new_run
  FROM dp
),
rid AS (
  SELECT doc_id, pos,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS run_seq
  FROM flagged
),
runs AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {SPAN_N - 1} AS e
  FROM rid GROUP BY doc_id, run_seq
),
iv AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS ivs FROM runs GROUP BY doc_id
),
tt AS (
  SELECT doc_id, {sql_tokens('text')} AS toks
  FROM documents WHERE text IS NOT NULL AND doc_id % {EVAL_MOD} <> 0
),
k AS (
  SELECT tt.doc_id, len(tt.toks) AS n_toks,
         CASE WHEN iv.ivs IS NULL THEN tt.toks
              ELSE list_filter(tt.toks, (x, i) ->
                     len(list_filter(iv.ivs,
                         r -> i - 1 BETWEEN r.s AND r.e)) = 0)
         END AS kept
  FROM tt LEFT JOIN iv ON tt.doc_id = iv.doc_id
)
SELECT doc_id,
       CAST(n_toks AS BIGINT) AS n_toks,
       CAST(n_toks - len(kept) AS BIGINT) AS n_removed,
       COALESCE(array_to_string(kept, ' '), '') AS clean_text
FROM k
"""


@register(
    "docs_decontaminate_span_scrub",
    operators=(
        "LLM-decontamination-surgical (span-level benchmark scrub: every "
        "5-token window of a TRAINING doc that occurs anywhere in the "
        "held-out eval split is a contaminated span; adjacent/overlapping "
        "spans merge into maximal runs (the ExactSubstr gaps-and-islands "
        "kernel, gate swapped from >=2-distinct-docs to eval membership) "
        "and are CUT from the text — the doc survives minus the leaked "
        "passage, instead of being dropped whole)"
    ),
    oracle=_EVAL_SCRUB_ORACLE,
)
def docs_decontaminate_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical decontamination: ``docs_decontaminate_eval_overlap`` drops
    a whole training document when it shares shingles with the eval split;
    this kernel instead removes ONLY the overlapping passage — the right
    tool when a long document quotes a benchmark item but the rest is good
    training data. Any 5-token window (SPAN_N — the ExactSubstr
    granularity, coarser than the doc-level detector's 3-token shingles)
    of a training doc that appears ANYWHERE in the eval split is flagged;
    flagged windows coalesce into maximal removal runs exactly like
    ``docs_dup_span_runs`` (same gaps-and-islands kernel,
    ``_span_runs_frame(gate='eval')``) and the shared cut stage
    (``_scrub_with_runs``) re-emits the cleaned text, so the three scrub
    queries cannot drift apart.

    Scale shape: the eval window set is one distinct over the eval slice's
    spans (in production: broadcast, or the Bloom form of
    ``docs_decontaminate_bloom`` when even that is too big); the gate is
    an equi-join on the span hash, then the measured runs/cut stages —
    identical exchange profile to docs_dup_span_scrub.
    """
    runs = _span_runs_frame(spark, sf_dir, gate="eval")
    return _scrub_with_runs(spark, sf_dir, runs, training_only=True)


# --- near-dup cluster quality diagnostic -------------------------------------


def _cluster_quality_oracle() -> str:
    from inspig_etl_spark.queries.llm_text import _SQL_CLS_FEATURES, _SQL_CLS_LOGIT

    return f"""
WITH t AS (
  SELECT doc_id, source, text, {sql_tokens('text')} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
),
l AS (SELECT doc_id, {_SQL_CLS_LOGIT} AS logit_e4 FROM f),
cc AS (SELECT doc_id, cluster_id FROM ({_CLUSTERS_ORACLE}) z),
sz AS (SELECT cluster_id, COUNT(*) AS csize FROM cc GROUP BY cluster_id),
j AS (
  SELECT cc.cluster_id, sz.csize, l.logit_e4
  FROM cc JOIN sz USING (cluster_id) JOIN l USING (doc_id)
  WHERE l.logit_e4 IS NOT NULL
),
b AS (
  SELECT cluster_id, logit_e4,
         CASE WHEN csize = 1 THEN 'singleton'
              WHEN csize = 2 THEN 'pair'
              WHEN csize <= 4 THEN 'small'
              ELSE 'large' END AS size_band
  FROM j
)
SELECT size_band,
       CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       -- logit sums go NEGATIVE: DuckDB integer // and Spark div BOTH
       -- truncate toward zero (verified: -7 // 2 = -3), so plain integer
       -- division is cross-engine-safe even here
       CAST(CAST(SUM(logit_e4) AS BIGINT) // COUNT(*) AS BIGINT)
         AS mean_logit_e4,
       CAST(COUNT(CASE WHEN logit_e4 >= 0 THEN 1 END) * 1000000 // COUNT(*)
            AS BIGINT) AS keep_ppm
FROM b GROUP BY size_band
"""


@register(
    "docs_neardup_cluster_quality",
    operators=(
        "LLM-dedup-quality-diagnostic (the dedup x quality observability "
        "table: transitive near-dup clusters bucketed by size band, each "
        "band's cluster/doc counts, floor-mean classifier logit and "
        "integer-ppm keep rate — answers 'are duplicated documents lower "
        "quality than singletons', the check run before trusting survivor "
        "selection to the quality model)"
    ),
    oracle=_cluster_quality_oracle(),
)
def docs_neardup_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability across the dedup and quality stacks: every doc carries
    its transitive near-dup cluster label (singletons label themselves)
    and its fixed-point classifier logit; per cluster-SIZE band
    (singleton / pair / small 3-4 / large 5+) the report shows how many
    clusters and docs land there, the band's floor-mean logit and its
    integer-ppm keep rate. A healthy corpus shows duplicated bands at or
    below singleton quality — if 'large' outranks 'singleton', survivor
    election by logit (docs_neardup_keep_best) is re-ranking junk.

    Cross-engine care: logit sums are frequently NEGATIVE — this is the
    registry's first negative integer division. Verified (not assumed):
    DuckDB's integer ``//`` TRUNCATES toward zero exactly like Spark's
    ``div`` (-7 // 2 = -3 on both; only float ``//`` floors), so plain
    integer division matches bit-for-bit.

    Scale shape: the CC labels are the materialized dedup artifact (the
    measured docs_neardup_clusters loop); on top sit one cluster-keyed
    size agg, two doc_id equi-joins, and a 4-row band aggregation —
    nothing beyond the CC kernel's own exchanges grows with the corpus.
    """
    from inspig_etl_spark.queries.llm_text import _cls_logit_frame

    cc = _clusters(spark, sf_dir, algorithm="auto").select("doc_id", "cluster_id")
    sz = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
    logit = (
        _cls_logit_frame(spark, sf_dir)
        .select("doc_id", "logit_e4")
        .filter(F.col("logit_e4").isNotNull())
    )
    band = (
        F.when(F.col("csize") == 1, "singleton")
        .when(F.col("csize") == 2, "pair")
        .when(F.col("csize") <= 4, "small")
        .otherwise("large")
    )
    j = (
        cc.join(sz, "cluster_id")
        .join(logit, "doc_id")
        .select("cluster_id", band.alias("size_band"), "logit_e4")
    )
    return j.groupBy("size_band").agg(
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("cast(sum(logit_e4) div count(*) as bigint)").alias(
            "mean_logit_e4"
        ),
        F.expr(
            "cast(count_if(logit_e4 >= 0) * 1000000 div count(*) as bigint)"
        ).alias("keep_ppm"),
    )


# --- epoch-expanded curated shard manifest -----------------------------------


def _epoch_manifest_oracle() -> str:
    """Epoch-expanded survivors -> deterministic per-(doc, epoch) shard
    assignment -> greedy packing, as one recursive-CTE oracle over the
    shared flags chain (the _manifest_oracle shape with the mix's epoch
    repeats in the member universe)."""
    from inspig_etl_spark.functions.text import sql_md5_long
    from inspig_etl_spark.queries.llm_sampling import N_SHARDS

    c = MANIFEST_CAPACITY
    key = "CAST(doc_id AS VARCHAR) || ':' || CAST(epoch_no AS VARCHAR)"
    return f"""
WITH RECURSIVE {_funnel_flags_sql()},
surv0 AS (
  SELECT fl.doc_id, fl.n_toks - fl.n_removed AS n,
         CAST(FLOOR((1000000 + (LENGTH(COALESCE(d.source, '??')) % 4) * 750000)
                    / 1000000.0) AS INT)
         + CASE WHEN {sql_md5_long("'mix' || CAST(fl.doc_id AS VARCHAR)")} % {_PPM}
                     < (1000000 + (LENGTH(COALESCE(d.source, '??')) % 4) * 750000)
                       % {_PPM}
                THEN 1 ELSE 0 END AS epochs
  FROM flags fl JOIN documents d ON d.doc_id = fl.doc_id
  WHERE fl.s4
),
surv AS (
  SELECT doc_id, n,
         CAST(unnest(generate_series(1, epochs)) AS BIGINT) AS epoch_no
  FROM surv0
),
sh AS (
  SELECT doc_id, epoch_no, n,
         CAST({sql_md5_long(f"'shard' || {key}")} % {N_SHARDS} AS INT) AS shard,
         {sql_md5_long(f"'ord' || {key}")} AS ord_h
  FROM surv
),
o AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY ord_h, doc_id, epoch_no) AS rn
  FROM sh
),
rec AS (
  SELECT shard, rn, doc_id, epoch_no, n, ord_h,
         CAST(0 AS BIGINT) AS bin_no, n AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.epoch_no, o.n, o.ord_h,
         CASE WHEN r.fill + o.n <= {c} THEN r.bin_no ELSE r.bin_no + 1 END,
         CASE WHEN r.fill + o.n <= {c} THEN r.fill + o.n ELSE o.n END
  FROM rec r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1
),
b AS (
  SELECT shard, bin_no,
         string_agg({key}, ',' ORDER BY ord_h, doc_id, epoch_no) AS members,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(n) AS BIGINT) AS token_cnt
  FROM rec GROUP BY shard, bin_no
)
SELECT shard, bin_no, members, n_items, token_cnt,
       CAST(SUM(token_cnt) OVER (PARTITION BY shard) AS BIGINT) AS shard_tokens
FROM b
"""


@register(
    "docs_curated_epoch_shard_manifest",
    operators=(
        "LLM-curated-epoch-shards (the trainer's ACTUAL corpus "
        "materialized: funnel survivors x their fractional epoch repeats "
        "(same 'mix' gate as the epoch mix) -> deterministic per-(doc, "
        "epoch) md5 shard assignment -> greedy fixed-capacity packing -> "
        "(shard, bin, ordered doc:epoch members, token counts) manifest — "
        "closes the mix -> shards loop that docs_curated_shard_manifest "
        "(single-pass corpus) and docs_curated_epoch_mix (accounting) "
        "leave open)"
    ),
    oracle=_epoch_manifest_oracle(),
)
def docs_curated_epoch_shard_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The trainer's actual data order: ``docs_curated_shard_manifest``
    packs each survivor ONCE, but the epoch mix ships doc d ``epochs(d)``
    times — this manifest packs the EPOCH-EXPANDED stream, one member per
    (doc, epoch occurrence), so the shard files it describes are the bytes
    a multi-epoch training run actually reads. Epoch counts use the exact
    ``docs_curated_epoch_mix`` rule (per-source weight on the coalesced
    source label, the shared 'mix' fractional hash gate), so
    sum(n over members) per the whole manifest reconciles to the mix's
    effective_tokens total (pinned in tests). Shard and order hashes are
    domain-separated over the 'doc:epoch' composite key, so an epoch's
    occurrences scatter independently across shards — repeats of a doc do
    NOT cluster in one shard file (the property epoch-major concatenation
    would lose).

    Scale shape: identical to docs_curated_shard_manifest with the member
    universe multiplied by the mean epoch weight (~1.7x here): epoch
    expansion is per-row ``explode(sequence)``, shard+pack is ONE shuffle
    on the shard key + the streaming Arrow fold with two integers of state
    per shard, and the manifest aggregation lands on (shard, bin) keys.
    """
    import pandas as pd

    from inspig_etl_spark.functions.text import md5_long
    from inspig_etl_spark.queries.llm_sampling import N_SHARDS

    docs = table(spark, sf_dir, "documents")
    src_c = F.coalesce(F.col("source"), F.lit("??"))
    w_ppm = F.lit(1000000) + (F.length("source") % 4) * 750000
    gate = md5_long(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))) % _PPM
    epochs = F.floor(w_ppm / F.lit(1000000.0)).cast("int") + F.when(
        gate < w_ppm % _PPM, 1
    ).otherwise(0)
    surv = (
        _funnel_flags_frame(spark, sf_dir)
        .filter(F.col("s4"))
        .select("doc_id", (F.col("n_toks") - F.col("n_removed")).alias("n"))
        .join(docs.select("doc_id", src_c.alias("source")), "doc_id")
        .select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(1), epochs)).alias("epoch_no"),
        )
        .withColumn("epoch_no", F.col("epoch_no").cast("bigint"))
    )
    key = F.concat(
        F.col("doc_id").cast("string"), F.lit(":"), F.col("epoch_no").cast("string")
    )
    sh = surv.select(
        "doc_id",
        "epoch_no",
        "n",
        (md5_long(F.concat(F.lit("shard"), key)) % N_SHARDS)
        .cast("int")
        .alias("shard"),
        md5_long(F.concat(F.lit("ord"), key)).alias("ord_h"),
    )

    def pack(batches):
        state: dict = {}  # shard -> [bin_no, fill]
        for pdf in batches:
            bin_nos = []
            for shard, n in zip(pdf["shard"], pdf["n"]):
                n = int(n)
                st = state.get(shard)
                if st is None:
                    st = state[shard] = [0, n]
                elif st[1] + n <= MANIFEST_CAPACITY:
                    st[1] += n
                else:
                    st[0] += 1
                    st[1] = n
                bin_nos.append(st[0])
            out = pdf[["doc_id", "epoch_no", "n", "shard", "ord_h"]].copy()
            out["bin_no"] = pd.Series(bin_nos, dtype="int64")
            yield out

    packed = (
        sh.repartition("shard")
        .sortWithinPartitions("shard", "ord_h", "doc_id", "epoch_no")
        .mapInPandas(
            pack,
            "doc_id long, epoch_no long, n long, shard int, ord_h long,"
            " bin_no long",
        )
    )
    per_bin = packed.groupBy("shard", "bin_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ord_h", "doc_id", "epoch_no"))
                ),
                lambda s: F.concat(
                    s.getField("doc_id").cast("string"),
                    F.lit(":"),
                    s.getField("epoch_no").cast("string"),
                ),
            ),
            ",",
        ).alias("members"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("n").cast("bigint").alias("token_cnt"),
    )
    return per_bin.withColumn(
        "shard_tokens",
        F.sum("token_cnt").over(Window.partitionBy("shard")).cast("bigint"),
    )


# --- semantic (embedding-space) decontamination ----------------------------
#
# N-gram overlap (docs_decontaminate_eval_overlap / _bloom / _span_scrub)
# misses PARAPHRASED leakage: an eval question rewritten with different
# surface tokens shares no shingles but sits next to the original in
# embedding space. Modern pipelines therefore run an embedding-cosine
# decontamination pass alongside the lexical one; this kernel is that pass,
# composed from the repo's ANN stack (``embeddings.vec_id`` aligns with
# ``documents.doc_id`` — the same id-space convention docs_hybrid_rrf_search
# relies on, and the SAME held-out split as every lexical decontaminator:
# ``doc_id % EVAL_MOD``).
#
# The threshold sits BELOW the near-dup threshold (0.35 vs NEARDUP_COS
# 0.45) on purpose: decontamination is recall-biased — dropping a clean
# training doc costs one document, while leaking an eval neighbor corrupts
# the benchmark — so the flag fires earlier than the dedup survivor
# election would.
SEM_CONTAM_COS = 0.35


def _sem_decon_oracle() -> str:
    from inspig_etl_spark.operators.similarity import sql_dot, sql_norm
    from inspig_etl_spark.queries.llm_similarity import (
        _SQL_IVF_BEST,
        _SQL_IVF_CASE,
        _SQL_IVF_SCORES,
        _SQL_VECTORS,
    )

    return f"""
WITH sc AS (
  SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS}
),
cl AS (
  SELECT vec_id, embedding, nrm, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
ev AS (
  SELECT cell, vec_id AS eval_id, embedding AS ev, nrm AS en
  FROM cl WHERE vec_id % {EVAL_MOD} = 0
),
tr AS (
  SELECT cell, vec_id AS doc_id, embedding AS tv, nrm AS tn
  FROM cl WHERE vec_id % {EVAL_MOD} <> 0
),
s AS (
  SELECT doc_id, eval_id, {sql_dot('tv', 'ev')} / (tn * en) AS sim
  FROM tr JOIN ev USING (cell)
),
c AS (
  SELECT doc_id, eval_id, sim,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY sim DESC, eval_id) AS rk
  FROM s WHERE sim >= {SEM_CONTAM_COS}
)
SELECT c.doc_id, d.source, c.eval_id, ROUND(c.sim, 6) AS cosine_sim
FROM c JOIN documents d ON d.doc_id = c.doc_id
WHERE rk = 1
"""


def _semantic_contam_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-argmax semantic-contamination hits: one row per (training doc,
    eval doc) pair sharing an IVF cell with cosine >= ``SEM_CONTAM_COS``,
    columns (doc_id, eval_id, sim). Shared by the full semantic report
    (which argmaxes to the nearest eval per doc) and the union report
    (which only needs a per-doc existence flag and must not pay the
    row_number window or the documents join — ADVICE r12).
    """
    from inspig_etl_spark.operators.similarity import dot, norm, with_ivf_cell
    from inspig_etl_spark.queries.llm_similarity import _CENTROIDS, _vectors

    # select first: mapInArrow ships every input column (guide §4.1).
    emb = with_ivf_cell(
        _vectors(spark, sf_dir).select("vec_id", "embedding"),
        "embedding",
        _CENTROIDS,
    )
    n = emb.select(
        "cell", "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    ev = n.select(
        "cell",
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("ev"),
        F.col("nrm").alias("en"),
    ).filter(F.col("eval_id") % EVAL_MOD == 0)
    tr = n.select(
        "cell",
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("tv"),
        F.col("nrm").alias("tn"),
    ).filter(F.col("doc_id") % EVAL_MOD != 0)
    # nullif: zero-norm guard — NULL sim fails the threshold on both
    # engines (DuckDB x/0 is NULL), same convention as the cosine kernels.
    sim = dot(F.col("tv"), F.col("ev")) / F.nullif(
        F.col("tn") * F.col("en"), F.lit(0.0)
    )
    return (
        tr.join(ev, ["cell"])
        .withColumn("sim", sim)
        .filter(F.col("sim") >= SEM_CONTAM_COS)
        .select("doc_id", "eval_id", "sim")
    )


@register(
    "docs_decontaminate_semantic",
    operators=(
        "LLM-decontamination-semantic (embedding-cosine eval-leak scrub: "
        "flag training docs whose embedding sits within cosine >= "
        "threshold of ANY held-out eval doc — catches paraphrased leakage "
        "the n-gram decontaminators miss; candidates form only inside an "
        "IVF cell, composing the ANN coarse quantizer with the curation "
        "split)"
    ),
    oracle=_sem_decon_oracle(),
)
def docs_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: a TRAINING document is flagged when
    its embedding's cosine against any EVAL-split embedding reaches
    ``SEM_CONTAM_COS``; the output is one row per contaminated training doc
    with its nearest contaminating eval id (ties broken by eval_id) and the
    cosine, joined to ``documents`` for the source attribution a scrub
    report needs.

    Scale shape: both sides take their IVF cell from the shared coarse
    quantizer (one per-row expression), so candidates form only inside a
    cell — an equi-join shuffling O(|corpus|) rows, never |train| x |eval|.
    At 100 TB the eval side is a constant-size benchmark suite, so the
    production variant broadcasts the (cell-keyed) eval vectors and the
    train side never shuffles at all; here both sides scale with the
    synthetic corpus so the cell join stays symmetric. Like every
    single-probe IVF kernel the cell restriction trades recall for cost —
    a cross-cell paraphrase pair is missed; raise nprobe (the multiprobe
    pattern in queries/llm_similarity.py) when the leak budget demands it.
    The per-doc argmax window partitions on doc_id (bounded by the cell's
    candidate count, never global).
    """
    hits = _semantic_contam_hits(spark, sf_dir)
    best = hits.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.desc("sim"), F.col("eval_id"))
        ),
    ).filter(F.col("rk") == 1)
    docs = spread(table(spark, sf_dir, "documents")).select("doc_id", "source")
    return best.join(docs, "doc_id").select(
        "doc_id",
        "source",
        "eval_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
    )


def _decon_union_oracle() -> str:
    return f"""
WITH lex AS ({_DECON_ORACLE}),
sem AS ({_sem_decon_oracle()}),
d AS (SELECT doc_id, source FROM documents WHERE doc_id % {EVAL_MOD} <> 0),
f AS (
  SELECT d.doc_id, d.source,
         COALESCE(lex.is_contaminated, FALSE) AS lex_flag,
         sem.doc_id IS NOT NULL AS sem_flag
  FROM d LEFT JOIN lex ON lex.doc_id = d.doc_id
         LEFT JOIN sem ON sem.doc_id = d.doc_id
)
SELECT source,
       COUNT(*) AS train_docs,
       COUNT(CASE WHEN lex_flag THEN 1 END) AS lex_cnt,
       COUNT(CASE WHEN sem_flag THEN 1 END) AS sem_cnt,
       COUNT(CASE WHEN lex_flag AND sem_flag THEN 1 END) AS both_cnt,
       COUNT(CASE WHEN sem_flag AND NOT lex_flag THEN 1 END) AS sem_only_cnt,
       COUNT(CASE WHEN lex_flag OR sem_flag THEN 1 END) AS any_cnt
FROM f GROUP BY source
"""


@register(
    "docs_decontaminate_union_report",
    operators=(
        "LLM-decontamination-union (the production scrub policy measured: "
        "a training doc leaves the corpus when flagged by EITHER the "
        "n-gram overlap pass OR the embedding-cosine pass; per-source "
        "counts of each flag, their overlap, and sem_only_cnt — what the "
        "semantic pass catches that n-grams miss, the number that "
        "justifies running it)"
    ),
    oracle=_decon_union_oracle(),
)
def docs_decontaminate_union_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union decontamination accounting: production pipelines run the
    lexical and semantic passes together and drop the union of flags; this
    report shows, per source, how much each pass contributes and how much
    they overlap. ``sem_only_cnt > 0`` is the paraphrase-leak evidence —
    docs the n-gram detector cannot see (no shared surface shingles) whose
    embeddings still sit next to an eval doc.

    Scale shape: both passes keep their own bounded plans (shingle-hash
    equi-join; IVF-cell equi-join) and compose here through two doc_id
    equi-joins onto the training universe plus ONE per-source partial
    aggregation — the flags never fan out.
    """
    train = (
        spread(table(spark, sf_dir, "documents"))
        .filter(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id", "source")
    )
    lex = docs_decontaminate_eval_overlap(spark, sf_dir).select(
        "doc_id", F.col("is_contaminated").alias("lex_flag")
    )
    # Existence flag only: the pre-argmax hits frame, deduped — skips the
    # full semantic report's nearest-eval row_number window and the
    # documents attribution join it would immediately discard (ADVICE r12).
    sem = (
        _semantic_contam_hits(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .withColumn("sem_flag", F.lit(True))
    )
    f = (
        train.join(lex, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .select(
            "source",
            F.coalesce(F.col("lex_flag"), F.lit(False)).alias("lex_flag"),
            F.coalesce(F.col("sem_flag"), F.lit(False)).alias("sem_flag"),
        )
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("train_docs"),
        F.count(F.when(F.col("lex_flag"), 1)).cast("bigint").alias("lex_cnt"),
        F.count(F.when(F.col("sem_flag"), 1)).cast("bigint").alias("sem_cnt"),
        F.count(F.when(F.col("lex_flag") & F.col("sem_flag"), 1))
        .cast("bigint")
        .alias("both_cnt"),
        F.count(F.when(F.col("sem_flag") & ~F.col("lex_flag"), 1))
        .cast("bigint")
        .alias("sem_only_cnt"),
        F.count(F.when(F.col("lex_flag") | F.col("sem_flag"), 1))
        .cast("bigint")
        .alias("any_cnt"),
    )
