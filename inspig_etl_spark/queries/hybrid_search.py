"""Hybrid retrieval: lexical (rare-term tf-idf) x vector (IVF exact-int8)
candidate generation fused by reciprocal-rank fusion — the two-tower
search shape every retrieval/RAG deployment runs, composed from the
repo's existing text and ANN stacks. ``embeddings.vec_id`` is the
embedding of ``documents.doc_id`` (aligned id spaces, 0..N-1 in the
testdata), so both towers retrieve into one id universe.

RRF (Cormack et al. 2009) needs only the two towers' RANKS — no score
calibration between a tf-idf sum and an inner product — and its
``1/(k + rank)`` folds exactly into integer fixed point, so the whole
fusion is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.functions.text import (
    sql_token_hashes,
    sql_token_ngram_hashes_positional,
    sql_tokens,
    token_hashes,
    token_ngram_hashes_positional,
    tokens,
)
from inspig_etl_spark.queries import register
from inspig_etl_spark.queries.llm_similarity import (
    _CENTROIDS,
    _fold_i,
    _sq8,
    _sql_dot,
    _sql_sq8,
    _SQL_COSINE,
    _SQL_IVF_BEST,
    _SQL_IVF_CASE,
    _SQL_IVF_SCORES,
    _SQL_VECTORS,
    _SQL_VECTORS_D64,
    _vectors,
    DIM,
    QUERY_MOD,
)
from inspig_etl_spark.operators.similarity import sql_norm, with_ivf_cell

IDF_E6 = 1_000_000
DF_CAP_PCT = 5  # a query term is usable only if df <= 5% of docs (bounds postings)
LEX_C = 10  # lexical candidates per query
VEC_C = 10  # vector candidates per query
RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
HYBRID_K = 5  # fused results per query

# docs_hybrid_recall_report's Spark-side ground truth reuses
# embeddings_knn_bruteforce, which is hard-capped at TOP_K ranks, then
# filters to rank <= HYBRID_K — while its oracle computes the ground truth
# at HYBRID_K directly. Raising HYBRID_K above TOP_K would silently
# truncate the Spark-side truth and break oracle parity (ADVICE r13), so
# the coupling is enforced at import time — as a real raise, not `assert`,
# which `python -O` strips and would leave the trap unguarded in optimized
# runs (ADVICE r14).
from inspig_etl_spark.queries.llm_similarity import TOP_K as _BRUTE_TOP_K

if HYBRID_K > _BRUTE_TOP_K:
    raise ValueError(
        f"HYBRID_K ({HYBRID_K}) must not exceed the brute-force ground "
        f"truth's TOP_K ({_BRUTE_TOP_K}); see docs_hybrid_recall_report"
    )

# BM25 (k1 = 1.2, b = 0.75) in integer fixed point. The denominator
# tf + k1*(1 - b + b*dl/avgdl) is scaled by 1e3, the saturation
# tf*(k1+1)/den by 1e6, and the per-term contribution is
# (idf_e6 * sat_e6) div 1e6 — every step engine-neutral integer division.
BM25_DEN_CONST_E3 = 300  # k1 * (1 - b) * 1e3
BM25_DEN_DL_E6 = 900_000  # k1 * b * 1e6 (multiplies dl/avgdl_e3)
BM25_SAT_NUM_E9 = 2_200_000_000  # (k1 + 1) * 1e9 (multiplies tf, div den_e3)


# Shared oracle CTE chain for the hybrid family: token bigrams (tb keeps
# duplicates for BM25's tf/dl; tq is the distinct postings view), the
# df-capped rare vocabulary, both towers' ranked candidates, and the RRF
# fusion. Referenced by the RRF query, the BM25 tower, and the recall
# report so all three can never disagree about a stage's definition.
_HYB_CTES = f"""th AS (
  SELECT doc_id, {sql_token_hashes(sql_tokens('text'))} AS hs FROM documents
),
tb AS (
  SELECT doc_id, unnest({sql_token_ngram_hashes_positional('hs', 2)}) AS term
  FROM th
),
tq AS (SELECT DISTINCT doc_id, term FROM tb),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tq),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tq GROUP BY term
),
rare AS (
  SELECT term, (n_docs * {IDF_E6}) // df AS idf_e6
  FROM df CROSS JOIN n WHERE df * 100 <= n_docs * {DF_CAP_PCT}
),
qt AS (
  SELECT doc_id AS query_id, term FROM tq WHERE doc_id % {QUERY_MOD} = 0
),
lexscore AS (
  SELECT qt.query_id, tq.doc_id,
         CAST(SUM(rare.idf_e6) AS BIGINT) AS lex_e6
  FROM qt JOIN rare USING (term) JOIN tq USING (term)
  WHERE tq.doc_id <> qt.query_id
  GROUP BY qt.query_id, tq.doc_id
),
lex AS (
  SELECT query_id, doc_id, CAST(rank_lex AS BIGINT) AS rank_lex FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY lex_e6 DESC, doc_id) AS rank_lex
    FROM lexscore
  ) WHERE rank_lex <= {LEX_C}
),
sc AS (
  SELECT vec_id, {_sql_sq8('embedding')} AS qz,
         {_SQL_IVF_SCORES}
  FROM {_SQL_VECTORS_D64}
),
cl AS (
  SELECT vec_id, qz, {_SQL_IVF_CASE} AS cell
  FROM (SELECT *, {_SQL_IVF_BEST} AS best FROM sc)
),
vs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         {_sql_dot('q.qz', 'c.qz')} AS rel
  FROM cl q JOIN cl c ON q.cell = c.cell
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
),
vec AS (
  SELECT query_id, doc_id, CAST(rank_vec AS BIGINT) AS rank_vec FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, doc_id) AS rank_vec
    FROM vs
  ) WHERE rank_vec <= {VEC_C}
),
fused AS (
  SELECT query_id, doc_id, rank_lex, rank_vec,
         CAST(COALESCE({IDF_E6} // ({RRF_K} + rank_lex), 0)
              + COALESCE({IDF_E6} // ({RRF_K} + rank_vec), 0) AS BIGINT)
           AS fused_score
  FROM lex FULL OUTER JOIN vec USING (query_id, doc_id)
),
hyb AS (
  SELECT query_id, doc_id, rank_lex, rank_vec, fused_score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY fused_score DESC, doc_id) AS hybrid_rank
  FROM fused
)"""

# BM25 stages over the same tb/rare/qt chain: per-doc bigram length (dl),
# the 1-row corpus stats (avgdl in e3), per-(doc, term) tf, then the
# fixed-point BM25 sum and per-query ranking.
_BM25_CTES = f"""dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tb GROUP BY doc_id
),
stats AS (
  SELECT CAST((SUM(dl) * 1000) // NULLIF(COUNT(*), 0) AS BIGINT) AS avgdl_e3
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tb
  GROUP BY doc_id, term
),
bm AS (
  -- (idf_e6 * sat_e6) // 1e6 in the same overflow-safe split form as the
  -- Spark side: (idf_e6 // 1e6)*sat_e6 + ((idf_e6 % 1e6)*sat_e6) // 1e6
  SELECT query_id, doc_id,
         CAST(SUM((idf_e6 // {IDF_E6}) * sat_e6
                  + ((idf_e6 % {IDF_E6}) * sat_e6) // {IDF_E6})
              AS BIGINT) AS bm25_e6
  FROM (
    SELECT qt.query_id, tf.doc_id, rare.idf_e6,
           (tf.tf * {BM25_SAT_NUM_E9})
             // (1000 * tf.tf + {BM25_DEN_CONST_E3}
                 + ({BM25_DEN_DL_E6} * dl.dl)
                   // NULLIF(stats.avgdl_e3, 0)) AS sat_e6
    FROM qt JOIN rare USING (term) JOIN tf USING (term)
         JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
    WHERE tf.doc_id <> qt.query_id
  )
  GROUP BY query_id, doc_id
),
bmr AS (
  SELECT query_id, doc_id, bm25_e6,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25_e6 DESC, doc_id) AS rank_bm25
  FROM bm
)"""


@register(
    "docs_hybrid_rrf_search",
    operators=(
        "LLM-hybrid-search (two-tower retrieval: rare-term integer tf-idf "
        "lexical candidates x IVF-cell exact-int8 vector candidates, fused "
        "by integer reciprocal-rank fusion 1e6 div (60 + rank) — the "
        "lexical-plus-semantic search composition; df-capped postings "
        "bound the lexical join, the cell equi-join bounds the vector "
        "side, fusion is a (query, doc)-keyed full outer join)"
    ),
    oracle=f"""
WITH {_HYB_CTES}
SELECT query_id, CAST(hybrid_rank AS BIGINT) AS hybrid_rank, doc_id,
       rank_lex, rank_vec, fused_score
FROM hyb WHERE hybrid_rank <= {HYBRID_K}
""",
)
def docs_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tower hybrid search with reciprocal-rank fusion.

    LEXICAL tower: terms are hashed token BIGRAMS (the synthetic corpus
    draws from a ~31-word vocabulary, so every unigram is a stopword —
    df-capping unigrams left ZERO usable terms, measured; bigrams give a
    916-term space with a real rare tail, and phrase-ish bigram match is
    the better lexical signal anyway). Per query doc, candidates are docs
    sharing at least one RARE bigram (df <= 5% of docs, ``DF_CAP_PCT`` — the
    df cap is what keeps the inverted-index join bounded: common-term
    postings scale with the corpus and carry no ranking signal), scored
    by the summed integer idf ``(N * 1e6) div df`` of the shared distinct
    bigrams (the docs_tfidf_topterms fixed-point idf), top-10 (``LEX_C``).

    VECTOR tower: the IVF coarse-cell exact-int8 shortlist (the
    embeddings_knn_mmr_diversified candidate stage), top-10 (``VEC_C``).

    FUSION: integer RRF — each tower contributes
    ``1e6 div (60 + rank)`` (``RRF_K`` = 60), a doc missing contributes
    0, final top-5 (``HYBRID_K``) per query by fused score, id tie-break.
    Rank-based fusion needs no cross-tower score calibration, which is
    exactly why deployments use it; the integer form makes it hash-exact.

    Scale shape: the lexical tower is two term-keyed partial aggs (df,
    then the postings join restricted to capped terms — posting lists are
    bounded by the df cap at any corpus), one (query, doc) agg and a
    per-query window; the vector tower is the measured cell equi-join;
    fusion is a (query_id, doc_id)-keyed FULL OUTER equi-join between two
    frames already bounded by C per query, then one bounded window. No
    stage exceeds queries x (LEX_C + VEC_C) after candidate generation.
    """
    lex = _lex_ranked(spark, sf_dir)
    vec = _vec_ranked(spark, sf_dir)
    return _rrf_ranked(lex, vec).filter(F.col("hybrid_rank") <= HYBRID_K).select(
        "query_id", "hybrid_rank", "doc_id", "rank_lex", "rank_vec",
        "fused_score",
    )


def _lex_frames(spark: SparkSession, sf_dir: str):
    """Shared lexical-tower base frames: (tb, tq, rare, qt) — duplicated
    bigram postings, the distinct postings view, the df-capped rare
    vocabulary with integer idf, and the query-side terms (Spark twins of
    the ``_HYB_CTES`` stages of the same names)."""
    docs = spread(table(spark, sf_dir, "documents"))
    # persist(): the postings subtree feeds 4-6 consumers (df stats, the
    # query side, the postings join, and BM25's tf/dl) — without
    # materialization each consumer re-runs the parquet scan + tokenize +
    # per-token md5 (6 full scans in the unpersisted BM25 plan, measured
    # via .explain). One narrow (doc_id, hs) row per doc — the _shingled
    # pattern; the 100 TB form is the PERSISTED inverted index every
    # lexical deployment materializes. clearCache() after the action is
    # the repo-wide unpersist point for lazily-returned query frames.
    # The cached row carries the ROLLED BIGRAM ARRAY, not the raw token
    # hashes (r16): downstream only ever consumes bigrams, and with just
    # ``hs`` cached every one of the ~5 consumers re-ran the zip_with
    # bigram roll before exploding. Measured NEUTRAL at sf0.1 on local[32]
    # (idle cores absorb the redundant rolls there), but each roll is a
    # full pass over the token arrays at scale; rolling once into the
    # cache removes them for free locally. Caching the EXPLODED postings
    # instead was tried and measured slower (row-store barrier;
    # OPTIMIZATION_r16.md).
    th = (
        docs.select(
            # hs bound as its OWN column first: the bigram roll references
            # the hash array in several slice positions, and an inline
            # subtree would re-run the per-token md5 once per reference
            # (token_hashes' documented binding rule).
            "doc_id",
            token_hashes(tokens(F.col("text"))).alias("hs"),
        )
        .select(
            "doc_id",
            token_ngram_hashes_positional(F.col("hs"), 2).alias("bg"),
        )
        .persist()
    )
    # POSITIONAL bigrams: tb preserves multiplicity (BM25's tf and dl are
    # occurrence counts, not distinct-term counts); tq re-derives the
    # distinct postings view the idf-sum tower and df stats use.
    tb = th.select("doc_id", F.explode(F.col("bg")).alias("term"))
    tq = tb.distinct()
    n = tq.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    df = tq.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    rare = (
        df.crossJoin(F.broadcast(n))
        .filter(F.col("df") * 100 <= F.col("n_docs") * DF_CAP_PCT)
        .select("term", F.expr(f"(n_docs * {IDF_E6}) div df").alias("idf_e6"))
    )
    qt = tq.filter(F.col("doc_id") % QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    return tb, tq, rare, qt


def _lex_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """idf-sum lexical candidates: (query_id, doc_id, rank_lex <= LEX_C)."""
    _tb, tq, rare, qt = _lex_frames(spark, sf_dir)
    lexscore = (
        qt.join(rare, "term")
        .join(tq, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("idf_e6").cast("bigint").alias("lex_e6"))
    )
    wl = Window.partitionBy("query_id").orderBy(F.col("lex_e6").desc(), "doc_id")
    return (
        lexscore.withColumn("rank_lex", F.row_number().over(wl).cast("bigint"))
        .filter(F.col("rank_lex") <= LEX_C)
        .select("query_id", "doc_id", "rank_lex")
    )


def _vec_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell exact-int8 vector candidates: (query_id, doc_id,
    rank_vec <= VEC_C)."""
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
    cs = cl.select(F.col("vec_id").alias("doc_id"), "cell", F.col("qz").alias("cv"))
    rel = _fold_i(F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y))
    vscore = (
        qs.join(cs, "cell")
        .filter(F.col("query_id") != F.col("doc_id"))
        .select("query_id", "doc_id", rel.alias("rel"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), "doc_id")
    return (
        vscore.withColumn("rank_vec", F.row_number().over(wv).cast("bigint"))
        .filter(F.col("rank_vec") <= VEC_C)
        .select("query_id", "doc_id", "rank_vec")
    )


def _rrf_ranked(lex: DataFrame, vec: DataFrame) -> DataFrame:
    """Integer RRF fusion of the two candidate frames, with hybrid_rank
    assigned (unfiltered — callers slice to their k)."""
    fused = lex.join(vec, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        "rank_lex",
        "rank_vec",
        (
            F.coalesce(
                F.expr(f"{IDF_E6} div ({RRF_K} + rank_lex)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{IDF_E6} div ({RRF_K} + rank_vec)"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("fused_score"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("fused_score").desc(), "doc_id"
    )
    return fused.withColumn(
        "hybrid_rank", F.row_number().over(wf).cast("bigint")
    )


@register(
    "docs_bm25_topk",
    operators=(
        "LLM-bm25-retrieval (the production lexical scorer: BM25 with "
        "k1=1.2 / b=0.75 in e3/e6 integer fixed point — term-frequency "
        "saturation plus document-length normalization over the same "
        "df-capped rare-bigram postings as the idf-sum tower; avgdl is "
        "ONE broadcast corpus scalar, everything else stays term-keyed "
        "equi-joins)"
    ),
    oracle=f"""
WITH {_HYB_CTES},
{_BM25_CTES}
SELECT query_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25, doc_id, bm25_e6
FROM bmr WHERE rank_bm25 <= {LEX_C}
""",
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical retrieval (VERDICT r12 item 5).

    Upgrades the idf-sum tower with the two things production BM25 adds:
    TERM-FREQUENCY SATURATION (a term repeated 50 times is not 50x the
    evidence — tf*(k1+1)/(tf+den) asymptotes at k1+1) and DOCUMENT-LENGTH
    NORMALIZATION (a match in a short doc outweighs one in a long doc —
    den grows with dl/avgdl). Same df-capped rare-bigram vocabulary and
    linear integer idf as ``docs_hybrid_rrf_search``'s lexical tower, so
    the two scorers differ ONLY in the tf/length term — the rank
    agreement/divergence test pins exactly that
    (tests/test_llm_ops.py::test_bm25_vs_idf_sum_planted_ranks).

    Fixed point: den_e3 = 1000*tf + k1(1-b)e3 + (k1*b*1e6*dl) div
    avgdl_e3; sat_e6 = (tf*(k1+1)e9) div den_e3; contribution =
    (idf_e6*sat_e6) div 1e6 — every step bigint division, identical on
    both engines. The contribution is COMPUTED in split form,
    (idf_e6 div 1e6)*sat_e6 + ((idf_e6 mod 1e6)*sat_e6) div 1e6 — an
    exact identity for nonnegative ints, applied identically in both
    engines — because the naive product idf_e6*sat_e6 (idf_e6 up to
    n_docs*1e6 for a df=1 term, sat_e6 up to 2.2e6) would cross 2^63 at
    only ~4.2e6 corpus docs, where non-ANSI Spark wraps silently while
    DuckDB raises (ADVICE r13). Split, the widest intermediate is
    (n_docs div df)*sat_e6 <= n_docs*2.2e6 — headroom to ~4e12 docs;
    past that a production deployment caps idf_e6, which BM25's log-idf
    does naturally. The identity itself is pinned by
    tests/test_llm_ops.py::test_bm25_split_contribution_identity.

    Scale shape: identical to the idf-sum tower — df and tf are
    term-/doc-keyed partial aggs, avgdl is ONE broadcast scalar row, the
    postings join is bounded by the df cap, and the final window is
    per-query over <= |capped postings| candidates. BM25's extra inputs
    (tf, dl) ride the same shuffles the tower already pays.
    """
    tb, _tq, rare, qt = _lex_frames(spark, sf_dir)
    dl = tb.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.expr("cast((sum(dl) * 1000) div nullif(count(*), 0) as bigint)").alias(
            "avgdl_e3"
        )
    )
    tf = tb.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    sat = F.expr(
        f"(tf * {BM25_SAT_NUM_E9})"
        f" div (1000 * tf + {BM25_DEN_CONST_E3}"
        f" + ({BM25_DEN_DL_E6} * dl) div nullif(avgdl_e3, 0))"
    )
    # (idf_e6 * sat_e6) div 1e6 in overflow-safe split form (see docstring)
    contrib = F.expr(
        f"(idf_e6 div {IDF_E6}) * sat_e6"
        f" + ((idf_e6 % {IDF_E6}) * sat_e6) div {IDF_E6}"
    )
    bm = (
        qt.join(rare, "term")
        .join(tf, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "idf_e6", sat.alias("sat_e6"))
        .select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").cast("bigint").alias("bm25_e6"))
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("bm25_e6").desc(), "doc_id"
    )
    return (
        bm.withColumn("rank_bm25", F.row_number().over(wb).cast("bigint"))
        .filter(F.col("rank_bm25") <= LEX_C)
        .select("query_id", "rank_bm25", "doc_id", "bm25_e6")
    )


def _bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 candidates as (query_id, doc_id, rank_bm25) for the recall
    report — the registered query minus the output projection."""
    return docs_bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", "rank_bm25"
    )


def _recall_row_sql(method: str, top: str) -> str:
    """One recall-report row in SQL: exact integer recall@k of the ranked
    CTE ``top`` (columns query_id, doc_id) against the brute-force ground
    truth ``gt`` (query_id, neighbor_id), over the queries ``top`` served."""
    return f"""SELECT method, queries, hits, possible,
       CAST(hits * 1000000 // NULLIF(possible, 0) AS BIGINT) AS recall_ppm
FROM (
  SELECT '{method}' AS method,
       (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM {top}) AS queries,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {top} t JOIN gt g
          ON t.query_id = g.query_id AND t.doc_id = g.neighbor_id) AS hits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM gt
          WHERE query_id IN (SELECT query_id FROM {top})) AS possible
)"""


@register(
    "docs_hybrid_recall_report",
    operators=(
        "LLM-hybrid-recall (the number that justifies two-tower retrieval: "
        "exact integer recall@k against the float-cosine brute-force "
        "ground truth for lexical-idf-only, lexical-bm25-only, "
        "vector-only, and RRF-fused top-k at the shared k — one row per "
        "method over the queries that method served)"
    ),
    oracle=f"""
WITH {_HYB_CTES},
{_BM25_CTES},
gtq AS (
  SELECT vec_id AS query_id, embedding AS qv, {sql_norm('embedding')} AS qn
  FROM {_SQL_VECTORS} WHERE vec_id % {QUERY_MOD} = 0
),
gtc AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, {sql_norm('embedding')} AS cn
  FROM {_SQL_VECTORS}
),
gt AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_SQL_COSINE} DESC, c.neighbor_id)
             AS rank
    FROM gtq q JOIN gtc c ON q.query_id <> c.neighbor_id
  ) WHERE rank <= {HYBRID_K}
),
l5 AS (SELECT query_id, doc_id FROM lex WHERE rank_lex <= {HYBRID_K}),
b5 AS (SELECT query_id, doc_id FROM bmr WHERE rank_bm25 <= {HYBRID_K}),
v5 AS (SELECT query_id, doc_id FROM vec WHERE rank_vec <= {HYBRID_K}),
h5 AS (SELECT query_id, doc_id FROM hyb WHERE hybrid_rank <= {HYBRID_K})
{_recall_row_sql('lexical_idf', 'l5')}
UNION ALL
{_recall_row_sql('lexical_bm25', 'b5')}
UNION ALL
{_recall_row_sql('vector', 'v5')}
UNION ALL
{_recall_row_sql('rrf_fused', 'h5')}
""",
)
def docs_hybrid_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality table for the hybrid stack (VERDICT r12 item 4):
    exact integer recall@k (k = ``HYBRID_K``, the fused k) against the
    float-cosine brute-force ground truth, one row per retrieval method —
    lexical idf-sum, lexical BM25, vector IVF-int8, and the RRF fusion.
    ``queries``/``possible`` count only the queries a method actually
    served (a lexical tower serves nothing for a query with no rare
    bigram), so each recall_ppm is conditional on serving — read
    ``queries`` alongside it.

    The fused-beats-single-tower expectation (rrf_fused recall >=
    max(lexical, vector)) is DATA-PINNED in tests, not guaranteed: RRF
    can demote a correct vector hit when the lexical tower floods the
    fused top-k with confident misses (Cormack et al. measure it as a
    strong prior, not a theorem).

    Scale shape: the ground truth is the ONE deliberately quadratic term
    (the declared brute-force witness exception shared with
    ``embeddings_ann_recall_report`` — a deployment samples the query
    set); each method's own stages inherit the production kernels'
    df-capped/cell-join shapes; the per-method reductions are scalar
    aggregates over id-only frames assembled by 1-row broadcast
    crossJoins.
    """
    from inspig_etl_spark.queries.llm_similarity import (
        embeddings_knn_bruteforce,
    )

    gt = (
        embeddings_knn_bruteforce(spark, sf_dir)
        .filter(F.col("rank") <= HYBRID_K)
        .select("query_id", "neighbor_id")
        # Bounded: queries x k id pairs; reused by all four methods'
        # hits/possible joins (clearCache() after the action is the
        # repo-wide unpersist point for lazily-returned query frames).
        .persist()
    )

    def row(method: str, top: DataFrame) -> DataFrame:
        top = top.select("query_id", "doc_id").persist()  # <= q x k ids
        served = top.select("query_id").distinct()
        queries = served.agg(F.count(F.lit(1)).cast("bigint").alias("queries"))
        hits = top.join(
            gt,
            (top.query_id == gt.query_id) & (top.doc_id == gt.neighbor_id),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
        possible = gt.join(served, "query_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("possible")
        )
        return (
            queries.crossJoin(hits)
            .crossJoin(possible)
            .select(
                F.lit(method).alias("method"),
                "queries",
                "hits",
                "possible",
                F.expr("hits * 1000000 div nullif(possible, 0)")
                .cast("bigint")
                .alias("recall_ppm"),
            )
        )

    lex = _lex_ranked(spark, sf_dir)
    vec = _vec_ranked(spark, sf_dir)
    out = row("lexical_idf", lex.filter(F.col("rank_lex") <= HYBRID_K))
    out = out.unionByName(
        row(
            "lexical_bm25",
            _bm25_ranked(spark, sf_dir).filter(F.col("rank_bm25") <= HYBRID_K),
        )
    )
    out = out.unionByName(row("vector", vec.filter(F.col("rank_vec") <= HYBRID_K)))
    out = out.unionByName(
        row("rrf_fused", _rrf_ranked(lex, vec).filter(F.col("hybrid_rank") <= HYBRID_K))
    )
    return out
