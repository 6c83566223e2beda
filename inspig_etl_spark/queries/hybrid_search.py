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
    sql_token_ngram_hashes_from,
    sql_tokens,
    token_hashes,
    token_ngram_hashes_from,
    tokens,
)
from inspig_etl_spark.queries import register
from inspig_etl_spark.queries.llm_similarity import (
    _CENTROIDS,
    _fold_i,
    _sq8,
    _sql_dot,
    _sql_sq8,
    _SQL_IVF_BEST,
    _SQL_IVF_CASE,
    _SQL_IVF_SCORES,
    _SQL_VECTORS_D64,
    _vectors,
    DIM,
    QUERY_MOD,
)
from inspig_etl_spark.operators.similarity import with_ivf_cell

IDF_E6 = 1_000_000
DF_CAP_PCT = 5  # a query term is usable only if df <= 5% of docs (bounds postings)
LEX_C = 10  # lexical candidates per query
VEC_C = 10  # vector candidates per query
RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
HYBRID_K = 5  # fused results per query


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
WITH th AS (
  SELECT doc_id, {sql_token_hashes(sql_tokens('text'))} AS hs FROM documents
),
tq AS (
  SELECT DISTINCT doc_id, unnest({sql_token_ngram_hashes_from('hs', 2)}) AS term
  FROM th
),
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
)
SELECT query_id, CAST(hybrid_rank AS BIGINT) AS hybrid_rank, doc_id,
       rank_lex, rank_vec, fused_score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY fused_score DESC, doc_id)
              AS hybrid_rank
  FROM fused
) WHERE hybrid_rank <= {HYBRID_K}
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
    docs = spread(table(spark, sf_dir, "documents"))
    th = docs.select("doc_id", token_hashes(tokens(F.col("text"))).alias("hs"))
    tq = th.select(
        "doc_id",
        F.explode(token_ngram_hashes_from(F.col("hs"), 2)).alias("term"),
    ).distinct()
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
    lexscore = (
        qt.join(rare, "term")
        .join(tq, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("idf_e6").cast("bigint").alias("lex_e6"))
    )
    wl = Window.partitionBy("query_id").orderBy(F.col("lex_e6").desc(), "doc_id")
    lex = (
        lexscore.withColumn("rank_lex", F.row_number().over(wl).cast("bigint"))
        .filter(F.col("rank_lex") <= LEX_C)
        .select("query_id", "doc_id", "rank_lex")
    )

    emb = _vectors(spark, sf_dir).filter(F.size("embedding") == DIM)
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
    vec = (
        vscore.withColumn("rank_vec", F.row_number().over(wv).cast("bigint"))
        .filter(F.col("rank_vec") <= VEC_C)
        .select("query_id", "doc_id", "rank_vec")
    )

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
    return (
        fused.withColumn("hybrid_rank", F.row_number().over(wf).cast("bigint"))
        .filter(F.col("hybrid_rank") <= HYBRID_K)
        .select(
            "query_id", "hybrid_rank", "doc_id", "rank_lex", "rank_vec",
            "fused_score",
        )
    )
