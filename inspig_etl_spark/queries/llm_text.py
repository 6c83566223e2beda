"""Text-analysis + exact/fingerprint dedup queries over ``documents``
(LLM-data-pipeline surface; brief-mandated extension beyond SURVEY.md §2).

All expression-only (no UDFs); every query is DuckDB-oracle-checkable because
the hashes are md5-derived and the statistics are exact integer folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.functions.text import (
    HASH_P,
    md5_long,
    sql_md5_long,
    sql_stopword_count,
    sql_token_len_sum,
    sql_tokens,
    stopword_count,
    token_len_sum,
    tokens,
)
from inspig_etl_spark.operators.dedup import canonicalize, with_content_hash, with_fingerprint
from inspig_etl_spark.queries import register

_SQL_TOKS = sql_tokens("text")


@register(
    "docs_exact_dedup",
    operators="LLM-dedup-exact (content-hash groupBy; brief: 'exact (hash-groupBy)')",
    oracle="""
SELECT doc_id,
       md5(text) AS content_hash,
       MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
FROM documents
""",
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    hashed = with_content_hash(docs, "text")
    return canonicalize(hashed, "doc_id", "content_hash").select(
        "doc_id", "content_hash", "canonical_id", "is_dup"
    )


@register(
    "docs_fingerprint",
    operators="LLM-fingerprint (normalized md5 + polynomial rolling hash; brief: 'document fingerprinting (rolling hash)')",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
fp AS (
  SELECT doc_id,
         -- NULL-text gate: Spark's array_join([], ' ') is '' but DuckDB's
         -- array_to_string([], ' ') is NULL, so token-LESS docs need the
         -- COALESCE to fingerprint as md5('') like Spark; NULL-text docs
         -- stay NULL on both engines (and DuckDB's list_prepend(0, NULL)
         -- is [0], which would make a NULL doc's rolling hash 0 — gated).
         CASE WHEN toks IS NULL THEN NULL
              ELSE md5(COALESCE(array_to_string(toks, ' '), '')) END AS fingerprint,
         CASE WHEN toks IS NULL THEN NULL
              ELSE list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  list_transform(toks, s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {HASH_P})),
                (acc, h) -> (acc * 31 + h) % {HASH_P}) END AS rolling_hash
  FROM t
)
SELECT doc_id, fingerprint, rolling_hash,
       MIN(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
       CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY fingerprint) AS INT) AS is_dup
FROM fp
""",
)
def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    fp = with_fingerprint(docs, "text")
    return canonicalize(fp, "doc_id", "fingerprint").select(
        "doc_id", "fingerprint", "rolling_hash", "canonical_id", "is_dup"
    )


@register(
    "docs_token_stats",
    operators="LLM-text-stats (token counting, char stats, stopword ratio; brief: 'token counting, quality scoring')",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique,
       {sql_token_len_sum('toks')} AS total_token_chars,
       CAST(FLOOR({sql_token_len_sum('toks')} * 10000 / CAST(len(toks) AS DOUBLE)) AS BIGINT) AS avg_token_len_e4,
       {sql_stopword_count('toks', 'en')} AS stopword_cnt,
       CAST(FLOOR({sql_stopword_count('toks', 'en')} * 10000 / CAST(len(toks) AS DOUBLE)) AS BIGINT) AS stopword_ratio_e4,
       len(text) - len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS punct_chars
FROM t
""",
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token/char/stopword statistics, exact-integer end-to-end.

    The ratio columns are fixed-point 1e-4 BIGINTs (``FLOOR(x * 10000 / n)``),
    not ``ROUND(double, 4)``: per-doc float rounding diverged between Spark's
    exact-decimal HALF_UP and DuckDB's multiply-then-round (r02 hash_match
    failure). FLOOR over one double division is safe — the quotient is ≥ 1/n
    away from the next integer, far beyond double ulp at this magnitude.
    """
    docs = spread(table(spark, sf_dir, "documents"))
    d = docs.withColumn("toks", tokens(F.col("text")))
    toks = F.col("toks")
    n = F.size(toks).cast("bigint")
    chars = token_len_sum(toks)
    stop = stopword_count(toks, "en").cast("bigint")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        chars.alias("total_token_chars"),
        # nullif(n, 0): a zero-token doc (punct/emoji-only text after a
        # driver data regen) must yield NULL ratios like the oracle's
        # 0/0.0 does in DuckDB — under Spark 4's default ANSI mode the
        # unguarded division would throw DIVIDE_BY_ZERO instead.
        F.floor(chars * 10000 / F.nullif(n, F.lit(0)).cast("double"))
        .cast("bigint")
        .alias("avg_token_len_e4"),
        stop.alias("stopword_cnt"),
        F.floor(stop * 10000 / F.nullif(n, F.lit(0)).cast("double"))
        .cast("bigint")
        .alias("stopword_ratio_e4"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", ""))
        ).alias("punct_chars"),
    )


# Quality score in EXACT integer parts-per-million: bounded linear blend of
# token count (50%), stopword presence (20%), unique-token diversity (30%).
# Integer arithmetic end-to-end -> bit-identical across engines, no float
# round-tie hazards (a per-doc ROUND(double, 4) diverged between Spark's
# exact-decimal HALF_UP and DuckDB's multiply-then-round).
_SQL_QUALITY_PPM = (
    "(LEAST(len(toks), 80) * 6250"
    f" + LEAST({sql_stopword_count('toks', 'en')}, 8) * 25000"
    " + CAST(FLOOR(len(list_distinct(toks)) * 300000"
    " / CAST(NULLIF(len(toks), 0) AS DOUBLE)) AS BIGINT))"
)


@register(
    "docs_quality_by_source",
    operators="LLM-quality (doc quality scoring + per-source rollup; brief: 'quality scoring (length/punct/stopword ratios)')",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents
),
q AS (
  SELECT doc_id, source, {_SQL_QUALITY_PPM} AS quality_ppm FROM t
)
SELECT source,
       COUNT(*) AS doc_cnt,
       ROUND(CAST(SUM(quality_ppm) AS DOUBLE) / COUNT(*), 2) AS avg_quality_ppm,
       COUNT(CASE WHEN quality_ppm >= 750000 THEN 1 END) AS high_quality_cnt,
       COUNT(CASE WHEN quality_ppm < 500000 THEN 1 END) AS low_quality_cnt
FROM q
GROUP BY source
""",
)
def docs_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    d = docs.withColumn("toks", tokens(F.col("text")))
    toks = F.col("toks")
    n = F.size(toks).cast("bigint")
    quality_ppm = (
        F.least(n, F.lit(80).cast("bigint")) * 6250
        + F.least(stopword_count(toks, "en").cast("bigint"), F.lit(8).cast("bigint")) * 25000
        + F.floor(
            F.size(F.array_distinct(toks)).cast("bigint")
            * 300000
            / F.nullif(n, F.lit(0)).cast("double")  # ANSI 0/0 guard, see token_stats
        ).cast("bigint")
    )
    q = d.select("doc_id", "source", quality_ppm.alias("quality_ppm"))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.round(F.sum("quality_ppm").cast("double") / F.count(F.lit(1)), 2).alias(
            "avg_quality_ppm"
        ),
        F.count(F.when(F.col("quality_ppm") >= 750000, 1)).alias("high_quality_cnt"),
        F.count(F.when(F.col("quality_ppm") < 500000, 1)).alias("low_quality_cnt"),
    )


# Language-id heuristic: per-language stopword hit counts → argmax with a
# fixed tie-break order. On this synthetic corpus (shared vocabulary across
# langs) most docs tie at zero and fall through to the tie-break — the
# operator under test is the scoring/argmax plumbing, not model quality.
_LANGS = ("en", "de", "es", "fr", "zh")


@register(
    "docs_lang_id",
    operators="LLM-lang-id (n-gram/stopword scoring heuristic; brief: 'language-ID (n-gram heuristic)')",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents
),
s AS (
  SELECT doc_id, lang,
         {", ".join(f"{sql_stopword_count('toks', lg)} AS score_{lg}" for lg in _LANGS)}
  FROM t
)
SELECT doc_id, lang AS actual_lang,
       CASE {" ".join(f"WHEN score_{lg} = GREATEST(score_en, score_de, score_es, score_fr, score_zh) THEN '{lg}'" for lg in _LANGS)}
       END AS predicted_lang,
       score_en, score_de, score_es, score_fr, score_zh
FROM s
""",
)
def docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    d = docs.withColumn("toks", tokens(F.col("text")))
    for lg in _LANGS:
        d = d.withColumn(f"score_{lg}", stopword_count(F.col("toks"), lg))
    best = F.greatest(*[F.col(f"score_{lg}") for lg in _LANGS])
    expr = None
    for lg in _LANGS:
        cond = F.col(f"score_{lg}") == best
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        expr.alias("predicted_lang"),
        *[F.col(f"score_{lg}") for lg in _LANGS],
    )


# BPE-ish pre-tokenizer (GPT-2 shape, lookahead-free so the same pattern
# runs on Java regex and RE2): contraction suffixes, space-prefixed letter
# runs, digit runs, punctuation runs. Whitespace itself is glue, not a
# piece.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
_SQL_BPE = "len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))"
_SQL_WS = "CASE WHEN TRIM(text) = '' THEN 0 ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END"


@register(
    "docs_bpe_token_count",
    operators="LLM-text-bpe (token counting via whitespace split AND a BPE-ish pre-tokenizer regex; brief: 'token counting (whitespace + a BPE-ish regex)')",
    oracle=f"""
SELECT doc_id,
       {_SQL_WS} AS ws_tokens,
       {_SQL_BPE} AS bpe_pieces,
       CAST(FLOOR({_SQL_BPE} * 10000 / CAST(NULLIF({_SQL_WS}, 0) AS DOUBLE)) AS BIGINT) AS pieces_per_token_e4
FROM documents
""",
)
def docs_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting for training-data curation: the whitespace count and
    a BPE-style piece count (the better proxy for real tokenizer cost),
    plus their fixed-point ratio (fertility). Expression-only per-row work:
    one regex pass, no shuffle, prunes to (doc_id, text) at the scan.
    """
    docs = spread(table(spark, sf_dir, "documents"))
    ws = F.when(F.trim(F.col("text")) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_pieces"),
        F.floor(bpe * 10000 / F.nullif(ws, F.lit(0)).cast("double"))
        .cast("bigint")
        .alias("pieces_per_token_e4"),
    )


@register(
    "docs_repetition_filter",
    operators="LLM-quality-repetition (Gopher-style repetition rules: top-token fraction + duplicate-bigram fraction -> keep/drop flag; brief: quality family)",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         COALESCE(list_max(list_transform(list_distinct(toks),
                   d -> len(list_filter(toks, x -> x = d)))), 0) AS top_token_cnt,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS bigrams
  FROM t
),
f AS (
  SELECT doc_id, n_tokens, top_token_cnt,
         CASE WHEN n_tokens > 0
              THEN CAST(FLOOR(top_token_cnt * 10000 / CAST(n_tokens AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS top_token_frac_e4,
         len(bigrams) - len(list_distinct(bigrams)) AS dup_bigram_cnt,
         CASE WHEN len(bigrams) > 0
              THEN CAST(FLOOR((len(bigrams) - len(list_distinct(bigrams))) * 10000
                              / CAST(len(bigrams) AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS dup_bigram_frac_e4
  FROM m
)
SELECT doc_id, n_tokens, top_token_cnt, top_token_frac_e4,
       dup_bigram_cnt, dup_bigram_frac_e4,
       CAST(top_token_frac_e4 > 2000 OR dup_bigram_frac_e4 > 4000 AS INT) AS is_repetitive
FROM f
""",
)
def docs_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality rules [Rae et al. 2021, table A1]:
    docs dominated by one token (top-token fraction > 0.20) or by repeated
    word pairs (duplicate-bigram fraction > 0.40) are flagged for removal —
    the standard guard against boilerplate/spam in LLM training corpora.

    Fractions are fixed-point 1e-4 BIGINTs (FLOOR over one double division,
    the docs_token_stats convention) so both engines agree bit-exactly.
    Expression-only per-row work over the token array — no shuffle, no UDF.

    The top-token count is the LONGEST EQUAL RUN over ``sort_array(toks)``
    — one O(n log n) sort plus a single linear ``aggregate`` fold. The
    naive transform-over-distinct form is O(distinct x n) per document:
    fine on median docs but a single pathological 1M-unique-token document
    would pin one task on ~10^10 comparisons. Max-run-over-sorted computes
    the identical value (the most frequent token's occurrences are adjacent
    after sorting), so the DuckDB oracle keeps the naive spelling and the
    engines still agree bit-exactly.
    """
    docs = spread(table(spark, sf_dir, "documents"))
    d = docs.withColumn("toks", tokens(F.col("text")))
    toks = F.col("toks")
    n = F.size(toks).cast("bigint")

    def _run_step(acc: Column, x: Column) -> Column:
        # prev is NULL on the first element -> (x == NULL) is NULL -> run=1.
        run = (
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("bigint")
        )
        return F.struct(
            F.greatest(acc["best"], run).alias("best"),
            run.alias("run"),
            x.alias("prev"),
        )

    # coalesce: NULL text -> NULL toks -> the fold is NULL, but the oracle's
    # COALESCE(list_max(...), 0) yields 0.
    top_cnt = F.coalesce(
        F.aggregate(
            F.sort_array(toks),
            F.struct(
                F.lit(0).cast("bigint").alias("best"),
                F.lit(0).cast("bigint").alias("run"),
                F.lit(None).cast("string").alias("prev"),
            ),
            _run_step,
            lambda acc: acc["best"],
        ),
        F.lit(0),
    ).cast("bigint")
    bigrams = F.when(
        n >= 2,
        F.expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"),
    ).otherwise(F.expr("array()"))
    m = d.select(
        "doc_id",
        n.alias("n_tokens"),
        top_cnt.alias("top_token_cnt"),
        bigrams.alias("bigrams"),
    )
    nb = F.size("bigrams").cast("bigint")
    dup = (nb - F.size(F.array_distinct("bigrams"))).cast("bigint")
    f = m.select(
        "doc_id",
        "n_tokens",
        "top_token_cnt",
        F.when(
            F.col("n_tokens") > 0,
            F.floor(F.col("top_token_cnt") * 10000 / F.col("n_tokens").cast("double")),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("top_token_frac_e4"),
        dup.alias("dup_bigram_cnt"),
        F.when(nb > 0, F.floor(dup * 10000 / nb.cast("double")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("dup_bigram_frac_e4"),
    )
    return f.withColumn(
        "is_repetitive",
        ((F.col("top_token_frac_e4") > 2000) | (F.col("dup_bigram_frac_e4") > 4000)).cast("int"),
    )


# --- PII detection / redaction -------------------------------------------
#
# The synthetic corpus contains no PII (word-salad text: no '@', no digits),
# so the query first injects deterministic synthetic PII derived from doc_id
# with IDENTICAL expressions on both engines — the point under test is the
# detection/redaction kernel (regex count + global replace), not the corpus.
# At 100 TB the same three patterns run unchanged on real text: they are
# expression-only (JVM codegen'd regexp_extract_all / regexp_replace, no
# Python UDF) and embarrassingly parallel (no shuffle at all).
#
# Patterns are kept to the Java-regex / RE2 COMMON SUBSET (character
# classes, bounded repeats, non-capturing groups, \b word boundaries) so
# Spark (java.util.regex) and the DuckDB oracle (RE2) agree byte-for-byte.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b01[0-9]-[0-9]{3,4}-[0-9]{4}\b"
_PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

_SQL_PII_AUG = """
  text
  || CASE WHEN doc_id % 3 <> 0
          THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail-example.org'
          ELSE '' END
  || CASE WHEN doc_id % 2 = 0
          THEN ' call 010-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
               || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
          ELSE '' END
  || CASE WHEN doc_id % 5 = 0
          THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
               || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR)
          ELSE '' END
"""


@register(
    "docs_pii_redaction",
    operators=(
        "LLM-hygiene (PII detect + redact: email/phone/IPv4 regex count and "
        "global replace; training-data scrubbing family next to the quality "
        "filters; expression-only, shuffle-free)"
    ),
    oracle=f"""
WITH a AS (
  SELECT doc_id, ({_SQL_PII_AUG}) AS aug FROM documents
),
c AS (
  SELECT doc_id, aug,
         len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS email_cnt,
         len(regexp_extract_all(aug, '{_PII_PHONE}')) AS phone_cnt,
         len(regexp_extract_all(aug, '{_PII_IP}')) AS ip_cnt,
         regexp_replace(
           regexp_replace(
             regexp_replace(aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IP}', '<IP>', 'g') AS redacted
  FROM a
)
SELECT doc_id, email_cnt, phone_cnt, ip_cnt,
       email_cnt + phone_cnt + ip_cnt AS pii_cnt,
       len(aug) AS aug_len,
       len(redacted) AS redacted_len,
       CAST(email_cnt + phone_cnt + ip_cnt = 0 AS INT) AS is_clean
FROM c
""",
)
def docs_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub kernel: count + redact emails / KR-mobile phones / IPv4s.

    The reference has no PII pass (its data is barn telemetry); this is the
    brief-mandated training-data-pipeline extension. Deterministic synthetic
    PII is injected from ``doc_id`` (see ``_SQL_PII_AUG``) because the test
    corpus has none; detection and redaction then run on the augmented text
    exactly as they would on real documents at scale.
    """
    docs = spread(table(spark, sf_dir, "documents"))
    did = F.col("doc_id")

    def _num(col: F.Column) -> F.Column:
        return col.cast("string")

    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 != 0,
            F.concat(F.lit(" reach user"), _num(did), F.lit("@mail-example.org")),
        ).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" call 010-"),
                F.lpad(_num((did * 7) % 10000), 4, "0"),
                F.lit("-"),
                F.lpad(_num((did * 13) % 10000), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" host 10."),
                _num(did % 256),
                F.lit(".0."),
                _num((did * 3) % 256),
            ),
        ).otherwise(F.lit("")),
    )
    a = docs.select("doc_id", aug.alias("aug"))
    email_cnt = F.size(F.regexp_extract_all(F.col("aug"), F.lit(_PII_EMAIL), 0))
    phone_cnt = F.size(F.regexp_extract_all(F.col("aug"), F.lit(_PII_PHONE), 0))
    ip_cnt = F.size(F.regexp_extract_all(F.col("aug"), F.lit(_PII_IP), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    c = a.select(
        "doc_id",
        email_cnt.cast("bigint").alias("email_cnt"),
        phone_cnt.cast("bigint").alias("phone_cnt"),
        ip_cnt.cast("bigint").alias("ip_cnt"),
        F.length("aug").cast("bigint").alias("aug_len"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
    )
    pii = F.col("email_cnt") + F.col("phone_cnt") + F.col("ip_cnt")
    return c.select(
        "doc_id",
        "email_cnt",
        "phone_cnt",
        "ip_cnt",
        pii.alias("pii_cnt"),
        "aug_len",
        "redacted_len",
        (pii == 0).cast("int").alias("is_clean"),
    )


# --- Sequence packing ----------------------------------------------------

PACK_CAPACITY = 128  # tokens per packed training sequence


@register(
    "docs_sequence_packing",
    operators=(
        "LLM-packing (greedy fixed-capacity sequence packing: docs in "
        "doc_id order per source shard fold into 128-token bins — the "
        "pretraining batch-construction step; stateful recurrence via "
        "Arrow-batched applyInPandas, oracle via recursive CTE)"
    ),
    oracle=f"""
WITH RECURSIVE t AS (
  -- COALESCE: a NULL text tokenizes to NULL; it packs as a 0-token doc
  SELECT doc_id, source, COALESCE(CAST(len({_SQL_TOKS}) AS BIGINT), 0) AS n
  FROM documents
),
o AS (
  SELECT doc_id, source, n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM t
),
rec AS (
  SELECT source, rn, doc_id, n, CAST(0 AS BIGINT) AS bin_no, n AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.source, o.rn, o.doc_id, o.n,
         CASE WHEN r.fill + o.n <= {{C}} THEN r.bin_no ELSE r.bin_no + 1 END,
         CASE WHEN r.fill + o.n <= {{C}} THEN r.fill + o.n ELSE o.n END
  -- IS NOT DISTINCT FROM: a NULL source is a real shard; o.source =
  -- r.source would drop every NULL-source doc after the first from
  -- the recursion while the Spark fold packs them all
  FROM rec r JOIN o ON o.source IS NOT DISTINCT FROM r.source AND o.rn = r.rn + 1
)
SELECT doc_id, source, n AS n_tokens, bin_no, fill AS bin_fill FROM rec
""".replace("{C}", str(PACK_CAPACITY)),
)
def docs_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy fixed-capacity sequence packing (pretraining batch prep).

    Documents are folded, in deterministic ``doc_id`` order within each
    ``source`` shard, into 128-token bins: a doc joins the current bin if
    it fits, else opens the next (an oversized doc gets a bin to itself).
    The recurrence (bin fill depends on every prior placement) is not
    expressible with plain windows — ``floor(cumsum/C)`` would SPLIT docs
    across bins — so each shard runs one linear fold. The oracle computes
    the identical fold with a recursive CTE.

    Scale shape: one shuffle on the shard key + a partition-local sort
    (the secondary-sort idiom), then a streaming Arrow-batched fold whose
    per-shard state is two integers — memory O(arrow batch), never
    O(shard), unlike ``groupBy().applyInPandas`` which materializes the
    whole shard in one task. Real pipelines pack per shard exactly like
    this (global greedy order is not a goal — determinism within a shard
    is). The packing input is pre-projected to three narrow columns so
    the Arrow transfer never carries text.
    """
    import pandas as pd

    docs = spread(table(spark, sf_dir, "documents"))
    sized = docs.select(
        "doc_id",
        "source",
        # coalesce: a NULL text tokenizes to NULL; it packs as a 0-token
        # doc (mirrored in the oracle) instead of poisoning the Arrow
        # long column with NaN.
        F.coalesce(F.size(tokens(F.col("text"))), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
    )

    # Secondary-sort fold, NOT groupBy().applyInPandas(): applyInPandas
    # materializes each source shard as ONE pandas frame in ONE task, so a
    # hot shard OOMs even though the fold needs two integers of state.
    # repartition(source) puts each shard wholly in one partition,
    # sortWithinPartitions fixes the fold order, and mapInPandas streams
    # the partition's Arrow batches through a per-source state dict —
    # memory is O(arrow batch), parallelism is O(partitions).
    def pack(batches):
        state: dict = {}  # source -> [bin_no, fill]
        for pdf in batches:
            bin_nos = []
            fills = []
            for src, n in zip(pdf["source"], pdf["n_tokens"]):
                n = int(n)
                st = state.get(src)
                if st is None:
                    st = state[src] = [0, n]
                elif st[1] + n <= PACK_CAPACITY:
                    st[1] += n
                else:
                    st[0] += 1
                    st[1] = n
                bin_nos.append(st[0])
                fills.append(st[1])
            out = pdf[["doc_id", "source", "n_tokens"]].copy()
            out["bin_no"] = pd.Series(bin_nos, dtype="int64")
            out["bin_fill"] = pd.Series(fills, dtype="int64")
            yield out

    return (
        sized.repartition("source")
        .sortWithinPartitions("source", "doc_id")
        .mapInPandas(
            pack, "doc_id long, source string, n_tokens long, bin_no long, bin_fill long"
        )
    )


# --- linear quality classifier ------------------------------------------

# fastText/CCNet-style document-quality filter: a linear model over cheap
# per-doc features, scored inline as a codegen'd expression (the weights
# stand in for trained coefficients — in production they come from a model
# dump and are broadcast as literals exactly like this). All features are
# exact integers / 1e-4 fixed-point, so the logit is a BIGINT and the
# keep/reject verdict is bit-identical on both engines — no sigmoid needed
# (monotone, so thresholding the logit IS thresholding the probability).
_CLS_BIAS = 36_000
_CLS_W_LEN = 350  # tokens, capped at 256 (longer adds no signal)
_CLS_W_STOP = 9  # stopword ratio (1e-4): natural-language indicator
_CLS_W_UNIQ = 6  # unique-token ratio (1e-4): anti-boilerplate
_CLS_W_PUNCT = -8  # non-alnum char ratio (1e-4): markup/junk penalty
_CLS_W_AWL = -2  # avg token length (1e-4): gibberish/URL penalty

_SQL_CLS_FEATURES = f"""
  SELECT doc_id, source,
         LEAST(COALESCE(len(toks), 0), 256) AS f_len,
         COALESCE(CAST(FLOOR({sql_stopword_count('toks', 'en')} * 10000
           / CAST(NULLIF(len(toks), 0) AS DOUBLE)) AS BIGINT), 0) AS f_stop_e4,
         COALESCE(CAST(FLOOR(len(list_distinct(toks)) * 10000
           / CAST(NULLIF(len(toks), 0) AS DOUBLE)) AS BIGINT), 0) AS f_uniq_e4,
         COALESCE(CAST(FLOOR(len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 10000
           / CAST(NULLIF(len(text), 0) AS DOUBLE)) AS BIGINT), 0) AS f_punct_e4,
         COALESCE(CAST(FLOOR({sql_token_len_sum('toks')} * 10000
           / CAST(NULLIF(len(toks), 0) AS DOUBLE)) AS BIGINT), 0) AS f_awl_e4
  FROM t
"""


@register(
    "docs_quality_classifier",
    operators="LLM-quality-classifier (linear model scoring + keep verdict; brief: 'quality scoring' — the trained-filter form of docs_quality_by_source's heuristic)",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
)
SELECT doc_id, source, f_len, f_stop_e4, f_uniq_e4, f_punct_e4, f_awl_e4,
       {_CLS_BIAS} + {_CLS_W_LEN} * f_len + {_CLS_W_STOP} * f_stop_e4
         + {_CLS_W_UNIQ} * f_uniq_e4 + {_CLS_W_PUNCT} * f_punct_e4
         + {_CLS_W_AWL} * f_awl_e4 AS logit_e4,
       CAST(({_CLS_BIAS} + {_CLS_W_LEN} * f_len + {_CLS_W_STOP} * f_stop_e4
         + {_CLS_W_UNIQ} * f_uniq_e4 + {_CLS_W_PUNCT} * f_punct_e4
         + {_CLS_W_AWL} * f_awl_e4) >= 0 AS INT) AS keep
FROM f
""",
)
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the linear quality model and emit the
    keep/reject verdict plus the feature vector (for threshold tuning).

    Scale shape: per-row expressions only — embarrassingly parallel, zero
    shuffle, fully inside whole-stage codegen; at 100 TB this is a pure
    scan-speed filter, the cheapest possible classifier serving path.
    Degenerate docs (NULL/token-less text) get all-zero features and fall
    to the bias, which rejects them.
    """
    return _cls_logit_frame(spark, sf_dir).withColumn(
        "keep", (F.col("logit_e4") >= 0).cast("int")
    )


def _cls_logit_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared classifier scoring: (doc_id, source, features, logit_e4) —
    used by the keep-verdict query above and the bucket resampler below."""
    docs = spread(table(spark, sf_dir, "documents"))
    d = docs.withColumn("toks", tokens(F.col("text")))
    toks = F.col("toks")
    n = F.size(toks).cast("bigint")
    zero = F.lit(0).cast("bigint")

    def _ratio_e4(num):
        return F.coalesce(
            F.floor(num * 10000 / F.nullif(n, F.lit(0)).cast("double")).cast("bigint"),
            zero,
        )

    f_len = F.least(F.coalesce(n, zero), F.lit(256).cast("bigint"))
    f_stop = _ratio_e4(stopword_count(toks, "en").cast("bigint"))
    f_uniq = _ratio_e4(F.size(F.array_distinct(toks)).cast("bigint"))
    f_punct = F.coalesce(
        F.floor(
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("bigint")
            * 10000
            / F.nullif(F.length("text"), F.lit(0)).cast("double")
        ).cast("bigint"),
        zero,
    )
    f_awl = _ratio_e4(token_len_sum(toks))
    feats = d.select(
        "doc_id",
        "source",
        f_len.alias("f_len"),
        f_stop.alias("f_stop_e4"),
        f_uniq.alias("f_uniq_e4"),
        f_punct.alias("f_punct_e4"),
        f_awl.alias("f_awl_e4"),
    )
    logit = (
        F.lit(_CLS_BIAS)
        + F.lit(_CLS_W_LEN) * F.col("f_len")
        + F.lit(_CLS_W_STOP) * F.col("f_stop_e4")
        + F.lit(_CLS_W_UNIQ) * F.col("f_uniq_e4")
        + F.lit(_CLS_W_PUNCT) * F.col("f_punct_e4")
        + F.lit(_CLS_W_AWL) * F.col("f_awl_e4")
    )
    return feats.withColumn("logit_e4", logit)


# CCNet-style quality-bucket resampling: bucket by classifier logit, then
# keep each bucket at its own deterministic hash-gate rate. Thresholds are
# broadcast literals exactly as a production model dump would be.
_QBS_HEAD = 2_500  # logit_e4 >= head threshold → 'head' bucket
_QBS_TAIL = -2_500  # logit_e4 < tail threshold → 'tail' bucket
_QBS_RATES = {"head": 1_000_000, "middle": 500_000, "tail": 100_000}  # ppm

_SQL_CLS_LOGIT = (
    f"{_CLS_BIAS} + {_CLS_W_LEN} * f_len + {_CLS_W_STOP} * f_stop_e4"
    f" + {_CLS_W_UNIQ} * f_uniq_e4 + {_CLS_W_PUNCT} * f_punct_e4"
    f" + {_CLS_W_AWL} * f_awl_e4"
)


@register(
    "docs_quality_bucket_sample",
    operators=(
        "LLM-quality-bucket-sample (CCNet-style head/middle/tail resampling: "
        "linear-classifier logit buckets x per-bucket deterministic hash-gate "
        "rates — keep all head, half of middle, a tenth of tail; brief: "
        "quality scoring + sampling composed)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
),
b AS (
  SELECT doc_id, source, {_SQL_CLS_LOGIT} AS logit_e4,
         CASE WHEN {_SQL_CLS_LOGIT} >= {_QBS_HEAD} THEN 'head'
              WHEN {_SQL_CLS_LOGIT} >= {_QBS_TAIL} THEN 'middle'
              ELSE 'tail' END AS bucket,
         CAST(CASE WHEN {_SQL_CLS_LOGIT} >= {_QBS_HEAD} THEN {_QBS_RATES['head']}
              WHEN {_SQL_CLS_LOGIT} >= {_QBS_TAIL} THEN {_QBS_RATES['middle']}
              ELSE {_QBS_RATES['tail']} END AS BIGINT) AS rate_ppm
  FROM f
)
SELECT doc_id, source, logit_e4, bucket, rate_ppm
FROM b
WHERE {sql_md5_long("'qbs' || CAST(doc_id AS VARCHAR)")} % 1000000 < rate_ppm
""",
)
def docs_quality_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bucket resampling (Wenzek et al.): documents are bucketed
    head/middle/tail by model score (here the linear classifier's logit;
    CCNet uses LM perplexity terciles — the thresholds are precomputed
    constants either way), then each bucket keeps a different deterministic
    fraction — all of head, half of middle, 10% of tail — so low-quality
    text is down-weighted without being zeroed out.

    Scale shape: the score, the bucket CASE, and the md5 hash gate are all
    per-row codegen'd expressions on the scan — zero shuffle, reproducible
    under any partitioning/retry (the same property every sampler in
    queries/llm_sampling.py guarantees).
    """
    scored = _cls_logit_frame(spark, sf_dir)
    bucket = (
        F.when(F.col("logit_e4") >= _QBS_HEAD, F.lit("head"))
        .when(F.col("logit_e4") >= _QBS_TAIL, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    rate = (
        F.when(F.col("logit_e4") >= _QBS_HEAD, F.lit(_QBS_RATES["head"]))
        .when(F.col("logit_e4") >= _QBS_TAIL, F.lit(_QBS_RATES["middle"]))
        .otherwise(F.lit(_QBS_RATES["tail"]))
        .cast("bigint")
    )
    gate = md5_long(F.concat(F.lit("qbs"), F.col("doc_id").cast("string"))) % 1_000_000
    return (
        scored.select("doc_id", "source", "logit_e4",
                      bucket.alias("bucket"), rate.alias("rate_ppm"))
        .where(gate < F.col("rate_ppm"))
    )


# Per-source token budget for the curation query: sources average ~1350
# tokens at sf0.01, so 600 forces every source to cut its tail while
# keeping a meaningful head.
_CURATION_BUDGET = 600


@register(
    "docs_token_budget_curation",
    operators=(
        "LLM-budget-curation (quality-ranked selection under a per-source "
        "token budget: rank by classifier logit, keep while the running "
        "token sum fits — the budgeted data-selection step after scoring; "
        "brief: quality scoring + token counting composed; W3 running-sum "
        "kernel per stratum)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
),
s AS (
  SELECT f.doc_id, f.source, {_SQL_CLS_LOGIT} AS logit_e4,
         COALESCE(len(t.toks), 0) AS n_tokens
  FROM f JOIN t ON f.doc_id = t.doc_id
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY logit_e4 DESC, doc_id) AS quality_rank,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY logit_e4 DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM s
)
SELECT doc_id, source, logit_e4, n_tokens,
       CAST(quality_rank AS INT) AS quality_rank,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM r WHERE cum_tokens <= {_CURATION_BUDGET}
""",
)
def docs_token_budget_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted data selection: after quality scoring, real pipelines don't
    keep "everything above a threshold" — they keep the best N tokens per
    source to hit a target mixture size. Rank each source's docs by
    classifier logit and keep the prefix whose running token sum fits the
    budget (a doc that would overflow the budget is cut, and everything
    after it with it — the deterministic greedy rule).

    Scale shape: one shuffle onto source for the rank + running-sum window
    (the W3 kernel per stratum); the score and token count are per-row
    expressions. Window state is one source's docs — at 100 TB with few
    huge sources, swap in the two-stage pre-aggregated top-k
    (operators/skew.py) exactly as docs_reservoir_per_source documents.
    """
    scored = _cls_logit_frame(spark, sf_dir)
    docs = spread(table(spark, sf_dir, "documents"))
    n_tokens = F.coalesce(
        F.size(tokens(F.col("text"))).cast("bigint"), F.lit(0).cast("bigint")
    )
    sized = docs.select("doc_id", n_tokens.alias("n_tokens"))
    s = scored.select("doc_id", "source", "logit_e4").join(sized, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("logit_e4").desc(), F.col("doc_id")
    )
    r = s.withColumn("quality_rank", F.row_number().over(w).cast("int")).withColumn(
        "cum_tokens",
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return r.where(F.col("cum_tokens") <= _CURATION_BUDGET).select(
        "doc_id", "source", "logit_e4", "n_tokens", "quality_rank", "cum_tokens"
    )


TFIDF_TOP_K = 3
IDF_E6 = 1_000_000  # fixed-point idf: (N * 1e6) // df — exact in both engines


@register(
    "docs_tfidf_topterms",
    operators=(
        "LLM-text-tfidf (per-doc top-k keyword extraction by integer "
        "fixed-point tf-idf: tf x ((N * 1e6) // df), ranked with "
        "deterministic term tie-break; brief: 'text analysis' family)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2
),
df AS (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY 1
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM t),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf * ((n.n_docs * {IDF_E6}) // df.df) AS BIGINT) AS score_e6
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score_e6 DESC, term) AS rank
  FROM scored
)
SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf, df, score_e6
FROM r WHERE rank <= {TFIDF_TOP_K}
""",
)
def docs_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by integer fixed-point tf-idf.

    The usual ``tf * ln(N/df)`` is replaced by ``tf * ((N * 1e6) // df)``:
    per-term ranking under a per-doc window only needs a score MONOTONE in
    (tf, 1/df), and the integer form is bit-identical across engines where
    ``ln`` would be at the mercy of each libm's last ulp. N and df count
    DISTINCT docs, so in-doc repetition raises tf but never df.

    Scale shape: explode -> (doc, term) partial-agg count (map-side combine
    collapses in-doc repeats before the shuffle) -> term-keyed shuffle for
    df -> score join keyed on term (both sides already term-partitioned, no
    extra exchange) -> one doc-keyed window for top-k. The N scalar joins
    as a broadcast literal. No float, no UDF, no collect.
    """
    docs = spread(table(spark, sf_dir, "documents"))
    # The ARRAY-form token frame is persisted and each of the three
    # consumers (tf, df, n) explodes from the cache (r16). Measured NEUTRAL
    # at sf0.1 on local[32] — the three redundant scan+tokenize passes it
    # removes run in parallel on otherwise-idle cores there — but at scale
    # they are three full corpus scans; the compact array cache removes
    # them for free locally (caching the EXPLODED rows instead measured
    # slower: row-store barrier). clearCache() after the action unpersists.
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks")).persist()
    t = toks.select("doc_id", F.explode("toks").alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = t.groupBy("term").agg(
        F.countDistinct("doc_id").cast("bigint").alias("df")
    )
    n = t.select(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            "df",
            # DIV, not '/': Spark '/' is double division — exact BIGINT
            # quotient must match DuckDB's '//' (both floor for positives)
            (F.col("tf") * F.expr(f"(n_docs * {IDF_E6}) DIV df"))
            .cast("bigint")
            .alias("score_e6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_e6").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "rank", "term", "tf", "df", "score_e6")
    )


BPE_TOP = 20


@register(
    "docs_bpe_merge_candidates",
    operators=(
        "LLM-vocab-bpe-merge (corpus-wide most-frequent ADJACENT token "
        "pairs — the candidate-scoring step of one BPE merge round, the "
        "vocabulary-induction pass a tokenizer build runs over the whole "
        "corpus; brief: training-data pipeline ops)"
    ),
    oracle=f"""
WITH t AS (
  SELECT {_SQL_TOKS} AS toks FROM documents WHERE text IS NOT NULL
),
p AS (
  SELECT unnest(list_transform(
           list_zip(list_slice(toks, 1, len(toks) - 1),
                    list_slice(toks, 2, len(toks))),
           z -> z[1] || ' ' || z[2])) AS pair
  FROM t WHERE len(toks) >= 2
)
SELECT pair, COUNT(*) AS cnt
FROM p GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {BPE_TOP}
""",
)
def docs_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scoring pass of one BPE merge round: count every ADJACENT token
    pair occurrence across the corpus (multiplicity preserved — the same
    bigram twice in one doc counts twice, exactly what the merge objective
    maximizes) and surface the top candidates. A full tokenizer build
    loops this kernel, re-pairing after each merge; each round is this
    same plan.

    Scale shape: pairing is a per-row zip_with over two shifted slices
    (no joins, no per-position shuffle), the count is one partial-
    aggregated groupBy on the pair string, and the top-k compiles to
    TakeOrderedAndProject. Ties at the cut rank break on the pair string —
    tokens are ASCII by construction (the tokenizer folds/splits away
    everything else), so both engines' binary string order agrees.
    """
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    t = docs.select(tokens(F.col("text")).alias("toks")).filter(F.size("toks") >= 2)
    cnt = F.size(F.col("toks")) - 1
    pairs = F.zip_with(
        F.slice(F.col("toks"), F.lit(1), cnt),
        F.slice(F.col("toks"), F.lit(2), cnt),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        t.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(BPE_TOP)
    )


BPE_TRAIN_ROUNDS = 3


def _sql_bpe_apply_round(prev_t: str, best: str, out_t: str) -> str:
    """One oracle merge round: positional explode of ``{prev_t}.toks``,
    greedy left-to-right application of the pair in ``{best}`` (within a
    run of consecutive matches, merges land on alternating positions
    starting at the run head — the gaps-and-islands form of the fold the
    Spark side runs), re-aggregated into ``{out_t}(doc_id, toks)``."""
    return f"""
e{out_t} AS (
  SELECT doc_id, i, toks[i] AS tok, toks[i + 1] AS nxt
  FROM {prev_t}, unnest(generate_series(1, len(toks))) s(i)
),
m{out_t} AS (
  SELECT doc_id, i, tok, nxt,
         COALESCE(tok = (SELECT a FROM {best}) AND nxt = (SELECT b FROM {best}),
                  FALSE) AS mt
  FROM e{out_t}
),
g{out_t} AS (
  SELECT *, i - ROW_NUMBER() OVER (PARTITION BY doc_id, mt ORDER BY i) AS grp
  FROM m{out_t}
),
h{out_t} AS (
  SELECT *, mt AND (ROW_NUMBER() OVER (PARTITION BY doc_id, mt, grp ORDER BY i)
                    - 1) % 2 = 0 AS mh
  FROM g{out_t}
),
c{out_t} AS (
  SELECT *, COALESCE(LAG(mh) OVER (PARTITION BY doc_id ORDER BY i), FALSE)
            AS consumed
  FROM h{out_t}
),
{out_t} AS (
  SELECT doc_id,
         COALESCE(list(CASE WHEN mh THEN tok || '_' || nxt ELSE tok END
                       ORDER BY i) FILTER (NOT consumed), []) AS toks
  FROM c{out_t} GROUP BY doc_id
)"""


def _sql_bpe_best(prev_t: str, best: str) -> str:
    """Top-1 adjacent pair of a round (cnt DESC, then ASCII pair order)."""
    return f"""
p{best} AS (
  SELECT unnest(list_transform(
           list_zip(list_slice(toks, 1, len(toks) - 1),
                    list_slice(toks, 2, len(toks))),
           z -> z[1] || ' ' || z[2])) AS pair
  FROM {prev_t} WHERE len(toks) >= 2
),
{best} AS (
  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM p{best} GROUP BY pair
  ORDER BY cnt DESC, pair LIMIT 1
)"""


def _bpe_train_oracle() -> str:
    parts = [
        f"""t0 AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents WHERE text IS NOT NULL
)"""
    ]
    selects = []
    for r in range(1, BPE_TRAIN_ROUNDS + 1):
        parts.append(_sql_bpe_best(f"t{r - 1}", f"b{r}"))
        if r < BPE_TRAIN_ROUNDS:
            parts.append(_sql_bpe_apply_round(f"t{r - 1}", f"b{r}", f"t{r}"))
        selects.append(
            f"SELECT CAST({r} AS INT) AS round, a AS tok_a, b AS tok_b, "
            f"a || '_' || b AS merged, cnt FROM b{r}"
        )
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL ".join(selects)


@register(
    "docs_bpe_train_merges",
    operators=(
        "LLM-vocab-bpe-train (iterative BPE trainer: 3 unrolled merge "
        "rounds — score adjacent pairs corpus-wide, pick the top pair, "
        "APPLY it greedily left-to-right, re-score; the merge sequence is "
        "the trained vocabulary prefix, hash-gated cross-engine like the "
        "k-means unrolled oracle)"
    ),
    oracle=_bpe_train_oracle(),
)
def docs_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training loop ``docs_bpe_merge_candidates`` only scores one
    round of: each round counts every adjacent token pair, merges the
    most frequent pair (ties on ASCII pair order) everywhere in the
    corpus, and re-scores. Merge application is greedy left-to-right —
    within a run of consecutive matches only alternating positions merge
    ([a,a,a] + (a,a) -> [a_a, a]) — implemented as a per-row
    ``F.aggregate`` fold with two fields of state (no explode, no
    per-position shuffle; the oracle's gaps-and-islands windows compute
    the identical alternation).

    Scale shape: per round, ONE corpus scan for the pair count (partial-
    aggregated groupBy + TakeOrderedAndProject top-1) and a driver-side
    collect of exactly one row — the k-means iterative contract (bounded
    reduce per round, merge literals broadcast back inside the next
    round's expression). Round r's scan re-derives tokens + r-1 folds
    instead of caching the corpus — at 100 TB recomputing a per-row
    expression chain beats materializing a reshaped corpus per round.
    """
    _, out_rows = _bpe_train(spark, sf_dir)
    schema = "round int, tok_a string, tok_b string, merged string, cnt bigint"
    return spark.createDataFrame(out_rows, schema)


def _bpe_apply_merge(toks: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right application of one merge (a, b) -> 'a_b' as a
    per-row fold: state = (emitted tokens, pending previous token)."""
    merged_tok = f"{a}_{b}"

    def make_step(_a: str, _b: str, _m: str):
        # Factory, not default args: pyspark inspects the lambda arity.
        def step(acc, tok):
            prev = acc.getField("prev")
            out = acc.getField("out")
            hit = prev.isNotNull() & (prev == F.lit(_a)) & (tok == F.lit(_b))
            new_out = (
                F.when(hit, F.concat(out, F.array(F.lit(_m))))
                .when(prev.isNotNull(), F.concat(out, F.array(prev)))
                .otherwise(out)
            )
            new_prev = F.when(hit, F.lit(None).cast("string")).otherwise(tok)
            return F.struct(new_out.alias("out"), new_prev.alias("prev"))

        return step

    def fin(acc):
        return F.when(
            acc.getField("prev").isNotNull(),
            F.concat(acc.getField("out"), F.array(acc.getField("prev"))),
        ).otherwise(acc.getField("out"))

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    return F.aggregate(toks, init, make_step(a, b, merged_tok), fin)


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Run the BPE training loop: returns (tokens-after-all-merges frame,
    merge rows). Each round is one corpus scan + a 1-row driver collect;
    every round's winning merge IS applied (the encoder consumes the final
    frame; the trainer consumes only the rows)."""
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    cur = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    out_rows = []
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        t = cur.filter(F.size("toks") >= 2)
        n = F.size(F.col("toks")) - 1
        pairs = F.zip_with(
            F.slice(F.col("toks"), F.lit(1), n),
            F.slice(F.col("toks"), F.lit(2), n),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
        top = (
            t.select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .collect()  # bounded: exactly one row per training round
        )
        if not top:
            break
        a, b = top[0]["pair"].split(" ", 1)
        cnt = int(top[0]["cnt"])
        out_rows.append((rnd, a, b, f"{a}_{b}", cnt))
        cur = cur.select(
            "doc_id", _bpe_apply_merge(F.col("toks"), a, b).alias("toks")
        )
    return cur, out_rows


def _bpe_encode_oracle() -> str:
    """All BPE_TRAIN_ROUNDS merges applied, then per-doc piece counts."""
    parts = [
        f"""t0 AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents WHERE text IS NOT NULL
)"""
    ]
    for r in range(1, BPE_TRAIN_ROUNDS + 1):
        parts.append(_sql_bpe_best(f"t{r - 1}", f"b{r}"))
        parts.append(_sql_bpe_apply_round(f"t{r - 1}", f"b{r}", f"t{r}"))
    last = f"t{BPE_TRAIN_ROUNDS}"
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT t0.doc_id,
       CAST(COALESCE(len(t0.toks), 0) AS BIGINT) AS n_toks,
       -- LEFT JOIN + fallback: zero-token docs emit no positional rows, so
       -- the apply-round re-aggregation loses them — they encode unchanged
       CAST(COALESCE(len({last}.toks), len(t0.toks), 0) AS BIGINT) AS n_pieces,
       CAST(COALESCE(len(t0.toks), 0)
            - COALESCE(len({last}.toks), len(t0.toks), 0) AS BIGINT) AS n_merged
FROM t0 LEFT JOIN {last} USING (doc_id)
"""
    )


@register(
    "docs_bpe_encode",
    operators=(
        "LLM-vocab-bpe-encode (tokenizer APPLICATION: encode every document "
        "with the trained merge sequence — all trainer rounds' merges "
        "applied greedily left-to-right per doc — and report the per-doc "
        "piece counts before/after; the deploy half of docs_bpe_train_merges)"
    ),
    oracle=_bpe_encode_oracle(),
)
def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the trained tokenizer: the merge sequence
    from the training loop (same ``BPE_TRAIN_ROUNDS``-round run — trainer
    and encoder must agree or the vocabulary drifts) is applied to every
    document, and each doc reports its original whitespace-token count,
    its encoded piece count, and how many merges fired. This is the
    "tokenize the corpus" pass every pipeline runs after training a
    vocabulary — and the compression observability (sum(n_merged)) that
    tells the owner whether the merges were worth it.

    Scale shape: training is the bounded per-round reduce (see
    ``docs_bpe_train_merges``); encoding is ONE more scan with the merge
    folds as per-row expressions and an id equi-join against the original
    token counts — no shuffle grows with the vocabulary.
    """
    enc, _ = _bpe_train(spark, sf_dir)
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    base = docs.select(
        "doc_id",
        F.coalesce(F.size(tokens(F.col("text"))), F.lit(0))
        .cast("bigint")
        .alias("n_toks"),
    )
    pieces = enc.select(
        "doc_id",
        F.coalesce(F.size("toks"), F.lit(0)).cast("bigint").alias("n_pieces"),
    )
    return base.join(pieces, "doc_id").select(
        "doc_id",
        "n_toks",
        "n_pieces",
        (F.col("n_toks") - F.col("n_pieces")).cast("bigint").alias("n_merged"),
    )


# --- unigram surprisal (integer-exact perplexity-filter shape) --------------

SURPRISAL_FLUENT_E3 = 9_000  # keep docs under ~9 bits mean token surprisal


@register(
    "docs_unigram_surprisal",
    operators=(
        "LLM-quality-lm (CCNet-shaped language-model fluency filter, "
        "integer-exact: corpus unigram counts -> per-token surprisal "
        "floor(log2(N/cnt)) via binary length -> per-doc mean in 1e-3 "
        "fixed point + keep-low-surprisal verdict — the deterministic "
        "stand-in for the KenLM perplexity gate)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents WHERE text IS NOT NULL
),
x AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
),
v AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM x GROUP BY tok
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM x),
s AS (
  SELECT x.doc_id,
         CAST(SUM(length(bin((SELECT total FROM n) // v.cnt)) - 1)
              AS BIGINT) AS surprisal_sum,
         CAST(COUNT(*) AS BIGINT) AS n_toks
  FROM x JOIN v USING (tok)
  GROUP BY x.doc_id
)
SELECT t.doc_id,
       COALESCE(s.n_toks, 0) AS n_toks,
       COALESCE(s.surprisal_sum, 0) AS surprisal_sum,
       CAST(s.surprisal_sum * 1000 // NULLIF(s.n_toks, 0) AS BIGINT)
         AS mean_surprisal_e3,
       CAST(COALESCE(s.surprisal_sum * 1000 // NULLIF(s.n_toks, 0)
                     <= {SURPRISAL_FLUENT_E3}, FALSE) AS INT) AS is_fluent
FROM t LEFT JOIN s USING (doc_id)
""",
)
def docs_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perplexity-filter shape (CCNet keeps LOW-perplexity docs) made
    integer-exact: every token's surprisal is floor(log2(N / count(tok)))
    — computed as ``length(bin(N // cnt)) - 1``, pure integer on both
    engines, no float log — and a doc's fluency score is the 1e-3
    fixed-point mean. Rare-token-heavy docs (gibberish, boilerplate IDs,
    wrong-language spans) score high and fail the gate; production swaps
    the unigram table for a trained KenLM without changing the plan
    shape (broadcast model table, per-token lookup, per-doc agg).

    Scale shape: one explode + groupBy(token) builds the unigram table
    (partial-aggregated; at 100 TB it is the persisted vocab artifact),
    the per-token lookup is an equi-join on the token, and the per-doc
    mean is one more groupBy; zero-token docs survive via the LEFT JOIN
    with NULL scores (the oracle's COALESCE/NULLIF mirrors them).
    """
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    t = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    x = t.select("doc_id", F.explode("toks").alias("tok"))
    v = x.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    total = x.count()  # one scalar to the driver — the corpus token count
    # `div`, not `/`: the oracle's `//` is integer division, and a double
    # quotient near a power of 2 can round UP across the log2 boundary at
    # real corpus sizes (total ~ 1e12 tokens exceeds exact double ulp).
    surp = (
        F.length(F.bin(F.expr(f"CAST({int(total)} AS BIGINT) div cnt"))) - 1
    ).cast("bigint")
    s = (
        x.join(v, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum(surp).cast("bigint").alias("surprisal_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
        )
    )
    mean_e3 = F.floor(
        F.col("surprisal_sum") * 1000 / F.nullif(F.col("n_toks"), F.lit(0))
    ).cast("bigint")
    return (
        t.select("doc_id")
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_toks"), F.lit(0).cast("bigint")).alias("n_toks"),
            F.coalesce(F.col("surprisal_sum"), F.lit(0).cast("bigint")).alias(
                "surprisal_sum"
            ),
            mean_e3.alias("mean_surprisal_e3"),
            F.coalesce(mean_e3 <= SURPRISAL_FLUENT_E3, F.lit(False))
            .cast("int")
            .alias("is_fluent"),
        )
    )


# --- per-source document cap -------------------------------------------

SOURCE_CAP = 30  # max docs kept per source, best-quality-first


@register(
    "docs_source_capped_corpus",
    operators=(
        "LLM-curation-source-cap (per-source document cap, best-quality-"
        "first: rank docs within each source by classifier logit and keep "
        "the top N — the Common-Crawl-style anti-domination gate that "
        "stops one crawl/domain from flooding the mix; complements the "
        "token-budget and bucket-resampling gates)"
    ),
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents
),
f AS (
{_SQL_CLS_FEATURES}
),
l AS (SELECT doc_id, source, {_SQL_CLS_LOGIT} AS logit_e4 FROM f),
r AS (
  SELECT doc_id, source, logit_e4,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY logit_e4 DESC, doc_id) AS quality_rank
  FROM l
)
SELECT doc_id, source, logit_e4, quality_rank,
       CAST(quality_rank <= {SOURCE_CAP} AS INT) AS kept
FROM r
""",
)
def docs_source_capped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-domination cap: within each source, docs rank by quality logit
    (ties to the lower doc_id) and only the top SOURCE_CAP survive — the
    standard guard against one domain or crawl dump swamping the training
    mix no matter how large it is. Emits the rank and verdict per doc so
    the drop cost is observable per source.

    Scale shape: the classifier features are per-row expressions; the cap
    is ONE window shuffled on the source key. At 100 TB a hot source makes
    that window's partition large — the two-stage fix is a per-partition
    pre-rank + global re-rank of the ≤ cap·partitions survivors, same
    rewrite as the skew-safe count-distinct (operators/skew.py); kept as
    the plain window here because |sources| bounds the reducer count.
    """
    scored = _cls_logit_frame(spark, sf_dir).select("doc_id", "source", "logit_e4")
    w = Window.partitionBy("source").orderBy(F.col("logit_e4").desc(), "doc_id")
    return (
        scored.withColumn("quality_rank", F.row_number().over(w))
        .select(
            "doc_id",
            "source",
            "logit_e4",
            "quality_rank",
            (F.col("quality_rank") <= SOURCE_CAP).cast("int").alias("kept"),
        )
    )
