"""Cardinality-sketch operators for LLM training-data pipelines.

At 100 TB "how many distinct tokens / urls / fingerprints does this
source contribute?" is a sketch question, not a COUNT(DISTINCT)
question: an exact distinct over a petabyte token stream shuffles the
full key set, while an HLL-style register sketch shuffles a CONSTANT
m rows per group (the map-side partial max collapses everything else)
and merges across shards with an element-wise max.

The kernel below is a deterministic HyperLogLog (Flajolet et al. 2007):
the usual engine-private hash is replaced with the repo's md5-derived
60-bit hash (``functions/text.md5_long``) and the float harmonic mean is
replaced with an exact dyadic-rational fold (every ``2^-rho`` term is
scaled by ``2^RHO_CLAMP`` into a BIGINT), so BOTH engines compute
bit-identical registers AND a bit-identical estimate — the sketch itself
is under the driver's hash gate, not just its row count.

No reference parity (the reference has no sketch surface); this is the
brief-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.functions.text import md5_long, sql_md5_long, sql_tokens, tokens
from inspig_etl_spark.queries import register

# m = 2^p registers. 64 keeps the unrolled zero-register correction and the
# fixed-point alpha numerator inside BIGINT range; production sizing (2^12+)
# only changes these constants.
HLL_P = 6
HLL_M = 1 << HLL_P  # 64
# md5_long is 60 bits; p go to the bucket, the remaining 54 feed rho.
HLL_REST_BITS = 60 - HLL_P  # 54
# Dyadic scale for the harmonic-mean fold: each register contributes
# 2^(RHO_CLAMP - min(rho, RHO_CLAMP)) — an exact BIGINT. Clamping rho at 20
# biases terms below 2^-20 to 2^-20 (relative estimate error < m * 2^-20,
# i.e. < 0.01%); both engines clamp identically so parity is exact.
RHO_CLAMP = 20
_ONE_SCALED = 1 << RHO_CLAMP  # an all-zero register's term

# alpha_64 = 0.7213 / (1 + 1.079/64) ~ 0.709340, fixed-point 1e-6. The
# estimate is E = alpha * m^2 / sum(2^-rho); with the dyadic scaling that is
# ALPHA_NUM div (s_scaled * 1e6), reported at 1e-3 fixed point — pure
# integer division, bit-identical across engines (DuckDB `//` and Spark
# `div` agree on non-negative operands).
_ALPHA_E6 = 709_340
ALPHA_NUM = _ALPHA_E6 * HLL_M * HLL_M * _ONE_SCALED * 1000  # ~3.05e18 < 2^63

# Small-range (linear counting) correction: when zero registers remain and
# the raw estimate is under 2.5m, the unbiased estimator is m*ln(m/V) with
# V = zero-register count (Flajolet et al. §4). ln() would break cross-
# engine bit parity — but V has only m possible values, so the correction
# ships as a PRECOMPUTED integer table (1e-3 fixed point), indexed by V on
# both engines: exactness by construction, no float at query time.
import math as _math

LC_EST_E3 = [
    int(HLL_M * _math.log(HLL_M / v) * 1000 + 0.5) for v in range(1, HLL_M + 1)
]
LC_RAW_CUTOFF_E3 = int(2.5 * HLL_M) * 1000  # raw_e3 <= this -> sparse regime


def _sql_rho(rest: str) -> str:
    """First-one position (from the MSB of the REST_BITS-wide value) in
    DuckDB: bin() prints the minimal binary form, so its length is the bit
    length; an all-zero rest maps to REST_BITS + 1 per the HLL paper."""
    return (
        f"CASE WHEN {rest} = 0 THEN {HLL_REST_BITS + 1} "
        f"ELSE {HLL_REST_BITS + 1} - length(bin({rest})) END"
    )


def _rho(rest: F.Column) -> F.Column:
    """Spark twin: conv(x, 10, 2) prints the same minimal binary form."""
    return F.when(rest == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
        F.lit(HLL_REST_BITS + 1) - F.length(F.conv(rest.cast("string"), 10, 2))
    )


@register(
    "docs_vocab_hll_by_source",
    operators=(
        "LLM-sketch-hll (per-source distinct-token cardinality via a "
        "deterministic HyperLogLog: md5 bucket/rho registers, exact dyadic "
        "harmonic-mean fold, integer fixed-point estimate — constant m rows "
        "per group cross the shuffle instead of the full key set; brief: "
        "training-data pipeline ops)"
    ),
    oracle=f"""
WITH t AS (
  SELECT COALESCE(source, '') AS source, unnest({sql_tokens('text')}) AS tok
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT source, tok, {sql_md5_long("'hll' || tok")} AS hv FROM t
),
b AS (
  SELECT source, tok, hv % {HLL_M} AS bucket, hv >> {HLL_P} AS rest FROM h
),
r AS (
  SELECT source, bucket, MAX({_sql_rho('rest')}) AS m_rho
  FROM b GROUP BY source, bucket
),
s AS (
  SELECT source,
         COUNT(*) AS regs_used,
         CAST(SUM(CAST(1 AS BIGINT) << ({RHO_CLAMP} - LEAST(m_rho, {RHO_CLAMP})))
              AS BIGINT) AS s_present
  FROM r GROUP BY source
),
e AS (
  SELECT source, regs_used,
         s_present + ({HLL_M} - regs_used) * {_ONE_SCALED} AS s_scaled
  FROM s
),
x AS (
  SELECT source, COUNT(DISTINCT tok) AS exact_distinct FROM b GROUP BY source
),
est AS (
  SELECT source, regs_used, s_scaled,
         CAST({ALPHA_NUM} AS BIGINT) // (s_scaled * 1000000) AS raw_e3
  FROM e
)
SELECT est.source, est.regs_used, est.s_scaled,
       CASE WHEN {HLL_M} - est.regs_used > 0 AND est.raw_e3 <= {LC_RAW_CUTOFF_E3}
            THEN [{", ".join(str(v) for v in LC_EST_E3)}][{HLL_M} - est.regs_used]
            ELSE est.raw_e3 END AS hll_est_e3,
       x.exact_distinct
FROM est JOIN x USING (source)
""",
)
def docs_vocab_hll_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality, sketched.

    Register build: explode tokens (pipelined, no shuffle of its own),
    hash each to (bucket, rho), then ``groupBy(source, bucket).max(rho)``
    — the hash aggregate's map-side partial max means AT MOST m rows per
    (source, partition) reach the exchange, the property that makes HLL
    the 100 TB cardinality tool. Register merge across shards/days is the
    same element-wise max, so the sketch is also incrementally
    maintainable (store r, union new data's r, re-max).

    Estimate: exact dyadic harmonic mean — sum of ``2^(20 - min(rho,20))``
    BIGINTs — then one integer division by the fixed-point alpha
    numerator; no float enters, so the driver hash-gates the ESTIMATE, not
    only the registers. ``exact_distinct`` rides along as the accuracy
    witness (at m=64 the expected relative error is ~13%); a deployment
    drops that column and the exact-distinct shuffle with it.

    Small-range correction: the classic linear-counting switch (zero
    registers present AND raw estimate under 2.5m) is applied through the
    precomputed integer table ``LC_EST_E3`` — ln() never runs at query
    time, so the corrected estimate stays bit-identical across engines
    (the invariant test pins it within the sketch's error band of the
    exact count on every source).
    """
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    ex = docs.select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    hv = md5_long(F.concat(F.lit("hll"), F.col("tok")))
    b = ex.select(
        "source",
        "tok",
        (hv % HLL_M).alias("bucket"),
        F.shiftright(hv, HLL_P).alias("rest"),
    )
    r = b.groupBy("source", "bucket").agg(F.max(_rho(F.col("rest"))).alias("m_rho"))
    s = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("regs_used"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {RHO_CLAMP} - least(m_rho, {RHO_CLAMP}))"
            )
        )
        .cast("bigint")
        .alias("s_present"),
    )
    e = s.select(
        "source",
        "regs_used",
        (
            F.col("s_present")
            + (F.lit(HLL_M) - F.col("regs_used")) * F.lit(_ONE_SCALED)
        ).alias("s_scaled"),
    )
    x = b.groupBy("source").agg(F.countDistinct("tok").alias("exact_distinct"))
    raw = F.expr(
        f"CAST({ALPHA_NUM} AS BIGINT) div (s_scaled * CAST(1000000 AS BIGINT))"
    )
    zero_regs = (F.lit(HLL_M) - F.col("regs_used")).cast("int")
    lc = F.element_at(
        F.array(*[F.lit(v).cast("bigint") for v in LC_EST_E3]), zero_regs
    )
    return (
        e.join(x, "source")
        .withColumn("raw_e3", raw)
        .select(
            "source",
            "regs_used",
            "s_scaled",
            F.when(
                (zero_regs > 0) & (F.col("raw_e3") <= LC_RAW_CUTOFF_E3), lc
            )
            .otherwise(F.col("raw_e3"))
            .alias("hll_est_e3"),
            "exact_distinct",
        )
    )


# --- Count-Min frequency sketch -------------------------------------------
#
# The frequency-side companion to the HLL above (Cormode & Muthukrishnan
# 2005): d independent hash rows of w counters; a token's estimate is the
# MIN of its d bucket sums. One-sided error (estimate >= truth, never
# under), mergeable across shards by element-wise sum — the sketch a
# pipeline keeps per shard/day to answer "how often does this token /
# url / fingerprint appear" without a corpus-wide groupBy per question.
CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row
CMS_TOP = 20  # witness set: the exact top-k tokens ride along


def _cms_bucket(row: int, tok: F.Column) -> F.Column:
    return md5_long(F.concat(F.lit(f"cms{row}"), tok)) % CMS_W


def _sql_cms_bucket(row: int, tok: str) -> str:
    expr = f"'cms{row}' || {tok}"
    return f"({sql_md5_long(expr)} % {CMS_W})"


def _sql_cms_coords(tok: str) -> str:
    """[(row, bucket)] coord list for a token — as a flat struct list."""
    return (
        "["
        + ", ".join(
            f"{{'r': {r}, 'b': {_sql_cms_bucket(r, tok)}}}" for r in range(CMS_D)
        )
        + "]"
    )


@register(
    "docs_token_cms_topk",
    operators=(
        "LLM-sketch-countmin (deterministic Count-Min frequency sketch: d "
        "md5 hash rows x w counters, mergeable by element-wise sum; the "
        "exact top-k tokens ride along as the one-sided-error witness — "
        "estimate >= truth always; brief: training-data pipeline ops)"
    ),
    oracle=f"""
WITH t AS (
  SELECT unnest({sql_tokens('text')}) AS tok
  FROM documents WHERE text IS NOT NULL
),
ct AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM t GROUP BY tok
),
sk AS (
  SELECT c.r AS r, c.b AS b, CAST(SUM(exact_cnt) AS BIGINT) AS bucket_sum
  FROM (SELECT tok, exact_cnt, unnest({_sql_cms_coords('tok')}) AS c FROM ct)
  GROUP BY c.r, c.b
),
top AS (
  SELECT tok, exact_cnt FROM ct ORDER BY exact_cnt DESC, tok LIMIT {CMS_TOP}
),
est AS (
  SELECT q.tok, q.exact_cnt, MIN(sk.bucket_sum) AS cms_est_cnt
  FROM (SELECT tok, exact_cnt, unnest({_sql_cms_coords('tok')}) AS c FROM top) q
  JOIN sk ON q.c.r = sk.r AND q.c.b = sk.b
  GROUP BY q.tok, q.exact_cnt
)
SELECT tok, exact_cnt, cms_est_cnt FROM est
""",
)
def docs_token_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies through a Count-Min sketch, with the exact
    top-k as witness.

    Build: exact per-token counts feed the sketch (equivalent to hashing
    the raw stream — addition is associative — but shuffles one row per
    DISTINCT token instead of per occurrence), then each token adds its
    count to one counter per hash row; the sketch is d*w = 4x1024
    cells TOTAL, regardless of corpus size, and two shards' sketches merge
    by element-wise sum. Query: a token's estimate is the MIN of its d
    counters — >= the true count by construction (collisions only ever
    add), which the invariant test pins. The exact top-k (``CMS_TOP``) tokens
    ride along so the driver hash-gates estimate AND truth side by side.

    Scale shape: one partial-aggregated groupBy(tok), one constant-size
    (d*w) aggregation, and a ``CMS_TOP``-row TakeOrdered probe joined back
    against the constant-size sketch — nothing here grows with the corpus
    except the first count pass.
    """
    docs = spread(table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    ct = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
    )

    def coords(tok_col):
        return F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"), _cms_bucket(r, tok_col).alias("b")
                )
                for r in range(CMS_D)
            ]
        )

    sk = (
        ct.select("exact_cnt", F.explode(coords(F.col("tok"))).alias("c"))
        .groupBy(F.col("c.r").alias("r"), F.col("c.b").alias("b"))
        .agg(F.sum("exact_cnt").cast("bigint").alias("bucket_sum"))
    )
    top = ct.orderBy(F.col("exact_cnt").desc(), "tok").limit(CMS_TOP)
    q = top.select(
        "tok", "exact_cnt", F.explode(coords(F.col("tok"))).alias("c")
    ).select("tok", "exact_cnt", F.col("c.r").alias("r"), F.col("c.b").alias("b"))
    return (
        q.join(sk, ["r", "b"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("bucket_sum").alias("cms_est_cnt"))
        .select("tok", "exact_cnt", "cms_est_cnt")
    )
