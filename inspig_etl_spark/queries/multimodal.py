"""Multimodal queries: blob metadata, the Pandas-UDF decode pipeline, and
video frame sampling.

All are fully oracle-checked: the synthetic blob is a pure function of
(doc_id, text), so the decode outputs — dims from the id, byte sums over the
UTF-8 payload — are DuckDB-expressible by re-deriving the payload bytes from
``hex(encode(repeat(COALESCE(text, ''), 4)))`` and folding hex digits. Byte means use the
micro-floor contract (``sum*1e6 // n / 1e6``, see operators/multimodal.py)
so floats are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import spread, table
from inspig_etl_spark.operators.multimodal import decode_media, synthetic_media
from inspig_etl_spark.queries import register


@register(
    "multimodal_blob_meta",
    operators="LLM-multimodal (binary column + typed metadata; brief: 'opaque binary columns with typed metadata')",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(doc_id % 16 + 4 AS INT) * CAST(doc_id % 12 + 4 AS INT)
         * CAST(doc_id % 3 + 1 AS INT) + 8 AS expected_bytes,
       sha256(text) AS text_payload_sha
FROM documents
""",
)
def multimodal_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata contract of the media table, derivable in pure SQL:
    expected blob size from the typed metadata + a payload-source hash."""
    docs = spread(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (
            (F.col("doc_id") % 16 + 4).cast("int")
            * (F.col("doc_id") % 12 + 4).cast("int")
            * (F.col("doc_id") % 3 + 1).cast("int")
            + 8
        ).alias("expected_bytes"),
        F.sha2(F.col("text"), 256).alias("text_payload_sha"),
    )


@register(
    "multimodal_decode_features",
    operators="LLM-multimodal (mapInPandas Arrow-batched decode/feature stub; brief: 'decode / feature-extract ... as Pandas UDFs over mapInPandas')",
    # Partial oracle: every selected decode output is a pure function of
    # (doc_id, text). The payload byte sum is re-derived by folding the hex
    # digits of the UTF-8 payload (weight 16 for high nibbles); the mean uses
    # the micro-floor contract so the double is bit-identical.
    oracle="""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(doc_id % 16 + 4 AS INT) AS width,
         CAST(doc_id % 12 + 4 AS INT) AS height,
         CAST(doc_id % 3 + 1 AS INT) AS channels,
         encode(repeat(COALESCE(text, ''), 4)) AS pay
  FROM documents
), p AS (
  SELECT doc_id, media_type, width, height, channels,
         LEAST(width * height * channels, octet_length(pay)) AS n_bytes,
         substr(hex(pay), 1, 2 * LEAST(width * height * channels, octet_length(pay))) AS hx
  FROM m
), s AS (
  SELECT *,
         CASE WHEN n_bytes > 0 THEN CAST(list_sum(list_transform(range(1, 2 * n_bytes + 1),
              i -> (strpos('0123456789ABCDEF', hx[i]) - 1)
                   * (CASE WHEN i % 2 = 1 THEN 16 ELSE 1 END))) AS BIGINT)
              ELSE 0 END AS byte_sum
  FROM p
)
SELECT doc_id AS id, media_type, width, height, channels,
       CAST(n_bytes AS INT) AS n_bytes,
       CASE WHEN n_bytes > 0
            THEN CAST((byte_sum * 1000000) // n_bytes AS DOUBLE) / 1000000.0
            ELSE 0.0 END AS mean_byte
FROM s
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    media = synthetic_media(docs)
    decoded = decode_media(media)
    return decoded.select(
        "id", "media_type", "width", "height", "channels", "n_bytes", "mean_byte"
    )


@register(
    "multimodal_resize_decode",
    operators="LLM-multimodal (nearest-neighbor resize as an Arrow-batched pre-processing stage, round-tripped through the decoder; brief: 'decode / feature-extract / resize / frame-sample')",
    # Partial oracle: nearest-neighbor is a pure index gather, so each output
    # byte o of the (6, 8, c) grid maps to source index
    # ((y_src*w + x_src)*c + ch) with y_src = (yi*h)//6, x_src = (xi*w)//8 —
    # bytes past the present payload read the decoder's zero padding.
    oracle="""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(doc_id % 16 + 4 AS INT) AS w,
         CAST(doc_id % 12 + 4 AS INT) AS h,
         CAST(doc_id % 3 + 1 AS INT) AS c,
         encode(repeat(COALESCE(text, ''), 4)) AS pay
  FROM documents
), p AS (
  SELECT doc_id, media_type, w, h, c,
         LEAST(w * h * c, octet_length(pay)) AS src_bytes,
         hex(pay) AS hx
  FROM m
), s AS (
  SELECT *,
         CAST(list_sum(list_transform(
           list_transform(range(0, 48 * c),
             o -> (((o // (8 * c)) * h) // 6 * w
                   + (((o % (8 * c)) // c) * w) // 8) * c
                  + (o % (8 * c)) % c),
           i -> CASE WHEN i < src_bytes
                     THEN (strpos('0123456789ABCDEF', hx[2 * i + 1]) - 1) * 16
                          + (strpos('0123456789ABCDEF', hx[2 * i + 2]) - 1)
                     ELSE 0 END)) AS BIGINT) AS byte_sum
  FROM p
)
SELECT doc_id AS id, media_type,
       CAST(8 AS INT) AS width, CAST(6 AS INT) AS height, c AS channels,
       CAST(48 * c AS INT) AS n_bytes,
       CAST((byte_sum * 1000000) // (48 * c) AS DOUBLE) / 1000000.0 AS mean_byte
FROM s
""",
)
def multimodal_resize_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-then-featurize: the standard media pre-processing chain.
    Every output row must report the target (8, 6) grid regardless of the
    source dimensions, proving the resized blobs re-enter the decode path
    unchanged."""
    from inspig_etl_spark.operators.multimodal import resize_media

    docs = spread(table(spark, sf_dir, "documents"))
    media = synthetic_media(docs)
    resized = resize_media(media, out_w=8, out_h=6)
    return decode_media(resized).select(
        "id", "media_type", "width", "height", "channels", "n_bytes", "mean_byte"
    )


@register(
    "multimodal_frame_sample",
    operators="LLM-multimodal (video frame sampling: payload split into n equal frames, partition-preserving posexplode; brief: 'decode / feature-extract / resize / frame-sample')",
    # The frame bytes are slices of the UTF-8 payload, so each frame's size
    # and content hash are DuckDB-derivable by slicing the hex encoding
    # (both engines hash the UPPERCASE hex string — blob slicing is not
    # portable, the hex roundtrip is).
    oracle="""
WITH m AS (
  SELECT doc_id,
         CAST(doc_id % 16 + 4 AS INT) AS w,
         CAST(doc_id % 12 + 4 AS INT) AS h,
         CAST(doc_id % 3 + 1 AS INT) AS c,
         encode(repeat(COALESCE(text, ''), 4)) AS pay
  FROM documents WHERE doc_id % 3 = 2
), p AS (
  SELECT doc_id,
         LEAST(w * h * c, octet_length(pay)) AS plen,
         substr(hex(pay), 1, 2 * LEAST(w * h * c, octet_length(pay))) AS hx
  FROM m
), f AS (
  SELECT doc_id, plen, hx, GREATEST(plen // 4, 1) AS flen,
         unnest([0, 1, 2, 3]) AS frame_no
  FROM p
)
SELECT doc_id AS id, frame_no,
       CAST(length(substr(hx, frame_no * flen * 2 + 1, flen * 2)) // 2 AS INT)
         AS frame_size,
       sha256(substr(hx, frame_no * flen * 2 + 1, flen * 2)) AS frame_sha
FROM f
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video blobs: the payload splits into 4 equal
    frames per row via posexplode — per-row generation, no join, no extra
    shuffle. Frames are reported as (size, content hash); hashing goes
    through the hex string so the oracle can reproduce it without blob
    slicing."""
    from inspig_etl_spark.operators.multimodal import frame_sample

    docs = spread(table(spark, sf_dir, "documents"))
    frames = frame_sample(synthetic_media(docs), n_frames=4)
    return frames.select(
        "id",
        "frame_no",
        F.col("frame_size").cast("int").alias("frame_size"),
        F.sha2(F.hex(F.col("frame_bytes")), 256).alias("frame_sha"),
    )


# --- perceptual-hash near-dup ------------------------------------------

PHASH_HAMMING_MAX = 6
PHASH_TWIN_OFFSET = 100_000_000_000


def _twin_id(id_col: F.Column, offset: int) -> F.Column:
    """Planted-twin id (base + offset) with a loud collision guard.

    A twin id aliases a REAL doc id once any base id reaches the offset —
    duplicate ids with different payloads would corrupt the banding/verify
    joins identically on both engines, silently invalidating the witness
    (ADVICE r12). The guard rides the id expression itself (one per-row
    comparison, no extra action), so an offset overrun throws instead of
    lying. Offsets sit at 1e11 (image) / 2e11 (video) / 3e11 (audio):
    r14 raised them from 1e6-3e6 after the guard correctly refused the
    10x replica's shifted ids (max ~9e7) — the witness harness must not
    cap the corpus size before int64 does (id + 3e11 stays far inside
    int64 for any realistic id space).
    """
    return F.when(id_col < offset, id_col + F.lit(offset)).otherwise(
        F.raise_error(
            F.format_string(
                f"planted-twin id collision: base id %s >= offset {offset}",
                id_col.cast("string"),
            )
        )
    )

# Shared source-position expression for the oracle: 8x9 grid cell i (0..71,
# row-major yi*9+xi), channel ch -> payload byte offset of the nearest-
# neighbor sample, exactly the decoder/resize gather.
_PHX_POS = "((((i // 9) * h) // 8) * w + (((i % 9) * w) // 9)) * c + ch"
_PHX_BYTE = (
    f"(strpos('0123456789ABCDEF', hx[2 * ({_PHX_POS}) + 1]) - 1) * 16"
    f" + (strpos('0123456789ABCDEF', hx[2 * ({_PHX_POS}) + 2]) - 1)"
)
_PHX_BYTE0 = (
    "(strpos('0123456789ABCDEF', hx[1]) - 1) * 16"
    " + (strpos('0123456789ABCDEF', hx[2]) - 1)"
)


# The dHash detection chain as a reusable CTE block (twin-planted image
# universe -> resampled gray grid -> 64-bit dHash halves -> byte bands ->
# candidate pairs) — shared by the phash pair query's oracle and the
# cross-modal paired-near-dup oracle, so both engines derive image edges
# from ONE definition.
_PHASH_CTES = f"""m AS (
  SELECT doc_id,
         CAST(doc_id % 16 + 4 AS INT) AS w,
         CAST(doc_id % 12 + 4 AS INT) AS h,
         CAST(doc_id % 3 + 1 AS INT) AS c,
         encode(repeat(COALESCE(text, ''), 4)) AS pay
  FROM documents WHERE doc_id % 3 = 0
),
p AS (
  SELECT doc_id, w, h, c,
         LEAST(w * h * c, octet_length(pay)) AS nb,
         hex(pay) AS hx
  FROM m
),
v AS (
  SELECT doc_id + twin * {PHASH_TWIN_OFFSET} AS id, w, h, c, nb, hx, twin
  FROM p, (SELECT unnest([0, 1]) AS twin)
),
gr AS (
  SELECT id,
         list_transform(range(0, 72), i ->
           list_sum(list_transform(range(0, c), ch ->
             CASE WHEN {_PHX_POS} < nb
                  THEN CASE WHEN twin = 1 AND {_PHX_POS} = 0
                            THEN ({_PHX_BYTE0} + 1) % 256
                            ELSE {_PHX_BYTE} END
                  ELSE 0 END)) // c) AS gray
  FROM v
),
hsh AS (
  -- dHash bit i (0..63, yi = i//8, xi = i%8): cell (yi,xi) > cell (yi,xi+1)
  SELECT id,
         CAST(list_sum(list_transform(range(0, 32), i ->
           CASE WHEN gray[(i // 8) * 9 + (i % 8) + 1]
                     > gray[(i // 8) * 9 + (i % 8) + 2]
                THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS lo,
         CAST(list_sum(list_transform(range(32, 64), i ->
           CASE WHEN gray[(i // 8) * 9 + (i % 8) + 1]
                     > gray[(i // 8) * 9 + (i % 8) + 2]
                THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)) AS BIGINT) AS hi
  FROM gr
),
band AS (
  SELECT id, band_no,
         CASE WHEN band_no < 4 THEN (lo >> (8 * band_no)) & 255
              ELSE (hi >> (8 * (band_no - 4))) & 255 END AS band_key
  FROM hsh, (SELECT unnest(generate_series(0, 7)) AS band_no)
),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM band l JOIN band r
    ON l.band_no = r.band_no AND l.band_key = r.band_key AND l.id < r.id
)"""


@register(
    "multimodal_phash_neardup_pairs",
    operators=(
        "LLM-multimodal-phash (image near-dup: perceptual difference-hash "
        "over the 8x9 resampled grayscale grid via the Arrow-batched codec "
        "kernel, Hamming byte-banded candidate join — the SimHash banding "
        "kernel applied to the image modality; planted one-byte-perturbed "
        "twins are the guaranteed-positive witness)"
    ),
    oracle=f"""
WITH {_PHASH_CTES}
SELECT id_a, id_b,
       CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT)
         AS hamming
FROM cand JOIN hsh a ON cand.id_a = a.id JOIN hsh b ON cand.id_b = b.id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
      <= {PHASH_HAMMING_MAX}
""",
)
def multimodal_phash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-modality near-dup: dHash (gradient perceptual hash — 8x9
    nearest-neighbor grayscale grid, bit i = cell (i//8, i%8) strictly
    brighter than its right neighbor, exact integers) computed by the
    Arrow-batched ``dhash_media`` kernel, then the SimHash-style
    Hamming-banded candidate join: 8 byte bands over the 64-bit hash, so
    any pair within Hamming distance < 8 shares >= 1 band by pigeonhole,
    and candidates only ever form inside a band bucket — never all-pairs
    over the image corpus. dHash was chosen over aHash after the 10×
    scale probe measured aHash's global-mean coupling putting 17% of
    images into ONE band bucket (quadratic banding in disguise); dHash's
    purely-local gradient bits spread bands near-uniformly (top bucket
    3%). See ``dhash_media``'s docstring for the measurement.

    Because the synthetic corpus has no two images with equal dims AND
    equal text, a deterministic witness set is planted: every image gets a
    twin (id + ``PHASH_TWIN_OFFSET``) whose FIRST payload byte is +1 — a
    one-sampled-pixel perturbation. Nearly every (image, twin) pair
    surfaces at small Hamming distance, but not all: the +1 raises one
    sampled gray cell, and when that cell sits boundary-equal to its
    horizontal neighbors (gray[c] == gray[c+1]) the strict `>` gradient
    comparison flips on BOTH adjacent bits, so a single-byte perturbation
    can flip >HMAX bits on images with many boundary-equal adjacent
    cells; recall is pinned >=95% in tests. The witness proves banding
    recall and the verify arithmetic end-to-end (both engines derive the
    twins from the same expression).

    Scale shape: hash is per-row Arrow work (no shuffle), banding shuffles
    O(8 x |images|) keys, verification joins hash halves per candidate —
    the detector inherits docs_simhash_neardup_pairs' 100 TB properties
    with the decode stage in front.
    """
    from inspig_etl_spark.operators.dedup import lsh_candidate_pairs
    from inspig_etl_spark.operators.multimodal import _byte, dhash_media

    docs = spread(table(spark, sf_dir, "documents"))
    media = synthetic_media(docs).filter(F.col("media_type") == "image")
    b0 = F.conv(F.hex(F.substring(F.col("blob"), 9, 1)), 16, 10).cast("int")
    perturbed = F.concat(
        F.substring(F.col("blob"), 1, 8),
        _byte((b0 + 1) % 256),
        F.expr("substring(blob, 10, 2147483647)"),
    )
    twin = media.select(
        _twin_id(F.col("id"), PHASH_TWIN_OFFSET).alias("id"),
        "media_type",
        F.when(F.length("blob") > 8, perturbed).otherwise(F.col("blob")).alias("blob"),
        "meta",
    )
    # persist(): the hash feeds the banding explode AND both verify sides.
    # Bounded frame — (id, two int64 hash words) per image. Left cached for
    # the query's lifetime by design: multi-query sessions (bench.py
    # run_once, the driver harness) clearCache() after each action, which
    # is the unpersist point for lazily-returned query frames (ADVICE r10).
    hashed = dhash_media(media.unionByName(twin)).persist()
    bands = F.array(
        *(
            [
                F.shiftright(F.col("phash_lo"), 8 * j)
                .bitwiseAND(F.lit(255))
                .cast("string")
                for j in range(4)
            ]
            + [
                F.shiftright(F.col("phash_hi"), 8 * j)
                .bitwiseAND(F.lit(255))
                .cast("string")
                for j in range(4)
            ]
        )
    )
    banded = hashed.withColumn("band_keys", bands)
    cand = lsh_candidate_pairs(banded, "id", "band_keys", 8)
    a = hashed.select(
        F.col("id").alias("id_a"),
        F.col("phash_hi").alias("a_hi"),
        F.col("phash_lo").alias("a_lo"),
    )
    b = hashed.select(
        F.col("id").alias("id_b"),
        F.col("phash_hi").alias("b_hi"),
        F.col("phash_lo").alias("b_lo"),
    )
    ham = (
        F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
        + F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
    ).cast("bigint")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .select("id_a", "id_b", "hamming")
    )


# --- cross-modal paired near-dup ----------------------------------------
#
# The corpus's (image, caption) pairs, deduplicated ACROSS modalities: two
# pairs are duplicates when their images match (dHash Hamming gate, byte-
# banded) OR their captions match (MinHash band + exact-Jaccard verify) —
# the policy a multimodal training-data pipeline needs, because re-hosted
# images keep their pixels but lose their captions, and re-captioned posts
# keep their text but recompress the image. The OR-edges feed ONE
# pair-level transitive closure (the CC kernel), so a chain
# A ~image~ A' , A ~text~ B collapses all three into one cluster.
#
# The text-side SQL fragments come from operators/dedup.py (the same
# definitions queries/llm_dedup.py interpolates), NOT from llm_dedup
# itself — importing a registering query module at module level would
# re-order the registry's registration sequence.

from inspig_etl_spark.functions.text import (
    sql_token_hashes,
    sql_token_ngram_hashes_from,
    sql_tokens,
)
from inspig_etl_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_ROWS,
    SHINGLE_N,
    SQL_JACCARD,
    sql_lsh_band_key,
    sql_minhash_sig,
)


@register(
    "multimodal_paired_neardup",
    operators=(
        "LLM-multimodal-paired-neardup (cross-modal (image, caption) pair "
        "dedup: dHash byte-banded image edges OR MinHash-banded + Jaccard-"
        "verified caption edges -> pair-level transitive clusters + min-id "
        "survivor — composes dhash_media, the MinHash band kernel and the "
        "CC operator, bucketed end-to-end; the planted image twins carry "
        "NO caption, so their cluster membership can only arrive through "
        "the image modality — the OR-composition's witness)"
    ),
    oracle=f"""
WITH RECURSIVE {_PHASH_CTES},
ipairs AS (
  SELECT id_a, id_b
  FROM cand JOIN hsh a ON cand.id_a = a.id JOIN hsh b ON cand.id_b = b.id
  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
        <= {PHASH_HAMMING_MAX}
),
tth AS (
  SELECT doc_id, {sql_token_hashes(sql_tokens('text'))} AS hs
  FROM documents WHERE doc_id % 3 = 0
),
tt AS (SELECT doc_id, {sql_token_ngram_hashes_from('hs', SHINGLE_N)} AS sh FROM tth),
-- zero-shingle captions are excluded from banding (the sentinel-signature
-- degeneracy — see docs_neardup_clusters), mirrored in the Spark plan
tsig AS (SELECT doc_id, sh, {sql_minhash_sig()} AS sig FROM tt WHERE len(sh) > 0),
tband AS (
  SELECT doc_id, band_no, {sql_lsh_band_key()} AS band_key
  FROM tsig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band_no)
),
tcand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM tband l JOIN tband r
    ON l.band_no = r.band_no AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
),
tpairs AS (
  SELECT id_a, id_b
  FROM tcand JOIN tt a ON tcand.id_a = a.doc_id
             JOIN tt b ON tcand.id_b = b.doc_id
  WHERE {SQL_JACCARD} >= {JACCARD_THRESHOLD}
),
allp AS (
  SELECT id_a, id_b FROM ipairs UNION SELECT id_a, id_b FROM tpairs
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM allp
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM allp
),
reach(id, label) AS (
  SELECT id, id FROM v
  UNION
  SELECT e.dst AS id, r.label FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS pair_id, MIN(label) AS cluster_id,
       CAST(MIN(label) = id AS INT) AS is_canonical
FROM reach GROUP BY id
""",
)
def multimodal_paired_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level cross-modal dedup over the (image, caption) corpus.

    Edges come from BOTH modality detectors, each in its bucketed form:

    - **image**: the ``multimodal_phash_neardup_pairs`` chain verbatim
      (dHash via the Arrow-batched codec kernel, 8 Hamming byte bands,
      exact bit-count verify) — including its planted one-byte twins,
      which carry no caption row and therefore prove the image-OR path;
    - **caption**: the MinHash(16) 4x4 band kernel + exact Jaccard verify
      from the text dedup stack (``operators/dedup.py``), restricted to
      the image-doc universe (a 100 TB run shingles only the captions it
      needs, so the restriction happens BEFORE hashing).

    The union feeds :func:`operators.dedup.connected_components` over the
    pair universe (image docs + twins); the survivor is the cluster's
    min-id pair (``is_canonical``), same canonicalization contract as
    ``docs_neardup_clusters``.

    Scale shape: both edge generators are band-bucketed (never all-pairs),
    the CC loop's state is bounded by the dup graph, and the final output
    is one row per pair — O(|pairs|) end to end.
    """
    from inspig_etl_spark.functions.text import (
        token_hashes,
        token_ngram_hashes_from,
        tokens,
    )
    from inspig_etl_spark.operators.dedup import (
        connected_components,
        jaccard_verify,
        lsh_band_keys,
        minhash_signature,
    )

    ipairs = multimodal_phash_neardup_pairs(spark, sf_dir).select("id_a", "id_b")

    docs_img = spread(table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 3 == 0
    )
    hs = docs_img.select("doc_id", token_hashes(tokens(F.col("text"))).alias("hs"))
    # persist(): the caption shingles feed the banding self-join AND both
    # Jaccard-verify sides (the _shingled pattern); bounded to image docs.
    # Multi-query sessions clearCache() after the action (repo policy).
    sh = hs.select(
        "doc_id", token_ngram_hashes_from(F.col("hs"), SHINGLE_N).alias("sh")
    ).persist()
    signed = sh.filter(F.size("sh") > 0).withColumn(
        "sig", minhash_signature(F.col("sh"))
    )
    keyed = signed.select(
        "doc_id",
        F.posexplode(lsh_band_keys(F.col("sig"), MINHASH_BANDS, MINHASH_ROWS)).alias(
            "band_no", "band_key"
        ),
    )
    left = keyed.select(F.col("doc_id").alias("id_a"), "band_no", "band_key")
    right = keyed.select(F.col("doc_id").alias("id_b"), "band_no", "band_key")
    tcand = (
        left.join(right, ["band_no", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    tpairs = jaccard_verify(tcand, sh, "doc_id", "sh", JACCARD_THRESHOLD).select(
        "id_a", "id_b"
    )

    edges = ipairs.unionByName(tpairs)
    ids = docs_img.select(F.col("doc_id").alias("pair_id"))
    nodes = ids.unionByName(
        ids.select(_twin_id(F.col("pair_id"), PHASH_TWIN_OFFSET).alias("pair_id"))
    )
    cc = connected_components(edges, nodes, "pair_id")
    return cc.withColumn(
        "is_canonical", (F.col("cluster_id") == F.col("pair_id")).cast("int")
    )


# --- video frame-level near-dup ----------------------------------------

VFRAME_TWIN_OFFSET = 200_000_000_000  # video twins (image twins use 1e11)
VF_CELLS = 65  # 1-D resample cells per frame -> 64 gradient bits
VF_MATCH_MIN = 2  # frames (of 4) that must match for a video pair

_VF_HEXD = "0123456789ABCDEF"


def _vf_sql_byte(pos: str) -> str:
    """Byte value at 0-based position ``pos`` of the frame hex string fx."""
    return (
        f"(strpos('{_VF_HEXD}', fx[2 * ({pos}) + 1]) - 1) * 16"
        f" + (strpos('{_VF_HEXD}', fx[2 * ({pos}) + 2]) - 1)"
    )


# Per-frame 1-D dHash: 65 nearest-neighbor sample cells over the frame
# bytes, bit j = cell j strictly greater than cell j+1 — the gradient-bit
# recipe of dhash_media applied along the byte stream (a real sampler
# would hash each decoded frame; the 1-D form is its deterministic stand-in
# with the same banding/verify contract).
_VF_CELL = f"""CASE WHEN afl = 0 THEN 0
  WHEN twin = 1 AND frame_no = 0 AND (j * afl) // {VF_CELLS} = 0
  THEN ({_vf_sql_byte(f'(j * afl) // {VF_CELLS}')} + 1) % 256
  ELSE {_vf_sql_byte(f'(j * afl) // {VF_CELLS}')} END"""

_VF_CTES = f"""m AS (
  SELECT doc_id,
         CAST(doc_id % 16 + 4 AS INT) AS w,
         CAST(doc_id % 12 + 4 AS INT) AS h,
         CAST(doc_id % 3 + 1 AS INT) AS c,
         encode(repeat(COALESCE(text, ''), 4)) AS pay
  FROM documents WHERE doc_id % 3 = 2
),
p AS (
  SELECT doc_id,
         LEAST(w * h * c, octet_length(pay)) AS plen,
         substr(hex(pay), 1, 2 * LEAST(w * h * c, octet_length(pay))) AS hx
  FROM m
),
v AS (
  SELECT doc_id + twin * {VFRAME_TWIN_OFFSET} AS id, plen, hx, twin
  FROM p, (SELECT unnest([0, 1]) AS twin)
),
fr AS (
  SELECT id, twin, frame_no,
         substr(hx, frame_no * GREATEST(plen // 4, 1) * 2 + 1,
                GREATEST(plen // 4, 1) * 2) AS fx,
         length(substr(hx, frame_no * GREATEST(plen // 4, 1) * 2 + 1,
                       GREATEST(plen // 4, 1) * 2)) // 2 AS afl
  FROM v, (SELECT unnest([0, 1, 2, 3]) AS frame_no)
),
cells AS (
  SELECT id, frame_no,
         list_transform(range(0, {VF_CELLS}), j -> {_VF_CELL}) AS cl
  FROM fr
),
hsh AS (
  SELECT id, frame_no,
         CAST(list_sum(list_transform(range(0, 32), j ->
           CASE WHEN cl[j + 1] > cl[j + 2]
                THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS lo,
         CAST(list_sum(list_transform(range(32, 64), j ->
           CASE WHEN cl[j + 1] > cl[j + 2]
                THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END)) AS BIGINT) AS hi
  FROM cells
),
ver AS (
  SELECT a.id AS id_a, b.id AS id_b, a.frame_no
  FROM hsh a JOIN hsh b
    ON a.frame_no = b.frame_no AND a.lo = b.lo AND a.hi = b.hi
   AND a.id < b.id
  WHERE NOT (a.lo = 0 AND a.hi = 0)
)"""


@register(
    "multimodal_video_frame_neardup",
    operators=(
        "LLM-multimodal-video-neardup (keyframe-signature video dedup: per "
        "sampled frame a 1-D 64-bit gradient signature (expression-only, "
        "no codec), EXACT signature equi-join per frame position, video "
        "pair when >= 2 of 4 positions match — robustness comes from "
        "multiple frames, not per-frame Hamming slack; planted one-byte-"
        "perturbed twins are the guaranteed witness)"
    ),
    oracle=f"""
WITH {_VF_CTES}
SELECT id_a, id_b,
       CAST(COUNT(*) AS BIGINT) AS n_frames_matched
FROM ver
GROUP BY id_a, id_b
HAVING COUNT(*) >= {VF_MATCH_MIN}
""",
)
def multimodal_video_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-modality near-dup by keyframe-signature matching: two videos
    are near-duplicates when >= VF_MATCH_MIN of their 4 sampled frame
    positions carry the SAME 64-bit signature — a copied or trivially-
    edited video matches on the untouched frames while different footage
    does not. Frames come from the real
    ``operators.multimodal.frame_sample`` operator (the payload-slicing
    contract already oracled by multimodal_frame_sample); each frame gets
    a 1-D dHash — 65 (``VF_CELLS``) nearest-neighbor byte samples, bit j = cell j
    strictly brighter than cell j+1 — as pure integer expressions over the
    frame's hex encoding (the dhash_media gradient recipe minus the 2-D
    grid, which raw frame slices don't have; a production build swaps in
    per-frame decoded dHash behind the same signature columns). Planted
    twins (first payload byte +1 mod 256, id + ``VFRAME_TWIN_OFFSET``)
    guarantee a positive: the perturbation touches only frame 0, so twins
    match exactly on frames 1-3.

    Why EXACT match and not per-frame Hamming banding: the tolerance knob
    here is the 2-of-4 frame-position vote (the production shape of
    keyframe fingerprinting — robustness from many frames, not from bit
    slack). The first build of this kernel used the image detector's
    8-bit Hamming byte bands per frame and MEASURED them degenerate on
    short text-byte frames: 1.85M candidate pairs at sf0.1 ->> 181M at the
    10x replica (98x, max bucket 1034 of a 2048-bucket space) — an 8-bit
    key has too little entropy when frames shorter than the 65 sample cells
    force fixed zero bits (SCALE.md r12 note). The exact-signature
    equi-join keys on all 64 bits, so buckets are true signature groups.

    Scale shape: signatures are per-row expressions on the frame scan; the
    candidate join is ONE equi-join on (frame_no, lo, hi) — bucket sizes
    are genuine duplicate-group sizes, never hash-band collisions; all-
    zero signatures (empty payloads — no evidence) are excluded from
    candidacy; the final pair aggregation is bounded by true matches.
    """
    from inspig_etl_spark.operators.multimodal import frame_sample, synthetic_media

    docs = spread(table(spark, sf_dir, "documents"))
    media = synthetic_media(docs).filter(F.col("media_type") == "video").select(
        "id", "media_type", "blob"
    )
    b0 = F.conv(F.substring(F.hex(F.col("blob")), 17, 2), 16, 10).cast("int")
    perturbed = F.concat(
        F.expr("substring(blob, 1, 8)"),
        F.unhex(
            F.lpad(F.conv(((b0 + 1) % 256).cast("string"), 10, 16), 2, "0")
        ),
        F.expr("substring(blob, 10)"),
    )
    twins = media.select(
        _twin_id(F.col("id"), VFRAME_TWIN_OFFSET).alias("id"),
        F.col("media_type"),
        F.when(F.expr("octet_length(blob)") <= 8, F.col("blob"))
        .otherwise(perturbed)
        .alias("blob"),
    )
    frames = frame_sample(media.unionByName(twins), n_frames=4).select(
        "id",
        "frame_no",
        F.hex("frame_bytes").alias("fx"),
        F.col("frame_size").cast("bigint").alias("afl"),
    )

    def _fdiv(a: F.Column, b: int) -> F.Column:
        # integer floor-div for nonnegative operands, lambda-safe (Column
        # has no floordiv; values stay far below 2^52 so the double is exact)
        return ((a - a % b) / b).cast("bigint")

    def _byte(g: F.Column) -> F.Column:
        return F.conv(F.col("fx").substr(2 * g + 1, F.lit(2)), 16, 10).cast(
            "bigint"
        )

    cell = lambda j: F.when(F.col("afl") == 0, F.lit(0).cast("bigint")).otherwise(
        _byte(_fdiv(j * F.col("afl"), VF_CELLS))
    )
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(VF_CELLS - 1)).cast("array<bigint>"), cell
    )
    pow2 = F.array(*[F.lit(1 << j).cast("bigint") for j in range(32)])
    sig = frames.withColumn("cl", cells).select(
        "id",
        "frame_no",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("bigint"),
            lambda acc, j: acc
            + F.when(
                F.element_at(F.col("cl"), j + 1)
                > F.element_at(F.col("cl"), j + 2),
                F.element_at(pow2, j + 1),
            ).otherwise(F.lit(0).cast("bigint")),
        ).alias("lo"),
        F.aggregate(
            F.sequence(F.lit(32), F.lit(63)),
            F.lit(0).cast("bigint"),
            lambda acc, j: acc
            + F.when(
                F.element_at(F.col("cl"), j + 1)
                > F.element_at(F.col("cl"), j + 2),
                F.element_at(pow2, j - 31),
            ).otherwise(F.lit(0).cast("bigint")),
        ).alias("hi"),
    )
    # persist(): the signature feeds BOTH sides of the self-join — without
    # materialization the 65-cell hex-parse expression runs twice per frame
    # (the _shingled pattern; bounded to one (id, frame_no, lo, hi) row per
    # frame). Multi-query sessions clearCache() after the action.
    evidenced = sig.filter(~((F.col("lo") == 0) & (F.col("hi") == 0))).persist()
    sa = evidenced.select(F.col("id").alias("id_a"), "frame_no", "lo", "hi")
    sb = evidenced.select(F.col("id").alias("id_b"), "frame_no", "lo", "hi")
    ver = sa.join(sb, ["frame_no", "lo", "hi"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    return (
        ver.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_frames_matched"))
        .filter(F.col("n_frames_matched") >= VF_MATCH_MIN)
    )


# --- audio fingerprint near-dup --------------------------------------------
#
# The modality matrix's last cell: image near-dup keys on 2-D gradients
# (dHash), video on per-keyframe signatures with a frame vote — audio's
# production analogue (chromaprint / Shazam-family) fingerprints
# POSITION-INDEPENDENT spectral landmarks, because the #1 audio edit is a
# time shift (trimmed intro, re-encode padding) that moves every sample
# offset while leaving the content intact. The deterministic stand-in:
# overlapping energy-profile windows (AF_WIN bytes at hop AF_HOP, 4
# quantized band sums each) hashed into a SET — shift by a hop multiple
# and the interior windows re-align exactly, so the profile SET survives
# edits that destroy any position-keyed signature. Set similarity is then
# EXACTLY the text near-dup problem, so the kernel reuses the banded
# MinHash stack unchanged (operators/dedup.py) — the dedup machinery is
# modality-generic once a modality defines its shingle.
#
# Quantization entropy was MEASURED before shipping (the video kernel's
# banding-degeneracy lesson): //8 on 4-byte ASCII band sums gives 3,221
# distinct profiles over 8,416 windows at sf0.01 — planted hop-shifted
# twins verify at Jaccard >= 0.80 while the max unrelated pair is 0.14,
# so the shared JACCARD_THRESHOLD (0.5) separates with margin on both
# sides. A coarser //64 would collapse ASCII sums to ~3 levels per band
# and degenerate toward all-pairs, exactly like the video kernel's
# 8-bit frame bands.
AUDIO_TWIN_OFFSET = 300_000_000_000  # audio twins (image 1e11, video 2e11)
AF_WIN = 16  # fingerprint window: 16 payload bytes = 4 bands x 4 bytes
AF_HOP = 8  # 50% overlap; shift tolerance = multiples of the hop
AF_QUANT = 8  # band-sum quantizer (energy level = sum // 8)

_AF_HEXD = "0123456789ABCDEF"


def _af_sql_byte(pos: str) -> str:
    """Byte value at 0-based position ``pos`` of the payload hex string px."""
    return (
        f"((strpos('{_AF_HEXD}', px[2 * ({pos}) + 1]) - 1) * 16"
        f" + (strpos('{_AF_HEXD}', px[2 * ({pos}) + 2]) - 1))"
    )


def _af_sql_level(b: int) -> str:
    """Quantized energy of band ``b`` (4 bytes) of window ``i``."""
    start = f"i * {AF_HOP} + {b * 4}"
    added = " + ".join(_af_sql_byte(f"{start} + {k}") for k in range(4))
    return f"(({added}) // {AF_QUANT})"


_AF_SQL_PROFILE = "'af' || " + " || '_' || ".join(
    f"CAST({_af_sql_level(b)} AS VARCHAR)" for b in range(4)
)
_AF_SQL_NWIN = (
    f"CASE WHEN plen >= {AF_WIN} THEN (plen - {AF_WIN}) // {AF_HOP} + 1 ELSE 0 END"
)

_AF_CTES = f"""m AS (
  SELECT doc_id,
         CAST(doc_id % 16 + 4 AS INT) AS w,
         CAST(doc_id % 12 + 4 AS INT) AS h,
         CAST(doc_id % 3 + 1 AS INT) AS c,
         encode(repeat(COALESCE(text, ''), 4)) AS pay
  FROM documents WHERE doc_id % 3 = 1
),
p AS (
  SELECT doc_id, LEAST(w * h * c, octet_length(pay)) AS plen0,
         substr(hex(pay), 1, 2 * LEAST(w * h * c, octet_length(pay))) AS hx0
  FROM m
),
v AS (
  SELECT doc_id + twin * {AUDIO_TWIN_OFFSET} AS id,
         CASE WHEN twin = 1 THEN substr(hx0, 2 * {AF_HOP} + 1) ELSE hx0 END AS px,
         CASE WHEN twin = 1 THEN GREATEST(plen0 - {AF_HOP}, 0) ELSE plen0 END AS plen
  FROM p, (SELECT unnest([0, 1]) AS twin)
),
t AS (
  -- landmarks reduce mod the 31-bit prime like every text shingle hash:
  -- the MinHash permutation multiplies by ~1e6 coefficients, so a raw
  -- 60-bit md5 fold would overflow INT64 inside the oracle's transform
  SELECT id AS doc_id,
         list_distinct(list_transform(range(0, {_AF_SQL_NWIN}),
           i -> CAST(('0x' || substr(md5({_AF_SQL_PROFILE}), 1, 15)) AS BIGINT)
                % 2147483647))
           AS sh
  FROM v
)"""


@register(
    "multimodal_audio_fp_neardup",
    operators=(
        "LLM-multimodal-audio-neardup (chromaprint-style audio near-dup: "
        "overlapping quantized energy-profile windows hashed into a "
        "position-independent landmark SET — shift-by-a-hop edits "
        "re-align exactly — then the SAME banded MinHash + exact-Jaccard "
        "stack as text dedup; quantizer entropy measured before shipping; "
        "planted hop-shifted twins are the recall witness)"
    ),
    oracle=f"""
WITH {_AF_CTES},
sig AS (SELECT doc_id, sh, {sql_minhash_sig()} AS sig FROM t WHERE len(sh) > 0),
band AS (
  SELECT doc_id, band_no, {sql_lsh_band_key()} AS band_key
  FROM sig, (SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band_no)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM band l JOIN band r
    ON l.band_no = r.band_no AND l.band_key = r.band_key AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, {SQL_JACCARD} AS jaccard
FROM cand JOIN t a ON cand.id_a = a.doc_id JOIN t b ON cand.id_b = b.doc_id
WHERE {SQL_JACCARD} >= {JACCARD_THRESHOLD}
""",
)
def multimodal_audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality near-dup via shift-tolerant fingerprint sets.

    Each audio payload yields overlapping windows (``AF_WIN`` bytes at hop
    ``AF_HOP``); a window's profile is its 4 quantized band-energy sums,
    md5-hashed into a landmark. The landmark SET is position-independent,
    so a hop-aligned shift (the planted twin drops the first ``AF_HOP``
    payload bytes — a trimmed intro) loses only the boundary window:
    measured twin Jaccard >= 0.80 vs <= 0.14 for any unrelated pair at
    sf0.01. Arbitrary (non-hop-multiple) shifts break window alignment —
    the classic hop-vs-robustness tradeoff; production fingerprints add
    onset alignment, and halving ``AF_HOP`` halves the tolerance gap at
    double the landmark count.

    From the landmark set down, the kernel IS docs_minhash_neardup_pairs
    (MinHash(16) -> 4x4 banding -> bucket-local candidates -> exact
    Jaccard) — same operators, same scale shape: O(bands x |audio|)
    banding shuffle, pair work only inside true signature collisions,
    zero-landmark payloads excluded from banding (sentinel-signature
    degeneracy guard).
    """
    from inspig_etl_spark.operators.dedup import (
        jaccard_verify,
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_signature,
    )
    from inspig_etl_spark.functions.text import md5_long

    docs = spread(table(spark, sf_dir, "documents"))
    media = synthetic_media(docs).filter(F.col("media_type") == "audio").select(
        "id", "blob"
    )
    pay = F.expr("substring(blob, 9)")
    originals = media.select(F.col("id"), pay.alias("pay"))
    twins = media.select(
        _twin_id(F.col("id"), AUDIO_TWIN_OFFSET).alias("id"),
        F.expr(f"substring(blob, 9 + {AF_HOP})").alias("pay"),
    )
    v = originals.unionByName(twins).select(
        F.col("id").alias("doc_id"),
        F.hex(F.col("pay")).alias("px"),
        F.expr("octet_length(pay)").cast("bigint").alias("plen"),
    )

    def _byte(pos: F.Column) -> F.Column:
        return F.conv(F.col("px").substr(pos * 2 + 1, F.lit(2)), 16, 10).cast(
            "bigint"
        )

    def _level(i: F.Column, b: int) -> F.Column:
        start = i * AF_HOP + b * 4
        total = sum((_byte(start + k) for k in range(1, 4)), _byte(start))
        # floor-div for nonnegative operands (Column has no //; sums are
        # far below 2^52 so the double division is exact)
        return ((total - total % AF_QUANT) / AF_QUANT).cast("bigint")

    def _profile(i: F.Column) -> F.Column:
        # % HASH_P: same reduction as every text shingle hash — the
        # MinHash permutation coefficients would overflow a raw 60-bit fold
        return md5_long(
            F.concat(
                F.lit("af"),
                F.concat_ws(
                    "_", *[_level(i, b).cast("string") for b in range(4)]
                ),
            )
        ) % F.lit(2147483647)

    nwin = (
        F.when(
            F.col("plen") >= AF_WIN,
            ((F.col("plen") - AF_WIN) - (F.col("plen") - AF_WIN) % AF_HOP)
            / AF_HOP
            + 1,
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    windows = F.when(nwin > 0, F.sequence(F.lit(0), nwin - 1)).otherwise(
        F.array().cast("array<int>")
    )
    # persist(): the landmark extraction (~107 windows x 16 hex byte-parses
    # per payload) feeds the banding side AND both sides of the verify
    # join — without materialization it runs three times (the _shingled
    # pattern in queries/llm_dedup.py; bounded to one (id, sh) row per
    # audio blob). Multi-query sessions clearCache() after the action.
    sh = v.select(
        "doc_id",
        F.array_distinct(
            F.transform(windows, lambda i: _profile(i.cast("bigint")))
        ).alias("sh"),
    ).persist()
    signed = sh.filter(F.size("sh") > 0).withColumn(
        "sig", minhash_signature(F.col("sh"))
    )
    banded = signed.withColumn(
        "band_keys", lsh_band_keys(F.col("sig"), MINHASH_BANDS, MINHASH_ROWS)
    ).persist()  # consumed twice by the candidate self-join
    cand = lsh_candidate_pairs(banded, "doc_id", "band_keys", MINHASH_BANDS)
    return jaccard_verify(cand, sh, "doc_id", "sh", JACCARD_THRESHOLD)
