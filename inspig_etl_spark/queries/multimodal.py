"""Multimodal queries: blob metadata (oracle-checked) and the Pandas-UDF
decode pipeline (rows-only check — the decode stub is not SQL-expressible,
but tests/test_multimodal.py pins its values).
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
    oracle=None,  # the decode stub is Python-side; invariants pinned in tests/test_multimodal.py
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
    oracle=None,  # the resize kernel is Python-side; invariants pinned in tests/test_multimodal.py
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
