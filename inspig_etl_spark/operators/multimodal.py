"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata (brief-mandated LLM-pipeline extension).

Convention: a media table is ``(id, media_type, blob binary, meta struct)``.
All Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures — is real and tested; the actual codec call is STUBBED because
image/audio libraries are not in this container:

- :func:`decode_media` tries a real decoder (PIL) behind an import guard
  and otherwise falls back to :func:`_fake_decode`, a deterministic parser
  of our synthetic blob header — so tests are stable with or without the
  library.

Scale notes: binary payloads ride through ``mapInPandas`` in Arrow batches,
so bytes never materialize as Python row objects; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so (batch x payload)
fits executor memory. Decode is per-row work with no shuffle — partition
count alone controls parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Synthetic blob layout: 8-byte header = magic 'IM' + width(u16) + height(u16)
# + channels(u16), then width*height*channels payload bytes (hash-generated).
MAGIC = b"IM"

MEDIA_SCHEMA = (
    "id BIGINT, media_type STRING, blob BINARY, "
    "meta STRUCT<width: INT, height: INT, channels: INT>"
)

DECODED_SCHEMA = (
    "id BIGINT, media_type STRING, width INT, height INT, channels INT, "
    "n_bytes INT, mean_byte DOUBLE, features ARRAY<DOUBLE>"
)


def synthetic_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table derived from the documents table.

    Dimensions derive from the doc id, payload bytes from the text — stable
    across runs and engines, no randomness.
    """
    width = (F.col(id_col) % 16 + 4).cast("int")
    height = (F.col(id_col) % 12 + 4).cast("int")
    channels = (F.col(id_col) % 3 + 1).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        _u16(width),
        _u16(height),
        _u16(channels),
    )
    payload = F.substring(
        F.encode(F.repeat(F.col(text_col), 4), "UTF-8"), 1, width * height * channels
    )
    media_type = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col(id_col).alias("id"),
        media_type.alias("media_type"),
        F.concat(header, payload).alias("blob"),
        F.struct(
            width.alias("width"), height.alias("height"), channels.alias("channels")
        ).alias("meta"),
    )


def _u16(col) -> F.Column:
    """Big-endian uint16 as 2 binary bytes (expression-only)."""
    hi = (col / 256).cast("int") % 256
    lo = col % 256
    return F.concat(_byte(hi), _byte(lo))


def _byte(col) -> F.Column:
    # unhex of a 2-char hex string -> one byte; conv gives uppercase hex.
    return F.unhex(F.lpad(F.conv(col.cast("string"), 10, 16), 2, "0"))


def _fake_decode(blob: bytes) -> dict:
    """Deterministic decode of the synthetic blob format (the stub standing
    in for PIL/librosa/ffmpeg). Raises on foreign data like a real codec."""
    if blob[:2] != MAGIC:
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this environment; only the synthetic IM format is supported"
        )
    width = int.from_bytes(blob[2:4], "big")
    height = int.from_bytes(blob[4:6], "big")
    channels = int.from_bytes(blob[6:8], "big")
    payload = blob[8 : 8 + width * height * channels]
    n = len(payload)
    mean = round(sum(payload) / n, 6) if n else 0.0
    # 4-bucket byte-mean "feature vector" — the shape a real embedding
    # extractor would produce, computed deterministically.
    feats = []
    for i in range(4):
        chunk = payload[i * n // 4 : (i + 1) * n // 4]
        feats.append(round(sum(chunk) / len(chunk), 6) if chunk else 0.0)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "n_bytes": n,
        "mean_byte": mean,
        "features": feats,
    }


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched, no shuffle).

    Tries a real decoder first when the blob isn't our synthetic format;
    PIL et al. are absent here, so foreign blobs surface the
    NotImplementedError from the stub — by design.
    """

    from inspig_etl_spark.pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                d = _fake_decode(bytes(row["blob"]))
                out.append(
                    {
                        "id": row["id"],
                        "media_type": row["media_type"],
                        **{k: d[k] for k in ("width", "height", "channels", "n_bytes", "mean_byte", "features")},
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling as expression code: split the payload into
    n equal 'frames' (one output row each) — the partition-preserving
    explode shape a real frame sampler needs."""
    body = F.expr("substring(blob, 9)")  # skip the 8-byte header
    frame_len = F.greatest(
        (F.length(body) / n_frames).cast("int"), F.lit(1)
    )
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.substring(body, (i * frame_len + 1).cast("int"), frame_len),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("id", F.posexplode(frames).alias("frame_no", "frame_bytes"))
        .withColumn("frame_size", F.length("frame_bytes"))
    )
