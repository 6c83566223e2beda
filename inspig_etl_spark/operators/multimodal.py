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

import numpy as np
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
    # coalesce: a NULL text yields a well-formed ZERO-payload medium (the
    # header still renders), never a NULL blob that would crash the decode
    # kernels downstream; the query oracles mirror the same COALESCE.
    payload = F.substring(
        F.encode(F.repeat(F.coalesce(F.col(text_col), F.lit("")), 4), "UTF-8"),
        1,
        width * height * channels,
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
    if len(blob) < 8 or blob[:2] != MAGIC:
        # Shorter-than-header blobs are foreign data too — the same guard,
        # not an accidental buffer error deeper in the parse.
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this environment; only the synthetic IM format is supported"
        )
    width = int.from_bytes(blob[2:4], "big")
    height = int.from_bytes(blob[4:6], "big")
    channels = int.from_bytes(blob[6:8], "big")
    payload = np.frombuffer(blob, dtype=np.uint8, offset=8)[
        : width * height * channels
    ]
    n = payload.size
    # Byte means are micro-floored (sum*1e6 // n, then /1e6): integer floor
    # division + one IEEE double divide is bit-identical in numpy, Python and
    # DuckDB, so the value is oracle-checkable — np.round() is not (its
    # scaled half-even rounding has no SQL equivalent at the last ulp).
    mean = (int(payload.sum()) * 1_000_000 // n) / 1e6 if n else 0.0
    # 4-bucket byte-mean "feature vector" — the shape a real embedding
    # extractor would produce, computed deterministically.
    feats = []
    for i in range(4):
        chunk = payload[i * n // 4 : (i + 1) * n // 4]
        feats.append(
            (int(chunk.sum()) * 1_000_000 // chunk.size) / 1e6 if chunk.size else 0.0
        )
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

    The batch body is numpy end-to-end: one concatenated uint8 view of every
    payload in the Arrow batch, header fields and per-row/per-chunk byte
    sums via ``np.add.reduceat`` — no per-row Python touches the bytes.
    Output is bit-identical to :func:`_fake_decode` (tested), which remains
    the scalar spec and the foreign-format guard; PIL et al. are absent
    here, so foreign blobs surface the NotImplementedError — by design.
    """

    from inspig_etl_spark.pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "media_type", "width", "height", "channels",
                "n_bytes", "mean_byte", "features"]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            views = [np.frombuffer(b, dtype=np.uint8) for b in pdf["blob"]]
            sizes = np.fromiter((v.size for v in views), np.int64, len(views))
            if (sizes < 8).any():
                # Same foreign-format contract as the scalar spec: a blob
                # without a full 8-byte header is foreign data, not a crash
                # site (np.stack over ragged heads would raise ValueError).
                raise NotImplementedError(
                    "real media decoding requires an image/audio library not "
                    "present in this environment; only the synthetic IM "
                    "format is supported"
                )
            hdr = np.stack([v[:8] for v in views]).astype(np.int64)
            if ((hdr[:, 0] != MAGIC[0]) | (hdr[:, 1] != MAGIC[1])).any():
                raise NotImplementedError(
                    "real media decoding requires an image/audio library not "
                    "present in this environment; only the synthetic IM "
                    "format is supported"
                )
            width = (hdr[:, 2] << 8) | hdr[:, 3]
            height = (hdr[:, 4] << 8) | hdr[:, 5]
            channels = (hdr[:, 6] << 8) | hdr[:, 7]
            # Payload may be shorter than width*height*channels for foreign
            # producers; clamp exactly like the scalar slice does.
            lens = np.minimum(width * height * channels, sizes - 8).clip(min=0)
            flat = (
                np.concatenate([v[8 : 8 + n] for v, n in zip(views, lens)])
                if lens.any()
                else np.zeros(0, np.uint8)
            )
            starts = np.zeros(len(lens), np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            # 4 quarter-chunk boundaries per row; segments tile `flat`
            # exactly, so each segment ends at the next boundary (or total).
            bounds = (starts[:, None] + (lens[:, None] * np.arange(4)) // 4).ravel()
            seg_lens = np.diff(bounds, append=lens.sum())
            # Exact segment sums via prefix sums: csum[end]-csum[start].
            # (np.add.reduceat needs indices < flat.size; clamping trailing
            # empty-segment bounds silently truncated the LAST nonempty
            # row's final chunk by one byte — prefix sums have no such edge.)
            csum = np.concatenate(
                [np.zeros(1, np.int64), np.cumsum(flat, dtype=np.int64)]
            )
            ends = np.append(bounds[1:], lens.sum())
            sums = csum[ends] - csum[bounds]
            chunk_sums = sums.reshape(-1, 4)
            chunk_lens = seg_lens.reshape(-1, 4)
            # Micro-floor (sum*1e6 // n / 1e6), matching _fake_decode — exact
            # integer ops + one IEEE divide, bit-identical across engines.
            feats = np.where(
                chunk_lens > 0,
                (chunk_sums * 1_000_000) // np.maximum(chunk_lens, 1) / 1e6,
                0.0,
            )
            means = np.where(
                lens > 0,
                (chunk_sums.sum(axis=1) * 1_000_000) // np.maximum(lens, 1) / 1e6,
                0.0,
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "width": width.astype(np.int32),
                    "height": height.astype(np.int32),
                    "channels": channels.astype(np.int32),
                    "n_bytes": lens.astype(np.int32),
                    "mean_byte": means,
                    "features": feats.tolist(),
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h): the standard image
    pre-processing step before feature extraction, with the same stubbed
    codec convention as :func:`decode_media` (a real deployment swaps the
    kernel for PIL's ``Image.resize`` inside the same batch function).

    Arrow-batched ``mapInPandas``; per row the pixel gather is ONE numpy
    fancy-index over the (h, w, c) view — row sizes are ragged so rows
    iterate, bytes never do. Output blobs carry an updated header, so
    resized media round-trips through :func:`decode_media` unchanged.
    No shuffle; partition count alone controls parallelism.
    """

    from inspig_etl_spark.pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            out_blobs = []
            metas = []
            for blob in pdf["blob"]:
                v = np.frombuffer(blob, dtype=np.uint8)
                # Same foreign-format contract as the decoder: a blob
                # without a full 8-byte header is foreign data, not a raw
                # IndexError site in the header reads below.
                if v.size < 8 or bytes(v[:2].tobytes()) != MAGIC:
                    raise NotImplementedError(
                        "real media decoding requires an image/audio library "
                        "not present in this environment; only the synthetic "
                        "IM format is supported"
                    )
                w = int(v[2]) << 8 | int(v[3])
                h = int(v[4]) << 8 | int(v[5])
                c = int(v[6]) << 8 | int(v[7])
                n = min(w * h * c, v.size - 8)
                # Zero-pad short payloads to the declared grid, like the
                # decoder's clamp, then view as (h, w, c).
                grid = np.zeros(w * h * c, np.uint8)
                grid[:n] = v[8 : 8 + n]
                grid = grid.reshape(h, w, c) if w * h * c else grid.reshape(0, 0, 0)
                ys = (np.arange(out_h) * h) // out_h if h else np.zeros(out_h, np.int64)
                xs = (np.arange(out_w) * w) // out_w if w else np.zeros(out_w, np.int64)
                resized = (
                    grid[np.ix_(ys, xs)] if w and h else np.zeros((out_h, out_w, max(c, 1)), np.uint8)
                )
                header = (
                    MAGIC
                    + out_w.to_bytes(2, "big")
                    + out_h.to_bytes(2, "big")
                    + max(c, 1).to_bytes(2, "big")
                )
                out_blobs.append(header + resized.tobytes())
                metas.append({"width": out_w, "height": out_h, "channels": max(c, 1)})
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "blob": out_blobs,
                    "meta": metas,
                }
            )

    return media.mapInPandas(resize_batches, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling as expression code: split the payload into
    n equal 'frames' (one output row each) — the partition-preserving
    explode shape a real frame sampler needs.

    Sampling, not tiling: frames are ``floor(len/n)`` bytes each, so up to
    ``n-1`` trailing payload bytes appear in no frame — the same way a real
    sampler takes n evenly spaced frames and discards the rest of the
    stream. (The decoder's quarter-chunks DO tile their payload; different
    contract.) The registry oracle mirrors this truncation byte-for-byte.
    """
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


DHASH_GRID = 8  # perceptual hash over an 8x9 resampled grayscale grid


def dhash_media(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per medium: nearest-neighbor
    resample to an 8x9 grayscale grid (integer channel mean), then bit
    ``yi*8+xi`` = 1 iff cell (yi, xi) > cell (yi, xi+1) — 64 strict
    integer comparisons, bit-identical across engines. Returned as two
    BIGINT halves (``phash_hi`` bits 32-63, ``phash_lo`` bits 0-31) so no
    value ever touches the sign bit.

    dHash over aHash, measured: aHash couples every bit to the global
    mean, and on this corpus its byte-band buckets skew to 17% of all
    images in one bucket (27% of pair work in one cell at 10x rows); the
    gradient bits are near-independent and the same top bucket drops to
    3% (sum-of-squares 2.7x uniform, vs 24x) — the difference between a
    quadratic banding join and a usable one. Same swap-in point for a
    real codec: PIL's ``Image.resize((9, 8)).convert('L')``.

    Arrow-batched ``mapInPandas`` like the other codec kernels: rows
    iterate (ragged grids), bytes never become Python row objects, no
    shuffle.
    """

    from inspig_etl_spark.pyfiles import ensure_shipped

    ensure_shipped(media.sparkSession)

    g = DHASH_GRID

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "phash_hi", "phash_lo"]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            ids, his, los = [], [], []
            for mid, blob in zip(pdf["id"], pdf["blob"]):
                v = np.frombuffer(blob, dtype=np.uint8)
                if v.size < 8 or bytes(v[:2].tobytes()) != MAGIC:
                    raise NotImplementedError(
                        "real media decoding requires an image/audio library "
                        "not present in this environment; only the synthetic "
                        "IM format is supported"
                    )
                w = int(v[2]) << 8 | int(v[3])
                h = int(v[4]) << 8 | int(v[5])
                c = int(v[6]) << 8 | int(v[7])
                n = min(w * h * c, v.size - 8)
                if w and h and c:
                    grid = np.zeros(w * h * c, np.int64)
                    grid[:n] = v[8 : 8 + n]
                    pix = grid.reshape(h, w, c)
                    ys = (np.arange(g) * h) // g
                    xs = (np.arange(g + 1) * w) // (g + 1)
                    cells = pix[np.ix_(ys, xs)].sum(axis=2) // c  # (8, 9)
                else:
                    cells = np.zeros((g, g + 1), np.int64)
                bits = (cells[:, :g] > cells[:, 1:]).ravel()  # i = yi*8 + xi
                lo = sum(1 << i for i in range(32) if bits[i])
                hi = sum(1 << (i - 32) for i in range(32, 64) if bits[i])
                ids.append(int(mid))
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "id": np.asarray(ids, np.int64),
                    "phash_hi": np.asarray(his, np.int64),
                    "phash_lo": np.asarray(los, np.int64),
                }
            )

    return media.mapInPandas(hash_batches, "id long, phash_hi long, phash_lo long")
