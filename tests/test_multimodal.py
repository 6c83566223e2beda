"""Multimodal plumbing tests: blob layout, Arrow-batched decode stub,
frame sampling shapes, and decode-vs-metadata agreement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inspig_etl_spark.catalog import table
from inspig_etl_spark.operators.multimodal import (
    _fake_decode,
    decode_media,
    frame_sample,
    synthetic_media,
)
from tests.conftest import SF_SMOKE


def _media(spark):
    return synthetic_media(table(spark, SF_SMOKE, "documents"))


def test_blob_layout_matches_metadata(spark):
    rows = _media(spark).limit(20).collect()
    assert rows
    for r in rows:
        blob = bytes(r.blob)
        assert blob[:2] == b"IM"
        assert int.from_bytes(blob[2:4], "big") == r.meta.width
        assert int.from_bytes(blob[4:6], "big") == r.meta.height
        assert int.from_bytes(blob[6:8], "big") == r.meta.channels
        assert len(blob) == 8 + r.meta.width * r.meta.height * r.meta.channels


def test_decode_media_shapes_and_values(spark):
    media = _media(spark)
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == media.count()  # one output row per input row
    for r in rows[:10]:
        assert len(r.features) == 4
        assert r.n_bytes == r.width * r.height * r.channels
        assert 0.0 <= r.mean_byte <= 255.0
    # Deterministic: a second run produces identical values.
    again = {r.id: r.mean_byte for r in decode_media(media).collect()}
    assert all(again[r.id] == r.mean_byte for r in rows)


def test_decode_rejects_foreign_blob():
    with pytest.raises(NotImplementedError, match="image/audio library"):
        _fake_decode(b"\x89PNG1234567890")


def test_decode_media_matches_scalar_spec(spark):
    """The vectorized batch body must be bit-identical to _fake_decode."""
    media = _media(spark).limit(50)
    got = {r.id: r for r in decode_media(media).collect()}
    for src in media.collect():
        want = _fake_decode(bytes(src.blob))
        r = got[src.id]
        assert (r.width, r.height, r.channels, r.n_bytes) == (
            want["width"], want["height"], want["channels"], want["n_bytes"]
        )
        assert r.mean_byte == want["mean_byte"]
        assert list(r.features) == want["features"]


def test_decode_media_short_payload_clamps(spark):
    """A payload shorter than width*height*channels clamps n_bytes (both
    paths slice, never pad) — and an empty payload yields zeroed stats."""
    full = b"IM" + (1).to_bytes(2, "big") * 2 + (8).to_bytes(2, "big")  # wants 8
    rows = [
        (1, "image", full + b"abc"),  # only 3 payload bytes present
        (2, "image", full),           # zero payload bytes
    ]
    df = spark.createDataFrame(rows, "id BIGINT, media_type STRING, blob BINARY")
    got = {r.id: r for r in decode_media(df).collect()}
    for rid, blob in [(1, full + b"abc"), (2, full)]:
        want = _fake_decode(blob)
        assert got[rid].n_bytes == want["n_bytes"]
        assert got[rid].mean_byte == want["mean_byte"]
        assert list(got[rid].features) == want["features"]


def test_frame_sample_shape(spark):
    media = _media(spark)
    frames = frame_sample(media, n_frames=4)
    counts = frames.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert counts
    assert all(r.n == 4 for r in counts)
    videos = media.filter(F.col("media_type") == "video").count()
    assert len(counts) == videos


class TestResize:
    def test_resize_roundtrips_through_decoder(self, spark):
        from inspig_etl_spark.operators.multimodal import resize_media

        media = _media(spark)
        out = decode_media(resize_media(media, out_w=8, out_h=6)).collect()
        assert out
        src_channels = {
            r.id: r.meta.channels for r in media.select("id", "meta").collect()
        }
        for r in out:
            assert (r.width, r.height) == (8, 6)
            assert r.channels == src_channels[r.id]
            assert r.n_bytes == 8 * 6 * r.channels

    def test_nearest_neighbor_values(self, spark):
        """2x2 -> 1x1 nearest-neighbor keeps the top-left pixel."""
        from inspig_etl_spark.operators.multimodal import resize_media

        blob = (
            b"IM" + (2).to_bytes(2, "big") + (2).to_bytes(2, "big")
            + (1).to_bytes(2, "big") + bytes([10, 20, 30, 40])
        )
        df = spark.createDataFrame(
            [(1, "image", blob, {"width": 2, "height": 2, "channels": 1})],
            "id BIGINT, media_type STRING, blob BINARY, "
            "meta STRUCT<width: INT, height: INT, channels: INT>",
        )
        r = decode_media(resize_media(df, out_w=1, out_h=1)).collect()[0]
        assert r.n_bytes == 1 and r.mean_byte == 10.0

    def test_foreign_blob_raises(self, spark):
        from inspig_etl_spark.operators.multimodal import resize_media

        df = spark.createDataFrame(
            [(1, "image", b"PNGxxxxxxxx", {"width": 1, "height": 1, "channels": 1})],
            "id BIGINT, media_type STRING, blob BINARY, "
            "meta STRUCT<width: INT, height: INT, channels: INT>",
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="image/audio library"):
            resize_media(df, out_w=2, out_h=2).collect()


def test_decode_media_trailing_empty_payload_rows(spark):
    """Regression: a trailing empty-payload row used to clamp the reduceat
    bound and silently truncate the LAST nonempty row's final chunk by one
    byte (batch said mean 20.0 where the scalar spec says 30.0)."""
    nonempty = (
        b"IM" + (1).to_bytes(2, "big") + (1).to_bytes(2, "big") + (5).to_bytes(2, "big")
        + bytes([10, 20, 30, 40, 50])
    )
    empty = b"IM" + (1).to_bytes(2, "big") * 2 + (0).to_bytes(2, "big")
    rows = [(1, "image", nonempty), (2, "image", empty)]
    df = spark.createDataFrame(
        rows, "id BIGINT, media_type STRING, blob BINARY"
    ).coalesce(1)  # one Arrow batch, empty row trailing
    got = {r.id: r for r in decode_media(df).collect()}
    for rid, blob in rows and [(1, nonempty), (2, empty)]:
        want = _fake_decode(blob)
        assert got[rid].mean_byte == want["mean_byte"], rid
        assert list(got[rid].features) == want["features"], rid


def test_decode_media_blob_shorter_than_header_is_foreign(spark):
    """A blob without a full 8-byte header is foreign data on BOTH paths —
    the same NotImplementedError contract, not a ragged np.stack crash."""
    import pytest

    with pytest.raises(NotImplementedError):
        _fake_decode(b"IMabc")
    df = spark.createDataFrame(
        [(1, "image", b"IMabc")], "id BIGINT, media_type STRING, blob BINARY"
    )
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_media(df).collect()


def test_phash_finds_every_planted_twin(spark):
    """Banding recall witness: each (image, +1-byte twin) pair differs in
    ONE sampled pixel, so nearly all planted pairs must surface under the
    Hamming gate — a banding or verify bug that drops real near-dups shows
    up here as mass misses. Not 100%: the +1 raises one sampled gray cell,
    and when that cell is boundary-equal to its horizontal neighbors
    (gray[c] == gray[c+1]) the strict `>` dHash gradient comparison flips
    on BOTH adjacent bits, so images with many boundary-equal cells can
    flip more than HMAX bits (doc 42 at sf0.001 measures Hamming 10);
    recall >= 95% is the invariant."""
    from inspig_etl_spark.queries.multimodal import (
        PHASH_TWIN_OFFSET,
        multimodal_phash_neardup_pairs,
    )

    rows = multimodal_phash_neardup_pairs(spark, SF_SMOKE).collect()
    found = {(r.id_a, r.id_b) for r in rows}
    import duckdb

    image_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet') "
            "WHERE doc_id % 3 = 0"
        ).fetchall()
    ]
    missing = [
        i for i in image_ids if (i, i + PHASH_TWIN_OFFSET) not in found
    ]
    recall = 1 - len(missing) / len(image_ids)
    assert recall >= 0.95, (
        f"planted-twin recall {recall:.3f}; missing ids {missing[:5]}"
    )


def test_paired_neardup_or_composition(spark):
    """The cross-modal OR contract: (a) planted twins carry NO caption, so
    a twin landing in its original's cluster proves the IMAGE edge path;
    (b) every text near-dup pair of image docs must share a cluster,
    proving the CAPTION edge path; (c) clusters are transitive across
    modalities — a doc's twin and its text near-dups all share one
    cluster id; (d) node universe = image docs + twins exactly, and every
    cluster id is its cluster's minimum member (canonical contract)."""
    from inspig_etl_spark.queries.llm_dedup import docs_minhash_neardup_pairs
    from inspig_etl_spark.queries.multimodal import (
        PHASH_TWIN_OFFSET,
        multimodal_paired_neardup,
        multimodal_phash_neardup_pairs,
    )

    rows = multimodal_paired_neardup(spark, SF_SMOKE).collect()
    cluster = {r.pair_id: r.cluster_id for r in rows}

    import duckdb

    image_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet') "
            "WHERE doc_id % 3 = 0"
        ).fetchall()
    }
    # (d) node universe and canonical-min contract
    assert set(cluster) == image_ids | {i + PHASH_TWIN_OFFSET for i in image_ids}
    members: dict[int, list[int]] = {}
    for pid, cid in cluster.items():
        members.setdefault(cid, []).append(pid)
    assert all(min(ms) == cid for cid, ms in members.items())
    canonical = {r.pair_id for r in rows if r.is_canonical}
    assert canonical == set(members)

    # (a) image edges: every detected (image, twin-or-other) phash pair is
    # co-clustered — in particular the caption-less twins.
    ipairs = multimodal_phash_neardup_pairs(spark, SF_SMOKE).collect()
    assert ipairs, "witness set empty — twin planting broke"
    for p in ipairs:
        assert cluster[p.id_a] == cluster[p.id_b]

    # (b) caption edges: text near-dup pairs BETWEEN image docs co-cluster.
    tpairs = [
        (r.id_a, r.id_b)
        for r in docs_minhash_neardup_pairs(spark, SF_SMOKE).collect()
        if r.id_a in image_ids and r.id_b in image_ids
    ]
    for a, b in tpairs:
        assert cluster[a] == cluster[b]

    # (c) cross-modal transitivity: for a doc with a text near-dup, its
    # caption-less twin shares the text partner's cluster too.
    crossed = [
        (a, b)
        for a, b in tpairs
        if cluster[a + PHASH_TWIN_OFFSET] == cluster[a]
    ]
    for a, b in crossed:
        assert cluster[a + PHASH_TWIN_OFFSET] == cluster[b]


def test_video_frame_neardup_finds_every_twin(spark):
    """Witness coverage: every video whose payload yields evidence (>= 2
    frame positions with a non-zero signature — all-zero sigs are excluded
    from candidacy by design) must pair with its planted one-byte twin
    (the perturbation touches only frame 0, so frames 1-3 are identical);
    pair bookkeeping stays inside its bounds (2..4 matched frames, ordered
    ids). On this corpus EVERY video qualifies, so the witness set is the
    full video universe."""
    from inspig_etl_spark.queries.multimodal import (
        VF_MATCH_MIN,
        VFRAME_TWIN_OFFSET,
        multimodal_video_frame_neardup,
    )

    rows = multimodal_video_frame_neardup(spark, SF_SMOKE).collect()
    vids = {
        r.doc_id
        for r in table(spark, SF_SMOKE, "documents")
        .filter((F.col("doc_id") % 3 == 2) & F.col("text").isNotNull())
        .select("doc_id")
        .collect()
    }
    twin_pairs = {
        r.id_a: r for r in rows if r.id_b - r.id_a == VFRAME_TWIN_OFFSET
    }
    assert set(twin_pairs) >= vids, sorted(vids - set(twin_pairs))[:5]
    for v in vids:
        assert twin_pairs[v].n_frames_matched >= 3
    for r in rows:
        assert r.id_a < r.id_b
        assert VF_MATCH_MIN <= r.n_frames_matched <= 4


def test_audio_fp_neardup_finds_shifted_twins(spark):
    """The audio fingerprint detector's contract: (a) planted hop-shifted
    twins are recovered for nearly all audio docs (the landmark SET is
    shift-tolerant; MinHash 4x4 banding may probabilistically miss a few
    J~0.8 pairs — >= 90% recall asserted); (b) every returned pair clears
    the exact-Jaccard threshold; (c) on THIS corpus unrelated audio pairs
    max out at J~0.14 (measured), so every returned pair is a twin pair —
    a data-specific precision witness (a regen with genuine audio dups
    could legitimately add non-twin pairs)."""
    from inspig_etl_spark.queries.multimodal import AUDIO_TWIN_OFFSET
    from inspig_etl_spark.operators.dedup import JACCARD_THRESHOLD
    from inspig_etl_spark.queries.multimodal import multimodal_audio_fp_neardup
    from tests.conftest import SF_CORRECT

    rows = multimodal_audio_fp_neardup(spark, SF_CORRECT).collect()
    assert rows
    audio_docs = {
        r.doc_id
        for r in table(spark, SF_CORRECT, "documents")
        .filter((F.col("doc_id") % 3 == 1) & F.col("text").isNotNull())
        .select("doc_id")
        .collect()
    }
    twin_found = {r.id_a for r in rows if r.id_b - r.id_a == AUDIO_TWIN_OFFSET}
    assert len(twin_found & audio_docs) >= 0.9 * len(audio_docs)
    for r in rows:
        assert r.id_a < r.id_b
        assert r.jaccard >= JACCARD_THRESHOLD
        assert r.id_b - r.id_a == AUDIO_TWIN_OFFSET


def test_twin_id_guard_raises_on_collision(spark):
    """ADVICE r12: a base id >= the twin offset would alias a real doc id
    and silently corrupt the banding/verify joins on both engines. The
    guard rides the twin-id expression, so the witness fails LOUDLY at any
    scale factor that outgrows the offset instead of aliasing."""
    from inspig_etl_spark.queries.multimodal import PHASH_TWIN_OFFSET, _twin_id

    ok = spark.createDataFrame([(7,)], "id bigint").select(
        _twin_id(F.col("id"), PHASH_TWIN_OFFSET).alias("id")
    )
    assert ok.collect()[0].id == 7 + PHASH_TWIN_OFFSET

    bad = spark.createDataFrame([(PHASH_TWIN_OFFSET,)], "id bigint").select(
        _twin_id(F.col("id"), PHASH_TWIN_OFFSET).alias("id")
    )
    with pytest.raises(Exception, match="planted-twin id collision"):
        bad.collect()
