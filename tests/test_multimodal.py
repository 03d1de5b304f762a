"""Multimodal plumbing: schema contract, determinism, batch shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from candy_store_etl_spark.operators.multimodal import (
    attach_media_column,
    decode_media,
    plan_resize,
    resize_media,
    sample_frames,
)
from candy_store_etl_spark.sources.tpch import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return attach_media_column(docs, "doc_id", "text")


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "content", "meta"]
    row = media.first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.content)


def test_decode_deterministic(media):
    a = {r.media_id: (r.width, r.height, r.n_frames, tuple(r.features))
         for r in decode_media(media, n_features=8).collect()}
    b = {r.media_id: (r.width, r.height, r.n_frames, tuple(r.features))
         for r in decode_media(media, n_features=8).collect()}
    assert a == b
    w, h, nf, feats = next(iter(a.values()))
    assert 16 <= w < 80 and 16 <= h < 80 and 1 <= nf <= 8
    assert len(feats) == 8
    assert abs(sum(feats) - 1.0) < 1e-5  # normalized histogram


def test_real_codec_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="fake"):
        decode_media(media, codec="pillow")


def test_frame_sampling_fanout(spark, media):
    decoded = decode_media(media)
    frames = sample_frames(decoded, every_k=2)
    joined = (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("kept"), F.max("frame_idx").alias("mx"))
        .join(decoded.select("media_id", "n_frames"), "media_id")
    )
    bad = joined.filter(
        (F.col("kept") != ((F.col("n_frames") + 1) / 2).cast("int"))
        | (F.col("mx") >= F.col("n_frames"))
    ).count()
    assert bad == 0


def test_resize_plan_geometry(media):
    plan = plan_resize(decode_media(media), max_side=32)
    for r in plan.collect():
        assert max(r.target_width, r.target_height) <= 32
        if r.skip_resize:
            assert (r.target_width, r.target_height) == (r.width, r.height)
        else:
            # aspect ratio preserved within ceil-rounding
            assert abs(
                r.target_width / r.width - r.target_height / r.height
            ) <= 1.0 / min(r.width, r.height) + 1e-9
        assert r.target_width >= 1 and r.target_height >= 1


def test_resize_media_stub_contract(media):
    out = resize_media(media, max_side=32)
    rows = {r.media_id: r for r in out.collect()}
    orig = {r.media_id: len(bytes(r.content)) for r in media.collect()}
    assert rows.keys() == orig.keys()
    for mid, r in rows.items():
        assert len(bytes(r.content)) <= orig[mid]
        assert max(r.target_width, r.target_height) <= 32


def test_resize_real_codec_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        resize_media(media, codec="pillow")


def test_segment_audio_clips_reassemble_payload(spark, sf_correctness):
    """Clips must tile the payload exactly: contiguous byte ranges,
    md5-consistent content, and full coverage (sum of clip lengths ==
    payload bytes)."""
    import hashlib

    from pyspark.sql import functions as F

    from candy_store_etl_spark.operators.multimodal import (
        attach_media_column,
        segment_audio,
    )
    from candy_store_etl_spark.sources.tpch import load_table

    docs = load_table(spark, sf_correctness, "documents").limit(50)
    media = attach_media_column(docs, "doc_id", "text", mime="audio/fake")
    segs = segment_audio(media).collect()
    payloads = {
        r.media_id: bytes(r.content)
        for r in media.select("media_id", "content").collect()
    }
    by_media = {}
    for r in segs:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == {m for m, b in payloads.items() if len(b) > 0}
    for mid, rows in by_media.items():
        rows.sort(key=lambda r: r.clip_idx)
        buf = payloads[mid]
        pos = 0
        for r in rows:
            assert r.start_sample == pos
            seg = buf[pos : pos + r.clip_len]
            assert len(seg) == r.clip_len
            assert hashlib.md5(seg).hexdigest() == r.clip_md5
            pos += r.clip_len
        assert pos == len(buf)
