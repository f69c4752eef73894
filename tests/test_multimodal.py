"""Multimodal binary-column plumbing: schema, Arrow batch shape, fake-codec
determinism, frame sampling, resize arithmetic, and the real-codec seam."""

import pytest

from sparkocr.pipeline.multimodal import (
    _fake_decode_stats,
    decode_image_real,
    decode_stats,
    resize_plan,
    sample_frames,
    synth_media,
)


def test_real_codec_seam_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x00", {})


def test_fake_decode_deterministic():
    a = _fake_decode_stats(b"hello world")
    assert a == _fake_decode_stats(b"hello world")
    assert a[0] == 11
    assert _fake_decode_stats(b"") == (0, 0.0, 0)
    assert _fake_decode_stats(None) == (0, 0.0, 0)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (10 + i)) for i in range(12)], "doc_id long, text string"
    )
    return synth_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    meta_names = [f.name for f in media.schema["meta"].dataType.fields]
    assert meta_names == ["media_type", "width", "height", "n_frames", "codec"]


def test_decode_stats(media, spark):
    out = {r.media_id: r for r in decode_stats(media).collect()}
    assert len(out) == 12
    r0 = out[0]
    assert r0.n_bytes == 10  # "x"*10
    assert r0.mean_byte == float(ord("x"))
    assert r0.width == 320 and r0.height == 240
    # checksum stable across two runs (separate spark jobs)
    again = {r.media_id: r.checksum for r in decode_stats(media).collect()}
    assert all(out[k].checksum == again[k] for k in out)


def test_resize_plan(media):
    rows = {r.media_id: r for r in resize_plan(media, target=640).collect()}
    for r in rows.values():
        # the long side comes out EXACTLY target (float floor(d*scale)
        # produced target-1 for sizes like 1077 — 640/1077*1077 = 639.99…)
        assert max(r.out_w, r.out_h) == 640
        big = max(r.width, r.height)
        assert r.out_w == r.width * 640 // big
        assert r.out_h == r.height * 640 // big


def test_sample_frames(media):
    rows = [r for r in sample_frames(media, n_sample=4).collect()]
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    # videos are media_id % 3 == 0 with n_frames = id % 7 + 2; stills get 1
    for mid, frames in by_media.items():
        expected = min(4, mid % 7 + 2) if mid % 3 == 0 else 1
        assert len(frames) == expected, (mid, len(frames))
        idxs = [f.frame_idx for f in frames]
        assert idxs == sorted(set(idxs)), "even sampling must not repeat frames"
    # frame checksums deterministic
    again = {(r.media_id, r.frame_idx): r.frame_checksum
             for r in sample_frames(media, n_sample=4).collect()}
    for r in rows:
        assert again[(r.media_id, r.frame_idx)] == r.frame_checksum
